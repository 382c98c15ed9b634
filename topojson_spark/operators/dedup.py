"""Dedup stage: duplicate-arc removal + contiguous-arc merge.

Re-expresses /root/reference/topojson/core/dedup.py:55-303 relationally:

- duplicate detection (ops.py:939-997 find_duplicates): canonical byte form
  per arc (column-sorted coords, ring closing-vertex rule) digested with
  sha1 — a deterministic replacement for the process-salted Python ``hash``
  (ops.py:971) — then a groupBy on the digest keeping the *max* extract
  position per group (dedup.py:171-176 sorts pairs descending: vals2keep is
  the higher index). This is the north rule's salted hash-shuffle: the
  digest is uniformly distributed so the shuffle self-salts; AQE skew-join
  handles any residual hot digest.
- extract position is the CONTENT tuple (feature_seq, unit_seq, ring_seq,
  split_seq) compared lexicographically (Spark struct ordering), so keep-max
  needs NO global sort; the reference's delete-and-renumber (np.digitize,
  dedup.py:180-206) becomes one dense rank over the (small) survivor set —
  provably the same order since pops only delete.
- contiguous-arc merge (dedup.py:208-303): per original linestring row whose
  arc list has non-shared first and last arcs, the non-shared arcs are
  linemerged; if pieces fused, the piece's max-position arc keeps the merged
  coordinates and the rest are popped (only the first fused piece per row,
  matching _find_merged_linestring's early return).

  Parity quirk, preserved deliberately: the reference runs the eligibility
  mask on the NaN-*padded* bookkeeping array (dedup.py:91), so a row is only
  merge-eligible when its arc count equals the *global maximum* row length
  (shorter rows have padding NaN in the last column). We reproduce this with
  a global max-length aggregate.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import kernels as K
from ..plans.ids import dense_index

_ROW_KEY = ["feature_seq", "unit_seq", "ring_seq"]
_POS = ["feature_seq", "unit_seq", "ring_seq", "split_seq"]


def _okey(prefix: str = "") -> F.Column:
    """Lexicographic extract-position struct (content-derived arc id)."""
    return F.struct(*[F.col(prefix + c).alias(c) for c in _POS])


def merge_lines_with_members(
    lines: List[np.ndarray],
) -> List[Tuple[np.ndarray, List[int]]]:
    """merge_lines + membership: which input indices built each chain."""
    n = len(lines)
    if n == 0:
        return []
    ends = []
    for ln in lines:
        k = K.vertex_keys(np.asarray(ln, dtype=np.float64))
        ends.append((k[0].tobytes(), k[-1].tobytes()))
    node = {}
    for i, (s, e) in enumerate(ends):
        node.setdefault(s, []).append((i, 0))
        node.setdefault(e, []).append((i, 1))
    used = [False] * n
    chains = []

    def extend(start: int, forward: bool):
        seq = [(start, forward)]
        used[start] = True
        cur, fwd = start, forward
        while True:
            end_key = ends[cur][1] if fwd else ends[cur][0]
            incident = node[end_key]
            nxt = [t for t in incident if not used[t[0]]]
            if len(incident) != 2 or len(nxt) != 1:
                break
            cur, which = nxt[0]
            fwd = which == 0
            used[cur] = True
            seq.append((cur, fwd))
        return seq

    for i in range(n):
        if used[i]:
            continue
        fwd_seq = extend(i, True)
        used[i] = False
        back_seq = extend(i, False)[1:]
        used[i] = True
        pre = [(ix, not f) for ix, f in reversed(back_seq)]
        seq = pre + fwd_seq
        parts = []
        members = []
        for ix, f in seq:
            coords = np.asarray(lines[ix], dtype=np.float64)
            parts.append(coords if f else coords[::-1])
            members.append(ix)
        stitched = [parts[0]] + [p[1:] for p in parts[1:]]
        chains.append((np.concatenate(stitched, axis=0), members))
    return chains


def dedup_stage(arcs: DataFrame):
    """Input: cut output. Returns (arcs_final, refs_final):

    arcs_final(final_idx, is_shared, coords)
    refs_final(feature_seq, fkey, object_name, unit_seq, ring_seq, gtype,
               is_ring, split_seq, final_idx, is_shared)
    """

    @F.pandas_udf(T.BinaryType())
    def dup_digest(coords: pd.Series) -> pd.Series:
        return coords.map(
            lambda c: hashlib.sha1(
                K.canonical_dup_bytes(np.asarray([list(p) for p in c]))
            ).digest()
        )

    arcs = arcs.withColumn("dig", dup_digest("coords")).localCheckpoint(
        eager=False
    )

    # keep the max extract position within each duplicate group (struct
    # lexicographic max == the reference's positional keep-max); no sort
    keeps = arcs.groupBy("dig").agg(F.max(_okey()).alias("kept"))
    mapped = arcs.join(keeps, on="dig").drop("dig").localCheckpoint(eager=False)

    refs0 = mapped.select(
        "feature_seq",
        "fkey",
        "object_name",
        "unit_seq",
        "ring_seq",
        "gtype",
        "is_ring",
        "split_seq",
        "kept",
    )
    kept_arcs = mapped.where(_okey() == F.col("kept")).select("kept", "coords")

    # shared arcs: referenced more than once after dedup (dedup.py:203-205)
    shared0 = (
        refs0.groupBy("kept")
        .agg(F.count(F.lit(1)).alias("n_refs"))
        .withColumn("is_shared", F.col("n_refs") > 1)
        .select("kept", "is_shared")
    )

    # ---- contiguous merge eligibility (incl. the padded-array quirk) ----
    row_stats = refs0.groupBy(*_ROW_KEY).agg(
        F.count(F.lit(1)).alias("row_len")
    )
    max_len_row = row_stats.agg(F.max("row_len").alias("m")).collect()[0]
    max_len = int(max_len_row["m"]) if max_len_row["m"] is not None else 0

    popped_merge = None
    merged_coords = None
    if max_len > 1:
        refs_flag = refs0.join(shared0, on="kept")
        bad_rows = (
            refs_flag.where(
                (
                    (F.col("split_seq") == 0)
                    | (F.col("split_seq") == max_len - 1)
                )
                & F.col("is_shared")
            )
            .select(*_ROW_KEY)
            .distinct()
        )
        eligible = (
            row_stats.where(F.col("row_len") == max_len)
            .join(bad_rows, on=_ROW_KEY, how="left_anti")
            .select(*_ROW_KEY)
        )
        merge_in = (
            refs_flag.join(eligible, on=_ROW_KEY)
            .where(~F.col("is_shared"))
            .join(kept_arcs, on="kept")
            .select(*_ROW_KEY, "split_seq", "kept", "coords")
        )

        kept_t = T.StructType(
            [
                T.StructField("feature_seq", T.LongType()),
                T.StructField("unit_seq", T.IntegerType()),
                T.StructField("ring_seq", T.IntegerType()),
                T.StructField("split_seq", T.IntegerType()),
            ]
        )
        out_schema = T.StructType(
            [
                T.StructField("kept", kept_t),
                T.StructField("action", T.StringType()),
                T.StructField(
                    "new_coords", T.ArrayType(T.ArrayType(T.DoubleType()))
                ),
            ]
        )

        def merge_row(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("split_seq")
            pieces = [
                np.asarray([list(p) for p in c], dtype=np.float64)
                for c in pdf["coords"]
            ]
            keys = list(pdf["kept"])
            chains = merge_lines_with_members(pieces)
            if len(chains) == len(pieces):
                return pd.DataFrame(columns=["kept", "action", "new_coords"])
            fused = [
                (min(members), chain, members)
                for chain, members in chains
                if len(members) >= 2
            ]
            if not fused:
                return pd.DataFrame(columns=["kept", "action", "new_coords"])
            fused.sort(key=lambda t: t[0])
            _, chain, members = fused[0]

            def key_tuple(k):
                return (
                    k["feature_seq"],
                    k["unit_seq"],
                    k["ring_seq"],
                    k["split_seq"],
                )

            member_keys = [keys[m] for m in members]
            keep = max(member_keys, key=key_tuple)
            rows = [(keep, "keep", chain.tolist())]
            rows += [
                (k, "pop", None)
                for k in member_keys
                if key_tuple(k) != key_tuple(keep)
            ]
            return pd.DataFrame(rows, columns=["kept", "action", "new_coords"])

        merged = (
            merge_in.groupBy(*_ROW_KEY).applyInPandas(merge_row, schema=out_schema)
        ).localCheckpoint(eager=False)
        popped_merge = merged.where(F.col("action") == "pop").select("kept")
        merged_coords = merged.where(F.col("action") == "keep").select(
            "kept", "new_coords"
        )

    # ---- apply merge results ----
    if popped_merge is not None:
        kept_arcs = kept_arcs.join(popped_merge, on="kept", how="left_anti")
        kept_arcs = (
            kept_arcs.join(merged_coords, on="kept", how="left")
            .withColumn(
                "coords", F.coalesce(F.col("new_coords"), F.col("coords"))
            )
            .drop("new_coords")
        )
        refs_final = refs0.join(popped_merge, on="kept", how="left_anti")
    else:
        refs_final = refs0

    shared_final = (
        refs_final.groupBy("kept")
        .agg(F.count(F.lit(1)).alias("n_refs"))
        .withColumn("is_shared", F.col("n_refs") > 1)
        .select("kept", "is_shared")
    )

    # dense ids: only the (small) survivor set is sorted
    kept_flat = kept_arcs.select(
        F.col("kept.feature_seq").alias("_f"),
        F.col("kept.unit_seq").alias("_u"),
        F.col("kept.ring_seq").alias("_r"),
        F.col("kept.split_seq").alias("_s"),
        "kept",
        "coords",
    )
    arcs_final = dense_index(kept_flat, ["_f", "_u", "_r", "_s"], "final_idx")
    arcs_final = (
        arcs_final.join(shared_final, on="kept", how="left")
        .fillna({"is_shared": False})
        .select("kept", "final_idx", "is_shared", "coords")
    )

    refs_final = refs_final.join(
        arcs_final.select("kept", "final_idx", "is_shared"), on="kept"
    ).drop("kept")
    return arcs_final.drop("kept"), refs_final
