"""Hashmap stage: resolve per-ring arc sequences into signed TopoJSON arcs.

Re-expresses /root/reference/topojson/core/hashmap.py:137-328. The decision
logic (_hash_order / _backward_arcs / _resolve_orient) is inherently
sequential *within one ring* but embarrassingly parallel across rings, so it
runs as an Arrow-batched pandas pass over rows of

    (feature_seq, unit_seq, ring_seq, [ordered arc refs + flags + coords])

Negative encoding: reversed traversal of arc i is written -(i+1)
(hashmap.py:258), decoded downstream with ~arc.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import kernels as K
from ..options import TopoOptions

RESOLVED_SCHEMA = T.StructType(
    [
        T.StructField("feature_seq", T.LongType()),
        T.StructField("fkey", T.StringType()),
        T.StructField("object_name", T.StringType()),
        T.StructField("unit_seq", T.IntegerType()),
        T.StructField("ring_seq", T.IntegerType()),
        T.StructField("signed_arcs", T.ArrayType(T.LongType())),
    ]
)


def _hash_order(arc_ids: np.ndarray, shared_bool: np.ndarray):
    """Port of hashmap.py:137-196 (decision list per shared/non-shared run)."""
    split_arc_ids = np.split(arc_ids, np.nonzero(~shared_bool)[0])
    split_boolean = np.split(shared_bool, np.nonzero(~shared_bool)[0])
    order_of_arc: List[Optional[int]] = [None] * len(split_boolean)
    if len(split_boolean) == 1:
        order_of_arc[0] = 3
    else:
        for idx, split_geom in enumerate(split_boolean):
            if len(split_geom) == 0:
                order_of_arc[idx] = 0
            elif split_geom.sum() == 0:
                order_of_arc[idx] = 0
            elif split_geom.sum() == len(split_geom):
                next_arc = split_arc_ids[idx + 1][0]
                split_arc_ids[idx] = np.append(split_arc_ids[idx], next_arc)
                order_of_arc[idx] = 2
            else:
                order_of_arc[idx] = 1
    return order_of_arc, split_arc_ids


def backward_arcs(
    arc_ids: List[int],
    shared: List[bool],
    coords_by_id: dict,
    inner: bool,
    winding_order: Optional[str],
) -> List[int]:
    """Port of hashmap.py:198-311 including the loop-carried
    previous_arc_backwards state and the order-3 winding double-check
    (hashmap.py:296-309). ``coords_by_id`` maps final arc id -> np array."""
    arc_ids = np.asarray(arc_ids, dtype=np.int64)
    shared_bool = np.asarray(shared, dtype=bool)
    order_of_arc, split_arc_ids = _hash_order(arc_ids, shared_bool)

    order = 0
    for idx_outer, split_arc in enumerate(split_arc_ids):
        order = order_of_arc[idx_outer]
        if order == 0:
            continue
        if order == 2:
            split_arc = split_arc[::-1]

        previous_arc_backwards = False
        for idx, arc_idx in enumerate(split_arc):
            if idx == 0:
                continue
            arc_idx_prev = split_arc[idx - 1]
            if arc_idx_prev < 0:
                arc_idx_prev = abs(arc_idx_prev) - 1

            current_arc = coords_by_id[int(arc_idx)]
            previous_arc = coords_by_id[int(arc_idx_prev)]
            coord_f = current_arc[0]
            coord_l = current_arc[-1]
            if not previous_arc_backwards:
                coord_f_prev, coord_l_prev = previous_arc[0], previous_arc[-1]
            else:
                coord_f_prev, coord_l_prev = previous_arc[-1], previous_arc[0]

            if order == 1:
                if not np.array_equiv(coord_l_prev, coord_f):
                    split_arc[idx] = -(arc_idx + 1)
                    previous_arc_backwards = True
                else:
                    previous_arc_backwards = False
            elif order == 2:
                if not np.array_equiv(coord_f_prev, coord_l):
                    split_arc[idx] = -(arc_idx + 1)
                    previous_arc_backwards = True
                else:
                    previous_arc_backwards = False
            elif order == 3:
                if np.array_equiv(coord_f_prev, coord_l) and not np.array_equiv(
                    coord_l_prev, coord_f
                ):
                    split_arc[idx - 1] = -(arc_idx_prev + 1)
                    split_arc[idx] = -(arc_idx + 1)
                    previous_arc_backwards = True
                elif np.array_equiv(coord_f, coord_f_prev):
                    split_arc[idx - 1] = -(arc_idx_prev + 1)
                    previous_arc_backwards = False
                elif not np.array_equiv(coord_l_prev, coord_f):
                    split_arc[idx] = -(arc_idx + 1)
                    previous_arc_backwards = True
                else:
                    previous_arc_backwards = False

        if order == 2:
            split_arc_ids[idx_outer] = split_arc[::-1]
        else:
            split_arc_ids[idx_outer] = split_arc

    comb = np.concatenate(split_arc_ids).flatten()
    _, idx_arcs = np.unique(comb, return_index=True)
    out = comb[np.sort(idx_arcs)].tolist()

    # NOTE: like the reference, `order` is the *last* split run's order
    if order == 3:
        if inner and winding_order == "CCW_CW":
            need_ccw = False
        elif not inner and (winding_order == "CW_CCW" or winding_order is None):
            need_ccw = False
        else:
            need_ccw = True
        out = _resolve_orient(out, need_ccw, coords_by_id)
    return [int(v) for v in out]


def _resolve_orient(arcs_idx: List[int], need_ccw: bool, coords_by_id: dict):
    """hashmap.py:313-328: stitch the ring, test winding, flip all if wrong."""
    parts = []
    for arc_idx in arcs_idx:
        if arc_idx < 0:
            parts.append(coords_by_id[int(~arc_idx)][::-1])
        else:
            parts.append(coords_by_id[int(arc_idx)])
    lring = np.vstack(parts)
    if K.is_ccw(lring) != need_ccw:
        return (np.array(arcs_idx) * -1 - 1).tolist()
    return arcs_idx


def hashmap_stage(
    refs_final: DataFrame, arcs_final: DataFrame, options: TopoOptions
) -> DataFrame:
    """Resolve every line row's arc refs into signed arc lists."""
    winding = options.winding_order

    rows = (
        refs_final.join(
            arcs_final.select(
                F.col("final_idx").alias("_fi"), F.col("coords").alias("_coords")
            ),
            on=refs_final["final_idx"] == F.col("_fi"),
        )
        .groupBy("feature_seq", "fkey", "object_name", "unit_seq", "ring_seq")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("split_seq", "final_idx", "is_shared", "_coords")
                )
            ).alias("entries")
        )
    )

    def resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                entries = sorted(row.entries, key=lambda e: e["split_seq"])
                ids = [int(e["final_idx"]) for e in entries]
                shared = [bool(e["is_shared"]) for e in entries]
                coords_by_id = {
                    int(e["final_idx"]): np.asarray(
                        [list(p) for p in e["_coords"]], dtype=np.float64
                    )
                    for e in entries
                }
                if len(ids) > 1:
                    signed = backward_arcs(
                        ids,
                        shared,
                        coords_by_id,
                        inner=row.ring_seq > 0,
                        winding_order=winding,
                    )
                else:
                    signed = ids
                out.append(
                    (
                        row.feature_seq,
                        row.fkey,
                        row.object_name,
                        row.unit_seq,
                        row.ring_seq,
                        signed,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESOLVED_SCHEMA.fields]
            )

    return rows.mapInPandas(resolve, schema=RESOLVED_SCHEMA)
