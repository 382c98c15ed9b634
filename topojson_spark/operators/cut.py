"""Cut stage: split linestrings at junctions.

Re-expresses /root/reference/topojson/core/cut.py:80-174. The reference
queries an STRtree of junctions per line; here the junction set is joined to
the lines (vertex-key equi-join in coords-connected mode, bbox-cell join in
path-connected mode) and the actual split runs the exact fast_split kernel
(ops.py:270-335, including ring rotation) inside an Arrow UDF.

Output: one row per arc —
    arcs(feature_seq, fkey, object_name, unit_seq, ring_seq, gtype,
         is_ring, split_seq, coords)
(feature_seq, unit_seq, ring_seq, split_seq) is the reference's positional
extract order; dense ids are minted only at write time.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import kernels as K

ARCS_SCHEMA = T.StructType(
    [
        T.StructField("feature_seq", T.LongType()),
        T.StructField("fkey", T.StringType()),
        T.StructField("object_name", T.StringType()),
        T.StructField("unit_seq", T.IntegerType()),
        T.StructField("ring_seq", T.IntegerType()),
        T.StructField("gtype", T.StringType()),
        T.StructField("is_ring", T.BooleanType()),
        T.StructField("split_seq", T.IntegerType()),
        T.StructField("coords", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)

_LINE_COLS = [
    "feature_seq",
    "fkey",
    "object_name",
    "unit_seq",
    "ring_seq",
    "gtype",
    "is_ring",
    "coords",
]


def _emit_parts(row, parts, out):
    for si, part in enumerate(parts):
        out.append(
            (
                row.feature_seq,
                row.fkey,
                row.object_name,
                row.unit_seq,
                row.ring_seq,
                row.gtype,
                row.is_ring,
                si,
                part.tolist(),
            )
        )


def _cut_with_splitters(lines_with_split: DataFrame, path_mode: bool) -> DataFrame:
    """lines frame must carry a ``splitters`` array<array<double>> column
    (null/empty when the line has no junction candidates)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                line = np.asarray([list(c) for c in row.coords], dtype=np.float64)
                spl = row.splitters
                if spl is None or len(spl) == 0:
                    _emit_parts(row, [K.remove_collinear_points(line)], out)
                    continue
                pts = np.asarray([list(p) for p in spl], dtype=np.float64)
                if path_mode:
                    # select junctions on the line (1e-8), insert missing
                    # vertices, then split at all of them (cut.py:130 +
                    # ops.py:194-267)
                    d, _ = K._dist_and_proj_to_polyline(pts, line)
                    pts_on = pts[d < K.ON_LINE_TOL]
                    if len(pts_on) == 0:
                        _emit_parts(row, [K.remove_collinear_points(line)], out)
                        continue
                    line = K.insert_points_on_line(line, pts_on)
                    keys = K.packed_vertex_keys(pts_on)
                else:
                    keys = K.packed_vertex_keys(pts)
                parts = K.fast_split(line, keys, bool(row.is_ring))
                parts = [K.remove_collinear_points(p) for p in parts]
                _emit_parts(row, parts, out)
            yield pd.DataFrame(
                out, columns=[f.name for f in ARCS_SCHEMA.fields]
            )

    return lines_with_split.mapInPandas(run, schema=ARCS_SCHEMA)


def cut_stage(
    lines: DataFrame,
    junctions: Optional[DataFrame],
    shared_coords: bool,
    bbox: Optional[Tuple] = None,
) -> DataFrame:
    """Split lines at junctions; always drops collinear interior vertices
    (cut.py:136-147 does so on every path)."""
    lines = lines.select(*_LINE_COLS).withColumn(
        "lid",
        F.xxhash64(F.col("feature_seq"), F.col("unit_seq"), F.col("ring_seq")),
    )

    if junctions is None:
        no_split = lines.withColumn(
            "splitters", F.lit(None).cast(T.ArrayType(T.ArrayType(T.DoubleType())))
        )
        return _cut_with_splitters(no_split, path_mode=False)

    if shared_coords:
        # exact vertex-key equi-join: junction must be an existing vertex
        verts = lines.select(
            "lid",
            F.explode(
                F.expr(
                    "transform(coords, c -> struct("
                    "bigint(round(c[0] * 1e8)) as kx,"
                    "bigint(round(c[1] * 1e8)) as ky))"
                )
            ).alias("v"),
        ).select("lid", "v.kx", "v.ky").dropDuplicates(["lid", "kx", "ky"])
        jkeys = junctions.select(
            F.round(F.col("jx") * 1e8).cast("long").alias("kx"),
            F.round(F.col("jy") * 1e8).cast("long").alias("ky"),
            "jx",
            "jy",
        )
        matched = verts.join(jkeys, on=["kx", "ky"]).select("lid", "jx", "jy")
    else:
        # bbox containment join: junction within the line's envelope
        # (np_array_bbox_points_line, ops.py:162-191); grid cells prune
        if bbox is None:
            raise ValueError("path-connected cut requires the bbox")
        span = max(bbox[2] - bbox[0], bbox[3] - bbox[1])
        cell = span / 64 if span > 0 else 1.0
        from .join import _with_bbox_cells

        lcells = _with_bbox_cells(lines.select("lid", "coords"), bbox, cell)
        jcells = junctions.select(
            "jx",
            "jy",
            F.floor((F.col("jx") - F.lit(bbox[0])) / F.lit(cell)).alias("cx"),
            F.floor((F.col("jy") - F.lit(bbox[1])) / F.lit(cell)).alias("cy"),
        )
        xs = F.expr("transform(coords, c -> c[0])")
        ys = F.expr("transform(coords, c -> c[1])")
        matched = (
            lcells.join(jcells, on=["cx", "cy"])
            .where(
                (F.col("jx") >= F.array_min(xs))
                & (F.col("jx") <= F.array_max(xs))
                & (F.col("jy") >= F.array_min(ys))
                & (F.col("jy") <= F.array_max(ys))
            )
            .select("lid", "jx", "jy")
            .dropDuplicates(["lid", "jx", "jy"])
        )

    splitters = matched.groupBy("lid").agg(
        F.collect_list(F.array("jx", "jy")).alias("splitters")
    )
    with_split = lines.join(splitters, on="lid", how="left")
    return _cut_with_splitters(with_split, path_mode=not shared_coords)
