"""Hierarchical quantized-grid cell index (S2/H3-style, pure integer math).

A *cell* at level L is one square of a 2^L x 2^L grid over a fixed bbox; its
id is the Morton (Z-order) interleave of the (ix, iy) grid coordinates plus
the level tag in the high bits, so parent/child relationships are bit
shifts — the property the kNN ring expansion and the tile rollup rely on.
No native dependencies (the sandbox has no H3/S2 libs); semantics follow the
public S2 curve design (hierarchical containment + locality).

All functions exist twice: a numpy form (used inside Arrow UDFs) and a Spark
Column form (used in joins so cell derivation stays in whole-stage codegen).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LEVEL = 26  # 2^26 cells per axis; ids fit comfortably in int64


# ------------------------------------------------------------- numpy form


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 26 bits of v to even bit positions (Morton helper)."""
    v = v.astype(np.uint64) & np.uint64(0x3FFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (_part1by1(ix) | (_part1by1(iy) << np.uint64(1))).astype(np.int64)


def cell_id(
    x: np.ndarray, y: np.ndarray, bbox: Tuple[float, float, float, float],
    level: int,
) -> np.ndarray:
    """Cell id of each (x, y) at the given level."""
    n = 1 << level
    w = (bbox[2] - bbox[0]) or 1.0
    h = (bbox[3] - bbox[1]) or 1.0
    ix = np.clip(((np.asarray(x) - bbox[0]) / w * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(y) - bbox[1]) / h * n).astype(np.int64), 0, n - 1)
    return encode(ix, iy, level)


def encode(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    return (np.int64(level) << np.int64(56)) | morton(
        np.asarray(ix, dtype=np.int64), np.asarray(iy, dtype=np.int64)
    )


def decode(cid: np.ndarray):
    """(level, ix, iy) from cell ids."""
    cid = np.asarray(cid, dtype=np.int64)
    level = (cid >> np.int64(56)).astype(np.int64)
    m = cid & np.int64((1 << 56) - 1)
    ix = _compact1by1(m.astype(np.uint64))
    iy = _compact1by1((m >> np.int64(1)).astype(np.uint64))
    return level, ix.astype(np.int64), iy.astype(np.int64)


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x3FFFFFF)
    return v


def parent(cid: np.ndarray, levels_up: int = 1) -> np.ndarray:
    level, ix, iy = decode(cid)
    new_level = level - levels_up
    return encode(ix >> levels_up, iy >> levels_up, int(new_level[0]) if np.ndim(new_level) else int(new_level))


def ring_cells(ix: int, iy: int, level: int, k: int) -> np.ndarray:
    """Cell ids of the square ring at Chebyshev distance k (k=0: the cell)."""
    n = 1 << level
    if k == 0:
        return encode(np.array([ix]), np.array([iy]), level)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            xs.append(ix + dx)
            ys.append(iy + dy)
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            xs.append(ix + dx)
            ys.append(iy + dy)
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    ok = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    return encode(xs[ok], ys[ok], level)


# ------------------------------------------------------------- Spark form


def cell_col(
    x: Column, y: Column, bbox: Tuple[float, float, float, float], level: int
) -> Column:
    """Spark Column cell id (stays in codegen: no UDF)."""
    n = 1 << level
    w = (bbox[2] - bbox[0]) or 1.0
    h = (bbox[3] - bbox[1]) or 1.0
    ix = F.least(
        F.greatest(
            F.floor((x - F.lit(bbox[0])) / F.lit(w) * F.lit(n)).cast("long"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    iy = F.least(
        F.greatest(
            F.floor((y - F.lit(bbox[1])) / F.lit(h) * F.lit(n)).cast("long"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    return grid_cell_col(ix, iy, level)


def grid_cell_col(ix: Column, iy: Column, level: int) -> Column:
    """Morton interleave as a Spark expression (6 shift/mask rounds each)."""

    def spread(c: Column) -> Column:
        c = c.bitwiseAND(F.lit(0x3FFFFFF))
        c = c.bitwiseOR(F.shiftleft(c, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x3333333333333333))
        c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x5555555555555555))
        return c

    return (
        F.lit(level).cast("long") * F.lit(1 << 56)
        + spread(ix)
        + F.shiftleft(spread(iy), 1)
    )
