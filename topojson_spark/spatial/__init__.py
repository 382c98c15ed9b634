"""Spatial layer (north rule; no reference counterpart): hierarchical cell
index, point-in-polygon joins, kNN via cell-ring expansion, raster<->vector
tile assignment."""
