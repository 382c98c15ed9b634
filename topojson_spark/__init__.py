"""topojson_spark — a PySpark-native topology, tiling and spatial-join engine.

A from-scratch re-expression of the query semantics of mattijson/topojson
(reference at /root/reference, v1.10) on top of the Spark DataFrame API:

- the extract -> join -> cut -> dedup -> hashmap pipeline becomes a chain of
  DataFrame -> DataFrame stage functions (``topojson_spark.operators``),
- every coordinate-heavy kernel is vectorized numpy inside Arrow-batched
  pandas UDFs (``topojson_spark.functions.kernels``) — no per-row Python UDFs,
- junction detection is a global groupBy on quantized vertex hashes,
- shared-boundary dedup is a deterministic-digest groupBy (keep-max-id,
  matching /root/reference/topojson/core/dedup.py:171-176 semantics),
- the spatial layer (cell index / point-in-polygon / kNN / tiles) lives in
  ``topojson_spark.spatial`` and has no counterpart in the reference
  (mandated by BASELINE.json's north rule).
"""

from .options import TopoOptions

__version__ = "0.1.0"

__all__ = ["TopoOptions", "Topology", "__version__"]


def __getattr__(name):
    # lazy import so pure-numpy kernel users don't need pyspark loaded
    if name == "Topology":
        from .topology import Topology

        return Topology
    raise AttributeError(name)
