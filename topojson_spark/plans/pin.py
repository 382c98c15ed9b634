"""Stage-output pinning.

Big intermediate frames are persisted with the SQL columnar cache
(compressed byte buffers, GC-friendly, spills to disk) rather than
``localCheckpoint`` — local checkpoints store deserialized Java rows, which
at 10M+ rows of array<array<double>> turn into multi-GB object graphs and
GC storms. Lineage stays intact (re-derivable after executor loss, unlike a
local checkpoint, whose blocks die with the executor)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Lazily persist a stage output (columnar, memory-then-disk)."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)
