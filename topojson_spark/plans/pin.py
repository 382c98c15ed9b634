"""Stage-output pinning.

Two flavors:

- ``pin``: SQL columnar cache (compressed byte buffers, spills to disk).
  Lineage stays intact — re-derivable after executor loss.
- ``pin_truncate``: lazy ``localCheckpoint`` — persists AND replaces the
  logical plan with a LogicalRDD. The topology pipeline chains six stages
  whose *analysis* cost grows with the accumulated plan (every derived
  frame re-analyzes the whole tree, and AQE re-plans it per exchange);
  truncating at the stage boundaries keeps downstream plans O(stage)
  instead of O(pipeline). Tradeoff: checkpoint blocks are not re-derivable
  after executor loss — acceptable because durable resume goes through
  write_tables/read_tables (north rule), not in-memory lineage."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Lazily persist a stage output (columnar, memory-then-disk)."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


import os


def pin_truncate(df: DataFrame) -> DataFrame:
    """Lazily persist AND truncate logical lineage (stage boundary)."""
    if os.environ.get("SPARK_GRAFT_NO_TRUNCATE"):
        return pin(df)
    return df.localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK_DESER
    )
