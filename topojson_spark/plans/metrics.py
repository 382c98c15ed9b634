"""Per-stage counters and per-partition lineage manifests (north rule).

The reference has a single warning counter (invalid geometries,
/root/reference/topojson/core/extract.py:137-143). At cluster scale the
north rule asks for per-partition lineage + metrics so a killed job can
resume from checkpointed stage outputs and an operator can prove what it
processed. Two mechanisms, both zero-extra-job where possible:

- **stage counters** via ``DataFrame.observe`` (Observation API): metrics
  piggyback on whatever action first executes the observed frame — no
  additional pass over the data. ``StageMetrics`` collects them lazily and
  tolerates stages that never ran.
- **partition manifests** at checkpoint-write time: for every table written
  by ``Topology.write_tables`` a small ``<table>_manifest`` parquet records
  (partition_id, n_rows, content_xor) where content_xor is the xor-fold of a
  row hash — order-insensitive, so a resumed read can verify integrity
  without assuming partition layout survived.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class StageMetrics:
    """Registry of per-stage Observations for one pipeline run."""

    def __init__(self):
        self._obs: Dict[str, Observation] = {}
        self._recorded: Dict[str, dict] = {}

    def record(self, name: str, **values) -> None:
        """Record driver-side scalar counters (operators that already hold a
        count on the driver — e.g. the kNN escalation loop's unsatisfied-query
        population — report through here; Observations would cost an extra
        pass there because the scalar IS the loop condition)."""
        self._recorded[name] = dict(values)

    def observe(self, name: str, df: DataFrame, *exprs) -> DataFrame:
        """Attach an Observation named ``name`` to ``df``; metrics become
        available after the first action that executes the observed plan."""
        if not exprs:
            exprs = (F.count(F.lit(1)).alias("n_rows"),)
        obs = Observation(name)
        self._obs[name] = obs
        return df.observe(obs, *exprs)

    def get(self, name: str) -> Optional[dict]:
        if name in self._recorded:
            return self._recorded[name]
        obs = self._obs.get(name)
        if obs is None:
            return None
        # Observation.get BLOCKS until the observed frame's first action, so
        # a stage that never ran would hang the driver forever. Probe the
        # JVM-side Option[Row] non-blockingly instead and return None for
        # unexecuted stages.
        try:
            jo = obs._jo
            if jo is None:
                return None  # observe() registered but plan never built
            opt = jo.getRowOrEmpty()
            if opt.isEmpty():
                return None  # stage not executed (lazy branch never ran)
            from pyspark.serializers import CPickleSerializer

            utils = getattr(
                obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
            )
            row = CPickleSerializer().loads(utils.toPyRow(opt.get()))
            return row.asDict(recursive=False)
        except Exception:
            return None

    def snapshot(self) -> Dict[str, dict]:
        out = dict(self._recorded)
        for name in self._obs:
            m = self.get(name)
            if m is not None:
                out[name] = m
        return out


def partition_manifest(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows, content_xor) per partition of ``df``.

    content_xor is the xor-aggregate of xxhash64 over the row's string form —
    order-insensitive within a partition, cheap, and good enough to detect a
    lost/duplicated partition on resume. Runs as one narrow pass + a tiny
    groupBy (partition count rows, not data rows).
    """
    hashed = df.select(
        F.spark_partition_id().alias("partition_id"),
        F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h"),
    )
    # xor-fold via sum of h with overflow wrap is NOT xor; use bit_xor agg
    return hashed.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("cast(bit_xor(h) as long)").alias("content_xor"),
    )


def write_with_manifest(df: DataFrame, path: str) -> None:
    """Write a stage table plus its per-partition manifest."""
    df.write.mode("overwrite").parquet(path)
    back = df.sparkSession.read.parquet(path)
    partition_manifest(back).write.mode("overwrite").parquet(
        path + "_manifest"
    )


def verify_manifest(spark, path: str) -> bool:
    """Recompute the manifest of a checkpointed table and compare the
    order-insensitive totals (row count + xor of partition xors): True when
    the on-disk data matches what was recorded at write time."""
    from pyspark.errors import AnalysisException

    try:
        data = spark.read.parquet(path)
        want = spark.read.parquet(path + "_manifest")
    except AnalysisException:
        # a table whose every data file is gone cannot even report a
        # schema — that IS a failed verification, not an internal error
        return False
    got = partition_manifest(data)

    def fold(mdf):
        row = mdf.agg(
            F.sum("n_rows").alias("n"),
            F.expr("cast(bit_xor(content_xor) as long)").alias("x"),
        ).collect()[0]
        return (row["n"], row["x"])

    return fold(want) == fold(got)
