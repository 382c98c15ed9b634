"""Streaming ingest: documents arrive continuously; extraction is narrow and
therefore streams; the topology joins are global and run as periodic batch
compaction over the staged extraction output.

This mirrors the reference's batch-only semantics (SURVEY.md §2.10 — the
reference has no streaming surface) while giving the 100 TB pipeline a
continuous front door:

    readStream(documents parquet dir)
      -> extract (mapInPandas, narrow, no shuffle)
      -> writeStream append -> staged lines/points/features tables
      -> (periodic) Topology over the staged tables = batch job

The staged tables are exactly the extract-stage checkpoint, so the batch
topology job resumes from them without re-parsing (north-rule lineage).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract, features_from_documents
from ..options import TopoOptions
from ..sources.corpus import DOCUMENTS_SCHEMA


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_extract(
    documents_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    options: Optional[TopoOptions] = None,
):
    """Continuously shred incoming documents into the staged extraction
    table (the unified record stream: each doc parsed exactly once).

    Returns the running StreamingQuery handles. Append-only parquet;
    exactly-once via the stream checkpoint. Use ``read_staged`` to get the
    lines/points/features views back."""
    from ..operators.extract import extract as _extract

    opts = options or TopoOptions()
    feats_in = features_from_documents(documents_stream, opts.object_names()[0])
    # one streaming write of the unified parse; views derived at read time
    from ..operators import extract as X

    unified = feats_in.mapInPandas(
        X.unified_emit(opts.winding_order), schema=X.UNIFIED_SCHEMA
    )
    q = (
        unified.writeStream.format("parquet")
        .option("path", f"{out_dir}/unified")
        .option("checkpointLocation", f"{checkpoint_dir}/unified")
        .trigger(availableNow=True)
        .start()
    )
    return [q]


def read_staged(spark: SparkSession, out_dir: str):
    """(lines, points, features) views over the staged unified table."""
    from ..operators import extract as X

    unified = spark.read.schema(X.UNIFIED_SCHEMA).parquet(f"{out_dir}/unified")
    lines = unified.where(F.col("rec") == "line").select(
        *[f.name for f in X.LINES_SCHEMA.fields]
    )
    points = unified.where(F.col("rec") == "point").select(
        *[f.name for f in X.POINTS_SCHEMA.fields]
    )
    features = unified.where(F.col("rec") == "feature").select(
        *[f.name for f in X.FEATURES_SCHEMA.fields]
    )
    return lines, points, features


def span_stats_stream(documents_stream: DataFrame) -> DataFrame:
    """Per-kind running span counts — the streaming observability surface
    (counts per micro-batch window; complete-mode aggregation)."""
    spans = documents_stream.select(
        F.posexplode("spans").alias("span_ix", "span")
    )
    return spans.groupBy(F.col("span.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("n_spans")
    )
