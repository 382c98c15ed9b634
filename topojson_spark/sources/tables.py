"""Catalog-table or path source/sink indirection (north-rule table layer).

The north rule targets "Iceberg tables of interleaved text+media documents".
This sandbox ships no Iceberg runtime jar, so the engine keeps table access
behind ONE seam: anything that looks like a path reads/writes parquet;
anything else is a catalog table identifier resolved through the session's
catalog — which IS Iceberg the moment the session is configured with

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hadoop | hive | rest
    ... and sources named like "lake.corpus.documents"

Nothing in the engine changes: reads go through ``spark.read.table`` (time
travel via ``VERSION AS OF`` is the caller's SQL), writes through the same
DataFrameWriter surface, and Iceberg's snapshot isolation then supplies the
atomic-checkpoint property that the parquet fallback approximates with
``_SUCCESS``-gated directories (plans/pin.py, Topology.write_tables).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

# dotted identifier: catalog.db.table, each part a plain word or a
# backtick-quoted segment
_IDENT_RE = re.compile(r"^(`[^`]+`|\w+)(\.(`[^`]+`|\w+))*$")


def is_path(source: str) -> bool:
    """Paths have a scheme or are absolute/relative filesystem refs;
    everything else is a (possibly dotted) catalog identifier."""
    return "://" in source or source.startswith(("/", "./", "../", "file:"))


def _require_identifier(source: str) -> str:
    """Fail fast on strings that are neither a recognizable path nor a
    valid dotted identifier (e.g. a bare relative path like
    ``data/tbl``): silently handing them to the catalog would produce a
    confusing parse error — or worse, resolve against an unintended
    namespace. Callers who mean a relative path must write ``./data/tbl``."""
    if not _IDENT_RE.match(source):
        raise ValueError(
            f"ambiguous table source {source!r}: not a path (no scheme, "
            "not /, ./, ../ or file: prefixed) and not a valid dotted "
            "catalog identifier — prefix relative paths with './'"
        )
    return source


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Read a corpus/operator table from a path (parquet) or a catalog
    table identifier (Iceberg/managed/temp view — whatever the session's
    catalog resolves)."""
    if is_path(source):
        return spark.read.parquet(source)
    return spark.read.table(_require_identifier(source))


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
) -> None:
    """Write to a path (parquet directory + _SUCCESS marker) or a catalog
    table (saveAsTable routes through the configured catalog — an Iceberg
    catalog gives snapshot-isolated commits; the parquet path is atomic
    only at the _SUCCESS granularity).

    Partitioning guidance at 100 TB: documents by a low-cardinality ingest
    key (source/date), never doc_id; leaf tile tables by zoom; embedding
    tables by centroid_id so IVF probes become partition pruning."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if is_path(target):
        w.parquet(target)
    else:
        w.saveAsTable(_require_identifier(target))
