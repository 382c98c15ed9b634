"""Corpus generator + span invariants + checkpoint/resume tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from topojson_spark.sources.corpus import generate_documents, span_manifest


def test_corpus_deterministic(spark):
    a = generate_documents(spark, 50, 4, 4).collect()
    b = generate_documents(spark, 50, 4, 4).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    da = {r["doc_id"]: r["spans"] for r in a}
    db = {r["doc_id"]: r["spans"] for r in b}
    assert da == db


def test_corpus_partitioning_invariant(spark):
    """Same corpus regardless of parallelism (content-derived generation)."""
    a = {r["doc_id"]: r["spans"] for r in generate_documents(spark, 40, 4, 4, partitions=2).collect()}
    b = {r["doc_id"]: r["spans"] for r in generate_documents(spark, 40, 4, 4, partitions=7).collect()}
    assert a == b


def test_span_sequence_invariant(spark):
    """BASELINE input_hint: offsets strictly increasing, kinds valid, and the
    manifest preserves (kind, text, media_ref, order) per doc."""
    docs = generate_documents(spark, 60, 4, 4)
    m = span_manifest(spark, docs).collect()
    by_doc = {}
    for r in m:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["span_ix"])
        offs = [r["offset"] for r in rows]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        assert all(r["kind"] in ("text", "geometry", "media") for r in rows)
        for r in rows:
            if r["kind"] == "media":
                assert r["media_ref"].startswith("s3://")
            if r["kind"] == "geometry":
                assert '"type"' in r["text"]


def test_mosaic_topology_closed_form(spark):
    """FIXTURES §3: W x H lattice -> every interior edge shared by exactly 2
    polygons. Arcs of the planar grid graph are computable in closed form
    when every junction is a lattice corner."""
    from topojson_spark.topology import Topology

    w = h = 3
    docs = generate_documents(spark, w * h, w, h)  # mosaic only, no lines
    t = Topology(docs, prequantize=False)
    # interior edges are shared (deduped): horizontal interior = w*(h-1),
    # vertical interior = (w-1)*h
    n_shared = t.arcs.where("is_shared").count()
    assert n_shared == w * (h - 1) + (w - 1) * h  # 12 for 3x3
    # geojson round-trip restores every square
    fc = t.to_geojson()
    assert len(fc["features"]) == w * h
    from topojson_spark.functions import kernels as K

    for feat in fc["features"]:
        ring = np.asarray(feat["geometry"]["coordinates"][0])
        assert len(ring) == 5
        assert abs(K.signed_area(ring)) == pytest.approx(1.0)


def test_checkpoint_resume(spark, tmp_path):
    from topojson_spark.topology import Topology, read_tables

    docs = generate_documents(spark, 9, 3, 3)
    t = Topology(docs, prequantize=False)
    d1 = t.to_dict()
    path = str(tmp_path / "topo_ckpt")
    t.write_tables(path)

    t2 = read_tables(spark, path)
    d2 = t2.to_dict()
    assert d1["arcs"] == d2["arcs"]
    assert d1["bbox"] == d2["bbox"]
    assert d1["objects"].keys() == d2["objects"].keys()
    g1 = d1["objects"]["data"]["geometries"]
    g2 = d2["objects"]["data"]["geometries"]
    assert g1 == g2


def test_stage_metrics_unexecuted_stage_does_not_block(spark):
    """Observation.get blocks forever on a never-executed frame; the
    StageMetrics wrapper must probe non-blockingly and return None."""
    from pyspark.sql import functions as F

    from topojson_spark.plans.metrics import StageMetrics

    sm = StageMetrics()
    df = spark.range(5)
    observed = sm.observe("never_run", df, F.count(F.lit(1)).alias("n"))
    assert sm.get("never_run") is None  # would hang pre-fix
    assert sm.snapshot() == {}
    observed.count()
    # listener delivery is async; poll briefly
    import time

    deadline = time.time() + 10
    while sm.get("never_run") is None and time.time() < deadline:
        time.sleep(0.05)
    assert sm.get("never_run") == {"n": 5}


def test_stage_metrics_and_manifest_verify(spark, tmp_path):
    """North-rule counters + per-partition lineage: observed stage metrics
    appear after the run's own actions, checkpoints carry manifests, and
    verify detects a corrupted checkpoint."""
    from topojson_spark.topology import Topology, read_tables

    docs = generate_documents(spark, 9, 3, 3)
    t = Topology(docs, prequantize=False)
    t.arcs.count()  # executes the pipeline -> populates observations
    m = t.stage_metrics()
    assert m["extract"]["n_features"] == 9
    assert m["extract"]["n_invalid"] == 0
    assert m["extract"]["n_lines"] == 9
    assert m["arcs"]["n_arcs"] == t.arcs.count()
    assert 0 < m["arcs"]["n_shared"] < m["arcs"]["n_arcs"]

    path = str(tmp_path / "topo_ckpt_m")
    t.write_tables(path)
    t2 = read_tables(spark, path, verify=True)  # clean -> no raise
    assert t2.arcs.count() == t.arcs.count()

    # corrupt one parquet part of the arcs table -> verify must fail
    import glob
    import os

    part = sorted(glob.glob(f"{path}/arcs/part-*.parquet"))[0]
    os.remove(part)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="manifest"):
        read_tables(spark, path, verify=True)


def test_durable_stage_checkpoints_and_mid_pipeline_resume(spark, tmp_path):
    """With checkpoint_dir set, every stage boundary lands on storage as
    standalone parquet (survivable across executor AND driver loss, unlike
    localCheckpoint blocks), and checkpoint_resume=True trusts completed
    stages — proven by poisoning the input: a resumed run must reproduce
    the ORIGINAL run's arcs because it never re-reads the input."""
    import os
    import shutil

    from topojson_spark.topology import Topology

    ckpt = str(tmp_path / "stages")
    docs = generate_documents(spark, 9, 3, 3)
    t = Topology(docs, prequantize=False, checkpoint_dir=ckpt)
    n1 = t.arcs.count()
    assert n1 > 0

    stage_dirs = sorted(
        d for d in os.listdir(ckpt) if d.startswith("stage_")
    )
    assert len(stage_dirs) >= 3  # extract parse, cut parts, dedup chain...
    for d in stage_dirs:
        assert os.path.exists(os.path.join(ckpt, d, "_SUCCESS"))
        # each stage readable standalone — no lineage, no in-memory blocks
        assert spark.read.parquet(os.path.join(ckpt, d)).count() >= 0

    # full resume with a poisoned (different) input: all stages trusted
    poisoned = generate_documents(spark, 4, 2, 2, seed=7)
    t2 = Topology(
        poisoned, prequantize=False, checkpoint_dir=ckpt,
        checkpoint_resume=True,
    )
    assert t2.arcs.count() == n1

    # kill-between-stages: drop every stage AFTER the extract parse; the
    # tail recomputes from the surviving stage_000 (the pinned parse of the
    # ORIGINAL input), so the poisoned input still never contributes
    for d in stage_dirs[1:]:
        shutil.rmtree(os.path.join(ckpt, d))
    t3 = Topology(
        poisoned, prequantize=False, checkpoint_dir=ckpt,
        checkpoint_resume=True,
    )
    assert t3.arcs.count() == n1

    # no resume flag -> stages overwritten from the new input
    t4 = Topology(poisoned, prequantize=False, checkpoint_dir=ckpt)
    assert t4.arcs.count() != n1


def test_features_from_documents_non_numeric_doc_ids(spark):
    """Non-numeric doc_ids must get an EXACT dense feature order (a hashed
    surrogate can collide, merging two documents' feature identity); the
    numeric-suffix corpus invariant keeps the narrow arithmetic path."""
    from topojson_spark.operators.extract import features_from_documents

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    line = '{"type":"LineString","coordinates":[[0,0],[1,0]]}'
    span = {"kind": "geometry", "text": line, "media_ref": None, "offset": 0}
    docs = spark.createDataFrame(
        [("zebra", [span]), ("apple", [span, dict(span, offset=5)])], schema
    )
    out = (
        features_from_documents(docs)
        .orderBy("feature_seq")
        .select("feature_seq", "fkey")
        .collect()
    )
    assert [r["feature_seq"] for r in out] == [0, 1, 2]
    assert [r["fkey"] for r in out] == ["apple#0", "apple#1", "zebra#0"]

    docs2 = spark.createDataFrame(
        [("doc_0007", [span]), ("doc_0002", [span, dict(span, offset=5)])],
        schema,
    )
    out2 = (
        features_from_documents(docs2).orderBy("feature_seq")
        .select("fkey").collect()
    )
    assert [r["fkey"] for r in out2] == [
        "doc_0002#0", "doc_0002#1", "doc_0007#0",
    ]


def test_table_seam_path_and_identifier(spark, tmp_path):
    """read_table/write_table resolve both forms: parquet paths and catalog
    identifiers (temp view here; an Iceberg catalog is a session-config
    swap, sources/tables.py docstring)."""
    from topojson_spark.sources.tables import is_path, read_table, write_table

    assert is_path("/x/y") and is_path("s3://b/k") and not is_path("db.t")

    df = spark.range(5).selectExpr("id AS doc_id", "id % 2 AS part")
    p = str(tmp_path / "tbl")
    write_table(df, p, partition_by=["part"])
    assert read_table(spark, p).count() == 5

    df.createOrReplaceTempView("tmp_docs_seam")
    assert read_table(spark, "tmp_docs_seam").count() == 5


def test_table_seam_catalog_roundtrip(spark, tmp_path):
    """The one seam production flips to Iceberg, exercised against the
    session catalog's real contract: write_table(identifier) routes
    through saveAsTable, read_table(identifier) returns the identical
    frame, and partition_by is honored in the table's physical layout
    (partition directories) AND its catalog metadata."""
    import os

    from topojson_spark.sources.tables import read_table, write_table

    df = spark.range(20).selectExpr(
        "id AS doc_id", "id % 4 AS part", "concat('t', id) AS text"
    )
    name = "seam_roundtrip_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_table(df, name, partition_by=["part"])

    back = read_table(spark, name)
    assert sorted(map(tuple, back.select("doc_id", "part", "text").collect())) \
        == sorted(map(tuple, df.collect()))

    # partitioning honored: catalog metadata lists `part` as a partition
    # column and the managed location has part=N directories
    cols = {
        (c.name, c.isPartition) for c in spark.catalog.listColumns(name)
    }
    assert ("part", True) in cols
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
        .where("col_name = 'Location'").collect()[0]["data_type"]
    )
    path = loc.replace("file:", "")
    assert {f"part={i}" for i in range(4)} <= set(os.listdir(path))

    # overwrite mode replaces, append accumulates — through the seam
    write_table(df.where("part = 0"), name, mode="overwrite",
                partition_by=["part"])
    assert read_table(spark, name).count() == 5
    write_table(df.where("part = 1"), name, mode="append",
                partition_by=["part"])
    assert read_table(spark, name).count() == 10
    spark.sql(f"DROP TABLE {name}")


def test_table_seam_rejects_ambiguous_strings(spark, tmp_path):
    """A string that is neither a recognizable path nor a valid dotted
    identifier (a bare relative path like 'data/tbl') must fail fast with
    guidance, not fall through to a catalog parse error or resolve
    against an unintended namespace."""
    import pytest

    from topojson_spark.sources.tables import read_table, write_table

    df = spark.range(3).selectExpr("id AS doc_id")
    for bad in ("data/tbl", "my table", "db.ta-ble", ""):
        with pytest.raises(ValueError, match="ambiguous table source"):
            write_table(df, bad)
        with pytest.raises(ValueError, match="ambiguous table source"):
            read_table(spark, bad)
    # backtick-quoted identifiers with exotic characters stay legal
    from topojson_spark.sources.tables import _IDENT_RE

    assert _IDENT_RE.match("lake.corpus.documents")
    assert _IDENT_RE.match("`my db`.`ta-ble`")
