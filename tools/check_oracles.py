"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, sorted
schema, and an order-insensitive value hash."""

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
    rows = sorted(tuple(map(str, r)) for r in pdf.itertuples(index=False))
    return hashlib.sha1(str(rows).encode()).hexdigest()[:16]


def main(only=None):
    import __spark_entry__ as E
    from topojson_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            results.append((name, "SPARK_FAIL", str(ex)[:200]))
            continue
        dt = time.time() - t0
        if name not in oracles:
            results.append((name, f"ROWS_ONLY({len(sdf)}) {dt:.1f}s", ""))
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            results.append((name, "ORACLE_FAIL", str(ex)[:200]))
            continue
        sc, oc = sorted(sdf.columns), sorted(odf.columns)
        if sc != oc:
            results.append((name, "SCHEMA_MISMATCH", f"{sc} vs {oc}"))
            continue
        if len(sdf) != len(odf):
            results.append((name, "COUNT_MISMATCH", f"{len(sdf)} vs {len(odf)}"))
            continue
        hs, ho = value_hash(sdf), value_hash(odf)
        ok = "OK" if hs == ho else "HASH_MISMATCH"
        results.append((name, f"{ok}({len(sdf)}) {dt:.1f}s", ""))

    print()
    for name, status, detail in results:
        print(f"{name:24s} {status:28s} {detail}")
    bad = [r for r in results if "OK" not in r[1] and "ROWS_ONLY" not in r[1]]
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
