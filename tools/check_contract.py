"""Local simulation of the driver's correctness gate: runs entry(spark),
then each queries()[name] at sf0.01 side-by-side with oracle_sql()[name] in
DuckDB, comparing row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [only_query1,only_query2,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("contract-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    print("== entry(spark) smoke ==")
    edf = entrymod.entry(spark)
    rows = edf.collect()
    print(f"entry: {len(rows)} rows, schema={edf.schema.simpleString()}")
    assert len(rows) >= 0

    qs = entrymod.queries()
    if ONLY:
        unknown = ONLY - set(qs)
        assert not unknown, f"unknown query names: {sorted(unknown)}"
        qs = {k: v for k, v in qs.items() if k in ONLY}
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        try:
            got = fn(spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-run ] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        want = con.execute(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            fails.append((name, f"schema {list(g.columns)} vs {list(w.columns)}"))
            print(f"[FAIL-cols] {name}: {list(g.columns)} vs {list(w.columns)}")
        elif len(g) != len(w):
            fails.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"[FAIL-rows] {name}: {len(g)} vs {len(w)}")
        else:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=False, atol=1e-6
                )
                print(f"[OK       ] {name}: {len(g)} rows")
            except AssertionError as e:
                fails.append((name, "value mismatch"))
                print(f"[FAIL-vals] {name}:\n{str(e)[:500]}")
    spark.stop()
    print(f"\n{len(qs) - len(fails)}/{len(qs)} queries OK")
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
