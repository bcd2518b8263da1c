"""General per-query oracle re-check (the re-verification recipe
referenced by OPERATORS.md and the verify skill): run the named
declared queries on a VANILLA SparkSession (no build_session conf) and
compare to DuckDB oracles the same way the driver does (sort columns by
name, hash values). Usage: python scripts/check_fixes.py [name ...]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from chapterhousedb_spark.workload import QUERIES, ORACLES  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

if "--audit-empty" in sys.argv[1:]:
    # emptiness audit (VERDICT r6 #3): a 0-row oracle is a vacuous
    # gate. DuckDB-only — no Spark session needed, runs in seconds.
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = []
    for name, osql in ORACLES.items():
        try:
            n = len(con.execute(osql).fetchdf())
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERR {type(e).__name__}: {e}"))
            continue
        if n == 0:
            bad.append((name, "0 rows"))
    for name, why in bad:
        print(f"{name}: VACUOUS ({why})")
    print(f"audit-empty: {len(ORACLES) - len(bad)}/{len(ORACLES)} non-empty")
    sys.exit(1 if bad else 0)

names = sys.argv[1:] or [
    "window_lag_delta", "events_hourly", "events_sessionize",
    "events_json", "asof_join_events", "scalar_funcs",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.round(6) if any(df.dtypes == "float64") else df
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in names:
    try:
        sdf = QUERIES[name](spark, SF).toPandas()
        if name not in ORACLES:
            print(f"{name}: rows={len(sdf)} (rows-only, no oracle)")
            continue
        odf = con.execute(ORACLES[name]).fetchdf()
        a, b = norm(sdf), norm(odf)
        rows_ok = len(a) == len(b)
        cols_ok = list(a.columns) == list(b.columns)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-6, atol=1e-9)
            val_ok = True
        except AssertionError as e:
            val_ok = False
            err = str(e).split("\n")[0:6]
        status = "PASS" if (rows_ok and cols_ok and val_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{name}: {status} rows={len(a)}/{len(b)} cols_ok={cols_ok} vals_ok={val_ok}")
        if not val_ok:
            print("  " + " | ".join(err))
        if not cols_ok:
            print(f"  spark={list(a.columns)}\n  oracle={list(b.columns)}")
    except Exception as e:  # noqa: BLE001
        fails += 1
        print(f"{name}: ERR {type(e).__name__}: {e}")

spark.stop()
sys.exit(1 if fails else 0)
