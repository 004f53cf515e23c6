"""Driver-style correctness harness: run every queries() entry against its
oracle_sql() twin at a given sf dir (default sf0.01) and report row-count +
schema + order-insensitive value equality. Used interactively and by
tests/test_entry_contract.py.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from qse_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


def compare(name: str, spark_df, sql: str | None, con) -> tuple[bool, str]:
    got = norm_frame(spark_df.toPandas())
    if sql is None:
        return True, f"rows-only ({len(got)})"
    exp = norm_frame(con.sql(sql).df())
    if list(got.columns) != list(exp.columns):
        return False, f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"ROWS got={len(got)} exp={len(exp)}"
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      check_exact=False, rtol=0, atol=1e-9)
        return True, f"match ({len(got)} rows)"
    except AssertionError as e:
        diff = got.compare(exp) if got.shape == exp.shape else None
        return False, f"VALUES {str(e)[:200]}\n{diff.head(5) if diff is not None else ''}"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # gold-backed oracles (minhash/simhash/ANN/winnow/mm, kg_*) must be
    # computed from the SAME sf dir the Spark queries read — plain
    # assignment, so a stale export can never override the CLI argument
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, os_ = entry.queries(), entry.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ok, msg = compare(name, fn(spark, sf), os_.get(name), con)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        n_ok += ok
        n_bad += (not ok)
        print(f"{'OK ' if ok else 'FAIL'} {name:28s} {time.time()-t0:6.1f}s  {msg}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
