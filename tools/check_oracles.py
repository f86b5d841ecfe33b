#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each query from
__spark_entry__.queries() and its oracle_sql() in DuckDB at sf0.01,
compare row count, schema (column names), and sorted values.

Usage: python tools/check_oracles.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    import __spark_entry__ as e
    from graftpark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs, osql = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)
    failures = 0
    for name in names:
        got = qs[name](spark, SF_DIR).toPandas()
        if name not in osql:
            print(f"{name}: NO ORACLE (rows={len(got)})")
            continue
        exp = con.execute(osql[name]).fetch_df()
        ok_rows = len(got) == len(exp)
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            g, x = canon(got), canon(exp)
            try:
                pd.testing.assert_frame_equal(g, x, check_dtype=False, rtol=0, atol=1e-9)
                ok_vals = True
            except AssertionError as err:
                print(f"  diff: {str(err)[:500]}")
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {status} rows {len(got)}/{len(exp)} schema={ok_schema}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
