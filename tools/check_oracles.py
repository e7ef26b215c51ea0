"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND its
oracle_sql() in DuckDB (views over the same parquet), compares row count,
column names, and order-insensitive per-column sorted values.

Usage: python tools/check_oracles.py [query_key ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def compare(name, spark_df, sql, con) -> list[str]:
    problems = []
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    if len(sp) != len(du):
        problems.append(f"row count: spark={len(sp)} duckdb={len(du)}")
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    if sp_cols != du_cols:
        problems.append(f"columns: spark={sp_cols} duckdb={du_cols}")
        return problems
    for c in sp_cols:
        a = sp[c].tolist()
        b = du[c].tolist()
        try:
            a_s = sorted(a, key=lambda x: (x is None, x))
            b_s = sorted(b, key=lambda x: (x is None, x))
        except TypeError:
            a_s, b_s = sorted(map(str, a)), sorted(map(str, b))
        for i, (x, y) in enumerate(zip(a_s, b_s)):
            same = x == y or (
                isinstance(x, float) and isinstance(y, float)
                and (x == y or (math.isnan(x) and math.isnan(y)))
            )
            if not same:
                problems.append(f"col {c}[{i}]: spark={x!r} duckdb={y!r}")
                break
    return problems


def main():
    import __spark_entry__ as e
    from ddsketchy_spark.spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oracles = e.oracle_sql()
    keys = sys.argv[1:] or list(qs)
    failed = []
    for k in keys:
        if k not in oracles:
            print(f"  {k}: (rows-only) ", end="")
            n = qs[k](spark, SF_DIR).count()
            print(f"{n} rows {'OK' if n >= 0 else 'FAIL'}")
            continue
        probs = compare(k, qs[k](spark, SF_DIR), oracles[k], con)
        if probs:
            failed.append(k)
            print(f"  {k}: FAIL")
            for p in probs[:5]:
                print(f"      {p}")
        else:
            print(f"  {k}: OK")
    print(f"{len(keys) - len(failed)}/{len(keys)} queries match")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
