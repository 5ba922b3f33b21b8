#!/usr/bin/env python
"""Strict driver-gate emulation: run every __spark_entry__ query and its
DuckDB oracle at a chosen SF and compare BIT-LEVEL (floats compared by
raw IEEE bytes, so -0.0 vs +0.0 and last-ulp drift fail here exactly as
they would in the driver's value-hash).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
Defaults: /root/testdata/sf0.01, all queries.
Exit code 1 if any query mismatches.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def bit_equal(a, b) -> list[str]:
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            x = av.astype(float).to_numpy()
            y = bv.astype(float).to_numpy()
            if len(x) != len(y) or not all(
                xx.tobytes() == yy.tobytes() for xx, yy in zip(x, y)
            ):
                bad.append(c)
        elif av.astype(str).tolist() != bv.astype(str).tolist():
            bad.append(c)
    return bad


def main() -> int:
    import __spark_entry__ as em
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = em.queries(), em.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            failed.append(name)
            continue
        oracle = oracles.get(name)
        if oracle is None:
            status = "rows-only" if len(got) > 0 else "rows-only EMPTY"
            print(f"{name}: {status} ({len(got)} rows)")
            if len(got) == 0:
                failed.append(name)
            continue
        exp = con.execute(oracle).df()
        if sorted(got.columns) != sorted(exp.columns):
            print(f"{name}: COLUMN MISMATCH {sorted(got.columns)} vs {sorted(exp.columns)}")
            failed.append(name)
            continue
        if len(got) != len(exp):
            print(f"{name}: ROWCOUNT {len(got)} vs {len(exp)}")
            failed.append(name)
            continue
        bad = bit_equal(canon(got), canon(exp))
        if bad:
            print(f"{name}: VALUE MISMATCH in {bad}")
            failed.append(name)
        else:
            print(f"{name}: OK ({len(got)} rows)")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
