#!/usr/bin/env python3
"""Fleet-wide partitioning-invariance audit: diff two graft.Verify dumps
produced at different shuffle widths (SPARK_GRAFT_CPUS sets both the local
thread count and spark.sql.shuffle.partitions in Verify) and report any
query whose result differs in shape, values, or ROW ORDER.

This is the Spark-side twin of the round-10 DuckDB thread-count sweep that
caught ta_domain_mix's summation-order-dependent normalizer: different
widths => different accumulation orders => any float accumulation or
unstable tie-break flips a value here.

Usage:
  sbt "runMain graft.Verify <sfdir> /tmp/verify_w4"                 # default width
  SPARK_GRAFT_CPUS=5 sbt "runMain graft.Verify <sfdir> /tmp/verify_w5"
  python3 tools/check_width_invariance.py /tmp/verify_w4 /tmp/verify_w5

Round-11 session 2 baseline: 185/185 bit-identical at widths 4 and 5.
"""
import os
import sys

import duckdb


def main(a: str, b: str) -> int:
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    bad = []
    for n in names:
        if not os.path.isdir(os.path.join(b, n)):
            bad.append((n, "missing"))
            continue
        da = con.execute(f"SELECT * FROM '{a}/{n}/*.parquet'").fetchdf()
        db = con.execute(f"SELECT * FROM '{b}/{n}/*.parquet'").fetchdf()
        da = da.reindex(sorted(da.columns), axis=1)
        db = db.reindex(sorted(db.columns), axis=1)
        if list(da.columns) != list(db.columns) or len(da) != len(db):
            bad.append((n, "shape"))
            continue
        def cell_eq(x, y):
            # LIST columns come back as numpy arrays, where `x == y` is
            # element-wise and its truth value raises — compare those with
            # np.array_equal first, then fall through to scalar equality.
            import numpy as np
            if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                return np.array_equal(np.asarray(x), np.asarray(y))
            try:
                if x == y:
                    return True
            except (ValueError, TypeError):
                pass
            return (x is None and y is None) or str(x) == str(y)

        eq = all(
            all(cell_eq(x, y)
                for x, y in zip(da[c].tolist(), db[c].tolist()))
            for c in da.columns)
        if not eq:
            bad.append((n, "values"))
    print(f"{len(names) - len(bad)}/{len(names)} queries bit-identical across widths")
    for n, why in bad:
        print("DIFF", n, why)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
