#!/usr/bin/env python3
"""Oracle dtype gate: DESCRIBE every SparkEntry oracle in DuckDB and diff
column names + types against the Spark result parquet schema.

Why this exists: DuckDB quietly promotes aggregates — SUM(BIGINT) -> HUGEINT,
list_sum likewise, AVG(DECIMAL) widens — while Spark stays at BIGINT/DOUBLE.
Values then match but the driver's serialized hash differs, which has cost a
debug cycle in three separate rounds (r7/r8/r9 verdicts). This gate catches
the drift at DESCRIBE time, before any query runs.

Usage:
  python3 tools/check_dtypes.py <sfdir> <verify_out_dir>   # after graft.Verify
  python3 tools/check_dtypes.py --selftest                 # prove it catches an un-cast SUM

Both sides are normalized through DuckDB's own type vocabulary: the Spark
side is DESCRIBE over the dumped result parquet (Spark cannot even write
HUGEINT, so any promotion shows up as a plain type diff).
"""
import json
import sys
import tempfile
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def describe(con, sql):
    """name -> duckdb type for the SELECT's output columns."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def check(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sfdir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracles):
        res_dir = Path(outdir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        try:
            spark_t = describe(con, f"SELECT * FROM '{res_dir}/*.parquet'")
            oracle_t = describe(con, f"({oracles[name]})")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        diffs = []
        if set(spark_t) != set(oracle_t):
            diffs.append(f"columns spark={sorted(spark_t)} oracle={sorted(oracle_t)}")
        else:
            for c in sorted(spark_t):
                if spark_t[c] != oracle_t[c]:
                    diffs.append(f"{c}: spark={spark_t[c]} oracle={oracle_t[c]}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs))
            failures += 1
        else:
            print(f"OK   {name}")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle dtypes match")
    return 1 if failures else 0


def selftest() -> int:
    """The gate must flag a deliberately un-cast SUM (HUGEINT promotion)."""
    with tempfile.TemporaryDirectory() as d:
        con = duckdb.connect()
        res = Path(d) / "bad_sum"
        res.mkdir()
        # what Spark would dump: a BIGINT sum
        con.execute(
            f"COPY (SELECT CAST(42 AS BIGINT) AS s) TO '{res}/part.parquet' (FORMAT PARQUET)")
        good = Path(d) / "good_sum"
        good.mkdir()
        con.execute(
            f"COPY (SELECT CAST(42 AS BIGINT) AS s) TO '{good}/part.parquet' (FORMAT PARQUET)")
        Path(d, "oracle_sql.json").write_text(json.dumps({
            # un-cast: DuckDB promotes SUM(BIGINT) -> HUGEINT -> must FAIL
            "bad_sum": "SELECT SUM(x) AS s FROM (SELECT CAST(42 AS BIGINT) AS x)",
            # cast back down -> must pass
            "good_sum": "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT CAST(42 AS BIGINT) AS x)",
        }))
        rc = check(d, d)
        ok = rc == 1  # exactly the bad one should fail
        print("SELFTEST " + ("PASS: un-cast SUM was flagged" if ok
                             else "FAIL: gate did not flag the un-cast SUM"))
        return 0 if ok else 1


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(check(sys.argv[1], sys.argv[2]))
