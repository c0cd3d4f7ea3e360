#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mirroring the driver's gate:
run graft.Verify first (writes <out>/<name>/ parquet + oracle_sql.json), then
this script replays each oracle SQL in DuckDB over the same testdata parquet
tables and diffs values (columns sorted by name, exact compare).

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

Env (for above-sweep-scale corpora, where DuckDB's in-memory session hits
its default cap — the recall_eval / dd_semdedup sf1 lesson):
  DUCK_MEMORY_LIMIT   e.g. "96GB" -> SET memory_limit
  DUCK_TEMP_DIR       e.g. "/tmp/duckspill" -> SET temp_directory (enables
                      out-of-core spilling for the big CTE chains)
"""
import json
import os
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    if os.environ.get("DUCK_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCK_MEMORY_LIMIT']}'")
    if os.environ.get("DUCK_TEMP_DIR"):
        Path(os.environ["DUCK_TEMP_DIR"]).mkdir(parents=True, exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['DUCK_TEMP_DIR']}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = Path(outdir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # exact value compare, row order included (stricter than the driver)
        mismatch = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and not (x is None and y is None) and str(x) != str(y):
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duckdb={y!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracles match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
