#!/usr/bin/env python3
"""DuckDB side of the sf1 fixed-floor amortization measurement (VERDICT r07
#2): run the weak-headline oracle SQL against the x10-amplified sf1 tables
(tools/make_sf1.py) and print per-query seconds. Pair with a back-to-back
Spark Bench run (SPARK_GRAFT_SF_DIR=target/sf1 GRAFT_FK_DIR=target/fk10) in
the SAME load window. dd_embedding_cosine is excluded by design: it is the
labeled O(n^2) baseline whose cost is quadratic in corpus size; the
LSH-bucketed twin is the scale path.

Usage: python3 tools/bench_duck_sf1.py <oracle_sql.json> [runs=3]
"""
import json
import sys
import time

import duckdb
from pathlib import Path

# Resolve against the repo root (this file's parent's parent), not the cwd —
# a cwd-relative SFDIR run from elsewhere would silently read nothing or the
# wrong data (ADVICE r08).
REPO = Path(__file__).resolve().parent.parent
SFDIR = str(REPO / "target/sf1")
FKDIR = str(REPO / "target/fk10")
FK_FIXTURE = str(REPO / "fixtures/freshkart")
# dd_minhash_lsh replaced dd_ngram_jaccard (VERDICT r08 #2): the n-gram
# self-join is the labeled exact baseline whose candidate volume grows
# ~quadratically (measured 399-739 s at sf1); LSH is the scale path.
HEADLINE = ["q01_pricing_summary", "q04_leftjoin_nullfill", "q05_window_dedup",
            "q15_refund_rollup", "fk_daily_city_sales", "dd_minhash_lsh",
            "ta_quality", "ev_window_agg"]


def main():
    oracles = json.load(open(sys.argv[1]))
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        assert Path(f"{SFDIR}/{t}.parquet").exists(), f"missing {SFDIR}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    # make_sf1.py writes events.ts as BIGINT epoch-nanos (the layout Spark's
    # parquet reader accepts without legacy confs); the oracle SQL expects a
    # timestamp column — normalize in the view, mirroring Tables.events.
    ts_type = con.execute(
        f"SELECT column_type FROM (DESCRIBE SELECT ts FROM '{SFDIR}/events.parquet')"
    ).fetchone()[0]
    if ts_type == "BIGINT":
        con.execute(
            "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM '{SFDIR}/events.parquet'")
    out = {}
    for name in HEADLINE:
        sql = oracles[name].replace(FK_FIXTURE, FKDIR)
        # freshkart oracles embed absolute fixture paths; the rewrite must
        # actually hit or the query would read the un-amplified fixtures
        # (ADVICE r08)
        if name.startswith("fk_"):
            assert sql != oracles[name], \
                f"{name}: fixture path rewrite did not match ({FK_FIXTURE})"
        times = []
        for _ in range(runs):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        out[name] = round(med, 3)
        print(f"{name:28s} {med:7.3f} s  (runs: {[round(x,3) for x in times]})")
    print(f"{'TOTAL':28s} {sum(out.values()):7.3f} s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
