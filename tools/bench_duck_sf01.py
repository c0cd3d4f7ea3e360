#!/usr/bin/env python3
"""Same-window DuckDB side of the sf0.1 headline ratio (BASELINE.md step 4,
the 2x gate). Run IMMEDIATELY after the Spark headline subset in the same
load window (the box has a +-3x load band that moves BOTH engines; only
same-window pairs are meaningful). Oracle SQL is read from a Verify dump's
oracle_sql.json so it is always the exact SQL the correctness gate uses.

Usage: python3 tools/bench_duck_sf01.py <oracle_sql.json> [runs=3]
"""
import json
import sys
import time

import duckdb
from pathlib import Path

SFDIR = "/root/testdata/sf0.1"
# dd_minhash_lsh replaced dd_ngram_jaccard (VERDICT r08 #2 — the n-gram
# self-join is the labeled exact baseline; LSH is the scale path). The event
# slot pairs ev_window_agg (the BATCH windowed aggregate), not
# ev_stream_window as in Bench's display headline: the streaming twin runs
# an actual micro-batch pipeline with checkpointing whose ~2 s fixed floor
# against a 0.03 s batch SQL would measure the deployment mode, not the
# operator (same choice as the r6/r7 BASELINE pairings).
HEADLINE = ["q01_pricing_summary", "q04_leftjoin_nullfill", "q05_window_dedup",
            "q15_refund_rollup", "fk_daily_city_sales", "dd_minhash_lsh",
            "dd_embedding_cosine", "ta_quality", "ev_window_agg"]


def main():
    oracles = json.load(open(sys.argv[1]))
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        assert Path(f"{SFDIR}/{t}.parquet").exists(), f"missing {SFDIR}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    out = {}
    for name in HEADLINE:
        times = []
        for _ in range(runs):
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        out[name] = round(med, 3)
        print(f"{name:28s} {med:7.3f} s  (runs: {[round(x,3) for x in times]})")
    print(f"{'TOTAL':28s} {sum(out.values()):7.3f} s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
