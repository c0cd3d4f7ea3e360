#!/usr/bin/env python3
"""Generate an sf1-scale dataset (~6M lineitem rows) by x10 amplification of
the driver's read-only sf0.1 testdata, for the fixed-floor amortization
measurement (VERDICT r07 #2). Driver-side tooling only (duckdb/pyarrow) —
never a library dependency.

Amplification preserves join integrity: copy k (0..9) offsets every key
column consistently (custkey/partkey/suppkey +1e6*k, orderkey/event_id
+1e7*k, user_id +1e6*k, doc_id +1e6*k), so each copy is a disjoint,
internally-consistent shard — referential behavior (match rates, null-join
fractions, group counts per key) is identical to sf0.1, only the volume is
10x. region/nation stay fixed (TPC-H-style dims don't scale).

embeddings are amplified x10 with disjoint vec_id ranges (+1e6*k, so the
vec_id%4 shard pattern and the vec_id<5 query set — copy 0 only — are
preserved) and a per-copy seeded DIMENSION PERMUTATION (VERDICT r13 #1:
the fixture previously copied embeddings unscaled, so no ANN operator had
ever run above 2,000 vectors). The permutation is the word-shuffle
discipline applied to vectors: it preserves every norm and all WITHIN-copy
pairwise geometry exactly (each copy is an internally consistent shard),
while cross-copy cosines decorrelate (~0 for these near-isotropic
vectors), so copies are ordinary corpus points rather than planted exact
near-neighbours. The labeled O(n^2) exact-cosine baseline
(dd_embedding_cosine) runs on the vec_id%4 stratum above 10k vectors — the
ExactPairsDocCap gate applied to vectors, mirrored in its oracle.

documents texts are per-copy word-SHUFFLED (seeded Fisher-Yates) instead of
duplicated: verbatim copies would make every doc a 9-way exact near-dup,
turning dd_ngram_jaccard into an adversarial all-pairs explosion instead of
a 10x corpus.

Usage: python3 tools/make_sf1.py [outdir=target/sf1] [fkout=target/fk10]
"""
import json
import random
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
FK_SRC = "fixtures/freshkart"
COPIES = 10


def amplify_parquet(con, out: Path):
    out.mkdir(parents=True, exist_ok=True)
    g = "(SELECT unnest(generate_series(0, %d)) AS k) g" % (COPIES - 1)
    jobs = {
        "customer": f"""SELECT c_custkey + g.k*1000000 AS c_custkey, c_name, c_nationkey,
                         c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet', {g}""",
        "supplier": f"""SELECT s_suppkey + g.k*1000000 AS s_suppkey, s_name, s_nationkey,
                         s_acctbal FROM '{SRC}/supplier.parquet', {g}""",
        "part": f"""SELECT p_partkey + g.k*1000000 AS p_partkey, p_name, p_brand, p_type,
                     p_size, p_retailprice FROM '{SRC}/part.parquet', {g}""",
        "orders": f"""SELECT o_orderkey + g.k*10000000 AS o_orderkey,
                       o_custkey + g.k*1000000 AS o_custkey, o_orderstatus, o_totalprice,
                       o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet', {g}""",
        "lineitem": f"""SELECT l_orderkey + g.k*10000000 AS l_orderkey,
                         l_partkey + g.k*1000000 AS l_partkey,
                         l_suppkey + g.k*1000000 AS l_suppkey,
                         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                         l_returnflag, l_linestatus, l_shipdate
                         FROM '{SRC}/lineitem.parquet', {g}""",
        # ts: the source stores TIMESTAMP(NANOS), which Spark-side
        # Tables.events reads as BIGINT nanos (nanosAsLong). DuckDB would
        # round-trip it as plain TIMESTAMP (micros) and break `ts div 1000`
        # — write explicit BIGINT epoch-nanos instead.
        "events": f"""SELECT event_id + g.k*10000000 AS event_id,
                       CAST(epoch_ns(ts) AS BIGINT) AS ts,
                       user_id + g.k*1000000 AS user_id, event_type, value, props
                       FROM '{SRC}/events.parquet', {g}""",
        "region": f"SELECT * FROM '{SRC}/region.parquet'",
        "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
    }
    # Small row groups: Spark's parquet split unit is the row group — a
    # 50k-row table in DuckDB's default single 122880-row group would scan
    # as ONE task and serialize the whole text pipeline (found the hard way:
    # a 10-minute single-task NormWords stage).
    for name, sql in jobs.items():
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"  {name}: {n} rows")

    # documents: shuffle words per copy so copies aren't verbatim near-dups
    rows = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    out_rows = []
    for k in range(COPIES):
        for doc_id, text, lang, source, n_chars in rows:
            if k == 0:
                t = text
            else:
                words = text.split(" ")
                random.Random(f"{k}:{doc_id}").shuffle(words)
                t = " ".join(words)
            out_rows.append((doc_id + k * 1000000, t, lang, source, len(t)))
    con.execute("CREATE OR REPLACE TABLE docs_amp(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO docs_amp VALUES (?,?,?,?,?)", out_rows)
    con.execute(f"COPY (SELECT * FROM docs_amp ORDER BY doc_id) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)")
    print(f"  documents: {len(out_rows)} rows (word-shuffled per copy)")

    amplify_embeddings(con, out, COPIES)


def amplify_embeddings(con, out: Path, copies: int):
    """embeddings: disjoint vec_id ranges + one seeded dim-permutation per
    copy (see module docstring). Small row groups again: a 20k-row table
    in one 122880-row group would scan as ONE Spark task. Factored out so
    --vec-copies can build vector-only crossover corpora (e.g. the 80k
    corpus behind the exact-vs-NN-descent build crossover in BASELINE.md)
    with the exact same amplification scheme as the sf1 sweep corpus.
    """
    out.mkdir(parents=True, exist_ok=True)
    erows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    dim = len(erows[0][1])
    eout = []
    for k in range(copies):
        perm = list(range(dim))
        if k > 0:
            random.Random(f"emb:{k}").shuffle(perm)
        for vec_id, emb, label in erows:
            eout.append((vec_id + k * 1000000, [emb[i] for i in perm], label))
    con.execute("CREATE OR REPLACE TABLE emb_amp(vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO emb_amp VALUES (?,?,?)", eout)
    con.execute(f"COPY (SELECT * FROM emb_amp ORDER BY vec_id) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)")
    print(f"  embeddings: {len(eout)} rows (dim-permuted per copy)")


def remap_order(oid: str, k: int) -> str:
    # opaque string ids: a per-copy suffix keeps every copy's ids disjoint
    # while preserving in-copy relationships (incl. dangling refund refs)
    return oid if k == 0 else f"{oid}X{k}"


# ADVICE r08 follow-up: the copy stride is DERIVED from the max customer id
# referenced ANYWHERE in the fixture (customers.csv AND order files — orders
# deliberately reference unknown customers like C0803 as a pipeline trap),
# rounded up to the next hundred. A stride covering only customers.csv would
# land copy 0's dangling reference inside copy 1's VALID id range — silently
# defusing the unknown-customer trap and breaking disjoint shards.
def _cust_stride() -> int:
    src = Path(FK_SRC)
    ids = []

    def note(cid: str):
        if cid.startswith("C") and cid[1:].isdigit():
            ids.append(int(cid[1:]))

    for ln in src.joinpath("customers.csv").read_text().rstrip("\n").split("\n")[1:]:
        note(ln.split(",")[0])
    for f in sorted(src.glob("orders_*.json")):
        for r in json.loads(f.read_text()):
            note(str(r.get("customer_id", "")))
    return (max(ids) + 99) // 100 * 100


CUST_STRIDE = _cust_stride()


def remap_cust(cid: str, k: int) -> str:
    if k == 0 or not (cid.startswith("C") and cid[1:].isdigit()):
        return cid
    # belt-and-braces: the derivation above makes this unreachable unless
    # ids stop matching the C%04d scheme entirely
    assert int(cid[1:]) <= CUST_STRIDE, \
        f"customer id {cid} exceeds derived CUST_STRIDE={CUST_STRIDE}"
    return f"C{int(cid[1:]) + CUST_STRIDE * k:04d}"


def amplify_freshkart(out: Path):
    out.mkdir(parents=True, exist_ok=True)
    src = Path(FK_SRC)
    # customers.csv
    lines = src.joinpath("customers.csv").read_text().rstrip("\n").split("\n")
    header, body = lines[0], lines[1:]
    amped = [header]
    for k in range(COPIES):
        for ln in body:
            parts = ln.split(",")
            parts[0] = remap_cust(parts[0], k)
            amped.append(",".join(parts))
    out.joinpath("customers.csv").write_text("\n".join(amped) + "\n")
    # orders_*.json (JSON arrays, multiLine)
    for f in sorted(src.glob("orders_*.json")):
        recs = json.loads(f.read_text())
        amped_recs = []
        for k in range(COPIES):
            for r in recs:
                r2 = dict(r)
                r2["order_id"] = remap_order(r["order_id"], k)
                r2["customer_id"] = remap_cust(r["customer_id"], k)
                amped_recs.append(r2)
        out.joinpath(f.name).write_text(json.dumps(amped_recs, indent=1))
    # refunds.csv
    lines = src.joinpath("refunds.csv").read_text().rstrip("\n").split("\n")
    header, body = lines[0], lines[1:]
    amped = [header]
    rid = 0
    for k in range(COPIES):
        for ln in body:
            parts = ln.split(",")
            rid += 1
            parts[0] = f"R{rid:06d}"
            parts[1] = remap_order(parts[1], k)
            amped.append(",".join(parts))
    out.joinpath("refunds.csv").write_text("\n".join(amped) + "\n")
    # pass-through files
    for name in ("data.txt", "settings.yaml"):
        out.joinpath(name).write_text(src.joinpath(name).read_text())
    print(f"  freshkart x{COPIES} -> {out}")


def main():
    # --vec-copies N [outdir]: embeddings-only amplification at an arbitrary
    # multiple — the repeatable recipe for the ANN build-crossover corpora
    # (VERDICT r14 #3: the 80k-vector measurement used a one-off dir).
    # Example: python3 tools/make_sf1.py --vec-copies 40 target/vec80k
    if len(sys.argv) > 1 and sys.argv[1] == "--vec-copies":
        copies = int(sys.argv[2])
        outdir = Path(sys.argv[3]) if len(sys.argv) > 3 else Path(f"target/vec{copies * 2}k")
        con = duckdb.connect()
        print(f"amplifying {SRC} embeddings x{copies} -> {outdir}")
        amplify_embeddings(con, outdir, copies)
        return
    # --vec-clustered N [outdir]: a PLANTED-CLUSTER embeddings-only corpus
    # (N/100 gaussian clusters x 100 members, 64-dim, sigma 0.3, seed 42)
    # — the NAVIGABLE geometry ANN indexes exist for. The amplified
    # testdata vectors are near-isotropic: distances concentrate, the true
    # top-k is noise-scattered, and recall on them is budget-fraction-
    # bound for ANY sublinear index (the repo's documented RP/planted-
    # fixture position, measured in BUDGET_CURVE_r16). Recall claims about
    # the serving index are made on this corpus; build-cost claims hold on
    # both. Example: python3 tools/make_sf1.py --vec-clustered 80000 target/vecc80k
    if len(sys.argv) > 1 and sys.argv[1] == "--vec-clustered":
        total = int(sys.argv[2])
        outdir = Path(sys.argv[3]) if len(sys.argv) > 3 else Path(f"target/vecc{total // 1000}k")
        outdir.mkdir(parents=True, exist_ok=True)
        n_clusters, members, dim = total // 100, 100, 64
        rng = random.Random(42)
        # one gauss stream, consumed in a fixed order — fully deterministic
        centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
        rows = []
        for j in range(n_clusters):
            for m in range(members):
                vid = m * n_clusters + j
                v = [centers[j][d] + 0.3 * rng.gauss(0, 1) for d in range(dim)]
                rows.append((vid, [float(f"{x:.6f}") for x in v], vid % 10))
        rows.sort(key=lambda r: r[0])
        con = duckdb.connect()
        con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
        con.executemany("INSERT INTO emb VALUES (?, ?, ?)", rows)
        con.execute(f"COPY (SELECT * FROM emb ORDER BY vec_id) TO '{outdir}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)")
        print(f"  clustered embeddings: {total} rows ({n_clusters} clusters x {members}) -> {outdir}")
        return
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("target/sf1")
    fkout = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("target/fk10")
    con = duckdb.connect()
    print(f"amplifying {SRC} x{COPIES} -> {outdir}")
    amplify_parquet(con, outdir)
    amplify_freshkart(fkout)


if __name__ == "__main__":
    main()
