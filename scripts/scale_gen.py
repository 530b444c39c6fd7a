#!/usr/bin/env python3
"""Scale the driver's sf0.1 testdata ~10x into an sf1 fixture for the
SCALING.md curve. Dev tooling only (like check.py) — not part of the
Scala library. Usage:

    python3 scripts/scale_gen.py [/root/testdata/sf0.1] [/tmp/testdata/sf1] [copies]

`copies` defaults to 10 (sf0.1 -> sf1); 100 builds the sf10 fixture for
the three-point SCALING.md curve.

Design: a faithful 10x, not a naive replicate.

* region/nation: copied verbatim (dimension tables don't grow with sf).
* customer/supplier/part/orders/lineitem: 10 key-offset copies with
  FK-consistent offsets (custkey/orderkey/partkey/suppkey all shift by
  copy * (max+1)), so join fan-outs and per-key cardinalities stay at
  the base's shape while distinct keys and rows grow 10x.
* events: 10 copies with offset event_id/user_id in the SAME 30-day
  window — event density grows 10x, the realistic growth mode for a
  fixed observation window.
* documents: 10x FRESH docs sampled from the base generator's observed
  distribution (word frequencies over its 31-word vocab, per-doc word
  counts, source/lang mix), with near-dup pairs and exact-dup groups
  injected at the base's measured rates (~5% near-dup pairs at jaccard
  ~0.9, ~0.3% exact copies). A naive text replicate would make every
  doc a 10-way near-dup family and blow candidate pairs quadratically —
  exactly the artifact a scaling curve must not import.
* embeddings: 10x fresh vectors from the base's per-label component
  moments (near-zero-mean, sigma ~0.125), labels uniform.

Deterministic (seeded); writes multi-file <name>.parquet directories so
Spark's scan parallelizes without the single-row-group rebalance guard.
"""
import os
import random
import sys

import duckdb

COPIES = 10


def main():
    global COPIES
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1"
    if len(sys.argv) > 3:
        COPIES = int(sys.argv[3])
    con = duckdb.connect()

    def outdir(name):
        d = os.path.join(dst, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        return d

    def copy_table(name, sql_tpl, copies=COPIES):
        d = outdir(name)
        for c in range(copies):
            con.execute(
                f"COPY ({sql_tpl.format(c=c, src=src)}) TO '{d}/part{c:02d}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # dimensions: verbatim
    copy_table("region", "SELECT * FROM '{src}/region.parquet'", copies=1)
    copy_table("nation", "SELECT * FROM '{src}/nation.parquet'", copies=1)

    ncust = con.execute(f"SELECT MAX(c_custkey)+1 FROM '{src}/customer.parquet'").fetchone()[0]
    nsupp = con.execute(f"SELECT MAX(s_suppkey)+1 FROM '{src}/supplier.parquet'").fetchone()[0]
    npart = con.execute(f"SELECT MAX(p_partkey)+1 FROM '{src}/part.parquet'").fetchone()[0]
    nord = con.execute(f"SELECT MAX(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
    nev = con.execute(f"SELECT MAX(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
    nuser = con.execute(f"SELECT MAX(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]

    # NOTE: %09d WIDENS past 1e9 while DuckDB's lpad TRUNCATES, so keys
    # >= 10^9 take the un-padded branch (mirroring %09d) to preserve the
    # name-encodes-key property entity_match depends on
    # c_name encodes the key in the base generator ('Customer#%09d'), so
    # copies REWRITE it to match their offset key — otherwise every name
    # recurs <copies> times and name-blocked operators (entity_match)
    # inherit a duplicate-name artifact the base data doesn't have
    copy_table("customer",
               "SELECT c_custkey + {c}*" + str(ncust) + " AS c_custkey,"
               " 'Customer#' || CASE WHEN length(CAST(c_custkey + {c}*" + str(ncust) + " AS VARCHAR)) > 9 THEN CAST(c_custkey + {c}*" + str(ncust) + " AS VARCHAR) ELSE lpad(CAST(c_custkey + {c}*" + str(ncust) + " AS VARCHAR), 9, '0') END AS c_name,"
               " c_nationkey, c_acctbal, c_mktsegment FROM '{src}/customer.parquet'")
    copy_table("supplier",
               "SELECT s_suppkey + {c}*" + str(nsupp) + " AS s_suppkey,"
               " 'Supplier#' || CASE WHEN length(CAST(s_suppkey + {c}*" + str(nsupp) + " AS VARCHAR)) > 9 THEN CAST(s_suppkey + {c}*" + str(nsupp) + " AS VARCHAR) ELSE lpad(CAST(s_suppkey + {c}*" + str(nsupp) + " AS VARCHAR), 9, '0') END AS s_name,"
               " s_nationkey, s_acctbal FROM '{src}/supplier.parquet'")
    copy_table("part",
               "SELECT p_partkey + {c}*" + str(npart) + " AS p_partkey, p_name, p_brand,"
               " p_type, p_size, p_retailprice FROM '{src}/part.parquet'")
    copy_table("orders",
               "SELECT o_orderkey + {c}*" + str(nord) + " AS o_orderkey,"
               " o_custkey + {c}*" + str(ncust) + " AS o_custkey, o_orderstatus,"
               " o_totalprice, o_orderdate, o_orderpriority FROM '{src}/orders.parquet'")
    copy_table("lineitem",
               "SELECT l_orderkey + {c}*" + str(nord) + " AS l_orderkey,"
               " l_partkey + {c}*" + str(npart) + " AS l_partkey,"
               " l_suppkey + {c}*" + str(nsupp) + " AS l_suppkey,"
               " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
               " l_returnflag, l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'")
    copy_table("events",
               "SELECT event_id + {c}*" + str(nev) + " AS event_id, ts,"
               " user_id + {c}*" + str(nuser) + " AS user_id, event_type, value, props"
               " FROM '{src}/events.parquet'")

    # ---- documents: fresh sample from the base distribution ----
    rng = random.Random(1042)
    words, wcum = [], []
    tot = 0
    for w, ct in con.execute(
            f"SELECT w, COUNT(*) c FROM (SELECT UNNEST(string_split(text, ' ')) w"
            f" FROM '{src}/documents.parquet') GROUP BY 1 ORDER BY 1").fetchall():
        words.append(w)
        tot += ct
        wcum.append(tot)
    lengths = [r[0] for r in con.execute(
        f"SELECT len(string_split(text, ' ')) FROM '{src}/documents.parquet'").fetchall()]
    srclang = con.execute(
        f"SELECT source, lang, COUNT(*) FROM '{src}/documents.parquet' GROUP BY 1, 2").fetchall()
    slpairs = [(s, l) for s, l, c in srclang for _ in range(c)]
    ndocs_base = con.execute(
        f"SELECT COUNT(*) FROM '{src}/documents.parquet'").fetchone()[0]
    ndocs = ndocs_base * COPIES

    def draw_word():
        x = rng.randrange(tot)
        lo, hi = 0, len(wcum) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if wcum[mid] <= x:
                lo = mid + 1
            else:
                hi = mid
        return words[lo]

    docs = []
    for i in range(ndocs):
        n = rng.choice(lengths)
        docs.append(" ".join(draw_word() for _ in range(n)))
    # near-dup pairs at the base's ~5%-of-docs rate, jaccard ~0.9: partner
    # doc = source doc with ~3% of words resampled
    npairs = int(0.05 * ndocs / 2) * 2
    ids = rng.sample(range(ndocs), npairs)
    for a, b in zip(ids[0::2], ids[1::2]):
        wl = docs[a].split(" ")
        for _ in range(max(1, len(wl) // 33)):
            wl[rng.randrange(len(wl))] = draw_word()
        docs[b] = " ".join(wl)
    # exact-dup groups at the base's ~0.3% rate
    for _ in range(int(0.0016 * ndocs)):
        a, b = rng.sample(range(ndocs), 2)
        docs[b] = docs[a]

    rows = [(i, t, *rng.choice(slpairs), len(t)) for i, t in enumerate(docs)]
    import pandas as pd
    ddir = outdir("documents")
    per = (ndocs + COPIES - 1) // COPIES
    for c in range(COPIES):
        chunk = rows[c * per:(c + 1) * per]
        df = pd.DataFrame(chunk, columns=["doc_id", "text", "source", "lang", "n_chars"])
        con.register("doc_chunk", df)
        con.execute(
            f"COPY (SELECT CAST(doc_id AS BIGINT) doc_id, text, lang, source,"
            f" CAST(n_chars AS BIGINT) n_chars FROM doc_chunk)"
            f" TO '{ddir}/part{c:02d}.parquet' (FORMAT PARQUET)")
        con.unregister("doc_chunk")
    print(f"documents: {ndocs} rows")

    # ---- embeddings: fresh vectors from base moments ----
    nvec_base = con.execute(
        f"SELECT COUNT(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
    nvec = nvec_base * COPIES
    edir = outdir("embeddings")
    per = (nvec + COPIES - 1) // COPIES
    for c in range(COPIES):
        recs = []
        for i in range(c * per, min((c + 1) * per, nvec)):
            vec = [rng.gauss(0.0, 0.125) for _ in range(64)]
            recs.append((i, vec, rng.randrange(10)))
        df = pd.DataFrame(recs, columns=["vec_id", "embedding", "label"])
        con.register("emb_chunk", df)
        con.execute(
            f'COPY (SELECT CAST(vec_id AS BIGINT) vec_id,'
            f' CAST(embedding AS FLOAT[]) embedding, CAST("label" AS INT) AS "label"'
            f" FROM emb_chunk) TO '{edir}/part{c:02d}.parquet' (FORMAT PARQUET)")
        con.unregister("emb_chunk")
    print(f"embeddings: {nvec} rows")


if __name__ == "__main__":
    main()
