#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle. Usage:
    python3 scripts/check.py [--json <path>] <sfDir> <verifyOutDir> [query ...]
Compares per-query: column names (sorted), row count, and cell values
(rows sorted canonically). Prints PASS/FAIL per query. With --json,
also writes the per-query record in the driver artifact's shape
(rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) so the
round's correctness result is committed IN-REPO (CORRECTNESS_local.json)
instead of depending on the driver's artifact pipeline. Not part of the
Scala library — dev tooling only (mirrors what the driver does).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_rows(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    argv = sys.argv[1:]
    json_path = None
    if argv and argv[0] == "--json":
        json_path = argv[1]
        argv = argv[2:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    # One FRESH connection per oracle query: a single shared connection
    # accumulates allocator footprint across the 222 queries (the
    # megabyte-scale unrolled wide-bucket SQL binds ~25k expression
    # nodes) until mid-run queries die with bad_alloc on an otherwise
    # idle box. Views are lazy, so per-query setup costs nothing.
    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        return c

    n_pass = n_fail = 0
    record = {}

    def rec(name, rows_m, schema_m, hash_m, s_n, d_n, err=None):
        record[name] = {"rows_match": rows_m, "schema_match": schema_m,
                        "hash_match": hash_m, "spark_rows": s_n,
                        "oracle_rows": d_n, "err": err}

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = Path(out_dir) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            rec(name, False, False, False, None, None, "no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(str(pdir))
        s_names = list(spark_tbl.schema.names)
        s_rows = table_rows([tuple(r.values()) for r in spark_tbl.to_pylist()], s_names)
        try:
            con = fresh_con()
            res = con.execute(sql)
            d_names = [d[0] for d in res.description]
            d_rows = table_rows(res.fetchall(), d_names)
            con.close()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(name, False, False, False, len(s_rows), None,
                f"oracle error: {e}")
            n_fail += 1
            continue
        if sorted(s_names) != sorted(d_names):
            print(f"FAIL {name}: columns differ\n  spark={sorted(s_names)}\n  duck ={sorted(d_names)}")
            rec(name, len(s_rows) == len(d_rows), False, False,
                len(s_rows), len(d_rows))
            n_fail += 1
            continue
        if s_rows == d_rows:
            print(f"PASS {name} ({len(s_rows)} rows)")
            rec(name, True, True, True, len(s_rows), len(d_rows))
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: values differ (spark {len(s_rows)} rows, duck {len(d_rows)} rows)")
            rec(name, len(s_rows) == len(d_rows), True, False,
                len(s_rows), len(d_rows))
            names_sorted = sorted(s_names)
            shown = 0
            for i in range(min(len(s_rows), len(d_rows))):
                if s_rows[i] != d_rows[i] and shown < 3:
                    shown += 1
                    for j, cn in enumerate(names_sorted):
                        if s_rows[i][j] != d_rows[i][j]:
                            print(f"    row{i} {cn}: spark={s_rows[i][j]!r} duck={d_rows[i][j]!r}")
    if json_path:
        Path(json_path).write_text(json.dumps(record, indent=2) + "\n")
    print(f"== {n_pass} pass, {n_fail} fail")
    # One-line machine-readable summary as the LAST stdout line (VERDICT
    # r14 #1): the driver's ~2 KB stdout tail capture must find a
    # parseable correctness JSON — CORRECTNESS_r{13,14}.json came back {}.
    failing = sorted(n for n, r in record.items() if not r["hash_match"])
    print(json.dumps({"n_queries": n_pass + n_fail, "n_correct": n_pass,
                      "n_fail": n_fail, "failing": failing[:20]},
                     separators=(",", ":")))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
