#!/usr/bin/env python3
"""Three-point scaling table from per-query bench JSONs. Dev tooling.

    python3 scripts/scale_curve.py sf01.json sf1.json [sf10.json]

Prints per-entry seconds and ratios (sorted by the largest last-hop
ratio) plus totals and medians — the SCALING.md evidence table.
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d, {k: v["min"] for k, v in d["queries"].items()}


def main():
    paths = sys.argv[1:]
    data = [load(p) for p in paths]
    names = [p.split("/")[-1] for p in paths]
    common = set(data[0][1])
    for _, q in data[1:]:
        common &= set(q)
    rows = []
    for e in sorted(common):
        secs = [q[e] for _, q in data]
        ratios = [secs[i + 1] / max(secs[i], 1e-9) for i in range(len(secs) - 1)]
        rows.append((e, secs, ratios))
    rows.sort(key=lambda r: -r[2][-1])
    hdr = " | ".join(names) + " | " + " | ".join(
        f"x{i + 1}->{i + 2}" for i in range(len(data) - 1))
    print(f"entry | {hdr}")
    for e, secs, ratios in rows:
        print(f"{e} | " + " | ".join(f"{s:.3f}" for s in secs)
              + " | " + " | ".join(f"{r:.2f}x" for r in ratios))
    print()
    for i, (d, q) in enumerate(data):
        tot = sum(q[e] for e in common)
        print(f"{names[i]}: common-total {tot:.1f}s  "
              f"full-total {d['value']:.1f}s  production {d.get('production_total', 0):.1f}s  "
              f"sentinel {d.get('sentinel_sec_before')}/{d.get('sentinel_sec_after')}")
    for i in range(len(data) - 1):
        rs = [r[2][i] for r in rows]
        t0 = sum(r[1][i] for r in rows)
        t1 = sum(r[1][i + 1] for r in rows)
        print(f"hop {i + 1}: wall {t1 / t0:.2f}x  median {statistics.median(rs):.2f}x  "
              f"p90 {sorted(rs)[int(0.9 * len(rs))]:.2f}x  max {max(rs):.2f}x  "
              f">2x: {sum(1 for r in rs if r > 2)}")


if __name__ == "__main__":
    main()
