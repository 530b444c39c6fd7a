#!/usr/bin/env python3
"""Machine adjudication of bench runs (VERDICT r13 #6): compare a fresh
bench JSON against a committed artifact, gating on BOTH sentinels before
any per-query ratio is interpreted. Usage:
    python3 scripts/bench_compare.py <candidate.json> [baseline.json]
(default baseline: bench_queries.json).

Reading order, encoded as exit codes so automation can branch on it:
  - single-thread sentinel moved >1.5x  -> uniform machine swing: scale
    every ratio by the sentinel ratio before judging (printed scaled).
  - parallel sentinel moved >2x with the single-thread sentinel flat ->
    host parallel-capacity loss (the r13b 4-11x bandwidth-scan swing
    mode): per-query ratios are NOT interpretable; exit 2.
  - both flat -> ratios are code, not machine. exit 0 (or 1 if any
    production query regressed >1.5x after sentinel scaling).
  - io sentinel (round 14c) moved >1.5x with CPU sentinels flat ->
    page-cache state differs (two-sided sub-second scan tail); if the
    only >1.5x regressions are sub-1s entries, exit 3 instead of 1.
"""
import json
import sys
from pathlib import Path


def sentinels(d):
    s1 = [d.get("sentinel_sec_before"), d.get("sentinel_sec_after")]
    s2 = [d.get("par_sentinel_sec_before"), d.get("par_sentinel_sec_after")]
    s3 = [d.get("io_sentinel_sec_before"), d.get("io_sentinel_sec_after")]
    s1 = [x for x in s1 if x]
    s2 = [x for x in s2 if x]
    s3 = [x for x in s3 if x]
    return (sum(s1) / len(s1) if s1 else None,
            sum(s2) / len(s2) if s2 else None,
            sum(s3) / len(s3) if s3 else None)


def main():
    cand = json.loads(Path(sys.argv[1]).read_text())
    base_path = sys.argv[2] if len(sys.argv) > 2 else "bench_queries.json"
    base = json.loads(Path(base_path).read_text())
    c1, c2, c3 = sentinels(cand)
    b1, b2, b3 = sentinels(base)

    scale = 1.0
    if c1 and b1:
        r1 = c1 / b1
        print(f"single-thread sentinel: cand {c1:.3f}s vs base {b1:.3f}s "
              f"(ratio {r1:.2f}x)")
        if r1 > 1.5 or r1 < 1 / 1.5:
            scale = r1
            print(f"  -> uniform machine swing; per-query ratios scaled by "
                  f"1/{r1:.2f}")
    else:
        print("single-thread sentinel missing from one artifact "
              "(pre-r13 binary?) — ratios unscaled")

    if c2 and b2:
        r2 = (c2 / b2) / scale  # parallel swing beyond the uniform part
        print(f"parallel sentinel: cand {c2:.3f}s vs base {b2:.3f}s "
              f"(residual ratio {r2:.2f}x)")
        if r2 > 2.0 or r2 < 0.5:
            print("TRIPWIRE: parallel capacity deviates >2x from the "
                  "committed artifact with the single-thread sentinel "
                  "flat — host parallel-capacity loss; per-query ratios "
                  "are NOT interpretable this window. Re-run in a calm "
                  "window before judging regressions.")
            sys.exit(2)
    else:
        print("NOTE: parallel sentinel missing from one artifact "
              "(predates round 13b) — the bandwidth-scan swing mode "
              "cannot be excluded; interpret heavy-scan ratios manually")

    io_swing = False
    if c3 and b3:
        r3 = (c3 / b3) / scale
        print(f"io sentinel: cand {c3:.3f}s vs base {b3:.3f}s "
              f"(residual ratio {r3:.2f}x)")
        if r3 > 1.5 or r3 < 1 / 1.5:
            io_swing = True
            print("WARNING: IO/cache sentinel deviates >1.5x with CPU "
                  "sentinels flat — page-cache state differs between "
                  "windows (the r14c two-sided sub-second tail mode). "
                  "Sub-second SCAN entries are not individually "
                  "interpretable; judge only multi-second entries and "
                  "the total.")
    else:
        print("NOTE: io sentinel missing from one artifact (predates "
              "round 14c) — the cache-state swing mode cannot be "
              "excluded for sub-second scan entries")

    def secs(q):
        # per-query value is either a bare float or {min, passes}
        return {k: (v["min"] if isinstance(v, dict) else v)
                for k, v in q.items()}

    cq, bq = secs(cand.get("queries", {})), secs(base.get("queries", {}))
    common = sorted(k for k in cq if k in bq and bq[k] > 0.05)
    ratios = []
    regressions = []
    for k in common:
        r = (cq[k] / bq[k]) / scale
        ratios.append((r, k))
        if r > 1.5:
            regressions.append((r, k))
    if ratios:
        ratios.sort()
        med = ratios[len(ratios) // 2][0]
        print(f"\n{len(common)} common entries >50ms: median ratio "
              f"{med:.2f}x, p90 {ratios[int(len(ratios) * 0.9)][0]:.2f}x")
        for r, k in sorted(regressions, reverse=True)[:10]:
            print(f"  REGRESSED {k}: {r:.2f}x ({bq[k]:.2f}s -> {cq[k]:.3f}s)")
        for r, k in ratios[:5]:
            if r < 0.67:
                print(f"  improved {k}: {r:.2f}x ({bq[k]:.2f}s -> {cq[k]:.3f}s)")
    tot_c, tot_b = cand.get("value"), base.get("value")
    if tot_c and tot_b:
        print(f"total: cand {tot_c:.1f}s vs base {tot_b:.1f}s "
              f"({tot_c / tot_b / scale:.2f}x sentinel-scaled)")
    if regressions and io_swing:
        big = [(r, k) for r, k in regressions if bq[k] >= 1.0]
        sys.exit(3 if not big else 1)  # 3 = only cache-mode-suspect regressions
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
