#!/usr/bin/env python3
"""Render SCALE.md from two graft.Bench JSON lines (base sf vs scaled sf).

Usage: python3 tools/scale_report.py <base_bench.json> <scaled_bench.json> <copies>

Each input file holds the ONE JSON line Bench prints (grep '^{' from the sbt
log). Emits a markdown table: per-query median wall at both scales, the
wall-clock scaling factor, peak task execution memory at the scaled run, and
a flag column calling out queries whose time scales worse than the data
(factor > copies) or whose peak memory exceeds a comfortable single-task
budget. Exit code 1 if any query FAILED to produce a timing at the scaled sf.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    base_p, scaled_p, copies = sys.argv[1], sys.argv[2], float(sys.argv[3])
    base, scaled = load(base_p), load(scaled_p)
    bq, sq = base["queries"], scaled["queries"]
    speak = scaled.get("peak_exec_mb", {})
    sdisp = scaled.get("dispersion", {})

    rows, missing = [], []
    for name in sorted(sq):
        b, s = bq.get(name), sq[name]
        factor = (s / b) if b else float("nan")
        pk = speak.get(name, 0.0)
        d = sdisp.get(name)
        spread = (d[2] / d[1]) if d and d[1] else 1.0
        flags = []
        # >1.3x headroom over linear-in-data before we call it a cliff;
        # sub-second queries are dominated by fixed job overhead, skip those
        if b and s > 1.0 and factor > copies * 1.3:
            flags.append(f"SUPERLINEAR x{factor:.1f}")
        if pk > 4096:
            flags.append(f"PEAK {pk/1024:.1f}G")
        if s > 1.0 and spread > 2.0:
            flags.append(f"NOISY max/med {spread:.1f}")
        rows.append((name, b, s, factor, pk, " ".join(flags)))
    for name in bq:
        if name not in sq:
            missing.append(name)

    print(f"| query | sf0.1 med (s) | sf1 med (s) | factor ({copies:.0f}x data) | sf1 peak task mem (MB) | flags |")
    print("|---|---|---|---|---|---|")
    for name, b, s, factor, pk, flags in rows:
        bs = f"{b:.2f}" if b is not None else "—"
        fs = f"{factor:.1f}x" if b else "—"
        print(f"| {name} | {bs} | {s:.2f} | {fs} | {pk:.0f} | {flags} |")
    bt = sum(v for v in bq.values() if v is not None)
    st = sum(sq.values())
    print(f"\nTotals: sf0.1 {bt:.1f}s, sf1 {st:.1f}s ({st/bt:.1f}x for {copies:.0f}x data); "
          f"load_avg start/end sf1 run: {scaled.get('load_avg_start')}/{scaled.get('load_avg_end')} on {scaled.get('cpus')} cpus.")
    if missing:
        print(f"\nMISSING at scaled sf: {missing}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
