#!/usr/bin/env python3
"""Per-query bench regression adjudicator (round-8 verdict task 7).

Bench totals on this host swing up to 2x between sessions, so a raw
total comparison cannot distinguish "the host was slow" from "one
query regressed".  This tool diffs two bench artifacts QUERY BY QUERY
and emits a sorted delta manifest — the artifact the next round's
verdict reads first.

Usage:
    scripts/bench_delta.py [prior] [current] [--threshold 1.5]
                           [--floor 0.3] [--out BENCH_DELTA.md]

Defaults: prior = BENCH_BASELINE.json (the committed snapshot of the
previous round's full per-query map), current = BENCH_SELF.json (the
full map the Bench main just wrote).  Either argument may also be a
driver-side BENCH_r{N}.json wrapper ({"parsed": {...}}); those carry
only the 10 headline queries, so the diff covers the intersection and
says so.

A query is FLAGGED when its cold (pass-1) time grew more than
`threshold`x AND by more than `floor` seconds absolute — the floor
keeps sub-second queries, whose times are dominated by GC/JIT jitter,
from flagging on noise.  Exit status: number of flagged queries
(capped at 125), so CI-style wiring can gate on it.
"""
import argparse
import json
import sys


def load_queries(path):
    """Return (per-query map, total, n_queries, basis) from either a
    raw one-line bench JSON or a driver BENCH_r{N}.json wrapper.
    Artifacts written after the round-13 build/serve split carry a
    "total_cold" key and their "queries" map holds SERVE (pass-2)
    times; older artifacts' maps are COLD (pass-1) times."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    qs = {k: v for k, v in d.get("queries", {}).items() if v is not None and v >= 0}
    basis = "serve" if "total_cold" in d else "cold"
    return qs, d.get("value"), d.get("n_queries"), basis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prior", nargs="?", default="BENCH_BASELINE.json")
    ap.add_argument("current", nargs="?", default="BENCH_SELF.json")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratio (current/prior) above this")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="flag only when absolute growth exceeds this many seconds")
    ap.add_argument("--out", default="BENCH_DELTA.md")
    args = ap.parse_args()

    prior, p_total, p_n, p_basis = load_queries(args.prior)
    cur, c_total, c_n, c_basis = load_queries(args.current)

    common = sorted(set(prior) & set(cur))
    added = sorted(set(cur) - set(prior))
    removed = sorted(set(prior) - set(cur))

    rows = []
    for q in common:
        a, b = prior[q], cur[q]
        ratio = (b / a) if a > 0 else float("inf")
        flagged = ratio > args.threshold and (b - a) > args.floor
        rows.append((q, a, b, ratio, flagged))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[4]]
    improved = [r for r in rows if r[3] < 1 / args.threshold and (r[1] - r[2]) > args.floor]

    carried_prior = sum(prior[q] for q in common)
    carried_cur = sum(cur[q] for q in common)

    lines = []
    lines.append("# BENCH_DELTA — per-query time diff")
    lines.append("")
    lines.append(f"prior: `{args.prior}` (total {p_total}s, {p_n} queries, "
                 f"{p_basis} basis) → "
                 f"current: `{args.current}` (total {c_total}s, {c_n} queries, "
                 f"{c_basis} basis)")
    if p_basis != c_basis:
        lines.append(f"NOTE: bases differ ({p_basis} vs {c_basis}) — the "
                     "round-13 build/serve split moved the queries map to "
                     "serve times; this one transition round compares "
                     f"prior {p_basis} against current {c_basis}.")
    lines.append(f"compared: {len(common)} common queries "
                 f"(carried sum {carried_prior:.1f}s → {carried_cur:.1f}s, "
                 f"{carried_cur / carried_prior:.2f}x)" if carried_prior > 0 else
                 "compared: 0 common queries")
    if added:
        lines.append(f"new this round ({len(added)}): " + ", ".join(added))
    if removed:
        lines.append(f"removed ({len(removed)}): " + ", ".join(removed))
    lines.append("")
    lines.append(f"## Flagged (> {args.threshold}x and > {args.floor}s growth): "
                 f"{len(flagged)}")
    lines.append("")
    if flagged:
        lines.append("| query | prior s | current s | ratio |")
        lines.append("|---|---|---|---|")
        for q, a, b, r, _ in flagged:
            lines.append(f"| {q} | {a:.3f} | {b:.3f} | {r:.2f}x |")
    else:
        lines.append("(none)")
    lines.append("")
    lines.append("## Largest movements (top 15 by ratio)")
    lines.append("")
    lines.append("| query | prior s | current s | ratio |")
    lines.append("|---|---|---|---|")
    for q, a, b, r, _ in rows[:15]:
        lines.append(f"| {q} | {a:.3f} | {b:.3f} | {r:.2f}x |")
    if improved:
        lines.append("")
        lines.append(f"## Improved (> {args.threshold}x faster): {len(improved)}")
        lines.append("")
        for q, a, b, r, _ in sorted(improved, key=lambda r: r[3]):
            lines.append(f"- {q}: {a:.3f}s → {b:.3f}s ({r:.2f}x)")

    text = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(text)
    print(text)
    sys.exit(min(len(flagged), 125))


if __name__ == "__main__":
    main()
