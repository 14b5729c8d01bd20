#!/usr/bin/env python3
"""Compare two SuiteRun jsonl files (e.g. sf10 r13 vs r15): per-query
ratios, medians, and the rows that moved most.

Usage: python3 tools/compare_suite.py <old.jsonl> <new.jsonl> [topN]
"""
import json
import statistics
import sys


def load(p):
    out = {}
    for line in open(p):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "sec" in r and r.get("sec", -1) >= 0:
            out[r["q"]] = r["sec"]
    return out


def main(old_p, new_p, top=12):
    old, new = load(old_p), load(new_p)
    shared = sorted(set(old) & set(new))
    rows = [(new[q] / old[q], q, old[q], new[q]) for q in shared if old[q] > 0]
    rows.sort(reverse=True)
    print(f"shared={len(shared)} old_total={sum(old[q] for q in shared):.1f} "
          f"new_total={sum(new[q] for q in shared):.1f} "
          f"median_ratio={statistics.median(r[0] for r in rows):.3f}")
    print("-- biggest regressions --")
    for r, q, o, n in rows[:top]:
        print(f"{q:38s} {o:8.2f} -> {n:8.2f}  {r:5.2f}x")
    print("-- biggest improvements --")
    for r, q, o, n in rows[-top:]:
        print(f"{q:38s} {o:8.2f} -> {n:8.2f}  {r:5.2f}x")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"-- new queries ({len(only_new)}) --")
        for q in only_new:
            print(f"{q:38s} {new[q]:8.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 12)
