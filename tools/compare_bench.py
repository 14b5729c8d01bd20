#!/usr/bin/env python3
"""Compare two Bench JSON outputs (e.g. docs/bench_local_r1.json vs a
fresh run) and flag per-query regressions.

Usage: python3 tools/compare_bench.py <baseline.json> <new.json> [ratio]
Exit 1 if any query regressed by more than `ratio` (default 2.0).
"""
import json
import sys


def _norm(queries: dict) -> dict:
    """Key bench maps by the qNN prefix so short-key (driver line,
    with or without the "q") and full-name (docs/bench_detail.json)
    outputs compare cleanly."""
    out = {}
    for k, v in queries.items():
        if isinstance(v, dict):  # bench_ref provenance row (r16 schema)
            v = v["value"]
        k = k.split("_")[0]
        if not k.startswith("q"):
            k = "q" + k
        out[k] = v
    return out


def main(base_path: str, new_path: str, ratio: float = 2.0) -> int:
    base_doc = json.load(open(base_path))
    new_doc = json.load(open(new_path))
    base = _norm(base_doc["queries"])
    new = _norm(new_doc["queries"])
    b_agg = base_doc.get("agg", "min2")
    n_agg = new_doc.get("agg", "min2")
    if b_agg != n_agg:
        print(f"NOTE: aggregation modes differ: baseline={b_agg} new={n_agg} "
              f"(medians run higher than mins; totals not directly comparable)")
    bad = 0
    for name in sorted(set(base) | set(new)):
        b, n = base.get(name), new.get(name)
        if b is None:
            print(f"NEW     {name}: {n:.2f}s")
        elif n is None:
            print(f"REMOVED {name}")
        elif b > 0 and n > b * ratio and n - b > 0.5:
            print(f"SLOWER  {name}: {b:.2f}s -> {n:.2f}s ({n/b:.1f}x)")
            bad += 1
        elif b > 0 and n < b / ratio:
            print(f"FASTER  {name}: {b:.2f}s -> {n:.2f}s")
    tb = sum(v for v in base.values() if v > 0)
    tn = sum(v for v in new.values() if v > 0)
    print(f"\ntotal: {tb:.1f}s -> {tn:.1f}s; {bad} regressions (> {ratio}x)")
    return 1 if bad else 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], r))
