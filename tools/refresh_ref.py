#!/usr/bin/env python3
"""Refresh selected bench_ref.json entries from a fresh
docs/bench_detail.json, normalizing by that run's canary drift so the
committed value is what a drift=1.0 (canary-parity) box would measure.

Usage: python3 tools/refresh_ref.py q219_stream_neardup_index [more...]
"""
import json
import sys

REF = "docs/bench_ref.json"
DETAIL = "docs/bench_detail.json"


def main(names):
    ref = json.load(open(REF))
    det = json.load(open(DETAIL))
    meas = det["queries"]
    drift = det.get("canary_drift", -1.0)
    if drift <= 0:
        print("no canary drift in detail; aborting")
        return 1
    for n in names:
        if n not in meas or meas[n] < 0:
            print(f"SKIP {n}: not measured")
            continue
        old = ref["queries"].get(n)
        new = round(meas[n] / drift, 3)
        ref["queries"][n] = new
        print(f"{n}: {old} -> {new} (measured {meas[n]}, drift {drift})")
    src = ref.get("source", "")
    ref["source"] = src + (
        f"; {', '.join(names)} refreshed r15 from the closing bench run "
        f"(drift-normalized at {drift}) - see bench_notes r15")
    json.dump(ref, open(REF, "w"), indent=1)
    print("written", REF)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
