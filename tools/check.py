#!/usr/bin/env python3
"""Self-check harness mimicking the driver's correctness gate:
run Verify's parquet dumps against the DuckDB oracle on the same
scale-factor directory. Strict compare: column names (sorted), dtypes,
row count, and exact values after sorting rows by all columns.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os as _os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # ScaleUp output is a Spark directory table, not a single file
        src = f"{p}/*.parquet" if _os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        dt_mismatch = [(c, str(g[c].dtype), str(w[c].dtype))
                       for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            ok = True
        except AssertionError as e:
            ok = False
            msg = str(e).splitlines()[0]
        if not ok:
            print(f"FAIL {name}: values differ: {msg}")
            failures += 1
        elif dt_mismatch:
            print(f"WARN {name}: values match, dtypes differ: {dt_mismatch}")
        else:
            print(f"PASS {name} ({len(g)} rows)")
    # queries without an oracle: rows-only check
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = duckdb.connect().execute(
                f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            status = "PASS" if n > 0 else "FAIL"
            if n == 0:
                failures += 1
            print(f"{status} {name} (rows-only: {n} rows)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
