#!/usr/bin/env python3
"""Rehearse the driver's correctness gate: compare Verify.scala's parquet
dumps against the DuckDB oracle SQL, column-sorted and row-sorted.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import glob
    import os
    failures = []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # a query that crashed in Verify leaves NO output dir — that must fail
    # the rehearsal, not silently shrink the query count
    for name in sorted(set(oracles) - set(names)):
        failures.append((name, "query produced no output (failed in Verify?)"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no parquet output"))
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            if len(got) == 0 and name != "q_expected_empty":
                print(f"    WARNING: zero rows")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            continue
        # arrays/lists are unhashable for pandas sort; stringify object cols
        for df in (got, want):
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].map(lambda v: str(list(v)) if hasattr(v, "__len__") and not isinstance(v, str) else v)
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        # exact compare; report first differing cell
        try:
            import pandas as pd
            pd.testing.assert_frame_equal(gs, ws, check_dtype=True,
                                          check_exact=True)
            print(f"  [MATCH]     {name}: {len(got)} rows")
        except AssertionError as e:
            failures.append((name, str(e).split("\n")[0] + " ..."))
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  FAIL {n}: {msg[:300]}")
        return 1
    print(f"all {len(names)} queries OK ({len(oracles)} with oracle)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
