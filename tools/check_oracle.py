#!/usr/bin/env python3
"""Local pre-validation harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir (written by graft.Verify), loads the
Spark parquet result, runs oracle_sql.json[<name>] in DuckDB against the
testdata tables, sorts columns by name and rows by all columns, and compares
values exactly. Prints PASS/FAIL per query. Dev-only tool (driver-side python);
not part of the Scala library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        # Driver-exact: plain multi-column sort, NO key=astype(str). Array
        # cells (numpy.ndarray) are unhashable here and raise — that is a
        # real driver-gate failure (seen on t08/t09 in round 2), so it must
        # fail locally too. Oracle-checked queries must emit scalar columns.
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        try:
            g, w = canon(got), canon(want)
        except Exception as e:
            print(f"FAIL {name}: result not sortable (array column?): {e}")
            failures += 1
            continue
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, a.iloc[i], b.iloc[i], (~eq).sum())
                break
        if mismatch:
            c, av, bv, n = mismatch
            print(f"FAIL {name}: col {c}: {n} diffs, e.g. spark={av!r} oracle={bv!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
