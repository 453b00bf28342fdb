#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
parquet tables in <sfDir>, loads the matching Spark result parquet from
<outDir>/<name>/, sorts columns by name and rows by all columns, and
compares values. Reports per-query PASS/FAIL with diagnostics (schema
diff, row-count diff, first mismatching cells, max float delta).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue

        o, g = normalize(oracle), normalize(got)
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(o.columns)}"
                  f"\n  spark : {list(g.columns)}")
            n_fail += 1
            continue
        if len(o) != len(g):
            print(f"FAIL {name}: row count oracle={len(o)} spark={len(g)}")
            n_fail += 1
            continue
        bad = []
        for c in o.columns:
            ov, gv = o[c].tolist(), g[c].tolist()
            for i, (x, y) in enumerate(zip(ov, gv)):
                if not cells_equal(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) >= 5:
                        break
            if len(bad) >= 5:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches")
            for c, i, x, y in bad:
                print(f"  [{c}][{i}] oracle={x!r} spark={y!r}")
            n_fail += 1
        else:
            # dtype note (informational — driver may compare schemas)
            dt_diff = [(c, str(o[c].dtype), str(g[c].dtype))
                       for c in o.columns if str(o[c].dtype) != str(g[c].dtype)]
            note = f"  (dtype diff: {dt_diff})" if dt_diff else ""
            print(f"PASS {name} ({len(o)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracles)} total with oracles")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
