#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
       python3 tools/check_correctness.py --sweep [outBase]

Two-arg mode runs each oracle SQL from <outDir>/oracle_sql.json in
DuckDB over the parquet tables in <sfDir>, loads the matching Spark
result parquet from <outDir>/<name>/, sorts columns by name and rows by
all columns, and compares values. Reports per-query PASS/FAIL with
diagnostics (schema diff, row-count diff, first mismatching cells).

--sweep automates the tri-SF diligence pass (it caught a real
rounding-headroom bug in round 5): for each of sf0.001/sf0.01/sf0.1 it
runs `sbt runMain graft.Verify` into <outBase>/<sf> (default
/tmp/graft_sweep), gates every query, and prints a per-SF pass/fail
matrix listing any query that fails anywhere. Exit 0 only if all three
SFs are fully green.
"""
import json
import math
import os
import subprocess
import sys

import duckdb
import pandas as pd

TESTDATA = "/root/testdata"
SWEEP_SFS = ["sf0.001", "sf0.01", "sf0.1"]

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


def check(sf_dir: str, out_dir: str, quiet: bool = False):
    """Gate every oracle query; return {name: True/False}."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}

    def say(msg):
        if not quiet:
            print(msg)

    for name, sql in sorted(oracles.items()):
        results[name] = False
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            say(f"FAIL {name}: oracle SQL error: {e}")
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            say(f"FAIL {name}: spark result unreadable: {e}")
            continue

        o, g = normalize(oracle), normalize(got)
        if list(o.columns) != list(g.columns):
            say(f"FAIL {name}: columns differ\n  oracle: {list(o.columns)}"
                f"\n  spark : {list(g.columns)}")
            continue
        if len(o) != len(g):
            say(f"FAIL {name}: row count oracle={len(o)} spark={len(g)}")
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
            say(f"FAIL {name}: {len(bad)}+ cell mismatches")
            for c, i, x, y in bad:
                say(f"  [{c}][{i}] oracle={x!r} spark={y!r}")
        else:
            # dtype note (informational — driver may compare schemas)
            dt_diff = [(c, str(o[c].dtype), str(g[c].dtype))
                       for c in o.columns if str(o[c].dtype) != str(g[c].dtype)]
            note = f"  (dtype diff: {dt_diff})" if dt_diff else ""
            say(f"PASS {name} ({len(o)} rows){note}")
            results[name] = True
    return results


def main(sf_dir: str, out_dir: str) -> int:
    results = check(sf_dir, out_dir)
    n_pass = sum(results.values())
    n_fail = len(results) - n_pass
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(results)} total with oracles")
    return 1 if n_fail else 0


def sweep(out_base: str) -> int:
    """Verify + gate at all three SFs; print the pass/fail matrix."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    matrix = {}
    for sf in SWEEP_SFS:
        sf_dir = f"{TESTDATA}/{sf}"
        out_dir = f"{out_base}/{sf}"
        print(f"[sweep] verifying {sf} ...", flush=True)
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
            cwd=repo, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"[sweep] Verify FAILED at {sf} (exit {r.returncode}); "
                  f"tail:\n" + "\n".join(r.stdout.splitlines()[-15:]))
            matrix[sf] = None
            continue
        matrix[sf] = check(sf_dir, out_dir, quiet=True)

    names = sorted({n for res in matrix.values() if res for n in res})
    bad = [n for n in names
           if any(res is not None and not res.get(n, False)
                  for res in matrix.values())]
    print(f"\n[sweep] {'query':<40}" + "".join(f"{sf:>10}" for sf in SWEEP_SFS))
    for n in bad:
        cells = "".join(
            f"{'RUN-FAIL' if matrix[sf] is None else ('PASS' if matrix[sf].get(n) else 'FAIL'):>10}"
            for sf in SWEEP_SFS)
        print(f"[sweep] {n:<40}{cells}")
    ok = all(res is not None and all(res.values()) for res in matrix.values())
    for sf in SWEEP_SFS:
        res = matrix[sf]
        desc = "verify failed" if res is None else \
            f"{sum(res.values())}/{len(res)} pass"
        print(f"[sweep] {sf}: {desc}")
    print(f"[sweep] {'ALL GREEN' if ok else 'FAILURES — see matrix above'}")
    return 0 if ok else 1


if __name__ == "__main__":
    if sys.argv[1] == "--sweep":
        out_base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sweep"
        sys.exit(sweep(out_base))
    sys.exit(main(sys.argv[1], sys.argv[2]))
