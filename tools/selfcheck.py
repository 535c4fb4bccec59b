#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs graft.Verify (already-compiled classes) on a scale-factor dir, then
replays every oracle SQL in DuckDB over the same parquet tables and
compares: column names, row count, and values (exact for non-floats,
bitwise-intent for floats since both sides round explicitly).

Usage: python3 tools/selfcheck.py [sfDir] [--skip-verify] [queries...]
"""
import argparse
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ap = argparse.ArgumentParser(description=__doc__)
_ap.add_argument("args", nargs="*",
                 help="[sfDir] [queries...] in any order; a positional "
                      "that is an existing directory is the sf dir")
_ap.add_argument("--skip-verify", action="store_true")
_ARGS = _ap.parse_args()
_dirs = [a for a in _ARGS.args if os.path.isdir(a)]
SF = _dirs[0] if _dirs else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify_out"
ONLY = [a for a in _ARGS.args if not os.path.isdir(a)]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]


def run_verify():
    # clean slate: stale result dirs from renamed/deleted queries would
    # otherwise keep "passing" forever
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    cmd = (["java"] + ADD_OPENS +
           ["-Xmx16g", "-Dspark.ui.enabled=false", "-cp", cp,
            "graft.Verify", SF, OUT])
    r = subprocess.run(cmd, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  !", line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # duckdb may return decimal/object numerics; unify
        if df[c].dtype == object and len(df) and isinstance(
                df[c].dropna().iloc[0] if df[c].notna().any() else None,
                (int, float)):
            df[c] = pd.to_numeric(df[c])
    return df


def schema_problems(got: pd.DataFrame, want: pd.DataFrame) -> list:
    """Raw-dtype comparison BEFORE norm() erases representational
    differences — the driver's schema gate checks the types the two
    engines actually emit, and norm()'s tz_localize used to hide exactly
    the class that failed q133 in r8 (TIMESTAMPTZ vs naive TIMESTAMP).
    A tz-aware/naive mismatch is a hard FAIL (proven driver-checked);
    width/representation diffs that hash identically after norm (int32
    vs int64, duckdb decimal-as-object vs float) are warnings only.
    """
    hard, soft = [], []
    for c in sorted(set(got.columns) & set(want.columns)):
        a, b = str(got[c].dtype), str(want[c].dtype)
        if a == b:
            continue
        a_dt, b_dt = a.startswith("datetime64"), b.startswith("datetime64")
        a_tz, b_tz = "UTC" in a or "+" in a, "UTC" in b or "+" in b
        if a_dt and b_dt and a_tz != b_tz:
            hard.append(f"col {c}: tz-awareness mismatch spark={a} oracle={b}")
        else:
            soft.append(f"{c}:{a}!={b}")
    return hard, soft


def main():
    if not _ARGS.skip_verify:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    all_declared = sorted(set(oracles) | {
        d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}")})
    names = ONLY or all_declared
    n_pass = n_fail = 0
    for name in names:
        pdir = f"{OUT}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
        if name not in oracles:
            # no SQL oracle declared -> driver records a weaker rows-only
            # check; zero rows means the operator silently died
            if len(got) == 0:
                print(f"FAIL {name}: rows-only query returned 0 rows")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows) [rows-only, no oracle]")
                n_pass += 1
            continue
        want = con.execute(oracles[name]).fetchdf()
        hard_dtype, soft_dtype = schema_problems(got, want)
        g, w = norm(got), norm(want)
        problems = list(hard_dtype)
        if list(g.columns) != list(w.columns):
            problems.append(f"cols spark={list(g.columns)} oracle={list(w.columns)}")
        elif len(g) != len(w):
            problems.append(f"rows spark={len(g)} oracle={len(w)}")
        else:
            for c in g.columns:
                a, b = g[c], w[c]
                try:
                    eq = (a.isna() & b.isna()) | (a == b)
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    problems.append(
                        f"col {c}: {(~eq).sum()} diffs, first@{i}: "
                        f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
        dt = soft_dtype
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            extra = f"  [dtype: {', '.join(dt)}]" if dt else ""
            print(f"PASS {name} ({len(g)} rows){extra}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
