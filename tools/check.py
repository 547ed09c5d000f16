#!/usr/bin/env python3
"""Local oracle-parity checker (mirrors the driver's t2 gate).

Usage: python3 tools/check.py [sfdir] [outdir] [only_query...]

Runs graft.Verify (unless outdir already populated and --no-run), then for
each query compares the Spark parquet result against DuckDB running the
oracle SQL on the same tables.

Canonicalization mirrors the DRIVER's gate, which goes through pandas on
both sides: Spark parquet via pyarrow->pandas (so DECIMAL columns surface
as decimal.Decimal objects, ints-with-nulls as float64, ...) and the oracle
via duckdb's .df() (DECIMAL/HUGEINT surface as float64). Cells are compared
as their str() rendering after column-name sort + row sort — the same class
of representation mismatches the driver hash sees. Do NOT "helpfully"
normalize numerics here: a Decimal('1.00') vs 1.0 difference is a real
driver failure and must stay visible.

Dev tool only — the engine itself has no Python dependency.
"""
import glob, json, math, subprocess, sys, os
import duckdb
import numpy as np
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]
NO_RUN = "--no-run" in sys.argv

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio", "java.base/java.util",
          "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
          "java.base/sun.nio.cs", "java.base/sun.security.action",
          "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"{p}=ALL-UNNAMED"]


def run_verify():
    cmd = (["java"] + ADD_OPENS +
           ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-Xmx8g", "-cp",
            "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Verify", SFDIR, OUT])
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  !", line)
    if r.returncode != 0:
        print(r.stderr[-4000:])
        sys.exit(1)


def canon(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return str(float(v))
    if isinstance(v, np.ndarray):
        return "ARRAY[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of_df(df):
    cols = sorted(df.columns)
    data = sorted(tuple(canon(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))
    return cols, data


def spark_df(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise RuntimeError("no parquet output")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    if not NO_RUN:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    names = ONLY or sorted(
        d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}"))
    for name in names:
        path = f"{OUT}/{name}"
        if not os.path.isdir(path):
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got_cols, got = rows_of_df(spark_df(path))
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)" + \
                (" EMPTY!" if not got else "")
            continue
        try:
            exp_cols, exp = rows_of_df(con.execute(oracle[name]).df())
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:200]}"
            continue
        if got_cols != exp_cols:
            results[name] = f"COLS {got_cols} != {exp_cols}"
        elif got == exp:
            results[name] = f"OK ({len(got)} rows)" + \
                (" EMPTY!" if not got else "")
        else:
            diff = None
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    diff = f"row {i}: got {g} exp {e}"
                    break
            if diff is None:
                diff = f"row-count {len(got)} vs {len(exp)}"
            results[name] = "MISMATCH " + diff
    ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name in sorted(results):
        print(f"{'PASS' if results[name].startswith(('OK','rows-only')) else 'FAIL':4} {name}: {results[name]}")
    print(f"\n{ok}/{len(results)} pass")


if __name__ == "__main__":
    main()
