#!/usr/bin/env python3
"""Local oracle-parity checker (mirrors the driver's t2 gate).

Usage: python3 tools/check.py [sfdir] [outdir] [only_query...]

Runs graft.Verify (unless outdir already populated and --no-run), then for
each query compares the Spark parquet result against DuckDB running the
oracle SQL on the same tables: columns sorted by name, rows sorted, doubles
rounded to 9 significant places before compare.

Dev tool only — the engine itself has no Python dependency.
"""
import json, math, subprocess, sys, os
import duckdb

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
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(data)


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
            got_cols, got = rows_of(
                con.execute(f"SELECT * FROM '{path}/*.parquet'"))
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)" + \
                (" EMPTY!" if not got else "")
            continue
        try:
            exp_cols, exp = rows_of(con.execute(oracle[name]))
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
