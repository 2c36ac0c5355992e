#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB oracle gate.

Usage: python3 scripts/check_correctness.py [sf_dir] [out_dir]

Expects `sbt "runMain graft.Verify <sf_dir> <out_dir>"` to have run first
(or run with --run to invoke it). Compares each query's parquet output
against the DuckDB result of its oracle SQL: row count, column names
(sorted), and cell values (rows sorted by all columns).

NOT part of the shipped library — the engine itself is pure Scala/Spark.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--run" in sys.argv:
    subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR}'],
        check=True, cwd="/root/repo")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.loads((OUT_DIR / "oracle_sql.json").read_text())

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)
    return a == b

fails = 0
# Verify records throwers in failed.json precisely so they can't read as
# passes by being absent from the output dir — count them as failures
# here too (this script previously skipped them silently, which printed
# "PASS" for a run whose only selected query had failed).
failed_path = OUT_DIR / "failed.json"
if failed_path.exists():
    for name, err in json.loads(failed_path.read_text()).items():
        print(f"✗ {name}: Verify FAILED: {err}")
        fails += 1
for name in sorted(p.name for p in OUT_DIR.iterdir() if p.is_dir()):
    got = pd.read_parquet(OUT_DIR / name)
    if name not in oracle:
        print(f"  {name}: NO ORACLE (rows-only) rows={len(got)}"
              + ("  ** EMPTY **" if len(got) == 0 else ""))
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"✗ {name}: oracle SQL failed: {e}")
        fails += 1
        continue
    g, e = normalize(got.copy()), normalize(exp.copy())
    if list(g.columns) != list(e.columns):
        print(f"✗ {name}: columns differ spark={list(g.columns)} duck={list(e.columns)}")
        fails += 1
        continue
    if len(g) != len(e):
        print(f"✗ {name}: row count spark={len(g)} duck={len(e)}")
        fails += 1
        continue
    # dtype-strict: the driver hashes stringified values, so int64 123 vs
    # float64 123.0 fails there even though Python == says equal. Compare
    # numpy kinds (int/uint vs float) so that class can't slip through.
    kind_diffs = [
        f"{c}: spark={g[c].dtype} duck={e[c].dtype}"
        for c in g.columns
        if {g[c].dtype.kind, e[c].dtype.kind} == {"f", "i"}
        or {g[c].dtype.kind, e[c].dtype.kind} == {"f", "u"}
    ]
    if kind_diffs:
        print(f"✗ {name}: dtype mismatch: " + "; ".join(kind_diffs))
        fails += 1
        continue
    diff_cells = []
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        bad = [i for i in range(len(gv)) if not cells_equal(gv[i], ev[i])]
        if bad:
            i = bad[0]
            diff_cells.append(f"{c}[{i}]: spark={gv[i]!r} duck={ev[i]!r} ({len(bad)} cells)")
    if diff_cells:
        print(f"✗ {name}: value mismatch: " + "; ".join(diff_cells[:3]))
        fails += 1
    else:
        print(f"✓ {name}: rows={len(g)}")

print(f"\n{'FAIL' if fails else 'PASS'} ({fails} failing)")
sys.exit(1 if fails else 0)
