#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the testdata tables and compare with the Spark outputs written by
graft.Verify. Dev-loop tool only (drives no engine code).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, glob, os
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir")
        n_fail += 1
        continue
    try:
        sdf = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    except Exception as ex:
        print(f"FAIL {name}: cannot read spark output: {ex}")
        n_fail += 1
        continue
    try:
        odf = con.sql(sql).df()
    except Exception as ex:
        print(f"FAIL {name}: oracle SQL error: {ex}")
        n_fail += 1
        continue
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    problems = []
    if list(sdf.columns) != list(odf.columns):
        problems.append(f"columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
    elif sdf.shape != odf.shape:
        problems.append(f"shape spark={sdf.shape} oracle={odf.shape}")
    else:
        for c in sdf.columns:
            a, b = sdf[c].values, odf[c].values
            if str(sdf[c].dtype) != str(odf[c].dtype):
                problems.append(f"col {c} dtype spark={sdf[c].dtype} oracle={odf[c].dtype}")
            try:
                if sdf[c].dtype.kind == 'f':
                    both_nan = np.isnan(a.astype(float)) & np.isnan(b.astype(float))
                    neq = ~(both_nan | (a == b))
                else:
                    an, bn = sdf[c].isna().values, odf[c].isna().values
                    neq = ~((an & bn) | ((~an) & (~bn) & (a == b)))
            except Exception as ex:
                problems.append(f"col {c} compare error: {ex}")
                continue
            if neq.any():
                i = int(np.argmax(neq))
                extra = ""
                if sdf[c].dtype.kind == 'f':
                    d = np.nanmax(np.abs(a.astype(float) - b.astype(float)))
                    extra = f" (maxabsdiff={d:.3e})"
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(a)} rows differ; first at row {i}: "
                    f"spark={a[i]!r} oracle={b[i]!r}{extra}")
    if problems:
        n_fail += 1
        print(f"FAIL {name} [{sdf.shape[0]}x{sdf.shape[1]}]")
        for p in problems[:4]:
            print(f"     {p}")
    else:
        n_pass += 1
        print(f"PASS {name} [{sdf.shape[0]} rows]")
print(f"== {n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
