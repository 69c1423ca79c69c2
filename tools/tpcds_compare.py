#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB compare, for the official-TPC-DS
family: reads a Verify outDir (parquet per query + oracle_sql.json), runs
each oracle in DuckDB, and compares as the driver does — columns sorted by
name, rows sorted, exact values. Usage: tpcds_compare.py <outDir> [prefix].
"""
import duckdb, glob, json, os, sys

outdir = sys.argv[1]
prefix = sys.argv[2] if len(sys.argv) > 2 else "q_tpcds_sql_"
oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
con = duckdb.connect()
fails, errs, ok = [], [], 0
for name in sorted(oracles):
    if not name.startswith(prefix):
        continue
    pq = os.path.join(outdir, name)
    if not os.path.isdir(pq):
        errs.append((name, "no spark dump"))
        continue
    try:
        spark_rel = con.execute(
            "SELECT * FROM read_parquet('%s/*.parquet')" % pq)
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        orel = con.execute(oracles[name])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        if sorted(scols) != sorted(ocols):
            fails.append((name, "cols: %s vs %s" % (scols, ocols)))
            continue
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        snorm = sorted(tuple(str(r[i]) for i in sidx) for r in srows)
        onorm = sorted(tuple(str(r[i]) for i in oidx) for r in orows)
        if len(snorm) != len(onorm):
            fails.append((name, "rows %d vs %d" % (len(snorm), len(onorm))))
        elif snorm != onorm:
            diff = [(a, b) for a, b in zip(snorm, onorm) if a != b]
            fails.append((name, "%d/%d differing rows; first: %s" %
                          (len(diff), len(snorm), diff[0] if diff else "")))
        else:
            ok += 1
    except Exception as e:
        errs.append((name, str(e).split("\n")[0][:200]))
print("ok=%d fail=%d err=%d" % (ok, len(fails), len(errs)))
for n, m in fails:
    print("MISMATCH", n, m[:500])
for n, m in errs:
    print("ERR", n, m)
