#!/usr/bin/env python3
"""Deep-tier check: the 99 official TPC-DS texts at sf1 (dev loop).

The committed per-round gate runs the 99 official query texts against the
committed sf0.03 fixtures, where 17 queries are vacuous (the official
qualification parameters target sf >= 1). This script closes that gap
reproducibly without committing ~260 MB of parquet:

    python3 tools/tpcds_sf1_gen.py /tmp/tpcds_sf1
    GRAFT_TPCDS_DIR=/tmp/tpcds_sf1 SPARK_GRAFT_CPUS=16 \
      sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_sf1 <all q_tpcds_sql_*>"
    python3 tools/tpcds_sf1_check.py /tmp/verify_sf1

It replays the driver's DuckDB compare (columns sorted by name, rows
sorted) on the sf1-bound oracle statements Verify emitted, and writes
TPCDS_SF1.json: per-query {rows, match}, the vacuous set, and totals.
Numeric cells allow one unit in the 4th decimal (the committed gate's
4-dp normalization has a half-ulp rounding cliff that sf1 averages can
land on); every tolerance-consumed cell is recorded in the artifact. The committed artifact is the evidence that the 16 queries the
sf0.03 gate can only parse/plan-check also VALUE-match at the reference's
own scale (only q17 stays empty at sf1 — documented in tpcds_sf1_gen.py).
"""
import duckdb, json, os, sys, time

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
artifact = sys.argv[2] if len(sys.argv) > 2 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "TPCDS_SF1.json")
oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
con = duckdb.connect()
per, fails, errs = {}, [], []
for name in sorted(oracles, key=lambda s: int(s.rsplit("_", 1)[1])
                   if s.rsplit("_", 1)[1].isdigit() else 0):
    if not name.startswith("q_tpcds_sql_"):
        continue
    pq = os.path.join(outdir, name)
    if not os.path.isdir(pq):
        errs.append(name)
        per[name] = {"rows": None, "match": False, "err": "no spark dump"}
        continue
    try:
        srel = con.execute("SELECT * FROM read_parquet('%s/*.parquet')" % pq)
        scols = [d[0] for d in srel.description]
        srows = srel.fetchall()
        t0 = time.time()
        orel = con.execute(oracles[name])
        duck_s = round(time.time() - t0, 3)
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]

        # The committed sf0.03 gate is cell-EXACT (both sides round to
        # 4 dp from the same meta). At sf1 an avg can land exactly on a
        # 0.00005 boundary where the two engines' double ulps round the
        # 4th decimal apart (q28: 134.01775 -> .0178 vs .0177), so the
        # deep tier compares numerics with a one-unit-in-the-4th-decimal
        # tolerance and REPORTS every cell that needed it.
        def key(r, idx):
            out = []
            for i in idx:
                v = r[i]
                if isinstance(v, (int, float)) and not isinstance(v, bool) \
                        and v is not None:
                    out.append(("n", round(float(v), 2)))
                else:
                    out.append(("s", str(v)))
            return tuple(out)
        snorm = sorted((key(r, sidx), tuple(r[i] for i in sidx))
                       for r in srows)
        onorm = sorted((key(r, oidx), tuple(r[i] for i in oidx))
                       for r in orows)
        tol_cells = []
        match = sorted(scols) == sorted(ocols) and len(snorm) == len(onorm)
        if match:
            for rn, ((_, sr), (_, orow)) in enumerate(zip(snorm, onorm)):
                for cn, (a, b) in enumerate(zip(sr, orow)):
                    if a == b or str(a) == str(b):
                        continue
                    try:
                        if abs(float(a) - float(b)) <= 1.5e-4:
                            tol_cells.append([rn, sorted(scols)[cn],
                                              str(a), str(b)])
                            continue
                    except (TypeError, ValueError):
                        pass
                    match = False
                if not match:
                    break
        per[name] = {"rows": len(srows), "match": match, "duck_s": duck_s}
        if tol_cells:
            per[name]["tolerance_cells"] = tol_cells
        if not match:
            fails.append(name)
    except Exception as e:
        errs.append(name)
        per[name] = {"rows": None, "match": False,
                     "err": str(e).split("\n")[0][:200]}
vacuous = sorted(int(k.rsplit("_", 1)[1]) for k, v in per.items()
                 if v.get("rows") == 0)
summary = {
    "sf": 1,
    "generator": "tools/tpcds_sf1_gen.py (DuckDB dsdgen sf=1, zstd parquet)",
    "queries": len(per),
    "matched": sum(1 for v in per.values() if v["match"]),
    "failed": fails,
    "errored": errs,
    "vacuous_qn": vacuous,
    "per_query": per,
}
json.dump(summary, open(artifact, "w"), indent=1)
print("matched %d/%d, vacuous %s, fails %s, errs %s -> %s" %
      (summary["matched"], len(per), vacuous, fails, errs, artifact))
