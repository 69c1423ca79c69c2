#!/usr/bin/env python3
"""Generate the NON-COMMITTED sf1 TPC-DS fixture set for the deep-tier
official-text run (dev loop; see tools/tpcds_sf1_check.py).

The committed gate (`tpcds-data/sf0.03`, 8.6 MB) runs all 99 official
texts per round, but 17 of them are vacuous (zero rows) there: DuckDB's
official qualification parameters are tuned for sf >= 1, and the sf1
fixture set is ~260 MB of parquet — too heavy to commit. This script
regenerates it deterministically (DuckDB `CALL dsdgen(sf=1)` — the
spec-defined generator, same provenance as the committed sf0.03) so the
deep run is reproducible from a clean checkout:

    python3 tools/tpcds_sf1_gen.py [outdir=/tmp/tpcds_sf1]

then run the 99 texts through graft's SQL entry against it and compare
with DuckDB on the identical data (tools/tpcds_sf1_check.py). At sf1 only
q17 remains vacuous (its store/catalog same-quarter return-repurchase
chain first matches at larger scale), so the deep tier value-checks the
16 queries the committed gate can only parse/plan-check.
"""
import duckdb, os, sys, time

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpcds_sf1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
t0 = time.time()
con.execute("CALL dsdgen(sf=1)")
print("dsdgen(sf=1): %.0fs" % (time.time() - t0))
tables = [r[0] for r in con.execute("SHOW TABLES").fetchall()]
assert len(tables) == 24, tables
for t in sorted(tables):
    con.execute("COPY %s TO '%s/%s.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"
                % (t, out, t))
    print("  %-24s %8.1f MB" % (t, os.path.getsize("%s/%s.parquet" % (out, t)) / 1e6))
print("done: %s" % out)
