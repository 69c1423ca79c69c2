#!/usr/bin/env python3
"""Dev-loop harness for the official-TPC-DS oracle family (round 16).

Builds, for each of the 99 official query texts (src/main/resources/tpcds/
q{n}.sql, exported from DuckDB's public `tpcds` extension — the same
official qualification queries the reference's
flink-end-to-end-tests/test-scripts/test_tpcds.sh runs), the DuckDB oracle
statement graft's Registry emits:

    SELECT <normalized c1..cn>
    FROM (WITH <referenced tables bound to read_parquet(...)>
          [, <original CTEs>] <original SELECT>) AS t(c1, .., cn)

and runs it against the committed fixtures to (a) prove the construction
parses, (b) record each query's result arity + per-column normalization
class into src/main/resources/tpcds/meta.txt (read by the Scala runner so
both sides normalize identically), (c) record DuckDB-side timings.

Dev-only: the driver never runs this; the committed meta.txt + q*.sql are
the build inputs.
"""
import duckdb, glob, json, os, re, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tpcds-data", "sf0.03")
QDIR = os.path.join(REPO, "src", "main", "resources", "tpcds")

TABLES = sorted(
    os.path.basename(p)[:-8] for p in glob.glob(os.path.join(DATA, "*.parquet")))


def referenced(text):
    return [t for t in TABLES if re.search(r"\b%s\b" % t, text, re.I)]


def oracle_sql(text, ncols, classes, data_dir=DATA):
    """classes: per-column 'i' (cast bigint), 'f' (round(double,2)), 'r'
    (raw double cast, no rounding), '.' (leave as-is)."""
    body = text.strip().rstrip(";").strip()
    ctes = ", ".join(
        "%s AS (SELECT * FROM read_parquet('%s/%s.parquet'))"
        % (t, data_dir, t) for t in referenced(body))
    m = re.match(r"(?is)^\s*WITH\s+", body)
    inner = ("WITH %s, %s" % (ctes, body[m.end():])) if m else \
            ("WITH %s %s" % (ctes, body))
    cols = ", ".join("c%d" % (i + 1) for i in range(ncols))
    sel = ", ".join(
        ("CAST(c%d AS BIGINT) AS c%d" % (i + 1, i + 1)) if cl == "i" else
        ("round(CAST(c%d AS DOUBLE), 4) AS c%d" % (i + 1, i + 1)) if cl == "f" else
        ("CAST(c%d AS DOUBLE) AS c%d" % (i + 1, i + 1)) if cl == "r" else
        ("CAST(c%d AS TIMESTAMP) AS c%d" % (i + 1, i + 1)) if cl == "d" else
        ("c%d" % (i + 1))
        for i, cl in enumerate(classes))
    return "SELECT %s FROM (%s) AS t(%s)" % (sel, inner, cols)


def classify(duck_type):
    t = duck_type.lower()
    if any(k in t for k in ("tinyint", "smallint", "integer", "bigint", "hugeint")):
        return "i"
    if any(k in t for k in ("decimal", "double", "float", "real")):
        return "f"
    if t == "date":
        # raw DATE output: pandas reads the DuckDB side as Timestamp but
        # the Spark parquet side as datetime.date — cast both to TIMESTAMP
        return "d"
    return "."


def main():
    con = duckdb.connect()
    meta, times, fails = {}, {}, []
    overrides = {}          # qn -> list of (index, class) forced entries
    if os.path.exists(os.path.join(QDIR, "overrides.json")):
        overrides = {int(k): v for k, v in json.load(
            open(os.path.join(QDIR, "overrides.json"))).items()}
    for n in range(1, 100):
        text = open(os.path.join(QDIR, "q%d.sql" % n)).read()
        # pass 1: raw arity + duck types via LIMIT-0 describe of the inner
        body = text.strip().rstrip(";").strip()
        ctes = ", ".join(
            "%s AS (SELECT * FROM read_parquet('%s/%s.parquet'))"
            % (t, DATA, t) for t in referenced(body))
        m = re.match(r"(?is)^\s*WITH\s+", body)
        inner = ("WITH %s, %s" % (ctes, body[m.end():])) if m else \
                ("WITH %s %s" % (ctes, body))
        try:
            # relation API: .types carries REAL DuckDB types (DBAPI
            # description collapses every numeric to the generic 'NUMBER')
            rel = con.sql("SELECT * FROM (%s) AS t LIMIT 0" % inner)
            classes = [classify(str(t)) for t in rel.types]
            for i, cl in overrides.get(n, []):
                classes[i] = cl
            sql = oracle_sql(text, len(classes), classes)
            t0 = time.time()
            rows = con.execute(sql).fetchall()
            times["q%d" % n] = round(time.time() - t0, 3)
            meta["q%d" % n] = "".join(classes)
        except Exception as e:
            fails.append((n, str(e).split("\n")[0][:200]))
    with open(os.path.join(QDIR, "meta.txt"), "w") as f:
        for n in range(1, 100):
            k = "q%d" % n
            if k in meta:
                f.write("%s %s\n" % (k, meta[k]))
    json.dump(times, open("/tmp/tpcds_duck_times.json", "w"), indent=1)
    print("ok:", len(meta), "fail:", len(fails))
    for n, e in fails:
        print("FAIL q%d: %s" % (n, e))


if __name__ == "__main__":
    main()
