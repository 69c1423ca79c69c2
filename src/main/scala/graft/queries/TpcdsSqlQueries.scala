package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 99 OFFICIAL TPC-DS query texts, executed as SQL TEXT through the
  * [[graft.sql.FlinkSql]] entry against the real 24-table TPC-DS schema —
  * the reference's actual end-to-end gate
  * (flink-end-to-end-tests/test-scripts/test_tpcds.sh:22,
  * flink-end-to-end-tests/flink-tpcds-test/…/TpcdsTestProgram.java:76,102),
  * as opposed to the `q_tpcds_q*` shape pack which re-expresses the 99
  * structures in the DataFrame DSL over the synthetic star schema.
  *
  * Query texts: `src/main/resources/tpcds/q{1..99}.sql` — the official
  * TPC-DS qualification queries as shipped by DuckDB's public `tpcds`
  * extension (same queries the reference runs; public benchmark spec
  * content, not reference code). Data: `tpcds-data/sf0.03/<table>.parquet`,
  * generated once by DuckDB `CALL dsdgen(sf=0.03)` (committed fixtures —
  * deterministic, spec-defined generator output).
  *
  * Oracle construction (mirrored by tools/tpcds_oracle_gen.py, which
  * validates it against DuckDB in the dev loop): the official text is kept
  * BYTE-IDENTICAL and wrapped, never edited —
  *
  *   SELECT <normalized c1..cn>
  *   FROM (WITH <referenced tables AS read_parquet(fixture)>
  *         [, <original CTEs>] <original query>) AS t(c1, …, cn)
  *
  * Both sides normalize POSITIONALLY from the same committed per-query
  * metadata (`resources/tpcds/meta.txt`, derived from DuckDB's result
  * types): integer-class columns cast to BIGINT (DuckDB sums produce
  * HUGEINT, Spark LongType), float/decimal-class columns round to 4 dp as
  * DOUBLE (engines disagree on division/avg result scale; money sums have
  * at most 2 dp so rounding is the identity on them, and 4 dp keeps an
  * avg that lands exactly on a cent boundary — q27's 74.865 — away from
  * the rounding cliff that 2 dp sat on), everything else passes through. Positional `c1..cn` naming on both sides removes the
  * engine-specific naming of unaliased select items — the driver's compare
  * sorts columns by NAME, so names must agree even where the official text
  * aliases nothing.
  *
  * Scale: these run the same Catalyst plans a user's real TPC-DS would —
  * dims broadcast under AQE, fact-fact joins shuffle on their keys; the
  * sf0.03 fixtures verify the TEXT path end-to-end while the perf story
  * stays with the sf0.1/sf1 DSL pack and the scale-tier bench.
  */
object TpcdsSqlQueries {

  val tableNames: Seq[String] = Seq(
    "call_center", "catalog_page", "catalog_returns", "catalog_sales",
    "customer", "customer_address", "customer_demographics", "date_dim",
    "household_demographics", "income_band", "inventory", "item",
    "promotion", "reason", "ship_mode", "store", "store_returns",
    "store_sales", "time_dim", "warehouse", "web_page", "web_returns",
    "web_sales", "web_site")

  /** Fixture dir: repo-relative when the process runs in the repo (sbt,
    * driver), absolute fallback otherwise. The oracle text embeds the
    * ABSOLUTE form so the driver's DuckDB resolves it from any cwd.
    */
  private val dataDirCandidates: Seq[String] =
    sys.env.get("GRAFT_TPCDS_DIR").toSeq ++
      Seq("tpcds-data/sf0.03", "/root/repo/tpcds-data/sf0.03")

  // resolve-or-default, never throw: Registry builds every oracle text
  // eagerly, and a missing-fixtures box must still be able to LIST the
  // query map; run() fails with the clear message instead. An EXPLICIT
  // GRAFT_TPCDS_DIR is honored verbatim (a typo'd path must surface as
  // run()'s error, not silently fall back to the repo fixtures).
  lazy val dataDir: String =
    sys.env.get("GRAFT_TPCDS_DIR").map(new java.io.File(_)).getOrElse {
      dataDirCandidates.drop(sys.env.get("GRAFT_TPCDS_DIR").size)
        .map(new java.io.File(_)).find(_.isDirectory)
        .getOrElse(new java.io.File(dataDirCandidates.last))
    }.getAbsolutePath

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/tpcds/$name")
    require(in != null, s"missing resource /tpcds/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** qN -> per-column normalization classes: 'i' cast BIGINT, 'f' round
    * to 4dp DOUBLE, 'r' raw DOUBLE cast, 'd' DATE→TIMESTAMP (a raw DATE
    * column reads back as date vs Timestamp across the two sides of the
    * driver compare), '.' pass-through. */
  private lazy val meta: Map[Int, String] =
    resource("meta.txt").linesIterator.filter(_.nonEmpty).map { line =>
      val Array(k, classes) = line.trim.split("\\s+")
      k.drop(1).toInt -> classes
    }.toMap

  def officialText(n: Int): String = resource(s"q$n.sql")

  private def body(n: Int): String =
    officialText(n).trim.stripSuffix(";").trim

  private def referenced(text: String): Seq[String] =
    tableNames.filter(t => ("(?i)\\b" + t + "\\b").r.findFirstIn(text).isDefined)

  /** The DuckDB oracle statement (see scaladoc; validated in the dev loop
    * by tools/tpcds_oracle_gen.py against the same fixtures). */
  def oracleFor(n: Int, dir: String = dataDir): String = {
    val b = body(n)
    val classes = meta(n)
    val ctes = referenced(b).map(t =>
      s"$t AS (SELECT * FROM read_parquet('$dir/$t.parquet'))")
      .mkString(", ")
    val startsWith = "(?is)^\\s*WITH\\s+".r.findFirstMatchIn(b)
    val inner = startsWith match {
      case Some(m) => s"WITH $ctes, ${b.substring(m.end)}"
      case None => s"WITH $ctes $b"
    }
    val colList = (1 to classes.length).map(i => s"c$i").mkString(", ")
    val sel = classes.zipWithIndex.map { case (cl, i) =>
      val c = s"c${i + 1}"
      cl match {
        case 'i' => s"CAST($c AS BIGINT) AS $c"
        case 'f' => s"round(CAST($c AS DOUBLE), 4) AS $c"
        case 'r' => s"CAST($c AS DOUBLE) AS $c"
        case 'd' => s"CAST($c AS TIMESTAMP) AS $c"
        case _ => c
      }
    }.mkString(", ")
    s"SELECT $sel FROM ($inner) AS t($colList)"
  }

  private def tables(s: SparkSession, dir: String): Map[String, DataFrame] =
    tableNames.map(t => t -> graft.Tables(s, dir, t)).toMap

  /** Identical positional normalization on the Spark result. */
  private def normalize(df: DataFrame, classes: String): DataFrame = {
    require(df.columns.length == classes.length,
      s"arity mismatch: spark ${df.columns.length} vs meta ${classes.length}")
    val renamed = df.toDF((1 to classes.length).map(i => s"c$i"): _*)
    renamed.select(classes.zipWithIndex.map { case (cl, i) =>
      val c = col(s"c${i + 1}")
      (cl match {
        case 'i' => c.cast("bigint")
        case 'f' => round(c.cast("double"), 4)
        case 'r' => c.cast("double")
        case 'd' => c.cast("timestamp")
        case _ => c
      }).as(s"c${i + 1}")
    }: _*)
  }

  /** Run official query n through the SQL text entry and normalize. */
  def run(s: SparkSession, n: Int, dir: String = dataDir): DataFrame = {
    require(new java.io.File(dir).isDirectory,
      s"TPC-DS fixtures not found at $dir (tried " +
        dataDirCandidates.mkString(", ") +
        ") — run from the repo root or set GRAFT_TPCDS_DIR")
    normalize(graft.sql.FlinkSql.sql(s, body(n), tables(s, dir)), meta(n))
  }

  /** The 17 official texts whose committed sf0.03 oracles are VACUOUS
    * (zero rows on both sides — their qualification parameters target
    * sf >= 1), so the per-round gate proves only emptiness-agreement for
    * them. The sf1 deep tier below value-checks exactly these. */
  val vacuousAtSf003: Seq[Int] =
    Seq(4, 8, 23, 24, 25, 31, 37, 41, 44, 54, 58, 64, 65, 73, 82, 91, 93)

  /** sf1 deep-tier corpus (NON-committed, ~260 MB: regenerate with
    * `python3 tools/tpcds_sf1_gen.py tpcds-data/sf1` — deterministic
    * DuckDB dsdgen output, gitignored but persisted on the round box). */
  private val sf1DirCandidates: Seq[String] =
    sys.env.get("GRAFT_TPCDS_SF1_DIR").toSeq ++
      Seq("tpcds-data/sf1", "/root/repo/tpcds-data/sf1")
  lazy val sf1Dir: Option[String] =
    sf1DirCandidates.map(new java.io.File(_)).find(_.isDirectory)
      .map(_.getAbsolutePath)

  /** De-vacuation tier (r17, VERDICT task 3b): when the sf1 corpus is
    * present, the 17 sf0.03-vacuous texts ALSO run per-round against sf1,
    * where each returns real rows — so the driver's replay value-checks
    * them instead of comparing empty-vs-empty. Gated on corpus presence:
    * a clean box without the generated corpus skips the tier (the
    * committed sf0.03 gate is unaffected), and [[graft.Verify]] prints
    * which branch was taken so a silent skip is auditable. */
  lazy val sf1Defs: Seq[QueryDef] = sf1Dir match {
    case Some(dir) =>
      vacuousAtSf003.map { n =>
        QueryDef(
          f"q_tpcds_sf1_$n%02d",
          (s, _) => run(s, n, dir),
          Some(oracleFor(n, dir)))
      }
    case None => Nil
  }

  val defs: Seq[QueryDef] =
    (1 to 99).map { n =>
      QueryDef(
        f"q_tpcds_sql_$n%02d",
        (s, _) => run(s, n),
        Some(oracleFor(n)))
    }
}
