package graft

import graft.sql.SqlClient

/** The SQL Client shell (sql-client.md): REPL prompt, tableau result
  * boxes, INFO/ERROR lines, session continuity, QUIT. */
class SqlClientSpec extends SparkSpecBase {

  private def runRepl(script: String): String = {
    val in = new java.io.ByteArrayInputStream(
      script.getBytes("UTF-8"))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bos, true, "UTF-8")
    SqlClient.repl(spark, in, out)
    bos.toString("UTF-8")
  }

  test("REPL: tableau output, DDL info line, error continuation, QUIT") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli-")
    val out = runRepl(
      s"""CREATE TABLE cli_t (id BIGINT, name STRING) WITH (
         |  'connector'='filesystem', 'path'='$dir/t', 'format'='parquet');
         |INSERT INTO cli_t SELECT * FROM (VALUES (1, 'bob'),
         |  (2, 'alice')) AS v(id, name);
         |SELECT nope FROM missing_table;
         |SELECT name FROM cli_t ORDER BY id;
         |QUIT;
         |""".stripMargin)
    assert(out.contains("Flink SQL>"))
    assert(out.contains("[INFO] Execute statement succeeded."))
    assert(out.contains("[ERROR]")) // the bad statement did not kill the shell
    // tableau box with right-aligned cells and the rows footer
    assert(out.contains("|  name |"))
    assert(out.contains("|   bob |"))
    assert(out.contains("| alice |"))
    assert(out.contains("2 rows in set"))
  }

  test("scripted -f mode runs statements in order; split honors strings") {
    assert(SqlClient.splitTopLevel("SELECT 'a;b' AS x; SELECT 2") ==
      Seq("SELECT 'a;b' AS x", "SELECT 2"))
    val bos = new java.io.ByteArrayOutputStream()
    SqlClient.runScripted(spark,
      "SELECT 41 + 1 AS answer", new java.io.PrintStream(bos, true, "UTF-8"))
    val s = bos.toString("UTF-8")
    assert(s.contains("| answer |") && s.contains("|     42 |"))
    assert(s.contains("1 row in set"))
  }
}
