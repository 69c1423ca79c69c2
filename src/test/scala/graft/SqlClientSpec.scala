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

  test("an executed CTAS is not re-run by later statements' replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ctas-")
    val session = new graft.sql.StatementSession(spark)
    session.execute(
      s"""CREATE TABLE ctas_src (id BIGINT, v STRING) WITH (
         |'connector'='filesystem', 'path'='$dir/src', 'format'='parquet')"""
        .stripMargin)
    session.execute(
      "INSERT INTO ctas_src SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS t(id, v)")
    session.execute(
      s"""CREATE TABLE ctas_t WITH ('connector'='filesystem',
         |'path'='$dir/t', 'format'='parquet') AS
         |SELECT id, v FROM ctas_src""".stripMargin)
    // 1) an INSERT into the CTAS-created table must survive later
    //    statements (the raw-replay bug silently wiped it)
    session.execute(
      "INSERT INTO ctas_t SELECT * FROM (VALUES (3, 'c')) AS t(id, v)")
    // 2) mutating the SOURCE must not retroactively change the CTAS table
    session.execute(
      "INSERT INTO ctas_src SELECT * FROM (VALUES (9, 'z')) AS t(id, v)")
    val (rows, ddlOk) = session.executeTagged(
      "SELECT id FROM ctas_t ORDER BY id")
    assert(!ddlOk)
    assert(rows.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // the source saw its insert normally
    assert(session.execute("SELECT count(*) AS c FROM ctas_src")
      .collect().head.getLong(0) == 3L)
  }

  test("a genuine one-column 'result'='OK' query prints as rows, not INFO") {
    val bos = new java.io.ByteArrayOutputStream()
    SqlClient.runScripted(spark, "SELECT 'OK' AS result",
      new java.io.PrintStream(bos, true, "UTF-8"))
    val s = bos.toString("UTF-8")
    assert(s.contains("| result |") && s.contains("|     OK |"))
    assert(s.contains("1 row in set"))
    assert(!s.contains("[INFO] Execute statement succeeded."))
  }

  test("result modes: changelog prefixes ops, table materializes retracts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mode-")
    val bos = new java.io.ByteArrayOutputStream()
    SqlClient.runScripted(spark,
      s"""CREATE TABLE cl (k BIGINT, v STRING, __seq BIGINT,
         |  __rowkind STRING) WITH ('connector'='filesystem',
         |  'path'='$dir/cl', 'format'='parquet');
         |INSERT INTO cl SELECT * FROM (VALUES
         |  (1, 'a', 1, '+I'), (1, 'a', 2, '-U'), (1, 'b', 3, '+U'),
         |  (2, 'z', 4, '+I')) AS t(k, v, __seq, __rowkind);
         |SET 'sql-client.execution.result-mode' = 'changelog';
         |SELECT k, v, __seq, __rowkind FROM cl WHERE k = 2;
         |SET 'sql-client.execution.result-mode' = 'table';
         |SELECT * FROM cl;
         |SET 'sql-client.execution.result-mode' = 'tableau';
         |SELECT 7 AS seven""".stripMargin,
      new java.io.PrintStream(bos, true, "UTF-8"))
    val out = bos.toString("UTF-8")
    // changelog mode: the op column leads, meta columns hidden (scoped
    // past the INSERT's raw tableau echo, which shows them as data)
    assert(out.contains("| op |"), out)
    assert(out.contains("| +I |"), out)
    assert(!out.substring(out.indexOf("| op |")).contains("__rowkind"), out)
    // table mode: retract materialization — (1,a) was inserted then
    // retracted away, (1,b) and (2,z) remain ('a' appears only in the
    // INSERT's raw echo, before the mode switches)
    val afterModes = out.substring(out.indexOf("| op |"))
    assert(afterModes.contains("| b |"), out)
    assert(afterModes.contains("| z |"), out)
    assert(!afterModes.contains("| a |"), out)
    // back to tableau
    assert(out.contains("| seven |"), out)
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
