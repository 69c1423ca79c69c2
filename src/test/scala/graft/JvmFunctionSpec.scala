package graft

import graft.sql.FlinkDdl

/** A classpath scalar function with the reference's ScalarFunction
  * contract (public eval, default constructor).
  */
class UpperSuffixFn {
  def eval(s: String, n: java.lang.Integer): String =
    if (s == null || n == null) null else s.toUpperCase + ":" + n
}

/** `CREATE FUNCTION name AS 'class'` DDL: classpath classes register and
  * run; `USING JAR` loads from an isolated location NOT on the session
  * classpath (compiled at test time with javax.tools); DROP FUNCTION
  * unregisters; ALTER VIEW renames and redefines.
  */
class JvmFunctionSpec extends SparkSpecBase {

  test("CREATE FUNCTION AS classpath class, use in a script, DROP") {
    val out = FlinkDdl.run(spark,
      """CREATE FUNCTION up_sfx AS 'graft.UpperSuffixFn' LANGUAGE SCALA;
        |SELECT up_sfx('hello', 7) AS r""".stripMargin)
    assert(out.collect().head.getString(0) == "HELLO:7")
    FlinkDdl.run(spark, "DROP FUNCTION up_sfx; SELECT 1 AS one")
    val err = intercept[Exception] {
      spark.sql("SELECT up_sfx('x', 1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("up_sfx"))
  }

  test("CREATE FUNCTION USING JAR loads a class absent from the classpath") {
    // compile a Java source at test time into an isolated dir so the
    // class genuinely cannot resolve without the USING JAR path
    val dir = java.nio.file.Files.createTempDirectory("graft_fn").toFile
    val src = new java.io.File(dir, "JarOnlyFn.java")
    java.nio.file.Files.writeString(src.toPath,
      """public class JarOnlyFn {
        |  public String eval(String s) { return "JAR:" + s; }
        |}""".stripMargin)
    val jc = javax.tools.ToolProvider.getSystemJavaCompiler
    assume(jc != null, "system java compiler unavailable")
    assert(jc.run(null, null, null, "-d", dir.getAbsolutePath,
      src.getAbsolutePath) == 0)
    val cnf = intercept[IllegalArgumentException] {
      FlinkDdl.run(spark,
        "CREATE FUNCTION jf AS 'JarOnlyFn'; SELECT 1 AS one")
    }
    assert(cnf.getMessage.contains("not found"))
    // URLClassLoader accepts a directory as a jar-style root
    val out = FlinkDdl.run(spark,
      s"""CREATE FUNCTION jar_fn AS 'JarOnlyFn'
         |  USING JAR '${dir.getAbsolutePath}/';
         |SELECT jar_fn('x') AS r""".stripMargin)
    assert(out.collect().head.getString(0) == "JAR:x")
  }

  test("ADD JAR extends CREATE FUNCTION resolution; SHOW/REMOVE manage it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_addjar").toFile
    val src = new java.io.File(dir, "AddJarFn.java")
    java.nio.file.Files.writeString(src.toPath,
      """public class AddJarFn {
        |  public String eval(String s) { return "ADDED:" + s; }
        |}""".stripMargin)
    val jc = javax.tools.ToolProvider.getSystemJavaCompiler
    assume(jc != null, "system java compiler unavailable")
    assert(jc.run(null, null, null, "-d", dir.getAbsolutePath,
      src.getAbsolutePath) == 0)
    // the session classpath alone cannot see the class
    val cnf = intercept[IllegalArgumentException](FlinkDdl.run(spark,
      "CREATE FUNCTION aj AS 'AddJarFn'; SELECT 1 AS one"))
    assert(cnf.getMessage.contains("not found"))
    // ADD JAR makes it resolvable without USING JAR (jar.md flow)
    val out = FlinkDdl.run(spark,
      s"""ADD JAR '${dir.getAbsolutePath}/';
         |CREATE FUNCTION aj AS 'AddJarFn';
         |SELECT aj('y') AS r""".stripMargin)
    assert(out.collect().head.getString(0) == "ADDED:y")
    // SHOW JARS lists in add order; REMOVE drops; unknown REMOVE errors
    val shown = FlinkDdl.run(spark,
      s"""ADD JAR '${dir.getAbsolutePath}/'; SHOW JARS""")
    assert(shown.columns.toSeq == Seq("jars"))
    assert(shown.collect().map(_.getString(0)).toSeq ==
      Seq(s"${dir.getAbsolutePath}/"))
    val removed = FlinkDdl.run(spark,
      s"""ADD JAR '${dir.getAbsolutePath}/';
         |REMOVE JAR '${dir.getAbsolutePath}/';
         |SHOW JARS""".stripMargin)
    assert(removed.collect().isEmpty)
    val missing = intercept[IllegalArgumentException](FlinkDdl.run(spark,
      "REMOVE JAR '/nope.jar'; SELECT 1 AS one"))
    assert(missing.getMessage.contains("was not added"))
    val absent = intercept[IllegalArgumentException](FlinkDdl.run(spark,
      "ADD JAR '/no/such/path.jar'; SELECT 1 AS one"))
    assert(absent.getMessage.contains("does not exist"))
  }

  test("ALTER VIEW renames and redefines") {
    val out = FlinkDdl.run(spark,
      """CREATE VIEW v1 AS SELECT 1 AS a;
        |ALTER VIEW v1 RENAME TO v2;
        |ALTER VIEW v2 AS SELECT 42 AS a;
        |SELECT a FROM v2""".stripMargin)
    assert(out.collect().head.getInt(0) == 42)
    assert(!spark.catalog.tableExists("v1"))
  }
}
