package graft

import java.nio.file.{Files, Paths}

import graft.plans.Qualify
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** plans.Qualify — the host engine's QUALIFY clause folded into Spark's
  * window-subquery shape: rewrite unit cases (quote/comment/nesting
  * robustness), end-to-end equivalence with the hand-written window form,
  * and the session-wide injected-parser path.
  */
class QualifySpec extends AnyFunSuite {

  private def spark = SparkTestBase.spark

  private val ddl =
    "SELECT * FROM VALUES (1, 'a', 10.0D), (2, 'a', 30.0D), (3, 'a', 20.0D), " +
      "(4, 'b', 5.0D), (5, 'b', 15.0D) AS t(id, grp, v)"

  test("rewrite: passthrough without QUALIFY, and quoted/comment mentions stay put") {
    val plain = "SELECT a FROM t WHERE b = 1"
    assert(Qualify.rewrite(plain) eq plain)
    // the word inside a string literal or comment is not a clause
    val s1 = "SELECT 'QUALIFY' AS w FROM t"
    assert(Qualify.rewrite(s1) == s1)
    val s2 = "SELECT a -- QUALIFY note\nFROM t"
    assert(Qualify.rewrite(s2) == s2)
    val s3 = "SELECT a /* QUALIFY */ FROM t"
    assert(Qualify.rewrite(s3) == s3)
  }

  test("rewrite: unsupported shapes throw QualifyRewriteException") {
    intercept[Qualify.QualifyRewriteException] {
      Qualify.rewrite("SELECT DISTINCT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1")
    }
    intercept[Qualify.QualifyRewriteException] {
      Qualify.rewrite("SELECT a FROM t QUALIFY ")
    }
  }

  test("qualify equals the hand-written window-subquery form") {
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    val viaQualify = Qualify.sql(s,
      """SELECT grp, id, v FROM q_t
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC) <= 2
        |ORDER BY grp, v DESC""".stripMargin)
    val byHand = s.sql(
      """SELECT grp, id, v FROM (
        |  SELECT grp, id, v,
        |         row_number() OVER (PARTITION BY grp ORDER BY v DESC) AS rn
        |  FROM q_t) WHERE rn <= 2
        |ORDER BY grp, v DESC""".stripMargin)
    assert(viaQualify.columns.toSeq == Seq("grp", "id", "v"))
    assert(viaQualify.collect().toSeq == byHand.collect().toSeq)
  }

  test("qualify inside a CTE body and a FROM subquery (recursive rewrite)") {
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    val out = Qualify.sql(s,
      """WITH best AS (
        |  SELECT grp, id, v FROM q_t
        |  QUALIFY rank() OVER (PARTITION BY grp ORDER BY v DESC) = 1
        |)
        |SELECT grp, id FROM best ORDER BY grp""".stripMargin)
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 2), ("b", 5)))

    val sub = Qualify.sql(s,
      """SELECT count(*) AS n FROM (
        |  SELECT id FROM q_t
        |  QUALIFY row_number() OVER (PARTITION BY grp ORDER BY id) = 1
        |)""".stripMargin)
    assert(sub.collect().head.getLong(0) == 2L)
  }

  test("qualify on set-operation operands: each operand folds independently") {
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    val out = Qualify.sql(s,
      """SELECT grp, id FROM q_t
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC) = 1
        |UNION ALL
        |SELECT grp, id FROM q_t
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v ASC) = 1
        |ORDER BY grp, id""".stripMargin)
    // best-per-group (2, 5) plus worst-per-group (1, 4)
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("a", 2), ("b", 4), ("b", 5)))
  }

  test("qualify predicate referencing GROUP BY aggregates") {
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    val out = Qualify.sql(s,
      """SELECT grp, round(sum(v), 1) AS total FROM q_t
        |GROUP BY grp
        |QUALIFY rank() OVER (ORDER BY sum(v) DESC) = 1""".stripMargin)
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 60.0)))
  }

  test("distinct on: first row per key, order double-duty, plain DISTINCT untouched") {
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    // highest v per group, output ordered by the same clause
    val out = Qualify.sql(s,
      """SELECT DISTINCT ON (grp) grp, id, v FROM q_t
        |ORDER BY grp, v DESC""".stripMargin)
    assert(out.columns.toSeq == Seq("grp", "id", "v"))
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 2), ("b", 5)))
    // no ORDER BY: the keys order the pick — deterministic here because
    // each group's minimum (grp) row is keyed by grp alone; just shape-check
    val bare = Qualify.sql(s, "SELECT DISTINCT ON (grp) grp FROM q_t")
    assert(bare.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // inside a CTE body (recursive fold)
    val cte = Qualify.sql(s,
      """WITH best AS (
        |  SELECT DISTINCT ON (grp) grp, v FROM q_t ORDER BY grp, v DESC
        |)
        |SELECT grp, v FROM best ORDER BY grp""".stripMargin)
    assert(cte.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 30.0), ("b", 15.0)))
    // plain DISTINCT (no ON) passes through unrewritten
    val plain = "SELECT DISTINCT grp FROM q_t ORDER BY grp"
    assert(Qualify.dialect(plain) == plain)
    assert(Qualify.sql(s, plain).collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    // WITH clause BEFORE a top-level DISTINCT ON (the keys group is not the
    // first top-level paren group — regression: must not misresolve it)
    val withTop = Qualify.sql(s,
      """WITH src AS (SELECT grp, id, v FROM q_t)
        |SELECT DISTINCT ON (grp) grp, id, v FROM src
        |ORDER BY grp, v DESC""".stripMargin)
    assert(withTop.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 2), ("b", 5)))
  }

  test("star EXCLUDE rewrites to EXCEPT only in the star-modifier position") {
    assert(Qualify.rewriteExclude("SELECT * EXCLUDE (a, b) FROM t") ==
      "SELECT * EXCEPT (a, b) FROM t")
    assert(Qualify.rewriteExclude("SELECT t.* EXCLUDE (a) FROM t") ==
      "SELECT t.* EXCEPT (a) FROM t")
    // identifier / string / non-star positions stay put
    val id = "SELECT exclude FROM t WHERE exclude > 1"
    assert(Qualify.rewriteExclude(id) == id)
    val s1 = "SELECT '* EXCLUDE (x)' AS w FROM t"
    assert(Qualify.rewriteExclude(s1) == s1)
    // end-to-end through the dialect entry point
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    val out = Qualify.sql(s, "SELECT * EXCLUDE (v, grp) FROM q_t ORDER BY id")
    assert(out.columns.toSeq == Seq("id"))
    assert(out.count() == 5)
  }

  test("qualify and exclude compose in one statement") {
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    val out = Qualify.sql(s,
      """SELECT * EXCLUDE (v) FROM q_t
        |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC) = 1
        |ORDER BY grp""".stripMargin)
    assert(out.columns.toSeq == Seq("id", "grp"))
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((2, "a"), (5, "b")))
  }

  test("struct_pack rewrites to named_struct; untouched outside the call context") {
    // unit: field-name case preserved, nested calls fold inside-out,
    // `:=` inside strings stays put
    assert(Qualify.rewriteStructPack("SELECT struct_pack(a := 1, Bb := x + 1) AS s") ==
      "SELECT named_struct('a', 1, 'Bb', x + 1) AS s")
    assert(Qualify.rewriteStructPack(
      "SELECT struct_pack(outer_f := struct_pack(inner_f := v), n := 2) AS s") ==
      "SELECT named_struct('outer_f', named_struct('inner_f', v), 'n', 2) AS s")
    val lit = "SELECT 'struct_pack(a := 1)' AS w FROM t"
    assert(Qualify.rewriteStructPack(lit) == lit)
    val id = "SELECT struct_pack FROM t" // identifier, no call parens
    assert(Qualify.rewriteStructPack(id) == id)
    // end-to-end: the reference's macro-body shape (geometry_macro.sql:31-35)
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    val out = Qualify.sql(s,
      """SELECT sp.grp AS grp, sp.total AS total FROM (
        |  SELECT struct_pack(grp := grp, total := round(sum(v), 1)) AS sp
        |  FROM q_t GROUP BY grp
        |) ORDER BY grp""".stripMargin)
    assert(out.columns.toSeq == Seq("grp", "total"))
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 60.0), ("b", 20.0)))
  }

  test("using sample rewrites to TABLESAMPLE; join-USING and method form stay put") {
    assert(Qualify.rewriteUsingSample("SELECT * FROM t USING SAMPLE 10%") ==
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)")
    assert(Qualify.rewriteUsingSample("SELECT * FROM t USING SAMPLE 25 PERCENT WHERE a > 1") ==
      "SELECT * FROM t TABLESAMPLE (25 PERCENT) WHERE a > 1")
    assert(Qualify.rewriteUsingSample("SELECT * FROM t USING SAMPLE 100 ROWS") ==
      "SELECT * FROM t TABLESAMPLE (100 ROWS)")
    assert(Qualify.rewriteUsingSample("SELECT * FROM t USING SAMPLE 7") ==
      "SELECT * FROM t TABLESAMPLE (7 ROWS)")
    // join-USING is not a sample; the seeded method form has no Spark map
    val ju = "SELECT * FROM a JOIN b USING (k)"
    assert(Qualify.rewriteUsingSample(ju) == ju)
    val mf = "SELECT * FROM t USING SAMPLE 10% (bernoulli, 377)"
    assert(Qualify.rewriteUsingSample(mf) == mf)
    val lit = "SELECT 'USING SAMPLE 10%' AS w FROM t"
    assert(Qualify.rewriteUsingSample(lit) == lit)
    // end-to-end: row-count bounds (sampling is nondeterministic by design)
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    assert(Qualify.sql(s, "SELECT * FROM q_t USING SAMPLE 100%").count() == 5)
    assert(Qualify.sql(s, "SELECT * FROM q_t USING SAMPLE 3 ROWS").count() == 3)
    val n = Qualify.sql(s, "SELECT * FROM q_t USING SAMPLE 40%").count()
    assert(n >= 0 && n <= 5)
  }

  test("create macro: DDL parse, precedence-safe expansion, macro-calls-macro") {
    // DDL recognition
    val m = Qualify.parseCreateMacro(
      "CREATE OR REPLACE MACRO disc(p, d) AS p * (1 - d)").get
    assert(m.name == "disc" && m.params == Seq("p", "d") && m.body == "p * (1 - d)")
    assert(Qualify.parseCreateMacro("CREATE TEMP MACRO one() AS 1").isDefined)
    // table macros: the TABLE keyword strips, the body is the SELECT
    val tm = Qualify.parseCreateMacro("CREATE MACRO t() AS TABLE SELECT 1").get
    assert(tm.body == "SELECT 1")
    // not macros: other DDL, mentions in strings
    assert(Qualify.parseCreateMacro("CREATE TABLE t (a INT)").isEmpty)
    assert(Qualify.parseCreateMacro("SELECT 'CREATE MACRO x() AS 1'").isEmpty)
    // expansion wraps args and body so precedence survives: add(1,2)*3 = 9
    val macros = Map("add" -> Qualify.SqlMacro("add", Seq("a", "b"), "a + b"))
    assert(Qualify.expandMacros("SELECT add(1, 2) * 3 AS v", macros) ==
      "SELECT ((1) + (2)) * 3 AS v")
    // arity mismatch and quoted mentions stay put
    assert(Qualify.expandMacros("SELECT add(1) AS v", macros) == "SELECT add(1) AS v")
    assert(Qualify.expandMacros("SELECT 'add(1, 2)' AS v", macros) == "SELECT 'add(1, 2)' AS v")
    // end-to-end on a session, including macro-calls-macro
    val s = spark
    s.sql(ddl).createOrReplaceTempView("q_t")
    Qualify.sql(s, "CREATE OR REPLACE MACRO twice(x) AS x * 2")
    Qualify.sql(s, "CREATE OR REPLACE MACRO quad(x) AS twice(x) + twice(x)")
    val out = Qualify.sql(s, "SELECT grp, round(sum(quad(v)), 1) AS q FROM q_t GROUP BY grp ORDER BY grp")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 240.0), ("b", 80.0)))
    // table macro in FROM position: the inlined body is a subquery
    Qualify.sql(s,
      "CREATE OR REPLACE MACRO top_v(k) AS TABLE SELECT id, v FROM q_t ORDER BY v DESC LIMIT k")
    val tv = Qualify.sql(s, "SELECT id FROM top_v(2) ORDER BY id")
    assert(tv.collect().map(_.getInt(0)).toSeq == Seq(2, 3))
    // many call sites in one statement (regression: the expansion guard
    // bounds nesting depth, not site count) + nested call-site arguments
    val wide = (1 to 40).map(i => s"twice($i) AS c$i").mkString("SELECT ", ", ", "")
    val row = Qualify.sql(s, wide).collect().head
    assert((0 until 40).forall(i => row.getInt(i) == (i + 1) * 2))
    assert(Qualify.sql(s, "SELECT twice(twice(3)) AS v").collect().head.getInt(0) == 12)
  }

  test("injected parser: CREATE MACRO registers and expands via plain spark.sql") {
    val base = SparkTestBase.spark
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      assert(s2 ne base)
      s2.sql(ddl).createOrReplaceTempView("q_t3")
      assert(s2.sql("CREATE OR REPLACE MACRO halve(x) AS x / 2").collect()
        .head.getBoolean(0))
      val out = s2.sql("SELECT id, halve(v) AS h FROM q_t3 WHERE id = 2")
      assert(out.collect().head.getDouble(1) == 15.0)
    } finally {
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }

  test("injected parser: plain spark.sql accepts QUALIFY session-wide") {
    val base = SparkTestBase.spark
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      assert(s2 ne base)
      s2.sql(ddl).createOrReplaceTempView("q_t2")
      val top = s2.sql(
        """SELECT grp, id FROM q_t2
          |QUALIFY row_number() OVER (PARTITION BY grp ORDER BY v DESC) = 1
          |ORDER BY grp""".stripMargin)
      assert(top.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
        Seq(("a", 2), ("b", 5)))
      // statements that merely mention the word keep parsing (fallback)
      assert(s2.sql("SELECT 'QUALIFY' AS w").collect().head.getString(0) == "QUALIFY")
    } finally {
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }

  test("COPY TO: parse forms, csv/parquet/raw exports, Count return") {
    import graft.plans.{CopyToFile, Qualify}
    // parse: subquery + options
    val spec = Qualify.parseCopy(
      "COPY (SELECT 1 AS a) TO 'out.csv' (FORMAT CSV, HEADER false, DELIMITER '|');").get
    assert(spec.innerSql == "SELECT 1 AS a" && spec.target == "out.csv")
    assert(spec.options == Map("format" -> "CSV", "header" -> "false", "delimiter" -> "|"))
    // parse: bare table form
    assert(Qualify.parseCopy("COPY mytab TO 'x.parquet'").get.innerSql
      == "SELECT * FROM mytab")
    // not COPY statements
    assert(Qualify.parseCopy("SELECT 'COPY (x) TO y' AS s").isEmpty)
    assert(Qualify.parseCopy("COPY corrupted").isEmpty)

    val dir = Files.createTempDirectory("graft-copy").toString
    try {
      // csv with header (the host default)
      val ack = Qualify.sql(spark,
        s"COPY (SELECT id, v FROM (VALUES (1, 'x'), (2, 'y')) AS t(id, v) ORDER BY id) TO '$dir/t.csv'")
        .collect().head.getLong(0)
      assert(ack == 2L)
      val lines = Files.readAllLines(Paths.get(s"$dir/t.csv"))
      assert(lines.size == 3 && lines.get(0) == "id,v" && lines.get(1) == "1,x")
      // parquet single file, readable back
      Qualify.sql(spark, s"COPY (SELECT 42 AS n) TO '$dir/t.parquet'")
      assert(spark.read.parquet(s"$dir/t.parquet").collect().head.getInt(0) == 42)
      // raw: single string column → file body verbatim
      Qualify.sql(spark, s"""COPY (SELECT '{"type":"FeatureCollection"}' AS g) TO '$dir/t.geojson'""")
      assert(new String(Files.readAllBytes(Paths.get(s"$dir/t.geojson")),
        java.nio.charset.StandardCharsets.UTF_8) == "{\"type\":\"FeatureCollection\"}\n")
      // raw: single binary column → bytes verbatim (the read_blob roundtrip,
      // examples/monaco_end_to_end.sql:24-26)
      Qualify.sql(spark, s"COPY (SELECT CAST('pbf-bytes' AS BINARY) AS b) TO '$dir/t.osm.pbf'")
      assert(new String(Files.readAllBytes(Paths.get(s"$dir/t.osm.pbf")),
        java.nio.charset.StandardCharsets.UTF_8) == "pbf-bytes")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bracket list literals fold to array(); adjacency keeps subscripts") {
    import graft.plans.Qualify
    // literal positions: after keyword, after '(', after ','
    assert(Qualify.rewriteBracketLists("SELECT [1, 2, 3] AS xs")
      === "SELECT array(1, 2, 3) AS xs")
    assert(Qualify.rewriteBracketLists("SELECT f([1], [2])")
      === "SELECT f(array(1), array(2))")
    assert(Qualify.rewriteBracketLists("SELECT [[1], [2]]")
      === "SELECT array(array(1), array(2))")
    // subscripts: adjacent to a value ending
    assert(Qualify.rewriteBracketLists("SELECT xs[1], m['k'], f(x)[2], 'ab'[1]")
      === "SELECT xs[1], m['k'], f(x)[2], 'ab'[1]")
    // build-then-subscript, and strings/comments untouched
    assert(Qualify.rewriteBracketLists("SELECT [1, 2][1]")
      === "SELECT array(1, 2)[1]")
    assert(Qualify.rewriteBracketLists("SELECT '[1]' -- [2]")
      === "SELECT '[1]' -- [2]")
    // end-to-end: the host spelling evaluates
    val xs = graft.plans.Qualify.sql(spark, "SELECT [10, 20, 30] AS xs")
      .collect().head.getSeq[Int](0)
    assert(xs == Seq(10, 20, 30))
  }

  test("statement forms tolerate trailing comments") {
    import graft.plans.Qualify
    assert(Qualify.parseInstallLoad("LOAD spatial -- enable st_*")
      .contains(("LOAD", "spatial")))
    assert(Qualify.parseSetTiles("SET valhalla_tiles = './tiles' -- load graph")
      .contains("./tiles"))
    assert(Qualify.parseCopy("COPY (SELECT 1) TO 'x.csv' -- note").isDefined)
  }

  test("COPY csv Count is record-accurate for quoted multi-line values") {
    val dir = Files.createTempDirectory("graft-copy-ml").toString
    try {
      val n = graft.plans.Qualify.sql(spark,
        s"COPY (SELECT 'a\\nb' AS x UNION ALL SELECT 'c') TO '$dir/ml.csv'")
        .collect().head.getLong(0)
      assert(n == 2L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("read_blob / read_text table functions: host column shape over local files") {
    val dir = Files.createTempDirectory("graft-readblob")
    Files.write(dir.resolve("a.txt"), "hello graft".getBytes("UTF-8"))
    Files.write(dir.resolve("b.txt"), "second file".getBytes("UTF-8"))
    try {
      val rows = graft.plans.Qualify.sql(spark,
        s"SELECT filename, content, size FROM read_text('$dir/*.txt') ORDER BY filename")
        .collect()
      assert(rows.length == 2)
      assert(rows.head.getString(0).endsWith("a.txt"))
      assert(rows.head.getString(1) == "hello graft")
      assert(rows.head.getLong(2) == 11L)
      val blob = graft.plans.Qualify.sql(spark,
        s"SELECT content FROM read_blob('$dir/a.txt')").collect().head.getAs[Array[Byte]](0)
      assert(new String(blob, "UTF-8") == "hello graft")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("INSTALL/LOAD and SET valhalla_tiles via the injected parser") {
    val base = SparkTestBase.spark
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      assert(s2.sql("INSTALL spatial").collect().head.getBoolean(0))
      assert(s2.sql("LOAD spatial").collect().head.getBoolean(0))
      // LOAD registered the st_* surface on this session
      assert(s2.sql("SELECT st_astext(st_point(1.0, 2.0)) AS t")
        .collect().head.getString(0) == "POINT(1.0 2.0)")
      // SET runs the load callback eagerly
      val dir = java.nio.file.Files.createTempDirectory("graft-set-parser").toString
      graft.graph.GraphStore.save(
        Map("auto" -> graft.graph.GridFixture.dataFrames(s2, "auto")), dir)
      graft.routing.RoutingContext.unload()
      assert(s2.sql(s"SET valhalla_tiles = '$dir'").collect().head.getBoolean(0))
      assert(graft.routing.RoutingContext.isLoaded)
      assert(s2.sql("SELECT travel_time(43.7, 7.4, 43.72, 7.42, 'auto') AS t")
        .collect().head.getDouble(0) > 0)
    } finally {
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
      graft.routing.RoutingContext.unload()
      graft.queries.Routing.ensure(SparkTestBase.spark)
    }
  }

  test("COPY TO via the injected parser: plain spark.sql exports one file") {
    val base = SparkTestBase.spark
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val dir = Files.createTempDirectory("graft-copy-parser").toString
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      val n = s2.sql(
        s"COPY (SELECT x AS id FROM (VALUES (7), (8), (9)) AS t(x)) TO '$dir/ids.csv' (HEADER false)")
        .collect().head.getLong(0)
      assert(n == 3L)
      assert(Files.readAllLines(Paths.get(s"$dir/ids.csv")).size == 3)
    } finally {
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
