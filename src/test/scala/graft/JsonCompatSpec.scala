package graft

import graft.plans.Qualify
import org.scalatest.funsuite.AnyFunSuite

/** functions.JsonCompat — the host's JSON-construction vocabulary
  * (json_object / json_array / json) with structural raw-embedding, plus
  * the `::JSON` parse-time strip and `current_setting`.
  */
class JsonCompatSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    graft.functions.JsonCompat.register(s)
    graft.functions.DuckCompat.register(s)
    s
  }

  private def one(sql: String): String =
    spark.sql(sql).collect().head.getString(0)

  test("json_object: minified key/value rendering by type") {
    assert(one("SELECT json_object('a', 1, 'b', 'x', 'c', true, 'd', CAST(NULL AS INT)) AS j")
      === """{"a":1,"b":"x","c":true,"d":null}""")
    assert(one("SELECT json_object('pi', round(3.14159, 2)) AS j")
      === """{"pi":3.14}""")
    assert(one("SELECT json_object('d', DATE '2026-08-13') AS j")
      === """{"d":"2026-08-13"}""")
  }

  test("json_object: string values escape, JSON-producing values embed raw") {
    assert(one("""SELECT json_object('s', 'say "hi"\nplease') AS j""")
      === "{\"s\":\"say \\\"hi\\\"\\nplease\"}")
    // a nested json_object embeds raw, a plain string of the same text escapes
    assert(one("SELECT json_object('inner', json_object('k', 1)) AS j")
      === """{"inner":{"k":1}}""")
    assert(one("""SELECT json_object('inner', '{"k":1}') AS j""")
      === """{"inner":"{\"k\":1}"}""")
    // json(...) tags arbitrary text as raw JSON
    assert(one("""SELECT json_object('inner', json('{"k":1}')) AS j""")
      === """{"inner":{"k":1}}""")
  }

  test("json_array: values render by type, nested objects embed raw") {
    assert(one("SELECT json_array(1, 'two', false, json_object('three', 3)) AS j")
      === """[1,"two",false,{"three":3}]""")
    assert(one("SELECT json_array() AS j") === "[]")
  }

  test("json_object runs per-row over a table inside codegen") {
    import spark.implicits._
    val rows = Seq((1, "a"), (2, "b\"c")).toDF("id", "s")
    rows.createOrReplaceTempView("jc_rows")
    val out = spark.sql(
      "SELECT json_object('id', id, 's', s) AS j FROM jc_rows ORDER BY id")
      .collect().map(_.getString(0))
    assert(out === Array("""{"id":1,"s":"a"}""", "{\"id\":2,\"s\":\"b\\\"c\"}"))
  }

  test("::JSON cast folds to the json() marker at parse time " +
    "(examples/monaco_pure_sql.sql:108)") {
    assert(Qualify.rewriteJsonCast("SELECT x::JSON FROM t") === "SELECT json(x) FROM t")
    assert(Qualify.rewriteJsonCast("SELECT f(y) :: JSON AS j") === "SELECT json(f(y)) AS j")
    // not a cast context: untouched
    assert(Qualify.rewriteJsonCast("SELECT json FROM t") === "SELECT json FROM t")
    assert(Qualify.rewriteJsonCast("SELECT ':: JSON' AS s") === "SELECT ':: JSON' AS s")
    // through the dialect pipeline, the value lands in json_object raw
    val j = Qualify.sql(spark,
      """SELECT json_object('g', json('{"a":[1,2]}')::JSON) AS j""")
      .collect().head.getString(0)
    assert(j === """{"g":{"a":[1,2]}}""")
  }

  test("current_setting reads the session conf under host or graft names " +
    "(examples/s3_tiles_example.sql:67)") {
    spark.conf.set("spark.graft.routing.tiles", "/tmp/tiles-under-test")
    try {
      assert(one("SELECT current_setting('valhalla_tiles') AS v")
        === "/tmp/tiles-under-test")
      assert(one("SELECT current_setting('valhalla_config') AS v")
        === "/tmp/tiles-under-test")
      // verbatim `SET x = y` statements store under the raw key; that wins
      spark.sql("SET valhalla_config = s3://bucket/valhalla.json")
      assert(one("SELECT current_setting('valhalla_config') AS v")
        === "s3://bucket/valhalla.json")
      spark.conf.unset("valhalla_config")
      val err = intercept[Exception](one("SELECT current_setting('nope_setting') AS v"))
      assert(err.getMessage.contains("nope_setting"))
    } finally {
      spark.conf.unset("spark.graft.routing.tiles")
    }
  }

  test("::JSON on a plain string embeds raw (cast folds to the json() marker)") {
    // the host's semantics: any VARCHAR cast to JSON embeds raw, not
    // re-escaped — including plain literals and columns
    val j = Qualify.sql(spark,
      """SELECT json_object('g', '{"k":[1,2]}'::JSON) AS j""").collect().head.getString(0)
    assert(j === """{"g":{"k":[1,2]}}""")
    import spark.implicits._
    Seq("""{"v":7}""").toDF("c").createOrReplaceTempView("jc_cast")
    val fromCol = Qualify.sql(spark,
      "SELECT json_object('g', c::JSON) AS j FROM jc_cast").collect().head.getString(0)
    assert(fromCol === """{"g":{"v":7}}""")
    // rewrite shape: operand chains fold whole
    assert(Qualify.rewriteJsonCast("SELECT r.geometry::JSON AS g")
      === "SELECT json(r.geometry) AS g")
    assert(Qualify.rewriteJsonCast("SELECT f(x, y)::JSON AS g")
      === "SELECT json(f(x, y)) AS g")
  }

  test("untyped NULL value renders as JSON null") {
    assert(one("SELECT json_object('a', NULL) AS j") === """{"a":null}""")
    assert(one("SELECT json_array(NULL, 1) AS j") === "[null,1]")
  }

  test("foldable to_json value still embeds raw (pinned at build, survives folding)") {
    assert(one("SELECT json_object('a', to_json(named_struct('b', 1))) AS j")
      === """{"a":{"b":1}}""")
  }

  test("text-similarity family matches host-pinned goldens (byte-level)") {
    import graft.functions.TextSim
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(TextSim.jaccard(u("duck"), u("luck")) === 0.6)
    assert(TextSim.jaccard(u("AB"), u("ab")) === 0.0)
    assert(TextSim.jaccard(u("abcd"), u("cdef")) === 1.0 / 3)
    // byte-level, like the host: 'héllo' is 5 distinct BYTES
    assert(TextSim.jaccard(u("héllo"), u("hello")) === 0.5)
    assert(TextSim.hamming(u("duck"), u("luck")) === 1L)
    intercept[IllegalArgumentException](TextSim.hamming(u("a"), u("ab")))
    intercept[IllegalArgumentException](TextSim.jaccard(u(""), u("abc")))
    assert(math.abs(TextSim.jaro(u("MARTHA"), u("MARHTA")) - 0.944444) < 1e-6)
    assert(math.abs(TextSim.jaroWinkler(u("MARTHA"), u("MARHTA")) - 0.961111) < 1e-6)
    assert(math.abs(TextSim.jaroWinkler(u("DWAYNE"), u("DUANE")) - 0.84) < 1e-6)
    // prefix caps at 4; boost only above the 0.7 jaro threshold
    assert(math.abs(TextSim.jaroWinkler(u("abcdefgh"), u("abcdefxy")) - 0.9) < 1e-6)
    assert(math.abs(TextSim.jaroWinkler(u("abZZZZZZZZ"), u("abQQQQQQQQ")) - 0.466667) < 1e-6)
    // FULL Damerau-Levenshtein, not OSA: 'ca'→'abc' is 2
    assert(TextSim.damerauLevenshtein(u("ca"), u("abc")) === 2L)
    assert(TextSim.damerauLevenshtein(u("ab"), u("ba")) === 1L)
    assert(TextSim.damerauLevenshtein(u("kitten"), u("sitting")) === 3L)
    assert(TextSim.damerauLevenshtein(u(""), u("abc")) === 3L)
    // SQL surface, inside codegen
    assert(one("SELECT CAST(round(jaro_winkler_similarity('MARTHA', 'MARHTA'), 6) AS STRING) AS j")
      === "0.961111")
  }

  test("compound values are rejected with a to_json pointer") {
    val err = intercept[Exception](
      spark.sql("SELECT json_object('a', array(1, 2)) AS j").collect())
    assert(err.getMessage.contains("to_json"))
  }

  test("double rendering is byte-identical to the host's yyjson") {
    import graft.functions.JsonCompat.formatDouble
    // every expected string below probed against the host engine:
    // SELECT json_object('x', <v>::DOUBLE)::VARCHAR — ECMAScript-style
    // shortest round-trip, fixed notation for 1e-6 <= |x| < 1e21 with a
    // ".0" suffix on integral values, exponential elsewhere with no '+'
    val pinned = Seq(
      1.5 -> "1.5",
      1e7 -> "10000000.0",
      12345678.25 -> "12345678.25",
      1e15 -> "1000000000000000.0",
      1e16 -> "10000000000000000.0",
      1e17 -> "100000000000000000.0",
      123456789012345678.0 -> "123456789012345680.0",
      1e20 -> "100000000000000000000.0",
      1e21 -> "1e21",
      1e-6 -> "0.000001",
      1e-7 -> "1e-7",
      0.1 -> "0.1",
      2.5e-8 -> "2.5e-8",
      -2.5e-8 -> "-2.5e-8",
      1.7976931348623157e308 -> "1.7976931348623157e308",
      java.lang.Double.MIN_VALUE -> "5e-324",
      0.0 -> "0.0",
      -0.0 -> "-0.0",
      3.14159 -> "3.14159",
      100.0 -> "100.0",
      1234567890123456.5 -> "1234567890123456.5",
      // 2^53 boundary: pin REPRESENTABLE doubles only — the literal
      // 9007199254740993.0 (2^53+1, exactly half-way) parses to ...992 on
      // the JVM/Python but ...994 in DuckDB's SQL parser; that is a parser
      // divergence upstream of the formatter under test
      9007199254740992.0 -> "9007199254740992.0",
      9007199254740994.0 -> "9007199254740994.0",
      2.0 -> "2.0",
      Double.NaN -> "NaN",
      Double.PositiveInfinity -> "Infinity",
      Double.NegativeInfinity -> "-Infinity")
    for ((v, want) <- pinned)
      assert(formatDouble(v) === want, s"for input $v")
    // round-trip property on a deterministic sweep
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val v = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!v.isNaN && !v.isInfinite)
        assert(java.lang.Double.parseDouble(formatDouble(v)) === v, s"round-trip $v")
    }
  }

  test("json_object renders >=1e7 doubles host-identically (SQL surface)") {
    assert(one("SELECT json_object('a', CAST(12345000000 AS DOUBLE), " +
      "'b', CAST(7.3e26 AS DOUBLE), 'c', CAST(0.25e-8 AS DOUBLE)) AS j")
      === """{"a":12345000000.0,"b":7.3e26,"c":2.5e-9}""")
  }
}
