package graft

import graft.plans.Qualify
import org.apache.spark.sql.SparkSession

/** Minimal SQLLogicTest interpreter — enough grammar to run the reference's
  * own `.test` files VERBATIM (test/sql/travel_time.test,
  * test/sql/monaco_routing.test): `# comment`, `require <ext>`,
  * `statement ok`, `statement error` (expected-message block ignored — the
  * assertion is that execution throws), and `query <types> [rowsort]` with
  * a `----`-delimited expected block. Statements run through
  * [[Qualify.sql]], so the host dialect (struct_pack, CREATE MACRO,
  * bracket lists, ...) applies exactly as it would for a user.
  *
  * Value rendering follows SLT: NULL, true/false booleans, tab-joined
  * columns. `skip` marks known-divergence checks (documented at the call
  * site) — they are counted and reported but not executed.
  */
object SltRunner {

  final case class Result(checks: Int, skipped: Seq[String], failures: Seq[String])

  def run(spark: SparkSession, text: String,
          substitute: String => String = identity,
          skip: (String, Seq[String]) => Boolean = (_, _) => false): Result = {
    val lines = text.linesIterator.map(_.stripLineEnd).toVector
    var i = 0
    var checks = 0
    val failures = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]

    def collectUntil(stop: String => Boolean): Seq[String] = {
      val out = Seq.newBuilder[String]
      while (i < lines.length && !stop(lines(i))) { out += lines(i); i += 1 }
      out.result()
    }

    def render(v: Any): String = v match {
      case null => "NULL"
      case b: Boolean => if (b) "true" else "false"
      case other => String.valueOf(other)
    }

    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#")) i += 1
      else if (line.startsWith("require ")) {
        Qualify.applyInstallLoad(spark, "LOAD", line.stripPrefix("require ").trim)
        i += 1
      } else if (line == "statement ok" || line == "statement error") {
        val expectError = line == "statement error"
        i += 1
        val sql = substitute(
          collectUntil(l => l.trim.isEmpty || l.trim == "----").mkString("\n"))
        if (i < lines.length && lines(i).trim == "----") {
          i += 1
          collectUntil(_.trim.isEmpty) // expected-error text: presence-only
        }
        checks += 1
        val threw =
          try { Qualify.sql(spark, sql).collect(); false }
          catch { case _: Exception => true }
        if (threw != expectError)
          failures += s"statement ${if (expectError) "error" else "ok"} violated:\n$sql"
      } else if (line.startsWith("query")) {
        val rowsort = line.contains("rowsort")
        i += 1
        val sql = substitute(collectUntil(_.trim == "----").mkString("\n"))
        i += 1 // the ---- line
        val expected = collectUntil(_.trim.isEmpty)
        if (skip(sql, expected)) {
          skipped += sql.linesIterator.next().take(80)
        } else {
          checks += 1
          try {
            var got = Qualify.sql(spark, sql).collect()
              .map(r => (0 until r.length).map(j => render(r.get(j))).mkString("\t"))
              .toSeq
            var want = expected
            if (rowsort) { got = got.sorted; want = want.sorted }
            if (got != want)
              failures += s"query mismatch:\n$sql\nexpected: $want\ngot:      $got"
          } catch {
            case e: Exception =>
              failures += s"query threw:\n$sql\n→ ${e.getMessage.take(300)}"
          }
        }
      } else {
        failures += s"unrecognized SLT directive: $line"
        i += 1
      }
    }
    Result(checks, skipped.result(), failures.result())
  }
}
