package graft

import org.scalatest.funsuite.AnyFunSuite

/** Codegen honesty gate (VERDICT r4 "what's wrong" #1): Spark silently
  * falls back to interpreted evaluation when generated code fails to
  * compile (e.g. a method outgrows Janino's 64 KB limit) — correctness is
  * unaffected, but the affected operator runs interpreted at any scale, a
  * silent perf cliff the result oracle cannot see. With
  * `spark.sql.codegen.fallback=false` a compile failure THROWS instead, so
  * this sweep runs every SparkEntry query at sf0.001 and turns any Janino
  * stack the sbt log used to swallow into a red test naming the query.
  *
  * (The separate `spark.sql.codegen.hugeMethodLimit` bypass — methods that
  * compile but exceed the 64 KB JIT ceiling — RETURNS the interpreted
  * child unconditionally rather than throwing, so no conf can turn it into
  * an error; it logs "Found too long generated codes", which the full-
  * suite log stays grepped clean of.)
  */
class CodegenSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("every driver query executes with codegen fallback disabled") {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val r =
          try { fn(spark, sf).count(); None }
          catch { case e: Throwable =>
            val cause = Iterator.iterate(e.asInstanceOf[Throwable])(_.getCause)
              .takeWhile(_ != null).toSeq.last
            Some(s"$name: ${cause.getClass.getSimpleName}: " +
              s"${Option(cause.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}")
          }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        r
      }
      assert(failures.isEmpty,
        s"${failures.size} query(ies) hit a codegen compile failure:\n" +
          failures.mkString("\n"))
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    }
  }
}
