package graft

import graft.ops.{Dedup, Sampling, Similarity, Sketch, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning invariance — the 1000-executor determinism claim made
  * executable: every operator whose Scaladoc promises retry- or
  * engine-reproducibility must return IDENTICAL results no matter how the
  * input arrives partitioned (one file, hash-scattered, skew-clustered by
  * a data column). On a real cluster the ambient partitioning changes with
  * executor count, AQE decisions, and upstream shuffles; an operator whose
  * answer depends on it is nondeterministic at scale even though every
  * local[4] run looks stable.
  */
class PartitionInvarianceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$d/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$d/embeddings.parquet")

  /** The three arrival shapes: as-read (single file = one partition),
    * round-robin scattered, and clustered by a data column (skew-ish).
    */
  private def shapes(df: DataFrame, clusterCol: String): Seq[DataFrame] =
    Seq(df, df.repartition(7), df.repartition(3, col(clusterCol)))

  private def pin(name: String, results: Seq[Seq[String]]): Unit = {
    assert(results.head.nonEmpty, s"$name: empty result can't pin invariance")
    results.tail.zipWithIndex.foreach { case (r, i) =>
      assert(r == results.head, s"$name: partitioning shape ${i + 1} diverged")
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("stratified + weighted sampling select the same rows under any partitioning") {
    pin("stratifiedSample", shapes(docs, "lang").map { v =>
      rows(Sampling.stratifiedSample(v, "doc_id", "lang",
        Map("en" -> 500), defaultPermill = 250).orderBy($"doc_id"))
    })
    pin("weightedSample", shapes(docs, "source").map { v =>
      rows(Sampling.weightedSample(v.withColumn("w", length($"text") % 10 + 1),
        "doc_id", "w", cap = 8).orderBy($"doc_id"))
    })
  }

  test("exact-k stratum sample and histogram quantiles are partitioning-invariant") {
    // the p84 shape: bounded TopKMinPairs per stratum over a salted hash —
    // "reproducible forever" must mean under ANY arrival shape
    pin("exactKSample", shapes(docs, "lang").map { v =>
      val hashed = v.select($"lang", $"doc_id",
        conv(substring(md5(concat($"doc_id".cast("string"), lit("|rsv"))),
          1, 15), 16, 10).cast("long").as("h"))
      rows(hashed.groupBy($"lang")
        .agg(graft.functions.TopKMinPairs(spark, $"h", $"doc_id", 25).as("tk"))
        .select($"lang", posexplode($"tk"))
        .select($"lang", col("pos"), $"col.id")
        .orderBy($"lang", col("pos")))
    })
    pin("exactQuantiles", shapes(docs, "lang").map { v =>
      rows(graft.ops.Stats.exactQuantiles(
          v.select($"lang", length($"text").as("n")), "lang", "n",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .orderBy($"lang"))
    })
  }

  test("minhash signatures and band buckets are partitioning-invariant") {
    pin("minhashSignatures", shapes(docs, "lang").map { v =>
      rows(Dedup.minhashSignatures(v.select($"doc_id", $"text"),
          "doc_id", "text", q = 5, k = 12)
        .selectExpr("doc", "sig").orderBy($"doc"))
    })
    pin("bandBuckets", shapes(docs, "source").map { v =>
      rows(Dedup.bandBuckets(v, "doc_id", "text")
        .orderBy($"doc", $"band"))
    })
  }

  test("KMV sketch keeps the same k-minima (and estimate) under any partitioning") {
    pin("kmvDistinct", shapes(docs, "source").map { v =>
      val toks = v.select($"source",
          explode(split(lower($"text"), "\\s+")).as("token"))
        .filter(length($"token") > 0)
      rows(Sketch.kmvDistinct(toks, "source", "token", k = 64).orderBy($"source"))
    })
  }

  test("IVF training yields identical corpus ASSIGNMENTS from any partitioning") {
    // raw centroid doubles may drift in the last ulp (double `avg` sums in
    // partition order — unavoidable without a fixed reduction tree); the
    // operator's declared contract is the ROUNDED-argmin assignment, which
    // must be exactly stable. Train from each arrival shape, assign the
    // corpus with each trained set, compare assignments.
    val assignments = shapes(emb, "label").map { v =>
      val cents = Similarity.ivfCentroids(v, "vec_id", "embedding", k = 8, iters = 2)
      rows(emb.select($"vec_id",
          Similarity.nearestCell($"embedding", cents).as("cell"))
        .orderBy($"vec_id"))
    }
    assert(assignments.head.nonEmpty)
    assignments.tail.foreach(a => assert(a == assignments.head,
      "rounded-argmin assignment must not depend on row placement"))
  }

  test("bounded-aggregate ANN top-k is partitioning-invariant (brute force + IVF)") {
    // the TopKMinPairs conversion's core claim: map-side partial
    // aggregation reduces each task's slice to <= k pairs, and the k
    // smallest of the union of per-slice k-smallest is the k smallest of
    // the union — so rank lists must be identical from ANY row placement
    pin("bruteForceTopK", shapes(emb, "label").map { v =>
      rows(Similarity.bruteForceTopK(v, "vec_id", "embedding",
          col("vec_id") < 10, k = 5, dim = Some(64))
        .orderBy($"qid", $"rank"))
    })
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
    pin("ivfTopK", shapes(emb, "label").map { v =>
      rows(Similarity.ivfTopK(v, "vec_id", "embedding", cents, nprobe = 2,
          col("vec_id") < 10, k = 3, dim = Some(64))
        .orderBy($"qid", $"rank"))
    })
  }

  test("BM25 ranking is partitioning-invariant (integer micro-unit contract)") {
    pin("bm25TopK", shapes(docs, "lang").map { v =>
      rows(TextOps.bm25TopK(v, "doc_id", "text",
          Seq(0 -> Seq("spark", "join"), 1 -> Seq("the", "customer")), topK = 10)
        .orderBy($"qid", $"rank"))
    })
  }

  test("substring spans (text and hashed keys) are partitioning-invariant") {
    for (hashed <- Seq(false, true)) {
      pin(s"substringSpans(hashed=$hashed)", shapes(docs, "source").map { v =>
        rows(Dedup.substringSpans(v.select($"doc_id", $"text"),
            "doc_id", "text", w = 40, hashedKeys = hashed)
          .orderBy($"doc_id"))
      })
    }
  }

  test("boilerplate discovery + strip are partitioning-invariant (both key paths)") {
    def pages(v: DataFrame) = v.select($"doc_id", $"source",
      concat_ws("\n", concat(lit("NAV "), $"source"),
        $"text",
        when($"doc_id" % 2 === 0, concat(lit("PROMO "), $"source"))).as("page"))
    for (hashed <- Seq(false, true)) {
      pin(s"stripBoilerplate(hashed=$hashed)", shapes(docs, "source").map { v =>
        val p = pages(v)
        val bp = graft.ops.Hygiene.boilerplateTable(
          p, "source", "doc_id", "page", hashLines = hashed)
        rows(graft.ops.Hygiene.stripBoilerplate(
            p, bp, "source", "doc_id", "page", hashLines = hashed)
          .orderBy($"doc"))
      })
    }
  }

  test("NB classifier weights and scores are partitioning-invariant (micro-unit contract)") {
    pin("nbScore", shapes(docs, "lang").map { v =>
      val labeled = v.where($"doc_id" % 2 === 0).select(
        when($"lang" === "en", lit("pos")).otherwise(lit("neg")).as("cls"),
        $"text")
      val w = graft.ops.Classify.nbWeights(labeled, "cls", "text", "pos")
      val c = graft.ops.Classify.nbConsts(labeled, "cls", "text", "pos")
      rows(graft.ops.Classify.nbScore(v, "doc_id", "text", w, c, "pos", "neg")
        .orderBy($"id"))
    })
  }

  test("winsorized stats are partitioning-invariant (exact quantile + half-up mean)") {
    pin("winsorized", shapes(docs, "lang").map { v =>
      val base = v.select($"lang", $"n_chars".cast("long").as("v"))
      val q = graft.ops.Stats.exactQuantiles(base, "lang", "v",
          Seq("p05" -> 0.05, "p95" -> 0.95))
        .select($"lang", $"p05", $"p95")
      rows(base.join(broadcast(q), "lang").groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          sum(greatest($"p05", least($"p95", $"v"))).as("cs"))
        .select($"lang", expr("(2 * cs + n) DIV (2 * n)").as("m"))
        .orderBy($"lang"))
    })
  }
}
