package graft

import graft.ops.{Dedup, Sampling, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-operator goldens on tiny inline datasets. */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("text stats goldens") {
    val df = Seq((1, "The quick brown fox."), (2, ""), (3, "a  b\t c")).toDF("id", "text")
    val out = df.select($"id",
      TextOps.wordCount($"text").as("w"),
      TextOps.punctCount($"text").as("p"),
      TextOps.bpeishTokenCount($"text").as("b"))
      .orderBy($"id").collect()
    assert(out(0).getInt(1) == 4)  // The quick brown fox.
    assert(out(0).getInt(2) == 1)  // period
    assert(out(0).getInt(3) == 5)  // 4 words + period
    assert(out(1).getInt(1) == 0)
    assert(out(2).getInt(1) == 3)
  }

  test("word shingles: n-grams, dedup, short-doc empties, case folding") {
    val df = Seq(
      (1, "A b c d"),   // 4 words, n=3 -> 2 shingles
      (2, "x y"),       // too short for n=3 -> empty
      (3, "a a a a"))   // all shingles identical -> 1 distinct
      .toDF("id", "text")
    val out = df.select($"id", TextOps.wordShingles($"text", 3).as("sh"))
      .orderBy($"id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1).isEmpty)
    assert(out(2).getSeq[String](1) == Seq("a a a"))
  }

  test("repetition stats: hand-computed fractions, short docs, degenerate loop doc") {
    val df = Seq(
      // 6 words, 4 distinct; 2-grams: "a b","b a","a b","b c","c d" -> top "a b" 2/5;
      // 3-grams: "a b a","b a b","a b c","b c d" -> all unique -> dup3 0/4
      (1L, "a b a b c d"),
      (2L, "x y"),                 // 1 2-gram, no 3-grams -> n3 row absent
      (3L, "go go go go go go"))   // degenerate loop: everything repeats
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).toSeq == Seq(1L, 6L, 0.6667, 0.4, 0.0))
    assert(out(1).toSeq == Seq(2L, 2L, 1.0, 1.0, 0.0))
    assert(out(2).toSeq == Seq(3L, 6L, 0.1667, 1.0, 1.0))
  }

  test("z-order: expression matches bit-interleave reference; clusterByZ bounds rectangles") {
    import graft.ops.Layout
    def refZ(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val r = new scala.util.Random(71)
    val rows = (0 until 3000).map(_ => (r.nextInt(1024).toLong, r.nextInt(1024).toLong))
    val df = rows.toDF("a", "b")
    val got = df.select($"a", $"b", Layout.zOrder2($"a", $"b", 10).as("z")).collect()
    got.foreach(row =>
      assert(row.getLong(2) == refZ(row.getLong(0), row.getLong(1), 10)))

    // clustered layout: every output partition covers a bounded rectangle
    val clustered = Layout.clusterByZ(df, $"a", $"b", bits = 10, numFiles = 64)
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
    val parts = clustered.groupBy($"pid")
      .agg(count(lit(1)).as("n"),
        (max($"a") - min($"a") + 1).as("da"), (max($"b") - min($"b") + 1).as("db"))
      .collect()
    assert(parts.length > 1)
    // locality: the MEAN per-partition bounding box must be far below the
    // full domain (a single z-interval crossing a quadrant midline can
    // legitimately span half the domain, so the bound is on the average)
    val areas = parts.map(p => p.getLong(2) * p.getLong(3))
    val meanArea = areas.sum.toDouble / areas.length
    assert(meanArea < 1024.0 * 1024.0 / 8,
      f"mean partition bbox $meanArea%.0f shows no z-locality")
  }

  test("language ID picks the dominant stopword language") {
    val df = Seq(
      (1, "the cat and the dog of it"),
      (2, "der Hund ist nicht ein Tier und"),
      (3, "el perro es un animal y no por"),
      (4, "xyzzy plugh")).toDF("id", "text")
    val out = df.select($"id", TextOps.langId($"text").as("l")).orderBy($"id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("en", "de", "es", "und"))
  }

  test("sampling: deterministic, stratified rates honored, split partitions disjointly") {
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val s1 = graft.ops.Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 500), defaultPermill = 100, salt = "t")
    val s2 = graft.ops.Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 500), defaultPermill = 100, salt = "t")
    // reproducible: same salt -> identical subset
    assert(s1.select($"doc_id").collect().toSeq == s2.select($"doc_id").collect().toSeq)
    val byLang = s1.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 docs per stratum at 50% / 10% nominal rates (binomial tolerance)
    assert(byLang("en") > 400 && byLang("en") < 600, s"en=${byLang("en")}")
    assert(byLang("zh") > 50 && byLang("zh") < 160, s"zh=${byLang("zh")}")
    // bucket is always under the stratum rate
    assert(s1.filter($"lang" === "en" && $"bucket" >= 500).count() == 0)
    assert(s1.filter($"lang" === "zh" && $"bucket" >= 100).count() == 0)

    val split = graft.ops.Sampling.assignSplit(docs, "doc_id", salt = "u")
    val counts = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("val") > 120 && counts("test") > 120,
      counts.toString)
    // different salts decorrelate: the en-sample's split matches the global mix
    val sampledSplit = graft.ops.Sampling.assignSplit(s1, "doc_id", salt = "u")
    val trainShare = sampledSplit.filter($"split" === "train").count().toDouble /
      sampledSplit.count()
    assert(trainShare > 0.72 && trainShare < 0.88, s"trainShare=$trainShare")
  }

  test("exact duplicates share digest; minhash LSH finds them as candidates") {
    val text = "spark streaming shuffle partition broadcast join aggregate window"
    val docs = Seq((1L, text), (2L, text), (3L, "completely different content here entirely"))
      .toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", q = 4, k = 8, rowsPerBand = 2)
      .collect()
    assert(cands.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    // identical docs match on every band
    val full = cands.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(full.getLong(2) == 4) // k/rowsPerBand bands
    assert(!cands.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("collapsed near-dup clustering matches pair-level CC, incl. unpaired dup group") {
    // three exact-dup groups: {1,2,9} (text A), {3,4} (text B ~ text A so
    // the groups pair up), {7,8} (text C, similar to NOTHING — its rep
    // enters no cross-text pair, so the group must still cluster via its
    // intra pairs), plus a unique unpaired doc 5 that must NOT appear
    val a = "spark shuffle partition broadcast join aggregate window state"
    val b = "spark shuffle partition broadcast join aggregate window stats"
    val cTx = "zzzz qqqq mmmm wwww kkkk xxxx vvvv bbbb nnnn hhhh jjjj gggg"
    val docs = Seq(1L -> a, 2L -> a, 9L -> a, 3L -> b, 4L -> b,
      7L -> cTx, 8L -> cTx, 5L -> "totally unrelated short text nothing")
      .toDF("doc_id", "text")
    val viaDocs = Dedup.nearDupClustersFromDocs(docs, "doc_id", "text",
      q = 4, k = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaPairs = Dedup.nearDupClusters(
      Dedup.minhashCandidates(docs, "doc_id", "text", q = 4, k = 8, rowsPerBand = 2)
        .select(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDocs == viaPairs)
    assert(viaDocs.contains((7L, 7L, 2L)) && viaDocs.contains((8L, 7L, 2L)),
      "unpaired dup group clusters on its own")
    assert(!viaDocs.exists(_._1 == 5L), "unique unpaired doc is absent")
    assert(viaDocs.filter(t => Set(1L, 2L, 3L, 4L, 9L)(t._1)).forall(_._2 == 1L),
      "cross-paired groups merge under the min raw id")
  }

  test("ngram jaccard: identical docs = 1.0, disjoint absent") {
    val docs = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "zzzzyyyyxx"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", q = 3, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L && pairs(0).getDouble(2) == 1.0)
  }

  test("cosine: identical=1, orthogonal=0; brute-force top-k ranks by similarity") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.001f), 0)).toDF("vec_id", "embedding", "label")
    val sim = emb.filter($"vec_id" === 0).crossJoin(
        emb.filter($"vec_id" === 2).select($"embedding".as("e2")))
      .select(Similarity.cosine($"embedding", $"e2").as("c")).collect()
    assert(math.abs(sim(0).getDouble(0)) < 1e-12)

    val topk = Similarity.bruteForceTopK(emb, "vec_id", "embedding", $"vec_id" === 0, k = 3)
      .orderBy($"rank").collect()
    assert(topk.map(_.getAs[Long]("nid")).toSeq == Seq(3L, 1L, 2L)) // nearest first
    assert(topk(0).getAs[Double]("sim") > 0.999)
  }

  test("native cosine_sim expression: matches HOF kernel, codegen + interpreted, SQL surface") {
    graft.functions.CosineSim.register(spark)
    // SQL over literal arrays exercises the interpreted eval (constant fold)
    val lit = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(lit - 1.0) < 1e-12)
    // DataFrame path (codegen) agrees with the higher-order-function kernel
    val emb = Seq(
      (0L, Array(1.0f, 0.2f, -0.5f, 3.0f)),
      (1L, Array(-0.4f, 1.0f, 0.0f, 2.2f)),
      (2L, Array(0.3f, -2.0f, 1.1f, 0.7f))).toDF("vec_id", "embedding")
    val both = emb.crossJoin(emb.select($"embedding".as("e2"), $"vec_id".as("v2")))
      .filter($"vec_id" < $"v2")
      .select(
        graft.functions.CosineSim(spark, $"embedding", $"e2").as("native"),
        Similarity.cosine($"embedding", $"e2").as("hof"))
      .collect()
    both.foreach { r =>
      val n = r.getDouble(0); val h = r.getDouble(1)
      assert(n == h, s"native $n != hof $h") // bit-identical
    }
    // zero-norm: native yields NaN (raw double division) where the ANSI-mode
    // Divide in the HOF formulation would throw — the forgiving semantics a
    // dedup pipeline wants
    val nan = Seq((0L, Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("id", "za", "b")
      .select(graft.functions.CosineSim(spark, $"za", $"b").as("c")).collect()
    assert(nan.head.getDouble(0).isNaN)
    // type check rejects non-array args at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(1, 2)").collect()
    }
  }

  test("embedding near-dup pairs: bucketed candidates, threshold verify") {
    val emb = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.02f, 0.0f, 0.0f)),  // near-dup of 0
      (2L, Array(-1.0f, 0.0f, 0.3f, 0.0f)),  // far from both
      (3L, Array(0.99f, 0.015f, 0.01f, 0.0f))) // near-dup of 0 and 1
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
      dim = 4, nBits = 4, threshold = 0.95).orderBy($"a", $"b").collect()
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)), s"expected (0,1) in $got")
    assert(!got.exists { case (a, b) => a == 2L || b == 2L }, s"2 must not pair: $got")
    assert(pairs.forall(_.getDouble(2) >= 0.95))
  }

  test("IVF: Lloyd iterations pull centroids to clusters; nprobe=1 search stays in-cluster") {
    // two tight clusters on different axes; ids alternate cluster membership
    val vecs = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0f, 0f) else Array(0f, 10f, 0f)
      (i, base.zipWithIndex.map { case (v, d) => v + (i % 5) * 0.01f * (d + 1) }, 0)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    // init = first two vectors (one per cluster), so one Lloyd step converges
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", k = 2, iters = 2)
    assert(cents.length == 2)
    assert(math.abs(cents(0)(0) - 10.0) < 0.2 && math.abs(cents(0)(1)) < 0.2)
    assert(math.abs(cents(1)(1) - 10.0) < 0.2 && math.abs(cents(1)(0)) < 0.2)
    val topk = Similarity.ivfTopK(df, "vec_id", "embedding", cents, nprobe = 1,
      $"vec_id" === 0, k = 3).collect()
    assert(topk.length == 3)
    // a cluster-A query with nprobe=1 only ever sees cluster-A neighbors
    assert(topk.forall(_.getAs[Long]("nid") % 2 == 0))
    // nprobe=2 searches both cells and still ranks in-cluster first
    val wide = Similarity.ivfTopK(df, "vec_id", "embedding", cents, nprobe = 2,
      $"vec_id" === 0, k = 12).collect()
    assert(wide.length == 12)
    assert(wide.sortBy(_.getAs[Int]("rank")).take(9).forall(_.getAs[Long]("nid") % 2 == 0))
  }

  test("native nearest_cells matches the HOF argmin formulation bit-for-bit") {
    // the native NearestCells expression must reproduce the retired
    // zip_with+aggregate+array_sort pipeline exactly: squared L2 in double
    // (floats promoted, left fold), round(_, 6) HALF_UP on the decimal
    // string, (dist, cell) lexicographic, lower cell on rounded ties
    import org.apache.spark.sql.functions.{aggregate => aggr, _}
    val rnd = new scala.util.Random(11)
    val dim = 16
    val cents = Array.fill(6)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    // include exact-duplicate centroids to force rounded ties
    val centsWithTie = cents :+ cents(2).clone()
    val vecs = (0L until 200L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    def hofDist2(vec: org.apache.spark.sql.Column, cent: Array[Double]) =
      round(aggr(
        zip_with(transform(vec, x => x.cast("double")), lit(cent), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, v) => a + v), 6)
    val scored = array(centsWithTie.zipWithIndex.map { case (c, i) =>
      struct(hofDist2($"embedding", c), lit(i)).cast("struct<d:double,i:int>")
    }: _*)
    val hof = vecs.select($"vec_id",
      transform(slice(array_sort(scored), 1, 3), s => s.getField("i")).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val native = vecs.select($"vec_id",
      Similarity.nearestCells($"embedding", centsWithTie, 3).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native == hof)
    // and the plan stays O(1) in k: a 512-centroid matrix must analyze
    // fast and run (the HOF tree at this k would be ~50k expression nodes)
    val bigK = Array.fill(512)(Array.fill(dim)(rnd.nextDouble()))
    val t0 = System.nanoTime()
    val n = vecs.select(Similarity.nearestCell($"embedding", bigK).as("cell"))
      .groupBy($"cell").count().count()
    assert(n > 0 && (System.nanoTime() - t0) < 60e9)
  }

  test("bucketed top-k only searches the query's bucket") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 10),
      (1L, Array(0.99f, 0.14f), 10),
      (2L, Array(1.0f, 0.0f), 20)).toDF("vec_id", "embedding", "label")
    val out = Similarity.bucketedTopK(emb, "vec_id", "embedding", "label",
      $"vec_id" === 0, k = 5).collect()
    assert(out.map(_.getAs[Long]("nid")).toSet == Set(1L)) // 2 is a perfect match but in another bucket
  }

  test("hyperplane signature is deterministic and bucket-compatible") {
    val emb = Seq(
      (0L, Array.fill(8)(0.5f)),
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val sigs = emb.select($"vec_id",
      Similarity.hyperplaneSignature($"embedding", dim = 8, nBits = 12).as("sig"))
      .orderBy($"vec_id").collect()
    assert(sigs(0).getString(1) == sigs(1).getString(1))
    assert(sigs(0).getString(1).length == 12)
    assert(sigs(0).getString(1) != sigs(2).getString(1))
  }

  test("PII: counts find planted spans, redaction replaces them, clean text untouched") {
    val df = Seq(
      (1, "mail me at jane.doe+x@sub.example.org today"),
      (2, "server 192.168.0.1 and 10.0.0.255 up"),
      (3, "call +1-555-0142 or +44-207-9460000"),
      (4, "no pii here, just words."),
      (5, "bad ip 999.999.999.9999 still matches shape"))
      .toDF("id", "text")
    val out = df.select($"id",
      TextOps.emailCount($"text").as("e"),
      TextOps.ipv4Count($"text").as("i"),
      TextOps.phoneCount($"text").as("p"),
      TextOps.redactPii($"text").as("r"))
      .orderBy($"id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getString(4).contains("[EMAIL]"))
    assert(!out(0).getString(4).contains("jane"))
    assert(out(1).getInt(2) == 2 && out(1).getString(4) == "server [IP] and [IP] up")
    assert(out(2).getInt(3) == 2 && out(2).getString(4) == "call [PHONE] or [PHONE]")
    assert(out(3).toSeq.drop(1) == Seq(0, 0, 0, "no pii here, just words."))
    // the trailing 4-digit run never ends on a word boundary, and every
    // restart position lacks three dotted groups, so the IPv4 shape cannot match
    assert(out(4).getInt(2) == 0)
  }

  test("card redaction: Luhn validates, near-misses and invoice ids survive") {
    val df = Seq(
      (1, "pay 4111 1111 1111 1111 now"),          // valid Visa test number
      (2, "mc 5500-0000-0000-0004 ok"),            // valid MC, dash-separated
      (3, "amex 340000000000009 works"),           // valid Amex, 15 contiguous
      (4, "ref 4111111111111112 is an invoice"),   // near-miss: checksum fails
      (5, "order 1234567890123456 tracking"),      // card-shaped, not Luhn-valid
      (6, "short 4111 1111 is nothing"),           // under 13 digits: no candidate
      (7, "both 4111111111111111 and ref 4111111111111112 here"),
      // review regression: a longer NON-card run containing a valid card
      // as a substring must survive intact — a bare literal replace
      // would corrupt it to '9[CARD]'
      (8, "pay 4111111111111111 ref 94111111111111111 end"))
      .toDF("id", "text")
    val out = df.select($"id",
      size(TextOps.cardCandidates($"text")).as("nc"),
      size(TextOps.validCards($"text")).as("nv"),
      TextOps.redactCards($"text").as("r"))
      .orderBy($"id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1 &&
      out(0).getString(3) == "pay [CARD] now")
    assert(out(1).getString(3) == "mc [CARD] ok")
    assert(out(2).getString(3) == "amex [CARD] works")
    // validation is the whole point: candidates that fail Luhn are KEPT
    assert(out(3).getInt(1) == 1 && out(3).getInt(2) == 0 &&
      out(3).getString(3) == "ref 4111111111111112 is an invoice")
    assert(out(4).getInt(2) == 0 && out(4).getString(3).contains("1234567890123456"))
    assert(out(5).getInt(1) == 0)
    assert(out(6).getInt(1) == 2 && out(6).getInt(2) == 1 &&
      out(6).getString(3) == "both [CARD] and ref 4111111111111112 here")
    assert(out(7).getInt(1) == 2 && out(7).getInt(2) == 1 &&
      out(7).getString(3) == "pay [CARD] ref 94111111111111111 end",
      s"embedded occurrence corrupted: ${out(7).getString(3)}")
  }

  test("luhnValid property sweep: agrees with a reference checksum over 300 seeded candidates") {
    def refLuhn(digits: String): Boolean = {
      val ds = digits.reverse.map(_ - '0')
      ds.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum % 10 == 0
    }
    val rnd = new scala.util.Random(1234)
    val cands = (1 to 300).map { _ =>
      val n = 13 + rnd.nextInt(7)
      val digits = Seq.fill(n)(rnd.nextInt(10)).mkString
      val sep = rnd.nextInt(3) match {
        case 0 => digits
        case 1 => digits.grouped(4).mkString(" ")
        case _ => digits.grouped(4).mkString("-")
      }
      (sep, refLuhn(digits))
    }
    val got = cands.map(_._1).toDF("c")
      .select($"c", TextOps.luhnValid($"c").as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cands.foreach { case (c, expected) =>
      assert(got(c) == expected, s"luhn mismatch on '$c'")
    }
    // the sweep must exercise both verdicts to mean anything
    assert(cands.exists(_._2) && cands.exists(!_._2))
  }

  test("compactionPlan property sweep: coverage, bin bounds, keep rules on random listings") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val target = 500L + rnd.nextInt(1500)
      val listing = (1 to 120).map { i =>
        (s"d${rnd.nextInt(4)}", f"f$trial%02d_$i%03d",
          (1 + rnd.nextInt(2 * target.toInt)).toLong)
      }.toDF("dir", "file", "size")
      val plan = graft.ops.Layout
        .compactionPlan(listing, "dir", "file", "size", target)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      assert(plan.length == 120, "every file exactly once")
      assert(plan.filter(_._3 >= target).forall(p => p._4 == "keep" && p._5 == -1L),
        "at/over target always keeps")
      val byBin = plan.filter(_._4 == "compact").groupBy(p => (p._1, p._5))
      byBin.foreach { case ((dir, bin), fs) =>
        assert(fs.length >= 2, s"trial $trial: 1-file bin ($dir,$bin)")
        assert(fs.map(_._3).sum < target + fs.map(_._3).max,
          s"trial $trial: bin ($dir,$bin) overfills")
      }
    }
  }

  test("tokenChunks: ragged last chunk, exact boundaries, empty text") {
    val df = Seq(
      (1, "a b c d e"),  // n=2 -> ["a b","c d","e"]
      (2, "a b c d"),    // exact multiple -> 2 chunks
      (3, ""),           // empty -> []
      (4, "solo"))
      .toDF("id", "text")
    val out = df.select($"id", TextOps.tokenChunks($"text", 2).as("c"))
      .orderBy($"id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b", "c d", "e"))
    assert(out(1).getSeq[String](1) == Seq("a b", "c d"))
    assert(out(2).getSeq[String](1).isEmpty)
    assert(out(3).getSeq[String](1) == Seq("solo"))
  }

  test("BPE merges: hand-computed merge table on the classic low/lower/newest corpus") {
    val docs = Seq((1, "low low low lower lower newest")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(docs, "text", nMerges = 5)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // word freqs: low x3, lower x2, newest x1
    // iter1: "l o" and "o w" tie at 5 -> pair asc picks "l o"
    // iter2: "lo w" 5 -> "low"
    // iter3: "e r" and "low e" tie at 2 -> "e r"
    // iter4: "low er" 2 -> "lower"
    // iter5: four pairs tie at 1 inside n-e-w-e-s-t -> "e s" wins asc
    assert(got.toSeq == Seq(
      (1, "l o", "lo", 5L),
      (2, "lo w", "low", 5L),
      (3, "e r", "er", 2L),
      (4, "low er", "lower", 2L),
      (5, "e s", "es", 1L)))
  }

  test("BPE encode: trained merges collapse known words, untouched text counts chars") {
    // merge table from the classic corpus (verified in the training golden)
    val merges = Seq("l o" -> "lo", "lo w" -> "low", "e r" -> "er",
      "low er" -> "lower", "e s" -> "es")
    val df = Seq(
      (1, "low lower newest"), // 1 + 1 + (n e w es t) = 7
      (2, "lo"),               // l o -> lo = 1
      (3, ""),                 // no words -> 0
      (4, "xyz"))              // no merges apply -> 3 chars
      .toDF("id", "text")
    val out = df.select($"id", TextOps.bpeEncodeCount($"text", merges).as("n"))
      .orderBy($"id").collect().map(_.getInt(1)).toSeq
    assert(out == Seq(7, 1, 0, 3))
  }

  test("BPE greedy runs: repeated-symbol words pair left-to-right, not alternately") {
    // canonical greedy application of "a a"->"aa" over a run of k a's
    // leaves ceil(k/2) tokens: aaaa -> aa aa (2), aaaaa -> aa aa a (3),
    // aaaaaa -> aa aa aa (3). The old single-space sentinel scheme consumed
    // the shared boundary space and produced 3/3/4.
    val merges = Seq("a a" -> "aa")
    val df = Seq((1, "aaaa"), (2, "aaaaa"), (3, "aaaaaa"), (4, "aaaaaaaa"))
      .toDF("id", "text")
    val out = df.select($"id", TextOps.bpeEncodeCount($"text", merges).as("n"))
      .orderBy($"id").collect().map(_.getInt(1)).toSeq
    assert(out == Seq(2, 3, 3, 4))
    // and in training: a corpus of repeated runs merges "a a" first, with
    // the pair COUNT being the number of non-overlapping left-to-right
    // occurrences the replace actually collapses
    val docs = Seq((1, "aaaa aaaa")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(docs, "text", nMerges = 2)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // iter1: "a a" count 3*2=6 (adjacent-pair occurrences, weighted by wf=2)
    // -> aaaa becomes "aa aa"; iter2: "aa aa" count 2
    assert(got.toSeq == Seq((1, "a a", "aa", 6L), (2, "aa aa", "aaaa", 2L)))
  }

  test("byte-level BPE: hex alphabet, no OOV, char-path differential on ASCII") {
    // the hex rename is order-preserving, so on an ASCII corpus the byte
    // trainer elects the SAME merge sequence as the char trainer (hex-
    // coded) and the encoders count identically (VERDICT r12 #4)
    val docs = Seq((1, "low low low lower lower newest"),
      (2, "the quick brown fox the quick")).toDF("doc_id", "text")
    val charM = TextOps.bpeMerges(docs, "text", nMerges = 5)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val byteM = TextOps.bpeMergesBytes(docs, "text", nMerges = 5)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    def hexOf(sym: String): String =
      sym.getBytes("UTF-8").map("%02X".format(_)).mkString
    charM.zip(byteM).foreach { case ((cp, cm, cn), (bp, bm, bn)) =>
      assert(bp === cp.split(" ").map(hexOf).mkString(" "))
      assert(bm === hexOf(cm))
      assert(bn === cn)
    }
    // encoders agree token-for-token on ASCII
    val cSeq = charM.map(m => (m._1, m._2)).toSeq
    val bSeq = byteM.map(m => (m._1, m._2)).toSeq
    val counts = docs.select(
      TextOps.bpeEncodeCount($"text", cSeq).as("c"),
      TextOps.bpeEncodeCountBytes($"text", bSeq).as("b")).collect()
    counts.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // NO OOV: a multi-byte code point encodes as its UTF-8 byte count
    // under an empty merge table (the char path would count 1 symbol)
    val uni = Seq((1, "é €")).toDF("id", "text") // 2 bytes + 3 bytes
    val got = uni.select(
      TextOps.bpeEncodeCountBytes($"text", Seq.empty).as("b"),
      TextOps.bpeEncodeCount($"text", Seq.empty).as("c")).head()
    assert(got.getInt(0) === 5)
    assert(got.getInt(1) === 2)
    // and byte merges CAN climb through a multi-byte code point
    val uniDocs = Seq((1, "ééé ééé")).toDF("doc_id", "text")
    val m1 = TextOps.bpeMergesBytes(uniDocs, "text", nMerges = 1)
      .collect().head
    assert(m1.getString(1) === "C3 A9", "the é byte pair merges first")
  }

  test("mixEpochs: floor+fractional copies, zero weight drops, deterministic") {
    val docs = (0L until 300L).map(i =>
      (i, if (i < 100) "a" else if (i < 200) "b" else "c")).toDF("doc_id", "source")
    val mixed = graft.ops.Sampling.mixEpochs(docs, "doc_id", "source",
      Map("a" -> 2500, "b" -> 0), defaultPermill = 1000)
    val bySource = mixed.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: 100 docs at 2.5x -> between 200 (all floor) and 300 (all +1), ~250
    assert(bySource("a") >= 220 && bySource("a") <= 280, bySource.toString)
    assert(!bySource.contains("b"), "zero-weight source must drop entirely")
    assert(bySource("c") == 100, "default 1000 permill = exactly one copy")
    // copy index is 1..n_copies per doc
    val aDoc = mixed.filter($"source" === "a" && $"n_copies" === 3)
      .groupBy($"doc_id").count().collect()
    assert(aDoc.forall(_.getLong(1) == 3))
    // reproducible: second invocation yields the identical plan output
    val again = graft.ops.Sampling.mixEpochs(docs, "doc_id", "source",
      Map("a" -> 2500, "b" -> 0), defaultPermill = 1000)
    assert(mixed.orderBy($"doc_id", $"copy").collect().toSeq ==
      again.orderBy($"doc_id", $"copy").collect().toSeq)
  }

  test("nfc_normalize: recomposes decomposed text, identity on NFC, codegen + SQL agree") {
    graft.functions.NfcNormalize.register(spark)
    val composed = "café"           // é as one code point
    val decomposed = "café"        // e + combining acute
    // constant-fold path (interpreted eval)
    val folded = spark.sql(s"SELECT nfc_normalize('$decomposed') AS n")
      .collect().head.getString(0)
    assert(folded == composed)
    // DataFrame path (codegen) + already-normalized identity + empty/ascii
    val df = Seq((1, decomposed), (2, composed), (3, "plain ascii"), (4, ""))
      .toDF("id", "s")
    val out = df.select($"id",
        org.apache.spark.sql.functions.call_function("nfc_normalize", $"s").as("n"),
        length($"s").as("lenRaw"),
        length(org.apache.spark.sql.functions.call_function("nfc_normalize", $"s")).as("lenNfc"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) == composed && out(0).getInt(2) == 5 && out(0).getInt(3) == 4)
    assert(out(1).getString(1) == composed)
    assert(out(2).getString(1) == "plain ascii")
    assert(out(3).getString(1) == "")
    // type check rejects non-string args at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT nfc_normalize(42)").collect()
    }
  }

  test("domain chain + blocklist: subdomain inheritance, label boundaries, longest match") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val chain = Seq("cdn.eu.d7.example").toDF("host")
      .select(graft.ops.UrlOps.domainChain(col("host")).as("c"))
      .head.getSeq[String](0)
    assert(chain === Seq("cdn.eu.d7.example", "eu.d7.example", "d7.example", "example"))
    val hosts = Seq(
      (1L, "www.d3.example"),   // blocked via parent d3.example
      (2L, "d3.example"),       // blocked exactly
      (3L, "wd3.example"),      // '3.example' must NOT match (label boundary)
      (4L, "cdn.eu.d7.example"),// two covering suffixes -> longest wins
      (5L, "clean.example")     // unblocked
    ).toDF("doc_id", "host")
    val bl = Seq("d3.example", "3.example", "cdn.eu.d7.example", "d7.example")
      .toDF("suffix")
    val out = graft.ops.UrlOps
      .applyDomainBlocklist(hosts, "doc_id", "host", bl)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(out(1L) === ((true, Some("d3.example"))))
    assert(out(2L) === ((true, Some("d3.example"))))
    assert(out(3L) === ((false, None)), "label boundary: wd3.example is not under 3.example")
    assert(out(4L) === ((true, Some("cdn.eu.d7.example"))), "longest covering suffix wins")
    assert(out(5L) === ((false, None)))
    // the per-row compiled form (streaming stage) elects the same match
    // as the join form's argmax on every host
    val suffixes = Seq("d3.example", "3.example", "cdn.eu.d7.example", "d7.example")
    val perRow = hosts
      .select($"doc_id", graft.ops.UrlOps.blockedMatch($"host", suffixes).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out.forall { case (id, (_, m)) => perRow(id) === m },
      "blockedMatch must equal applyDomainBlocklist's election")
  }

  test("url canonicalization: case, www, ports, tracking params, order, fragment, slash") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val urls = Seq(
      // messy everything → fully normalized
      "HTTPS://WWW.Example.COM:443/Docs/3/?utm_source=x&b=2&a=1#frag",
      // same page, different cosmetics → SAME canonical
      "https://example.com/Docs/3?a=1&b=2&fbclid=zzz",
      // http default port; ref dropped; empty query vanishes
      "HTTP://www.Site.org:80/p/?ref=home",
      // non-default port kept; param kept; path case preserved
      "https://example.com:8443/A/B?z=9",
      // no query, no path
      "https://Example.com")
    val out = urls.toDF("url")
      .select(graft.ops.UrlOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "https://example.com/Docs/3?a=1&b=2")
    assert(out(1) == out(0))
    assert(out(2) == "http://site.org/p")
    assert(out(3) == "https://example.com:8443/A/B?z=9")
    assert(out(4) == "https://example.com")

    val dedup = graft.ops.UrlOps.urlDedup(
      urls.zipWithIndex.toDF("url", "id"), "url", "id")
      .orderBy($"id").collect()
    assert(dedup(0).getAs[Boolean]("keep"))      // id 0 keeps its group
    assert(!dedup(1).getAs[Boolean]("keep"))     // id 1 is the dup
    assert(dedup(1).getAs[Long]("group_n") == 2L)
    assert(dedup(2).getAs[Boolean]("keep") && dedup(2).getAs[Long]("group_n") == 1L)
  }

  test("weighted sample: cap semantics, determinism, proportional rates") {
    val s = spark
    import s.implicits._
    // weight >= cap keeps unconditionally; weight 0 never keeps
    val df = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) 1000L else 50L))
      .toDF("id", "w")
    val kept = graft.ops.Sampling.weightedSample(df, "id", "w", cap = 200)
    val byW = kept.groupBy($"w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byW(1000L) == 2000L)                     // min(w,cap)=cap → all kept
    val lowRate = byW.getOrElse(50L, 0L) / 2000.0   // expect 50/200 = 0.25
    assert(math.abs(lowRate - 0.25) < 0.06, s"rate $lowRate")
    assert(graft.ops.Sampling.weightedSample(
      (1L to 100L).toDF("id").withColumn("w", lit(0L)), "id", "w", cap = 200)
      .count() == 0)
    // identical selection on re-run (plan rebuilt from scratch)
    val again = graft.ops.Sampling.weightedSample(df, "id", "w", cap = 200)
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("sliding chunks: overlap content, ragged tail, boundary counts, empty text") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def chunksOf(text: String, n: Int, st: Int): Seq[(Int, Int, String)] =
      Seq(text).toDF("t")
        .select(explode(graft.ops.TextOps.slidingChunks(col("t"), n, st)).as("c"))
        .select("c.chunk_idx", "c.n_tok", "c.chunk")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq

    // 10 tokens, window 4, stride 3 → last = ceil(6/3) = 2 → 3 chunks
    val c = chunksOf("a b c d e f g h i j", 4, 3)
    assert(c == Seq((0, 4, "a b c d"), (1, 4, "d e f g"), (2, 4, "g h i j")))
    // exact fit: one chunk, no phantom tail
    assert(chunksOf("a b c d", 4, 3) == Seq((0, 4, "a b c d")))
    // one token past the window: ragged second chunk of stride offset
    assert(chunksOf("a b c d e", 4, 3) == Seq((0, 4, "a b c d"), (1, 2, "d e")))
    // shorter than the window: single ragged chunk
    assert(chunksOf("a b", 4, 3) == Seq((0, 2, "a b")))
    // empty / whitespace-only text: no chunks
    assert(chunksOf("", 4, 3).isEmpty)
    assert(chunksOf("   ", 4, 3).isEmpty)
  }

  test("expectation checks: planted violations counted exactly, clean rules pass") {
    val s = spark
    import s.implicits._
    import graft.ops.Validate
    import graft.ops.Validate.{Rule, countWhere}
    val df = Seq(
      (1L, Some(10.0), "en"), (2L, Some(-3.0), "en"),   // one negative value
      (3L, None, "de"),                                  // one null
      (3L, Some(5.0), "xx")                              // dup key + bad domain
    ).toDF("id", "v", "lang")
    val out = Validate.check(df, Seq(
      Rule("neg_v", countWhere($"v" < 0), 0L),
      Rule("null_v", countWhere($"v".isNull), 0L),
      Rule("dup_id", count(lit(1)) - countDistinct($"id"), 0L),
      Rule("bad_lang", countWhere(!$"lang".isin("en", "de")), 1L)
    )).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("neg_v") == ((1L, 0L, false)))
    assert(out("null_v") == ((1L, 0L, false)))
    assert(out("dup_id") == ((1L, 0L, false)))
    assert(out("bad_lang") == ((1L, 1L, true)))          // within budget

    val dim = Seq(1L, 2L).toDF("pk")
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    assert(Validate.fkViolations(fact, "fk", dim, "pk") == 1L) // 9 orphaned, null exempt
  }

  test("table profile: exact per-column stats in one pass, mixed types stringified") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some(2.5), "b"), (2L, None, "a"), (2L, Some(7.0), "a"))
      .toDF("k", "v", "t")
    val out = graft.ops.Validate.profile(df, Seq("k", "v", "t"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("k") == ((3L, 0L, 2L, "1", "2")))
    assert(out("v") == ((3L, 1L, 2L, "2.5", "7.0")))
    assert(out("t") == ((3L, 0L, 2L, "a", "b")))
  }

  test("incremental dedup: corpus dups, intra-delta dups, and new rows classified") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.md5
    val delta = Seq((10L, "alpha"), (11L, "beta"), (12L, "beta"), (13L, "gamma"))
      .toDF("id", "text")
    val seen = Seq("alpha").toDF("t").select(md5($"t").as("digest"))
    val st = graft.ops.Dedup.incrementalStatus(delta, "id", "text", seen, "digest")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(st(10L) == "dup_of_corpus")
    assert(st(11L) == "new")            // first carrier of 'beta' in the delta
    assert(st(12L) == "dup_in_delta")
    assert(st(13L) == "new")
  }

  test("semDedup: within-cell drops by id order, cross-cell near-dups survive") {
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),    // cell 0 anchor
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),  // ≈ v1 → dropped
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),    // cell 1 anchor
      (4L, Seq(0.0f, 0.99f, 0.01f, 0.0f)),  // ≈ v3 → dropped
      (5L, Seq(0.6f, 0.8f, 0.0f, 0.0f)))    // cell 1, below threshold vs v3/v4
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, "vec_id", "embedding", cents, threshold = 0.999)
      .orderBy($"vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1L, 0, true), (2L, 0, false), (3L, 1, true),
      (4L, 1, false), (5L, 1, true)))
  }

  test("charLmScore: hand-computed trigram LM nll, normalization, short-doc drop") {
    // corpus {"ab ab", "abab"}: trigram counts ab_=1, b_a=1, _ab=1, aba=1,
    // bab=1; prefix counts ab=2 (ab_, aba), b_=1, _a=1, ba=1. So only the
    // two trigrams with prefix "ab" carry ln(1/2); all others are ln(1)=0.
    //   doc 1: -(ln .5 + 0 + 0)/3 = 0.2310   doc 2: -(ln .5 + 0)/2 = 0.3466
    val df = Seq((1L, "AB? ab"),   // normalizes to "ab ab" (case + punct)
                 (2L, "abab"),
                 (3L, "x!"))       // < 3 normalized chars → dropped
      .toDF("doc_id", "text")
    val out = TextOps.charLmScore(df, "doc_id", "text").orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 3L, 0.2310), (2L, 2L, 0.3466)))
  }

  test("wordLmScore: hand-computed Stupid Backoff with both arms load-bearing") {
    // train {1:"a b a b c", 2:"a b c c"}, vocabSize 2 → vocab {a,b}
    // (counts a=3 b=3 c=3, tie breaks word-asc), c → <unk>.
    // uni: a=3 b=3 u=3, N=9. bigrams: (a,b)=3 (b,a)=1 (b,u)=2 (u,u)=1;
    // prefix: a=3 b=3 u=1.
    // score 10:"b a d c a" → mapped pairs (b,a)(a,u)(u,u)(u,a):
    //   (b,a) seen ln(1/3); (a,u) UNSEEN → ln(.4·(3+1)/(9+2+1));
    //   (u,u) seen ln(1)=0; (u,a) UNSEEN → same backoff.
    // micro-sum −5128418 over 4 → nll 1.2821
    val df = Seq((1L, "a b a b c"), (2L, "a b c c"), (10L, "b a d c a"))
      .toDF("doc_id", "text")
    val out = TextOps.wordLmScore(df, "doc_id", "text",
        trainFilter = col("doc_id") < 10, scoreFilter = col("doc_id") === 10,
        vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((10L, 4L, 1.2821)))
    // <unk> ABSENT from training (vocab covers it all): the add-one
    // smoothing keeps the backoff finite — uc(<unk>)=0 arm
    val df2 = Seq((1L, "a b a b"), (10L, "a c b")).toDF("doc_id", "text")
    val out2 = TextOps.wordLmScore(df2, "doc_id", "text",
        trainFilter = col("doc_id") < 10, scoreFilter = col("doc_id") === 10,
        vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // (a,u): ln(.4·1/7) and (u,b): ln(.4·3/7) → nll 2.3129
    assert(out2.toSeq === Seq((10L, 2L, 2.3129)))
  }

  test("phraseSearch: overlapping + repeated-term phrases, multi-doc hits") {
    val docs = Seq(
      (1L, Seq("a", "b", "a", "b", "a")), // "a b a" occurs at bases 0 AND 2
      (2L, Seq("x", "a", "b", "a", "y")), // one occurrence mid-doc
      (3L, Seq("a", "b", "b", "a")),      // no occurrence
      (4L, Seq("q", "r")))                // shorter than the phrase
      .toDF("doc_id", "w")
    val queries = Seq((0L, Seq("a", "b", "a")), (1L, Seq("q", "r", "s")))
      .toDF("qid", "ph")
    val got = graft.ops.PhraseIndex.phraseSearch(docs, "doc_id", "w", queries)
      .orderBy($"qid", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 1L, 2L), (0L, 2L, 1L)),
      "overlapping occurrences both count; partial matches never do")
    // the stateless per-row array-scan form (streaming path) must elect
    // IDENTICAL rows
    val scan = graft.ops.PhraseIndex.phraseScan(docs, "doc_id", "w", queries)
      .orderBy($"qid", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(scan === got, "array scan must equal the postings path")
  }

  test("winnowing: shared-substring guarantee, density bound, short-doc drop") {
    import graft.ops.Winnow
    // the winnowing theorem: a shared substring of length >= k + w - 1
    // (= 8 here) must contribute at least one IDENTICAL fingerprint to
    // both documents — check over 20 constructed pairs
    val rnd = new scala.util.Random(7)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar)
      .mkString // small alphabet: repeated k-grams exercise the tie rule
    val pairs = (0 until 20).map { i =>
      val shared = randText(12 + i)
      (2L * i, randText(30) + shared + randText(25),
        2L * i + 1, randText(27) + shared + randText(31))
    }
    val df = pairs.flatMap { case (a, ta, b, tb) => Seq((a, ta), (b, tb)) }
      .toDF("doc_id", "text")
    // recover the raw fingerprint SETS via the op's encoding by re-running
    // with the digest replaced: use n_fp/digest plus a direct collect of
    // the fp arrays through the same expression path
    val fps = Winnow.fingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // structural checks: density ~2/(w+1) — selected distinct count is
    // well under the window count and at least 1 per full text
    fps.foreach { case (id, (ng, nfp)) =>
      assert(nfp >= 1 && nfp <= ng - 3, s"doc $id: $nfp of $ng")
    }
    // guarantee check needs the actual sets: rebuild via an expression
    // select of the fp arrays
    import org.apache.spark.sql.functions._
    val raw = df.select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("__n"))
      .withColumn("hs", expr(
        "transform(sequence(1, length(__n) - 4), i -> " +
          "cast(conv(substring(md5(substring(__n, i, 5)), 1, 15), 16, 10) " +
          "as bigint) % 1073741824)"))
      .withColumn("fp", expr(
        "array_distinct(transform(sequence(1, size(hs) - 3), j -> " +
          "array_min(slice(hs, j, 4)) * 1048576 + " +
          "(j + 4 - array_position(reverse(slice(hs, j, 4)), " +
          "array_min(slice(hs, j, 4))))))"))
      .select(col("doc_id"), expr("transform(fp, x -> x div 1048576)").as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    pairs.foreach { case (a, _, b, _) =>
      assert(raw(a).intersect(raw(b)).nonEmpty,
        s"docs $a/$b share a >=8-char substring but no fingerprint hash")
    }
    // shorter than k + w - 1 normalized chars: dropped
    assert(Winnow.fingerprints(Seq((9L, "ab!cd-e")).toDF("doc_id", "text"),
      "doc_id", "text").count() === 0)
  }

  test("packSequences: greedy first-fit, equal-fit stays, truncation, shard isolation") {
    // shard 0, capacity 10: docs (id, ntok) 1:4 2:6 (4+6=10 equal-fit
    // STAYS) 3:1 (overflow -> seq 2) 4:25 (truncates to 10, overflow ->
    // seq 3 alone) 5:0 (zero-width appends at current fill) ; shard 1
    // packs independently from seq 1
    val df = Seq((1L, 0L, 4L), (2L, 0L, 6L), (3L, 0L, 1L), (4L, 0L, 25L),
        (5L, 0L, 0L), (6L, 1L, 7L), (7L, 1L, 7L))
      .toDF("doc_id", "shard", "ntok")
    def run(parts: Int) = graft.ops.Packing
      .packSequences(df.repartition(parts), "doc_id", "ntok", "shard", 10)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val want = Seq((1L, 1L, 0L, 4L), (2L, 1L, 4L, 6L), (3L, 2L, 0L, 1L),
      (4L, 3L, 0L, 10L), (5L, 3L, 10L, 0L), (6L, 1L, 0L, 7L), (7L, 2L, 0L, 7L))
    assert(run(4) === want)
    assert(run(1) === want, "layout must be partition-count invariant")
  }

  test("bucketed layout fingerprint: stable per content, regeneration invalidates") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-fp").toString
    Files.writeString(Paths.get(dir, "orders.parquet"), "v1-orders")
    Files.writeString(Paths.get(dir, "lineitem.parquet"), "v1-lineitem")
    val entries = Seq("orders.parquet", "lineitem.parquet")
    val fp1 = graft.queries.Pipeline.layoutFingerprint(dir, entries)
    assert(fp1 == graft.queries.Pipeline.layoutFingerprint(dir, entries),
      "same content, same key")
    // in-place regeneration: same path, new bytes/mtime → MUST be a miss
    Files.writeString(Paths.get(dir, "orders.parquet"), "v2-orders!!")
    val fp2 = graft.queries.Pipeline.layoutFingerprint(dir, entries)
    assert(fp1 != fp2, "regenerated dataset must change the cache key")
    // mtime-only change (same size) also invalidates
    Files.setLastModifiedTime(Paths.get(dir, "lineitem.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(12345L))
    assert(graft.queries.Pipeline.layoutFingerprint(dir, entries) != fp2)
  }

  test("cachedLayout: in-JVM racers queue on the monitor, build runs exactly once") {
    // FileChannel.lock only blocks ACROSS processes — same-JVM contention
    // throws OverlappingFileLockException unless the JVM-level mutex
    // serializes first. Race 4 threads at a fresh digest with a slow
    // build: exactly one build, zero lock exceptions, all adopt the same
    // committed dir, marker present, no stage debris left behind.
    val digest = s"race${System.nanoTime()}"
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val dirs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
    val threads = (0 until 4).map { _ =>
      new Thread(() => {
        try dirs.add(graft.queries.Pipeline.cachedLayout("opsspec", digest) { staging =>
          built.incrementAndGet()
          Thread.sleep(300) // widen the race window
          java.nio.file.Files.writeString(staging.resolve("payload"), "x")
        })
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(errors.isEmpty, s"racers failed: ${errors}")
    assert(built.get() == 1, s"build ran ${built.get()} times")
    assert(dirs.size == 4 && dirs.stream().distinct().count() == 1)
    val dir = dirs.get(0)
    assert(java.nio.file.Files.exists(dir.resolve("_LAYOUT_OK")))
    assert(java.nio.file.Files.exists(dir.resolve("payload")))
    import scala.jdk.CollectionConverters._
    val debris = java.nio.file.Files.list(dir.getParent).iterator().asScala
      .filter(_.getFileName.toString.startsWith(s"graft-opsspec-$digest-stage"))
    assert(debris.isEmpty, "staging debris left behind")
  }

  test("substringSpans: cross-doc span, self-repeat run, clean doc, merge maximality") {
    val df = Seq(
      (1L, "abcdefghij"),   // shares "abcdefg" with doc 2 -> one 7-char span
      (2L, "xxabcdefgyy"),  // same span at offset 3
      (3L, "zzzzzzzzzz"),   // all windows identical (self-repeat) -> whole doc
      (4L, "unique wrds!")) // nothing repeated -> zero rows all around
      .toDF("doc_id", "text")
    val out = Dedup.substringSpans(df, "doc_id", "text", w = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out(0) == ((1L, 1L, 7L, 7L, 0.7)),    "doc 1: one maximal 7-char span")
    assert(out(1) == ((2L, 1L, 7L, 7L, 0.6364)), "doc 2: same span, longer doc")
    assert(out(2) == ((3L, 1L, 10L, 10L, 1.0)),  "doc 3: self-repeats cover the doc")
    assert(out(3) == ((4L, 0L, 0L, 0L, 0.0)),    "doc 4: clean")
  }

  test("substringSpans hashed-key scale path equals the collision-free text-key path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val text = Dedup.substringSpans(docs, "doc_id", "text", w = 40)
      .orderBy($"doc_id").collect()
    val hashed = Dedup.substringSpans(docs, "doc_id", "text", w = 40, hashedKeys = true)
      .orderBy($"doc_id").collect()
    assert(text.length == hashed.length && text.length > 0)
    text.zip(hashed).foreach { case (a, b) => assert(a == b) }
    assert(text.exists(_.getLong(1) > 0), "fixture must exercise duplicated spans")
  }

  test("substringSpansAgainst: only eval-matching spans flag; self-repeats don't") {
    val evalDoc = "AAAAABBBBB"                      // ref corpus
    val train = Seq(
      (1L, "xxAAAAABBBBByy"),    // contains the full eval doc -> span [3,12]
      (2L, "AAAAAAAAAA"),        // self-repeating but NOT in eval (w=5: AAAAA IS in eval!)
      (3L, "zzzzzzzzzz"))        // clean
      .toDF("doc_id", "text")
    val ref = Seq((90L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.substringSpansAgainst(train, ref, "doc_id", "text", w = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: windows at offsets 3..8 match eval windows -> one span 3..12 (10 chars)
    assert(out(0) == ((1L, 1L, 10L, 10L)), s"got ${out(0)}")
    // doc 2: every 5-window is AAAAA, which occurs in eval -> whole doc one span
    assert(out(1) == ((2L, 1L, 10L, 10L)), s"got ${out(1)}")
    // doc 3: nothing in common with eval
    assert(out(2) == ((3L, 0L, 0L, 0L)), s"got ${out(2)}")
  }

  test("PQ: codebooks deterministic, codes cluster-pure, ADC ranks own cluster first") {
    // two well-separated clusters per subspace: vectors 0-3 near the
    // origin, 4-7 near (10,10,10,10); sub-vector noise keeps rows distinct
    val rows = (0 until 8).map { i =>
      val base = if (i < 4) 0.0f else 10.0f
      (i.toLong, Array(base + i * 0.01f, base - i * 0.01f,
        base + i * 0.02f, base - i * 0.02f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val b1 = Similarity.pqCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 2, iters = 2)
    val b2 = Similarity.pqCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 2, iters = 2)
    assert(b1.length == 2 && b1.forall(bk => bk.length == 2 && bk.forall(_.length == 2)))
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq == b2.map(_.map(_.toSeq).toSeq).toSeq,
      "training must be run-to-run deterministic")
    val out = Similarity.pqAdcTopK(df, "vec_id", "embedding", b1, subDim = 2,
        col("vec_id") === 0, k = 3)
      .orderBy($"rank").collect()
    assert(out.map(_.getLong(2)).toSet == Set(1L, 2L, 3L),
      "ADC top-3 of a cluster-0 query must be its three cluster-mates")
  }

  test("IVFADC: probed-cell candidates only, ADC ranks cluster-mates first") {
    val rows = (0 until 8).map { i =>
      val base = if (i < 4) 0.0f else 10.0f
      (i.toLong, Array(base + i * 0.01f, base - i * 0.01f,
        base + i * 0.02f, base - i * 0.02f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val coarse = Similarity.ivfCentroids(df, "vec_id", "embedding", k = 2, iters = 2)
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 2, iters = 2)
    val out = Similarity.ivfAdcTopK(df, "vec_id", "embedding", coarse, books,
        subDim = 2, nprobe = 1, col("vec_id") === 0, k = 3)
      .orderBy($"rank").collect()
    assert(out.map(_.getLong(2)).toSet == Set(1L, 2L, 3L),
      "top-3 of a cluster-0 query through its probed cell must be its cluster-mates")
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
  }

  test("IVFADC code layout: persisted codes + reloaded model reproduce ivfAdcTopK exactly") {
    val rows = (0 until 12).map { i =>
      val base = if (i < 6) 0.0f else 10.0f
      (i.toLong, Array(base + i * 0.01f, base - i * 0.01f,
        base + i * 0.02f, base - i * 0.02f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val coarse = Similarity.ivfCentroids(df, "vec_id", "embedding", k = 2, iters = 2)
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 2, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfadc-spec")
    try {
      Similarity.writeIvfAdcLayout(df, "vec_id", "embedding", coarse, books,
        subDim = 2, s"$dir/codes")
      Similarity.writeIvfAdcModel(dir.resolve("model.bin"), coarse, books)
      val (c2, b2) = Similarity.readIvfAdcModel(dir.resolve("model.bin"))
      assert(c2.map(_.toSeq).toSeq == coarse.map(_.toSeq).toSeq &&
        b2.map(_.map(_.toSeq).toSeq).toSeq == books.map(_.map(_.toSeq).toSeq).toSeq,
        "model must round-trip bit-exactly")
      val queries = df.filter($"vec_id" < 3)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val fromCodes = Similarity.ivfAdcTopKFromCodes(
          spark.read.parquet(s"$dir/codes"), queries, c2, b2,
          subDim = 2, nprobe = 1, k = 3)
        .orderBy($"qid", $"rank").collect().toSeq
      val direct = Similarity.ivfAdcTopK(df, "vec_id", "embedding", coarse, books,
          subDim = 2, nprobe = 1, $"vec_id" < 3, k = 3)
        .orderBy($"qid", $"rank").collect().toSeq
      assert(fromCodes == direct,
        "code-layout probe must equal the recode-per-run path row for row")
      // the scale property: a one-cell probe reads only that cell's
      // partition directory from the coded table
      val probed = Similarity.ivfAdcTopKFromCodes(
        spark.read.parquet(s"$dir/codes"),
        queries.filter($"qid" === 0), c2, b2, subDim = 2, nprobe = 1, k = 3)
      probed.collect()
      val s0 = probed.queryExecution.executedPlan.toString
      val cut = s0.indexOf("== Initial Plan ==")
      val plan = if (cut >= 0) s0.substring(0, cut) else s0
      assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
        s"one-cell probe must partition-prune the coded scan:\n$plan")
    } finally {
      import scala.jdk.CollectionConverters._
      val all = java.nio.file.Files.walk(dir).iterator().asScala.toSeq
      all.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_: java.nio.file.Path))
    }
  }

  test("salted IVFADC layout: probe-equal to unsalted, write fan-out visible") {
    // VERDICT r5 #7: a hot coarse cell must not serialize into one writer
    // task/file. The salt shapes ONLY the shuffle — directory layout and
    // probe results are identical; the fan-out shows up as multiple part
    // files inside a cell dir.
    val rows = (0 until 64).map { i =>
      // one dominant cell (~90% of rows) to make the hot-cell case real
      val base = if (i < 58) 0.0f else 10.0f
      (i.toLong, Array(base + i * 0.01f, base - i * 0.01f,
        base + i * 0.02f, base - i * 0.02f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val coarse = Similarity.ivfCentroids(df, "vec_id", "embedding", k = 2, iters = 2)
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding",
      m = 2, subDim = 2, k = 2, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfadc-salt")
    try {
      Similarity.writeIvfAdcLayout(df, "vec_id", "embedding", coarse, books,
        subDim = 2, s"$dir/plain")
      Similarity.writeIvfAdcLayout(df, "vec_id", "embedding", coarse, books,
        subDim = 2, s"$dir/salted", saltWriters = 4)
      val queries = df.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      def probe(sub: String) = Similarity.ivfAdcTopKFromCodes(
          spark.read.parquet(s"$dir/$sub"), queries, coarse, books,
          subDim = 2, nprobe = 2, k = 3)
        .orderBy($"qid", $"rank").collect().toSeq
      assert(probe("salted") == probe("plain"),
        "salting must be invisible to probes")
      // same cell-dir structure, more part files in the hot cell
      import scala.jdk.CollectionConverters._
      def partsPerCell(sub: String): Map[String, Int] =
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub"))
          .iterator().asScala.filter(p => p.getFileName.toString.startsWith("cell="))
          .map { p =>
            val n = java.nio.file.Files.list(p).iterator().asScala
              .count(_.getFileName.toString.endsWith(".parquet"))
            p.getFileName.toString -> n
          }.toMap
      val plain = partsPerCell("plain"); val salted = partsPerCell("salted")
      assert(plain.keySet == salted.keySet, "salting must not change cell dirs")
      assert(plain.values.forall(_ == 1), "unsalted: one writer file per cell")
      assert(salted.values.max > 1,
        s"salted hot cell must fan out across files, got $salted")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_: java.nio.file.Path))
    }
  }

  test("minhash_sig kernel == batch signature pipeline; band buckets agree") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                 (2L, "pack my box with five dozen liquor jugs"),
                 (3L, "ab"),   // shorter than q -> single whole-text shingle
                 (4L, ""))     // empty text -> md5 of "seed|" per function
      .toDF("doc_id", "text")
    // the explode+min-agg form is the reference arithmetic here: the
    // default minhashSignatures now routes through the same kernel, so
    // comparing it against MinhashSig directly would be vacuous
    val batch = Dedup.minhashSignaturesAgg(df, "doc_id", "text", q = 5, k = 12)
      .orderBy($"doc").collect().map(r => r.getSeq[Long](1))
    val perRow = df.select($"doc_id",
        graft.functions.MinhashSig(spark, $"text", 5, 12).as("sig"))
      .orderBy($"doc_id").collect().map(r => r.getSeq[Long](1))
    assert(batch.toSeq == perRow.toSeq,
      "native per-row kernel must be bit-identical to explode+min-agg")
    // derived band buckets: per-row array vs the corpus index rows
    val idx = Dedup.bandBuckets(df, "doc_id", "text", q = 5, k = 12, rowsPerBand = 3)
      .orderBy($"doc", $"band").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val arr = df.select($"doc_id",
        posexplode(Dedup.bandBucketArray("text", 5, 12, 3)).as(Seq("band", "bucket")))
      .orderBy($"doc_id", $"band").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(idx.toSeq == arr.toSeq)
  }

  test("signWord packs the documented bit layout; hammingTopK exact distances + tie order") {
    // bit i of word w == 1 iff vec[32w + i] >= 0
    val onlyDim0 = Array.fill(64)(-1.0f).updated(0, 1.0f).toSeq
    val onlyDim32 = Array.fill(64)(-1.0f).updated(32, 1.0f).toSeq
    val onlyDim63 = Array.fill(64)(-1.0f).updated(63, 1.0f).toSeq
    val allPos = Array.fill(64)(1.0f).toSeq
    val allNeg = Array.fill(64)(-1.0f).toSeq
    val halfPos = (Array.fill(32)(1.0f) ++ Array.fill(32)(-1.0f)).toSeq
    val df = Seq((0L, allPos), (1L, allNeg), (2L, halfPos),
        (3L, onlyDim0), (4L, onlyDim32), (5L, onlyDim63))
      .toDF("vec_id", "embedding")
    val words = df.select($"vec_id",
        Similarity.signWord($"embedding", 0).as("w0"),
        Similarity.signWord($"embedding", 1).as("w1"))
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(words(0) == ((0xFFFFFFFFL, 0xFFFFFFFFL)), "all positive -> all 32 bits set per word")
    assert(words(1) == ((0L, 0L)), "all negative -> zero words")
    assert(words(3) == ((1L, 0L)), "dim 0 -> bit 0 of word 0")
    assert(words(4) == ((0L, 1L)), "dim 32 -> bit 0 of word 1")
    assert(words(5) == ((0L, 1L << 31)), "dim 63 -> bit 31 of word 1 (no sign overflow)")
    val out = Similarity.hammingTopK(df, "vec_id", "embedding",
        col("vec_id") === 0, k = 5, dim = 64)
      .orderBy($"rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // distances from all-positive: halfPos=32, allNeg=64, onlyDim*=63 each
    assert(out(0) == ((1, 2L, 32L)))
    assert(out.slice(1, 4).toSeq == Seq((2, 3L, 63L), (3, 4L, 63L), (4, 5L, 63L)),
      "equal distances must tie-break by neighbour id")
    assert(out(4) == ((5, 1L, 64L)))
  }

  test("TopKMinPairs: exact k-smallest, binary string tie-break, partition-invariant") {
    val df = Seq((5L, "b"), (5L, "a"), (3L, "z"), (7L, "a"), (3L, "a"))
      .toDF("s", "i")
    val expected = Seq((3L, "a"), (3L, "z"), (5L, "a"))
    for (shape <- Seq(df, df.repartition(4))) {
      val got = shape
        .agg(graft.functions.TopKMinPairs(spark, col("s"), col("i"), 3).as("tk"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getString(1)))
      assert(got == expected, s"got $got under ${shape.rdd.getNumPartitions} partitions")
    }
    // long-id path: same contract
    val dfl = Seq((5L, 2L), (5L, 1L), (3L, 9L), (7L, 1L)).toDF("s", "i")
    val gotL = dfl.agg(graft.functions.TopKMinPairs(spark, col("s"), col("i"), 2).as("tk"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotL == Seq((3L, 9L), (5L, 1L)))
  }

  test("gopherGate: word-shape stats and each rule's failure mode") {
    val good = ("the cat and the dog ran over to the big red barn near a tall tree " +
      "and it sat for a while watching the birds in the field")  // long, stopword-rich
    val df = Seq(
      (1L, good),
      (2L, "a b c d e f g h i j k l m n o p q r s t"),       // mean word len 1 -> fails
      (3L, "short text"),                                     // n_words < 15 -> fails
      (4L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"),        // no alpha words, no stopwords
      (5L, ""))                                               // empty -> all zero stats
      .toDF("doc_id", "text")
    val out = TextOps.gopherGate(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getInt(5)))
    assert(out(0)._6 == 1, "good doc passes every rule")
    assert(out(0)._5 >= 2 && out(0)._3 >= 3.0, "good doc stats sane")
    assert(out(1) == ((2L, 20L, 1.0, 1.0, 1L, 0)), "1-char words fail mean_word_len")
    assert(out(2)._2 == 2L && out(2)._6 == 0, "short doc fails word-count bound")
    assert(out(3)._4 == 0.0 && out(3)._6 == 0, "numeric doc fails alpha fraction")
    assert(out(4) == ((5L, 0L, 0.0, 0.0, 0L, 0)), "empty doc -> zero stats, dropped")
  }

  test("decontaminationPairs: near-copy of an eval doc flags, unrelated doc does not") {
    val evalDoc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearCopy = "the quick brown fox jumps over the lazy dog near the river bank"
    val unrelated = "completely different content about spark shuffles and parquet files"
    val train = Seq((10L, nearCopy), (11L, unrelated), (12L, evalDoc))
      .toDF("doc_id", "text")
    val eval = Seq((90L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.decontaminationPairs(train, eval, "doc_id", "text")
      .orderBy($"a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val byTrain = out.map(p => p._1 -> p).toMap
    assert(byTrain.contains(10L) && byTrain(10L)._3 > 0.5,
      "near-copy must surface with high jaccard")
    assert(byTrain.contains(12L) && byTrain(12L)._3 == 1.0,
      "exact copy across corpora is jaccard 1.0")
    assert(!byTrain.contains(11L), "unrelated doc must not collide in any band")
  }

  test("adc_distance native kernel == HOF per-subspace folds (rounding contract included)") {
    val books = Array(
      Array(Array(0.1, -0.25), Array(1.5, 2.0)),
      Array(Array(-3.0, 0.000001), Array(0.5, 0.5)))
    val subDim = 2
    val df = Seq(
      (0L, Seq(0.11f, -0.2f, -2.9f, 0.1f), 0, 0),
      (1L, Seq(1.6f, 1.9f, 0.4f, 0.6f), 1, 1),
      (2L, Seq(-5.0f, 7.5f, 0.0f, 0.0f), 0, 1),
      (3L, Seq(0.123456f, 9.87f, -1.1f, 2.2f), 1, 0))
      .toDF("id", "qvec", "c0", "c1")
    val hof = {
      val terms = books.indices.map { j =>
        val cents = typedLit(books(j).map(_.toSeq).toSeq)
        val qslice = transform(
          slice($"qvec", j * subDim + 1, subDim), x => x.cast("double"))
        round(aggregate(
          zip_with(qslice, element_at(cents, col(s"c$j") + 1),
            (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, v) => acc + v), 6)
      }
      round(terms.reduce(_ + _), 6)
    }
    val both = df.select(
      graft.functions.AdcDistance(spark, $"qvec",
        array($"c0", $"c1"), books).as("native"),
      hof.as("hofv")).collect()
    both.foreach { r =>
      assert(!r.isNullAt(0) && r.getDouble(0) == r.getDouble(1),
        s"native ${r.get(0)} != hof ${r.get(1)}")
    }
  }

  test("hyperplane_sig native kernel == HOF formulation (incl. negative/NaN projections)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = emb.select(
        Similarity.hyperplaneSignature($"embedding", dim = 64, nBits = 12).as("native"),
        Similarity.hyperplaneSignatureHof($"embedding", dim = 64, nBits = 12).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
    // a zero vector projects to +0.0 on every plane -> all-ones from both
    val zero = Seq((1L, Array.fill(4)(0.0f).toSeq)).toDF("id", "v")
    val z = zero.select(
      Similarity.hyperplaneSignature($"v", dim = 4, nBits = 6).as("n"),
      Similarity.hyperplaneSignatureHof($"v", dim = 4, nBits = 6).as("h")).collect()(0)
    assert(z.getString(0) == z.getString(1) && z.getString(0) == "111111")
    // length mismatch: the HOF's zip_with null-pads, nulling every
    // projection -> all-zero signature; the kernel must agree (not sign a
    // partial projection)
    for (len <- Seq(3, 5)) {
      val ragged = Seq((1L, Array.fill(len)(1.0f).toSeq)).toDF("id", "v")
      val r = ragged.select(
        Similarity.hyperplaneSignature($"v", dim = 4, nBits = 6).as("n"),
        Similarity.hyperplaneSignatureHof($"v", dim = 4, nBits = 6).as("h")).collect()(0)
      assert(r.getString(0) == r.getString(1) && r.getString(0) == "000000",
        s"len=$len: native ${r.getString(0)} hof ${r.getString(1)}")
    }
    // NULL vector: every projection nulls -> every bit takes the
    // otherwise('0') branch in the HOF; the native kernel must emit the
    // same all-zero signature, not SQL NULL (ADVICE r5)
    val nullVec = Seq((1L, Option.empty[Seq[Float]])).toDF("id", "v")
    val nv = nullVec.select(
      Similarity.hyperplaneSignature($"v", dim = 4, nBits = 6).as("n"),
      Similarity.hyperplaneSignatureHof($"v", dim = 4, nBits = 6).as("h")).collect()(0)
    assert(!nv.isNullAt(0) && !nv.isNullAt(1),
      s"null vec must not null the signature: native ${nv.get(0)} hof ${nv.get(1)}")
    assert(nv.getString(0) == nv.getString(1) && nv.getString(0) == "000000")
  }

  test("decontaminationPairs: colliding train/eval doc ids stay unambiguous (ADVICE r4)") {
    // train id 1 and eval id 1 are DIFFERENT documents; the per-side
    // shingle computation must score (train 1, eval 1) on their own
    // texts — the former union-based verify fanned out on the shared id
    val evalDoc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about spark shuffles and parquet files"))
      .toDF("doc_id", "text")
    val eval = Seq((1L, evalDoc)).toDF("doc_id", "text")
    val out = Dedup.decontaminationPairs(train, eval, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    assert(out.map(_._1).distinct.length == out.length,
      s"no duplicated (a, b) rows despite the id collision: ${out.toSeq}")
    val hit = out.toMap.get((1L, 1L))
    assert(hit.exists(j => j > 0.5 && j < 1.0),
      s"train 1 vs eval 1 must score the two DIFFERENT texts (got $hit)")
  }

  test("bm25TopK matches an independent driver-side Okapi computation") {
    val corpus = Map(
      1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("apple", "banana", "banana", "cherry"),
      3L -> Seq("cherry", "cherry", "cherry", "date", "date"))
    val df = corpus.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val qs = Seq(0 -> Seq("apple", "cherry"))
    val out = TextOps.bm25TopK(df, "doc_id", "text", qs, topK = 3)
      .orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // independent reimplementation (plain scala, same quantization contract)
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.length).sum / n
    def dfq(t: String) = corpus.values.count(_.contains(t))
    def ppm(t: String, ws: Seq[String]): Long = {
      val tf = ws.count(_ == t).toDouble
      if (tf == 0) 0L
      else math.round(math.log(1 + (n - dfq(t) + 0.5) / (dfq(t) + 0.5)) *
        tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * ws.length / avgdl)) * 1e6)
    }
    val expected = corpus.toSeq
      .map { case (id, ws) => (id, qs.head._2.map(ppm(_, ws)).sum) }
      .filter(_._2 != 0L)
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex
      .map { case ((id, s), i) =>
        (0, i + 1, id, math.rint(s / 1e6 * 1e4) / 1e4) }
    assert(out.toSeq == expected,
      s"engine ${out.toSeq} != independent ${expected}")
  }

  test("containment: embedded doc scores exactly 1 one-way while jaccard dilutes") {
    val small = "the quick brown fox jumps over the lazy dog"
    val host = small + " and then continues with a very long tail of unrelated " +
      "filler words that grows the host document far beyond the quoted fragment"
    val df = Seq((1L, small), (2L, host)).toDF("doc_id", "text")
    // measure semantics on an explicit candidate pair (independent of LSH
    // recall — at this dilution a jaccard-tuned band index may not fire)
    val cand = Seq((1L, 2L)).toDF("a", "b")
    val r = Dedup.containmentVerify(df, cand, "doc_id", "text").collect().head
    assert(r.getDouble(2) == 1.0,
      "every shingle of a strict prefix appears in the host -> containment 1.0")
    assert(r.getDouble(3) < 0.6, s"host-in-small stays low, got ${r.getDouble(3)}")
    // end-to-end through the banded index: exact dups always collide
    val dup = Seq((1L, "identical text body"), (2L, "identical text body"),
        (3L, "something else entirely different")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(dup, "doc_id", "text").collect()
    assert(pairs.length == 1 &&
      pairs.head.getDouble(3) == 1.0 && pairs.head.getDouble(4) == 1.0,
      "exact-dup pair flows through with containment 1.0 both ways")
  }

  test("psiDrift: zero on identical snapshots, hand-checked on a known shift") {
    def frame(bins: Seq[Long]) =
      bins.map(b => ("f", b)).toDF("feature", "bin")
    val cur = frame(Seq.fill(8)(0L) ++ Seq.fill(2)(1L))
    val old = frame(Seq.fill(5)(0L) ++ Seq.fill(5)(1L))
    val same = graft.ops.Validate.psiDrift(cur, cur, nBins = 2).collect().head
    assert(same.getDouble(3) == 0.0, "identical distributions -> psi exactly 0")
    val out = graft.ops.Validate.psiDrift(cur, old, nBins = 2).collect().head
    assert((out.getLong(1), out.getLong(2)) == ((10L, 10L)))
    // independent computation, same micro-unit quantization contract
    def p(c: Long, n: Long) = (c + 1.0) / (n + 2.0)
    val expected = Seq((8L, 5L), (2L, 5L)).map { case (cn, co) =>
      math.round((p(cn, 10) - p(co, 10)) * math.log(p(cn, 10) / p(co, 10)) * 1e6)
    }.sum / 1e6
    assert(out.getDouble(3) == math.rint(expected * 1e4) / 1e4,
      s"psi ${out.getDouble(3)} != independent $expected")
    // bins empty in BOTH snapshots still carry a smoothing term when the
    // totals differ: cur 10 docs vs old 20, all in bin 0, nBins=3 — bins
    // 1 and 2 each contribute (1/13 - 1/23)·ln((1/13)/(1/23))
    val c2 = frame(Seq.fill(10)(0L))
    val o2 = frame(Seq.fill(20)(0L))
    val out2 = graft.ops.Validate.psiDrift(c2, o2, nBins = 3).collect().head
    def p2(c: Long, n: Long) = (c + 1.0) / (n + 3.0)
    val exp2 = (Seq((10L, 20L), (0L, 0L), (0L, 0L)).map { case (cn, co) =>
      math.round((p2(cn, 10) - p2(co, 20)) * math.log(p2(cn, 10) / p2(co, 20)) * 1e6)
    }.sum) / 1e6
    assert(out2.getDouble(3) == math.rint(exp2 * 1e4) / 1e4,
      s"both-empty bins must contribute: ${out2.getDouble(3)} != $exp2")
    assert(out2.getDouble(3) > 0.0, "total-size drift alone must register")
  }

  test("snapshotDiff classifies added/removed/changed/same exactly") {
    val cur = Seq((1L, "alpha"), (2L, "beta"), (4L, "delta")).toDF("doc_id", "text")
    val old = Seq((1L, "alpha"), (2L, "BETA-OLD"), (3L, "gamma")).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(cur, old, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "same", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("shardManifest: stable assignment, exact accounting, roundtrip witness") {
    val docs = (0L until 40L).map(i => (i, s"doc $i body with some words " + ("x " * (i % 7).toInt)))
      .toDF("doc_id", "text")
    val m1 = graft.ops.Layout.shardManifest(docs, "doc_id", "text", nShards = 4)
      .collect()
    assert(m1.map(_.getLong(0)).toSeq == m1.map(_.getLong(0)).toSeq.sorted, "ordered by shard")
    assert(m1.map(_.getLong(1)).sum == 40L, "every doc lands in exactly one shard")
    assert(m1.forall(_.getInt(5) == 1), "read-back manifest must equal the pre-write plan")
    val m2 = graft.ops.Layout.shardManifest(docs, "doc_id", "text", nShards = 4)
      .collect()
    assert(m1.map(r => (r.getLong(0), r.getLong(4))).toSeq ==
      m2.map(r => (r.getLong(0), r.getLong(4))).toSeq,
      "digest is content-deterministic across runs")
  }

  test("compactionPlan: bins fill to target, oversized and lonely files keep, partitioning-invariant") {
    val target = 1000L
    val rnd = new scala.util.Random(7)
    val listing = (
      // dir a: many small files → several full bins
      (1 to 40).map(i => ("a", f"a$i%03d", 50L + rnd.nextInt(400))) ++
      // dir b: two big files over target (keep) + three smalls (one bin)
      Seq(("b", "big1", 1500L), ("b", "big2", 1000L),
          ("b", "s1", 200L), ("b", "s2", 300L), ("b", "s3", 100L)) ++
      // dir c: ONE small file — nothing to merge with → keep
      Seq(("c", "only", 10L))
    ).toDF("dir", "file", "size")
    val plan = graft.ops.Layout
      .compactionPlan(listing, "dir", "file", "size", target)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(plan.length == 46, "every listed file appears exactly once")
    // at/over target → keep with null bin
    assert(plan.filter(p => p._3 >= target)
      .forall(p => p._4 == "keep" && p._5 == -1L))
    // the lonely small file keeps (a 1-file bin compacts nothing)
    assert(plan.find(_._2 == "only").get._4 == "keep")
    // dir b's three smalls share one bin
    val bBins = plan.filter(p => p._1 == "b" && p._4 == "compact").map(_._5)
    assert(bBins.length == 3 && bBins.distinct.length == 1)
    // every compact bin has >= 2 members; every bin total lands within
    // one candidate's size of the target on both sides (the cumsum-
    // bucketing guarantee: over by at most its own largest member,
    // under by at most the previous bin's overshoot)
    val byBin = plan.filter(_._4 == "compact").groupBy(p => (p._1, p._5))
    val maxCand = plan.filter(_._3 < target).map(_._3).max
    byBin.foreach { case ((dir, bin), fs) =>
      assert(fs.length >= 2, s"bin ($dir,$bin) has a single member")
      val total = fs.map(_._3).sum
      assert(total < target + fs.map(_._3).max, s"bin ($dir,$bin) overfills")
    }
    val aBins = byBin.keys.filter(_._1 == "a").map(_._2).toSeq.sorted
    aBins.dropRight(1).foreach { bin =>
      assert(byBin(("a", bin)).map(_._3).sum > target - maxCand,
        s"non-final bin $bin underfills beyond the one-member bound")
    }
    // exact-integer windows → the plan is invariant to input partitioning
    val plan2 = graft.ops.Layout
      .compactionPlan(listing.repartition(13), "dir", "file", "size", target)
      .orderBy($"dir", $"file").collect()
    val plan1 = graft.ops.Layout
      .compactionPlan(listing, "dir", "file", "size", target)
      .orderBy($"dir", $"file").collect()
    assert(plan1.sameElements(plan2))
    // caller column names are arbitrary — the op normalizes, then windows
    // over its own names (regression: the windows once referenced the
    // caller's names post-rename and threw UNRESOLVED_COLUMN)
    val renamed = graft.ops.Layout.compactionPlan(
        listing.toDF("directory", "fname", "bytes"),
        "directory", "fname", "bytes", target)
      .orderBy($"dir", $"file").collect()
    assert(renamed.sameElements(plan1))
  }

  test("operators release their internal persists (VERDICT r5 #5)") {
    // Library hygiene: each sealed operator may leave ONLY its own
    // checkpointed result behind — no intermediate cache (shingle sets,
    // token/tf frames, signatures, collapse windows) survives the call.
    // Baseline the persistent-RDD count, run the operator, and assert at
    // most one new persisted RDD (the sealed result's blocks) remains.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    // release immediately after the checkpoint lands (the default keeps a
    // reuse window for repeated invocations — see CacheHygiene)
    spark.conf.set("graft.seal.linger.ms", "0")
    val docs = (0L until 60L).map { i =>
      (i, s"shared boilerplate sentence number ${i % 7} with document ${i} body text")
    }.toDF("doc_id", "text")
    val eval = (0L until 10L).map(i =>
      (i, s"shared boilerplate sentence number ${i % 7} with document ${i} body text"))
      .toDF("doc_id", "text")
    def leaked(label: String)(run: => org.apache.spark.sql.DataFrame): Unit = {
      val before = spark.sparkContext.getPersistentRDDs.size
      val out = run
      assert(out.count() >= 0)
      // release is deferred to the first materialization (the count above
      // lands the lazy checkpoint; the watcher unpersists right after) —
      // poll briefly instead of asserting an instantaneous state
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      var after = spark.sparkContext.getPersistentRDDs.size
      while (after - before > 1 && System.nanoTime < deadline) {
        Thread.sleep(100)
        after = spark.sparkContext.getPersistentRDDs.size
      }
      assert(after - before <= 1,
        s"$label leaked ${after - before - 1} intermediate cache(s) " +
          s"beyond its sealed result (before=$before after=$after)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    try {
      leaked("bm25TopK") {
        graft.ops.TextOps.bm25TopK(docs, "doc_id", "text",
          Seq((1, Seq("boilerplate", "document"))), topK = 3)
      }
      leaked("lshJaccard") {
        Dedup.lshJaccard(docs, "doc_id", "text", q = 4, k = 8, rowsPerBand = 2)
      }
      leaked("minhashCandidates") {
        Dedup.minhashCandidates(docs, "doc_id", "text", q = 4, k = 8, rowsPerBand = 2)
      }
      leaked("containmentPairs") {
        Dedup.containmentPairs(docs, "doc_id", "text", q = 4, k = 8, rowsPerBand = 2)
      }
      leaked("decontaminationPairs") {
        Dedup.decontaminationPairs(docs, eval, "doc_id", "text", q = 4, k = 8,
          rowsPerBand = 2)
      }
    } finally spark.conf.unset("graft.seal.linger.ms")
  }

  test("dsirScores: target-like docs score positive, off-distribution negative") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // two clearly separated bigram distributions: "good" docs repeat one
    // phrase family, "junk" docs another; one doc has no bigrams at all
    val docs = Seq(
      (1L, "the quick brown fox jumps over lazy dogs daily", true),
      (2L, "the quick brown fox runs over lazy dogs nightly", true),
      (3L, "quick brown fox over lazy dogs again and again", true),
      (4L, "buy cheap pills now click here buy cheap pills", false),
      (5L, "click here now buy cheap pills click here now", false),
      (6L, "solo", false)
    ).toDF("doc_id", "text", "is_good")
    val out = Sampling.dsirScores(docs, "doc_id", "text", "is_good")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // no-bigram doc is absent (caller left-joins a default)
    assert(!out.contains(6L))
    assert(out(1L)._1 == 8, "n_feats counts bigram occurrences")
    // every target doc scores strictly above every junk doc, and the
    // separation crosses zero (the p79 keep threshold is meaningful)
    val good = Seq(1L, 2L, 3L).map(out(_)._2)
    val junk = Seq(4L, 5L).map(out(_)._2)
    assert(good.min > junk.max, s"separation: $good vs $junk")
    assert(good.forall(_ > 0) && junk.forall(_ < 0), s"signs: $good / $junk")
    // deterministic under repartitioning (the distribution estimate and the
    // per-doc sums are the same values regardless of layout, to 4 dp)
    val rep = Sampling.dsirScores(docs.repartition(7), "doc_id", "text", "is_good")
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(2) * 1e4)).toMap
    out.foreach { case (id, (_, sc)) =>
      assert(rep(id) == math.round(sc * 1e4), s"doc $id stable under layout")
    }
  }
}
