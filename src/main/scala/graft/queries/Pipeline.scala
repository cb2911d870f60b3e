package graft.queries

import graft.ops.{Dedup, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators over the `documents` / `embeddings`
  * tables (builder-prompt first-class components): dedup (exact, MinHash+LSH,
  * n-gram Jaccard, fingerprints, SimHash), similarity search (brute-force +
  * bucketed ANN), and text analysis (tokens, language ID, quality).
  *
  * Every query here has an exact DuckDB oracle: the Spark side is built from
  * codegen'd Catalyst expressions whose semantics we mirror token-for-token in
  * DuckDB SQL (md5 digests, generate_series shingles, list_* higher-order
  * functions). Doubles that cross engines are rounded to 4 decimals; every
  * query ends in a total ORDER BY.
  */
object Pipeline {
  import Tables.t

  private val StopEnSql = TextOps.StopwordsEn.mkString("['", "', '", "']")

  /** p90's fixed probe set: 7 vocabulary tokens + one token absent from
    * every document (exercises the zero/collision path of the CMS).
    */
  private[queries] val p90Probes: Seq[String] =
    Seq("table", "row", "value", "hash", "window", "spark", "query", "zz-absent")

  /** Content fingerprint of a dataset's source files — path plus (size,
    * mtime) of every file under each entry (recursing into directories in
    * sorted order), SHA-256 truncated to 8 bytes. Keys the bucketed-layout
    * cache so in-place regeneration of the testdata is a cache MISS, never
    * a stale re-attach.
    */
  private[graft] def layoutFingerprint(dir: String, entries: Seq[String]): String = {
    def walk(p: java.nio.file.Path): Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.sorted().toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path]).flatMap(walk)
        finally s.close()
      } else if (java.nio.file.Files.exists(p)) Seq(p)
      else Seq.empty
    val parts = entries.flatMap { e =>
      walk(java.nio.file.Paths.get(dir, e)).map { p =>
        s"$p:${java.nio.file.Files.size(p)}:" +
          s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
      }
    }
    java.security.MessageDigest.getInstance("SHA-256")
      .digest((dir + "|" + parts.mkString("|"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
  }

  /** Fingerprint-keyed one-time on-disk layout under `java.io.tmpdir`:
    * the amortized-artifact protocol p64 introduced, factored for every
    * layout the suite persists (IVFADC codes, the near-dup cluster
    * table). `build` writes into a PRIVATE staging dir; the commit is an
    * atomic rename gated by a marker file, and the whole build-or-adopt
    * decision holds an OS file lock (sibling .lock) so a concurrent
    * driver (bench + verify on one sf dir) can never interleave writes or
    * clean debris out from under a mid-commit writer. Readers past the
    * marker never take the lock — a committed layout is immutable.
    * Returns the committed dir.
    */
  /** In-JVM companion to the OS file lock below: `FileChannel.lock` only
    * BLOCKS across processes — a second thread in the SAME JVM gets an
    * `OverlappingFileLockException` instead of waiting (two concurrent
    * queries on one multi-session driver would crash, not queue). The
    * per-layout monitor serializes in-JVM racers; the file lock then
    * serializes across JVMs as before.
    */
  private val layoutMutexes =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def cachedLayout(name: String, digest: String)
                                   (build: java.nio.file.Path => Unit): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-$name-$digest")
    val marker = dir.resolve("_LAYOUT_OK")
    if (!java.nio.file.Files.exists(marker)) {
      val mutex = layoutMutexes.computeIfAbsent(s"$name-$digest", _ => new Object)
      mutex.synchronized { if (!java.nio.file.Files.exists(marker)) {
      val lockPath = dir.getParent.resolve(s"graft-$name-$digest.lock")
      val lockCh = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = lockCh.lock() // blocks until a competing driver commits
      try {
        if (!java.nio.file.Files.exists(marker)) {
          def discard(p: java.nio.file.Path): Unit =
            graft.ops.Fs.deleteRecursively(p)
          // marker absent UNDER THE LOCK = dir (if present) is debris
          // from an interrupted/crashed write — safe to clear
          if (java.nio.file.Files.exists(dir)) discard(dir)
          val staging = java.nio.file.Files.createTempDirectory(
            dir.getParent, s"graft-$name-$digest-stage")
          build(staging)
          java.nio.file.Files.writeString(staging.resolve("_LAYOUT_OK"), "ok")
          java.nio.file.Files.move(staging, dir,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } // else: a competing driver committed while we waited — adopt
      } finally {
        lock.release(); lockCh.close()
      }
      } } // mutex.synchronized + inner marker re-check
    }
    dir
  }

  /** The near-dup cluster table (doc, cluster, cluster_size), materialized
    * ONCE per corpus fingerprint through [[cachedLayout]] — the VERDICT r5
    * convergence item: p24, p63 and p70 all need the SAME clusters
    * (signatures → banding → pointer-jumping CC), and at 100 TB that
    * chain is the expensive half of the dedup pipeline. A real pipeline
    * materializes the cluster assignment once per corpus release and
    * every downstream consumer (keeper election, corpus cleaning, stats)
    * reads the artifact; re-deriving per query triples the dominant cost
    * for identical output. Layout changes only the COST of the answer —
    * the three oracles still recompute clusters from scratch.
    */
  private[queries] def ccClusterTable(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val digest = layoutFingerprint(d, Seq("documents.parquet"))
    val dir = cachedLayout("ccclusters", digest) { staging =>
      Dedup.nearDupClustersFromDocs(t(s, d, "documents"), "doc_id", "text",
          q = 5, k = 12, rowsPerBand = 3)
        .write.mode("overwrite").parquet(s"$staging/clusters")
    }
    s.read.parquet(s"$dir/clusters")
  }

  /** JVM-wide memo of the deterministic trained ANN models, keyed by the
    * embeddings table's CONTENT fingerprint: p19/p49/p62/p64/p65/p67/s13
    * all train the SAME coarse centroids (and the PQ family the same
    * codebooks) — training is deterministic (fixed init, fixed iters,
    * rounded means), so memoizing can change only the suite's cost, never
    * any result. The production analogue is the trained-model artifact a
    * pipeline stores next to its index (p64 persists exactly that); a
    * regenerated dataset is a fingerprint miss and retrains.
    */
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private[queries] def ivfModel(s: org.apache.spark.sql.SparkSession,
                                d: String): Array[Array[Double]] =
    modelCache.computeIfAbsent(
      s"ivf|${layoutFingerprint(d, Seq("embeddings.parquet"))}", _ => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfCentroids(emb, "vec_id", "embedding",
          k = ivfK(emb.count()), iters = 2)
      }).asInstanceOf[Array[Array[Double]]]

  private[queries] def pqModel(s: org.apache.spark.sql.SparkSession,
                               d: String): Array[Array[Array[Double]]] =
    modelCache.computeIfAbsent(
      s"pq|${layoutFingerprint(d, Seq("embeddings.parquet"))}", _ => {
        val emb = t(s, d, "embeddings")
        Similarity.pqCodebooks(emb, "vec_id", "embedding",
          m = 4, subDim = 16, k = 16, iters = 2)
      }).asInstanceOf[Array[Array[Array[Double]]]]

  /** Quality-aware keeper election over the near-dup clusters — the p63
    * verdict computation, shared with p70's cleaned-corpus materialization:
    * every document gets (doc_id, cluster, cluster_size, quality, keeper,
    * keep) where keep = 1 iff it is its cluster's highest-quality member
    * (doc-id tie-break on the 4-dp-rounded score). Singletons keep
    * themselves.
    */
  private def keeperVerdicts(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame = {
    val docs = t(s, d, "documents")
    // clusters come from the materialized per-corpus table, not a fresh
    // CC run — p24/p63/p70 share one signatures→banding→CC pass
    val clusters = ccClusterTable(s, d)
      .select(col("doc").as("doc_id"), col("cluster"), col("cluster_size"))
    val member = docs
      .select(col("doc_id"), round(TextOps.qualityScore(col("text")), 4).as("quality"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"), col("quality"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("quality").desc, col("doc_id"))
    member.withColumn("keeper", first(col("doc_id")).over(w))
      .withColumn("keep", (col("doc_id") === col("keeper")).cast("int"))
      .select(col("doc_id"), col("cluster"), col("cluster_size"), col("quality"),
        col("keeper"), col("keep"))
  }

  /** DuckDB mirror of [[keeperVerdicts]]' tail: CTEs `qual` (the p03
    * quality score), `m` (cluster-joined members) and `k` (keeper per
    * cluster), assuming `cl(doc_id, cluster, cluster_size)` is in scope
    * (from [[ccClusterCtes]]). Shared by p63 and p70.
    */
  private[queries] def keeperCtesSql: String = {
    val hitsEn = "len(list_filter(list_filter(string_split_regex(lower(text), " +
      s"'\\s+'), x -> len(x) > 0), t -> list_contains($StopEnSql, t)))"
    val nWords = "len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0))"
    s"""qual AS (
       |  SELECT doc_id,
       |    round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
       |      + (1.0 - least((CASE WHEN length(text) > 0
       |          THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
       |          ELSE 0.0 END) * 5.0, 1.0)) * 0.3
       |      + least((CASE WHEN $nWords > 0
       |          THEN CAST($hitsEn AS DOUBLE) / $nWords ELSE 0.0 END) * 4.0, 1.0) * 0.3,
       |      4) AS quality
       |  FROM documents),
       |m AS (
       |  SELECT qual.doc_id, COALESCE(cl.cluster, qual.doc_id) AS cluster,
       |    COALESCE(cl.cluster_size, 1) AS cluster_size, qual.quality
       |  FROM qual LEFT JOIN cl USING (doc_id)),
       |k AS (
       |  SELECT m.*, first_value(doc_id)
       |    OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) AS keeper
       |  FROM m)""".stripMargin
  }

  /** DuckDB mirror of Sampling.temperatureWeightsSqrt + mixEpochs
    * (salt "tmix"): per source (n_docs, permill, n_mixture). Shared by the
    * batch p69 and the streaming s15 — the mixture a stream materializes
    * on ingest must equal the batch mixture row for row.
    */
  private[queries] val temperatureMixOracleSql: String =
    """WITH n AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn FROM n),
      |r AS (SELECT source, n_docs,
      |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000) AS BIGINT) AS s
      |  FROM n),
      |sm AS (SELECT CAST(sum(s) AS BIGINT) AS ssum FROM r),
      |w AS (SELECT source, n_docs,
      |    CAST((2 * CAST(s AS HUGEINT) * nn * 1000 + CAST(n_docs AS HUGEINT) * ssum)
      |      // (2 * CAST(n_docs AS HUGEINT) * ssum)
      |      AS BIGINT) AS permill
      |  FROM r, tot, sm),
      |m AS (SELECT d.doc_id, d.source, w.permill,
      |    CAST(('0x' || substring(md5('tmix|' || CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 1000 AS b
      |  FROM documents d JOIN w USING (source)),
      |c AS (SELECT source,
      |    CAST(permill // 1000
      |      + CASE WHEN b < permill % 1000 THEN 1 ELSE 0 END AS BIGINT) AS n_copies
      |  FROM m)
      |SELECT w.source, w.n_docs, w.permill,
      |  CAST(coalesce(sum(c.n_copies), 0) AS BIGINT) AS n_mixture
      |FROM w LEFT JOIN c ON c.source = w.source
      |GROUP BY w.source, w.n_docs, w.permill
      |ORDER BY w.source""".stripMargin

  /** The k=12 per-seed minhash component expressions over a shingle list
    * `sh` — one text, shared by [[minhashCandidatesSql]] and the p66
    * signature mirror so the two can never drift.
    */
  private[queries] def minhashMinsSql: String =
    (0 until 12).map { seed =>
      s"list_min(list_transform(list_distinct(sh), " +
        s"x -> CAST(('0x' || substring(md5('$seed|' || x), 1, 15)) AS BIGINT)))"
    }.mkString(",\n      ")

  /** DuckDB mirror of Dedup.bandBuckets' interior (q=5, k=12,
    * rowsPerBand=3): CTEs `shl` (shingle lists), `sig` (k=12 signatures),
    * `bands` ((doc, band, bucket) rows). Shared by the p55 and s14
    * decontamination oracles.
    */
  private[queries] val bandCtesSql: String =
    s"""shl AS (
       |  SELECT doc_id AS doc,
       |    list_transform(generate_series(1, greatest(length(text) - 4, 1)),
       |                   i -> substring(text, i, 5)) AS sh
       |  FROM documents),
       |sig AS (
       |  SELECT doc, [
       |      $minhashMinsSql
       |    ] AS sig FROM shl),
       |bands AS (
       |  SELECT doc, u.band, u.bucket FROM (
       |    SELECT doc, unnest(list_transform(range(0, 4), b ->
       |      {'band': b, 'bucket': array_to_string(list_slice(sig, b * 3 + 1, b * 3 + 3), '#')})) AS u
       |    FROM sig))""".stripMargin

  /** DuckDB mirror of Dedup.minhashCandidates(q=5, k=12, rowsPerBand=3):
    * yields (a, b, n_bands). Shared by p04 and the p05 verification stage.
    */
  private[queries] val minhashCandidatesSql: String = {
    val mins = minhashMinsSql
    s"""WITH shl AS (
       |  SELECT doc_id AS doc,
       |    list_transform(generate_series(1, greatest(length(text) - 4, 1)),
       |                   i -> substring(text, i, 5)) AS sh
       |  FROM documents),
       |sig AS (
       |  SELECT doc, [
       |      $mins
       |    ] AS sig FROM shl),
       |bands AS (
       |  SELECT doc, u.band, u.bucket FROM (
       |    SELECT doc, unnest(list_transform(range(0, 4), b ->
       |      {'band': b, 'bucket': array_to_string(list_slice(sig, b * 3 + 1, b * 3 + 3), '#')})) AS u
       |    FROM sig))
       |SELECT l.doc AS a, r.doc AS b, CAST(count(*) AS BIGINT) AS n_bands
       |FROM bands l JOIN bands r
       |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc
       |GROUP BY l.doc, r.doc""".stripMargin
  }

  /** Unroll depth for the connected-components oracle: measured fixpoint is
    * 7 hook+jump rounds at sf0.01 and 4 at the sf1.0 stress fixture; 10
    * leaves headroom and the surplus rounds are cheap no-ops (each is two
    * joins over the already-converged label table). The in-oracle guard
    * below errors if the unroll is ever insufficient — under-convergence
    * can only fail loudly, never pass silently.
    */
  private[queries] final val CcOracleRounds = 10

  /** Connected components of the `cand(a, b)` near-dup candidate graph as
    * UNROLLED label propagation — the sf1.0-tractable replacement for the
    * former `WITH RECURSIVE` transitive-closure oracle (VERDICT r4 #4: the
    * closure materializes |cluster|² reach pairs, infeasible at 10×; label
    * propagation carries one label per node per round). Each round is one
    * "hook" (min over the closed neighborhood) and one "jump"
    * (lab := lab(lab) — labels are node ids, so the indirection is a
    * self-join), mirroring the Spark side's pointer-jumping CC. All stages
    * are MATERIALIZED: DuckDB inlines plain CTEs, and each round reads its
    * predecessor twice — un-materialized, the expansion is 2^rounds copies
    * of the candidate pipeline. Yields `cl(doc_id, cluster, cluster_size)`;
    * the CASE/error() guard makes a non-converged unroll a hard oracle
    * error rather than wrong clusters.
    */
  private[queries] def ccClusterCtes(rounds: Int): String = {
    val sb = Seq.newBuilder[String]
    sb += "edges AS MATERIALIZED (SELECT a AS x, b AS y FROM cand " +
      "UNION SELECT b AS x, a AS y FROM cand)"
    sb += "nodes AS MATERIALIZED (SELECT DISTINCT x AS node FROM edges)"
    sb += "l0 AS MATERIALIZED (SELECT node, node AS lab FROM nodes)"
    for (r <- 1 to rounds) {
      sb += s"h$r AS MATERIALIZED (SELECT node, min(lab) AS lab FROM (" +
        s"SELECT node, lab FROM l${r - 1} UNION ALL " +
        s"SELECT e.x AS node, l.lab FROM edges e JOIN l${r - 1} l ON l.node = e.y" +
        s") GROUP BY node)"
      sb += s"l$r AS MATERIALIZED (SELECT a.node, min(b.lab) AS lab " +
        s"FROM h$r a JOIN h$r b ON b.node = a.lab GROUP BY a.node)"
    }
    sb += s"conv AS MATERIALIZED (SELECT count(*) AS n_changed " +
      s"FROM l${rounds - 1} a JOIN l$rounds b " +
      s"ON a.node = b.node AND a.lab <> b.lab)"
    sb += "cl AS MATERIALIZED (SELECT doc_id, cluster, " +
      "CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size " +
      "FROM (SELECT node AS doc_id, CASE WHEN (SELECT n_changed FROM conv) > 0 " +
      s"THEN CAST(error('cc oracle: not converged in $rounds rounds " +
      "- raise CcOracleRounds') AS BIGINT) ELSE lab END AS cluster " +
      s"FROM l$rounds))"
    sb.result().mkString(",\n")
  }

  /** DuckDB mirror of TextOps.bpeMerges' training loop: WITH-clause stages
    * wfreq, s1..s{n+1}, p1..pn (weighted pair counts), t1..tn (winning
    * pair per iteration). Shared by p36 (emit the merge table) and p37
    * (apply it).
    */
  private[queries] def bpeTrainCtes(n: Int, byteLevel: Boolean = false): String = {
    // char alphabet: one symbol per character; byte alphabet (p135):
    // 2-hex-digit UTF-8 byte codes — mirrors TextOps.byteSymbols
    val sym =
      if (byteLevel) "array_to_string(regexp_extract_all(hex(encode(w)), '..'), '  ')"
      else "array_to_string(regexp_extract_all(w, '.'), '  ')"
    val stages = new StringBuilder
    stages ++=
      s"""WITH wfreq AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS wf FROM (
         |    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |                              x -> len(x) > 0)) AS w
         |    FROM documents) GROUP BY w),
         |s1 AS (SELECT wf, $sym AS seq
         |       FROM wfreq)""".stripMargin
    for (i <- 1 to n) {
      stages ++=
        s""",
           |p$i AS (SELECT g, sum(wf) AS c FROM (
           |    SELECT wf, unnest(CASE WHEN len(l) >= 2
           |      THEN list_transform(range(1, len(l)), j -> l[j] || ' ' || l[j+1])
           |      ELSE CAST([] AS VARCHAR[]) END) AS g
           |    FROM (SELECT wf, string_split(seq, '  ') AS l FROM s$i))
           |  GROUP BY g),
           |t$i AS (SELECT g, c FROM p$i ORDER BY c DESC, g LIMIT 1),
           |s${i + 1} AS (SELECT wf, trim(replace(' ' || seq || ' ',
           |  (SELECT ' ' || replace(g, ' ', '  ') || ' ' FROM t$i),
           |  (SELECT ' ' || replace(g, ' ', '') || ' ' FROM t$i))) AS seq
           |  FROM s$i)""".stripMargin
    }
    stages.toString
  }

  def defs: Seq[QueryDef] = Seq(

    // -- exact dedup: content digest + keeper election ----------------------
    QueryDef("p01_exact_dedup",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"digest")
        t(s, d, "documents")
          .select($"doc_id", md5($"text").as("digest"))
          .withColumn("keeper", min($"doc_id").over(w))
          .withColumn("is_dup", ($"doc_id" =!= $"keeper").cast("int"))
          .select($"doc_id", $"digest", $"keeper", $"is_dup")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(text) AS digest,
             |  min(doc_id) OVER (PARTITION BY md5(text)) AS keeper,
             |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // -- token / punctuation statistics ------------------------------------
    QueryDef("p02_text_stats",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select($"doc_id",
            TextOps.wordCount($"text").as("n_words"),
            TextOps.bpeishTokenCount($"text").as("n_bpeish"),
            TextOps.punctCount($"text").as("n_punct"),
            round(TextOps.punctRatio($"text"), 4).as("punct_ratio"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_words,
             |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish,
             |  length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
             |  round(CASE WHEN length(text) > 0
             |    THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text)
             |    ELSE 0.0 END, 4) AS punct_ratio
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // -- language ID + quality score ---------------------------------------
    QueryDef("p03_langid_quality",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select($"doc_id",
            TextOps.langId($"text").as("lang_id"),
            round(TextOps.qualityScore($"text"), 4).as("quality"))
          .orderBy($"doc_id")
      },
      Some {
        def hits(words: Seq[String]) = {
          val arr = words.mkString("['", "', '", "']")
          s"len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0), t -> list_contains($arr, t)))"
        }
        val en = hits(TextOps.StopwordsEn); val de = hits(TextOps.StopwordsDe)
        val es = hits(TextOps.StopwordsEs); val fr = hits(TextOps.StopwordsFr)
        s"""WITH scored AS (
           |  SELECT doc_id, text,
           |    $en AS hits_en, $de AS hits_de, $es AS hits_es, $fr AS hits_fr,
           |    len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS n_words,
           |    CASE WHEN length(text) > 0
           |      THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
           |      ELSE 0.0 END AS punct_ratio
           |  FROM documents)
           |SELECT doc_id,
           |  CASE WHEN greatest(hits_en, hits_de, hits_es, hits_fr) = 0 THEN 'und'
           |    WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
           |    WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
           |    WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
           |    ELSE 'fr' END AS lang_id,
           |  round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
           |    + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3
           |    + least((CASE WHEN n_words > 0 THEN CAST(hits_en AS DOUBLE) / n_words ELSE 0.0 END) * 4.0, 1.0) * 0.3,
           |    4) AS quality
           |FROM scored ORDER BY doc_id""".stripMargin
      }),

    // -- MinHash + LSH candidate pairs (q=5-gram, k=12 hashes, 4 bands of 3)
    QueryDef("p04_minhash_lsh",
      (s, d) => Dedup.minhashCandidates(t(s, d, "documents"), "doc_id", "text",
          q = 5, k = 12, rowsPerBand = 3)
        .orderBy(col("a"), col("b")),
      Some(minhashCandidatesSql + "\nORDER BY a, b")),

    // -- LSH-gated exact Jaccard (candidates -> verify, the scale pipeline) -
    QueryDef("p05_ngram_jaccard",
      (s, d) => Dedup.lshJaccard(t(s, d, "documents"), "doc_id", "text",
          q = 5, k = 12, rowsPerBand = 3, threshold = 0.0)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH cand AS ($minhashCandidatesSql),
             |shd AS (
             |  SELECT doc_id AS doc, list_transform(list_distinct(
             |    list_transform(generate_series(1, greatest(length(text) - 4, 1)),
             |                   i -> substring(text, i, 5))),
             |    x -> CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)) AS shingles
             |  FROM documents)
             |SELECT a, b, n_bands,
             |  round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
             |    (len(sa.shingles) + len(sb.shingles)
             |     - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
             |FROM cand
             |JOIN shd sa ON sa.doc = a
             |JOIN shd sb ON sb.doc = b
             |ORDER BY a, b""".stripMargin)),

    // -- brute-force cosine top-k ANN baseline ------------------------------
    QueryDef("p06_brute_topk",
      (s, d) => Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 5, dim = Some(64))
        .orderBy(col("qid"), col("rank")),
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
             |          FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec FROM embeddings)
             |SELECT qid, CAST(row_number() OVER w AS INT) AS rank, nid,
             |  round(list_cosine_similarity(qvec, nvec), 4) AS sim
             |FROM c CROSS JOIN q WHERE qid <> nid
             |  AND NOT isnan(round(list_cosine_similarity(qvec, nvec), 4))
             |WINDOW w AS (PARTITION BY qid
             |             ORDER BY round(list_cosine_similarity(qvec, nvec), 4) DESC, nid)
             |QUALIFY row_number() OVER w <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // -- bucketed ANN (IVF-style cell = label column) -----------------------
    QueryDef("p07_bucketed_ann",
      (s, d) => Similarity.bucketedTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          "label", col("vec_id") < 20, k = 3, dim = Some(64))
        .orderBy(col("qid"), col("rank")),
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qbucket
             |          FROM embeddings WHERE vec_id < 20),
             |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec, label AS nbucket
             |      FROM embeddings)
             |SELECT qid, CAST(row_number() OVER w AS INT) AS rank, nid,
             |  round(list_cosine_similarity(qvec, nvec), 4) AS sim
             |FROM c JOIN q ON qbucket = nbucket WHERE qid <> nid
             |  AND NOT isnan(round(list_cosine_similarity(qvec, nvec), 4))
             |WINDOW w AS (PARTITION BY qid
             |             ORDER BY round(list_cosine_similarity(qvec, nvec), 4) DESC, nid)
             |QUALIFY row_number() OVER w <= 3
             |ORDER BY qid, rank""".stripMargin)),

    // -- k-min digest fingerprint (winnowing-style document sketch) --------
    QueryDef("p08_fingerprint",
      (s, d) => {
        import s.implicits._
        val sh = Dedup.shinglesExpr("text", 8)
        t(s, d, "documents")
          .select($"doc_id",
            concat_ws("#", slice(array_sort(transform(array_distinct(sh), x => md5(x))),
              1, 4)).as("fingerprint"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  array_to_string(list_slice(list_sort(
             |    list_transform(list_distinct(
             |      list_transform(generate_series(1, greatest(length(text) - 7, 1)),
             |                     i -> substring(text, i, 8))),
             |      x -> md5(x))), 1, 4), '#') AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // -- 16-bit SimHash over whitespace tokens ------------------------------
    QueryDef("p09_simhash",
      (s, d) => {
        import s.implicits._
        val tok = t(s, d, "documents")
          .select($"doc_id", explode(TextOps.tokens(lower($"text"))).as("tok"))
          .withColumn("h", conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long"))
        val votes = (0 until 16).map(b =>
          sum(shiftright($"h", b) % 2 * 2 - 1).as(s"v$b"))
        val agg = tok.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
        val simhash = (0 until 16).map(b =>
          when(col(s"v$b") > 0, 1L << b).otherwise(0L)).reduce(_ + _)
        agg.select($"doc_id", simhash.as("simhash")).orderBy($"doc_id")
      },
      Some {
        val votes = (0 until 16).map(b =>
          s"sum(((h >> $b) % 2) * 2 - 1) AS v$b").mkString(",\n    ")
        val bits = (0 until 16).map(b =>
          s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
        s"""WITH tok AS (
           |  SELECT doc_id, CAST(('0x' || substring(md5(t.tok), 1, 15)) AS BIGINT) AS h
           |  FROM (SELECT doc_id, unnest(list_filter(
           |          string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS tok
           |        FROM documents) t),
           |agg AS (
           |  SELECT doc_id,
           |    $votes
           |  FROM tok GROUP BY doc_id)
           |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
           |FROM agg ORDER BY doc_id""".stripMargin
      }),

    // -- hyperplane-LSH ANN: random-projection sign buckets -----------------
    QueryDef("p13_lsh_ann",
      (s, d) => {
        val emb = t(s, d, "embeddings")
          .withColumn("sig", Similarity.hyperplaneSignature(col("embedding"), dim = 64, nBits = 8))
        Similarity.bucketedTopK(emb, "vec_id", "embedding", "sig",
            col("vec_id") < 50, k = 3, dim = Some(64))
          .orderBy(col("qid"), col("rank"))
      },
      Some {
        val sigExpr = Similarity.hyperplaneWeights(dim = 64, nBits = 8).map { w =>
          s"(CASE WHEN list_dot_product(embedding::DOUBLE[], [${w.mkString(", ")}]) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH sigs AS (
           |  SELECT vec_id, embedding, $sigExpr AS sig FROM embeddings),
           |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, sig AS qbucket
           |      FROM sigs WHERE vec_id < 50),
           |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nvec, sig AS nbucket FROM sigs)
           |SELECT qid, CAST(row_number() OVER w AS INT) AS rank, nid,
           |  round(list_cosine_similarity(qvec, nvec), 4) AS sim
           |FROM c JOIN q ON qbucket = nbucket WHERE qid <> nid
           |  AND NOT isnan(round(list_cosine_similarity(qvec, nvec), 4))
           |WINDOW w AS (PARTITION BY qid
           |             ORDER BY round(list_cosine_similarity(qvec, nvec), 4) DESC, nid)
           |QUALIFY row_number() OVER w <= 3
           |ORDER BY qid, rank""".stripMargin
      }),

    // -- embedding-cosine near-dup: LSH buckets -> native cosine_sim verify -
    // (threshold is data-relative: the synthetic embeddings top out at
    // ~0.51 pairwise cosine, so 0.3 exercises a non-trivial survivor set;
    // a production near-dup run would use ~0.9 over the same plan)
    QueryDef("p15_embed_neardup",
      (s, d) => Similarity.nearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
          dim = 64, nBits = 4, threshold = 0.3)
        .orderBy(col("a"), col("b")),
      Some {
        val sigExpr = Similarity.hyperplaneWeights(dim = 64, nBits = 4).map { w =>
          s"(CASE WHEN list_dot_product(embedding::DOUBLE[], [${w.mkString(", ")}]) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH sigs AS (
           |  SELECT vec_id, embedding, $sigExpr AS sig FROM embeddings),
           |pairs AS (
           |  SELECT s1.vec_id AS a, s2.vec_id AS b,
           |    round(list_cosine_similarity(s1.embedding::DOUBLE[],
           |                                 s2.embedding::DOUBLE[]), 4) AS sim
           |  FROM sigs s1 JOIN sigs s2 ON s1.sig = s2.sig AND s1.vec_id < s2.vec_id)
           |SELECT a, b, sim FROM pairs WHERE sim >= 0.3 ORDER BY a, b""".stripMargin
      }),

    // -- skew-safe aggregation: two-phase salted agg, exact vs plain oracle -
    QueryDef("p14_salted_agg",
      (s, d) => {
        import s.implicits._
        graft.ops.Skew.saltedAgg(t(s, d, "lineitem"), "l_returnflag", "l_quantity")
          .select($"l_returnflag", round($"sum_l_quantity", 4).as("sum_qty"), $"n")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
             |count(*) AS n FROM lineitem
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // -- binary-column plumbing: opaque blobs + typed metadata --------------
    QueryDef("p10_binary_meta",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select($"doc_id", encode($"text", "UTF-8").as("blob"), $"lang")
          .select($"doc_id", length($"blob").as("n_bytes"),
            md5($"blob").as("content_digest"), $"lang")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS content_digest, lang
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // -- deterministic stratified sampling + split assignment ---------------
    // Hash-bucket sampling, not rand(): reproducible across runs/engines and
    // a pure per-row filter — no shuffle at any corpus size (ops/Sampling).
    QueryDef("p16_stratified_sample",
      (s, d) => {
        import s.implicits._
        val sampled = graft.ops.Sampling.stratifiedSample(t(s, d, "documents"),
          "doc_id", "lang", Map("en" -> 400, "de" -> 200, "es" -> 200, "fr" -> 200),
          defaultPermill = 100, salt = "s16")
        graft.ops.Sampling.assignSplit(sampled, "doc_id", salt = "sp16")
          .select($"doc_id", $"lang", $"bucket", $"split")
          .orderBy($"doc_id")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, lang,
             |    CAST(('0x' || substring(md5('s16|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket,
             |    CAST(('0x' || substring(md5('sp16|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS b2
             |  FROM documents)
             |SELECT doc_id, lang, bucket,
             |  CASE WHEN b2 < 800 THEN 'train' WHEN b2 < 900 THEN 'val' ELSE 'test' END AS split
             |FROM b
             |WHERE bucket < (CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 200
             |                WHEN 'es' THEN 200 WHEN 'fr' THEN 200 ELSE 100 END)
             |ORDER BY doc_id""".stripMargin)),

    // -- per-stratum corpus statistics: exact interpolated quantiles --------
    // `percentile` is the exact per-group sort; at petabyte scale the same
    // plan takes approx_percentile (a mergeable KLL-style sketch) with only
    // the function name changing — the groupBy shape already map-side
    // combines.
    QueryDef("p17_corpus_stats",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            round(avg($"n_chars"), 4).as("avg_chars"),
            round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
            round(expr("percentile(n_chars, 0.95)"), 4).as("p95_chars"),
            round(expr("percentile(n_chars, 0.99)"), 4).as("p99_chars"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
             |  round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
             |  round(quantile_cont(n_chars, 0.95), 4) AS p95_chars,
             |  round(quantile_cont(n_chars, 0.99), 4) AS p99_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // -- corpus vocabulary: global top-k tokens -----------------------------
    // The explode+count aggregate map-side combines (HashAggregate); the
    // single-partition window runs over the already-aggregated vocab slice
    // ordered for the top-k — the only stage that is not width-parallel, and
    // it sees k-bounded data, not the corpus.
    QueryDef("p18_vocab_topk",
      (s, d) => {
        import s.implicits._
        val toks = t(s, d, "documents")
          .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("token"))
          .filter(length($"token") > 0)
        // persisted: both the top-k aggregate and the n_docs re-join read
        // this subtree — uncached, the vocabulary-sized final aggregation
        // (including the countDistinct merge) would run twice
        val vocab = toks.groupBy($"token")
          .agg(count(lit(1)).as("n_occurrences"),
            countDistinct($"doc_id").as("n_docs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // global top-k via the bounded TopKMinPairs aggregate (score =
        // -count so asc = most frequent; string ids tie-break in binary
        // order, matching the oracle's ORDER BY). A row_number() window
        // here would pull the ENTIRE vocabulary through one reducer — at
        // web scale that is 10^8+ terms; the aggregate ships <= 15 pairs
        // per map task. The 15 winners then re-join vocab (broadcast) to
        // pick up n_docs.
        val top = vocab
          .agg(graft.functions.TopKMinPairs(s, -$"n_occurrences", $"token", 15).as("tk"))
          .select(posexplode($"tk"))
          .select((col("pos") + 1).cast("int").as("rank"), $"col.id".as("token"))
        vocab.join(broadcast(top), "token")
          .select($"rank", $"token", $"n_occurrences", $"n_docs")
          .orderBy($"rank")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
             |  FROM documents),
             |vocab AS (
             |  SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             |  FROM toks GROUP BY token)
             |SELECT CAST(row_number() OVER w AS INT) AS rank, token, n_occurrences, n_docs
             |FROM vocab
             |WINDOW w AS (ORDER BY n_occurrences DESC, token)
             |QUALIFY row_number() OVER w <= 15
             |ORDER BY rank""".stripMargin)),

    // -- benchmark contamination: word-8-gram overlap vs an eval split ------
    // The GPT-3-style decontamination primitive: every train document is
    // scored by the fraction of its distinct 8-word shingles that appear in
    // ANY eval-set document. Scale shape: the eval shingle set is tiny →
    // broadcast left join against the train shingle stream; the per-doc
    // aggregation partial-aggregates map-side. No corpus-wide shuffle of
    // text ever happens.
    QueryDef("p20_contamination",
      (s, d) => {
        import s.implicits._
        // single-file corpus parquet = one partition; spread the per-row
        // shingling cost across cores before exploding
        val sh = t(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .select($"doc_id", explode(TextOps.wordShingles($"text", 8)).as("g"))
        val ev = sh.filter($"doc_id" % 97 === 0).select($"g").distinct()
          .withColumn("hit", lit(1))
        sh.filter($"doc_id" % 97 =!= 0)
          .join(broadcast(ev), Seq("g"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce($"hit", lit(0))).cast("long").as("n_contaminated"))
          .withColumn("contamination_rate",
            round($"n_contaminated".cast("double") / $"n_shingles", 4))
          .orderBy($"doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS w
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 8 THEN
             |      list_transform(generate_series(1, len(w) - 7),
             |                     i -> array_to_string(list_slice(w, i, i + 7), ' '))
             |    ELSE CAST([] AS VARCHAR[]) END) AS s
             |  FROM w),
             |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
             |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
             |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             |  CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
             |  round(CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |        / count(*), 4) AS contamination_rate
             |FROM tr LEFT JOIN ev ON tr.g = ev.g
             |GROUP BY tr.doc_id
             |ORDER BY tr.doc_id""".stripMargin)),

    // -- TF-IDF keyword extraction: corpus DF + per-doc top-3 terms ---------
    // Two hash aggregations (term frequency, document frequency — both
    // partial-aggregate map-side), a broadcast join of the vocab-sized DF
    // table back onto TF, and one per-doc window over the filtered slice.
    // The rounded tfidf + token tie-break is the cross-engine ordering
    // contract (same discipline as p19's rounded argmin).
    QueryDef("p21_tfidf",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val nDocs = docs.count().toDouble
        val toks = docs
          .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("token"))
          .filter(length($"token") > 0)
        val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
        val dfT = toks.groupBy($"token")
          .agg(countDistinct($"doc_id").as("df"))
        val scored = tf.join(broadcast(dfT), "token")
          .filter($"doc_id" < 30)
          .withColumn("tfidf", round($"tf" * log(lit(nDocs) / $"df"), 4))
        val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"token")
        scored.withColumn("rank", row_number().over(w).cast("int"))
          .filter($"rank" <= 3)
          .select($"doc_id", $"rank", $"token", $"tf", $"df", $"tfidf")
          .orderBy($"doc_id", $"rank")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
             |  FROM documents),
             |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             |       FROM toks GROUP BY doc_id, token),
             |df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |       FROM toks GROUP BY token),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
             |scored AS (
             |  SELECT doc_id, token, tf, df, round(tf * ln(n.n / df), 4) AS tfidf
             |  FROM tf JOIN df USING (token), n WHERE doc_id < 30)
             |SELECT doc_id, CAST(row_number() OVER w AS INT) AS rank, token, tf, df, tfidf
             |FROM scored
             |WINDOW w AS (PARTITION BY doc_id ORDER BY tfidf DESC, token)
             |QUALIFY row_number() OVER w <= 3
             |ORDER BY doc_id, rank""".stripMargin)),

    // -- Z-order layout: multi-column clustering for scan pruning -----------
    // Morton-interleave two key columns (pure codegen'd integer math) and
    // bucket by z-prefix: every bucket is a bounded RECTANGLE in
    // (custkey, orderkey) space — the property that makes parquet min/max
    // row-group stats selective for predicates on EITHER column after a
    // Layout.clusterByZ write. The oracle recomputes the interleave from
    // the same generated bit expression.
    QueryDef("p25_zorder_layout",
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
          .select(($"o_custkey" % 1024).cast("long").as("ck"),
            ($"o_orderkey" % 1024).cast("long").as("ok"))
        o.withColumn("z", graft.ops.Layout.zOrder2($"ck", $"ok", bits = 10))
          .withColumn("bucket", shiftright($"z", 14))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            min($"ck").as("min_ck"), max($"ck").as("max_ck"),
            min($"ok").as("min_ok"), max($"ok").as("max_ok"))
          .orderBy($"bucket")
      },
      Some(s"""WITH m AS (
              |  SELECT o_custkey % 1024 AS ck, o_orderkey % 1024 AS ok FROM orders),
              |z AS (SELECT ck, ok, ${graft.ops.Layout.zOrder2Sql("ck", "ok", 10)} AS z FROM m)
              |SELECT z >> 14 AS bucket, CAST(count(*) AS BIGINT) AS n,
              |  min(ck) AS min_ck, max(ck) AS max_ck,
              |  min(ok) AS min_ok, max(ok) AS max_ok
              |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // -- near-dup clusters: LSH pairs -> connected components -> keeper -----
    // The end of the dedup pipeline: candidate pairs induce clusters,
    // min-label propagation (one join + one HashAggregate per round, rounds
    // = cluster diameter) finds them, the minimum doc id is the canonical
    // keeper. DuckDB mirrors with a recursive transitive-closure CTE —
    // fine at oracle scale, quadratic in cluster size at real scale, which
    // is exactly why the Spark side iterates instead.
    QueryDef("p24_neardup_clusters",
      (s, d) => ccClusterTable(s, d).orderBy(col("doc")),
      Some(s"""WITH cand AS MATERIALIZED ($minhashCandidatesSql),
              |${ccClusterCtes(CcOracleRounds)}
              |SELECT doc_id AS doc, cluster, cluster_size
              |FROM cl ORDER BY doc""".stripMargin)),

    // -- quality-aware near-dup keeper election -----------------------------
    // The production variant of p24's min-id keeper: inside each near-dup
    // cluster, KEEP the member with the highest quality score (doc-id
    // tie-break on the 4-dp-rounded value both engines share — the p03
    // contract), drop the rest. Singleton docs keep themselves. The
    // election is one per-cluster window, bounded by cluster size.
    QueryDef("p63_quality_keeper",
      (s, d) => keeperVerdicts(s, d)
        .orderBy(col("doc_id")),
      Some {
        s"""WITH cand AS MATERIALIZED ($minhashCandidatesSql),
           |${ccClusterCtes(CcOracleRounds)},
           |$keeperCtesSql
           |SELECT doc_id, cluster, cluster_size, quality, keeper,
           |  CAST(doc_id = keeper AS INT) AS keep
           |FROM k ORDER BY doc_id""".stripMargin
      }),

    // -- int8 embedding quantization + reconstruction quality ---------------
    // Per-vector symmetric int8: scale = max|v|/127, q_i = floor(v/scale +
    // 0.5) (floor(+0.5) IS the cross-engine rounding contract — engines
    // disagree on round()'s half-away/half-even at .5), dequant = q*scale.
    // Pure per-row expressions — scan-parallel at any corpus size; the
    // compact HOF kernels keep codegen method sizes bounded (the unrolled
    // form recompiles 4000-node methods per literal change).
    QueryDef("p23_embed_quantize",
      (s, d) => {
        import s.implicits._
        val base = t(s, d, "embeddings").filter($"vec_id" < 100)
          .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
        // NB: the output alias must not collide with the raw column —
        // Spark's lateral column aliases would resolve the $"..." refs in
        // the LATER select expressions to the already-rounded alias
        val withScale = base.withColumn("scale_raw",
          aggregate($"v", lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0)
        val withQ = withScale.withColumn("q",
          when($"scale_raw" > 0,
            transform($"v", x => floor(x / $"scale_raw" + lit(0.5)).cast("double")))
            .otherwise(transform($"v", x => lit(0.0))))
        withQ.select($"vec_id",
          round($"scale_raw", 6).as("scale"),
          round(aggregate(zip_with($"v", $"q",
              (a, b) => (a - b * $"scale_raw") * (a - b * $"scale_raw")),
            lit(0.0), _ + _) / size($"v") * 1e6, 2).as("mse_ppm"),
          round(
            aggregate(zip_with($"v", $"q", _ * _), lit(0.0), _ + _) /
              (sqrt(aggregate(transform($"v", x => x * x), lit(0.0), _ + _)) *
               sqrt(aggregate(transform($"q", x => x * x), lit(0.0), _ + _))),
            4).as("cos_sim"))
          .orderBy($"vec_id")
      },
      Some("""WITH base AS (
             |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 100),
             |sc AS (
             |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |  FROM base),
             |qt AS (
             |  SELECT vec_id, v, scale,
             |    CASE WHEN scale > 0 THEN list_transform(v, x -> floor(x / scale + 0.5))
             |         ELSE list_transform(v, x -> 0.0) END AS q
             |  FROM sc)
             |SELECT vec_id, round(scale, 6) AS scale,
             |  round(list_sum(list_transform(range(1, 65),
             |      i -> (v[i] - q[i] * scale) * (v[i] - q[i] * scale))) / len(v) * 1e6, 2) AS mse_ppm,
             |  round(list_sum(list_transform(range(1, 65), i -> v[i] * q[i])) /
             |    (sqrt(list_sum(list_transform(v, x -> x * x))) *
             |     sqrt(list_sum(list_transform(q, x -> x * x)))), 4) AS cos_sim
             |FROM qt ORDER BY vec_id""".stripMargin)),

    // -- SQL-first pipeline surface: Spark 4 SQL UDF macros -----------------
    // The text primitives exposed as SQL functions (CREATE FUNCTION ...
    // RETURN <expr> — Catalyst inlines the body, so these stay codegen'd
    // macros, NOT black-box UDFs). Per-row equivalence with the Column
    // forms is part of the result; the DuckDB oracle pins `equiv` to true,
    // so any drift between the two surfaces hash-fails the driver gate.
    QueryDef("p22_sql_pipeline",
      (s, d) => {
        import s.implicits._
        val stopEn = TextOps.StopwordsEn.mkString("array('", "', '", "')")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_word_count(t STRING)
                |RETURNS INT
                |RETURN size(filter(split(t, '\\s+'), x -> length(x) > 0))""".stripMargin)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_bpeish_tokens(t STRING)
                |RETURNS INT
                |RETURN size(regexp_extract_all(t, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]', 0))""".stripMargin)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_punct_ratio(t STRING)
                |RETURNS DOUBLE
                |RETURN CASE WHEN length(t) > 0
                |  THEN CAST(length(regexp_replace(t, '[A-Za-z0-9\\s]', '')) AS DOUBLE) / length(t)
                |  ELSE 0.0D END""".stripMargin)
        s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_stopword_hits_en(t STRING)
                 |RETURNS INT
                 |RETURN size(filter(filter(split(lower(t), '\\\\s+'), x -> length(x) > 0),
                 |  x -> array_contains($stopEn, x)))""".stripMargin)
        t(s, d, "documents").createOrReplaceTempView("documents_sql")
        val viaSql = s.sql(
          """SELECT doc_id, text,
            |  graft_word_count(text) AS n_words,
            |  graft_bpeish_tokens(text) AS n_bpeish,
            |  round(graft_punct_ratio(text), 4) AS punct_ratio,
            |  graft_stopword_hits_en(text) AS hits_en
            |FROM documents_sql WHERE doc_id < 200""".stripMargin)
        viaSql
          .withColumn("equiv",
            $"n_words" === TextOps.wordCount($"text") &&
            $"n_bpeish" === TextOps.bpeishTokenCount($"text") &&
            $"punct_ratio" === round(TextOps.punctRatio($"text"), 4) &&
            $"hits_en" === TextOps.stopwordCount($"text"))
          .select($"doc_id", $"n_words", $"n_bpeish", $"punct_ratio", $"hits_en", $"equiv")
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
              |  len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS n_words,
              |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish,
              |  round(CASE WHEN length(text) > 0
              |    THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
              |    ELSE 0.0 END, 4) AS punct_ratio,
              |  len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0),
              |      x -> list_contains($StopEnSql, x))) AS hits_en,
              |  true AS equiv
              |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // -- real IVF ANN: trained centroids (2 Lloyd steps), nprobe=2 ----------
    // Unlike p07 (label-proxy cells), the cells here are LEARNED from the
    // data: deterministic init (first 8 vectors), two distributed Lloyd
    // iterations (assignment = per-row expression, means = one
    // HashAggregate), then each query probes its 2 nearest cells. The
    // rounded-distance argmin (round(d², 6), ties to the lowest cell) is
    // the cross-engine stability contract with the DuckDB mirror.
    QueryDef("p19_ivf_ann",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cents = ivfModel(s, d)
        Similarity.ivfTopK(emb, "vec_id", "embedding", cents, nprobe = 2,
          col("vec_id") < 50, k = 3, dim = Some(64))
          .orderBy(col("qid"), col("rank"))
      },
      Some {
        s"""$ivfCorpusCtes,
           |q AS (SELECT qid, qvec, cell FROM (
           |    SELECT b.vec_id AS qid, b.e AS qvec, c.cell,
           |      row_number() OVER (PARTITION BY b.vec_id ORDER BY $ivfD2, c.cell) AS rn
           |    FROM base b CROSS JOIN c2 c WHERE b.vec_id < 50)
           |  WHERE rn <= 2)
           |SELECT qid, CAST(row_number() OVER w AS INT) AS rank, n.vec_id AS nid,
           |  round(list_cosine_similarity(qvec, n.e), 4) AS sim
           |FROM corp n JOIN q USING (cell)
           |WHERE qid <> n.vec_id
           |WINDOW w AS (PARTITION BY qid
           |             ORDER BY round(list_cosine_similarity(qvec, n.e), 4) DESC, n.vec_id)
           |QUALIFY row_number() OVER w <= 3
           |ORDER BY qid, rank""".stripMargin
      }),

    // -- SemDeDup: embedding-cluster semantic dedup (Abbas et al. 2023) ----
    // Same trained cells as p19; within-cell pairs at rounded cosine >= 0.3
    // (data-relative, see p15) drop the higher id. The pair join keys on
    // the cell — cluster-local quadratic, the SemDeDup cost model — and the
    // kept flag is a broadcast-able anti-join in production (left join +
    // null test here so every vector reports its verdict).
    QueryDef("p49_semdedup",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cents = ivfModel(s, d)
        Similarity.semDedup(emb, "vec_id", "embedding", cents,
            threshold = 0.3, dim = Some(64))
          .orderBy(col("vec_id"))
      },
      Some {
        s"""$ivfCorpusCtes,
           |drops AS (
           |  SELECT DISTINCT s2.vec_id
           |  FROM corp s1 JOIN corp s2 USING (cell)
           |  WHERE s1.vec_id < s2.vec_id
           |    AND round(list_cosine_similarity(s1.e, s2.e), 4) >= 0.3)
           |SELECT c.vec_id, CAST(c.cell AS INTEGER) AS cell,
           |       d.vec_id IS NULL AS kept
           |FROM corp c LEFT JOIN drops d ON c.vec_id = d.vec_id
           |ORDER BY c.vec_id""".stripMargin
      }),

    // -- bucketed co-located join: the zero-shuffle fact-fact join ---------
    // The 100 TB pattern the relational suite's broadcast joins can't cover:
    // when BOTH sides are large, pre-bucketing by the join key (Spark
    // bucketBy → parquet data-source tables) makes every subsequent join and
    // aggregation on that key shuffle-free — the physical plan has ZERO
    // Exchange nodes below the final rollup (PlanSpec "bucketed join plans
    // with no exchange" asserts this on the plan; here the driver checks the
    // VALUES against a plain-join DuckDB oracle — bucketing is physical
    // layout, so results must be identical). The one-time bucketed write is
    // the amortized cost a real pipeline pays once per table, not per query.
    // Revenue goes through the exact-integer path (per-row cents, BIGINT
    // sum) for engine-order-independence.
    QueryDef("p50_bucketed_join",
      (s, d) => {
        // layout cache keyed by the dataset CONTENT fingerprint (path +
        // size + mtime of every source file): the bucketed copy is written
        // ONCE per dataset (the amortized contract), later runs re-attach
        // the existing files as bucketed external tables via DDL.
        // Path-only keying would serve a STALE layout after the dataset is
        // regenerated in place — the fingerprint makes regeneration an
        // automatic cache miss (OpsSpec "bucketed layout fingerprint").
        val digest = layoutFingerprint(d, Seq("orders.parquet", "lineitem.parquet"))
        val dir = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), s"graft-bucketed-$digest")
        val marker = dir.resolve("_BUCKETS_OK")
        s.sql("DROP TABLE IF EXISTS graft_b_orders")
        s.sql("DROP TABLE IF EXISTS graft_b_lineitem")
        if (!java.nio.file.Files.exists(marker)) {
          // overwrite: a run that crashed after writing part files but
          // before the marker must not double up rows on retry
          t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
            .write.format("parquet").mode("overwrite")
            .option("path", s"$dir/orders")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable("graft_b_orders")
          t(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
            .write.format("parquet").mode("overwrite")
            .option("path", s"$dir/lineitem")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable("graft_b_lineitem")
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.writeString(marker, "ok")
        } else {
          s.sql(s"""CREATE TABLE graft_b_orders (o_orderkey BIGINT,
                   |  o_orderpriority STRING) USING parquet
                   |CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey)
                   |INTO 8 BUCKETS LOCATION '$dir/orders'""".stripMargin)
          s.sql(s"""CREATE TABLE graft_b_lineitem (l_orderkey BIGINT,
                   |  l_extendedprice DOUBLE, l_discount DOUBLE) USING parquet
                   |CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey)
                   |INTO 8 BUCKETS LOCATION '$dir/lineitem'""".stripMargin)
        }
        s.sql(
          """SELECT o_orderpriority,
            |       CAST(count(*) AS BIGINT) AS n_items,
            |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
            |                     AS BIGINT)) AS BIGINT) AS revenue_cents
            |FROM graft_b_orders JOIN graft_b_lineitem ON l_orderkey = o_orderkey
            |GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin)
      },
      Some(
        """SELECT o_orderpriority,
          |       CAST(count(*) AS BIGINT) AS n_items,
          |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
          |                     AS BIGINT)) AS BIGINT) AS revenue_cents
          |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)),

    // -- exact duplicated-substring spans (Lee et al. 2021) -----------------
    // Character-level exact dedup: per document, the maximal spans whose
    // every 40-char window occurs >= 2x in the corpus — boilerplate and
    // templated passages that MinHash (a whole-document measure) cannot
    // see. Window TEXT is the group key (no collision ambiguity); adjacent
    // duplicated offsets merge per-document. See Dedup.substringSpans for
    // the 100 TB cost model (rolling-hash + strided prefilter upgrade).
    QueryDef("p51_substring_spans",
      (s, d) => {
        import s.implicits._
        Dedup.substringSpans(t(s, d, "documents").select($"doc_id", $"text"),
            "doc_id", "text", w = 40)
          .orderBy($"doc_id")
      },
      Some("""WITH w0 AS (
             |  SELECT doc_id, text,
             |    unnest(generate_series(1, length(text) - 39)) AS off
             |  FROM documents WHERE length(text) >= 40),
             |wins AS (
             |  SELECT doc_id, off, substring(text, CAST(off AS INTEGER), 40) AS win
             |  FROM w0),
             |dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) >= 2),
             |pos AS (SELECT doc_id, off FROM wins JOIN dup USING (win)),
             |sp AS (
             |  SELECT doc_id, off,
             |    CASE WHEN lag(off) OVER w IS NULL
             |           OR off > lag(off) OVER w + 1 THEN 1 ELSE 0 END AS ns
             |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY off)),
             |sp2 AS (
             |  SELECT doc_id, off,
             |    sum(ns) OVER (PARTITION BY doc_id ORDER BY off) AS span_id
             |  FROM sp),
             |spans AS (
             |  SELECT doc_id, span_id, min(off) AS s, max(off) + 39 AS e
             |  FROM sp2 GROUP BY doc_id, span_id),
             |agg AS (
             |  SELECT doc_id,
             |    CAST(count(*) AS BIGINT) AS n_spans,
             |    CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
             |    CAST(max(e - s + 1) AS BIGINT) AS max_span
             |  FROM spans GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(a.n_spans, 0) AS n_spans,
             |  coalesce(a.dup_chars, 0) AS dup_chars,
             |  coalesce(a.max_span, 0) AS max_span,
             |  round(CAST(coalesce(a.dup_chars, 0) AS DOUBLE) / length(d.text), 4)
             |    AS dup_frac
             |FROM documents d LEFT JOIN agg a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // -- span-level eval decontamination (cross-corpus substring) -----------
    // The substring-exact sibling of p20's shingle overlap and p55's
    // near-dup check: maximal spans of TRAIN documents whose every 40-char
    // window occurs verbatim in the eval split — what a pipeline actually
    // REDACTS before training. Same window/merge machinery as p51; the
    // (tiny) eval window set broadcasts.
    QueryDef("p61_eval_span_decontam",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents").select($"doc_id", $"text")
        Dedup.substringSpansAgainst(docs.filter($"doc_id" % 97 =!= 0),
            docs.filter($"doc_id" % 97 === 0), "doc_id", "text", w = 40)
          .orderBy($"doc_id")
      },
      Some("""WITH w0 AS (
             |  SELECT doc_id, text,
             |    unnest(generate_series(1, length(text) - 39)) AS off
             |  FROM documents WHERE length(text) >= 40),
             |wins AS (
             |  SELECT doc_id, off, substring(text, CAST(off AS INTEGER), 40) AS win
             |  FROM w0),
             |refw AS (SELECT DISTINCT win FROM wins WHERE doc_id % 97 = 0),
             |pos AS (
             |  SELECT doc_id, off FROM wins JOIN refw USING (win)
             |  WHERE doc_id % 97 <> 0),
             |sp AS (
             |  SELECT doc_id, off,
             |    CASE WHEN lag(off) OVER w IS NULL
             |           OR off > lag(off) OVER w + 1 THEN 1 ELSE 0 END AS ns
             |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY off)),
             |sp2 AS (
             |  SELECT doc_id, off,
             |    sum(ns) OVER (PARTITION BY doc_id ORDER BY off) AS span_id
             |  FROM sp),
             |spans AS (
             |  SELECT doc_id, span_id, min(off) AS s, max(off) + 39 AS e
             |  FROM sp2 GROUP BY doc_id, span_id),
             |agg AS (
             |  SELECT doc_id,
             |    CAST(count(*) AS BIGINT) AS n_spans,
             |    CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
             |    CAST(max(e - s + 1) AS BIGINT) AS max_span
             |  FROM spans GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(a.n_spans, 0) AS n_spans,
             |  coalesce(a.dup_chars, 0) AS dup_chars,
             |  coalesce(a.max_span, 0) AS max_span,
             |  round(CAST(coalesce(a.dup_chars, 0) AS DOUBLE) / length(d.text), 4)
             |    AS dup_frac
             |FROM (SELECT * FROM documents WHERE doc_id % 97 <> 0) d
             |LEFT JOIN agg a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // -- product-quantization ANN (Jégou et al. 2011) -----------------------
    // The compression half of large-scale ANN: corpus vectors become m=4
    // one-byte codes (nearest trained codebook entry per 16-dim subspace),
    // queries stay exact, and the ADC scan ranks by the sum of per-subspace
    // query-to-centroid distances — 4 bytes/vector instead of 256. Codebook
    // training is the same deterministic Lloyd recipe as p19's IVF but with
    // 6-dp-rounded means (the cross-engine reproducibility contract); at
    // 100 TB this composes with IVF cells into the IVFADC layout.
    QueryDef("p52_pq_ann",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val books = pqModel(s, d)
        Similarity.pqAdcTopK(emb, "vec_id", "embedding", books, subDim = 16,
            col("vec_id") < 50, k = 3)
          .orderBy(col("qid"), col("rank"))
      },
      Some(pqOracleSql(m = 4, subDim = 16, k = 16))),

    // -- IVFADC: coarse IVF pruning + ADC over PQ codes ---------------------
    // The full Jégou et al. composition the p19/p52 scaladocs promise: the
    // coarse quantizer restricts each query to nprobe cells, and ranking
    // inside them reads m one-byte codes per candidate (never the float
    // vector). Top-k via the bounded TopKMinPairs aggregate on the
    // micro-unit-quantized ADC score.
    QueryDef("p62_ivfadc",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val coarse = ivfModel(s, d)
        val books = pqModel(s, d)
        Similarity.ivfAdcTopK(emb, "vec_id", "embedding", coarse, books,
            subDim = 16, nprobe = 2, col("vec_id") < 50, k = 3)
          .orderBy(col("qid"), col("rank"))
      },
      Some(ivfAdcOracleSql(m = 4, subDim = 16, k = 16))),

    // -- IVFADC served from the PERSISTED code layout -----------------------
    // The production complement of p62 (VERDICT r4 #1): p62 recodes the
    // float corpus on every run; here the corpus is encoded ONCE into a
    // cell-partitioned parquet code table (content-fingerprinted like
    // p50's bucketed layout, with the trained model stored beside it), and
    // the query batch is served from a PARTITION-PRUNED scan of m int
    // codes per row — no float-vector column anywhere in the corpus scan,
    // no retraining. Same oracle text as p62: the layout must change the
    // COST of the answer, never the answer.
    QueryDef("p64_ivfadc_layout",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val digest = layoutFingerprint(d, Seq("embeddings.parquet"))
        // one-time build through the shared cachedLayout protocol
        // (staging + atomic rename + marker, all under an OS file lock):
        // train (same recipe as p62 — the oracle depends on it), encode,
        // persist codes + model
        val dir = cachedLayout("ivfadc", digest) { staging =>
          val coarse = ivfModel(s, d)
          val books = pqModel(s, d)
          Similarity.writeIvfAdcLayout(emb, "vec_id", "embedding",
            coarse, books, subDim = 16, s"$staging/codes")
          Similarity.writeIvfAdcModel(staging.resolve("_MODEL.bin"), coarse, books)
        }
        val (coarse, books) = Similarity.readIvfAdcModel(dir.resolve("_MODEL.bin"))
        val queries = emb.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfAdcTopKFromCodes(s.read.parquet(s"$dir/codes"), queries,
            coarse, books, subDim = 16, nprobe = 2, k = 3)
          .orderBy(col("qid"), col("rank"))
      },
      Some(ivfAdcOracleSql(m = 4, subDim = 16, k = 16))),

    // -- ANN recall@k: the index-quality gate -------------------------------
    // The evaluation operator every approximate index needs before it is
    // trusted at corpus scale: recall@3 of the IVF probe (p19's exact
    // configuration) against the brute-force ground truth (p06's kernel),
    // per query. The truth side is the one allowlisted quadratic (the
    // evaluation runs on a BOUNDED query sample — here 50 queries — never
    // the corpus); the candidate side is the production index path. A
    // recall regression after retuning nprobe/k shows up as a value change
    // here, not as silently worse dedup downstream.
    QueryDef("p65_ann_recall",
      (s, d) => {
        import s.implicits._
        val emb = t(s, d, "embeddings")
        val cents = ivfModel(s, d)
        val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", cents,
            nprobe = 2, col("vec_id") < 50, k = 3, dim = Some(64))
          .select($"qid", $"nid")
        val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            col("vec_id") < 50, k = 3, dim = Some(64))
          .select($"qid", $"nid").withColumn("hit", lit(1))
        ivf.join(truth, Seq("qid", "nid"), "left")
          .groupBy($"qid")
          .agg(count($"hit").as("n_hits"))
          .select($"qid", $"n_hits",
            round($"n_hits".cast("double") / 3.0, 4).as("recall"))
          .orderBy($"qid")
      },
      Some {
        s"""$ivfCorpusCtes,
           |q AS (SELECT qid, qvec, cell FROM (
           |    SELECT b.vec_id AS qid, b.e AS qvec, c.cell,
           |      row_number() OVER (PARTITION BY b.vec_id ORDER BY $ivfD2, c.cell) AS rn
           |    FROM base b CROSS JOIN c2 c WHERE b.vec_id < 50)
           |  WHERE rn <= 2),
           |ivf AS (SELECT qid, nid FROM (
           |    SELECT qid, n.vec_id AS nid, row_number() OVER (
           |      PARTITION BY qid
           |      ORDER BY round(list_cosine_similarity(qvec, n.e), 4) DESC, n.vec_id) AS rn
           |    FROM corp n JOIN q USING (cell) WHERE qid <> n.vec_id)
           |  WHERE rn <= 3),
           |qq AS (SELECT vec_id AS qid, e AS qvec FROM base WHERE vec_id < 50),
           |truth AS (SELECT qid, nid FROM (
           |    SELECT qid, n.vec_id AS nid, row_number() OVER (
           |      PARTITION BY qid
           |      ORDER BY round(list_cosine_similarity(qvec, n.e), 4) DESC, n.vec_id) AS rn
           |    FROM base n CROSS JOIN qq WHERE qid <> n.vec_id)
           |  WHERE rn <= 3)
           |SELECT i.qid, CAST(count(t.nid) AS BIGINT) AS n_hits,
           |  round(CAST(count(t.nid) AS DOUBLE) / 3.0, 4) AS recall
           |FROM ivf i LEFT JOIN truth t ON i.qid = t.qid AND i.nid = t.nid
           |GROUP BY i.qid ORDER BY i.qid""".stripMargin
      }),

    // -- incremental IVFADC maintenance: append a slice to the code table ---
    // The refresh path p64's layout needs in production: a new crawl slice
    // is encoded UNDER THE STANDING MODEL (retraining would change
    // existing codes — that's a rebuild) and appended into the same
    // cell-partitioned directories; the standing corpus is never touched.
    // Here the corpus is split in half, written as base + appended slice,
    // and the probe must be byte-identical to the recode-everything p62
    // oracle — the append can only change WHEN encoding work happens,
    // never what a probe sees.
    QueryDef("p68_ivfadc_append",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val coarse = ivfModel(s, d)
        val books = pqModel(s, d)
        val mid = emb.count() / 2 // ids are 0..n-1: a genuine half split
        val dir = java.nio.file.Files.createTempDirectory("graft-ivfadc-app")
        try {
          Similarity.writeIvfAdcLayout(emb.filter(col("vec_id") < mid),
            "vec_id", "embedding", coarse, books, subDim = 16, s"$dir/codes")
          Similarity.appendIvfAdcLayout(emb.filter(col("vec_id") >= mid),
            "vec_id", "embedding", coarse, books, subDim = 16, s"$dir/codes")
          val queries = emb.filter(col("vec_id") < 50)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
          Similarity.ivfAdcTopKFromCodes(s.read.parquet(s"$dir/codes"),
              queries, coarse, books, subDim = 16, nprobe = 2, k = 3)
            .orderBy(col("qid"), col("rank"))
            .localCheckpoint(true)
        } finally graft.ops.Fs.deleteRecursively(dir)
      },
      Some(ivfAdcOracleSql(m = 4, subDim = 16, k = 16))),

    // -- two-stage retrieval: ADC shortlist -> exact float rerank -----------
    // The production serving composition (Jégou et al.'s ADC + the rerank
    // stage every deployed system adds): the compressed-code scan
    // shortlists 10 candidates per query through the probed cells, the
    // shortlist's floats are fetched by id (a point lookup at corpus
    // scale, never a scan) and exact cosine reorders them for the final
    // top-3 — ADC's quantization error is confined to RECALL (what p65
    // measures), never to the final ordering.
    QueryDef("p67_adc_rerank",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val coarse = ivfModel(s, d)
        val books = pqModel(s, d)
        Similarity.adcRerankTopK(emb, "vec_id", "embedding", coarse, books,
            subDim = 16, nprobe = 2, col("vec_id") < 50,
            shortlist = 10, k = 3)
          .orderBy(col("qid"), col("rank"))
      },
      Some(adcRerankOracleSql(m = 4, subDim = 16, k = 16,
        shortlist = 10, topK = 3))),

    // -- MinHash estimator calibration: signature agreement vs true Jaccard -
    // The estimator-quality twin of p65's recall gate: on every LSH
    // candidate pair, the MinHash ESTIMATE (fraction of equal signature
    // components — the statistic the banding's collision probability is
    // built on) next to the exact shingle-set Jaccard it estimates, plus
    // the absolute error. This is how a pipeline tunes k and the band
    // shape before trusting the index at corpus scale; the whole
    // computation reuses the candidate pairs' signatures, so the only
    // work past p04/p05 is a k-wide per-pair compare.
    QueryDef("p66_minhash_estimate",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        // ONE signature pipeline feeds both the banded candidate join and
        // the per-pair component compare (a second minhashCandidates call
        // would recompute the k·|shingles| digest scan — the dominant
        // stage — under a differently-shaped plan Spark cannot share).
        // Unlike minhashCandidates this bands EVERY doc (no exact-dup
        // collapse): identical copies inflate in-bucket join work by a
        // constant factor bounded by the OUTPUT pair multiplicity (every
        // dup pair is a real output row here — the calibration covers
        // them), so the trade is signature work on 1/dup-factor of the
        // docs (collapse) vs one signature pass total (this); at a
        // dup-ratio where the collapse wins, band collapsed reps and
        // expand pairs as Dedup.minhashCandidates does.
        val sig = Dedup.minhashSignatures(
            docs.select($"doc_id".as("doc"), $"text".as("__text")),
            "doc", "__text", q = 5, k = 12)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bands = Dedup.bandsOf(sig, nBands = 4, rowsPerBand = 3)
        val cands = bands.as("l").join(bands.as("r"),
            col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
              col("l.doc") < col("r.doc"))
          .select(col("l.doc").as("a"), col("r.doc").as("b")).distinct()
        val exact = Dedup.jaccardVerify(docs, cands, "doc_id", "text",
          q = 5, threshold = 0.0)
        val nEq = aggregate(
          zip_with($"sa", $"sb", (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v)
        exact
          .join(sig.select($"doc".as("a"), $"sig".as("sa")), "a")
          .join(sig.select($"doc".as("b"), $"sig".as("sb")), "b")
          .withColumn("n_eq", nEq.cast("long"))
          .withColumn("est", round($"n_eq".cast("double") / 12.0, 4))
          .select($"a", $"b", $"n_eq", $"est", $"jaccard",
            round(abs($"est" - $"jaccard"), 4).as("abs_err"))
          .orderBy($"a", $"b")
      },
      Some {
        val mins = minhashMinsSql
        s"""WITH cand AS MATERIALIZED (SELECT a, b FROM ($minhashCandidatesSql)),
           |shl AS (
           |  SELECT doc_id AS doc,
           |    list_transform(generate_series(1, greatest(length(text) - 4, 1)),
           |                   i -> substring(text, i, 5)) AS sh
           |  FROM documents),
           |sig AS (
           |  SELECT doc, [
           |      $mins
           |    ] AS sig FROM shl),
           |shd AS (
           |  SELECT doc, list_transform(list_distinct(sh),
           |    x -> CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)) AS shingles
           |  FROM shl),
           |pair AS (
           |  SELECT a, b,
           |    CAST(len(list_filter(range(1, 13), i -> ga.sig[i] = gb.sig[i])) AS BIGINT) AS n_eq,
           |    round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
           |      (len(sa.shingles) + len(sb.shingles)
           |       - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
           |  FROM cand
           |  JOIN sig ga ON ga.doc = a JOIN sig gb ON gb.doc = b
           |  JOIN shd sa ON sa.doc = a JOIN shd sb ON sb.doc = b)
           |SELECT a, b, n_eq, round(n_eq / 12.0, 4) AS est, jaccard,
           |  round(abs(round(n_eq / 12.0, 4) - jaccard), 4) AS abs_err
           |FROM pair ORDER BY a, b""".stripMargin
      }),

    // -- KMV distinct-count sketch (per-source vocabulary size) -------------
    // Deterministic sketching: unlike HLL, the k-minimum-values estimate
    // (k-1)·M/h_k is plain SQL, so the ESTIMATE itself is oracle-checked
    // exactly, next to the true distinct count it approximates. n_exact is
    // what a 100 TB job would replace with this sketch: the exact count
    // shuffles every distinct token, the sketch ships k longs per group.
    QueryDef("p26_kmv_distinct",
      (s, d) => {
        import s.implicits._
        val toks = t(s, d, "documents")
          .select($"source", explode(split(lower($"text"), "\\s+")).as("token"))
          .filter(length($"token") > 0)
        val exact = toks.groupBy($"source")
          .agg(countDistinct($"token").as("n_exact"))
        graft.ops.Sketch.kmvDistinct(toks, "source", "token", k = 64)
          .join(exact, "source")
          .select($"source", $"n_exact", $"n_kept", $"est_distinct")
          .orderBy($"source")
      },
      Some("""WITH toks AS (
             |  SELECT source,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
             |  FROM documents),
             |hashed AS (
             |  SELECT DISTINCT source, CAST('0x' || substring(md5(token), 1, 15) AS BIGINT) AS h
             |  FROM toks),
             |kept AS (
             |  SELECT source, h FROM hashed
             |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 64),
             |agg AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS hk
             |  FROM kept GROUP BY source),
             |exact AS (
             |  SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS n_exact
             |  FROM toks GROUP BY source)
             |SELECT a.source, e.n_exact, a.n_kept,
             |  CASE WHEN a.n_kept < 64 THEN CAST(a.n_kept AS DOUBLE)
             |       ELSE round(63.0 * 1152921504606846976.0 / CAST(a.hk AS DOUBLE), 4)
             |  END AS est_distinct
             |FROM agg a JOIN exact e USING (source)
             |ORDER BY source""".stripMargin)),

    // -- Gopher-style repetition quality filter ------------------------------
    // The repetition family (unique-word fraction, top-2-gram mass,
    // duplicated-3-gram mass) catches boilerplate and degenerate generation
    // loops that length/punctuation stats (p02/p03) miss. keep = passes all
    // thresholds; explode + HashAggregate only, no per-doc sorts.
    QueryDef("p27_repetition_filter",
      (s, d) => {
        import s.implicits._
        graft.ops.TextOps.repetitionStats(t(s, d, "documents"), "doc_id", "text")
          .withColumn("keep",
            ($"n_words" >= 10 && $"frac_unique_words" >= 0.3 &&
              $"frac_top_2gram" <= 0.2 && $"frac_dup_3grams" <= 0.4).cast("int"))
          .orderBy($"doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS l
             |  FROM documents),
             |words AS (SELECT doc_id, unnest(l) AS t FROM base),
             |wstats AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             |         count(DISTINCT t) AS n_uniq
             |  FROM words GROUP BY doc_id),
             |g2 AS (
             |  SELECT doc_id,
             |    unnest(CASE WHEN len(l) >= 2
             |      THEN list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])
             |      ELSE CAST([] AS VARCHAR[]) END) AS g
             |  FROM base),
             |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
             |s2 AS (SELECT doc_id, sum(c) AS n2, max(c) AS top2 FROM c2 GROUP BY 1),
             |g3 AS (
             |  SELECT doc_id,
             |    unnest(CASE WHEN len(l) >= 3
             |      THEN list_transform(range(1, len(l) - 1),
             |             i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
             |      ELSE CAST([] AS VARCHAR[]) END) AS g
             |  FROM base),
             |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
             |s3 AS (SELECT doc_id, sum(c) AS n3,
             |              sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3
             |       FROM c3 GROUP BY 1)
             |SELECT w.doc_id, w.n_words,
             |  CASE WHEN w.n_words > 0
             |       THEN round(CAST(w.n_uniq AS DOUBLE) / w.n_words, 4)
             |       ELSE 0.0 END AS frac_unique_words,
             |  COALESCE(CASE WHEN s2.n2 > 0
             |       THEN round(CAST(s2.top2 AS DOUBLE) / s2.n2, 4) END, 0.0)
             |    AS frac_top_2gram,
             |  COALESCE(CASE WHEN s3.n3 > 0
             |       THEN round(CAST(s3.dup3 AS DOUBLE) / s3.n3, 4) END, 0.0)
             |    AS frac_dup_3grams,
             |  CAST(w.n_words >= 10 AND
             |       CASE WHEN w.n_words > 0
             |            THEN round(CAST(w.n_uniq AS DOUBLE) / w.n_words, 4)
             |            ELSE 0.0 END >= 0.3 AND
             |       COALESCE(CASE WHEN s2.n2 > 0
             |            THEN round(CAST(s2.top2 AS DOUBLE) / s2.n2, 4) END, 0.0) <= 0.2 AND
             |       COALESCE(CASE WHEN s3.n3 > 0
             |            THEN round(CAST(s3.dup3 AS DOUBLE) / s3.n3, 4) END, 0.0) <= 0.4
             |       AS INT) AS keep
             |FROM wstats w
             |LEFT JOIN s2 USING (doc_id)
             |LEFT JOIN s3 USING (doc_id)
             |ORDER BY w.doc_id""".stripMargin)),

    // -- PII detection + redaction ------------------------------------------
    // The testdata corpus is PII-free word salad, so the query first plants
    // deterministic doc_id-derived PII (email, IPv4, phone) IN BOTH ENGINES,
    // then detects and redacts it. Chained codegen'd regexp_replace over the
    // scan — per-row, shuffle-free, the shape that holds at 100 TB.
    QueryDef("p28_pii_redact",
      (s, d) => {
        import s.implicits._
        val aug = concat($"text",
          lit(" contact user"), $"doc_id".cast("string"), lit("@example.com"),
          lit(" from 10.0."), ($"doc_id" % 256).cast("string"),
          lit("."), ($"doc_id" % 100).cast("string"),
          lit(" call +1-555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
        t(s, d, "documents")
          .select($"doc_id", aug.as("aug"))
          .select($"doc_id",
            TextOps.emailCount($"aug").as("n_emails"),
            TextOps.ipv4Count($"aug").as("n_ips"),
            TextOps.phoneCount($"aug").as("n_phones"),
            md5(TextOps.redactPii($"aug")).as("redacted_digest"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH aug AS (
             |  SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
             |         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
             |         || '.' || CAST(doc_id % 100 AS VARCHAR)
             |         || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
             |  FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(a, '${TextOps.EmailRe}')) AS n_emails,
             |  len(regexp_extract_all(a, '${TextOps.Ipv4Re}')) AS n_ips,
             |  len(regexp_extract_all(a, '${TextOps.PhoneRe}')) AS n_phones,
             |  md5(regexp_replace(regexp_replace(regexp_replace(a,
             |    '${TextOps.EmailRe}', '[EMAIL]', 'g'),
             |    '${TextOps.Ipv4Re}', '[IP]', 'g'),
             |    '${TextOps.PhoneRe}', '[PHONE]', 'g')) AS redacted_digest
             |FROM aug ORDER BY doc_id""".stripMargin)),

    // -- per-source document caps -------------------------------------------
    // The Common-Crawl-pipeline quota rule: no source (domain) may contribute
    // more than K=10 documents, keeping its 10 highest-quality ones. One window
    // partitioned by source — ranking shuffles (source) keys once and never
    // compares documents across sources, so it scales with the largest
    // single source, not the corpus. Rank on the ROUNDED score so the
    // Spark/DuckDB orderings can never disagree below double print
    // precision; doc_id breaks exact ties deterministically.
    QueryDef("p29_source_cap",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"source")
          .orderBy($"quality".desc, $"doc_id")
        t(s, d, "documents")
          .select($"source", $"doc_id", TextOps.qualityScore($"text").as("quality"))
          .withColumn("rank", row_number().over(w))
          .withColumn("kept", ($"rank" <= 10).cast("int"))
          .orderBy($"source", $"rank")
      },
      Some {
        val en = s"len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0), t -> list_contains($StopEnSql, t)))"
        s"""WITH scored AS (
           |  SELECT source, doc_id,
           |    round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
           |      + (1.0 - least(CASE WHEN length(text) > 0
           |          THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
           |          ELSE 0.0 END * 5.0, 1.0)) * 0.3
           |      + least((CASE WHEN len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) > 0
           |          THEN CAST($en AS DOUBLE) / len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0))
           |          ELSE 0.0 END) * 4.0, 1.0) * 0.3, 4) AS quality
           |  FROM documents)
           |SELECT source, doc_id, quality,
           |  CAST(row_number() OVER w AS INT) AS rank,
           |  CAST(row_number() OVER w <= 10 AS INT) AS kept
           |FROM scored
           |WINDOW w AS (PARTITION BY source ORDER BY quality DESC, doc_id)
           |ORDER BY source, rank""".stripMargin
      }),

    // -- concatenate-and-chunk sequence packing ------------------------------
    // The training-batch layout step: documents are concatenated in order
    // and the token stream is cut into fixed 512-token context windows (sized to the testdata docs so packs actually span);
    // each doc lands at [start_off, start_off + n_tok) and spans packs
    // [pack_first, pack_last]. Packed PER SOURCE (partitionBy source,
    // order by doc_id): each shard's running sum is an independent window,
    // so the sort is per-source — the global-order variant would serialize
    // the corpus through one partition at 100 TB.
    QueryDef("p30_seq_packing",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"source").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .select($"source", $"doc_id", TextOps.bpeishTokenCount($"text").as("n_tok"))
          .withColumn("cum", sum($"n_tok").over(w))
          .withColumn("start_off", ($"cum" - $"n_tok").cast("long"))
          .withColumn("pack_first", floor($"start_off" / 512.0).cast("long"))
          .withColumn("pack_last", floor(($"cum" - 1) / 512.0).cast("long"))
          .withColumn("n_packs",
            when($"n_tok" > 0, $"pack_last" - $"pack_first" + 1).otherwise(0L))
          .select($"source", $"doc_id", $"n_tok".cast("long").as("n_tok"),
            $"start_off", $"pack_first", $"pack_last", $"n_packs")
          .orderBy($"source", $"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT source, doc_id,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tok
             |  FROM documents),
             |cums AS (
             |  SELECT source, doc_id, n_tok,
             |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |                     ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM toks)
             |SELECT source, doc_id, n_tok,
             |  CAST(cum - n_tok AS BIGINT) AS start_off,
             |  CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS pack_first,
             |  CAST(floor((cum - 1) / 512.0) AS BIGINT) AS pack_last,
             |  CASE WHEN n_tok > 0
             |    THEN CAST(floor((cum - 1) / 512.0) - floor((cum - n_tok) / 512.0) + 1 AS BIGINT)
             |    ELSE 0 END AS n_packs
             |FROM cums ORDER BY source, doc_id""".stripMargin)),

    // -- Unicode NFC canonicalization (native codegen Expression) -----------
    // functions.NfcNormalize: Spark has no NFC built-in (DuckDB does), and
    // every exact-dedup digest disagrees between composed and decomposed
    // forms of the same text unless the corpus is canonicalized first. The
    // ASCII testdata is decomposed IN BOTH ENGINES (every 'e' gains a
    // combining acute, U+0301) before normalizing; NFC recomposes each pair
    // to one code point, so len_nfc returns to len_raw and the digests
    // hash-match DuckDB's nfc_normalize exactly.
    QueryDef("p31_nfc_normalize",
      (s, d) => {
        import s.implicits._
        graft.functions.NfcNormalize.register(s)
        val dec = regexp_replace($"text", "e", "e\u0301")
        t(s, d, "documents")
          .select($"doc_id", $"text", dec.as("dec"))
          .select($"doc_id",
            length($"text").as("len_raw"),
            length($"dec").as("len_decomposed"),
            length(call_function("nfc_normalize", $"dec")).as("len_nfc"),
            md5(call_function("nfc_normalize", $"dec")).as("nfc_digest"))
          .orderBy($"doc_id")
      },
      Some("""WITH dec AS (
             |  SELECT doc_id, text,
             |    regexp_replace(text, 'e', 'e' || chr(769), 'g') AS d
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(length(text) AS INT) AS len_raw,
             |  CAST(length(d) AS INT) AS len_decomposed,
             |  CAST(length(nfc_normalize(d)) AS INT) AS len_nfc,
             |  md5(nfc_normalize(d)) AS nfc_digest
             |FROM dec ORDER BY doc_id""".stripMargin)),

    // -- corpus-level line dedup (RefinedWeb-style) -------------------------
    // Exact line-level dedup: the corpus's repeated "lines" (boilerplate
    // headers, navigation, licenses) are found globally and each document
    // reports how much of it is corpus-duplicated. The testdata has no
    // newlines, so the deterministic line unit is 10-token chunks
    // (TextOps.tokenChunks). Shape: explode → two HashAggregates (chunk
    // frequency, per-doc rollup) + one join on chunk — shuffles carry
    // (chunk, doc) pairs, never document bodies. At 100 TB the chunk
    // frequency table is the only corpus-wide state, and it's a groupBy.
    QueryDef("p32_line_dedup",
      (s, d) => {
        import s.implicits._
        val chunks = t(s, d, "documents")
          .select($"doc_id", explode(TextOps.tokenChunks(lower($"text"), 10)).as("chunk"))
        val freq = chunks.groupBy($"chunk")
          .agg(countDistinct($"doc_id").as("n_docs"))
        chunks.join(freq, "chunk")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when($"n_docs" > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
          .withColumn("dup_frac",
            round($"n_dup_chunks".cast("double") / $"n_chunks", 4))
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS l
             |  FROM documents),
             |chunks AS (
             |  SELECT doc_id,
             |    unnest(CASE WHEN len(l) > 0
             |      THEN list_transform(range(0, CAST(ceil(len(l) / 10.0) AS INT)),
             |             i -> array_to_string(list_slice(l, i * 10 + 1, i * 10 + 10), ' '))
             |      ELSE CAST([] AS VARCHAR[]) END) AS chunk
             |  FROM toks),
             |freq AS (
             |  SELECT chunk, count(DISTINCT doc_id) AS n_docs
             |  FROM chunks GROUP BY chunk)
             |SELECT c.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
             |  round(CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_frac
             |FROM chunks c JOIN freq f USING (chunk)
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // -- dataset-mixture epoch planning -------------------------------------
    // Training mixes reweight sources (2.5 epochs of src0, 30% of src1,
    // src2 excluded, 1.0x everything else). Sampling.mixEpochs decides
    // copies per row from a salted hash — floor(w) guaranteed + one more
    // under the fractional bucket — then explodes the copy index, so the
    // output IS the epoch plan the trainer reads. Per-row decisions, no
    // shuffle, reproducible across runs/engines/cluster layouts.
    QueryDef("p33_mix_epochs",
      (s, d) => {
        import s.implicits._
        graft.ops.Sampling.mixEpochs(
          t(s, d, "documents").select($"doc_id", $"source"),
          "doc_id", "source",
          Map("src0" -> 2500, "src1" -> 300, "src2" -> 0),
          defaultPermill = 1000)
          .select($"source", $"doc_id", $"n_copies", $"copy")
          .orderBy($"source", $"doc_id", $"copy")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, source,
             |    CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 300
             |                WHEN 'src2' THEN 0 ELSE 1000 END AS wt,
             |    CAST(('0x' || substring(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS b
             |  FROM documents),
             |c AS (
             |  SELECT source, doc_id,
             |    CAST(wt // 1000 + CASE WHEN b < wt % 1000 THEN 1 ELSE 0 END AS BIGINT) AS n_copies
             |  FROM w)
             |SELECT source, doc_id, n_copies,
             |  unnest(generate_series(1, n_copies)) AS copy
             |FROM c WHERE n_copies > 0
             |ORDER BY source, doc_id, copy""".stripMargin)),

    // -- temperature-scaled source mixing (alpha-sampling) ------------------
    // The multilingual/multi-source pretraining recipe (alpha = 0.5): each
    // source's share of the mixture is proportional to n^alpha, flattening
    // the natural distribution so small sources are not drowned out. The
    // per-source replication weight w_s = (n_s^0.5 / SUM n_t^0.5) * N / n_s
    // is derived in EXACT integer arithmetic (root-permill = floor(sqrt(n)
    // * 1000) — IEEE sqrt of an integer is engine-identical — then the
    // half-up integer division (2a + b) div (2b)), so Spark and DuckDB
    // compute bit-equal permill weights; the mixture itself is p33's
    // deterministic hash-fractional replication under those weights. The
    // per-source derivation is driver-side over the (tiny) source count
    // table; every per-document decision is a scan-side expression.
    QueryDef("p69_temperature_mix",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents").select($"doc_id", $"source")
        val counts = docs.groupBy($"source").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val permill = graft.ops.Sampling.temperatureWeightsSqrt(counts)
        val mix = graft.ops.Sampling.mixEpochs(docs, "doc_id", "source",
          permill, defaultPermill = 1000, salt = "tmix")
        val summary = counts.toSeq.map { case (src, n) =>
          (src, n, permill(src).toLong)
        }.toDF("source", "n_docs", "permill")
        summary
          .join(mix.groupBy($"source").agg(count(lit(1)).as("n_mixture")),
            Seq("source"), "left")
          .select($"source", $"n_docs", $"permill",
            coalesce($"n_mixture", lit(0L)).as("n_mixture"))
          .orderBy($"source")
      },
      Some(temperatureMixOracleSql)),

    // -- cleaned-corpus materialization: verdicts -> shards + manifest ------
    // The capstone composition a training-data pipeline actually ships:
    // apply the quality-aware near-dup keeper verdicts (p63), materialize
    // ONLY the kept documents as deterministic training shards, and emit
    // the per-shard manifest with the roundtrip witness (p56's
    // written-files cross-check — Verify hard-fails a false
    // counts_match). Everything downstream of the verdicts is the same
    // audited machinery; the oracle recomputes verdicts + manifest
    // arithmetic end to end.
    QueryDef("p70_clean_corpus",
      (s, d) => {
        val docs = t(s, d, "documents")
        val kept = keeperVerdicts(s, d).filter(col("keep") === 1)
          .select(col("doc_id"))
        graft.ops.Layout.shardManifest(
          docs.join(kept, "doc_id").select(col("doc_id"), col("text")),
          "doc_id", "text", nShards = 8)
      },
      Some {
        s"""WITH cand AS MATERIALIZED ($minhashCandidatesSql),
           |${ccClusterCtes(CcOracleRounds)},
           |$keeperCtesSql,
           |kept AS (SELECT doc_id FROM k WHERE doc_id = keeper),
           |staged AS (
           |  SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.text,
           |    CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 8 AS shard,
           |    CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '|' || d.text), 1, 15)) AS BIGINT)
           |      % 1073741824 AS dg,
           |    len(list_filter(string_split_regex(d.text, '\\s+'), x -> len(x) > 0)) AS nw,
           |    length(d.text) AS nc
           |  FROM documents d JOIN kept USING (doc_id))
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(nw) AS BIGINT) AS n_words,
           |  CAST(sum(nc) AS BIGINT) AS n_chars,
           |  CAST(sum(dg) AS BIGINT) AS digest,
           |  1 AS counts_match
           |FROM staged GROUP BY shard ORDER BY shard""".stripMargin
      }),

    // -- single-pass observed metrics (pipeline observability) --------------
    // Dataset.observe attaches aggregate metrics to a flowing query: the
    // corpus stats a pipeline MONITORS (row counts, char volume, null
    // rate) are collected during the pass that does the real work — at
    // 100 TB the difference between free telemetry and a second full
    // scan. Here the "real work" is a per-source rollup; the observed
    // corpus-level metrics ride along, and the output cross-checks them
    // against directly-computed values (matches_direct is a witness —
    // Verify hard-fails if observe() ever under- or over-counts).
    QueryDef("p71_observed_metrics",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val ob = new org.apache.spark.sql.Observation("p71")
        val work = docs.observe(ob,
          count(lit(1)).as("n_docs"),
          sum(length($"text")).as("n_chars"),
          count($"lang").as("n_lang_nonnull"))
        // the real pass: per-source volume rollup (materializes `work`)
        val rollup = work.groupBy($"source")
          .agg(count(lit(1)).as("n"), sum(length($"text")).as("chars"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val m = ob.get
        val direct = docs.agg(
            count(lit(1)).as("n_docs"),
            sum(length($"text")).as("n_chars"),
            count($"lang").as("n_lang_nonnull"))
          .collect()(0)
        val rows = Seq(
          ("n_docs", m("n_docs").asInstanceOf[Long], direct.getLong(0)),
          ("n_chars", m("n_chars").asInstanceOf[Long], direct.getLong(1)),
          ("n_lang_nonnull", m("n_lang_nonnull").asInstanceOf[Long], direct.getLong(2)),
          // the rollup the metrics rode along with must itself reconcile
          ("rollup_docs", rollup.map(_._2).sum, direct.getLong(0)),
          ("rollup_chars", rollup.map(_._3).sum, direct.getLong(1)))
        rows.toDF("metric", "observed", "direct")
          .withColumn("matches_direct", ($"observed" === $"direct"))
          .orderBy($"metric")
      },
      Some("""WITH direct AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |    CAST(count(lang) AS BIGINT) AS n_lang_nonnull
             |  FROM documents)
             |SELECT metric,
             |  CASE metric WHEN 'n_docs' THEN n_docs
             |              WHEN 'n_chars' THEN n_chars
             |              WHEN 'n_lang_nonnull' THEN n_lang_nonnull
             |              WHEN 'rollup_docs' THEN n_docs
             |              WHEN 'rollup_chars' THEN n_chars END AS observed,
             |  CASE metric WHEN 'n_docs' THEN n_docs
             |              WHEN 'n_chars' THEN n_chars
             |              WHEN 'n_lang_nonnull' THEN n_lang_nonnull
             |              WHEN 'rollup_docs' THEN n_docs
             |              WHEN 'rollup_chars' THEN n_chars END AS direct,
             |  true AS matches_direct
             |FROM direct, (SELECT unnest(['n_chars', 'n_docs', 'n_lang_nonnull',
             |                             'rollup_chars', 'rollup_docs']) AS metric)
             |ORDER BY metric""".stripMargin)),

    // -- curriculum quality deciles -----------------------------------------
    // Per-language quality deciles (ntile over the rounded score — the
    // curriculum / data-ablation binning step) rolled up to per-bin stats.
    // The bin averages stay in INTEGER space end-to-end: scores become
    // 1e-4-unit longs, the half-up division is (2S + n) div (2n) — exact
    // in both engines. round(sum/count) would hash-split on bins whose
    // true mean lands exactly on a half-digit (even n makes that real):
    // Spark rounds the shortest decimal repr half-UP, DuckDB rounds the
    // binary double, and the two sides of .xxxx5 disagree. One window per
    // language partition + one HashAggregate — scales per-stratum.
    QueryDef("p34_quality_bins",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"lang").orderBy($"q", $"doc_id")
        t(s, d, "documents")
          .select($"lang", $"doc_id",
            TextOps.qualityScore($"text").as("q"),
            TextOps.wordCount($"text").as("nw"))
          .withColumn("decile", ntile(10).over(w))
          .groupBy($"lang", $"decile")
          .agg(count(lit(1)).as("n_docs"),
            sum(round($"q" * 10000).cast("long")).as("__s4"),
            sum($"nw".cast("long")).as("__sw"))
          .withColumn("avg_quality",
            expr("CAST((2 * __s4 + n_docs) div (2 * n_docs) AS DOUBLE) / 10000.0"))
          .withColumn("avg_words",
            expr("CAST((200 * __sw + n_docs) div (2 * n_docs) AS DOUBLE) / 100.0"))
          .select($"lang", $"decile", $"n_docs", $"avg_quality", $"avg_words")
          .orderBy($"lang", $"decile")
      },
      Some {
        val en = s"len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0), t -> list_contains($StopEnSql, t)))"
        s"""WITH scored AS (
           |  SELECT lang, doc_id,
           |    round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
           |      + (1.0 - least(CASE WHEN length(text) > 0
           |          THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
           |          ELSE 0.0 END * 5.0, 1.0)) * 0.3
           |      + least((CASE WHEN len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) > 0
           |          THEN CAST($en AS DOUBLE) / len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0))
           |          ELSE 0.0 END) * 4.0, 1.0) * 0.3, 4) AS q,
           |    len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS nw
           |  FROM documents),
           |binned AS (
           |  SELECT lang, q, nw,
           |    ntile(10) OVER (PARTITION BY lang ORDER BY q, doc_id) AS decile
           |  FROM scored),
           |sums AS (
           |  SELECT lang, decile,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    sum(CAST(round(q * 10000) AS BIGINT)) AS s4,
           |    sum(CAST(nw AS BIGINT)) AS sw
           |  FROM binned GROUP BY lang, decile)
           |SELECT lang, decile, n_docs,
           |  CAST((2 * s4 + n_docs) // (2 * n_docs) AS DOUBLE) / 10000.0 AS avg_quality,
           |  CAST((200 * sw + n_docs) // (2 * n_docs) AS DOUBLE) / 100.0 AS avg_words
           |FROM sums
           |ORDER BY lang, decile""".stripMargin
      }),

    // -- broadcast-bloom blocklist prune ------------------------------------
    // Remove every document whose digest appears in a blocklist (here: the
    // src0 digests) WITHOUT shuffling the corpus: a bloom filter built once
    // over the blocklist (scalar subquery → broadcast value) gates the scan.
    // NOT might_contain is definitive (no false negatives) — those rows pass
    // straight through the per-row filter; "maybe" rows alone take the exact
    // LEFT ANTI residual join, so the join input is |candidates|, not
    // |corpus|. The result is EXACT — the bloom only prunes — which is why a
    // plain NOT IN oracle can gate it. Spark ships these expressions for its
    // internal runtime-filter rewrite; graft registers them as SQL
    // (functions.BloomSql / GraftExtensions).
    QueryDef("p35_bloom_blocklist",
      (s, d) => {
        graft.functions.BloomSql.register(s)
        t(s, d, "documents").createOrReplaceTempView("documents_bl")
        s.sql("""WITH bl AS (
                |  SELECT DISTINCT md5(text) AS digest FROM documents_bl
                |  WHERE source = 'src0'),
                |scored AS (SELECT doc_id, md5(text) AS digest FROM documents_bl),
                |clean AS (
                |  SELECT doc_id, digest FROM scored
                |  WHERE NOT might_contain(
                |    (SELECT bloom_filter_agg(xxhash64(digest), 1000L, 8192L) FROM bl),
                |    xxhash64(digest))),
                |cand AS (
                |  SELECT doc_id, digest FROM scored
                |  WHERE might_contain(
                |    (SELECT bloom_filter_agg(xxhash64(digest), 1000L, 8192L) FROM bl),
                |    xxhash64(digest)))
                |SELECT doc_id, digest FROM clean
                |UNION ALL
                |SELECT c.doc_id, c.digest FROM cand c
                |LEFT ANTI JOIN bl ON c.digest = bl.digest
                |ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id, md5(text) AS digest FROM documents
             |WHERE md5(text) NOT IN
             |  (SELECT md5(text) FROM documents WHERE source = 'src0')
             |ORDER BY doc_id""".stripMargin)),

    // -- canonical-form near-exact dedup ------------------------------------
    // The normalize-then-digest family (Dolma/CCNet-style): exact dedup
    // (p01) misses trivially-reformatted copies, so the digest is taken
    // over the CANONICAL form — NFC, lowercased, punctuation stripped,
    // whitespace collapsed — planted here by perturbing case/spacing of
    // doc_id%400 in both engines. Pure per-row expressions + one window;
    // the canonicalizer chain (incl. the native nfc_normalize) stays in
    // whole-stage codegen.
    QueryDef("p40_canonical_dedup",
      (s, d) => {
        import s.implicits._
        graft.functions.NfcNormalize.register(s)
        // docs >= 400 carry a reformatted copy of doc_id % 400's text:
        // uppercased, double-spaced, trailing punctuation
        val base = t(s, d, "documents")
        val basis = base.select($"doc_id".as("base_id"), $"text".as("base_text"))
        val docs = base.join(basis, $"doc_id" % 400 === $"base_id", "left")
          .select($"doc_id",
            when($"doc_id" >= 400, concat(upper($"base_text"), lit("  !!")))
              .otherwise($"text").as("text"))
        val canon = trim(regexp_replace(
          regexp_replace(lower(call_function("nfc_normalize", $"text")),
            "[^a-z0-9\\s]", ""),
          "\\s+", " "))
        val w = Window.partitionBy($"canon_digest")
        docs.select($"doc_id", md5(canon).as("canon_digest"))
          .withColumn("keeper", min($"doc_id").over(w))
          .withColumn("is_dup", ($"doc_id" =!= $"keeper").cast("int"))
          .orderBy($"doc_id")
      },
      Some("""WITH docs AS (
             |  SELECT d.doc_id,
             |    CASE WHEN d.doc_id >= 400 THEN upper(b.text) || '  !!'
             |         ELSE d.text END AS text
             |  FROM documents d
             |  LEFT JOIN documents b ON d.doc_id % 400 = b.doc_id),
             |canon AS (
             |  SELECT doc_id,
             |    md5(trim(regexp_replace(
             |      regexp_replace(lower(nfc_normalize(text)), '[^a-z0-9\s]', '', 'g'),
             |      '\s+', ' ', 'g'))) AS canon_digest
             |  FROM docs)
             |SELECT doc_id, canon_digest,
             |  min(doc_id) OVER (PARTITION BY canon_digest) AS keeper,
             |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY canon_digest) AS INT) AS is_dup
             |FROM canon ORDER BY doc_id""".stripMargin)),

    // -- BPE vocabulary induction (merge-table training) --------------------
    // TextOps.bpeMerges: one corpus pass builds the word-frequency table,
    // then 5 merge iterations run over the VOCABULARY only — the property
    // that makes BPE trainable at 100 TB. The DuckDB oracle unrolls the
    // same 5 iterations as CTE stages (the p19 Lloyd-unroll pattern);
    // pair selection ties break on (count desc, pair asc) in both engines.
    QueryDef("p36_bpe_merges",
      (s, d) => TextOps.bpeMerges(t(s, d, "documents"), "text", nMerges = 5)
        .orderBy(col("merge_rank")),
      Some(bpeTrainCtes(5) + "\n" + (1 to 5).map(i =>
        s"SELECT $i AS merge_rank, g AS pair, replace(g, ' ', '') AS merged, " +
          s"CAST(c AS BIGINT) AS n_pairs FROM t$i")
        .mkString("", "\nUNION ALL\n", "\nORDER BY merge_rank"))),

    // -- BPE application: encode the corpus with the trained merge table ----
    // Train once (p36's 5 merges, driver-collected), then encoding is a
    // CHAIN of per-row sentinel replaces folded over the merge list — no
    // UDF, no join, no apply-time iteration: the vocab-sized merge table
    // compiles INTO the expression tree, which is how a 100 TB encode pass
    // stays a single codegen'd scan. n_bpe is the real post-merge sequence
    // length (what a trainer batches on) next to the p02 heuristic count.
    QueryDef("p37_bpe_encode",
      (s, d) => {
        import s.implicits._
        val merges = TextOps.bpeMerges(t(s, d, "documents"), "text", nMerges = 5)
          .orderBy($"merge_rank").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        t(s, d, "documents")
          .select($"doc_id",
            TextOps.wordCount($"text").as("n_words"),
            TextOps.bpeEncodeCount($"text", merges).as("n_bpe"))
          .orderBy($"doc_id")
      },
      Some {
        val chain = (1 to 5).foldLeft(
          "' ' || array_to_string(regexp_extract_all(x, '.'), '  ') || ' '") {
          (acc, i) =>
            s"replace($acc,\n        ' ' || replace(g$i, ' ', '  ') || ' ', ' ' || m$i || ' ')"
        }
        s"""${bpeTrainCtes(5)},
           |mt AS (SELECT t1.g AS g1, replace(t1.g, ' ', '') AS m1,
           |              t2.g AS g2, replace(t2.g, ' ', '') AS m2,
           |              t3.g AS g3, replace(t3.g, ' ', '') AS m3,
           |              t4.g AS g4, replace(t4.g, ' ', '') AS m4,
           |              t5.g AS g5, replace(t5.g, ' ', '') AS m5
           |       FROM t1, t2, t3, t4, t5),
           |toks AS (
           |  SELECT doc_id,
           |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS words
           |  FROM documents)
           |SELECT doc_id,
           |  len(words) AS n_words,
           |  CAST(COALESCE(list_sum(list_transform(words, x ->
           |    len(string_split(trim($chain), '  ')))), 0) AS BIGINT) AS n_bpe
           |FROM toks CROSS JOIN mt
           |ORDER BY doc_id""".stripMargin
      }),

    // -- URL canonicalization + URL-level dedup -----------------------------
    // The crawl pipeline's cheapest dedup pass: most duplicates are the SAME
    // page under a cosmetically different URL, so canonicalize (case, www.,
    // default ports, tracking params, param order, fragment, trailing slash)
    // and elect one keeper per canonical form — no document text touched.
    // The documents table carries no URL, so a deterministic messy URL is
    // DERIVED from (source, doc_id) by the same expression in both engines;
    // the operator under test is ops/UrlOps.canonicalUrl, implemented
    // independently per engine. Pure per-row expressions + one shuffle on
    // the canonical key (UrlOps scale note).
    QueryDef("p41_url_dedup",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents").select($"doc_id", $"source")
        val url = concat(
          when($"doc_id" % 3 === 0, lit("HTTPS")).otherwise(lit("https")), lit("://"),
          when($"doc_id" % 4 === 0, lit("WWW.")).otherwise(lit("")),
          $"source", lit(".Example.COM"),
          when($"doc_id" % 6 === 0, lit(":443")).otherwise(lit("")),
          lit("/Docs/"), ($"doc_id" % 40).cast("string"),
          when($"doc_id" % 2 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&id="), ($"doc_id" % 7).cast("string"),
          when($"doc_id" % 5 === 0, lit("&ref=home")).otherwise(lit("")),
          when($"doc_id" % 5 === 1, lit("&b=2&a=1")).otherwise(lit("&a=1&b=2")),
          when($"doc_id" % 8 === 0, lit("#frag")).otherwise(lit("")))
        graft.ops.UrlOps.urlDedup(docs.withColumn("url", url), "url", "doc_id")
          .select($"doc_id", $"url", $"canon_url", $"keep", $"group_n")
          .orderBy($"doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
             |    (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END) ||
             |    source || '.Example.COM' ||
             |    (CASE WHEN doc_id % 6 = 0 THEN ':443' ELSE '' END) ||
             |    '/Docs/' || CAST(doc_id % 40 AS VARCHAR) ||
             |    (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
             |    '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) ||
             |    (CASE WHEN doc_id % 5 = 0 THEN '&ref=home' ELSE '' END) ||
             |    (CASE WHEN doc_id % 5 = 1 THEN '&b=2&a=1' ELSE '&a=1&b=2' END) ||
             |    (CASE WHEN doc_id % 8 = 0 THEN '#frag' ELSE '' END) AS url
             |  FROM documents),
             |parts AS (
             |  SELECT doc_id, url,
             |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             |    regexp_replace(lower(regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\.', '') AS host0,
             |    regexp_replace(regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
             |    array_to_string(list_sort(list_filter(
             |      string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
             |      p -> p <> '' AND NOT regexp_matches(p,
             |             '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS qs
             |  FROM u),
             |canon AS (
             |  SELECT doc_id, url,
             |    scheme || '://' ||
             |    (CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
             |          WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
             |          ELSE host0 END) ||
             |    path ||
             |    (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canon_url
             |  FROM parts)
             |SELECT doc_id, url, canon_url,
             |  doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep,
             |  count(*) OVER (PARTITION BY canon_url) AS group_n
             |FROM canon ORDER BY doc_id""".stripMargin)),

    // -- KMV sketch set operations: corpus-overlap matrix --------------------
    // Sketch.kmvSetOps: which language sub-corpora share vocabulary, from
    // k-min-value sketches alone (theta-sketch estimators: union via the
    // k-th smallest merged hash, Jaccard via matching-minima, intersection
    // as their product). The corpus is read ONCE to build G sketches; the
    // G² pair comparisons then work on k-row sketches — the shape that
    // makes snapshot-overlap matrices feasible at 100 TB. Deterministic,
    // so the ESTIMATES have an exact DuckDB oracle (unsaturated pairs are
    // exact set algebra).
    QueryDef("p42_kmv_setops",
      (s, d) => {
        import s.implicits._
        val toks = t(s, d, "documents")
          .select($"lang", explode(split(lower($"text"), "\\s+")).as("token"))
          .filter(length($"token") > 0)
        graft.ops.Sketch.kmvSetOps(toks, "lang", "token", k = 64)
          .orderBy($"lang_a", $"lang_b")
      },
      Some("""WITH toks AS (
             |  SELECT lang,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
             |  FROM documents),
             |hashed AS (
             |  SELECT DISTINCT lang, CAST('0x' || substring(md5(token), 1, 15) AS BIGINT) AS h
             |  FROM toks),
             |kept AS (
             |  SELECT lang, h FROM hashed
             |  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h) <= 64),
             |langs AS (SELECT DISTINCT lang FROM kept),
             |pairs AS (
             |  SELECT a.lang AS la, b.lang AS lb FROM langs a, langs b WHERE a.lang < b.lang),
             |unioned AS (
             |  SELECT DISTINCT p.la, p.lb, k.h
             |  FROM pairs p JOIN kept k ON k.lang = p.la OR k.lang = p.lb),
             |uk AS (
             |  SELECT la, lb, h FROM unioned
             |  QUALIFY row_number() OVER (PARTITION BY la, lb ORDER BY h) <= 64),
             |agg AS (
             |  SELECT u.la, u.lb, CAST(count(*) AS BIGINT) AS n_kept,
             |    max(u.h) AS theta,
             |    sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_both
             |  FROM uk u
             |  LEFT JOIN kept a ON a.lang = u.la AND a.h = u.h
             |  LEFT JOIN kept b ON b.lang = u.lb AND b.h = u.h
             |  GROUP BY u.la, u.lb),
             |est AS (
             |  SELECT la, lb, n_kept,
             |    CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
             |         ELSE 63.0 * 1152921504606846976.0 / CAST(theta AS DOUBLE) END AS u_raw,
             |    CAST(n_both AS DOUBLE) / n_kept AS j_raw
             |  FROM agg)
             |SELECT la AS lang_a, lb AS lang_b, n_kept,
             |  round(u_raw, 4) AS est_union,
             |  round(j_raw, 4) AS est_jaccard,
             |  round(j_raw * u_raw, 2) AS est_intersection
             |FROM est ORDER BY lang_a, lang_b""".stripMargin)),

    // -- importance-weighted sampling ----------------------------------------
    // Sampling.weightedSample: P(keep) = min(n_chars, cap)/cap — the
    // quality-weighted subsample (long docs survive outright, the short
    // tail thins proportionally). Pure INTEGER hash-vs-weight comparison:
    // no float threshold for engines to disagree over, reproducible under
    // task retry, and still a single scan-side filter (no shuffle).
    QueryDef("p43_weighted_sample",
      (s, d) => {
        import s.implicits._
        graft.ops.Sampling.weightedSample(
          t(s, d, "documents").select($"doc_id", $"source", $"n_chars"),
          "doc_id", "n_chars", cap = 400)
          .orderBy($"doc_id")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(('0x' || substring(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 400 AS wbucket
             |  FROM documents)
             |SELECT doc_id, source, n_chars, wbucket
             |FROM b WHERE wbucket < least(n_chars, 400)
             |ORDER BY doc_id""".stripMargin)),

    // -- overlapping sliding-window chunking ---------------------------------
    // TextOps.slidingChunks(32, 24): the RAG/long-context chunk unit — 8
    // tokens of overlap between neighbors so no fact is severed at a chunk
    // boundary. Chunk counts and boundaries are exact integer arithmetic;
    // chunk content is pinned by md5 so the oracle proves byte-identical
    // chunking. One scan, per-row transform+explode, no shuffle.
    QueryDef("p44_chunk_overlap",
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select($"doc_id",
            explode(graft.ops.TextOps.slidingChunks($"text", 32, 24)).as("c"))
          .select($"doc_id", $"c.chunk_idx", $"c.n_tok", md5($"c.chunk").as("chunk_md5"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS words
             |  FROM documents),
             |n AS (SELECT doc_id, words, len(words) AS nw FROM toks WHERE len(words) > 0),
             |idx AS (
             |  SELECT doc_id, words, nw,
             |    unnest(range(0, 1 + (CASE WHEN nw <= 32 THEN 0
             |      ELSE CAST(floor((nw - 32 + 23) / 24.0) AS INT) END))) AS chunk_idx
             |  FROM n)
             |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             |  CAST(len(list_slice(words, chunk_idx*24 + 1, chunk_idx*24 + 32)) AS INT) AS n_tok,
             |  md5(array_to_string(list_slice(words, chunk_idx*24 + 1, chunk_idx*24 + 32), ' ')) AS chunk_md5
             |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin)),

    // -- expectation checks (data-validation gate) ---------------------------
    // Validate.check: the pre/post-stage QA gate — null budgets, value
    // ranges, key uniqueness, domain membership, referential integrity —
    // each rule one auditable report row. ALL column rules over a table
    // fold into ONE HashAggregate pass (conditional sums), so adding rules
    // never adds scans; the FK check is a single anti-join count. The gate
    // costs one read of each guarded table at any scale.
    QueryDef("p45_expectations",
      (s, d) => {
        import s.implicits._
        import graft.ops.Validate
        import graft.ops.Validate.{Rule, countWhere}
        val li = t(s, d, "lineitem")
        val docs = t(s, d, "documents")
        val liRules = Seq(
          Rule("li_quantity_range", countWhere($"l_quantity" < 1 || $"l_quantity" > 50), 0L),
          Rule("li_discount_range", countWhere($"l_discount" < 0 || $"l_discount" > 0.10), 0L),
          Rule("li_null_orderkey", countWhere($"l_orderkey".isNull), 0L),
          Rule("li_nonpositive_price", countWhere($"l_extendedprice" <= 0), 0L))
        val docRules = Seq(
          Rule("doc_pk_dup", count(lit(1)) - countDistinct($"doc_id"), 0L),
          Rule("doc_empty_text", countWhere(length(coalesce($"text", lit(""))) === 0), 0L),
          Rule("doc_lang_domain", countWhere(!$"lang".isin("en", "de", "es", "fr", "zh")), 0L))
        val fk = Validate.fkViolations(li, "l_orderkey", t(s, d, "orders"), "o_orderkey")
        val fkRow = Seq(("fk_lineitem_orders", fk, 0L, fk <= 0L))
          .toDF("rule", "observed", "threshold", "passed")
        Validate.check(li, liRules)
          .union(Validate.check(docs, docRules))
          .union(fkRow)
          .orderBy($"rule")
      },
      Some("""WITH li AS (
             |  SELECT
             |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS li_quantity_range,
             |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.10 THEN 1 ELSE 0 END) AS BIGINT) AS li_discount_range,
             |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS li_null_orderkey,
             |    CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS li_nonpositive_price
             |  FROM lineitem),
             |docs AS (
             |  SELECT
             |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS doc_pk_dup,
             |    CAST(sum(CASE WHEN length(coalesce(text, '')) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS doc_empty_text,
             |    CAST(sum(CASE WHEN lang NOT IN ('en', 'de', 'es', 'fr', 'zh') THEN 1 ELSE 0 END) AS BIGINT) AS doc_lang_domain
             |  FROM documents),
             |fk AS (
             |  SELECT CAST(count(*) AS BIGINT) AS v
             |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL),
             |rows AS (
             |  SELECT 'li_quantity_range' AS rule, (SELECT li_quantity_range FROM li) AS observed
             |  UNION ALL SELECT 'li_discount_range', (SELECT li_discount_range FROM li)
             |  UNION ALL SELECT 'li_null_orderkey', (SELECT li_null_orderkey FROM li)
             |  UNION ALL SELECT 'li_nonpositive_price', (SELECT li_nonpositive_price FROM li)
             |  UNION ALL SELECT 'doc_pk_dup', (SELECT doc_pk_dup FROM docs)
             |  UNION ALL SELECT 'doc_empty_text', (SELECT doc_empty_text FROM docs)
             |  UNION ALL SELECT 'doc_lang_domain', (SELECT doc_lang_domain FROM docs)
             |  UNION ALL SELECT 'fk_lineitem_orders', (SELECT v FROM fk))
             |SELECT rule, observed, CAST(0 AS BIGINT) AS threshold,
             |  observed <= 0 AS passed
             |FROM rows ORDER BY rule""".stripMargin)),

    // -- exact table profile (the host engine's SUMMARIZE) -------------------
    // Validate.profile: per-column null count, EXACT distinct count, min and
    // max in one aggregate pass (Spark's Expand-based multi-distinct — k
    // profiled columns still read the table once). Exact countDistinct
    // instead of SUMMARIZE's HLL keeps the profile itself oracle-able.
    QueryDef("p46_profile",
      (s, d) =>
        graft.ops.Validate.profile(
            t(s, d, "lineitem"),
            Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"))
          .orderBy(col("col_name")),
      Some("""SELECT 'l_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
             |  CAST(min(l_orderkey) AS VARCHAR) AS min_v, CAST(max(l_orderkey) AS VARCHAR) AS max_v
             |FROM lineitem
             |UNION ALL
             |SELECT 'l_linenumber', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(count(DISTINCT l_linenumber) AS BIGINT),
             |  CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
             |FROM lineitem
             |UNION ALL
             |SELECT 'l_quantity', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(count(DISTINCT l_quantity) AS BIGINT),
             |  CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
             |FROM lineitem
             |UNION ALL
             |SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(count(DISTINCT l_returnflag) AS BIGINT),
             |  CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
             |FROM lineitem
             |UNION ALL
             |SELECT 'l_linestatus', CAST(count(*) AS BIGINT),
             |  CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(count(DISTINCT l_linestatus) AS BIGINT),
             |  CAST(min(l_linestatus) AS VARCHAR), CAST(max(l_linestatus) AS VARCHAR)
             |FROM lineitem
             |ORDER BY col_name""".stripMargin)),

    // -- incremental ingest dedup ---------------------------------------------
    // Dedup.incrementalStatus: the 100 TB operating mode — a standing corpus
    // is never re-deduplicated; the new DELTA dedups against the corpus's
    // digest INDEX (index scale, not corpus scale) and against itself.
    // Docs < 250 play the standing corpus; the rest is the delta with
    // planted corpus-dups (>= 450 reuse an ingested text) and intra-delta
    // dups (430..449 reuse an earlier delta text). One broadcast-able index
    // join + one keeper window.
    QueryDef("p47_incremental_dedup",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents").select($"doc_id", $"text")
        val src = docs.select($"doc_id".as("b_id"), $"text".as("b_text"))
        val delta = docs.filter($"doc_id" >= 250)
          .withColumn("ref_id",
            when($"doc_id" >= 450, $"doc_id" - 300)
              .when($"doc_id" >= 430, $"doc_id" - 20)
              .otherwise(lit(null).cast("long")))
          .join(src, $"ref_id" === $"b_id", "left")
          .select($"doc_id", coalesce($"b_text", $"text").as("text"))
        val seen = docs.filter($"doc_id" < 250).select(md5($"text").as("digest"))
        graft.ops.Dedup.incrementalStatus(delta, "doc_id", "text", seen, "digest")
          .select($"doc_id", $"digest", $"status")
          .orderBy($"doc_id")
      },
      Some("""WITH src AS (SELECT doc_id AS b_id, text AS b_text FROM documents),
             |delta AS (
             |  SELECT d.doc_id, coalesce(b.b_text, d.text) AS text
             |  FROM documents d LEFT JOIN src b
             |    ON b.b_id = (CASE WHEN d.doc_id >= 450 THEN d.doc_id - 300
             |                      WHEN d.doc_id >= 430 THEN d.doc_id - 20 END)
             |  WHERE d.doc_id >= 250),
             |seen AS (SELECT DISTINCT md5(text) AS digest
             |         FROM documents WHERE doc_id < 250),
             |st AS (
             |  SELECT dl.doc_id, md5(dl.text) AS digest,
             |         s.digest IS NOT NULL AS in_corpus
             |  FROM delta dl LEFT JOIN seen s ON md5(dl.text) = s.digest)
             |SELECT doc_id, digest,
             |  CASE WHEN in_corpus THEN 'dup_of_corpus'
             |       WHEN doc_id <> min(doc_id) OVER (PARTITION BY digest)
             |         THEN 'dup_in_delta'
             |       ELSE 'new' END AS status
             |FROM st ORDER BY doc_id""".stripMargin)),

    // CCNet-style LM quality filter: a character-trigram model trained on
    // the corpus itself scores each document's mean negative log-likelihood.
    // Alphabet normalization bounds the model at 37^3 trigrams regardless of
    // corpus size; two map-side-partial aggregations + one broadcast join +
    // one per-doc shuffle row. Per-term logs round to 6 dp pre-sum — the
    // cross-engine float-order determinism contract (see TextOps.charLmScore).
    QueryDef("p48_charlm_quality",
      (s, d) => {
        import s.implicits._
        TextOps.charLmScore(t(s, d, "documents"), "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some(charLmOracleSql)),

    // -- Gopher-style word-shape gate ---------------------------------------
    // The word-level half of the Gopher quality rules (the repetition half
    // is p27, the punctuation/length half is p02/p03): word-count bounds,
    // mean word length in [3, 10], fraction of words containing an
    // alphabetic character, and a minimum stopword presence. All per-row
    // expressions — integer sums divided once, rounded once, and the SAME
    // rounded value feeds both engines' keep verdicts, so the gate can sit
    // threshold-exact on a 4-dp boundary without splitting.
    QueryDef("p53_gopher_gate",
      (s, d) => {
        import s.implicits._
        TextOps.gopherGate(t(s, d, "documents"), "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS w,
             |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS wl
             |  FROM documents),
             |st AS (
             |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             |    round(CASE WHEN len(w) > 0 THEN
             |      CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w)
             |      ELSE 0.0 END, 4) AS mean_word_len,
             |    round(CASE WHEN len(w) > 0 THEN
             |      CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w)
             |      ELSE 0.0 END, 4) AS frac_alpha_words,
             |    CAST(len(list_filter(wl, t -> list_contains($StopEnSql, t))) AS BIGINT)
             |      AS n_stopwords
             |  FROM base)
             |SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stopwords,
             |  CAST(n_words >= 15 AND n_words <= 100000
             |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
             |    AND frac_alpha_words >= 0.8 AND n_stopwords >= 2 AS INT) AS keep
             |FROM st ORDER BY doc_id""".stripMargin)),

    // -- binary sign quantization + Hamming top-k ANN -----------------------
    // The "binary embedding" retrieval stage: 64 float dims → two packed
    // BIGINT words (Similarity.signWord — unrolled element_at arithmetic,
    // whole-stage codegen), exact Hamming rerank = XOR + POPCNT per word.
    // Integer-only end to end, so unlike the cosine family the SCORE needs
    // no rounding contract — both engines rank on identical longs.
    QueryDef("p54_hamming_ann",
      (s, d) => Similarity.hammingTopK(t(s, d, "embeddings"), "vec_id", "embedding",
          col("vec_id") < 10, k = 10, dim = 64)
        .orderBy(col("qid"), col("rank")),
      Some("""WITH p AS (
             |  SELECT vec_id,
             |    CAST(list_sum(list_transform(range(0, 32),
             |      i -> CASE WHEN embedding[i + 1] >= 0 THEN (1::BIGINT << i)
             |                ELSE 0::BIGINT END)) AS BIGINT) AS w0,
             |    CAST(list_sum(list_transform(range(0, 32),
             |      i -> CASE WHEN embedding[i + 33] >= 0 THEN (1::BIGINT << i)
             |                ELSE 0::BIGINT END)) AS BIGINT) AS w1
             |  FROM embeddings),
             |q AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM p WHERE vec_id < 10)
             |SELECT qid, CAST(row_number() OVER win AS INT) AS rank, nid,
             |  CAST(bit_count(xor(qw0, nw0)) + bit_count(xor(qw1, nw1)) AS BIGINT) AS hamming
             |FROM (SELECT vec_id AS nid, w0 AS nw0, w1 AS nw1 FROM p) c
             |CROSS JOIN q WHERE qid <> nid
             |WINDOW win AS (PARTITION BY qid
             |  ORDER BY bit_count(xor(qw0, nw0)) + bit_count(xor(qw1, nw1)), nid)
             |QUALIFY row_number() OVER win <= 10
             |ORDER BY qid, rank""".stripMargin)),

    // -- cross-corpus near-dup decontamination ------------------------------
    // p20 catches EXACT 8-word-shingle overlap with the eval split; this is
    // its near-dup twin — the same MinHash band index the intra-corpus
    // dedup uses (Dedup.bandBuckets), but joined TRAIN × EVAL, then
    // exact-Jaccard verified. The shuffle carries (band, bucket) rows, the
    // (always small) eval band index broadcasts, and only band-collision
    // pairs pay the shingle-set intersect — the decontamination pass a
    // 100 TB pretraining corpus runs against its eval suites before
    // training.
    QueryDef("p55_decontaminate_neardup",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        Dedup.decontaminationPairs(docs.filter($"doc_id" % 97 =!= 0),
            docs.filter($"doc_id" % 97 === 0), "doc_id", "text")
          .withColumn("contaminated", ($"jaccard" >= 0.5).cast("int"))
          .orderBy($"a", $"b")
      },
      Some {
        s"""WITH $bandCtesSql,
           |cand AS (
           |  SELECT l.doc AS a, r.doc AS b, CAST(count(*) AS BIGINT) AS n_bands
           |  FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
           |  WHERE l.doc % 97 <> 0 AND r.doc % 97 = 0
           |  GROUP BY l.doc, r.doc),
           |shd AS (
           |  SELECT doc_id AS doc, list_transform(list_distinct(
           |    list_transform(generate_series(1, greatest(length(text) - 4, 1)),
           |                   i -> substring(text, i, 5))),
           |    x -> CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)) AS shingles
           |  FROM documents),
           |v AS (
           |  SELECT a, b, n_bands,
           |    round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
           |      (len(sa.shingles) + len(sb.shingles)
           |       - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
           |  FROM cand
           |  JOIN shd sa ON sa.doc = a
           |  JOIN shd sb ON sb.doc = b)
           |SELECT a, b, n_bands, jaccard,
           |  CAST(jaccard >= 0.5 AS INT) AS contaminated
           |FROM v ORDER BY a, b""".stripMargin
      }),

    // -- dataset snapshot diff (versioning audit) ---------------------------
    // The "previous snapshot" is synthesized deterministically from the
    // current corpus: docs with id%11=0 are absent from it (-> added now),
    // id%7=0 carry a different content digest (-> changed), and clones at
    // id+1000000 for id%13=0 exist only in it (-> removed); everything
    // else is byte-identical (-> same). Both engines build the identical
    // old snapshot, so the diff is exactly oracled.
    QueryDef("p59_snapshot_diff",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val old = docs.filter($"doc_id" % 11 =!= 0)
          .select($"doc_id",
            when($"doc_id" % 7 === 0, concat($"text", lit("|v0")))
              .otherwise($"text").as("text"))
          .unionByName(docs.filter($"doc_id" % 13 === 0)
            .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
        Dedup.snapshotDiff(docs, old, "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some("""WITH old AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || '|v0' ELSE text END AS text
             |  FROM documents WHERE doc_id % 11 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
             |  WHERE doc_id % 13 = 0),
             |n AS (SELECT doc_id, md5(text) AS dg_new FROM documents),
             |o AS (SELECT doc_id, md5(text) AS dg_old FROM old)
             |SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
             |  CASE WHEN o.dg_old IS NULL THEN 'added'
             |       WHEN n.dg_new IS NULL THEN 'removed'
             |       WHEN n.dg_new <> o.dg_old THEN 'changed'
             |       ELSE 'same' END AS status
             |FROM n FULL OUTER JOIN o ON n.doc_id = o.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // -- corpus drift monitor (PSI between snapshots) -----------------------
    // Pairs with p59: the same synthetic old snapshot, but instead of a
    // row diff, a distribution diff — population stability index over
    // fixed char-length and word-count bins. Laplace-smoothed, each bin
    // term quantized to micro-units pre-sum (p58 discipline).
    QueryDef("p60_drift_psi",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val old = docs.filter($"doc_id" % 11 =!= 0)
          .select($"doc_id",
            when($"doc_id" % 7 === 0, concat($"text", lit("|v0")))
              .otherwise($"text").as("text"))
          .unionByName(docs.filter($"doc_id" % 13 === 0)
            .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
        def feats(src: org.apache.spark.sql.DataFrame) =
          src.selectExpr("'chars' AS feature",
              "CAST(least(length(text) div 100, 4) AS BIGINT) AS bin")
            .unionByName(src.selectExpr("'words' AS feature",
              "CAST(least(size(filter(split(text, '\\\\s+'), t -> length(t) > 0)) div 20, 4) AS BIGINT) AS bin"))
        graft.ops.Validate.psiDrift(feats(docs), feats(old), nBins = 5)
          .orderBy($"feature")
      },
      Some("""WITH old AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || '|v0' ELSE text END AS text
             |  FROM documents WHERE doc_id % 11 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
             |  WHERE doc_id % 13 = 0),
             |fc AS (
             |  SELECT 'chars' AS feature, CAST(least(length(text) // 100, 4) AS BIGINT) AS bin
             |  FROM documents
             |  UNION ALL
             |  SELECT 'words', CAST(least(len(list_filter(string_split_regex(text, '\s+'),
             |    x -> len(x) > 0)) // 20, 4) AS BIGINT) FROM documents),
             |fo AS (
             |  SELECT 'chars' AS feature, CAST(least(length(text) // 100, 4) AS BIGINT) AS bin
             |  FROM old
             |  UNION ALL
             |  SELECT 'words', CAST(least(len(list_filter(string_split_regex(text, '\s+'),
             |    x -> len(x) > 0)) // 20, 4) AS BIGINT) FROM old),
             |cc AS (SELECT feature, bin, CAST(count(*) AS BIGINT) AS cn FROM fc GROUP BY 1, 2),
             |cold AS (SELECT feature, bin, CAST(count(*) AS BIGINT) AS co FROM fo GROUP BY 1, 2),
             |jc AS (
             |  SELECT COALESCE(cc.feature, cold.feature) AS feature,
             |    COALESCE(cc.bin, cold.bin) AS bin,
             |    COALESCE(cn, 0) AS cn, COALESCE(co, 0) AS co
             |  FROM cc FULL OUTER JOIN cold
             |    ON cc.feature = cold.feature AND cc.bin = cold.bin),
             |grid AS (
             |  SELECT feature, CAST(range AS BIGINT) AS bin
             |  FROM (SELECT DISTINCT feature FROM jc), range(0, 5)),
             |j AS (
             |  SELECT COALESCE(g.feature, jc.feature) AS feature,
             |    COALESCE(g.bin, jc.bin) AS bin,
             |    COALESCE(jc.cn, 0) AS cn, COALESCE(jc.co, 0) AS co
             |  FROM grid g FULL OUTER JOIN jc
             |    ON g.feature = jc.feature AND g.bin = jc.bin),
             |tot AS (SELECT feature, CAST(sum(cn) AS BIGINT) AS nn,
             |               CAST(sum(co) AS BIGINT) AS no
             |        FROM j GROUP BY 1),
             |terms AS (
             |  SELECT j.feature, nn, no,
             |    CAST(round(((cn + 1.0) / (nn + 5.0) - (co + 1.0) / (no + 5.0))
             |      * ln(((cn + 1.0) / (nn + 5.0)) / ((co + 1.0) / (no + 5.0)))
             |      * 1000000.0) AS BIGINT) AS ppm
             |  FROM j JOIN tot USING (feature))
             |SELECT feature, nn AS n_cur, no AS n_old,
             |  round(CAST(sum(ppm) AS BIGINT) / 1000000.0, 4) AS psi
             |FROM terms GROUP BY feature, nn, no
             |ORDER BY feature""".stripMargin)),

    // -- BM25 top-k keyword retrieval ---------------------------------------
    // The curation pipeline's topical-slice puller. Exactness contract:
    // per-term contributions quantize to integer micro-units BEFORE the
    // per-(query, doc) sum (order-independent integer arithmetic; the rank
    // key IS the integer), so only single ln/division expressions cross
    // engines as doubles. Query 3 mixes the corpus's one rare term with a
    // common one — the idf split BM25 exists for.
    QueryDef("p58_bm25_topk",
      (s, d) => TextOps.bm25TopK(t(s, d, "documents"), "doc_id", "text",
          bm25Queries, topK = 10)
        .orderBy(col("qid"), col("rank")),
      Some(bm25OracleSql)),

    // -- directional containment (doc-in-doc detection) ---------------------
    // Broder's asymmetric containment over the p04 candidate pairs:
    // |A∩B|/|A| catches a small document embedded in a larger one (quotes,
    // boilerplate, licence blocks) where symmetric Jaccard dilutes toward
    // zero as the host grows. Same banded index, one intersect per pair,
    // both denominators off it.
    QueryDef("p57_containment",
      (s, d) => {
        import s.implicits._
        Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text")
          .withColumn("contained",
            (greatest($"cont_a_in_b", $"cont_b_in_a") >= 0.9).cast("int"))
          .orderBy($"a", $"b")
      },
      Some(s"""WITH cand AS ($minhashCandidatesSql),
             |shd AS (
             |  SELECT doc_id AS doc, list_transform(list_distinct(
             |    list_transform(generate_series(1, greatest(length(text) - 4, 1)),
             |                   i -> substring(text, i, 5))),
             |    x -> CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)) AS shingles
             |  FROM documents),
             |v AS (
             |  SELECT a, b, n_bands,
             |    round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             |          / len(sa.shingles), 4) AS cont_a_in_b,
             |    round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             |          / len(sb.shingles), 4) AS cont_b_in_a
             |  FROM cand
             |  JOIN shd sa ON sa.doc = a
             |  JOIN shd sb ON sb.doc = b)
             |SELECT a, b, n_bands, cont_a_in_b, cont_b_in_a,
             |  CAST(greatest(cont_a_in_b, cont_b_in_a) >= 0.9 AS INT) AS contained
             |FROM v ORDER BY a, b""".stripMargin)),

    // -- deterministic shard writer + manifest ------------------------------
    // Side-effecting like q27: writes the corpus as shard=N/ parquet
    // partitions into a temp dir, recomputes the manifest from the WRITTEN
    // files, and cross-checks it against the pre-write plan (counts_match
    // is a witness column — Verify hard-fails if the roundtrip drops or
    // mangles a row). The oracle recomputes the same manifest arithmetic
    // straight from the source table.
    QueryDef("p56_shard_manifest",
      (s, d) => graft.ops.Layout.shardManifest(
        t(s, d, "documents"), "doc_id", "text", nShards = 8),
      Some("""WITH staged AS (
             |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 8 AS shard,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15)) AS BIGINT)
             |      % 1073741824 AS dg,
             |    len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS nw,
             |    length(text) AS nc
             |  FROM documents)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(nw) AS BIGINT) AS n_words,
             |  CAST(sum(nc) AS BIGINT) AS n_chars,
             |  CAST(sum(dg) AS BIGINT) AS digest,
             |  1 AS counts_match
             |FROM staged GROUP BY shard ORDER BY shard""".stripMargin))
  ,

    QueryDef("p85_card_redact",
      (s, d) => {
        import s.implicits._
        // Luhn-VALIDATED payment-card redaction (TextOps.redactCards):
        // the precision layer a naive digit-run regex lacks — each doc
        // gets one genuinely valid test card (by doc_id % 3, three
        // separator styles) and one near-miss whose checksum fails; the
        // scrub must redact exactly the valid one and leave the invoice-
        // number-shaped impostor intact. Pure codegen'd HOF expressions
        // per row, no UDF, no shuffle; the oracle re-runs the identical
        // checksum arithmetic and fold in SQL.
        val card = expr("""CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN '4111 1111 1111 1111'
          WHEN 1 THEN '5500-0000-0000-0004'
          ELSE '340000000000009' END""")
        val aug = concat($"text", lit(" pay "), card,
          lit(" ref 4111111111111112"))
        t(s, d, "documents").select($"doc_id", aug.as("a"))
          .select($"doc_id",
            size(graft.ops.TextOps.cardCandidates($"a")).cast("int").as("n_candidates"),
            size(graft.ops.TextOps.validCards($"a")).cast("int").as("n_valid"),
            md5(graft.ops.TextOps.redactCards($"a")).as("redacted_digest"))
          .orderBy($"doc_id")
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text || ' pay ' ||
             |    CASE CAST(doc_id % 3 AS INT)
             |      WHEN 0 THEN '4111 1111 1111 1111'
             |      WHEN 1 THEN '5500-0000-0000-0004'
             |      ELSE '340000000000009' END ||
             |    ' ref 4111111111111112' AS a
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, a,
             |    list_distinct(regexp_extract_all(a, '\b(\d[ -]?){12,18}\d\b')) AS cands
             |  FROM aug),
             |v AS (
             |  SELECT doc_id, a, cands,
             |    list_filter(cands, cd ->
             |      list_sum(list_transform(
             |        generate_series(1, len(replace(replace(cd, ' ', ''), '-', ''))),
             |        i -> CASE WHEN i % 2 = 0 THEN
             |               CASE WHEN CAST(substring(reverse(replace(replace(cd, ' ', ''), '-', '')), i, 1) AS INT) * 2 > 9
             |                    THEN CAST(substring(reverse(replace(replace(cd, ' ', ''), '-', '')), i, 1) AS INT) * 2 - 9
             |                    ELSE CAST(substring(reverse(replace(replace(cd, ' ', ''), '-', '')), i, 1) AS INT) * 2 END
             |             ELSE CAST(substring(reverse(replace(replace(cd, ' ', ''), '-', '')), i, 1) AS INT) END)) % 10 = 0) AS valids
             |  FROM c)
             |SELECT doc_id,
             |  CAST(len(cands) AS INT) AS n_candidates,
             |  CAST(len(valids) AS INT) AS n_valid,
             |  md5(list_reduce(list_prepend(a, valids),
             |    (acc, cd) -> regexp_replace(acc, '\b' || cd || '\b',
             |                                '[CARD]', 'g'))) AS redacted_digest
             |FROM v ORDER BY doc_id""".stripMargin)),

    QueryDef("p84_exact_k_sample",
      (s, d) => {
        import s.implicits._
        // exact-k-per-stratum deterministic sample — the eval-set /
        // calibration-set constructor ("exactly 40 docs per language,
        // reproducible forever"): selection order is a salted md5 hash,
        // so membership is a pure function of content keys (engine- and
        // retry-stable, unlike df.sample), and the per-stratum top-k runs
        // through the bounded TopKMinPairs aggregate — each map task
        // ships <= k pairs per stratum, where the row_number() spelling
        // would pull every stratum's full population through one reducer
        // (the p18/p54 scale argument, applied to sampling).
        val k = 40
        val hashed = t(s, d, "documents").select($"lang", $"doc_id",
          conv(substring(md5(concat($"doc_id".cast("string"), lit("|rsv"))),
            1, 15), 16, 10).cast("long").as("h"))
        hashed.groupBy($"lang")
          .agg(graft.functions.TopKMinPairs(s, $"h", $"doc_id", k).as("tk"))
          .select($"lang", posexplode($"tk"))
          .select($"lang", (col("pos") + 1).cast("int").as("rank"),
            $"col.id".cast("long").as("doc_id"))
          .orderBy($"lang", $"rank")
      },
      Some("""SELECT lang, CAST(row_number() OVER w AS INT) AS rank, doc_id
             |FROM (SELECT lang, doc_id,
             |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|rsv'), 1, 15)) AS BIGINT) AS h
             |      FROM documents)
             |WINDOW w AS (PARTITION BY lang ORDER BY h, doc_id)
             |QUALIFY row_number() OVER w <= 40
             |ORDER BY lang, rank""".stripMargin)),

    QueryDef("p83_compaction_plan",
      (s, d) => {
        import s.implicits._
        // size-tiered compaction planning (Layout.compactionPlan): the
        // OPTIMIZE pass of a long-lived table, planned over a synthetic
        // file LISTING derived from documents (8 partition dirs,
        // char-length-keyed sizes spanning well under and over the
        // 250 KB target). Exact integer windows → hash-identical plan
        // on both engines.
        val listing = t(s, d, "documents").select(
          concat(lit("part="), ($"doc_id" % 8).cast("string")).as("dir"),
          concat(lit("f"), $"doc_id".cast("string")).as("file"),
          (pmod(length($"text").cast("long") * 37L, lit(9999983L)) + 1L).as("size"))
        graft.ops.Layout.compactionPlan(listing, "dir", "file", "size",
            targetBytes = 250000L)
          .orderBy($"dir", $"file")
      },
      Some("""WITH f AS (
             |  SELECT 'part=' || CAST(doc_id % 8 AS VARCHAR) AS dir,
             |    'f' || CAST(doc_id AS VARCHAR) AS file,
             |    CAST((length(text) * 37) % 9999983 + 1 AS BIGINT) AS size
             |  FROM documents),
             |w AS (
             |  SELECT dir, file, size,
             |    coalesce(sum(CASE WHEN size < 250000 THEN size ELSE 0 END)
             |      OVER (PARTITION BY dir ORDER BY size DESC, file ASC
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0) AS cumb
             |  FROM f),
             |b AS (
             |  SELECT dir, file, size,
             |    CASE WHEN size < 250000 THEN cumb // 250000 END AS bin0
             |  FROM w),
             |c AS (
             |  SELECT dir, file, size, bin0,
             |    count(*) OVER (PARTITION BY dir, bin0) AS nb
             |  FROM b)
             |SELECT dir, file, size,
             |  CASE WHEN bin0 IS NOT NULL AND nb >= 2
             |       THEN 'compact' ELSE 'keep' END AS action,
             |  CAST(CASE WHEN bin0 IS NOT NULL AND nb >= 2
             |       THEN bin0 END AS BIGINT) AS bin
             |FROM c ORDER BY dir, file""".stripMargin))
  ,

    // -- DSIR data selection (Xie et al. 2023) ------------------------------
    QueryDef("p79_dsir_select",
      (s, d) => {
        import s.implicits._
        // target distribution = the English subset (the "trusted corpus"
        // role); every document scored by the hashed-bigram log-likelihood
        // ratio target-vs-raw. keep = "more target-like than raw-average",
        // thresholded on the ROUNDED score so both engines gate the same
        // value they emit.
        val docs = t(s, d, "documents")
        val scored = graft.ops.Sampling.dsirScores(
          docs.withColumn("is_en", $"lang" === "en"),
          "doc_id", "text", "is_en")
        docs.select($"doc_id").join(scored, $"doc_id" === scored("id"), "left")
          .select($"doc_id",
            coalesce($"n_feats", lit(0L)).as("n_feats"),
            coalesce(round($"score", 4), lit(0.0)).as("score"),
            coalesce(round($"score", 4) > 0, lit(false)).as("keep"))
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ts
             |  FROM documents),
             |bi AS (
             |  SELECT doc_id, lang = 'en' AS is_target,
             |    CAST(('0x' || substring(md5(bg), 1, 15)) AS BIGINT) % 4096 AS h
             |  FROM (SELECT doc_id, lang,
             |          unnest(list_transform(generate_series(1, len(ts) - 1),
             |                 i -> ts[i] || ' ' || ts[i + 1])) AS bg
             |        FROM toks) u),
             |tot AS (
             |  SELECT count(*) AS r,
             |    count(*) FILTER (WHERE is_target) AS t FROM bi),
             |cnt AS (
             |  SELECT h, count(*) AS nr,
             |    count(*) FILTER (WHERE is_target) AS nt FROM bi GROUP BY h),
             |lr AS (
             |  SELECT h, ln((nt + 1) / CAST(t + 4096 AS DOUBLE))
             |            - ln((nr + 1) / CAST(r + 4096 AS DOUBLE)) AS lrv
             |  FROM cnt CROSS JOIN tot),
             |dh AS (SELECT doc_id, h, count(*) AS n FROM bi GROUP BY doc_id, h),
             |sc AS (
             |  SELECT dh.doc_id, sum(dh.n) AS n_feats, sum(dh.n * lr.lrv) AS score
             |  FROM dh JOIN lr USING (h) GROUP BY dh.doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
             |  coalesce(round(sc.score, 4), 0.0) AS score,
             |  coalesce(round(sc.score, 4) > 0, FALSE) AS keep
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin))
  ,

    // -- HyperLogLog distinct sketch (Flajolet et al. 2007) ------------------
    // Two metrics exercise both estimator branches at p=9 (m=512): per-source
    // token vocab (~31 distinct → linear counting m·ln(m/V)) and 5-gram
    // shingle cardinality (~1.5k distinct → the raw harmonic-mean branch).
    // The `__all` rows are NOT computed from the corpus: they are the
    // per-source register tables unioned and merged by elementwise max —
    // while the oracle computes `__all` directly from all values. Their
    // hash-equality IS the mergeability proof. s_scaled is the exact integer
    // harmonic sum Σ 2^(q1-Mj), so every column oracles bit-exactly.
    QueryDef("p87_hll_distinct",
      (s, d) => {
        import s.implicits._
        // Spread.cpu: the explode+hash register pass is CPU-bound; a
        // single-file corpus otherwise runs each union leg on one core
        val docs = graft.ops.Spread.cpu(t(s, d, "documents"))
        val toks = docs.select(lit("token").as("metric"), $"source",
            explode(split(lower($"text"), "\\s+")).as("v"))
          .filter(length($"v") > 0)
        val shingles = docs.select(lit("shingle5").as("metric"), $"source",
          explode(graft.ops.Dedup.shinglesExpr("text", 5)).as("v"))
        val vals = toks.union(shingles)
        val perSrc = graft.ops.Sketch.hllRegisters(
          vals, Seq("metric", "source"), "v", p = 9)
        // merge path: relabel + union; hllEstimate's max-re-aggregation
        // folds the 20 per-source sketches into one __all sketch per metric
        val regs = perSrc.union(perSrc.withColumn("source", lit("__all")))
        val est = graft.ops.Sketch.hllEstimate(regs, Seq("metric", "source"), p = 9)
        val exact = vals.union(vals.withColumn("source", lit("__all")))
          .groupBy($"metric", $"source").agg(countDistinct($"v").as("n_exact"))
        est.join(exact, Seq("metric", "source"))
          .select($"metric", $"source", $"n_exact", $"n_hit", $"v_zero",
            $"s_scaled", $"est_distinct")
          .orderBy($"metric", $"source")
      },
      Some {
        // exact literal mirror of hllEstimate's p=9 constants: alpha·m²
        // (Java shortest-repr round-trips through DuckDB's strtod) and 2^52
        val alphaM2 = 0.7213 / (1 + 1.079 / 512) * 512 * 512
        s"""WITH vals0 AS (
           |  SELECT 'token' AS metric, source,
           |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
           |                       x -> len(x) > 0)) AS v
           |  FROM documents
           |  UNION ALL
           |  SELECT 'shingle5' AS metric, source,
           |    unnest(list_transform(generate_series(1, greatest(length(text) - 4, 1)),
           |                          i -> substring(text, i, 5))) AS v
           |  FROM documents),
           |vals AS (
           |  SELECT * FROM vals0
           |  UNION ALL SELECT metric, '__all' AS source, v FROM vals0),
           |hashed AS (
           |  SELECT metric, source,
           |    CAST(('0x' || substring(md5(v), 1, 15)) AS BIGINT) AS h
           |  FROM vals),
           |reg AS (
           |  SELECT metric, source, h & 511 AS idx,
           |    max(CASE WHEN (h >> 9) = 0 THEN 52
           |             ELSE 52 - len(bin(h >> 9)) END) AS mj
           |  FROM hashed GROUP BY 1, 2, 3),
           |agg AS (
           |  SELECT metric, source,
           |    CAST(count(*) AS INT) AS n_hit,
           |    CAST(sum(CAST(1 AS BIGINT) << (52 - mj)) AS BIGINT) AS s0
           |  FROM reg GROUP BY 1, 2),
           |fin AS (
           |  SELECT metric, source, n_hit,
           |    CAST(512 - n_hit AS INT) AS v_zero,
           |    s0 + (512 - CAST(n_hit AS BIGINT)) * (CAST(1 AS BIGINT) << 52)
           |      AS s_scaled
           |  FROM agg),
           |exact AS (
           |  SELECT metric, source, CAST(count(DISTINCT v) AS BIGINT) AS n_exact
           |  FROM vals GROUP BY 1, 2)
           |SELECT f.metric, f.source, e.n_exact, f.n_hit, f.v_zero, f.s_scaled,
           |  round(CASE WHEN (${alphaM2}e0 * 4503599627370496e0)
           |                    / CAST(f.s_scaled AS DOUBLE) <= 1280.0
           |                  AND f.v_zero > 0
           |             THEN 512.0 * ln(512.0 / f.v_zero)
           |             ELSE (${alphaM2}e0 * 4503599627370496e0)
           |                    / CAST(f.s_scaled AS DOUBLE) END, 4) AS est_distinct
           |FROM fin f JOIN exact e USING (metric, source)
           |ORDER BY metric, source""".stripMargin
      })
  ,

    // -- Equi-width histogram sketch: mergeable quantiles --------------------
    // The quantile analogue of p87: per-event-type 64-bin histograms over
    // events.value; p50/p90/p99 estimated by exact integer rank arithmetic
    // + within-bin interpolation, next to the true interpolated quantile.
    // The __all rows merge the per-type histograms by bin-SUM while the
    // oracle computes them directly — the same hash-equality mergeability
    // proof. At 100 TB this replaces p81's exact path when the value
    // domain is wide: the sketch is one map-side-combined HashAggregate,
    // 64 rows per group, merging across corpora by addition.
    QueryDef("p89_histogram_quantiles",
      (s, d) => {
        import s.implicits._
        val v = t(s, d, "events").select($"event_type", $"value")
        val hist = graft.ops.Sketch.histogramSketch(
          v, Seq("event_type"), "value", lo = 0.0, hi = 512.0, bins = 64)
        val regs = hist.union(hist.withColumn("event_type", lit("__all")))
        val est = graft.ops.Sketch.histogramQuantiles(
          regs, Seq("event_type"), lo = 0.0, hi = 512.0, bins = 64,
          qs = Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")))
        val vAll = v.union(v.withColumn("event_type", lit("__all")))
        val exact = vAll.groupBy($"event_type").agg(
          round(expr("percentile(value, 0.5)"), 4).as("x50"),
          round(expr("percentile(value, 0.9)"), 4).as("x90"),
          round(expr("percentile(value, 0.99)"), 4).as("x99"))
        est.join(exact, "event_type")
          .select($"event_type", $"q", $"n", $"est_q",
            when($"q" === "p50", $"x50").when($"q" === "p90", $"x90")
              .otherwise($"x99").as("exact_q"))
          .orderBy($"event_type", $"q")
      },
      Some("""WITH v AS (SELECT event_type, value FROM events),
             |v2 AS (SELECT event_type, value FROM v
             |       UNION ALL SELECT '__all', value FROM v),
             |h AS (SELECT event_type,
             |        least(greatest(CAST(floor((value - 0.0) / 512.0 * 64) AS INT), 0), 63) AS bin,
             |        CAST(count(*) AS BIGINT) AS cnt
             |      FROM v2 GROUP BY 1, 2),
             |c AS (SELECT event_type, bin, cnt,
             |        CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum
             |      FROM h),
             |t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
             |qs(qnum, qden, q) AS (VALUES (1, 2, 'p50'), (9, 10, 'p90'), (99, 100, 'p99')),
             |pick AS (
             |  SELECT * FROM (
             |    SELECT c.event_type, qs.q, t.n, c.bin, c.cnt, c.cum,
             |      (t.n * qs.qnum + qs.qden - 1) // qs.qden AS r,
             |      row_number() OVER (PARTITION BY c.event_type, qs.q ORDER BY c.bin) AS rn
             |    FROM c JOIN t USING (event_type) CROSS JOIN qs
             |    WHERE c.cum >= (t.n * qs.qnum + qs.qden - 1) // qs.qden)
             |  WHERE rn = 1),
             |ex AS (SELECT event_type,
             |        round(quantile_cont(value, 0.5), 4) AS x50,
             |        round(quantile_cont(value, 0.9), 4) AS x90,
             |        round(quantile_cont(value, 0.99), 4) AS x99
             |      FROM v2 GROUP BY 1)
             |SELECT p.event_type, p.q, p.n,
             |  round(0.0 + (p.bin + (p.r - (p.cum - p.cnt)) / p.cnt) * 8.0, 4) AS est_q,
             |  CASE p.q WHEN 'p50' THEN ex.x50 WHEN 'p90' THEN ex.x90
             |       ELSE ex.x99 END AS exact_q
             |FROM pick p JOIN ex USING (event_type)
             |ORDER BY event_type, q""".stripMargin)),

    // -- Count-min sketch: heavy-hitter frequency estimates ------------------
    // Per-source CMS (depth 4 × width 512 integer cells) over token
    // OCCURRENCES; point estimates for a fixed probe set (7 vocab tokens +
    // one absent) next to exact counts, with the upper-bound property
    // emitted as a Verify-gated witness. __all rows merge per-source
    // sketches by cell-SUM vs the oracle's direct computation. Work after
    // the sketch is groups × probes × depth — never the corpus.
    QueryDef("p90_cms_heavyhitters",
      (s, d) => {
        import s.implicits._
        val toks = t(s, d, "documents")
          .select($"source", explode(split(lower($"text"), "\\s+")).as("v"))
          .filter(length($"v") > 0)
        val cms = graft.ops.Sketch.cmsSketch(
          toks, Seq("source"), "v", depth = 4, width = 512)
        val regs = cms.union(cms.withColumn("source", lit("__all")))
        val probes = p90Probes.toDF("q")
        val est = graft.ops.Sketch.cmsEstimate(
          regs, Seq("source"), probes, depth = 4, width = 512)
        val toksAll = toks.union(toks.withColumn("source", lit("__all")))
        val hits = toksAll.join(broadcast(probes), $"v" === $"q")
          .groupBy($"source", $"q").agg(count(lit(1)).as("__n"))
        val grid = toksAll.select($"source").distinct().crossJoin(broadcast(probes))
        val exact = grid.join(hits, Seq("source", "q"), "left")
          .select($"source", $"q", coalesce($"__n", lit(0L)).as("n_exact"))
        est.join(exact, Seq("source", "q"))
          .select($"source", $"q", $"n_exact", $"est",
            ($"est" >= $"n_exact").as("cms_ge_exact_ok"))
          .orderBy($"source", $"q")
      },
      Some {
        val qvals = p90Probes.map(q => s"('$q')").mkString(", ")
        val rowSel = (0 until 4).map(j =>
          s"SELECT source, $j AS row, CAST(('0x' || substring(md5('$j|' || v), 1, 15)) AS BIGINT) % 512 AS col FROM toks")
          .mkString("\n    UNION ALL ")
        s"""WITH toks0 AS (
           |  SELECT source,
           |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
           |                       x -> len(x) > 0)) AS v
           |  FROM documents),
           |toks AS (SELECT source, v FROM toks0
           |         UNION ALL SELECT '__all', v FROM toks0),
           |qs(q) AS (VALUES $qvals),
           |cms AS (
           |  SELECT source, row, col, CAST(count(*) AS BIGINT) AS cnt FROM (
           |    $rowSel
           |  ) GROUP BY 1, 2, 3),
           |probes AS (
           |  SELECT g.source, qs.q, j.row,
           |    CAST(('0x' || substring(md5(CAST(j.row AS VARCHAR) || '|' || qs.q), 1, 15)) AS BIGINT) % 512 AS col
           |  FROM (SELECT DISTINCT source FROM toks) g
           |  CROSS JOIN qs CROSS JOIN (VALUES (0), (1), (2), (3)) j(row)),
           |est AS (
           |  SELECT p.source, p.q, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
           |  FROM probes p LEFT JOIN cms c
           |    ON c.source = p.source AND c.row = p.row AND c.col = p.col
           |  GROUP BY 1, 2),
           |ex AS (
           |  SELECT g.source, qs.q, CAST(coalesce(c.cnt0, 0) AS BIGINT) AS n_exact
           |  FROM (SELECT DISTINCT source FROM toks) g CROSS JOIN qs
           |  LEFT JOIN (SELECT source, v, count(*) AS cnt0 FROM toks GROUP BY 1, 2) c
           |    ON c.source = g.source AND c.v = qs.q)
           |SELECT e.source, e.q, x.n_exact, e.est, e.est >= x.n_exact AS cms_ge_exact_ok
           |FROM est e JOIN ex x USING (source, q)
           |ORDER BY source, q""".stripMargin
      })
  )

  /** DuckDB mirror of Similarity.ivfCentroids(k=8, iters=2) over
    * `embeddings` plus the final corpus assignment: a WITH-prefix ending in
    * `corp(vec_id, e, cell)`. Shared by p19 (IVF ANN probe) and p49
    * (SemDeDup) so both gate the identical Lloyd mirror.
    */
  private val ivfD2 = "round(list_sum(list_transform(range(1, 65), " +
    "i -> (b.e[i] - c.c[i]) * (b.e[i] - c.c[i]))), 6)"

  /** IVF/SemDeDup cell count: scales with the corpus so the within-cell
    * quadratic stays bounded (~250 vectors per cell — the SemDeDup cost
    * model requires cluster count to GROW with n; a fixed k turns
    * cluster-local into corpus-quadratic: measured 219 s at the 20k-vector
    * local sf1.0 stress vs 2.5 s at 2k). The floor of 8 keeps the sf0.01
    * driver fixture (500 vectors) on exactly the former constant, and the
    * oracle mirrors this formula in its `LIMIT (SELECT greatest(...))`
    * subquery so both engines train identical centroids at every scale.
    */
  private val bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "join"),
    1 -> Seq("vector", "stream"),
    2 -> Seq("hash", "merge", "batch"),
    3 -> Seq("dup", "filter"),
    4 -> Seq("customer", "query"))

  /** DuckDB mirror of TextOps.bm25TopK(k1=1.2, b=0.75, topK=10) — same
    * micro-unit quantization pre-sum, ranked on the exact integer.
    */
  private val bm25OracleSql: String = {
    val values = bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id AS doc,
       |    unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS term
       |  FROM documents),
       |tf AS (SELECT doc, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
       |q(qid, term) AS (VALUES $values),
       |dfreq AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS dfq FROM tf
       |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
       |terms AS (
       |  SELECT q.qid, tf.doc,
       |    CAST(round(ln(1 + (st.n - dfreq.dfq + 0.5) / (dfreq.dfq + 0.5))
       |      * tf.tf * (1.2 + 1.0)
       |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))
       |      * 1000000) AS BIGINT) AS ppm
       |  FROM q
       |  JOIN tf USING (term)
       |  JOIN dfreq ON dfreq.term = q.term
       |  JOIN dl ON dl.doc = tf.doc
       |  CROSS JOIN st),
       |sc AS (SELECT qid, doc, CAST(sum(ppm) AS BIGINT) AS sppm
       |       FROM terms GROUP BY 1, 2)
       |SELECT qid, CAST(row_number() OVER w AS INT) AS rank, doc,
       |  round(CAST(sppm AS DOUBLE) / 1000000, 4) AS score
       |FROM sc
       |WINDOW w AS (PARTITION BY qid ORDER BY sppm DESC, doc)
       |QUALIFY row_number() OVER w <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  private[queries] def ivfK(n: Long): Int = math.max(8, math.ceil(n / 250.0).toInt)

  private[queries] val ivfCorpusCtes: String = {
    def assign(centCte: String, outName: String): String =
      s"""$outName AS (
         |  SELECT vec_id, e, cell FROM (
         |    SELECT b.vec_id, b.e, c.cell,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY $ivfD2, c.cell) AS rn
         |    FROM base b CROSS JOIN $centCte c)
         |  WHERE rn = 1)""".stripMargin
    def recompute(assignCte: String, initCte: String, outName: String): String =
      s"""$outName AS (
         |  SELECT $initCte.cell, COALESCE(l.c, $initCte.c) AS c
         |  FROM $initCte LEFT JOIN (
         |    SELECT cell, list(m ORDER BY i) AS c FROM (
         |      SELECT cell, i, avg(e[i]) AS m
         |      FROM $assignCte, range(1, 65) AS t(i) GROUP BY cell, i)
         |    GROUP BY cell) l USING (cell))""".stripMargin
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS c
       |       FROM (SELECT * FROM base ORDER BY vec_id
       |             LIMIT (SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS INT))
       |                    FROM base))),
       |${assign("c0", "a0")},
       |${recompute("a0", "c0", "c1")},
       |${assign("c1", "a1")},
       |${recompute("a1", "c1", "c2")},
       |${assign("c2", "corp")}""".stripMargin
  }

  /** The PQ training + corpus-encoding CTE prefix, mirroring
    * Similarity.pqCodebooks: per subspace j, slice → deterministic init
    * (first k rows by vec_id) → two Lloyd steps with 6-dp-rounded means →
    * final assignment, ending in `codes` and the per-subspace trained
    * books `c2_j`. Same assign/recompute skeleton as [[ivfCorpusCtes]],
    * instantiated per subspace; shared by p52's flat ADC scan and p62's
    * IVFADC composition.
    */
  private def pqCtes(m: Int, subDim: Int, k: Int): String = {
    def d2(b: String, c: String) =
      s"round(list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> ($b.v[i] - $c.c[i]) * ($b.v[i] - $c.c[i]))), 6)"
    val sb = new StringBuilder
    sb ++= "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)"
    for (j <- 0 until m) {
      val lo = j * subDim + 1
      val hi = (j + 1) * subDim
      def assign(cent: String, out: String) =
        s"$out AS (SELECT vec_id, v, cell FROM (" +
          s"SELECT b.vec_id, b.v, c.cell, row_number() OVER (" +
          s"PARTITION BY b.vec_id ORDER BY ${d2("b", "c")}, c.cell) AS rn " +
          s"FROM b$j b CROSS JOIN $cent c) WHERE rn = 1)"
      def recompute(assignCte: String, init: String, out: String) =
        s"$out AS (SELECT $init.cell, COALESCE(l.c, $init.c) AS c " +
          s"FROM $init LEFT JOIN (SELECT cell, list(mn ORDER BY i) AS c FROM (" +
          s"SELECT cell, i, round(avg(v[i]), 6) AS mn " +
          s"FROM $assignCte, range(1, ${subDim + 1}) AS t(i) GROUP BY cell, i) " +
          s"GROUP BY cell) l USING (cell))"
      sb ++= s",\nb$j AS (SELECT vec_id, list_slice(e, $lo, $hi) AS v FROM base)"
      sb ++= s",\nc0_$j AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, " +
        s"v AS c FROM (SELECT * FROM b$j ORDER BY vec_id LIMIT $k))"
      sb ++= ",\n" + assign(s"c0_$j", s"a0_$j")
      sb ++= ",\n" + recompute(s"a0_$j", s"c0_$j", s"c1_$j")
      sb ++= ",\n" + assign(s"c1_$j", s"a1_$j")
      sb ++= ",\n" + recompute(s"a1_$j", s"c1_$j", s"c2_$j")
      sb ++= ",\n" + assign(s"c2_$j", s"a2_$j")
    }
    sb ++= ",\ncodes AS (SELECT a2_0.vec_id, " +
      (0 until m).map(j => s"a2_$j.cell AS c$j").mkString(", ") +
      " FROM a2_0 " +
      (1 until m).map(j => s"JOIN a2_$j USING (vec_id)").mkString(" ") + ")"
    sb.toString
  }

  /** DuckDB mirror of Similarity.pqAdcTopK on [[pqCtes]]'s trained books:
    * the flat ADC scan joins each corpus code back to its trained centroid
    * and ranks by the rounded sum of per-subspace squared L2 terms.
    */
  private def pqOracleSql(m: Int, subDim: Int, k: Int): String = {
    val sb = new StringBuilder
    sb ++= pqCtes(m, subDim, k)
    sb ++= ",\nq AS (SELECT vec_id AS qid, " +
      (0 until m).map(j =>
        s"list_slice(e, ${j * subDim + 1}, ${(j + 1) * subDim}) AS qv$j")
        .mkString(", ") +
      " FROM base WHERE vec_id < 50)"
    val terms = (0 until m).map(j =>
      s"round(list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (q.qv$j[i] - cc$j.c[i]) * (q.qv$j[i] - cc$j.c[i]))), 6)")
    sb ++= "\nSELECT qid, CAST(row_number() OVER w AS INT) AS rank, nid, adc FROM (" +
      s"\n  SELECT q.qid, cd.vec_id AS nid, round(${terms.mkString(" + ")}, 6) AS adc" +
      "\n  FROM codes cd CROSS JOIN q " +
      (0 until m).map(j => s"JOIN c2_$j cc$j ON cc$j.cell = cd.c$j").mkString(" ") +
      "\n  WHERE cd.vec_id <> q.qid)" +
      "\nWINDOW w AS (PARTITION BY qid ORDER BY adc, nid)" +
      "\nQUALIFY row_number() OVER w <= 3" +
      "\nORDER BY qid, rank"
    sb.toString
  }

  /** DuckDB mirror of Similarity.ivfAdcTopK: the PQ CTE prefix (training +
    * corpus codes) composed with the IVF mirror's coarse cells + corpus
    * assignment; queries take their nprobe=2 nearest coarse cells and ADC
    * ranks PQ codes WITHIN the probed cells only.
    */
  private def ivfAdcOracleSql(m: Int, subDim: Int, k: Int): String = {
    val ivfTail = ivfCorpusCtes.stripPrefix(
      "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),")
    // fail fast if the shared base-CTE text ever drifts — a silent no-op
    // strip would concatenate two WITH clauses into unparseable SQL
    require(ivfTail != ivfCorpusCtes,
      "ivfCorpusCtes base CTE changed; update ivfAdcOracleSql's composition")
    val qslices = (0 until m).map(j =>
      s"list_slice(qvec, ${j * subDim + 1}, ${(j + 1) * subDim}) AS qv$j")
      .mkString(", ")
    val terms = (0 until m).map(j =>
      s"round(list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (q2.qv$j[i] - cc$j.c[i]) * (q2.qv$j[i] - cc$j.c[i]))), 6)")
    pqCtes(m, subDim, k) + "," + ivfTail +
      s""",
         |qq AS (SELECT qid, qvec, cell FROM (
         |    SELECT b.vec_id AS qid, b.e AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY $ivfD2, c.cell) AS rn
         |    FROM base b CROSS JOIN c2 c WHERE b.vec_id < 50)
         |  WHERE rn <= 2),
         |q2 AS (SELECT qid, cell, $qslices FROM qq)
         |SELECT qid, CAST(row_number() OVER w AS INT) AS rank, nid, adc FROM (
         |  SELECT q2.qid, n.vec_id AS nid, round(${terms.mkString(" + ")}, 6) AS adc
         |  FROM corp n
         |  JOIN q2 USING (cell)
         |  JOIN codes cd ON cd.vec_id = n.vec_id
         |  ${(0 until m).map(j => s"JOIN c2_$j cc$j ON cc$j.cell = cd.c$j").mkString(" ")}
         |  WHERE q2.qid <> n.vec_id)
         |WINDOW w AS (PARTITION BY qid ORDER BY adc, nid)
         |QUALIFY row_number() OVER w <= 3
         |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB mirror of Similarity.adcRerankTopK: [[ivfAdcOracleSql]]'s ADC
    * pipeline truncated at `shortlist` candidates per query, then exact
    * cosine rerank of the shortlisted (qid, nid) pairs against the float
    * vectors, top `topK`.
    */
  private def adcRerankOracleSql(m: Int, subDim: Int, k: Int,
                                 shortlist: Int, topK: Int): String = {
    val ivfTail = ivfCorpusCtes.stripPrefix(
      "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),")
    require(ivfTail != ivfCorpusCtes,
      "ivfCorpusCtes base CTE changed; update adcRerankOracleSql's composition")
    val qslices = (0 until m).map(j =>
      s"list_slice(qvec, ${j * subDim + 1}, ${(j + 1) * subDim}) AS qv$j")
      .mkString(", ")
    val terms = (0 until m).map(j =>
      s"round(list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (q2.qv$j[i] - cc$j.c[i]) * (q2.qv$j[i] - cc$j.c[i]))), 6)")
    val adcExpr = s"round(${terms.mkString(" + ")}, 6)"
    pqCtes(m, subDim, k) + "," + ivfTail +
      s""",
         |qq AS (SELECT qid, qvec, cell FROM (
         |    SELECT b.vec_id AS qid, b.e AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY b.vec_id ORDER BY $ivfD2, c.cell) AS rn
         |    FROM base b CROSS JOIN c2 c WHERE b.vec_id < 50)
         |  WHERE rn <= 2),
         |q2 AS (SELECT qid, cell, $qslices FROM qq),
         |sl AS MATERIALIZED (SELECT qid, nid FROM (
         |  SELECT q2.qid, n.vec_id AS nid,
         |    row_number() OVER (PARTITION BY q2.qid
         |                       ORDER BY $adcExpr, n.vec_id) AS rn
         |  FROM corp n
         |  JOIN q2 USING (cell)
         |  JOIN codes cd ON cd.vec_id = n.vec_id
         |  ${(0 until m).map(j => s"JOIN c2_$j cc$j ON cc$j.cell = cd.c$j").mkString(" ")}
         |  WHERE q2.qid <> n.vec_id)
         |  WHERE rn <= $shortlist)
         |SELECT qid, CAST(row_number() OVER w AS INT) AS rank, nid,
         |  round(list_cosine_similarity(qb.e, nb.e), 4) AS sim
         |FROM sl
         |JOIN base qb ON qb.vec_id = sl.qid
         |JOIN base nb ON nb.vec_id = sl.nid
         |WINDOW w AS (PARTITION BY qid
         |  ORDER BY round(list_cosine_similarity(qb.e, nb.e), 4) DESC, nid)
         |QUALIFY row_number() OVER w <= $topK
         |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB mirror of TextOps.charLmScore over `documents` — shared by p48
    * (batch) and s10 (the same model applied on a stream).
    */
  private[queries] val charLmOracleSql: String =
    """WITH norm AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
      |  FROM documents),
      |tris AS (
      |  SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS tri
      |  FROM norm, unnest(range(1, length(t) - 1)) AS u(i)
      |  WHERE length(t) >= 3),
      |tri_cnt AS (SELECT tri, count(*) AS tc FROM tris GROUP BY tri),
      |big_cnt AS (SELECT substr(tri, 1, 2) AS big, sum(tc) AS bc
      |            FROM tri_cnt GROUP BY 1),
      |model AS (
      |  SELECT tri, round(ln(CAST(tc AS DOUBLE) / bc), 6) AS logp
      |  FROM tri_cnt JOIN big_cnt ON substr(tri, 1, 2) = big)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tris,
      |       round(-sum(logp) / count(*), 4) AS nll
      |FROM tris JOIN model USING (tri)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
