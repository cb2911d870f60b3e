// ANN index lifecycle over an embedding corpus — the round-5 serving path.
// Scala API (spark-shell / notebook); the same operators back the
// p62/p64/p67/p68 driver queries.

import graft.ops.Similarity
import org.apache.spark.sql.functions._

val emb = spark.read.parquet("/data/embeddings.parquet") // (vec_id BIGINT, embedding ARRAY<FLOAT>)

// 1. Train once per corpus release (deterministic Lloyd; artifacts are
//    k x dim doubles — store them next to the index).
val coarse = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 1024, iters = 10)
val books  = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, subDim = 8, k = 256, iters = 10)

// 2. Encode + persist the code layout ONCE: coarse cell as the partition
//    key, m int codes per row. hdfs:// and s3a:// paths work (Hadoop FS).
Similarity.writeIvfAdcLayout(emb, "vec_id", "embedding", coarse, books,
  subDim = 8, "s3a://bucket/index/codes")
Similarity.writeIvfAdcModel(java.nio.file.Paths.get("/models/ann.bin"), coarse, books)

// 3. Serve query batches from partition-pruned code scans — no float
//    column in the corpus scan, no retraining, bounded top-k aggregate.
val (c2, b2) = Similarity.readIvfAdcModel(java.nio.file.Paths.get("/models/ann.bin"))
val queries = spark.read.parquet("/data/query_batch.parquet")
  .select(col("id").as("qid"), col("embedding").as("qvec"))
val coded = spark.read.parquet("s3a://bucket/index/codes")
val top10 = Similarity.ivfAdcTopKFromCodes(coded, queries, c2, b2,
  subDim = 8, nprobe = 16, k = 10)

// 3b. Or two-stage: ADC shortlist + exact float rerank of the shortlist
//     (quantization error confined to recall, never the final ordering).
val reranked = Similarity.adcRerankTopK(emb, "vec_id", "embedding", c2, b2,
  subDim = 8, nprobe = 16, queryPred = col("vec_id") < 0, /* external queries: join instead */
  shortlist = 100, k = 10)

// 4. Absorb a new crawl slice WITHOUT touching the standing corpus:
//    encode under the STANDING model (retraining = rebuild, not append),
//    append into the same cell directories.
val slice = spark.read.parquet("/data/new_slice.parquet")
Similarity.appendIvfAdcLayout(slice, "vec_id", "embedding", c2, b2,
  subDim = 8, "s3a://bucket/index/codes")

// 5. Gate the index before trusting it: recall@k against brute-force
//    ground truth on a bounded query sample (see p65), and rebuild when
//    the corpus drifts (see p60's PSI monitor).
