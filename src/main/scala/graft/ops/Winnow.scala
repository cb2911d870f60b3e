package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS algorithm): hash every char k-gram, slide a w-wide window,
  * select the MINIMUM hash per window (rightmost on ties), and the
  * distinct selected (position, hash) pairs are the document's
  * fingerprint set. The guarantee that makes it the classic
  * plagiarism/near-dup localizer: any shared substring of length
  * ≥ k + w − 1 contributes at least one IDENTICAL fingerprint to both
  * documents, while the selected density stays ~2/(w+1) of the grams —
  * a bounded sketch with a locality proof, unlike raw shingling.
  *
  * Everything is a per-row expression chain (HOFs over the normalized
  * text — no UDF, no shuffle): at 100 TB fingerprinting rides the scan,
  * and the fingerprint table feeds the SAME banded-join candidate
  * machinery the MinHash family uses (`Dedup`), with positions enabling
  * span-level localization the LSH path cannot give.
  */
object Winnow {

  /** Per-doc winnowed fingerprints: (id, n_grams, n_fp, fp_digest) where
    * fp_digest is an order-independent exact BIGINT sum over the
    * distinct selected (pos, hash) encodings. Docs shorter than
    * k + w − 1 normalized chars (no full window) drop. Selection is
    * rightmost-min (the winnowing tie rule that makes fingerprints
    * position-robust); hashes are 30-bit md5 prefixes of the k-grams.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 2, "k and w must be at least 2")
    df.select(col(idCol).as("id"),
        trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")).as("__n"))
      .where(length(col("__n")) >= k + w - 1)
      // 30-bit k-gram hashes, 1-based gram positions
      .withColumn("hs", expr(
        s"transform(sequence(1, length(__n) - ${k - 1}), i -> " +
          s"cast(conv(substring(md5(substring(__n, i, $k)), 1, 15), 16, 10) " +
          "as bigint) % 1073741824)"))
      // rightmost-min selection per window, encoded h·2^20 + pos
      .withColumn("fp", expr(
        s"array_distinct(transform(sequence(1, size(hs) - ${w - 1}), j -> " +
          s"array_min(slice(hs, j, $w)) * 1048576 + " +
          s"(j + $w - array_position(reverse(slice(hs, j, $w)), " +
          s"array_min(slice(hs, j, $w))))))"))
      .select(col("id"), size(col("hs")).cast("long").as("n_grams"),
        size(col("fp")).cast("long").as("n_fp"),
        expr("aggregate(fp, cast(0 as bigint), " +
          "(a, x) -> a + x % 1099511627776)").as("fp_digest"))
  }
}
