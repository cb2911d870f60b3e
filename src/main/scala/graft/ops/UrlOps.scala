package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the Common-Crawl-style first
  * dedup pass: most crawl duplicates are the SAME page fetched under a
  * cosmetically different URL (case-shifted host, www. prefix, default
  * port, tracking params, param order, fragments, trailing slash), so
  * canonicalize-then-group removes them without touching document text.
  *
  * Scale shape: canonicalization is a pure per-row expression chain
  * (regexp_extract / split / sort_array — no UDF, no shuffle); the dedup
  * adds exactly one shuffle keyed by the canonical URL. The per-row arrays
  * are query-param-sized (a handful of elements), so the higher-order
  * filter/sort is bounded per row regardless of corpus size.
  */
object UrlOps {

  /** Query params dropped by canonicalization (tracking noise). */
  private val DropParams = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Canonical form of a URL column:
    *  - scheme and host lowercased; leading `www.` stripped;
    *  - default ports stripped (`:443` for https, `:80` for http);
    *  - fragment dropped;
    *  - tracking params dropped, remaining params sorted;
    *  - trailing slashes stripped from the path.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    val params = filter(
      split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike(DropParams))
    val qs = array_join(sort_array(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Keeper-election dedup over canonical URLs: every row gets its canonical
    * form, the id-minimal row per canonical group is the keeper, and the
    * group size comes along for audit. One shuffle (canonical key).
    */
  /** The host's parent-domain chain, most-specific first:
    * `cdn.eu.d7.example` → [cdn.eu.d7.example, eu.d7.example, d7.example,
    * example]. Bounded by the label count per row. This is how a domain
    * blocklist with subdomain inheritance ("blocking d7.example blocks
    * every host under it") becomes an EQUALITY join instead of an
    * ends-with scan: explode the chain, join suffix keys — and label
    * boundaries are correct by construction (`3.example` can never match
    * host `d3.example`, which a naive substring endswith gets wrong).
    */
  def domainChain(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
  }

  /** Apply a blocked-domain-suffix list with subdomain inheritance.
    * Returns (id, host, blocked, matched) where `matched` is the
    * longest (then lexicographically greatest) blocklist suffix that
    * covers the host, NULL when unblocked.
    *
    * Scale shape: the host side explodes into its bounded domain chain
    * (≤ label count rows per doc) and joins the blocklist on suffix
    * EQUALITY — broadcast when the list is list-sized (the normal case:
    * opt-out registries are thousands of rows, not billions); never a
    * LIKE/endswith against every row.
    */
  def applyDomainBlocklist(docs: DataFrame, idCol: String, hostCol: String,
                           blocklist: DataFrame): DataFrame = {
    // normalize names BEFORE the explode select: when hostCol is already
    // named "host" the same-select alias would resolve the explode's
    // reference as a lateral column alias (rejected in resolved plans)
    val base = docs.select(col(idCol).as("id"), col(hostCol).as("host"))
    val chain = base.select(col("id"), col("host"),
      explode(domainChain(col("host"))).as("sfx"))
    val hits = chain
      .join(broadcast(blocklist.select(col("suffix").as("sfx"))), "sfx")
      .groupBy(col("id"))
      .agg(max(struct(length(col("sfx")).as("l"), col("sfx").as("s")))
        .as("m"))
      .select(col("id"), col("m.s").as("matched"))
    docs.select(col(idCol).as("id"), col(hostCol).as("host"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("host"),
        col("matched").isNotNull.as("blocked"), col("matched"))
  }

  /** Per-row form of the blocklist match for LIST-sized blocklists (the
    * fuzzyWatchStage pattern): the suffix set compiles into the row
    * expression, so the stage is stateless and streaming-safe (the join
    * form's per-id argmax is a streaming aggregation). The chain is
    * ordered longest-first with strictly decreasing lengths, so the
    * FIRST hit in chain order IS the longest covering suffix — the same
    * election applyDomainBlocklist runs as an argmax.
    */
  def blockedMatch(host: Column, suffixes: Seq[String]): Column = {
    val bl = array(suffixes.map(lit): _*)
    val hits = filter(domainChain(host), x => array_contains(bl, x))
    when(size(hits) > 0, element_at(hits, 1))
  }

  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = df.withColumn("canon_url", canonicalUrl(col(urlCol)))
    val w = Window.partitionBy(col("canon_url"))
    canon
      .withColumn("keep", col(idCol) === min(col(idCol)).over(w))
      .withColumn("group_n", count(lit(1)).over(w))
  }
}
