package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt opt-out ingestion (RFC 9309 / REP subset) — the builder
  * half of the p103 domain-governance story: p103 APPLIES a blocklist,
  * this parses the crawl-native opt-out signal that a registry is built
  * FROM. A robots.txt is groups of `User-agent` lines followed by
  * `Disallow`/`Allow` rules; a crawler obeys the most specific matching
  * group (its own product token if present, else `*`), and per-path
  * verdicts go to the LONGEST matching rule, Allow winning ties.
  *
  * Rule grammar: literal path prefix, `*` matching any character run,
  * trailing `$` anchoring the end. Parsing is pure per-row string work
  * (groups merge per RFC: consecutive UA lines share rules, multiple
  * groups for one agent union); at 100 TB the parse rides the scan of
  * the robots corpus inside `flatMap` — no shuffle. Application is a
  * broadcast join of the (registry-sized) rule table against the page
  * corpus plus one per-id argmax — the
  * [[UrlOps.applyDomainBlocklist]] shape with a per-rule match
  * predicate instead of suffix equality.
  */
object Robots {

  final case class RobotRule(rule: String, allow: Boolean)

  /** Parse one robots.txt body into the effective rules for `agent`:
    * groups whose User-agent equals `agent` (case-insensitive) when any
    * exist, else the `*` groups; all matching groups union (RFC 9309
    * §2.2.1). Empty `Disallow:` contributes nothing (allow-all). Other
    * directives (Crawl-delay, Sitemap) and comments are ignored but
    * close a User-agent accumulation run.
    */
  def parseRobots(content: String, agent: String): Seq[RobotRule] = {
    val lc = agent.toLowerCase
    var groups = Vector.empty[(Set[String], Vector[RobotRule])]
    var curAgents = Set.empty[String]
    var curRules = Vector.empty[RobotRule]
    var inAgents = false
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups :+= ((curAgents, curRules))
      curAgents = Set.empty; curRules = Vector.empty
    }
    for (raw <- content.split("\r?\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (line.nonEmpty && idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase
        val value = line.substring(idx + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            curAgents += value.toLowerCase
            inAgents = true
          case "disallow" | "allow" =>
            inAgents = false
            if (value.nonEmpty) curRules :+= RobotRule(value, key == "allow")
          case _ => inAgents = false
        }
      }
    }
    flush()
    val specific = groups.filter(_._1.contains(lc))
    val chosen = if (specific.nonEmpty) specific else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2)
  }

  /** Does `rule` cover `path`? Literal prefix match with `*` wildcards
    * and a trailing-`$` end anchor — an independent char-walk (with
    * wildcard backtracking), NOT a regex translation, so the spec's
    * differential against [[ruleRegex]] is a real check.
    */
  def ruleMatches(rule: String, path: String): Boolean = {
    val anchored = rule.endsWith("$")
    val pat = if (anchored) rule.dropRight(1) else rule
    def m(ri: Int, pi: Int): Boolean =
      if (ri == pat.length) !anchored || pi == path.length
      else if (pat.charAt(ri) == '*') (pi to path.length).exists(j => m(ri + 1, j))
      else pi < path.length && path.charAt(pi) == pat.charAt(ri) && m(ri + 1, pi + 1)
    m(0, 0)
  }

  /** Reference verdict for one path: longest matching rule wins, Allow
    * beats Disallow on a length tie, no match ⇒ allowed.
    */
  def pathAllowed(rules: Seq[RobotRule], path: String): Boolean = {
    val hits = rules.filter(r => ruleMatches(r.rule, path))
    if (hits.isEmpty) true
    else hits.maxBy(r => (r.rule.length, r.allow, r.rule)).allow
  }

  /** The rule as an anchored regex COLUMN (for the broadcast-join
    * application path): regex specials escaped, `*` → `.*`, trailing
    * `$` kept as the end anchor.
    */
  def ruleRegex(rule: Column): Column = {
    val anchored = rule.endsWith("$")
    val body = when(anchored, rule.substr(lit(1), length(rule) - 1))
      .otherwise(rule)
    val esc = regexp_replace(body, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Distributed parse of a (domain, content) robots corpus into the
    * per-domain rule table for `agent` — (domain, rule, allow). The
    * parse rides the scan; output is registry-sized (rules per domain
    * are list-bounded).
    */
  def ruleTable(robots: DataFrame, agent: String): DataFrame = {
    val s = robots.sparkSession
    import s.implicits._
    robots.select(col("domain").cast("string"), col("content").cast("string"))
      .as[(String, String)]
      .flatMap { case (dom, content) =>
        parseRobots(content, agent).map(r => (dom, r.rule, r.allow))
      }
      .toDF("domain", "rule", "allow")
  }

  /** Apply the rule table to a page corpus: (id, domain, path, allowed,
    * matched) where `matched` is the winning rule (NULL when none
    * matched — allowed by default). Broadcast join on domain (the rule
    * table is registry-sized), per-row regex match, one per-id argmax
    * shuffle — corpus-scale work is a single scan + one exchange.
    */
  def applyRobots(docs: DataFrame, idCol: String, domainCol: String,
                  pathCol: String, rules: DataFrame): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(domainCol).as("domain"),
      col(pathCol).as("path"))
    val r = rules.select(col("domain"), col("rule"), col("allow"),
      ruleRegex(col("rule")).as("rx"))
    val hits = base.join(broadcast(r), Seq("domain"))
      .where(expr("path rlike rx"))
      .groupBy(col("id"))
      .agg(max(struct(length(col("rule")).as("l"), col("allow").as("a"),
        col("rule").as("r"))).as("m"))
      .select(col("id"), col("m.a").as("hit_allow"), col("m.r").as("matched"))
    base.join(hits, Seq("id"), "left")
      .select(col("id"), col("domain"), col("path"),
        coalesce(col("hit_allow"), lit(true)).as("allowed"), col("matched"))
  }

  /** STREAMING-SAFE per-row form of [[applyRobots]] (the
    * `UrlOps.blockedMatch` pattern): the rule table collapses to one
    * broadcast row per domain carrying its rule array, the stream joins
    * it statically (stateless — no per-id aggregation, so it rides an
    * append-mode micro-batch), and the longest-match election runs as a
    * per-row array fold: filter the matching rules, take the array_max
    * of (length, allow, rule) structs — exactly the argmax
    * `applyRobots` runs as a groupBy (RobotsSpec differential). Expects
    * `pages` columns (id, domain, path).
    */
  def robotsVerdictStage(rules: DataFrame)(pages: DataFrame): DataFrame = {
    val byDomain = rules
      .select(col("domain"), struct(col("rule"), col("allow"),
        ruleRegex(col("rule")).as("rx")).as("r"))
      .groupBy(col("domain")).agg(collect_list(col("r")).as("rs"))
    pages.join(broadcast(byDomain), Seq("domain"), "left")
      .withColumn("m", expr(
        "array_max(transform(filter(rs, x -> path rlike x.rx), " +
          "x -> struct(length(x.rule) AS l, x.allow AS a, x.rule AS rl)))"))
      .select(col("id"), col("domain"), col("path"),
        coalesce(col("m.a"), lit(true)).as("allowed"),
        col("m.rl").as("matched"))
  }

  /** Directive names whose colon form (`unavailable_after: <date>`) is a
    * VALUE, not an agent scope — the disambiguation every real REP
    * header parser carries.
    */
  private val XRobotsDirectiveNames = Set(
    "all", "noindex", "nofollow", "none", "noarchive", "nosnippet",
    "notranslate", "noimageindex", "noai", "indexifembedded",
    "unavailable_after", "max-snippet", "max-image-preview",
    "max-video-preview")

  /** Effective `X-Robots-Tag` directives for `agent` from every
    * occurrence of the header, in wire order: each value is either a
    * bare comma-separated directive list (applies to all agents) or
    * `agent: directives…` scoped to one product token — the prefix
    * before the first colon is a scope only when it is a single token
    * that is NOT itself a directive name (`unavailable_after: <date>`
    * stays a directive). Case-insensitive; order of appearance
    * preserved.
    */
  def xRobotsDirectives(values: Seq[String], agent: String): Seq[String] = {
    val lc = agent.toLowerCase
    values.flatMap { v =>
      val colon = v.indexOf(':')
      val prefix =
        if (colon > 0) Some(v.substring(0, colon).trim.toLowerCase) else None
      val isScope = prefix.exists(p => !p.contains(' ') && !p.contains(',') &&
        !XRobotsDirectiveNames.contains(p))
      val (scope, rest) =
        if (isScope) (prefix, v.substring(colon + 1)) else (None, v)
      if (scope.forall(_ == lc))
        rest.split(',').map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
      else Seq.empty
    }
  }

  /** The opt-out verdict a TRAINING pipeline draws from the directives:
    * `noindex`, `none`, and the emerging `noai` all exclude the page.
    */
  def xRobotsOptOut(directives: Seq[String]): Boolean =
    directives.exists(d => d == "noindex" || d == "none" || d == "noai")

  /** Deterministic fixture body for variant `v` (0..3) — the four
    * shapes the p114 oracle's VALUES rule table mirrors: plain `*`
    * group with an Allow override; a specific-agent group that SHADOWS
    * a disallow-all `*` group (mixed-case agent, wildcard + `$` rules);
    * empty-Disallow allow-all with noise directives; and an ignored
    * foreign-agent group over a `*` group with an Allow-beats-Disallow
    * length tie.
    */
  def fixtureRobots(v: Int): String = (v & 3) match {
    case 0 =>
      "# corpus opt-out\nUser-agent: *\nDisallow: /private\n" +
        "Allow: /private/ok\nCrawl-delay: 2\n"
    case 1 =>
      "User-agent: GraftBot\nDisallow: /tmp/*\nDisallow: /*z$\n\n" +
        "User-agent: *\nDisallow: /\n"
    case 2 =>
      "User-agent: *\r\nDisallow:\r\nSitemap: https://x.example/s.xml\r\n"
    case _ =>
      "User-agent: otherbot\nDisallow: /\n\nUser-agent: *\n" +
        "Disallow: /private\nDisallow: /tmp/*\nAllow: /tmp/*ok\n"
  }
}
