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
  private final case class Group(agents: Set[String],
                                 rules: Vector[RobotRule],
                                 delays: Vector[Long])

  /** The group walk shared by [[parseRobots]] and [[parseRobotsMeta]]:
    * (groups, global sitemap URLs in wire order). `Crawl-delay` is
    * group-scoped (the Bing/Yandex convention); `Sitemap` is global per
    * the sitemaps.org protocol — both close a User-agent accumulation
    * run like any non-UA line.
    */
  private def parseGroups(content: String): (Vector[Group], Vector[String]) = {
    var groups = Vector.empty[Group]
    var sitemaps = Vector.empty[String]
    var curAgents = Set.empty[String]
    var curRules = Vector.empty[RobotRule]
    var curDelays = Vector.empty[Long]
    var inAgents = false
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups :+= Group(curAgents, curRules, curDelays)
      curAgents = Set.empty; curRules = Vector.empty; curDelays = Vector.empty
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
          case "crawl-delay" =>
            inAgents = false
            // integer OR decimal seconds (the Bing/Yandex convention
            // allows 'Crawl-delay: 0.5'; ADVICE r12 — dropping those
            // under-throttled the domain to the 1 s default). Fractions
            // CEIL to whole seconds: the scheduler's unit is seconds and
            // rounding up is the polite direction. Anything else is an
            // ignored line.
            if (value.matches("\\d{1,9}(\\.\\d{1,6})?"))
              curDelays :+= new java.math.BigDecimal(value)
                .setScale(0, java.math.RoundingMode.CEILING).longValueExact()
          case "sitemap" =>
            inAgents = false
            if (value.nonEmpty) sitemaps :+= value
          case _ => inAgents = false
        }
      }
    }
    flush()
    (groups, sitemaps)
  }

  /** The groups that bind `agent`: its own product token's when any
    * exist, else the `*` groups (RFC 9309 §2.2.1).
    */
  private def chosenGroups(groups: Vector[Group], agent: String): Vector[Group] = {
    val lc = agent.toLowerCase
    val specific = groups.filter(_.agents.contains(lc))
    if (specific.nonEmpty) specific else groups.filter(_.agents.contains("*"))
  }

  def parseRobots(content: String, agent: String): Seq[RobotRule] = {
    if (content == null) return Seq.empty // a fetch miss is allow-all
    val (groups, _) = parseGroups(content)
    chosenGroups(groups, agent).flatMap(_.rules)
  }

  /** Scheduler-facing metadata: the effective `Crawl-delay` for `agent`
    * (group-scoped like rules; when the chosen groups declare several,
    * the LARGEST wins — the polite reading) and the global `Sitemap`
    * URLs in wire order (the re-crawl seed list). VERDICT r11 #7: these
    * two directives were parsed-and-ignored; a crawl scheduler needs the
    * delay and the sitemap list is what a re-crawl starts from.
    */
  final case class RobotsMeta(crawlDelay: Option[Long], sitemaps: Seq[String])

  def parseRobotsMeta(content: String, agent: String): RobotsMeta = {
    if (content == null) return RobotsMeta(None, Seq.empty)
    val (groups, sitemaps) = parseGroups(content)
    val delays = chosenGroups(groups, agent).flatMap(_.delays)
    RobotsMeta(if (delays.isEmpty) None else Some(delays.max), sitemaps)
  }

  /** Does `rule` cover `path`? Literal prefix match with `*` wildcards
    * and a trailing-`$` end anchor. LINEAR greedy two-pointer wildcard
    * match — O(|rule|·|path|) worst case, one retreat point per `*` —
    * because robots.txt is UNTRUSTED input: the naive recursive walk
    * (and the `.*` regex translation) backtracks exponentially on rules
    * stacking many wildcards, a CPU DoS in the ingest path (ADVICE r11).
    * An UN-anchored rule matches any prefix, which is exactly a full
    * match of `rule + "*"` — so both forms run the same full matcher.
    * Differential-pinned against [[ruleRegex]] in RobotsSpec.
    */
  def ruleMatches(rule: String, path: String): Boolean = {
    val anchored = rule.endsWith("$")
    val pat0 = if (anchored) rule.dropRight(1) else rule
    val pat = if (anchored) pat0 else pat0 + "*"
    var pi = 0      // path cursor
    var ri = 0      // pattern cursor
    var starRi = -1 // pattern index just past the most recent '*'
    var starPi = 0  // path index that '*' is currently assumed to end at
    while (pi < path.length) {
      if (ri < pat.length && pat.charAt(ri) == '*') {
        starRi = ri + 1; starPi = pi; ri += 1
      } else if (ri < pat.length && pat.charAt(ri) == path.charAt(pi)) {
        ri += 1; pi += 1
      } else if (starRi >= 0) {
        starPi += 1; pi = starPi; ri = starRi
      } else return false
    }
    while (ri < pat.length && pat.charAt(ri) == '*') ri += 1
    ri == pat.length
  }

  /** Reference verdict for one path: longest matching rule wins, Allow
    * beats Disallow on a length tie, no match ⇒ allowed.
    */
  def pathAllowed(rules: Seq[RobotRule], path: String): Boolean = {
    val hits = rules.filter(r => ruleMatches(r.rule, path))
    if (hits.isEmpty) true
    else hits.maxBy(r => (r.rule.length, r.allow, r.rule)).allow
  }

  /** The rule as an anchored regex COLUMN — the spec-differential twin
    * of [[ruleMatches]] ONLY (regex specials escaped, `*` → `.*`,
    * trailing `$` kept as the end anchor). NOT used on the application
    * path: `.*`-stacked rules from a hostile robots.txt backtrack
    * catastrophically in Java's regex engine, so [[applyRobots]] and
    * [[robotsVerdictStage]] match through the linear native
    * [[graft.functions.RobotsMatch]] kernel instead (ADVICE r11).
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

  /** Distributed parse of the robots corpus into per-domain scheduler
    * metadata — (domain, crawl_delay BIGINT nullable, n_sitemaps,
    * sitemap = first URL or NULL). Registry-sized, rides the same scan
    * as [[ruleTable]].
    */
  def metaTable(robots: DataFrame, agent: String): DataFrame = {
    val s = robots.sparkSession
    import s.implicits._
    robots.select(col("domain").cast("string"), col("content").cast("string"))
      .as[(String, String)]
      .map { case (dom, content) =>
        val m = parseRobotsMeta(content, agent)
        (dom, m.crawlDelay, m.sitemaps.size, m.sitemaps.headOption)
      }
      .toDF("domain", "crawl_delay", "n_sitemaps", "sitemap")
  }

  /** Apply the rule table to a page corpus: (id, domain, path, allowed,
    * matched) where `matched` is the winning rule (NULL when none
    * matched — allowed by default). Broadcast join on domain (the rule
    * table is registry-sized), per-row linear robots_match kernel, one per-id argmax
    * shuffle — corpus-scale work is a single scan + one exchange.
    */
  def applyRobots(docs: DataFrame, idCol: String, domainCol: String,
                  pathCol: String, rules: DataFrame): DataFrame = {
    graft.functions.RobotsMatch.register(docs.sparkSession)
    val base = docs.select(col(idCol).as("id"), col(domainCol).as("domain"),
      col(pathCol).as("path"))
    val r = rules.select(col("domain"), col("rule"), col("allow"))
    val hits = base.join(broadcast(r), Seq("domain"))
      .where(expr("robots_match(rule, path)"))
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
    graft.functions.RobotsMatch.register(rules.sparkSession)
    val byDomain = rules
      .select(col("domain"), struct(col("rule"), col("allow")).as("r"))
      .groupBy(col("domain")).agg(collect_list(col("r")).as("rs"))
    pages.join(broadcast(byDomain), Seq("domain"), "left")
      .withColumn("m", expr(
        "array_max(transform(filter(rs, x -> robots_match(x.rule, path)), " +
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
      // the DECIMAL 2.5 (Bing/Yandex convention, ADVICE r12) ceils to 3
      // and out-polites the integer 2 — the oracle pins delay 3, so
      // dropping fractional lines regresses the hash
      "# corpus opt-out\nUser-agent: *\nDisallow: /private\n" +
        "Allow: /private/ok\nCrawl-delay: 2\nCrawl-delay: 2.5\n"
    case 1 =>
      // group-scoped Crawl-delay: the GraftBot group's 7 binds graftbot,
      // the * group's 1 does not (specific shadows *)
      "User-agent: GraftBot\nDisallow: /tmp/*\nDisallow: /*z$\n" +
        "Crawl-delay: 7\n\nUser-agent: *\nDisallow: /\nCrawl-delay: 1\n"
    case 2 =>
      "User-agent: *\r\nDisallow:\r\nSitemap: https://x.example/s.xml\r\n" +
        "Sitemap: https://x.example/s2.xml\r\n"
    case _ =>
      // the foreign group's Crawl-delay 9 must NOT leak to graftbot/*
      "User-agent: otherbot\nDisallow: /\nCrawl-delay: 9\n\nUser-agent: *\n" +
        "Disallow: /private\nDisallow: /tmp/*\nAllow: /tmp/*ok\n"
  }
}
