package graft

import graft.ops.Robots
import graft.ops.Robots.RobotRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Robots]]: group selection, rule grammar, verdict
  * election, and the char-walk-vs-regex differential.
  */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("group selection: specific agent shadows *, case-insensitive, groups merge") {
    val txt = Robots.fixtureRobots(1)
    assert(Robots.parseRobots(txt, "graftbot") ===
      Seq(RobotRule("/tmp/*", false), RobotRule("/*z$", false)),
      "GraftBot group (mixed case) shadows the disallow-all * group")
    assert(Robots.parseRobots(txt, "nobot") === Seq(RobotRule("/", false)),
      "unknown agent falls back to *")
    // two groups for the same agent union; consecutive UA lines share rules
    val multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n\n" +
      "User-agent: b\nAllow: /x/y\n"
    assert(Robots.parseRobots(multi, "b") ===
      Seq(RobotRule("/x", false), RobotRule("/x/y", true)))
    assert(Robots.parseRobots(multi, "a") === Seq(RobotRule("/x", false)))
    // a UA line AFTER rules starts a new group
    val re = "User-agent: a\nDisallow: /1\nUser-agent: b\nDisallow: /2\n"
    assert(Robots.parseRobots(re, "b") === Seq(RobotRule("/2", false)))
  }

  test("empty Disallow, comments, noise directives, CRLF") {
    assert(Robots.parseRobots(Robots.fixtureRobots(2), "graftbot").isEmpty)
    val noisy = "# hi\nUser-agent: * # inline\nCrawl-delay: 5\n" +
      "Disallow: /a # tail comment\nSitemap: http://e/s\nDisallow: /b\n"
    assert(Robots.parseRobots(noisy, "x") ===
      Seq(RobotRule("/a", false), RobotRule("/b", false)),
      "noise directives do not break the group")
  }

  test("rule matching: prefix, wildcard backtracking, $ anchor") {
    assert(Robots.ruleMatches("/private", "/private/x"))
    assert(!Robots.ruleMatches("/private", "/pub"))
    assert(Robots.ruleMatches("/tmp/*ok", "/tmp/abc-ok-d-ok"))
    assert(Robots.ruleMatches("/*z$", "/a/b/z"))
    assert(!Robots.ruleMatches("/*z$", "/a/zb"))
    assert(Robots.ruleMatches("/a*b*c", "/a-x-b-y-c-tail"))
    assert(!Robots.ruleMatches("/a*b$", "/a-b-c"))
    assert(Robots.ruleMatches("/", "/anything"))
  }

  test("parseRobotsMeta: group-scoped Crawl-delay, global Sitemap list") {
    import Robots.parseRobotsMeta
    // variant 1: the GraftBot group's delay 7 binds graftbot; the *
    // group's 1 binds everyone else
    val v1 = Robots.fixtureRobots(1)
    assert(parseRobotsMeta(v1, "graftbot").crawlDelay === Some(7L))
    assert(parseRobotsMeta(v1, "someoneelse").crawlDelay === Some(1L))
    // variant 2: sitemaps are GLOBAL and ordered; no delay anywhere
    val v2 = Robots.fixtureRobots(2)
    val m2 = parseRobotsMeta(v2, "graftbot")
    assert(m2.crawlDelay === None)
    assert(m2.sitemaps === Seq("https://x.example/s.xml",
      "https://x.example/s2.xml"))
    // variant 3: the foreign group's delay 9 must not leak to *
    assert(parseRobotsMeta(Robots.fixtureRobots(3), "graftbot")
      .crawlDelay === None)
    // several delays in the chosen groups: the LARGEST (politest) wins;
    // non-numeric values are ignored lines
    val multi = "User-agent: *\nCrawl-delay: 3\nDisallow: /a\n\n" +
      "User-agent: *\nCrawl-delay: 5\nCrawl-delay: oops\n"
    assert(parseRobotsMeta(multi, "graftbot").crawlDelay === Some(5L))
    // fractional delays (Bing/Yandex convention, ADVICE r12) ceil to
    // whole seconds instead of being dropped
    assert(parseRobotsMeta("User-agent: *\nCrawl-delay: 0.5\n", "graftbot")
      .crawlDelay === Some(1L))
    assert(parseRobotsMeta("User-agent: *\nCrawl-delay: 2.25\n", "graftbot")
      .crawlDelay === Some(3L))
    // fixture variant 0 now declares 2 AND 2.5 — effective delay 3
    assert(parseRobotsMeta(Robots.fixtureRobots(0), "graftbot")
      .crawlDelay === Some(3L))
    // an exact integer written decimally stays exact
    assert(parseRobotsMeta("User-agent: *\nCrawl-delay: 4.0\n", "graftbot")
      .crawlDelay === Some(4L))
  }

  test("hostile wildcard-stacked rules match in linear time (no regex DoS)") {
    // the old recursive walk / `.*`-regex translation backtracks
    // exponentially here (ADVICE r11); the greedy two-pointer matcher
    // must answer in milliseconds
    val hostile = "/" + ("a*" * 40) + "b$"
    val miss = "/" + ("a" * 4000) + "c"
    val hit = "/" + ("a" * 4000) + "b"
    val t0 = System.nanoTime()
    assert(!Robots.ruleMatches(hostile, miss))
    assert(Robots.ruleMatches(hostile, hit))
    assert(!Robots.ruleMatches(("/x*" * 30) + "y$", "/x" * 3000))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"hostile rules took ${ms}ms — matcher is not linear")
  }

  test("native robots_match kernel agrees with the reference walk") {
    val rules = Seq("/private", "/tmp/*", "/*z$", "/a*b*c", "/a*b$", "/",
      "/exact$", "/" + ("a*" * 10) + "$")
    val paths = Seq("/private/x", "/tmp/c", "/az", "/a-b-c", "/a-b",
      "/exact", "/exactly", "/" + ("a" * 100), "/pub")
    val df = rules.flatMap(r => paths.map(p => (r, p))).toDF("rule", "path")
      .withColumn("m", graft.functions.RobotsMatch(spark, col("rule"), col("path")))
    df.collect().foreach { row =>
      assert(row.getBoolean(2) === Robots.ruleMatches(row.getString(0), row.getString(1)),
        s"rule '${row.getString(0)}' vs path '${row.getString(1)}'")
    }
  }

  test("verdict: longest match wins, Allow wins ties, no match allows") {
    val rules = Seq(RobotRule("/tmp/*", false), RobotRule("/tmp/*ok", true))
    assert(!Robots.pathAllowed(rules, "/tmp/c1"))
    assert(Robots.pathAllowed(rules, "/tmp/c1ok"), "longer Allow wins")
    assert(Robots.pathAllowed(rules, "/pub"))
    // exact length tie: Allow wins
    val tie = Seq(RobotRule("/abc", false), RobotRule("/ab*", true))
    assert(Robots.pathAllowed(tie, "/abc"))
  }

  test("char-walk matcher agrees with the ruleRegex translation") {
    val rules = Seq("/private", "/private/ok", "/tmp/*", "/*z$", "/tmp/*ok",
      "/", "/a*b*c", "/a*b$", "/exact$")
    val paths = Seq("/private/x9", "/private/ok3", "/tmp/c4", "/tmp/c4z",
      "/tmp/c4ok", "/a-b-c", "/a-b", "/exact", "/exactly", "/z", "/pub")
    val df = rules.flatMap(r => paths.map(p => (r, p))).toDF("rule", "path")
      .withColumn("rx", Robots.ruleRegex(col("rule")))
      .withColumn("re_match", expr("path rlike rx"))
    df.collect().foreach { row =>
      val (r, p, m) = (row.getString(0), row.getString(1), row.getBoolean(3))
      assert(Robots.ruleMatches(r, p) === m,
        s"rule '$r' vs path '$p': charwalk vs regex '${row.getString(2)}'")
    }
  }

  test("xRobotsDirectives: scoping, case, repeats, unavailable_after is not a scope") {
    import Robots.{xRobotsDirectives => xr, xRobotsOptOut => opt}
    assert(xr(Seq("noindex"), "graftbot") === Seq("noindex"))
    assert(xr(Seq("noai, nofollow"), "graftbot") === Seq("noai", "nofollow"))
    assert(xr(Seq("otherbot: noindex"), "graftbot") === Seq.empty,
      "foreign-agent scope excluded")
    assert(xr(Seq("GraftBot: none"), "graftbot") === Seq("none"),
      "own scope, case-insensitive")
    assert(xr(Seq("nofollow", "noarchive"), "graftbot") ===
      Seq("nofollow", "noarchive"), "repeated headers union in order")
    // the colon in unavailable_after introduces a VALUE, not a scope
    assert(xr(Seq("unavailable_after: 01 Jan 2030"), "graftbot") ===
      Seq("unavailable_after: 01 jan 2030"))
    assert(opt(Seq("noindex")) && opt(Seq("none")) && opt(Seq("noai")))
    assert(!opt(Seq("nofollow", "noarchive")) && !opt(Seq.empty))
  }

  test("applyRobots elects the same verdicts as the reference matcher") {
    val rules = Seq(
      ("d0", "/private", false), ("d0", "/private/ok", true),
      ("d1", "/tmp/*", false), ("d1", "/*z$", false))
      .toDF("domain", "rule", "allow")
    val docs = Seq(
      (1L, "d0", "/private/x"), (2L, "d0", "/private/okay"),
      (3L, "d1", "/tmp/q"), (4L, "d1", "/docz"), (5L, "d1", "/pub"),
      (6L, "d2", "/anything"))
      .toDF("id", "domain", "path")
    val got = Robots.applyRobots(docs, "id", "domain", "path", rules)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3), Option(r.getString(4))))
    assert(got === Array(
      (1L, false, Some("/private")), (2L, true, Some("/private/ok")),
      (3L, false, Some("/tmp/*")), (4L, false, Some("/*z$")),
      (5L, true, None), (6L, true, None)))
    // the stateless per-row stage elects IDENTICAL rows (the streaming
    // form must agree with the batch argmax on every tie rule)
    val stage = Robots.robotsVerdictStage(rules)(docs)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3), Option(r.getString(4))))
    assert(stage === got, "per-row fold must equal the groupBy argmax")
  }
}
