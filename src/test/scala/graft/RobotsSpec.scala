package graft

import graft.functions.RobotsKernel
import graft.functions.RobotsKernel.Rule
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt kernel contracts (p81): RFC 9309 group selection,
  * wildcard/anchor prefix matching, and the longest/allow/first
  * tie-break — pinned on hand-built texts, independent of the
  * fixture's oracle restatement. */
class RobotsSpec extends AnyFunSuite {

  test("parse: named group beats *, consecutive UA lines stack, junk ignored") {
    val text =
      """|# robots for the graft test suite
        |Sitemap: https://example.com/sitemap.xml
        |Disallow: /preamble-rule-ignored
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /private
        |Crawl-delay: 10
        |Allow: /private/ok
        |
        |User-agent: *
        |Disallow: /everything
        |disallow: /lowercase-directive
        |Disallow:
        |""".stripMargin
    // named agent (either of the stacked UA lines) gets the named group
    assert(RobotsKernel.parse(text, "GraftBot").toSeq ===
      Seq(Rule(false, "/private"), Rule(true, "/private/ok")))
    assert(RobotsKernel.parse(text, "otherbot").toSeq ===
      Seq(Rule(false, "/private"), Rule(true, "/private/ok")))
    // anyone else falls to * — the empty Disallow is dropped, the
    // lowercase directive still parses
    assert(RobotsKernel.parse(text, "randomcrawler").toSeq ===
      Seq(Rule(false, "/everything"), Rule(false, "/lowercase-directive")))
    // no matching group at all -> no rules
    assert(RobotsKernel.parse("User-agent: x\nDisallow: /", "y").isEmpty)
    assert(RobotsKernel.parse("", "y").isEmpty)
  }

  test("parse: unknown directive between UA lines does not sever the group; agent match is exact product token") {
    // RFC 9309 §2.2.4: unrecognized records are skipped entirely, so
    // a Crawl-delay BETWEEN two User-agent lines leaves them stacking
    // onto ONE group — the pre-r18 parser started a fresh group and
    // left `a` with an empty rule set
    val severed =
      """|User-agent: a
        |Crawl-delay: 5
        |User-agent: b
        |Disallow: /blocked
        |""".stripMargin
    assert(RobotsKernel.parse(severed, "a").toSeq ===
      Seq(Rule(false, "/blocked")))
    assert(RobotsKernel.parse(severed, "b").toSeq ===
      Seq(Rule(false, "/blocked")))
    // ALL matching named groups combine (RFC: combine multiple
    // matching groups)
    val two =
      """|User-agent: a
        |Disallow: /one
        |User-agent: *
        |Disallow: /star
        |User-agent: a
        |Disallow: /two
        |""".stripMargin
    assert(RobotsKernel.parse(two, "a").toSeq ===
      Seq(Rule(false, "/one"), Rule(false, "/two")))
    // agent selection is EXACT product-token match (RFC 9309 §2.2.1;
    // the longest-match rule is for PATH rules): a group naming a
    // prefix or extension of the crawler's token is NOT selected
    val near =
      """|User-agent: graft
        |Disallow: /prefix
        |User-agent: graftcrawler-news
        |Disallow: /extension
        |User-agent: *
        |Disallow: /star
        |""".stripMargin
    assert(RobotsKernel.parse(near, "graftcrawler").toSeq ===
      Seq(Rule(false, "/star")))
  }

  test("patMatches: prefix semantics, * backtracking, $ anchor") {
    assert(RobotsKernel.patMatches("/path/", "/path/3"))
    assert(!RobotsKernel.patMatches("/path/3", "/path/"))
    assert(RobotsKernel.patMatches("", "/anything"))
    // * matches any run, including empty, with backtracking
    assert(RobotsKernel.patMatches("/a*b", "/ab/tail"))
    assert(RobotsKernel.patMatches("/a*b", "/aXXYYb"))
    assert(RobotsKernel.patMatches("/a*b*c", "/aXbYbZc"))
    assert(!RobotsKernel.patMatches("/a*b", "/aXXYY"))
    // $ anchors to the END of the path (not a prefix any more)
    assert(RobotsKernel.patMatches("/p/2$", "/p/2"))
    assert(!RobotsKernel.patMatches("/p/2$", "/p/25"))
    assert(RobotsKernel.patMatches("/p/*.json$", "/p/a.json"))
    assert(!RobotsKernel.patMatches("/p/*.json$", "/p/a.json?x=1"))
    // hostile stacked-wildcard pattern: the single-backtrack matcher
    // must answer (and fast — the recursive form is exponential here)
    val hostile = "/" + "*a" * 20 + "b$"
    val longPath = "/" + "a" * 2000
    assert(!RobotsKernel.patMatches(hostile, longPath))
    assert(RobotsKernel.patMatches(hostile, "/" + "a" * 200 + "b"))
  }

  test("decide: longest wins, allow breaks ties, earliest thereafter, default allow") {
    val rules = Array(Rule(false, "/path/"), Rule(true, "/path/3"))
    assert(RobotsKernel.decide(rules, "/path/3") === ((true, "/path/3")))
    assert(RobotsKernel.decide(rules, "/path/5") === ((false, "/path/")))
    assert(RobotsKernel.decide(rules, "/other") === ((true, null)))
    assert(RobotsKernel.decide(
      Array(Rule(false, "/p/"), Rule(true, "/q/")), "/p/x")._1 === false)
    assert(RobotsKernel.decide(
      Array(Rule(false, "/p/x"), Rule(true, "/p/y"), Rule(true, "/p/")),
      "/p/x")._1 === false, "longest beats allow preference")
    assert(RobotsKernel.decide(
      Array(Rule(false, "/p/"), Rule(true, "/p/")), "/p/x") ===
      ((true, "/p/")), "allow wins an exact-length tie")
    assert(RobotsKernel.decide(
      Array(Rule(false, "/p/a"), Rule(false, "/p/b")), "/p/a") ===
      ((false, "/p/a")))
  }

  test("robotsGate: missing robots row allows everything; NULL rules text too") {
    import TestSpark._
    import spark.implicits._
    val urls = Seq((1L, "a.com", "/x"), (2L, "b.com", "/x"),
      (3L, "c.com", "/x")).toDF("doc_id", "host", "path")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /x"),
      ("c.com", null.asInstanceOf[String])).toDF("host", "rules")
    val out = graft.operators.TextAnalysis.robotsGate(
        urls, "doc_id", "host", "path", robots, "host", "rules", "anybot")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3), Option(r.getString(4))))
    assert(out.toSeq === Seq((1L, false, Some("/x")), (2L, true, None),
      (3L, true, None)))
  }
}
