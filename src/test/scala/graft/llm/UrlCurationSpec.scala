package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL first-mile curation: canonicalization edges, blocklist boundary
  * semantics, and the wired WARC-side keep-first-fetch chain. */
class UrlCurationSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlCuration.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalize: case, ports, fragments, tracking params") {
    assert(canon(
      "HTTP://News.Example.COM:80/Path/Up?x=1#frag",
      "https://a.example:443/p",
      "https://a.example:8443/p",
      "http://a.example/p?utm_source=x&utm_campaign=y",
      "http://a.example/p?id=3&utm_medium=z&gclid=abc",
      "http://a.example/p?",
      "http://a.example/p?ref=tw&fbclid=1",
      "not a url at all",
      "mailto:someone@example.com") === Seq(
      // authority lowercases, :80 drops, PATH CASE SURVIVES, frag drops
      "http://news.example.com/Path/Up?x=1",
      // :443 drops for https
      "https://a.example/p",
      // non-default port survives
      "https://a.example:8443/p",
      // all-tracking query loses its '?'
      "http://a.example/p",
      // real param survives in place, trackers excised
      "http://a.example/p?id=3",
      // dangling '?' drops
      "http://a.example/p",
      "http://a.example/p",
      // no scheme://authority → passthrough UNCHANGED
      "not a url at all",
      "mailto:someone@example.com"))
  }

  test("canonicalize: :80 under https (and :443 under http) survive") {
    // the default-port rule is scheme-specific, not a blanket strip
    assert(canon("https://a.example:80/p", "http://a.example:443/p") ===
      Seq("https://a.example:80/p", "http://a.example:443/p"))
  }

  test("blocklist: exact, dot-suffix, sibling immunity, pattern") {
    import spark.implicits._
    val rows = Seq(
      (1L, "http://ads.tracker.example/x"),     // exact-blocked
      (2L, "http://sub.ads.tracker.example/x"), // suffix of exact entry
      (3L, "http://spam.bad.example/x"),        // suffix-blocked
      (4L, "http://notbad.example/x"),          // sibling — NOT blocked
      (5L, "http://ok.example/casino/slots"),   // pattern-blocked
      (6L, "http://ok.example/cas/ino"))        // pattern needs the path
      .toDF("doc_id", "url")
      .select(col("doc_id"), UrlCuration.canonicalize(col("url")).as("c"))
    val kept = UrlCuration.blocklistFilter(rows, col("c"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept === Set(4L, 6L))
  }

  test("firstMile over a parsed WARC frame: twins collapse, first fetch wins") {
    import spark.implicits._
    // three fetches of ONE canonical url (tracking twins + refetch) in
    // fetch order (src, rec_idx), one distinct url, one blocked url
    val clean = Seq(
      ("seg1", 0, "http://a.example/p?utm_source=x", "first body"),
      ("seg1", 1, "http://b.example/q", "distinct"),
      ("seg1", 2, "HTTP://A.Example:80/p", "refetch later in seg1"),
      ("seg2", 0, "http://a.example/p", "refetch in a later segment"),
      ("seg2", 1, "http://spam.bad.example/z", "blocked"))
      .toDF("src", "rec_idx", "uri", "body")
    val out = UrlCuration.firstMile(clean)
      .orderBy(col("url_canon")).collect()
    assert(out.map(_.getAs[String]("url_canon")).toSeq ===
      Seq("http://a.example/p", "http://b.example/q"))
    val a = out(0)
    assert(a.getAs[Long]("n_fetches") === 3)
    assert(a.getAs[String]("src") === "seg1" && a.getAs[Int]("rec_idx") === 0)
    assert(a.getAs[String]("body") === "first body")
  }
}
