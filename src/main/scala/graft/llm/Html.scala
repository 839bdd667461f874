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
}
