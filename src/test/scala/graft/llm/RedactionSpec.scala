package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge semantics of the PII scrub: placeholders for each pattern class,
  * ordering (emails before phones so digit-bearing local parts survive as
  * one <EMAIL>), boundaries, and clean text passing through untouched. */
class RedactionSpec extends SparkSpec {

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t"))).head.getString(0)
  }

  test("each pattern class collapses to its placeholder") {
    assert(redact("mail a.user+tag@sub.example.co.uk now") === "mail <EMAIL> now")
    assert(redact("from 192.168.100.1 port") === "from <IP> port")
    assert(redact("call +1 555 0123 45 ok") === "call <PHONE> ok")
    assert(redact("dashes 555-867-5309x") === "dashes <PHONE>x")
  }

  test("ordering: email local-part digits never become phones, IPs never phones") {
    assert(redact("ping 12345678@example.com") === "ping <EMAIL>")
    assert(redact("ip 10.0.0.7 then +49 30 901820 end") ===
      "ip <IP> then <PHONE> end")
  }

  test("string edges and multiplicity") {
    assert(redact("a@b.com") === "<EMAIL>")
    assert(redact("x@y.org and z@w.net") === "<EMAIL> and <EMAIL>")
  }

  test("clean text is untouched") {
    val s = "just ordinary words with a dot. and plus + sign"
    assert(redact(s) === s)
  }
}
