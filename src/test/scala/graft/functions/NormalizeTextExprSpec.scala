package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextAnalysis
import graft.model.Tables

/** The native normalize must be bit-identical to the regex reference shape —
  * the exact-dedup fingerprint (xxhash64 of this string) keys survivors. */
class NormalizeTextExprSpec extends SparkSpec {

  test("native normalize == regex normalize on the documents corpus") {
    val diff = Tables.documents(spark, Sf)
      .select(TextAnalysis.normalize(col("text")).as("native"),
        TextAnalysis.normalizeHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("edge strings: tabs/newlines/runs, case, same-length substitution") {
    val cases = Seq(
      "  Hello   World  ",   // trim + run collapse
      "a\tb",                // same-length substitution (\t -> space)
      "A\r\n B\fC",    // every \s class member
      "",                    // empty
      "ünïcódé  ÄÖÜ")        // multibyte + case
    val df = spark.createDataset(cases)(spark.implicits.newStringEncoder)
      .toDF("t")
      .select(TextAnalysis.normalize(col("t")).as("native"),
        TextAnalysis.normalizeHof(col("t")).as("hof"))
    df.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
