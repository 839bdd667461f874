package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextAnalysis
import graft.model.Tables

/** The native one-pass token stats must be bit-identical to the per-stat HOF
  * shapes — the DuckDB oracle restates those exact formulas. */
class TokenStatsExprSpec extends SparkSpec {

  private val Stop = Seq("the", "a", "of", "and", "lorem")

  test("native struct == per-stat HOF shapes on the documents corpus") {
    val toks = TextAnalysis.tokens(col("text"))
    val diff = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"),
        TokenStatsExpr.stats(toks, Stop).as("st"),
        TextAnalysis.tokenCount(toks).as("h_n"),
        TextAnalysis.distinctTokenCount(toks).as("h_d"),
        TextAnalysis.stopwordCount(toks, Stop).as("h_s"),
        TextAnalysis.subwordCountEstimate(toks).as("h_w"))
      .filter(col("st.n_tokens") =!= col("h_n") ||
        col("st.n_distinct") =!= col("h_d") ||
        col("st.stop_cnt") =!= col("h_s") ||
        col("st.subwords") =!= col("h_w"))
    assert(diff.count() === 0)
  }

  test("edge rows: empty string, all-stopwords, repeated tokens") {
    val r = spark.range(1).select(
        TokenStatsExpr.stats(split(lit(""), " "), Stop).as("empty"),
        TokenStatsExpr.stats(split(lit("the the the"), " "), Stop).as("stops"),
        TokenStatsExpr.stats(split(lit("abcdefgh xy"), " "), Stop).as("subw"))
      .collect()(0)
    val empty = r.getStruct(0)
    // split("", " ") yields [""]: one empty token, distinct 1, subword floor 1
    assert(empty.getInt(0) === 1 && empty.getInt(1) === 1 &&
      empty.getInt(2) === 0 && empty.getLong(3) === 1L)
    val stops = r.getStruct(1)
    assert(stops.getInt(0) === 3 && stops.getInt(1) === 1 && stops.getInt(2) === 3)
    val subw = r.getStruct(2)
    assert(subw.getLong(3) === 3L) // ceil(8/4) + ceil(2/4)->1
  }

  test("max token frequency: native == HOF twin, edges covered") {
    val toks = TextAnalysis.tokens(col("text"))
    val diff = Tables.documents(spark, Sf)
      .select(TextAnalysis.maxTokenFreq(toks).as("native"),
        TextAnalysis.maxTokenFreqHof(toks).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
    val r = spark.range(1).select(
        TextAnalysis.maxTokenFreq(split(lit("a b a a c b"), " ")).as("m"),
        TextAnalysis.maxTokenFreq(array().cast("array<string>")).as("empty"),
        TextAnalysis.maxTokenFreqHof(array().cast("array<string>")).as("emptyHof"))
      .collect()(0)
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 0 && r.getInt(2) === 0)
  }

  test("null token elements mirror the HOF shapes") {
    // tokenizers never emit nulls, but the type check admits containsNull
    // arrays — pin the native struct to the HOF results on one
    val toks = array(lit("the"), lit(null).cast("string"),
      lit("abcdefgh"), lit(null).cast("string"), lit("the"))
    val r = spark.range(1).select(
        TokenStatsExpr.stats(toks, Stop).as("st"),
        TextAnalysis.tokenCount(toks).as("h_n"),
        TextAnalysis.distinctTokenCount(toks).as("h_d"),
        TextAnalysis.stopwordCount(toks, Stop).as("h_s"),
        TextAnalysis.subwordCountEstimate(toks).as("h_w"))
      .collect()(0)
    val st = r.getStruct(0)
    assert(st.getInt(0) === r.getInt(1))   // size counts nulls: 5
    assert(st.getInt(1) === r.getInt(2))   // distinct keeps one null: 3
    assert(st.getInt(2) === r.getInt(3))   // isin(null) filtered out: 2
    assert(st.getLong(3) === r.getLong(4)) // greatest skips null: 1+1+2+1+1 = 6
    assert(st.getInt(0) === 5 && st.getInt(1) === 3 &&
      st.getInt(2) === 2 && st.getLong(3) === 6L)
  }
}
