package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL spellings of the native expression family (GraftFunctionRegistry
  * via GraftExtensions) must be bit-identical to their Column-API twins —
  * the pure-SQL user runs the SAME codegen'd operators — and structural
  * parameters must reject non-literals at analysis. */
class GraftSqlFunctionsSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "The quick  brown fox the END"),
      (2L, "alpha beta gamma alpha beta delta")).toDF("id", "text")
    df.createOrReplaceTempView("docs_sqlfn")
    df
  }

  test("fingerprint, token/shingle hashes, minhash, simhash match the Column API") {
    docs // materialize the temp view before the SQL references it
    val sql = spark.sql(
      """SELECT id,
        |       graft_fingerprint(text) AS fp,
        |       graft_shingle_hashes(split(text, ' '), 2) AS sh,
        |       graft_minhash_sig(graft_shingle_hashes(split(text, ' '), 2), 8) AS sig,
        |       graft_simhash64(graft_token_hashes(split(text, ' '))) AS simh
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        graft.llm.TextAnalysis.fingerprint(col("text")).as("fp"),
        ShingleHashExpr.windows(split(col("text"), " "), 2).as("sh"),
        MinHashSignatureExpr.signature(
          ShingleHashExpr.windows(split(col("text"), " "), 2), 8).as("sig"),
        SimHash64Expr.simHash64(
          ShingleHashExpr.tokenHashes(split(col("text"), " "))).as("simh"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("band keys, cosine, hyperplane bucket, array_eq_count match") {
    val sql = spark.sql(
      """SELECT graft_band_keys(graft_minhash_sig(array(1L, 2L, 3L), 8), 4, 2) AS bk,
        |       graft_cosine(array(1.0D, 2.0D, 0.0D), array(2.0D, 4.0D, 0.0D)) AS cos,
        |       graft_hyperplane_bucket(array(0.5D, -1.5D), 6) AS hb,
        |       graft_array_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS eqc
        |""".stripMargin).head
    val apiRow = spark.range(1).select(
      BandKeysExpr.keys(MinHashSignatureExpr.signature(
        array(lit(1L), lit(2L), lit(3L)), 8), 4, 2).as("bk"),
      CosineSimilarityExpr.cosine(
        array(lit(1.0d), lit(2.0d), lit(0.0d)),
        array(lit(2.0d), lit(4.0d), lit(0.0d))).as("cos"),
      HyperplaneBucketExpr.bucket(array(lit(0.5d), lit(-1.5d)), 6).as("hb"),
      ArrayEqCountExpr.eqCount(
        array(lit(1L), lit(2L), lit(3L)),
        array(lit(1L), lit(9L), lit(3L))).as("eqc")).head
    assert(sql.toString === apiRow.toString)
  }

  test("token stats with a literal stopword list matches") {
    docs
    val sql = spark.sql(
      """SELECT id, graft_token_stats(split(text, ' '), array('the', 'The')) AS st
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        TokenStatsExpr.stats(split(col("text"), " "), Seq("the", "The")).as("st"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("max_token_freq matches the Column API") {
    docs
    val sql = spark.sql(
      """SELECT id, graft_max_token_freq(split(text, ' ')) AS mf
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        graft.llm.TextAnalysis.maxTokenFreq(split(col("text"), " ")).as("mf"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("top_bigram, bigram_buckets, window_hashes match the Column API") {
    docs
    val sql = spark.sql(
      """SELECT id, graft_top_bigram(split(text, ' ')) AS tb,
        |       graft_bigram_buckets(split(text, ' '), 64) AS bb,
        |       graft_window_hashes(split(text, ' '), 3) AS wh,
        |       graft_string_windows(text, 3) AS sw
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        TopBigramExpr.topBigram(split(col("text"), " ")).as("tb"),
        HashedBigramBucketsExpr.buckets(split(col("text"), " "), 64).as("bb"),
        TokenWindowHashesExpr.hashes(split(col("text"), " "), 3).as("wh"),
        StringWindowsExpr.windows(col("text"), 3).as("sw"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("bpe_count matches the Column API") {
    docs
    val sql = spark.sql(
      """SELECT id, graft_bpe_count(split(text, ' ')) AS sw
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        BpeCountExpr.count(split(col("text"), " ")).as("sw"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("lm_nll matches the Column API") {
    docs
    val sql = spark.sql(
      """SELECT id, graft_lm_nll(concat(' ', graft_normalize_text(text), ' ')) AS nll
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        graft.llm.LmScore.nll(graft.llm.LangId.padded(col("text"))).as("nll"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("winnow_fingerprints matches the Column API") {
    docs
    val sql = spark.sql(
      """SELECT id,
        |       graft_winnow_fingerprints(graft_normalize_text(text), 12, 8) AS fp
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        graft.llm.Dedup.winnowFingerprints(
          graft.llm.TextAnalysis.normalize(col("text")), 12, 8).as("fp"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("langid_scores matches the Column API and composes with SQL padding") {
    docs
    val sql = spark.sql(
      """SELECT id,
        |       graft_langid_scores(' ' || graft_normalize_text(text) || ' ') AS sc
        |FROM docs_sqlfn ORDER BY id""".stripMargin).collect()
    val api = docs.select(col("id"),
        graft.llm.LangId.scores(graft.llm.LangId.padded(col("text"))).as("sc"))
      .orderBy(col("id")).collect()
    assert(sql.map(_.toString).toSeq === api.map(_.toString).toSeq)
  }

  test("labels_key and merge_attributes match") {
    val sql = spark.sql(
      """SELECT graft_labels_key(map('b', '2', 'a', '1')) AS lk,
        |       graft_merge_attributes(map('k', 'res', 'only', 'r'),
        |                              map('k', 'dp')) AS ma""".stripMargin).head
    val api = spark.range(1).select(
      LabelsKeyExpr.labelsKey(map(lit("b"), lit("2"), lit("a"), lit("1"))).as("lk"),
      MergeAttributesExpr.merge(
        map(lit("k"), lit("res"), lit("only"), lit("r")),
        map(lit("k"), lit("dp"))).as("ma")).head
    assert(sql.toString === api.toString)
  }

  test("merge_buckets aggregates like the Column API") {
    spark.sql(
      """SELECT * FROM VALUES
        |  (1, array(named_struct('le', 1.0D, 'count', 2L), named_struct('le', 2.0D, 'count', 1L))),
        |  (1, array(named_struct('le', 1.0D, 'count', 3L), named_struct('le', 4.0D, 'count', 5L)))
        |AS t(g, buckets)""".stripMargin).createOrReplaceTempView("hb_sqlfn")
    val sql = spark.sql(
      "SELECT g, graft_merge_buckets(buckets) AS m FROM hb_sqlfn GROUP BY g").head
    val api = spark.table("hb_sqlfn").groupBy(col("g"))
      .agg(MergeBucketsAgg.merge(col("buckets")).as("m")).head
    assert(sql.toString === api.toString)
    assert(sql.toString.contains("[1.0,5], [2.0,1], [4.0,5]"))
  }

  test("structural parameters reject non-literals at analysis") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash_sig(array(id), cast(id AS INT)) FROM range(3)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("integer literal"))
  }
}
