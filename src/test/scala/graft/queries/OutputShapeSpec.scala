package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Driver-canonicalizer output contract: every registered query must emit
  * ONLY atomic-typed columns. The driver's correctness gate canonicalizes a
  * result by sorting a pandas frame over all columns, and pandas cannot hash
  * an ndarray cell — round 17's `q_embed_hashed`/`q_tokenize_ids` shipped
  * raw ARRAY columns and both became hard `err` rows in CORRECTNESS_r17
  * while the local DuckDB checker (which JSON-serialized lists) passed.
  * Sequence-valued results must be exploded to rows (`q_tokenize_ids`'s
  * (doc_id, pos, id), `q_a9_bucket_merge`'s (flag, le, count)) or serialized
  * to a string (`q_embed_hashed`'s CSV) BEFORE registration.
  * tools/oracle_check.py enforces the same rule on the oracle side. */
class OutputShapeSpec extends SparkSpec {

  private def atomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  private def nonAtomic(fields: Seq[StructField]): Seq[String] =
    fields.collect {
      case f if !atomic(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
    }

  test("positive control: the rule flags array, map, and struct columns") {
    val df = spark.range(1).select(
      array(lit(1L)).as("arr"),
      map(lit("k"), lit(1)).as("mp"),
      struct(lit(1).as("x")).as("st"),
      col("id"))
    assert(nonAtomic(df.schema.fields) ===
      Seq("arr: array<bigint>", "mp: map<string,int>", "st: struct<x:int>"))
    assert(nonAtomic(spark.range(1).schema.fields).isEmpty)
  }

  test("every registered query's output schema is atomic-only") {
    val bad = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val fields =
        try graft.SparkEntry.queries(name)(spark, Sf).schema.fields.toSeq
        finally graft.CacheHygiene.releaseAll(spark)
      val na = nonAtomic(fields)
      if (na.isEmpty) None else Some(s"$name -> ${na.mkString(", ")}")
    }
    assert(bad.isEmpty,
      "registered queries with non-atomic output columns (the driver's " +
        "canonicalizer cannot hash these — explode to rows or serialize " +
        "to a string): " + bad.mkString("; "))
  }
}
