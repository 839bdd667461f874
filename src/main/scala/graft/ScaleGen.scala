package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak dataset builder: deterministic N× replication of a driver
  * testdata dir (TESTDATA.md fixtures, seed 42) so the full Verify + oracle +
  * Bench gate can run at a scale the shipped fixtures don't reach. Replica k
  * shifts every key column by a stride (join keys shifted consistently so
  * fact↔fact joins still resolve), perturbs document text with a per-replica
  * suffix (exact-duplicate explosion would be a different test), and
  * circularly rotates embeddings (norm-preserving, so cosine geometry stays
  * realistic). Dimension tables pass through unchanged. Everything is a pure
  * column transform of the source fixtures — byte-deterministic, no RNG — so
  * the DuckDB oracle recomputes the same ground truth from the same files.
  *
  * Usage: runMain graft.ScaleGen [srcDir] [outDir] [replicas]
  */
object ScaleGen {

  private def replicate(df: DataFrame, replicas: Int)(
      perReplica: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until replicas).map(k => perReplica(df, k)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/scale10x")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local()
    import graft.model.Tables

    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    // events: whatever encoding the source uses (Tables.events normalizes
    // ns-long / NTZ / TIMESTAMP), re-emitted as a µs timestamp — the type the
    // oracle's epoch_ms() expects. Same ts across replicas = N× per-bucket
    // density, the regime that stresses collect_list bucket concat and
    // per-series windows.
    val ev = Tables.events(spark, src)
    write("events", replicate(ev, replicas) { (df, k) =>
      df.select(
        (col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * 1000001L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, parts = 8)

    // documents: per-replica text suffix → near-duplicates across replicas,
    // stressing shingle/minhash/simhash candidate generation without the
    // degenerate every-doc-has-N-exact-copies blowup
    val docs = Tables.documents(spark, src)
    write("documents", replicate(docs, replicas) { (df, k) =>
      df.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(col("text"), lit(s" v$k"))).as("text"),
        col("lang"), col("source"),
        (if (k == 0) col("n_chars")
         else col("n_chars") + lit(s" v$k".length.toLong)).as("n_chars"))
    }, parts = 4)

    // embeddings: circular rotation by k — distinct vectors, same norms,
    // same pairwise structure within a replica
    val emb = Tables.embeddings(spark, src)
    val dim = emb.selectExpr("max(size(embedding))").collect()(0).getInt(0)
    write("embeddings", replicate(emb, replicas) { (df, k) =>
      val rot =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k))
      df.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        rot.as("embedding"), col("label"))
    }, parts = 4)

    // fact tables with a shared join key: shift o_orderkey/l_orderkey by the
    // SAME stride so orders⋈lineitem resolves within every replica
    val orders = Tables.orders(spark, src)
    write("orders", replicate(orders, replicas) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * 100000000L))
    }, parts = 4)
    val li = Tables.lineitem(spark, src)
    write("lineitem", replicate(li, replicas) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L))
    }, parts = 8)

    // dimensions pass through (part/supplier/customer keys referenced by the
    // replicated facts stay valid)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(t, Tables.load(spark, src, t), parts = 1)
    }

    println(s"[scalegen] wrote ${replicas}x of $src to $out")
    spark.stop()
  }
}
