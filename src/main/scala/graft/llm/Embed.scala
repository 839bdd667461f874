package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-native document embedder (r16 verdict #6): project text to a
  * fixed-dim hashed-bigram count vector
  * ([[graft.functions.HashedEmbeddingExpr]]) so the embedding stack —
  * SemDeDup, the ANN family, cluster-balanced sampling — runs end-to-end
  * from a text column with no external model. Integer counts keep every
  * downstream integer-L2 / normalize-then-cosine step engine-exact, so
  * text→embed→dedup chains carry FULL DuckDB oracles.
  *
  * 100 TB shape: a per-row generated-code projection over the token
  * stream — zero shuffle, zero state; the embedding is computed at scan
  * speed wherever the plan already reads the text. */
object Embed {

  /** Default embedding width — matches the synthetic `embeddings` table's
    * dim 64 so the two sources drop into the same consumers. A production
    * caller raises it (feature hashing quality grows with dim; the plan
    * does not change). */
  val Dim = 64

  /** Hashed-bigram count embedding of a text column: tokens are the
    * newline-aware word stream ([[TextAnalysis.flatTokens]] — empty
    * tokens never hash, the [[Dsir.bucketIds]] contract). */
  def hashedEmbedding(text: Column, dim: Int = Dim): Column =
    graft.functions.HashedEmbeddingExpr.embed(TextAnalysis.flatTokens(text), dim)
}
