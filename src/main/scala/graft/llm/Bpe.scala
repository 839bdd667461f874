package graft.llm

import org.apache.spark.sql.Column

/** Pinned-vocabulary subword counting — the r12 verdict's upgrade over the
  * ceil(len/4) chars-per-token heuristic: token budgets (sequence packing,
  * corpus token mass) should count what a trainer's tokenizer would
  * actually emit, and a greedy longest-match over a FIXED literal
  * vocabulary is the engine-portable core of that (BPE inference IS greedy
  * segmentation over a learned merge vocabulary; the learning step is
  * offline, the vocab is pinned here the way [[LangId.profile]] pins its
  * weights).
  *
  * Vocabulary: built at library build time from the SAME hand-written seed
  * prose as the langid profiles ([[LangId.Seeds]]) — within-word character
  * n-grams ([[MinGram]]..[[MaxGram]]) counted across all languages, top
  * [[VocabSize]] by (count desc, gram asc) — a total order, so the vocab is
  * build-deterministic and [[vocabSqlValues]] hands the DuckDB oracle the
  * identical literal set.
  *
  * Segmentation contract (all three implementations — the native
  * expression [[graft.functions.BpeCountExpr]], the Scala reference
  * [[countToken]], and the oracle's recursive walk — are pinned equal):
  * walk the token left to right in CODE POINTS; at each position consume
  * the LONGEST vocab gram matching there (lengths [[MaxGram]] down to
  * [[MinGram]]), else consume one code point; each consumption counts one
  * subword; an empty token counts 1 (floor shared with the token-count
  * semantics). Properties: tokens ≤ subwords ≤ non-space code points (for
  * non-empty tokens).
  *
  * 100 TB shape: a per-row projection over the token array — one
  * generated-code pass, no shuffle, composes with the packing fold. */
object Bpe {

  val MinGram = 2
  val MaxGram = 6
  val VocabSize = 512

  // the vocab is built "from the SAME seed prose as the langid profiles" —
  // that premise requires the SAME normalization, so this is LangId's own
  // helper, not a copy that could drift
  private def normalizeStr(s: String): String = LangId.normalizeStr(s)

  /** gram → true (a Set would do; Map keeps the build counts inspectable
    * in tests). Grams are code-point substrings of seed WORDS — no
    * cross-word grams, no whitespace inside a gram. */
  lazy val vocab: Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    LangId.Seeds.values.foreach { seed =>
      normalizeStr(seed).split(' ').foreach { word =>
        val cps = word.codePoints().toArray
        var i = 0
        while (i < cps.length) {
          var l = MinGram
          while (l <= MaxGram && i + l <= cps.length) {
            val g = new String(cps, i, l)
            counts.update(g, counts.getOrElse(g, 0L) + 1L)
            l += 1
          }
          i += 1
        }
      }
    }
    counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(VocabSize).toMap
  }

  /** Reference greedy segmenter (the native expression's pinned twin). */
  def countToken(token: String): Long = {
    val cps = token.codePoints().toArray
    var i = 0
    var cnt = 0L
    while (i < cps.length) {
      var consumed = 1
      var l = math.min(MaxGram, cps.length - i)
      var found = false
      while (!found && l >= MinGram) {
        if (vocab.contains(new String(cps, i, l))) { consumed = l; found = true }
        l -= 1
      }
      i += consumed
      cnt += 1L
    }
    math.max(1L, cnt)
  }

  /** Total subword count over a token-array column — native generated-code
    * pass ([[graft.functions.BpeCountExpr]]). */
  def subwordCount(tokens: Column): Column =
    graft.functions.BpeCountExpr.count(tokens)

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `(g)` VALUES rows for the oracle — the same literal vocab the
    * expression matches against. */
  lazy val vocabSqlValues: String =
    vocab.keys.toSeq.sorted.map(g => s"(${sqlQuote(g)})").mkString(",\n")

  /** Symbol separator for [[trainMerges]]' sequence encoding — a control
    * char that cannot appear in whitespace-split tokens. */
  val SymSep = "\u001e"

  /** Symbol-level non-overlapping left-to-right merge of the pair (l, r)
    * over a [[SymSep]]-joined symbol string — the r14 ADVICE fix: a plain
    * `replace(sym, l+SEP+r, lr)` matches ACROSS symbol boundaries (l as a
    * suffix of a longer symbol, r as a prefix), corrupting e.g. [ab, c]
    * under the pair (b, c).
    *
    * Boundary-safe encoding: wrap every symbol in separators —
    * `S sym1 S S sym2 S ...` (inter-symbol boundaries become `SS`, the
    * ends single `S`) — then the pattern `S l S S r S -> S lr S` can only
    * match two complete adjacent symbols (symbols contain no S, so an
    * S-bounded span IS a whole symbol). Standard `replace` left-to-right
    * non-overlapping semantics carry over exactly: the replacement never
    * re-participates ([a,a,a,a] + (a,a) -> [aa,aa], [a,a,a] -> [aa,a]),
    * matching the reference trainer's scan. One codegen'd string pass per
    * merge, identical restatement in the DuckDB oracle. */
  def mergeSyms(sym: Column, l: String, r: String): Column = {
    import org.apache.spark.sql.functions._
    val S = SymSep
    val wrapped = concat(lit(S),
      org.apache.spark.sql.functions.replace(sym, lit(S), lit(S + S)), lit(S))
    val merged = org.apache.spark.sql.functions.replace(wrapped,
      lit(S + l + S + S + r + S), lit(S + l + r + S))
    org.apache.spark.sql.functions.replace(
      merged.substr(lit(2), length(merged) - 2), lit(S + S), lit(S))
  }

  /** BPE merge TRAINING (Sennrich et al. 2016) — the learn side of the
    * pinned-vocab story above: derive the first `rounds` merges from the
    * corpus itself. Classic algorithm on the word-frequency table: count
    * adjacent symbol pairs (weighted by word frequency), merge the most
    * frequent pair everywhere (ties → lexicographically smallest pair),
    * repeat. Returns (merge_rank, sym_l, sym_r, pair_count).
    *
    * Spark shape — the part that matters at 100 TB: the working set is the
    * DISTINCT-WORD table (one explode + one map-side-combined groupBy of
    * the corpus, then vocabulary-sized forever), exactly how offline BPE
    * trainers operate; each round is one narrow pair-explode + groupBy over
    * that table and the argmax collects ONE row for loop control (the
    * k-means-iteration class of driver decision, not a data collect).
    * Symbol sequences ride as [[SymSep]]-joined strings so the merge apply
    * is a codegen'd left-to-right non-overlapping `replace` — the same
    * semantics in the JVM and in the oracle's `replace`, which restates
    * the identical unrolled rounds from the same corpus. Pair counts count
    * every adjacent occurrence (the reference algorithm's statistic);
    * the apply is non-overlapping left-to-right (aaa + (a,a) → [aa, a]).
    * Base symbols are CODE POINTS (r19, matching [[countToken]] and
    * [[tokenizeIds]]): Java's `split("")` cuts BETWEEN code units — a
    * surrogate pair becomes two lone-surrogate symbols while DuckDB's
    * `string_split(w, '')` keeps it whole — so the split is
    * `regexp_extract_all(w, '(?s).')`, one match per code point in BOTH
    * engines (Java regex `.` and RE2 `.` are code-point matchers). */
  def trainMerges(docs: org.apache.spark.sql.DataFrame, text: Column,
      rounds: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(rounds > 0, "rounds must be positive")
    val spark = docs.sparkSession
    // LAZY checkpoints (r21): an eager localCheckpoint is its own Spark job,
    // so each round paid TWO driver round-trips (materialize + argmax
    // collect). Lazy checkpointing folds materialization into the next
    // round's collect — one job per round, same blocks, same result. The
    // superseded round's blocks are released only AFTER the collect that
    // materialized its successor (a lazily-checkpointed plan cannot
    // recompute once its parent's truncated-lineage blocks are gone).
    var words = wordTable(docs, text).localCheckpoint(false)
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      // `words` is materialized now — the prior round's blocks are dead
      // weight, free them or storage grows linearly with rounds (r14 ADVICE)
      prev.foreach(unpersistCheckpoint)
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val (l, ri, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((r.toLong, l, ri, c))
        prev = Some(words)
        words = words.withColumn("sym", mergeSyms(col("sym"), l, ri))
          .localCheckpoint(false)
        r += 1
      }
    }
    prev.foreach(unpersistCheckpoint)
    unpersistCheckpoint(words)
    import spark.implicits._
    merges.result().toDF("merge_rank", "sym_l", "sym_r", "pair_count")
  }

  /** The distinct-word frequency table with code-point-split symbol
    * strings — the working set both trainers iterate on (corpus-linear to
    * build once, vocabulary-sized forever). */
  private def wordTable(docs: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .select(explode(TextAnalysis.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), concat_ws(SymSep,
        regexp_extract_all(col("w"), lit("(?s)."), lit(0))).as("sym"))
  }

  /** The per-round adjacent-pair count over a word table — shared by both
    * trainers: one narrow pair-explode + map-side-combined groupBy. */
  private def pairCounts(words: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    words
      .select(col("freq"), split(col("sym"), SymSep).as("s"))
      .select(col("freq"),
        explode(when(size(col("s")) >= 2,
          transform(sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** One wrap, K chained whole-symbol replaces, one unwrap — the batched
    * apply. Equivalent to folding [[mergeSyms]] per merge (wrap∘unwrap is
    * the identity on well-formed wrapped strings, and each replacement
    * preserves the wrapped S…S structure), but the single wrap/unwrap
    * keeps the expression tree LINEAR in K — the per-merge unwrap
    * references its input twice (substr + length), so a folded chain
    * duplicates the base expression 2^K times. */
  private[llm] def mergeSymsChain(sym: Column,
      ms: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.functions._
    val S = SymSep
    val wrapped = concat(lit(S),
      org.apache.spark.sql.functions.replace(sym, lit(S), lit(S + S)), lit(S))
    val merged = ms.foldLeft(wrapped) { case (s, (l, r)) =>
      org.apache.spark.sql.functions.replace(s,
        lit(S + l + S + S + r + S), lit(S + l + r + S))
    }
    org.apache.spark.sql.functions.replace(
      regexp_replace(merged, "^" + S + "|" + S + "$", ""),
      lit(S + S), lit(S))
  }

  /** How many ranked candidates each batched round examines per merge
    * slot — the same LIMIT the oracle's candidate CTE carries. */
  val BatchCandidateFactor = 4

  /** BATCHED BPE merge training (r18 verdict #6): [[trainMerges]] runs one
    * full corpus-table aggregation + driver round-trip PER MERGE — fine at
    * rounds=4, a wall of 32k sequential Spark jobs at a production vocab.
    * Here each driver round selects up to `batch` merges from ONE pair
    * count and applies them in rank order, cutting driver round-trips by
    * the batch factor.
    *
    * Selection rule (deterministic, and restatable in SQL without
    * recursion — the reason it is NOT the textbook greedy): rank
    * candidates by (cnt DESC, l, r), keep candidate i iff it shares no
    * symbol string with ANY higher-ranked candidate among the top
    * [[BatchCandidateFactor]]·batch (kept or not — checking only KEPT
    * predecessors would be the sequential-greedy rule, which needs a
    * recursive fold); take the first `batch` kept. Rank 1 always survives,
    * so every round makes progress. The kept set is pairwise
    * symbol-disjoint, and the apply chains the replaces in rank order —
    * chaining matters only when a merge's OUTPUT string collides with a
    * later merge's operand, and both the engine and the oracle chain
    * identically.
    *
    * `rounds` is the DRIVER-ROUND count: total merges ≤ rounds·batch (a
    * round may keep fewer than `batch` when the top candidates interact —
    * the count is data-dependent, the round structure is not, which is
    * what lets the oracle unroll it). Equivalence: at batch=1 the
    * disjointness check is vacuous and this IS [[trainMerges]] (pinned by
    * BpeSpec). */
  def trainMergesBatched(docs: org.apache.spark.sql.DataFrame, text: Column,
      rounds: Int, batch: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(rounds > 0 && batch > 0, "rounds and batch must be positive")
    val spark = docs.sparkSession
    // lazy checkpoints, one job per round — see trainMerges' r21 note
    var words = wordTable(docs, text).localCheckpoint(false)
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 0L
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val cands = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(BatchCandidateFactor * batch).collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
      prev.foreach(unpersistCheckpoint)
      prev = None
      if (cands.isEmpty) exhausted = true
      else {
        val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        while (i < cands.length && kept.size < batch) {
          val (l, ri, c) = cands(i)
          val conflict = (0 until i).exists { j =>
            val (jl, jr, _) = cands(j)
            jl == l || jl == ri || jr == l || jr == ri
          }
          if (!conflict) kept += ((l, ri, c))
          i += 1
        }
        kept.foreach { case (l, ri, c) =>
          merges += ((rank, l, ri, c)); rank += 1L
        }
        prev = Some(words)
        words = words
          .withColumn("sym",
            mergeSymsChain(col("sym"), kept.toSeq.map { case (l, ri, _) => (l, ri) }))
          .localCheckpoint(false)
        r += 1
      }
    }
    prev.foreach(unpersistCheckpoint)
    unpersistCheckpoint(words)
    import spark.implicits._
    merges.result().toDF("merge_rank", "sym_l", "sym_r", "pair_count")
  }

  private def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    graft.CacheHygiene.unpersistCheckpoint(df)

  /** Subword count under a LEARNED merge list — [[trainMerges]]' tokenizer
    * applied: each token splits to code-point symbols, the merges replay
    * in rank order (the trainer's non-overlapping left-to-right symbol
    * apply), and the surviving symbol count is the token's subword count.
    * The merge list is driver-side state baked into a native expression
    * ([[graft.functions.LearnedBpeCountExpr]]) — one generated-code pass,
    * scan speed, no shuffle (the wrapped-replace HOF chain this replaces
    * paid four interpreted string replaces per merge per token and
    * benched 5.5 s at sf0.1). */
  def learnedSubwordCount(toks: Column,
      merges: Seq[(String, String)]): Column =
    graft.functions.LearnedBpeCountExpr.count(toks, merges)

  /** Deterministic id vocabulary for [[tokenizeIds]]: the corpus' sorted
    * distinct single-code-point base symbols (ids 0..B−1 — UTF-8 binary
    * sort, identical in Spark and DuckDB), then each merge's output symbol
    * in rank order (ids B..B+rounds−1). When a later entry collides with
    * an earlier string (two merge paths producing the same symbol) the
    * FIRST id wins — [[graft.functions.LearnedBpeIdsExpr]] and the
    * oracle's min(id) agree on that.
    *
    * The distinct-chars collect is bounded by the corpus ALPHABET (a
    * vocabulary, not data) — the same driver-side-model class as
    * [[trainMerges]]' argmax rows. */
  def idVocab(docs: org.apache.spark.sql.DataFrame, text: Column,
      merges: Seq[(String, String)]): Seq[String] = {
    import org.apache.spark.sql.functions._
    val base = docs
      .select(explode(TextAnalysis.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      // code-point split, not split(w, "") — see trainMerges
      .select(explode(regexp_extract_all(col("w"), lit("(?s)."), lit(0))).as("ch"))
      .distinct().orderBy(col("ch"))
      .collect().map(_.getString(0)).toSeq
    base ++ merges.map { case (l, r) => l + r }
  }

  /** Token-id sequence under a learned merge list + id vocabulary — the
    * trainer-facing tokenize step ([[graft.functions.LearnedBpeIdsExpr]]):
    * per non-empty token, the merge walk's surviving symbols map to their
    * vocab ids (UNK = −1), concatenated across the token array in order. */
  def tokenizeIds(toks: Column, merges: Seq[(String, String)],
      vocab: Seq[String]): Column =
    graft.functions.LearnedBpeIdsExpr.ids(toks, merges, vocab)

  /** HOF twin of [[learnedSubwordCount]] — the engine-portable wrapped-
    * replace chain the DuckDB oracle restates verbatim; BpeSpec pins the
    * native form equal. */
  def learnedSubwordCountHof(toks: Column,
      merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.functions._
    aggregate(toks, org.apache.spark.sql.functions.lit(0L), (acc, t) => {
      val sym0 = concat_ws(SymSep, split(t, ""))
      val symN = merges.foldLeft(sym0) { case (s, (l, r)) =>
        mergeSyms(s, l, r) // symbol-boundary-safe, like the trainer
      }
      acc + size(split(symN, SymSep))
    })
  }
}
