package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer induction: the pair-statistics / merge loop
  * of byte-pair encoding, run corpus-scale the way tokenizer training
  * actually distributes.
  *
  * The standard trick makes this tractable at 100 TB: pair counts are
  * computed over the DISTINCT-WORD table weighted by word frequency, not
  * over the raw token stream. By Heaps' law the distinct-word table is
  * sublinear in corpus size (millions of rows where the corpus has
  * trillions of tokens), so after one map-side-combined exchange builds
  * it, every merge round touches only that small table — the corpus is
  * read exactly once regardless of how many merges are trained.
  *
  * Words are case-folded and restricted to `[a-z]+` so substring/codepoint
  * semantics are identical in every engine (the oracle replays pair
  * statistics in SQL); no end-of-word marker is appended — merges
  * therefore do not distinguish word-final pairs, a documented
  * simplification (add a marker symbol to `wordSymbols` to restore it).
  */
object Tokenizer {

  /** Distinct-word symbol table: (w, syms, freq) with `syms` the initial
    * single-character symbol sequence. One exchange (map-side combined);
    * everything downstream iterates on this table only. */
  def wordSymbols(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), filter(split(col("w"), ""), c => c =!= "").as("syms"),
        col("freq"))

  /** Corpus-weighted adjacent-pair counts over a symbol table: (pair, n)
    * with `pair` the space-joined symbol pair. One exchange on the pair
    * (map-side combined); rows-per-word = symbols−1, linear. */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.where(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => concat_ws(" ", element_at(col("syms"), i + 1),
          element_at(col("syms"), i + 2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).cast("long").as("n"))

  /** Top-K merge candidates with the deterministic (count desc, pair asc)
    * tie-break — a TakeOrdered, no global sort. */
  def topPairs(syms: DataFrame, k: Int): DataFrame =
    pairCounts(syms).orderBy(col("n").desc, col("pair")).limit(k)

  /** One BPE merge applied to the symbol table: every left-to-right
    * non-overlapping adjacent (a, b) becomes the single symbol a+b — the
    * exact greedy semantics of reference BPE (and of a string
    * `replace(w, a+b, …)` while symbols are still single characters,
    * which is what the round-2 oracle replays). Scan-local fold per word:
    * no shuffle. */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame = {
    val merged = a + b
    syms.withColumn("syms",
      aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
        // try_element_at: null (→ false branch) on the empty accumulator,
        // where ANSI element_at would raise
        when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x)))))
  }

  /** A trained merge list applied in training order — the ENCODE direction
    * of BPE. Each merge is one scan-local fold; for large merge lists,
    * checkpoint every ~16 merges (nested-lambda plans grow linearly) the
    * same way bpeTrain truncates per-round. */
  def encodeSymbols(syms: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(syms) { case (s, (a, b)) => applyMerge(s, a, b) }

  /** Per-document token counts under a trained BPE model: (id, n_words,
    * n_bpe_tokens) over the qualifying ([a-z]{2,}) words. The distinct-word
    * table is encoded ONCE (merge folds never touch the corpus); the word
    * stream joins it on the word — an AQE-broadcastable build side, since
    * the encoded vocabulary is Heaps'-law small. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    tokenCountsFor(df, idCol, textCol,
      encodeSymbols(wordSymbols(df, textCol), merges))

  /** [[tokenCounts]] against an ALREADY-encoded symbol table — the path to
    * take right after [[bpeTrainTable]], whose final table is exactly this
    * argument: re-deriving it from the corpus would repeat the word-count
    * exchange for no new information. */
  def tokenCountsFor(df: DataFrame, idCol: String, textCol: String,
      encoded: DataFrame): DataFrame = {
    val words = df.select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
    val wt = encoded.select(col("w"), size(col("syms")).cast("long").as("n_tok"))
    words.join(wt, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("n_tok")).cast("long").as("n_bpe_tokens"))
  }

  /** Train `rounds` BPE merges: each round takes the argmax pair (one
    * aggregation job; only ONE row reaches the driver — the same
    * bounded-driver-state posture as k-means centroids) and folds it into
    * the symbol table. Lineage is truncated every round via
    * localCheckpoint so round R does not replay rounds 1..R−1 (the
    * duplicateClusters discipline). Returns the merge list in training
    * order with counts; fewer than `rounds` entries when the table runs
    * dry. */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int): Seq[(String, Long)] =
    bpeTrainTable(df, textCol, rounds)._1

  /** [[bpeTrain]] that also returns the final (checkpointed) symbol table —
    * feed it straight to [[tokenCountsFor]] to encode without re-scanning
    * the corpus. */
  def bpeTrainTable(df: DataFrame, textCol: String,
      rounds: Int): (Seq[(String, Long)], DataFrame) = {
    var syms = wordSymbols(df, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(String, Long)]
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val top = topPairs(syms, 1).collect()
      if (top.isEmpty) dry = true
      else {
        val pair = top(0).getString(0)
        merges += ((pair, top(0).getLong(1)))
        val Array(a, b) = pair.split(" ", 2)
        syms = applyMerge(syms, a, b).localCheckpoint()
      }
      r += 1
    }
    (merges.result(), syms)
  }
}
