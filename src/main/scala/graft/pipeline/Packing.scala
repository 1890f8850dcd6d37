package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing: lay the corpus out as one long token stream and cut it
  * into fixed-length context windows (concatenate-then-chunk — the standard
  * pretraining batch layout). Each document gets its global `start_offset`
  * in the stream plus the first/last chunk it lands in; a chunk manifest
  * (chunk → contributing docs) is one `explode(sequence(first,last))` away.
  *
  * The core is a GLOBAL running sum of token counts in a deterministic
  * document order — the textbook case where the obvious plan
  * (`Window.orderBy(id)` with no partition key) collapses 100 TB onto a
  * single task. This implementation is the distributed two-phase prefix
  * sum instead:
  *
  *   1. split the key space into range buckets at `approxQuantile`
  *      boundaries — the bucket is a PURE FUNCTION of the key (a literal
  *      CASE chain), so recomputation can never relabel a row (the trap
  *      with `spark_partition_id`-based labels, which are only stable
  *      while a cache holds);
  *   2. aggregate ONE row per bucket (token sum + key range) — a bounded
  *      collect, ≤ the bucket count, same posture as the IVF centroid
  *      pull — and fold the bucket totals into exclusive prefix offsets
  *      on the driver;
  *   3. add each row's WITHIN-BUCKET running sum (a window partitioned by
  *      bucket, so every window partition is one quantile-balanced range
  *      bucket — never the whole corpus) to its bucket's offset literal.
  *
  * Chunk arithmetic is integer division throughout, so the layout is
  * engine-portable and oracle-checkable. Where the boundaries fall does
  * not affect the result — bucket totals telescope to the same global
  * prefix sum — only the order key itself must be deterministic.
  */
object Packing {

  /** Bucket assignment: index of the first boundary above the key, i.e.
    * bucket b covers keys in (boundaries(b-1), boundaries(b)]. A literal
    * chain over ≤ `buckets` split points — scan-level, codegen'd. */
  private def bucketCol(id: Column, bounds: Array[Double]): Column =
    bounds.zipWithIndex.foldLeft(lit(bounds.length): Column) {
      case (e, (b, i)) => when(id <= lit(b.toLong), lit(i)).otherwise(e)
    }

  /** Per-document packing coordinates over the whitespace token stream.
    *
    * Output: `id, n_tokens, start_offset, first_chunk, last_chunk,
    * n_chunks` — `start_offset` is the exclusive prefix sum of `n_tokens`
    * in ascending-id order; a document occupies token interval
    * `[start_offset, start_offset + n_tokens)` and therefore chunks
    * `start_offset div seqLen .. (start_offset + n_tokens - 1) div seqLen`
    * of size `seqLen`. Empty documents (0 tokens) are kept with
    * `n_chunks = 0` and both chunk ids pinned to the start boundary.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, buckets: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    val nBuckets =
      if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val toks = df.select(col(idCol).cast("long").as("id"),
      when(length(trim(col(textCol))) === 0, lit(0L))
        .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))
        .as("n_tokens"))

    // Phase 1: deterministic range boundaries. approxQuantile is one scan
    // over the 2-column frame and returns ≤ nBuckets-1 split points; the
    // resulting bucket expression is recompute-safe by construction.
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else toks.stat.approxQuantile("id", probes, 0.001).distinct
    val withBucket = toks.withColumn("bucket", bucketCol(col("id"), bounds))

    // Phase 2: one row per bucket — bounded by nBuckets — collected and
    // folded into exclusive prefix offsets. The max(id)-vs-boundary order
    // is guaranteed by the bucket expression itself, so no re-check pass:
    // bucket index order IS key-range order.
    var acc = 0L
    val offsets = withBucket.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .map { case (b, t) => val o = (b, acc); acc += t; o }
    val offsetCol = offsets.foldLeft(lit(0L): Column) {
      case (e, (b, off)) => when(col("bucket") === lit(b), lit(off)).otherwise(e)
    }

    // Phase 3: within-bucket running sum + the bucket's offset. Every
    // window partition is one quantile-balanced bucket — bounded, parallel.
    val win = Window.partitionBy(col("bucket")).orderBy(col("id"))
    withBucket
      .withColumn("start_offset",
        sum(col("n_tokens")).over(win) - col("n_tokens") + offsetCol)
      .withColumn("first_chunk", expr(s"start_offset div ${seqLen.toLong}"))
      .withColumn("last_chunk",
        when(col("n_tokens") === 0, expr(s"start_offset div ${seqLen.toLong}"))
          .otherwise(expr(s"(start_offset + n_tokens - 1) div ${seqLen.toLong}")))
      .withColumn("n_chunks",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("last_chunk") - col("first_chunk") + 1L))
      .select(col("id"), col("n_tokens"), col("start_offset"),
        col("first_chunk"), col("last_chunk"), col("n_chunks"))
  }

  /** Document-preserving batch layout: pack WHOLE documents into bins of
    * nominal capacity `binCapacity` tokens, never splitting a document —
    * the truncation-free alternative to [[packSequences]]' concatenate-
    * then-chunk (the "fewer truncations" layout: a doc cut mid-thought
    * trains on broken context; this keeps every doc intact and pads or
    * overflows the boundary instead). Greedy in ascending-id order: a
    * document joins the bin its global start offset falls in, so bins
    * fill to at most `binCapacity + doc_len − 1` tokens (the one
    * boundary-crossing doc) — the bounded-overflow tradeoff that makes
    * the layout a pure function of the prefix sum. Exact
    * capacity-respecting best-fit requires the sequential bin-state scan
    * single-node packers run; this is the distributed form: same prefix
    * sum as packSequences (two-phase, never a global window), one
    * bin-partitioned window for the within-bin index (each bin holds a
    * bounded handful of docs). Returns (id, n_tokens, bin, pos_in_bin). */
  def packDocsNoSplit(df: DataFrame, idCol: String, textCol: String,
      binCapacity: Int, buckets: Int = 0): DataFrame = {
    require(binCapacity > 0, s"binCapacity must be positive: $binCapacity")
    val packed = packSequences(df, idCol, textCol, binCapacity, buckets)
    val binWin = Window.partitionBy(col("bin")).orderBy(col("id"))
    packed
      .withColumn("bin", expr(s"start_offset div ${binCapacity.toLong}"))
      .withColumn("pos_in_bin",
        (row_number().over(binWin) - 1).cast("long"))
      .select(col("id"), col("n_tokens"), col("bin"), col("pos_in_bin"))
  }

  /** Per-bin audit of [[packDocsNoSplit]]: doc count, token fill, and the
    * overflow flag (fill past the nominal capacity — at most one
    * boundary-crossing doc's tail by construction). One map-side-combined
    * aggregation; output is |bins| rows. */
  def binFill(packedDocs: DataFrame, binCapacity: Int): DataFrame =
    packedDocs.groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("fill"))
      .withColumn("overflow", col("fill") > binCapacity.toLong)

  /** Chunk manifest: one row per (chunk, document) incidence — which
    * documents feed each fixed-length context window, and how many of the
    * document's tokens land there. Derived from [[packSequences]] by
    * exploding each doc's chunk span; row count is the packed stream's
    * total chunk-crossings (≈ corpus_tokens / seqLen + n_docs), never
    * all-pairs. */
  def chunkManifest(packed: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val s = seqLen.toLong
    packed.where(col("n_tokens") > 0)
      .select(col("id"), col("n_tokens"), col("start_offset"),
        explode(expr("sequence(first_chunk, last_chunk)")).as("chunk"))
      .withColumn("tok_from", greatest(col("chunk") * s, col("start_offset")))
      .withColumn("tok_to",
        least((col("chunk") + 1L) * s, col("start_offset") + col("n_tokens")))
      .select(col("chunk"), col("id"),
        (col("tok_to") - col("tok_from")).as("n_tokens_in_chunk"))
  }
}
