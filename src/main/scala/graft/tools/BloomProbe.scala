package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Dev tool: measure the decontamination Bloom prefilter's SELECTIVITY —
  * the structural scale measure behind SCALE.md's claim that the corpus
  * gram stream is cut at scan level before the distinct exchange. Counts
  * the train-side gram stream (multiset, the volume the exact path
  * shuffles into its distinct), the grams the two-probe bit table passes,
  * and the true matches (grams actually in the eval set) — pass − true =
  * false positives, the only waste the verify join has to clean up.
  * Evidence claim: pass volume tracks the TRUE match volume (plus the
  * fp-rate × stream term), not the corpus, once bloomBits ≈ 10× the eval
  * gram count.
  *
  * Usage: runMain graft.tools.BloomProbe [sfDir] [bloomBits] [k]
  * Prints one JSON line.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bloomBits = args.lift(1).map(_.toInt).getOrElse(1 << 16)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
    val isEval = col("doc_id") % 97 === 0

    val evalSh = Dedup.explodedShingleHashes(d.where(isEval), "doc_id",
      "text", k).distinct().localCheckpoint()
    val nEval = evalSh.count()
    val words = Dedup.bloomBitTable(evalSh, "h", bloomBits)
    val setBits = words.map(java.lang.Long.bitCount).sum

    val trainStream = Dedup.explodedShingleHashes(d.where(!isEval),
      "doc_id", "text", k).localCheckpoint()
    val nStream = trainStream.count()
    val nPass = trainStream
      .where(Dedup.bloomMightContain(col("h"), words, bloomBits)).count()
    val nTrue = trainStream
      .join(evalSh.select(col("h")), Seq("h"), "left_semi").count()

    def t(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (nExact, wallExact) = t(Dedup.decontaminate(d, "doc_id", "text",
      isEval, k, minShared = 2).count())
    val (nBloom, wallBloom) = t(Dedup.decontaminateBloom(d, "doc_id",
      "text", isEval, k, minShared = 2, bloomBits).count())
    require(nExact == nBloom,
      s"bloom path diverged from exact: $nBloom vs $nExact")

    println(s"""{"sf":"$sfDir","bloom_bits":$bloomBits,"k":$k,""" +
      s""""eval_grams":$nEval,"set_bits":$setBits,""" +
      s""""train_gram_stream":$nStream,"pass":$nPass,"true_match":$nTrue,""" +
      s""""false_pos":${nPass - nTrue},""" +
      s""""pass_permille":${nPass * 1000 / math.max(nStream, 1)},""" +
      s""""rows_exact":$nExact,"rows_bloom":$nBloom,""" +
      s""""wall_exact_sec":${math.round(wallExact * 100) / 100.0},""" +
      s""""wall_bloom_sec":${math.round(wallBloom * 100) / 100.0}}""")
    spark.stop()
  }
}
