package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for MinHash candidate volume under both hash families —
  * the r17 curvature investigation: `q_dedup_minhash_arith` read a
  * fitted exponent p≈2.0 on the sf1→sf3 pair while its xxhash64
  * production twin stayed p≈0.65; candidate-pair counts per corpus
  * size split "the plan degrades" from "the portable hash's buckets
  * degenerate on the scaled corpus".
  *
  *   sbt "runMain graft.tools.MinhashProbe <sfDir>"
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // toggle to reproduce the BENCH context (AQE on) vs the bare one —
      // the r17 finding below hinged on exactly this difference
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
    val n = d.count()
    for (arith <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val cands = graft.pipeline.Dedup
        .minhashCandidates(d, "doc_id", "text", arithmeticHash = arith)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[minhashprobe] $sfDir docs=$n arith=$arith " +
        f"candidates=$cands (${cands.toDouble / n}%.2f per doc) $sec%.1f s")
    }
    spark.stop()
  }
}
