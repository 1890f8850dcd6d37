package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the LSH-banded cosineNearDup at a fixture scale with
  * band parameters either pinned (args: planes chunks) or sized by the
  * Dedup.lshParamsFor log2 rule from the actual corpus count. Evidence
  * tool for SCALE.md's "bucket count must grow with the corpus" claim:
  * fixed 8-bit bands scale super-linearly sf0.1→sf1 while log2-sized
  * bands stay near-linear, at matched recall on the planted pairs. */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val pinned: Option[(Int, Int)] =
      if (args.length > 2) Some((args(1).toInt, args(2).toInt)) else None
    val maxHamming: Option[Int] =
      if (args.length > 3) Some(args(3).toInt) else None
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val n = emb.count()
    val (planes, chunks) = pinned.getOrElse(graft.pipeline.Dedup.lshParamsFor(n))
    println(s"[lshprobe] n=$n planes=$planes chunks=$chunks " +
      s"(${planes / chunks}-bit bands, ${1L << (planes / chunks)} buckets)")
    // candidate-pair count: the structural scale measure (downstream
    // shuffle/score volume); at probe-size corpora wall time is still
    // overhead-dominated, candidates already show the asymptote
    val cands = graft.pipeline.Dedup.lshCandidatePairs(
      emb.select(col("vec_id").as("id"), col("v")), planes, chunks).count()
    println(f"[lshprobe] candidates=$cands (${cands.toDouble / n}%.1f per vector)")
    maxHamming.foreach { h =>
      val kept = graft.pipeline.Dedup.lshCandidatePairs(
        emb.select(col("vec_id").as("id"), col("v")), planes, chunks,
        Some(h)).count()
      println(f"[lshprobe] candidates(hamming<=$h)=$kept " +
        f"(${kept.toDouble / n}%.2f per vector)")
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val pairs = graft.pipeline.Dedup.cosineNearDup(
        emb, "vec_id", "v", 0.93, blockCol = None,
        planes = planes, chunks = chunks, maxHamming = maxHamming).count()
      println(f"[lshprobe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $pairs pairs")
    }
    spark.stop()
  }
}
