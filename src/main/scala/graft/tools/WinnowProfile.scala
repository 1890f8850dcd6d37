package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Dev tool: stage-by-stage timing of the winnow near-dup chain (the
  * q_dedup_winnow / spans family cost centers) at a configurable core
  * count. Usage: WinnowProfile [sfDir] [cpus] [arith01] */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val arith = args.length > 2 && args(2) == "1"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
    def t(label: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label%-28s rep$i n=$n%-9d ${(System.nanoTime() - t0) / 1e9}%5.2f s")
      }
    }
    t("base(explode+lead)")(
      Dedup.shingleBase(d, "doc_id", "text", 3, arith).count())
    t("fps(window+distinct)")(
      Dedup.winnowFingerprints(d, "doc_id", "text", 3, 8, arith).count())
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", 3, 8, arith)
      .select(col("id"), col("fp_hash")).distinct().localCheckpoint()
    t("cand(self-join|fps ckpt)")(
      Dedup.winnowCandidatesFromFps(fps, 1000).count())
    t("inv(explode+distinct)")(
      Dedup.explodedShingleHashes(d, "doc_id", "text", 3).distinct().count())
    val cand = Dedup.winnowCandidatesFromFps(fps, 1000).localCheckpoint()
    val inv = Dedup.explodedShingleHashes(d, "doc_id", "text", 3)
      .distinct().localCheckpoint()
    t("sets(collect_set)")(
      inv.groupBy(col("id")).agg(collect_set(col("h")).as("hs")).count())
    val sets = inv.groupBy(col("id")).agg(collect_set(col("h")).as("hs"))
      .localCheckpoint()
    t("verify-joins(sets ckpt)")(
      cand.join(sets.select(col("id").as("a"), col("hs").as("__ha")), "a")
        .join(sets.select(col("id").as("b"), col("hs").as("__hb")), "b")
        .select(col("a"), col("b"),
          size(array_intersect(col("__ha"), col("__hb"))).as("i"))
        .where(col("i") > 30).count())
    t("verify-joins(bcast sets)")(
      cand.join(broadcast(sets.select(col("id").as("a"), col("hs").as("__ha"))), "a")
        .join(broadcast(sets.select(col("id").as("b"), col("hs").as("__hb"))), "b")
        .select(col("a"), col("b"),
          size(array_intersect(col("__ha"), col("__hb"))).as("i"))
        .where(col("i") > 30).count())
    t("verify(cand+inv ckpt)")(
      Dedup.verifyJaccardPairs(cand, inv, 0.6).count())
    t("winnowNearDup(end2end)")(
      Dedup.winnowNearDup(d, "doc_id", "text", 3, 8, 0.6, 1000, arith).count())
    spark.stop()
  }
}
