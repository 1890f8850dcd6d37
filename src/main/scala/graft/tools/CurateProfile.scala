package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Curate, Dedup, Sampling, TextAnalysis}

/** Dev tool: stage-by-stage timing of the modern-curation / cluster path
  * (the r18 optimization round's second target family). Mirrors the bench
  * session shape (local[cpus], shuffle.partitions=cpus, AQE on). */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    def t(label: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label%-28s run$i n=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val d = docs.select(col("doc_id"),
      regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
    t("docs")(d.count())
    val norm = docs.select(col("doc_id"), col("source"),
      TextAnalysis.normalizeText(col("text")).as("text"))
    t("normalize")(norm.count())
    t("shingle_explode_distinct")(
      Dedup.explodedShingleHashes(d, "doc_id", "text", 3).distinct().count())
    t("ngram_pairs")(Dedup.ngramJaccard(d, "doc_id", "text", 3).count())
    val pairs = Dedup.ngramJaccard(d, "doc_id", "text", 3)
      .where(col("inter") * 10 >= col("union_n") * 6)
    t("pairs_filtered")(pairs.count())
    t("clusters")(Dedup.duplicateClusters(pairs).count())
    val scored = d.select(col("doc_id"),
      length(col("text")).cast("long").as("q"))
    t("keepbest")(Dedup.keepBest(scored, "doc_id", "q", pairs).count())
    t("curate3_full")(Curate.curateModern(docs, "doc_id", "text", "source",
      jaccardPermille = 600, shingleK = 3, qualityKeepPermille = 600,
      mixTargets = Map("src0" -> 500, "src1" -> 300, "src2" -> 200),
      salt = "cur3", materializeStages = true).count())
    spark.stop()
  }
}
