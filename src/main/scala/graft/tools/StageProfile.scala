package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Dev tool: stage-by-stage timing of the LSH dedup pipelines. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // UTC pin: Tables' NTZ normalization is only correct under a UTC
      // session — without it a non-UTC host shifts ts vs bench/verify
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-22s n=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("docs")(docs.count())
    t("shingles")(docs.select(Dedup.shingles(col("text"), 3).as("sh")).count())
    t("shingle_elems")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    t("minhash_sig")(docs.select(
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 32)).count())
    t("simhash_sig")(docs.select(Dedup.simhash(col("text"), 3)).count())
    t("minhash_pairs")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    t("simhash_pairs")(Dedup.simhashCandidates(docs, "doc_id", "text", 3, 8).count())
    spark.stop()
  }
}
