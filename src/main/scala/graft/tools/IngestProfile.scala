package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: break the one-time route-event materialization into its cost
  * components (derive, shuffle, write). */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC pin: Tables' NTZ normalization is only correct under a UTC
      // session — without it a non-UTC host shifts ts vs bench/verify
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val events = graft.queries.Tables(spark, sfDir, "events")
    t("events_scan")(events.count())
    val derived = graft.sources.RouteEventGen.fromEvents(events)
    t("derive_only")(derived.count())
    t("derive_no_strings")(derived.drop("prefix_str", "attr_strs").count())
    val dir0 = java.nio.file.Files.createTempDirectory("ingest_prof").toString
    t("derive_write_flat")(derived.write.mode("overwrite").parquet(s"$dir0/flat"))
    t("write_no_attrstrs")(derived.drop("attr_strs")
      .write.mode("overwrite").parquet(s"$dir0/noas"))
    t("write_shuffle_nopart")(derived
      .repartition(spark.sparkContext.defaultParallelism, col("rib"),
        coalesce(shiftright(col("prefix.ip_lo"), 16) +
          shiftright(col("prefix.ip_hi"), 16), lit(0L)))
      .sortWithinPartitions(col("prefix.ip_hi"), col("prefix.ip_lo"))
      .write.mode("overwrite").parquet(s"$dir0/shuf"))
    t("write_sortpart_noshuffle")(derived
      .sortWithinPartitions(col("rib"), col("prefix.ip_hi"), col("prefix.ip_lo"))
      .write.mode("overwrite").partitionBy("rib").parquet(s"$dir0/nosh"))
    t("write_sortpart_coalesce8")(derived.coalesce(8)
      .sortWithinPartitions(col("rib"), col("prefix.ip_hi"), col("prefix.ip_lo"))
      .write.mode("overwrite").partitionBy("rib").parquet(s"$dir0/co8"))
    t("write_sortpart_coalesce16")(derived.coalesce(16)
      .sortWithinPartitions(col("rib"), col("prefix.ip_hi"), col("prefix.ip_lo"))
      .write.mode("overwrite").partitionBy("rib").parquet(s"$dir0/co16"))
    t("full_routeEvents")(
      graft.sources.RouteEventGen.routeEvents(spark, sfDir).count())
    spark.stop()
  }
}
