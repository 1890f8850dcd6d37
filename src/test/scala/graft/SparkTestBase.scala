package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Janino compile failures normally fall back to interpreted eval with
      // only an ERROR log line — a ~3×/core silent slowdown if it ever hits
      // the production path (SCALE.md). In tests we make the fallback a hard
      // failure instead, so any plan that drops out of whole-stage codegen
      // fails its suite rather than hiding in the log (VERDICT r4 item 4).
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
