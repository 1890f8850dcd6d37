package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table access for the driver testdata (TESTDATA.md).
  *
  * The fixture generator has shipped `ts` in two physical shapes over time:
  * TIMESTAMP(NANOS) (reads as a raw nanos `LongType` under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, set in every session builder
  * here) and TIMESTAMP(MICROS) without UTC adjustment (reads as
  * `TIMESTAMP_NTZ` in Spark 4). Both are normalized to session-TZ
  * `TimestampType` — sessions pin `spark.sql.session.timeZone=UTC`, so the
  * NTZ→TZ cast is the identity on the epoch value and `unix_millis`/window
  * arithmetic downstream agrees with the DuckDB oracle's `epoch_ms` on the
  * same naive parquet value. ALL fixture reads (main and test) must come
  * through here: a silent driver-side regeneration then surfaces as one
  * named schema change in this seam, not N scattered analysis errors. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Normalize a `ts` column of either legacy shape to `TimestampType`.
    * Exposed for callers that read fixture-derived parquet directly. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
