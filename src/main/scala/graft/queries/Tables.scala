package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver testdata (TESTDATA.md).
  *
  * The `events` table carries TIMESTAMP(NANOS) which Spark 4 only reads
  * with `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
  * builder here); the raw nanos long is converted back to a microsecond
  * TimestampType so downstream date/window functions behave normally. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case None => df
    }
  }
}
