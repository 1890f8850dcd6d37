package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** SCALE.md names AQE skew-join splitting as the runtime guard for hot
  * keys that slip past the static bucket caps (LSH buckets, shingle df).
  * This pins that the engine's join shapes actually inherit it: a
  * deliberately skewed join, with the thresholds scaled to test data,
  * must execute with AQE marking and splitting the skewed partition. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("AQE splits the hot partition of a skewed candidate join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one hot bucket (key 0: 50k rows) among uniform cold keys — the
      // adversarial LSH-bucket shape the static caps guard against
      // xxhash payloads: incompressible, so partition BYTE sizes track row
      // counts (constant/sequential longs lz4-compress to almost nothing
      // and stay under any skew threshold)
      val hot = spark.range(50000).select(lit(0L).as("k"), xxhash64(col("id")).as("p"))
      val cold = spark.range(2000).select((col("id") % 50 + 1).as("k"),
        xxhash64(col("id")).as("p"))
      val left = hot.unionByName(cold)
      val right = spark.range(200).select((col("id") % 51).as("k"), col("id").as("q"))
      // global (ungrouped) aggregate: a keyed aggregate downstream would
      // REUSE the join's hash partitioning, and AQE then refuses to split
      // the skewed partition (it would break the required distribution)
      val joined = left.join(right, "k").agg(count(lit(1)))
      joined.collect() // execute so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected AQE skew split in final plan:\n${plan.take(3000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
