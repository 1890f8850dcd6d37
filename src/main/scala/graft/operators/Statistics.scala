package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `/api/statistics` rollup (A1, reference: src/ribservice.rs:168-219):
  * interned-store distinct counts, per-RIB row counts, update/withdraw
  * counters. The reference reads O(1) in-memory counters; here it is one
  * scan with partial aggregation — sub-second at bench scale and
  * shuffle-light at any scale (15-key and 1-row aggregates). */
object Statistics {

  /** stores/ribs/counters as three small DataFrames in one pass shape.
    *
    * `approx = true` swaps exact distinct for HyperLogLog++
    * (`approx_count_distinct`, relative standard deviation `rsd`): at 100 TB
    * an exact distinct over attribute arrays is a full shuffle of every
    * distinct value, while HLL sketches merge in fixed space — SURVEY §1.6
    * maps the reference's interned-store sizes to exactly this. Exact mode
    * is retained as the oracle-checkable default. Error bound: the count is
    * within ±3·rsd of truth with ~99% probability (HLL++ standard error). */
  def storeCounts(events: DataFrame, approx: Boolean = false,
      rsd: Double = 0.02): DataFrame = {
    def dc(c: org.apache.spark.sql.Column) =
      if (approx) approx_count_distinct(c, rsd) else countDistinct(c)
    events.agg(
      dc(col("attrs.as_list")).as("pathes"),
      dc(col("attrs.comms")).as("comms"),
      dc(col("attrs.lcomms")).as("lcomms"),
      dc(col("attrs.extcomms")).as("extcomms"),
      dc(col("attrs.clusterlist")).as("clusters"),
      dc(col("attrs_hash")).as("attrs"))
  }

  def ribCounts(events: DataFrame): DataFrame =
    events.groupBy(col("rib")).agg(count(lit(1)).as("n")).orderBy(col("rib"))

  def counters(events: DataFrame): DataFrame =
    events.agg(
      sum(when(col("active"), 1L).otherwise(0L)).as("updates"),
      sum(when(col("active"), 0L).otherwise(1L)).as("withdraws"))

  /** The reference-shaped JSON document
    * {"stores":{...},"ribs":{...},"counters":{...}}. */
  def statisticsJson(events: DataFrame): String = {
    val s = storeCounts(events).collect()(0)
    val stores = s.schema.fieldNames.zipWithIndex
      .map { case (f, i) => s""""$f":${s.getLong(i)}""" }.mkString(",")
    val ribs = ribCounts(events).collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").mkString(",")
    val c = counters(events).collect()(0)
    s"""{"stores":{$stores},"ribs":{$ribs},"counters":{"updates":${c.getLong(0)},"withdraws":${c.getLong(1)}}}"""
  }
}
