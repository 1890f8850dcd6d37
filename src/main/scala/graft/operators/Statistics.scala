package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `/api/statistics` rollup (A1, reference: src/ribservice.rs:168-219):
  * interned-store distinct counts, per-RIB row counts, update/withdraw
  * counters. The reference reads O(1) in-memory counters; here it is one
  * scan with partial aggregation — sub-second at bench scale and
  * shuffle-light at any scale (15-key and 1-row aggregates). */
object Statistics {

  /** stores/ribs/counters as three small DataFrames in one pass shape. */
  def storeCounts(events: DataFrame): DataFrame =
    events.agg(
      countDistinct(col("attrs.as_list")).as("pathes"),
      countDistinct(col("attrs.comms")).as("comms"),
      countDistinct(col("attrs.lcomms")).as("lcomms"),
      countDistinct(col("attrs.extcomms")).as("extcomms"),
      countDistinct(col("attrs.clusterlist")).as("clusters"),
      countDistinct(col("attrs_hash")).as("attrs"))

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
