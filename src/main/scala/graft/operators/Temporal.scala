package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each probe row the newest state
  * row of the same key with state ts STRICTLY before the probe ts — the
  * temporal-join pattern (feature-store point-in-time correctness; here
  * "the last active state visible at each event's arrival"). One of the
  * operators SURVEY §7.4 lists as compose-don't-custom: the semantics fall
  * out of existing ops, no custom strategy needed.
  *
  * Spark-first shape: NO range join, NO per-probe re-scan. Probes and
  * states union into one tagged stream; ONE hash exchange on the key, one
  * in-partition sort by (ts, side), and `last(value, ignoreNulls)` over
  * the preceding frame carries the newest earlier state onto each probe
  * row. Cost is a sort-window over |probes| + |states| — linear per key
  * after the exchange, the same plan at 100 TB (and exchange-FREE over a
  * ring_id-bucketed layout, BucketedLogSpec pattern). Strictness: probes
  * sort BEFORE states at equal ts, so same-instant states are excluded;
  * callers wanting ≤ pre-shift probe ts. States must be unique per
  * (key, ts) — pre-aggregate (max_by) if not: ambiguity is resolved
  * before the join, not by engine luck.
  */
object Temporal {

  def asofJoin(probes: DataFrame, states: DataFrame, keyCol: String,
      tsCol: String, valCol: String, out: String = "asof_value"): DataFrame = {
    val vType = states.schema(valCol).dataType
    // The state value rides inside a single-field struct: `last(ignoreNulls)`
    // skips NULL cells, and a bare NULL state VALUE would be skipped too —
    // silently carrying an older state forward. Boxed, a null-valued state is
    // a non-null struct{null}, so it participates like any other state and
    // the probe correctly observes NULL. Probe rows carry a NULL struct
    // (skipped, as intended).
    val vBox = s"struct<v:${vType.sql}>"
    val pTag = probes.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(0).as("__side"), lit(null).cast(vBox).as("__v"),
      struct(probes.columns.map(col): _*).as("__row"))
    val rowType = pTag.schema("__row").dataType
    val sTag = states.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(1).as("__side"), struct(col(valCol).cast(vType).as("v")).as("__v"),
      lit(null).cast(rowType).as("__row"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pTag.unionByName(sTag)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(col("__row.*"), col("__asof.v").as(out))
  }

  /** Gap-based sessionization: per key, rows ordered by (ts, tie-break)
    * are grouped into sessions split wherever the gap to the previous row
    * exceeds `gapMs` — the standard event-analytics sessionizer (user
    * activity bursts, crawl visits, BGP flap episodes over the same log).
    *
    * Shape: ONE exchange on the key and one in-partition sort serve both
    * windows (the `lag` boundary flag and its running sum share
    * partitioning and ordering, so Catalyst stacks them in a single
    * WindowExec) — linear per key at any scale; never a global window.
    * Ties at equal ts can never straddle a boundary (their gap is 0), so
    * the assignment is deterministic even where the sort order between
    * them is not; `tieCol` pins the order fully anyway.
    *
    * Appends `out` = the 1-based session index within the key. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long, tieCol: String, out: String = "session"): DataFrame = {
    require(gapMs >= 0, s"gapMs must be non-negative: $gapMs")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_millis(col(tsCol)), 1).over(w)
    val boundary = when(
      prev.isNull || unix_millis(col(tsCol)) - prev > gapMs, 1L)
      .otherwise(0L)
    df.withColumn(out, sum(boundary)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
