package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.filter.{FilterCompiler, FilterParser, RouteFilter}
import graft.functions.IpFns

/** P6 JSON tree projection + the `/api/json` response lifecycle
  * (reference: serializers src/bgpsvc.rs:493-707, service
  * src/ribservice.rs:239-278).
  *
  * Output per route key: {session_id → {path_id → {ts_millis →
  * {Active, Attrs, Labels}}}}, history newest-first capped at `maxdepth`
  * (take-after-filter from the newest side, src/bgpsvc.rs:519-531), empty
  * subtrees pruned. The whole rollup is one chain of keyed aggregations —
  * shuffle-partitioned by route key, no driver-side loops until the final
  * bounded page collect. */
object RibJson {

  final case class RibParams(
      skip: Int = 0, limit: Int = 1000, maxDepth: Int = 10,
      onlyActive: Boolean = false, changedAfterMs: Option[Long] = None,
      changedBeforeMs: Option[Long] = None)

  /** Route-key columns WITHOUT session/path — the top-level map key of the
    * response (the reference's per-SAFI BTreeMap key). */
  val routeKeyCols: Seq[String] =
    Seq("rib", "prefix", "prefix_str", "rd", "labels", "l2", "mvpn", "evpn", "mdt_group")

  /** Engine-canonical display key for a route (reference uses the NLRI
    * Display impls as JSON keys, src/bgpsvc.rs:635). */
  def itemKey: Column = concat(
    when(col("rd").isNotNull, concat(IpFns.rdStr(col("rd")), lit(" "))).otherwise(lit("")),
    coalesce(col("prefix_str"), lit("")),
    when(col("labels").isNotNull,
      concat(lit(" l"), concat_ws(",", col("labels")))).otherwise(lit("")))

  private def entryStruct: Column = struct(
    col("active").as("Active"), col("attrs").as("Attrs"), col("labels").as("Labels"))

  /** Per-entry response filter `filter_ah` (src/ribservice.rs:72-89). */
  private def passes(p: RibParams): Column = {
    var c: Column = lit(true)
    if (p.onlyActive) c = c && col("active")
    p.changedAfterMs.foreach(a => c = c && unix_millis(col("ts")) > a)
    p.changedBeforeMs.foreach(b => c = c && unix_millis(col("ts")) < b)
    c
  }

  /** Comparator on the first (key) field only — the carried values hold
    * maps, which Spark's default struct ordering cannot compare. */
  private def byKey(asc: Boolean)(l: Column, r: Column): Column = {
    val (lt, gt) = if (asc) (-1, 1) else (1, -1)
    when(l("k") < r("k"), lt).when(l("k") > r("k"), gt).otherwise(0)
  }

  /** The nested items tree for a set of route-key rows:
    * one row per route key with (item_key, items_json). */
  def itemsTree(entries: DataFrame, p: RibParams): DataFrame = {
    val filtered = entries.where(passes(p))
    val ringKeys = routeKeyCols ++ Seq("session_id", "path_id")
    // history level: newest-first, take maxdepth AFTER the filter
    val lvl1 = filtered
      .groupBy(ringKeys.map(col): _*)
      .agg(map_from_entries(transform(
        slice(array_sort(collect_list(struct(
          unix_millis(col("ts")).as("k"), entryStruct.as("v"))), byKey(asc = false)),
          1, if (p.maxDepth > 0) p.maxDepth else Int.MaxValue),
        x => struct(x("k").cast("string"), x("v")))).as("hist"))
    // path level
    val lvl2 = lvl1.groupBy((routeKeyCols :+ "session_id").map(col): _*)
      .agg(map_from_entries(transform(
        array_sort(collect_list(struct(col("path_id").as("k"), col("hist").as("v"))),
          byKey(asc = true)),
        x => struct(x("k").cast("string"), x("v")))).as("paths"))
    // session level
    lvl2.groupBy(routeKeyCols.map(col): _*)
      .agg(map_from_entries(transform(
        array_sort(collect_list(struct(col("session_id").as("k"), col("paths").as("v"))),
          byKey(asc = true)),
        x => struct(x("k").cast("string"), x("v")))).as("sessions"))
      .select(routeKeyCols.map(col) :+ itemKey.as("item_key") :+
        to_json(col("sessions")).as("items_json"): _*)
  }

  /** Full `/api/json` page: filter → existential match → deterministic
    * pagination → items tree; empty page falls back to the supernet scan
    * sorted most-specific-first (Q5, src/bgpsvc.rs:638-658). Returns
    * (item_key, items_json) rows in page order plus the found/length counts. */
  def jsonPage(events: DataFrame, ribName: String, filterStr: String,
      p: RibParams): (DataFrame, Long, Long) = {
    val d = events.where(col("rib") === ribName)
    val filter = FilterParser.parse(filterStr)
    // one keyed pass: per route key, did any in-depth entry match (found)
    // — and every key counts toward length (reference's second full scan
    // for `found`, src/bgpsvc.rs:604-613, folded into the same aggregation)
    val flag = RibViews.entryMatchFlag(d, filter, p.maxDepth, p.onlyActive,
      p.changedAfterMs, p.changedBeforeMs)
    val keyFlags = d.withColumn("__em", flag)
      .groupBy(routeKeyCols.map(col): _*)
      .agg(max(when(col("__em"), 1).otherwise(0)).as("__m"))
    val counts = keyFlags.agg(
      sum(col("__m")).as("found"), count(lit(1)).as("length")).collect()(0)
    val found = if (counts.isNullAt(0)) 0L else counts.getLong(0)
    val length = counts.getLong(1)
    val keys = keyFlags.where(col("__m") === 1).drop("__m")
    val pageKeys =
      if (found > 0)
        RibViews.page(keys, p.skip, p.limit).select(routeKeyCols.map(col): _*)
      else // supernet fallback, most-specific first
        RibViews.scanSuper(d, filterStr)
          .dropDuplicates(routeKeyCols)
          .orderBy(RibViews.keyLen.desc +: RibViews.nlriOrderFor(includeRing = false): _*)
          .limit(p.limit).select(routeKeyCols.map(col): _*)
    // null-safe equality: unused key columns (rd/l2/mvpn/…) are NULL and
    // must still match themselves
    val pageEntries = d.join(pageKeys,
      routeKeyCols.map(c => d(c) <=> pageKeys(c)).reduce(_ && _), "left_semi")
    (itemsTree(pageEntries, p)
      .orderBy(RibViews.nlriOrderFor(includeRing = false): _*), found, length)
  }

  /** The complete reference-shaped response document
    * (src/bgpsvc.rs:688-707). Collects only the bounded page. */
  def response(events: DataFrame, ribName: String, filterStr: String,
      p: RibParams): String = {
    val (items, found, length) = jsonPage(events, ribName, filterStr, p)
    val kv = items.select(col("item_key"), col("items_json")).collect()
      .map(r => "\"" + r.getString(0).replace("\"", "\\\"") + "\":" + r.getString(1))
    s"""{"ribtype":"$ribName","length":$length,"skip":${p.skip},""" +
      s""""limit":${p.limit},"maxdepth":${p.maxDepth},"onlyactive":${p.onlyActive},""" +
      s""""changed_after":${p.changedAfterMs.map(_.toString).getOrElse("null")},""" +
      s""""changed_before":${p.changedBeforeMs.map(_.toString).getOrElse("null")},""" +
      s""""found":$found,"items":{${kv.mkString(",")}}}"""
  }
}
