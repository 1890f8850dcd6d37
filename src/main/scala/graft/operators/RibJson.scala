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
      changedBeforeMs: Option[Long] = None,
      // keyset continuation: resume strictly after the route key with this
      // route_id (the last item of the previous page). The deep-pagination
      // path (RibViews.pageAfter): O(limit) page work at any depth, where
      // skip/limit pays per-partition top-(skip+limit) heaps. Overrides
      // `skip` when set.
      pageAfterId: Option[Long] = None)

  /** Route-key columns WITHOUT session/path — the top-level map key of the
    * response (the reference's per-SAFI BTreeMap key). */
  val routeKeyCols: Seq[String] =
    Seq("rib", "prefix", "prefix_str", "rd", "labels", "l2", "mvpn", "evpn", "mdt_group")

  /** Engine-canonical display key for a route (reference uses the NLRI
    * Display impls as JSON keys, src/bgpsvc.rs:635). Prefix-shaped ribs
    * render rd + prefix + labels; the structurally-rich keys (L2VPLS,
    * MVPN, EVPN, MDT group) append an explicit rendering of their key
    * struct — zettabgp's exact Display text is unknowable from the
    * reference alone, so the canonical form is the JSON of the struct
    * (null fields omitted, schema field order — deterministic). Without
    * the suffix, distinct exotic routes sharing an RD would collide in
    * JSON pages and in the text-key snapshot export. The input frame must
    * carry the [[routeKeyCols]].
    *
    * Oracle note (r13 stretch ask): `to_json` serializes struct fields in
    * SCHEMA DECLARATION order (Model.scala's L2Key/MvpnKey/EvpnKey field
    * order) and omits null fields. Any future DuckDB oracle that pins
    * exotic `item_key` TEXT must replicate that exact field order and
    * null-omission in its own JSON rendering — DuckDB's `to_json(struct)`
    * keeps nulls and uses its own struct order, so a naive struct-pack
    * will hash-mismatch even when the key VALUES are identical. Current
    * oracles only pin itemKey for prefix-shaped ribs (rd/prefix/labels
    * arithmetic, no to_json), so nothing binds today. */
  def itemKey: Column = concat(
    when(col("rd").isNotNull, concat(IpFns.rdStr(col("rd")), lit(" "))).otherwise(lit("")),
    coalesce(col("prefix_str"), lit("")),
    when(col("labels").isNotNull,
      concat(lit(" l"), concat_ws(",", col("labels")))).otherwise(lit("")),
    when(col("l2").isNotNull, concat(lit("l2"), to_json(col("l2")))).otherwise(lit("")),
    when(col("mvpn").isNotNull, concat(lit("mvpn"), to_json(col("mvpn")))).otherwise(lit("")),
    when(col("evpn").isNotNull, concat(lit("evpn"), to_json(col("evpn")))).otherwise(lit("")),
    when(col("mdt_group").isNotNull,
      concat(lit(" g"), IpFns.pfxStr(col("mdt_group")))).otherwise(lit("")))

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

  /** One JSON-object level from collected (numeric key, value-json string)
    * pairs: sort by key, join as {"k":v,...}. Values are already JSON text,
    * so the collected structs stay orderable and the generated code small
    * (a nested-map rollup exceeded Janino's method limits and fell out of
    * codegen). */
  private def jsonLevel(pairs: Column, asc: Boolean, depth: Option[Int]): Column = {
    val sorted = sort_array(pairs, asc = asc)
    val capped = depth.map(d => slice(sorted, 1, d)).getOrElse(sorted)
    concat(lit("{"), concat_ws(",", transform(capped,
      x => concat(lit("\""), x("k").cast("string"), lit("\":"), x("v")))), lit("}"))
  }

  /** Entries with the route-key surrogate: the stored `route_id` when
    * present (event-log frames), else synthesized with the SAME hash
    * (RouteEventGen stores xxhash64 over these columns in this order), so
    * stored and computed forms agree. Grouping/joining on the one long
    * instead of the 9-column nested tuple keeps the aggregate keys inside
    * whole-stage codegen (the wide-struct key exceeded Janino's method
    * limit and fell back to interpreted eval — SCALE.md round-2 wart) and
    * makes the page semi-join a single-key broadcast. */
  private def withRouteId(entries: DataFrame): DataFrame =
    if (entries.columns.contains("route_id")) entries
    else entries.withColumn("route_id",
      xxhash64(col("rib"), col("prefix"), col("rd"), col("labels"),
        col("l2"), col("mvpn"), col("evpn"), col("mdt_group")))

  /** The nested items tree for a set of route-key rows:
    * one row per route key with (item_key, items_json). */
  def itemsTree(entries: DataFrame, p: RibParams): DataFrame = {
    val filtered = withRouteId(entries).where(passes(p))
    val depth = if (p.maxDepth > 0) Some(p.maxDepth) else None
    def rk = first(col("__rk")).as("__rk")
    // history level: newest-first, take maxdepth AFTER the filter; the
    // display columns ride along as one first()-elected struct per group
    val lvl1 = filtered
      .withColumn("__rk", struct(routeKeyCols.map(col): _*))
      .groupBy(col("route_id"), col("session_id"), col("path_id"))
      .agg(jsonLevel(collect_list(struct(
        unix_millis(col("ts")).as("k"), to_json(entryStruct).as("v"))),
        asc = false, depth).as("hist"), rk)
    // path level
    val lvl2 = lvl1.groupBy(col("route_id"), col("session_id"))
      .agg(jsonLevel(collect_list(struct(col("path_id").as("k"), col("hist").as("v"))),
        asc = true, None).as("paths"), rk)
    // session level
    lvl2.groupBy(col("route_id"))
      .agg(jsonLevel(collect_list(struct(
        col("session_id").cast("long").as("k"), col("paths").as("v"))),
        asc = true, None).as("sessions"), rk)
      .select(col("route_id") +: col("sessions") +:
        routeKeyCols.map(c => col(s"__rk.$c").as(c)): _*)
      // route_id rides along as the keyset-continuation token for the NEXT
      // page (RibParams.pageAfterId); response() does not serialize it
      .select(col("route_id") +: routeKeyCols.map(col) :+
        itemKey.as("item_key") :+ col("sessions").as("items_json"): _*)
  }

  /** Full `/api/json` page: filter → existential match → deterministic
    * pagination → items tree; empty page falls back to the supernet scan
    * sorted most-specific-first (Q5, src/bgpsvc.rs:638-658). Returns
    * (item_key, items_json) rows in page order plus the found/length counts. */
  def jsonPage(events: DataFrame, ribName: String, filterStr: String,
      p: RibParams): (DataFrame, Long, Long) = {
    val (entries, found, length) = pagedEntries(events, ribName, filterStr, p)
    (itemsTree(entries, p)
      .orderBy(RibViews.nlriOrderFor(includeRing = false): _*), found, length)
  }

  /** The page's entry rows PRE-stringification: (item_key, session_id,
    * path_id, ts_ms, active, attrs_hash), one row per in-depth history entry
    * of each page route key — exactly the facts the JSON tree serializes
    * (page selection, response filter, newest-`maxDepth` cap) minus the text
    * formatting, which has no stable cross-engine form. This is the
    * oracle-checkable face of the JSON page (the DuckDB replica recomputes
    * the same rows); the stringification on top is pinned by RibJsonSpec
    * goldens. Ties inside a ring at equal ts resolve by event_id (frames
    * without event_id: ts only). */
  def structuralPage(events: DataFrame, ribName: String, filterStr: String,
      p: RibParams): DataFrame = {
    val (entries, _, _) = pagedEntries(events, ribName, filterStr, p)
    val filtered = withRouteId(entries).where(passes(p))
    val ord =
      if (filtered.columns.contains("event_id")) Seq(col("ts").desc, col("event_id").desc)
      else Seq(col("ts").desc)
    val w = Window.partitionBy(col("route_id"), col("session_id"), col("path_id"))
      .orderBy(ord: _*)
    val capped =
      if (p.maxDepth > 0)
        filtered.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= p.maxDepth)
      else filtered
    capped.select(itemKey.as("item_key"),
        col("session_id").cast("long").as("session_id"),
        col("path_id").cast("long").as("path_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("active"), col("attrs_hash"))
      .orderBy(col("item_key"), col("session_id"), col("path_id"),
        col("ts_ms"), col("active"), col("attrs_hash"))
  }

  /** Shared page machinery: counts + page-key selection + the bounded
    * broadcast semi-join back into the log. Returns (pageEntries, found,
    * length) where pageEntries holds ALL history rows of the page's route
    * keys. */
  private def pagedEntries(events: DataFrame, ribName: String,
      filterStr: String, p: RibParams): (DataFrame, Long, Long) = {
    val d = withRouteId(events.where(col("rib") === ribName))
    val filter = FilterParser.parse(filterStr)
    // one keyed pass: per route key, did any in-depth entry match (found)
    // — and every key counts toward length (reference's second full scan
    // for `found`, src/bgpsvc.rs:604-613, folded into the same aggregation)
    val flag = RibViews.entryMatchFlag(d, filter, p.maxDepth, p.onlyActive,
      p.changedAfterMs, p.changedBeforeMs)
    // the aggregated key set feeds BOTH the counts job and the page job:
    // cache it so the match evaluation runs once. The key set is orders of
    // magnitude smaller than the event log (one row per route key), so
    // MEMORY_AND_DISK is safe at scale; unpersisted below once the bounded
    // page keys are collected. Grouping on the route_id surrogate keeps the
    // aggregate key one long; display columns ride along as a first() struct.
    val keyFlags = d.withColumn("__em", flag)
      .withColumn("__rk", struct(routeKeyCols.map(col): _*))
      .groupBy(col("route_id"))
      .agg(max(when(col("__em"), 1).otherwise(0)).as("__m"),
        first(col("__rk")).as("__rk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = keyFlags.agg(
      sum(col("__m")).as("found"), count(lit(1)).as("length")).collect()(0)
    val found = if (counts.isNullAt(0)) 0L else counts.getLong(0)
    val length = counts.getLong(1)
    val keys = keyFlags.where(col("__m") === 1)
      .select(col("route_id") +: routeKeyCols.map(c => col(s"__rk.$c").as(c)): _*)
    val pageKeyDf =
      if (found > 0) p.pageAfterId match {
        case Some(aid) =>
          // keyset continuation: rebuild the continuation token from the
          // `after` route key's order tuple (one bounded point lookup over
          // the cached key set), then resume strictly after it — no
          // skip-scan at any page depth. An unknown route_id yields no
          // token → first page (the reference's tolerant-params behavior).
          val tokDf = keys.where(col("route_id") === aid)
            .select(RibViews.nlriOrderFor(includeRing = false)
              .zipWithIndex.map { case (c, i) => c.as(s"k$i") }: _*)
          val schema = tokDf.schema
          val token = tokDf.collect().headOption.map { r =>
            struct(schema.fields.zipWithIndex.map { case (f, i) =>
              (if (r.isNullAt(i)) lit(null) else lit(r.get(i)))
                .cast(f.dataType).as(f.name)
            }: _*)
          }
          RibViews.pageAfter(keys, token, p.limit).select(col("route_id"))
        case None =>
          RibViews.page(keys, p.skip, p.limit).select(col("route_id"))
      }
      else // supernet fallback, most-specific first
        RibViews.scanSuper(d, filterStr)
          .dropDuplicates("route_id")
          .orderBy(RibViews.keyLen.desc +: RibViews.nlriOrderFor(includeRing = false): _*)
          .limit(p.limit).select(col("route_id"))
    // the page is bounded by `limit` (reference contract, default 1000):
    // collect it, release the cached key set, and broadcast the keys into
    // the entry semi-join — at scale this is a broadcast of ≤ limit longs
    // against the log scan, the plan a keyed point-page wants
    val collected = pageKeyDf.collect()
    keyFlags.unpersist(false)
    val pageKeys = d.sparkSession.createDataFrame(
      java.util.Arrays.asList(collected: _*), pageKeyDf.schema)
    val pageEntries = d.join(broadcast(pageKeys),
      d("route_id") === pageKeys("route_id"), "left_semi")
    (pageEntries, found, length)
  }

  /** The complete reference-shaped response document
    * (src/bgpsvc.rs:688-707). Collects only the bounded page. Engine
    * extension beyond the reference shape: a trailing `next_after` field —
    * the keyset-continuation token (`after=` URL param) when this page is
    * full, null otherwise — so deep pagination is reachable through the
    * HTTP surface without skip-scans. */
  def response(events: DataFrame, ribName: String, filterStr: String,
      p: RibParams): String = {
    val (items, found, length) = jsonPage(events, ribName, filterStr, p)
    val rows = items.select(col("route_id"), col("item_key"), col("items_json")).collect()
    val kv = rows
      .map(r => "\"" + r.getString(1).replace("\"", "\\\"") + "\":" + r.getString(2))
    val nextAfter =
      if (found > 0 && rows.length >= p.limit && rows.nonEmpty)
        rows.last.getLong(0).toString
      else "null"
    s"""{"ribtype":"$ribName","length":$length,"skip":${p.skip},""" +
      s""""limit":${p.limit},"maxdepth":${p.maxDepth},"onlyactive":${p.onlyActive},""" +
      s""""changed_after":${p.changedAfterMs.map(_.toString).getOrElse("null")},""" +
      s""""changed_before":${p.changedBeforeMs.map(_.toString).getOrElse("null")},""" +
      s""""found":$found,"items":{${kv.mkString(",")}},""" +
      s""""next_after":$nextAfter}"""
  }
}
