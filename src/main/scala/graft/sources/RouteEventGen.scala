package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.IpFns
import graft.queries.Tables

/** Deterministic route-event derivation from the driver `events` table —
  * the test-bench analog of the ingest adapter (SURVEY.md §2.1 S1-S4): maps
  * each generic event to one normalized route-event row of the canonical
  * schema (FIXTURES.md §1), covering 5 RIB kinds, VPN RDs, MPLS labels,
  * v4/v6/multicast prefixes and the full attribute record.
  *
  * Every derived value is integer arithmetic on (event_id, user_id) so the
  * DuckDB oracle (RibQueries.OracleCte) can mirror it exactly — the oracle
  * computes filter results directly from the arithmetic while the engine
  * goes through parse → compile → tri-state evaluation, which is exactly
  * what makes the hash compare a real semantics check.
  *
  * At scale this is the shape of the real ingest path: a narrow projection +
  * pure column arithmetic, fully codegen'd, no shuffle, partitionable by
  * `ts_day`/`rib` at the write (reference's daily `idx_changed` buckets,
  * src/bgprib.rs:430).
  */
object RouteEventGen {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private lazy val snapshotRoot =
    java.nio.file.Files.createTempDirectory("graft_route_events").toString

  /** Derived route events, materialized once per (session, sfDir) as a
    * Parquet event log partitioned by `rib` and sorted within partitions by
    * the unsigned prefix order — the same layout a production deployment
    * would write (partition pruning on `rib`, min/max data skipping on the
    * prefix longs; reference analog: per-SAFI tables + ordered BTreeMap
    * keys, src/bgprib.rs:427-436). Also keeps query plans small: filters
    * compile against the scanned columns instead of inlining the whole
    * derivation expression tree into every predicate. */
  def routeEvents(spark: SparkSession, sfDir: String): DataFrame =
    cache.computeIfAbsent(sfDir, { _ =>
      val dir = s"$snapshotRoot/${java.lang.Integer.toHexString(sfDir.hashCode)}"
      fromEvents(Tables(spark, sfDir, "events"))
        .repartition(col("rib"))
        .sortWithinPartitions(col("prefix.ip_hi"), col("prefix.ip_lo"),
          col("prefix.prefix_len"), col("ts"))
        .write.mode("overwrite").partitionBy("rib").parquet(dir)
      spark.read.parquet(dir)
    })

  val l2Type = "struct<site:int,offset:int,range:int>"
  val pfxType = "struct<version:tinyint,ip_hi:bigint,ip_lo:bigint,prefix_len:int>"
  val rdType = "struct<rdh:bigint,rdl:bigint>"
  val mvpnType = s"struct<mtype:int,rd:$rdType,originator:$pfxType,source:$pfxType," +
    s"group:$pfxType,rp:$pfxType,spmsi_rd:$rdType,spmsi_originator:$pfxType," +
    s"spmsi_source:$pfxType,spmsi_group:$pfxType>"
  val evpnType = s"struct<etype:int,rd:$rdType,ip:$pfxType,gw_ip:$pfxType>"

  def fromEvents(events: DataFrame): DataFrame = {
    val eid = col("event_id")
    val uid = col("user_id")
    val m16 = eid % 16
    // slot must be independent of the rib bits (eid%16): gcd(16,20)=4 would
    // otherwise make many (rib, prefix) combinations unreachable
    val slot = (shiftright(eid, 4) + uid) % 20
    val rib = when(m16 < 8, "ipv4u").when(m16 < 11, "vpnv4u")
      .when(m16 < 13, "ipv6u").when(m16 < 14, "ipv4lu")
      .when(m16 === 14, "ipv4m")
      .otherwise(when(uid % 3 === 0, "mvpn").when(uid % 3 === 1, "evpn")
        .otherwise("l2vpls"))
    val isV6 = m16 >= 11 && m16 < 13
    val isExotic = m16 === 15
    val plen = lit(24) + (slot % 3) * 4
    val o2 = slot % 16
    val o3 = uid % 256
    val o4 = when(slot % 3 === 0, 0L)
      .when(slot % 3 === 1, (slot % 16) * 16L)
      .otherwise((slot * 12L) % 256)
    val v4base = when(rib === "ipv4m", 224L << 24).otherwise(10L << 24)
    val v4ip = v4base + shiftleft(o2, 16) + shiftleft(o3, 8) + o4
    val v6hi = lit(0x2001L << 48) + shiftleft(o2, 16) + o3
    val prefix = when(isV6,
      struct(lit(6.toByte).as("version"), v6hi.cast("long").as("ip_hi"),
        lit(0L).as("ip_lo"), lit(64).as("prefix_len")))
      .when(isExotic, lit(null).cast(pfxType))
      .otherwise(
        struct(lit(4.toByte).as("version"), lit(0L).as("ip_hi"),
          v4ip.cast("long").as("ip_lo"), plen.cast("int").as("prefix_len")))
    val rd = when(rib === "vpnv4u",
      struct((lit(100L) + uid % 3).as("rdh"), (lit(1000L) + eid % 2).as("rdl")))
      .when(rib === "l2vpls",
        struct((lit(500L) + uid % 2).as("rdh"), (lit(700L) + eid % 3).as("rdl")))
      .otherwise(lit(null).cast(rdType))
    val labels = when(rib === "ipv4lu" || rib === "vpnv4u",
      array((lit(100) + (eid % 8)).cast("int"))).otherwise(lit(null).cast("array<int>"))
    def v4Host(base: Long, o4h: Column): Column =
      struct(lit(4.toByte).as("version"), lit(0L).as("ip_hi"),
        (lit(base) + shiftleft(o2, 16) + shiftleft(o3, 8) + o4h).cast("long").as("ip_lo"),
        lit(32).as("prefix_len"))
    val mvpnKey = when(rib === "mvpn", struct(
      lit(5).as("mtype"),
      struct((lit(300L) + uid % 2).as("rdh"), (lit(500L) + eid % 4).as("rdl")).as("rd"),
      lit(null).cast(pfxType).as("originator"),
      v4Host(10L << 24, eid % 100).as("source"),
      struct(lit(4.toByte).as("version"), lit(0L).as("ip_hi"),
        (lit(224L << 24) + shiftleft(slot % 8, 16) + shiftleft(o3, 8))
          .cast("long").as("ip_lo"), lit(32).as("prefix_len")).as("group"),
      lit(null).cast(pfxType).as("rp"),
      lit(null).cast(rdType).as("spmsi_rd"),
      lit(null).cast(pfxType).as("spmsi_originator"),
      lit(null).cast(pfxType).as("spmsi_source"),
      lit(null).cast(pfxType).as("spmsi_group"))).otherwise(lit(null).cast(mvpnType))
    val evpnKey = when(rib === "evpn", struct(
      (lit(2) + (eid % 2)).cast("int").as("etype"),
      struct((lit(400L) + uid % 2).as("rdh"), (lit(600L) + eid % 3).as("rdl")).as("rd"),
      v4Host(10L << 24, eid % 50).as("ip"),
      lit(null).cast(pfxType).as("gw_ip"))).otherwise(lit(null).cast(evpnType))
    val l2Key = when(rib === "l2vpls", struct(
      (lit(1) + (uid % 5)).cast("int").as("site"),
      ((eid % 4) * 10).cast("int").as("offset"),
      ((eid % 4) * 10 + 9).cast("int").as("range"))).otherwise(lit(null).cast(l2Type))
    val a1 = (lit(100L) + eid % 5).cast("long")
    val a2 = (lit(200L) + uid % 7).cast("long")
    val asList = when(eid % 2 === 1, array(a1, a2, lit(65001L))).otherwise(array(a1, a2))
    val nexthop = struct(lit(4.toByte).as("version"), lit(0L).as("ip_hi"),
      (lit((192L << 24) + (168L << 16)) + shiftleft(uid % 4, 8) + eid % 200)
        .cast("long").as("ip_lo"),
      lit(32).as("prefix_len"))
    val attrs = struct(
      element_at(array(lit("IGP"), lit("EGP"), lit("Incomplete")), (eid % 3 + 1).cast("int"))
        .as("origin"),
      nexthop.as("nexthop"),
      array(struct(lit(false).as("is_set"), asList.as("asns"))).as("aspath"),
      asList.as("as_list"),
      array(struct(lit(10).as("a"), (eid % 50).cast("int").as("b")),
        struct(lit(20).as("a"), (uid % 10).cast("int").as("b"))).as("comms"),
      array(struct(lit(1L).as("a"), lit(2L).as("b"), (eid % 5).cast("long").as("c")))
        .as("lcomms"),
      array(struct(lit(0).as("ctype"), lit(2).as("subtype"),
        (lit(200L) + uid % 4).as("a"), (lit(300L) + eid % 5).as("b"))).as("extcomms"),
      (eid % 100).cast("long").as("med"),
      (lit(100L) + uid % 10).as("localpref"),
      lit(null).cast("string").as("atomicaggregate"),
      lit(null).cast("struct<asn:bigint,addr:string>").as("aggregator_as"),
      lit(null).cast("string").as("originator"),
      lit(null).cast("array<string>").as("clusterlist"),
      lit(null).cast("string").as("pmsi_ta"))
    events.select(
      col("ts"),
      rib.as("rib"),
      (uid % 4).cast("int").as("session_id"),
      (eid % 3).cast("long").as("path_id"),
      (eid % 7 =!= 0).as("active"),
      prefix.as("prefix"),
      IpFns.pfxStr(prefix).as("prefix_str"),
      rd.as("rd"),
      labels.as("labels"),
      l2Key.as("l2"),
      mvpnKey.as("mvpn"),
      evpnKey.as("evpn"),
      lit(null).cast(pfxType).as("mdt_group"),
      attrs.as("attrs"),
      ((eid % 600) * 1000 + uid % 140).cast("long").as("attrs_hash"),
      // daily change-time bucket → partition-prunable (replaces the
      // reference's idx_changed daily index, src/bgprib.rs:430, 652-653)
      to_date(col("ts")).as("ts_day"),
      eid.as("event_id"))
  }
}
