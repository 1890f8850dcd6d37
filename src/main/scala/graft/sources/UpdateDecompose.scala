package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.IpFns

/** S3/S4: update-message decomposition (reference: `BgpRIB::handle_update`,
  * src/bgprib.rs:1104-1205) — one decoded UPDATE message explodes into base
  * withdraws + base updates + per-MP-family items, where each MP family
  * carries its own nexthop that overrides the base attrs
  * (src/bgprib.rs:1183-1201), and every output row lands in its SAFI table
  * via the `rib` discriminator (the 26-arm dispatch of
  * src/bgprib.rs:1016-1097 becomes a column).
  *
  * Pure flatMap shape: three explodes + a union — no shuffle, scales with
  * input bytes. */
object UpdateDecompose {

  /** Deterministic update-message stream derived from the `events` table —
    * the adapter-side stand-in for decoded BGP UPDATEs (wire decode is out
    * of engine scope, SURVEY.md §1 note on zettabgp). */
  def messages(events: DataFrame): DataFrame = {
    val eid = col("event_id")
    val uid = col("user_id")
    def pfx(j: Int) = {
      val ip = lit(10L << 24) + shiftleft((eid + j) % 64, 16) + shiftleft(uid % 256, 8)
      struct(lit(4.toByte).as("version"), lit(0L).as("ip_hi"),
        ip.cast("long").as("ip_lo"), lit(24).as("prefix_len"))
    }
    def pfx6 = struct(lit(6.toByte).as("version"),
      (lit(0x2001L << 48) + (eid % 64)).cast("long").as("ip_hi"),
      lit(0L).as("ip_lo"), lit(64).as("prefix_len"))
    val nh4 = struct(lit(4.toByte).as("version"), lit(0L).as("ip_hi"),
      (lit((192L << 24) + (168L << 16)) + uid % 256).cast("long").as("ip_lo"),
      lit(32).as("prefix_len"))
    val nh6 = struct(lit(6.toByte).as("version"),
      lit(0xFE80L << 48).as("ip_hi"), (uid % 256).cast("long").as("ip_lo"),
      lit(128).as("prefix_len"))
    events.select(
      eid.as("msg_id"),
      (uid % 4).cast("int").as("session_id"),
      col("ts"),
      when(eid % 2 === 1, array(pfx(0), pfx(1))).otherwise(array(pfx(0))).as("nlri"),
      when(eid % 3 === 0, array(pfx(2))).otherwise(array().cast("array<" +
        RouteEventGen.pfxType + ">")).as("withdraws"),
      nh4.as("nexthop"),
      when(eid % 4 === 0,
        array(struct(lit("ipv6u").as("rib"), array(pfx6).as("nlri"), nh6.as("nexthop"))))
        .otherwise(lit(null).cast(s"array<struct<rib:string,nlri:array<${RouteEventGen.pfxType}>,nexthop:${RouteEventGen.pfxType}>>"))
        .as("mp"))
  }

  /** The decomposition itself: base updates (rib=ipv4u, base nexthop) +
    * base withdraws (active=false) + MP families (family rib, family
    * nexthop overriding the base — the attrs clone of
    * src/bgprib.rs:1183-1201). Wire-decoded frames (BgpWire.updateSchema)
    * additionally carry `mp_keys`/`mp_keys_withdraws` — EVPN/MVPN/VPLS
    * route keys — which land in their SAFI tables with the engine's key
    * structs (the exotic arms of the 26-way dispatch,
    * src/bgprib.rs:1016-1097). */
  def decompose(msgs: DataFrame): DataFrame = {
    val nullRd = lit(null).cast(RouteEventGen.rdType)
    val nullL2 = lit(null).cast(RouteEventGen.l2Type)
    val nullMvpn = lit(null).cast(RouteEventGen.mvpnType)
    val nullEvpn = lit(null).cast(RouteEventGen.evpnType)
    def row(rib: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column,
        active: org.apache.spark.sql.Column, nh: org.apache.spark.sql.Column,
        rd: org.apache.spark.sql.Column = nullRd,
        l2: org.apache.spark.sql.Column = nullL2,
        mvpn: org.apache.spark.sql.Column = nullMvpn,
        evpn: org.apache.spark.sql.Column = nullEvpn) =
      Seq(col("ts"), col("msg_id"), col("session_id"), rib.as("rib"),
        active.as("active"), p.as("prefix"), IpFns.pfxStr(p).as("prefix_str"),
        nh.as("nexthop"), rd.as("rd"), l2.as("l2"), mvpn.as("mvpn"),
        evpn.as("evpn"))
    val base = msgs.select(col("*"), explode(col("nlri")).as("p"))
      .select(row(lit("ipv4u"), col("p"), lit(true), col("nexthop")): _*)
    val withdrawn = msgs.select(col("*"), explode(col("withdraws")).as("p"))
      .select(row(lit("ipv4u"), col("p"), lit(false), col("nexthop")): _*)
    val mp = msgs.where(col("mp").isNotNull)
      .select(col("*"), explode(col("mp")).as("fam"))
      .select(col("*"), explode(col("fam.nlri")).as("p"))
      .select(row(col("fam.rib"), col("p"), lit(true), col("fam.nexthop")): _*)
    val nullPfx = lit(null).cast(RouteEventGen.pfxType)
    def exotic(colName: String, active: Boolean): Option[DataFrame] =
      if (!msgs.columns.contains(colName)) None
      else Some(msgs.where(col(colName).isNotNull)
        .select(col("*"), explode(col(colName)).as("k"))
        .select(row(col("k.rib"), nullPfx, lit(active), col("k.nexthop"),
          rd = col("k.rd"), l2 = col("k.l2"), mvpn = col("k.mvpn"),
          evpn = col("k.evpn")): _*))
    val withExotic = Seq(exotic("mp_keys", active = true),
      exotic("mp_keys_withdraws", active = false)).flatten
    (Seq(base, withdrawn, mp) ++ withExotic).reduce(_ unionByName _)
  }
}
