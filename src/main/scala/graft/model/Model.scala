package graft.model

import java.sql.Timestamp

/** Canonical route-event data model (FIXTURES.md §1).
  *
  * One row = one history record (update or withdraw) for one NLRI — the
  * reference's nested map prefix→session→path→ts→entry
  * (reference: src/bgprib.rs:310-436) flattened into an append-only log.
  * All 15 AFI/SAFI tables (reference: src/bgprib.rs:807-821) share this
  * schema, discriminated by `rib`; unused key columns are null.
  *
  * IP addresses live in a 128-bit space split across two signed longs
  * (`ip_hi`, `ip_lo`). IPv4 addresses occupy the LOW 32 bits of `ip_lo`
  * (`ip_hi == 0`), i.e. the effective 128-bit prefix length of a v4 /n is
  * n + 96. This keeps one generic containment/masking implementation for
  * both families (see [[graft.functions.IpFns]]).
  */
final case class IpPfx(version: Byte, ip_hi: Long, ip_lo: Long, prefix_len: Int)

final case class Rd(rdh: Long, rdl: Long)

/** One AS_PATH segment: ordered SEQ or unordered SET (reference: zettabgp
  * BgpASitem, exercised at src/ribfilter.rs:1474-1507). */
final case class AsSeg(is_set: Boolean, asns: Seq[Long])

final case class Community(a: Int, b: Int)
final case class LargeCommunity(a: Long, b: Long, c: Long)

/** Extended community; route-targets are ctype in {0,1,2} subtype 2
  * (reference: src/bgprib.rs:646-651, src/ribfilter.rs:504-540). */
final case class ExtCommunity(ctype: Int, subtype: Int, a: Long, b: Long)

final case class Aggregator(asn: Long, addr: String)

/** L2VPN VPLS key fields (reference: src/ribfilter.rs:306-319). */
final case class L2Info(site: Int, offset: Int, range: Int)

/** MVPN route key, types 1..7 (reference: src/ribfilter.rs:320-453).
  * Type 4 (Leaf A-D) carries an embedded S-PMSI (type-3) key plus its own
  * originator; the spmsi_* fields hold the embedded key. */
final case class MvpnKey(
    mtype: Int,
    rd: Rd,
    originator: Option[IpPfx],
    source: Option[IpPfx],
    group: Option[IpPfx],
    rp: Option[IpPfx],
    spmsi_rd: Option[Rd],
    spmsi_originator: Option[IpPfx],
    spmsi_source: Option[IpPfx],
    spmsi_group: Option[IpPfx]
)

/** EVPN route key, types 1..5. The filter-visible surface is etype/rd/
  * ip/gw_ip (reference: src/ribfilter.rs:433-443); esi (10-octet Ethernet
  * Segment Identifier as 20 lowercase hex chars), eth_tag (32-bit Ethernet
  * Tag ID) and mac (48-bit address as colon-hex) complete the RFC 7432 /
  * RFC 9136 NLRI field set the wire carries — per-type presence: esi on
  * t1/t2/t4/t5, eth_tag on t1/t2/t3/t5, mac on t2 only. They are part of
  * route identity (a t2 route per MAC) but not of the reference's match
  * surface, so filters ignore them. */
final case class EvpnKey(etype: Int, rd: Rd, ip: Option[IpPfx],
    gw_ip: Option[IpPfx], esi: Option[String] = None,
    eth_tag: Option[Long] = None, mac: Option[String] = None)

/** The 13-field BGP path-attribute record (reference: src/bgpattrs.rs:21-35)
  * plus `as_list`, the SEQ/SET-flattened AS list kept for membership
  * pushdown (reference maintains the same flattening for its inverted
  * index, src/bgprib.rs:628-653). */
final case class Attrs(
    origin: String,
    nexthop: Option[IpPfx],
    aspath: Seq[AsSeg],
    as_list: Seq[Long],
    comms: Seq[Community],
    lcomms: Seq[LargeCommunity],
    extcomms: Seq[ExtCommunity],
    med: Option[Long],
    localpref: Option[Long],
    atomicaggregate: Option[String],
    aggregator_as: Option[Aggregator],
    originator: Option[String],
    clusterlist: Seq[String],
    pmsi_ta: Option[String]
)

final case class RouteEvent(
    ts: Timestamp,
    rib: String,
    session_id: Int,
    path_id: Long,
    active: Boolean,
    prefix: Option[IpPfx],
    prefix_str: Option[String],
    rd: Option[Rd],
    labels: Option[Seq[Int]],
    l2: Option[L2Info],
    mvpn: Option[MvpnKey],
    evpn: Option[EvpnKey],
    mdt_group: Option[IpPfx],
    attrs: Attrs,
    attrs_hash: Long,
    /** regex-match subjects (6 attr display strings, rendered at ingest —
      * FilterCompiler.attrStrings); fixtures may leave it empty when no
      * attr-regex term is exercised */
    attr_strs: Seq[String] = Seq.empty
)

object Model {
  /** The 15 RIB kinds with their URL/WebSocket names
    * (reference: src/bgprib.rs:17-120). */
  val ribKinds: Seq[String] = Seq(
    "ipv4u", "ipv4m", "ipv4lu", "vpnv4u", "vpnv4m",
    "ipv6u", "ipv6lu", "vpnv6u", "vpnv6m",
    "l2vpls", "mvpn", "evpn", "fs4u", "ipv4mdt", "ipv6mdt")

  val emptyAttrs: Attrs = Attrs(
    origin = "Incomplete", nexthop = None, aspath = Nil, as_list = Nil,
    comms = Nil, lcomms = Nil, extcomms = Nil, med = None, localpref = None,
    atomicaggregate = None, aggregator_as = None, originator = None,
    clusterlist = Nil, pmsi_ta = None)

  def v4(addr: Long, plen: Int): IpPfx = IpPfx(4, 0L, addr & 0xFFFFFFFFL, plen)

  def v4(dotted: String, plen: Int): IpPfx = v4(parseV4(dotted), plen)

  def v6(hi: Long, lo: Long, plen: Int): IpPfx = IpPfx(6, hi, lo, plen)

  def parseV4(s: String): Long = {
    val p = s.split('.')
    require(p.length == 4, s"bad v4 $s")
    p.foldLeft(0L)((acc, o) => (acc << 8) | (o.toInt & 0xFF))
  }

  def v4Str(addr: Long, plen: Int): String =
    f"${(addr >> 24) & 0xFF}%d.${(addr >> 16) & 0xFF}%d.${(addr >> 8) & 0xFF}%d.${addr & 0xFF}%d/$plen%d"

  /** Canonical display form of a prefix; v6 rendered RFC-5952-compressed
    * (lowercase, no leading zeros, longest run of ≥2 zero groups → `::`,
    * leftmost on tie) — matches Rust's `Ipv6Addr` Display used by the
    * reference for JSON keys and regex subjects (src/bgpsvc.rs:635,
    * src/ribfilter.rs:1463-1470). */
  def pfxStr(p: IpPfx): String =
    if (p.version == 4) v4Str(p.ip_lo, p.prefix_len)
    else {
      val gs = (0 until 8).map { i =>
        val src = if (i < 4) p.ip_hi else p.ip_lo
        ((src >>> ((3 - (i % 4)) * 16)) & 0xFFFF).toInt
      }
      var bestStart = -1
      var bestLen = 0
      var i = 0
      while (i < 8) {
        if (gs(i) == 0) {
          var j = i
          while (j < 8 && gs(j) == 0) j += 1
          if (j - i >= 2 && j - i > bestLen) { bestStart = i; bestLen = j - i }
          i = j
        } else i += 1
      }
      def hexs(xs: Seq[Int]) = xs.map(x => f"$x%x").mkString(":")
      val addr =
        if (bestLen == 0) hexs(gs)
        else hexs(gs.take(bestStart)) + "::" + hexs(gs.drop(bestStart + bestLen))
      addr + "/" + p.prefix_len
    }

  def rdStr(rd: Rd): String = s"${rd.rdh}:${rd.rdl}"
}
