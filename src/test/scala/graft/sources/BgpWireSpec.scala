package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** RFC 4271 UPDATE decode + RFC 7854 BMP framing (reference:
  * src/bgppeer.rs:170-258, src/bmppeer.rs:30-131).
  *
  * The golden messages below are HAND-ASSEMBLED hex — independent of the
  * encoder — so `decodeUpdate` is pinned against the wire format itself,
  * not against this repo's own serializer. The encode→decode roundtrip
  * then extends that pin to the full deterministic message stream. */
class BgpWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val marker = "ff" * 16

  test("golden: base UPDATE with withdraw, origin, as-path, nexthop, med, communities") {
    // withdrawn 10.9.0.0/16; ORIGIN IGP; AS_PATH seq(65001, 200) 4-octet;
    // NEXT_HOP 192.168.1.9; MED 50; COMMUNITY (10,25),(20,3); NLRI 10.1.2.0/24
    val msg = hex(marker +
      "0048" + "02" + // length 72, type UPDATE
      "0003" + "10 0a09" + // withdrawn routes
      "002a" + // path attribute bytes: 42
      "40 01 01 00" +
      "40 02 0a 02 02 0000fde9 000000c8" +
      "40 03 04 c0a80109" +
      "80 04 04 00000032" +
      "c0 08 08 000a0019 00140003" +
      "18 0a0102") // NLRI
    val r = BgpWire.decodeUpdate(7L, 1, null, msg)
    assert(r.getSeq[org.apache.spark.sql.Row](3).map(p => (p.getLong(2), p.getInt(3)))
      == Seq(((10L << 24) + (1L << 16) + (2L << 8), 24)))
    assert(r.getSeq[org.apache.spark.sql.Row](4).map(p => (p.getLong(2), p.getInt(3)))
      == Seq(((10L << 24) + (9L << 16), 16)))
    val nh = r.getStruct(5)
    assert(nh.getLong(2) == (192L << 24) + (168L << 16) + (1L << 8) + 9)
    assert(r.getString(10) == "IGP")
    assert(r.getSeq[Long](11) == Seq(65001L, 200L))
    assert(r.getLong(12) == 50L) // med
    assert(r.isNullAt(13)) // no localpref
    assert(r.getSeq[org.apache.spark.sql.Row](14).map(c => (c.getInt(0), c.getInt(1)))
      == Seq((10, 25), (20, 3)))
  }

  test("golden: MP_REACH vpnv4u with label + RD; MP_UNREACH ipv6u") {
    // MP_REACH afi 1 safi 128, nexthop RD0+10.0.0.1 (nhlen 12), one NLRI:
    // 112 bits = label 100 (bottom-of-stack) + RD type0 101:1000 + 10.4.1.0/24
    val reach = hex(marker +
      "003a" + "02" +
      "0000" + // no withdrawn
      "0023" + // 35 path-attribute bytes
      "80 0e 20" +
      "0001 80" + "0c" + "0000000000000000 0a000001" + "00" +
      "70" + "000641" + "0000 0065 000003e8" + "0a0401")
    val r = BgpWire.decodeUpdate(1L, 0, null, reach)
    val fam = r.getSeq[org.apache.spark.sql.Row](6)
    assert(fam.length == 1)
    assert(fam(0).getString(0) == "vpnv4u")
    val ps = fam(0).getSeq[org.apache.spark.sql.Row](1)
    assert(ps.map(p => (p.getLong(2), p.getInt(3)))
      == Seq(((10L << 24) + (4L << 16) + (1L << 8), 24)))
    assert(fam(0).getStruct(2).getLong(2) == (10L << 24) + 1) // family nexthop
    assert(fam(0).getSeq[org.apache.spark.sql.Row](3).map(rd => (rd.getLong(0), rd.getLong(1)))
      == Seq((101L, 1000L)))
    assert(fam(0).getSeq[Integer](4).map(_.intValue) == Seq(100))

    // MP_UNREACH afi 2 safi 1: withdraw 2001:0:0:5::/64
    val unreach = hex(marker +
      "0026" + "02" +
      "0000" +
      "000f" + // 15 path-attribute bytes
      "80 0f 0c" + "0002 01" + "40" + "2001000000000005")
    val r2 = BgpWire.decodeUpdate(2L, 0, null, unreach)
    val wd = r2.getSeq[org.apache.spark.sql.Row](7)
    assert(wd.length == 1 && wd(0).getString(0) == "ipv6u")
    val p6 = wd(0).getSeq[org.apache.spark.sql.Row](1)
    assert(p6.map(p => (p.getLong(1), p.getLong(2), p.getInt(3)))
      == Seq(((0x2001L << 48) + 5L, 0L, 64)))
  }

  test("golden: EVPN MAC/IP + IP-prefix routes decode to engine key structs") {
    // MP_REACH afi 25 safi 70, nexthop 10.0.0.1; EVPN t2 (RD 401:601, zero
    // ESI/tag, 48-bit MAC, IP 10.0.0.50, label) + t5 (RD 401:602, /24
    // prefix 10.5.6.0 with gateway 10.5.6.1)
    val msg = hex(marker + "006e" + "02" + "0000" + "0057" +
      "80 0e 54" +
      "0019 46" + "04" + "0a000001" + "00" +
      "02 25" + "0000 0191 00000259" + "00000000000000000000" + "00000000" +
      "30" + "aabbccddeeff" + "20" + "0a000032" + "000031" +
      "05 22" + "0000 0191 0000025a" + "00000000000000000000" + "00000000" +
      "18" + "0a050600" + "0a050601" + "000041")
    val r = BgpWire.decodeUpdate(3L, 0, null, msg)
    val keys = r.getSeq[org.apache.spark.sql.Row](8)
    assert(keys.length == 2 && keys.forall(_.getString(0) == "evpn"))
    val e2 = keys(0).getStruct(4)
    assert(e2.getInt(0) == 2)
    assert(e2.getStruct(1) == org.apache.spark.sql.Row(401L, 601L))
    assert(e2.getStruct(2).getLong(2) == (10L << 24) + 50 && e2.getStruct(2).getInt(3) == 32)
    assert(e2.isNullAt(3)) // no gateway on t2
    // RFC 7432 t2 field set: zero ESI renders as 20 hex zeros, tag 0,
    // 48-bit MAC as colon-hex
    assert(e2.getString(4) == "00000000000000000000")
    assert(e2.getLong(5) == 0L)
    assert(e2.getString(6) == "aa:bb:cc:dd:ee:ff")
    val e5 = keys(1).getStruct(4)
    assert(e5.getInt(0) == 5)
    assert(e5.getStruct(2).getLong(2) == (10L << 24) + (5L << 16) + (6L << 8)
      && e5.getStruct(2).getInt(3) == 24)
    assert(e5.getStruct(3).getLong(2) == (10L << 24) + (5L << 16) + (6L << 8) + 1)
    // t5 carries ESI + tag, never a MAC
    assert(e5.getString(4) == "00000000000000000000")
    assert(e5.getLong(5) == 0L)
    assert(e5.isNullAt(6))
    // family nexthop rides along
    assert(keys(0).getStruct(5).getLong(2) == (10L << 24) + 1)
  }

  test("golden: MVPN t3/t4/t6 decode the per-type field sets") {
    val msg = hex(marker + "0071" + "02" + "0000" + "005a" +
      "80 0e 57" +
      "0001 05" + "04" + "0a000002" + "00" +
      "03 16" + "0000 012c 000001f4" + "20" + "0a010101" + "20" + "e0030101" + "0a090909" +
      "04 1c" + "03 16" + "0000 0258 00000320" + "20" + "0a010102" + "20" + "e0030102" + "0a090908" + "0a070707" +
      "06 16" + "0000 012d 000001f5" + "0000fde9" + "20" + "ac110001" + "20" + "e0030203")
    val r = BgpWire.decodeUpdate(4L, 0, null, msg)
    val keys = r.getSeq[org.apache.spark.sql.Row](8)
    assert(keys.length == 3 && keys.forall(_.getString(0) == "mvpn"))
    val t3 = keys(0).getStruct(3)
    assert(t3.getInt(0) == 3)
    assert(t3.getStruct(1) == org.apache.spark.sql.Row(300L, 500L))
    assert(t3.getStruct(2).getLong(2) == (10L << 24) + (9L << 16) + (9L << 8) + 9) // originator
    assert(t3.getStruct(3).getLong(2) == (10L << 24) + (1L << 16) + (1L << 8) + 1) // source
    assert(t3.getStruct(4).getLong(2) == (224L << 24) + (3L << 16) + (1L << 8) + 1) // group
    val t4 = keys(1).getStruct(3)
    assert(t4.getInt(0) == 4 && t4.isNullAt(1)) // rd-less, S-PMSI key instead
    assert(t4.getStruct(2).getLong(2) == (10L << 24) + (7L << 16) + (7L << 8) + 7)
    assert(t4.getStruct(6) == org.apache.spark.sql.Row(600L, 800L)) // spmsi_rd
    assert(t4.getStruct(7).getLong(2) == (10L << 24) + (9L << 16) + (9L << 8) + 8) // spmsi_originator
    assert(t4.getStruct(8).getLong(2) == (10L << 24) + (1L << 16) + (1L << 8) + 2) // spmsi_source
    assert(t4.getStruct(9).getLong(2) == (224L << 24) + (3L << 16) + (1L << 8) + 2) // spmsi_group
    val t6 = keys(2).getStruct(3)
    assert(t6.getInt(0) == 6)
    assert(t6.getStruct(5).getLong(2) == (172L << 24) + (17L << 16) + 1) // rp
    assert(t6.getStruct(4).getLong(2) == (224L << 24) + (3L << 16) + (2L << 8) + 3) // group
  }

  test("golden: VPLS NLRI via MP_UNREACH + decompose routes exotic keys to their tables") {
    val vplsMsg = hex(marker + "0030" + "02" + "0000" + "0019" +
      "80 0f 16" + "0019 41" +
      "0011" + "0000 01f4 000002bc" + "0003" + "000a" + "000a" + "030201")
    val r = BgpWire.decodeUpdate(5L, 1, null, vplsMsg)
    val wd = r.getSeq[org.apache.spark.sql.Row](9) // mp_keys_withdraws
    assert(wd.length == 1 && wd(0).getString(0) == "l2vpls")
    assert(wd(0).getStruct(1) == org.apache.spark.sql.Row(500L, 700L)) // top-level rd
    assert(wd(0).getStruct(2) == org.apache.spark.sql.Row(3, 10, 10)) // site/offset/range
    // decompose: the exotic keys land in their SAFI tables with the engine
    // key structs; the VPLS withdraw arrives active=false
    val evpnMsg = hex(marker + "006e" + "02" + "0000" + "0057" +
      "80 0e 54" +
      "0019 46" + "04" + "0a000001" + "00" +
      "02 25" + "0000 0191 00000259" + "00000000000000000000" + "00000000" +
      "30" + "aabbccddeeff" + "20" + "0a000032" + "000031" +
      "05 22" + "0000 0191 0000025a" + "00000000000000000000" + "00000000" +
      "18" + "0a050600" + "0a050601" + "000041")
    val rows = java.util.Arrays.asList(
      BgpWire.decodeUpdate(5L, 1, null, vplsMsg),
      BgpWire.decodeUpdate(6L, 2, null, evpnMsg))
    val df = spark.createDataFrame(rows, BgpWire.updateSchema)
    val out = UpdateDecompose.decompose(df)
      .select("rib", "active", "rd", "l2", "mvpn.mtype", "evpn.etype")
      .collect().map(_.toString).sorted.toSeq
    assert(out == Seq(
      "[evpn,true,null,null,null,2]",
      "[evpn,true,null,null,null,5]",
      "[l2vpls,false,[500,700],[3,10,10],null,null]"))
  }

  test("golden: MDT v4 reach + v6 withdraw decode RD, prefix and group") {
    import org.apache.spark.sql.Row
    // MP_REACH afi 1 safi 66 (MDT, RFC 6037), nexthop 10.0.0.1; one item:
    // 88 bits = RD 131:1031 + 10.3.5.0/24, then group 232.1.5.0 (family
    // octet 04 + /32 bit-length-prefixed body — readMdtItem doc).
    // MP_UNREACH afi 2 safi 66: 128 bits = RD 132:1032 + 2001:0:0:7::/64,
    // group 232.2.6.0 (a v4 group riding an ipv6mdt frame — the case the
    // family octet exists for).
    val msg = hex(marker + "0052" + "02" + "0000" + "003b" +
      "80 0e 1b" + "0001 42" + "04" + "0a000001" + "00" +
      "58" + "0000 0083 00000407" + "0a0305" + "04" + "20" + "e8010500" +
      "80 0f 1a" + "0002 42" +
      "80" + "0000 0084 00000408" + "2001000000000007" + "04" + "20" + "e8020600")
    val r = BgpWire.decodeUpdate(10L, 0, null, msg)
    val keys = r.getSeq[Row](8) // mp_keys
    assert(keys.length == 1 && keys(0).getString(0) == "ipv4mdt")
    val k = keys(0)
    assert(k.getStruct(1) == Row(131L, 1031L)) // rd
    assert(k.getStruct(6).getLong(2) == (10L << 24) + (3L << 16) + (5L << 8)
      && k.getStruct(6).getInt(3) == 24) // prefix
    assert(k.getStruct(7).getLong(2) == (232L << 24) + (1L << 16) + (5L << 8)
      && k.getStruct(7).getInt(3) == 32) // group
    assert(k.getStruct(5).getLong(2) == (10L << 24) + 1) // family nexthop
    val wd = r.getSeq[Row](9) // mp_keys_withdraws
    assert(wd.length == 1 && wd(0).getString(0) == "ipv6mdt")
    assert(wd(0).getStruct(1) == Row(132L, 1032L))
    assert(wd(0).getStruct(6).getLong(1) == (0x2001L << 48) + 7L
      && wd(0).getStruct(6).getInt(3) == 64)
    assert(wd(0).getStruct(7).getLong(2) == (232L << 24) + (2L << 16) + (6L << 8))
  }

  test("MDT group codec is symmetric: non-host, absent, v6-short and /0 groups round-trip") {
    import org.apache.spark.sql.Row
    // the encoder writes the group as a family octet + length-prefixed
    // body (ceil(bits/8) bytes); the decoder must mirror that — a /24
    // group is 3 body bytes, not a fixed 4-byte host read; a null group
    // is family octet 0; a v6 group with prefix_len <= 32 (ff30::/12)
    // must NOT fall into a v4 read (the ADVICE r11 asymmetry — family
    // comes from the octet, never from the bit length); and a degenerate
    // non-null /0 group stays non-null
    def mdtKey(grp: Row) = Row("ipv4mdt", Row(130L, 1030L), null, null, null,
      Row(4.toByte, 0L, (192L << 24) + (168L << 16) + 1L, 32),
      Row(4.toByte, 0L, (10L << 24) + (7L << 16), 24), grp)
    val groups = Seq(
      Row(4.toByte, 0L, (232L << 24) + (1L << 16) + (5L << 8), 24),
      null,
      Row(6.toByte, 0xff30L << 48, 0L, 12),
      Row(4.toByte, 0L, 0L, 0))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(20L, 0, null,
        Seq.empty[Row], Seq.empty[Row], null, null, null,
        groups.map(mdtKey),
        null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows, BgpWire.updateSchema)
    val got = BgpWire.decodeUpdates(BgpWire.encodeUpdates(df)).collect()(0)
    val keys = got.getSeq[Row](8)
    assert(keys.length == groups.length)
    groups.zipWithIndex.foreach { case (g, i) =>
      if (g == null) assert(keys(i).isNullAt(7))
      else assert(keys(i).getStruct(7) == g, s"group $i")
    }
    // prefixes and RDs survive alongside
    assert(keys.forall(_.getStruct(6).getInt(3) == 24))
    assert(keys.forall(_.getStruct(1) == Row(130L, 1030L)))
  }

  test("MDT reach items with differing nexthops keep their own nexthop") {
    import org.apache.spark.sql.Row
    // the nexthop lives on the MP_REACH envelope, not the item — the
    // encoder must emit one attribute per (family, nexthop) group rather
    // than collapsing every item onto items.head's nexthop
    def key(nhLo: Long, pfxLo: Long) = Row("ipv4mdt", Row(130L, 1030L),
      null, null, null, Row(4.toByte, 0L, nhLo, 32),
      Row(4.toByte, 0L, pfxLo, 32),
      Row(4.toByte, 0L, (232L << 24) + 9L, 32))
    val nh1 = (192L << 24) + (168L << 16) + 1L
    val nh2 = (192L << 24) + (168L << 16) + 2L
    val p1 = (10L << 24) + 1L; val p2 = (10L << 24) + 2L; val p3 = (10L << 24) + 3L
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(21L, 0, null,
        Seq.empty[Row], Seq.empty[Row], null, null, null,
        Seq(key(nh1, p1), key(nh2, p2), key(nh1, p3)),
        null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows, BgpWire.updateSchema)
    val got = BgpWire.decodeUpdates(BgpWire.encodeUpdates(df)).collect()(0)
    val pairs = got.getSeq[Row](8)
      .map(k => (k.getStruct(6).getLong(2), k.getStruct(5).getLong(2))).toSet
    assert(pairs == Set((p1, nh1), (p2, nh2), (p3, nh1)))
  }

  test("property: random MDT keys round-trip the wire as a multiset") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.Row
    // the ADVICE-r11 asymmetry (v6 short-prefix groups) lived exactly in
    // the corner hand-picked cases missed — so the codec now gets random
    // keys across both families, every prefix length, absent//0/v4/v6
    // groups, mixed per-item nexthops, reach AND withdraw
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(97L + i)))
    def maskV4(raw: Long, plen: Int): Long =
      if (plen <= 0) 0L else raw & 0xFFFFFFFFL & (~0L << (32 - plen)) & 0xFFFFFFFFL
    def maskV6(hi: Long, lo: Long, plen: Int): (Long, Long) =
      if (plen <= 0) (0L, 0L)
      else if (plen <= 64) (hi & (~0L << (64 - plen)), 0L)
      else (hi, if (plen >= 128) lo else lo & (~0L << (128 - plen)))
    def genPfx(v6: Boolean): Gen[Row] = for {
      plen <- Gen.choose(0, if (v6) 128 else 32)
      hi <- Gen.long; lo <- Gen.long
    } yield if (v6) { val (h, l) = maskV6(hi, lo, plen); Row(6.toByte, h, l, plen) }
      else Row(4.toByte, 0L, maskV4(lo, plen), plen)
    val genGroup: Gen[Row] = Gen.frequency(
      1 -> Gen.const(null: Row),
      2 -> genPfx(v6 = false), 2 -> genPfx(v6 = true))
    val genRd: Gen[Row] = for {
      h <- Gen.choose(0L, 65535L); l <- Gen.choose(0L, 0xFFFFFFFFL)
    } yield Row(h, l)
    val genNh: Gen[Row] = Gen.oneOf(
      Gen.choose(0L, 0xFFFFFFFFL).map(lo => Row(4.toByte, 0L, lo, 32)),
      Gen.long.flatMap(h => Gen.long.map(l => Row(6.toByte, h, l, 128))))
    def genKey(withNh: Boolean): Gen[Row] = for {
      rib <- Gen.oneOf("ipv4mdt", "ipv6mdt")
      rd <- genRd
      nh <- if (withNh) genNh else Gen.const(null: Row)
      p <- genPfx(v6 = rib == "ipv6mdt")
      g <- genGroup
    } yield Row(rib, rd, null, null, null, nh, p, g)
    val genMsg: Gen[(Seq[Row], Seq[Row])] = for {
      nr <- Gen.choose(1, 4); nw <- Gen.choose(0, 2)
      reach <- Gen.listOfN(nr, genKey(withNh = true))
      wd <- Gen.listOfN(nw, genKey(withNh = false))
    } yield (reach, wd)
    val msgs = samples(genMsg, 30)
    val rows = new java.util.ArrayList[Row]()
    msgs.zipWithIndex.foreach { case ((reach, wd), i) =>
      rows.add(Row(100L + i, 0, null, Seq.empty[Row], Seq.empty[Row],
        null, null, null, reach, wd,
        null, null, null, null, null, null, null))
    }
    val df = spark.createDataFrame(rows, BgpWire.updateSchema)
    val got = BgpWire.decodeUpdates(BgpWire.encodeUpdates(df))
      .collect().map(r => r.getLong(0) -> r).toMap
    msgs.zipWithIndex.foreach { case ((reach, wd), i) =>
      val r = got(100L + i)
      // a message with no MP_UNREACH decodes its withdraw list as null
      def ms(xs: Seq[Row]) = Option(xs).getOrElse(Seq.empty[Row])
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(ms(r.getSeq[Row](8)) == ms(reach), s"msg $i reach")
      assert(ms(r.getSeq[Row](9)) == ms(wd), s"msg $i withdraws")
    }
  }

  test("golden: FlowSpec v4 decodes the destination prefix into fs4u") {
    // MP_REACH afi 1 safi 133, empty nexthop; one flowspec NLRI of length 7:
    // dst-prefix 10.7.0.0/16 + a dest-port component (eq 80) that must be
    // walked via its op/value list and consumed
    val msg = hex(marker + "0027" + "02" + "0000" + "0010" +
      "80 0e 0d" + "0001 85" + "00" + "00" +
      "07" + "01 10 0a07" + "04 81 50")
    val r = BgpWire.decodeUpdate(8L, 0, null, msg)
    val fam = r.getSeq[org.apache.spark.sql.Row](6) // mp
    assert(fam.length == 1 && fam(0).getString(0) == "fs4u")
    val ps = fam(0).getSeq[org.apache.spark.sql.Row](1)
    assert(ps.map(p => (p.getLong(2), p.getInt(3)))
      == Seq(((10L << 24) + (7L << 16), 16)))
  }

  test("malformed frames fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      BgpWire.decodeUpdate(0L, 0, null, hex("00" * 19)) // bad marker
    }
    intercept[IllegalArgumentException] { // wrong declared length
      BgpWire.decodeUpdate(0L, 0, null, hex(marker + "0099" + "02" + "0000" + "0000"))
    }
    intercept[IllegalArgumentException] { // MDT NLRI shorter than its RD
      // well-framed message, MP_REACH afi 1 safi 66 whose single item
      // declares 48 bits (< the 64-bit RD) — readMdtItem's documented
      // throw-on-malformed posture, same as the framing checks above
      BgpWire.decodeUpdate(0L, 0, null, hex(marker + "0024" + "02" + "0000" +
        "000d" + "80 0e 0a" + "0001 42" + "04" + "0a000001" + "00" + "30"))
    }
  }

  test("encode -> decode roundtrips the deterministic message stream") {
    val events = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
    val msgs = UpdateDecompose.messages(events).localCheckpoint()
    val decoded = BgpWire.decodeUpdates(BgpWire.encodeUpdates(msgs))
    def flat(df: org.apache.spark.sql.DataFrame): Seq[String] =
      UpdateDecompose.decompose(df)
        .select(col("msg_id"), col("rib"), col("active"), col("prefix_str"),
          col("nexthop.ip_hi"), col("nexthop.ip_lo"),
          col("rd.rdh"), col("rd.rdl"), col("mdt_group.ip_lo"))
        .collect().map(_.toString).sorted.toSeq
    val a = flat(msgs)
    val b = flat(decoded)
    assert(a.nonEmpty && a == b)
  }

  test("attrs roundtrip through the wire: origin/as-path/med/lp/communities") {
    val s = spark
    val row = org.apache.spark.sql.Row(
      9L, 2, new java.sql.Timestamp(1700000000000L),
      Seq(org.apache.spark.sql.Row(4.toByte, 0L, (10L << 24) + (7L << 16), 24)),
      Seq.empty[org.apache.spark.sql.Row],
      org.apache.spark.sql.Row(4.toByte, 0L, (192L << 24) + (168L << 16) + 77L, 32),
      null, null,
      null, null,
      "Incomplete", Seq(100L, 65001L), 42L, 110L,
      Seq(org.apache.spark.sql.Row(10, 25)),
      Seq(org.apache.spark.sql.Row(1L, 2L, 3L)),
      Seq(org.apache.spark.sql.Row(0, 2, 200L, 300L)))
    val df = s.createDataFrame(
      java.util.Arrays.asList(row), BgpWire.updateSchema)
    val got = BgpWire.decodeUpdates(BgpWire.encodeUpdates(df)).collect()(0)
    assert(got.getString(10) == "Incomplete")
    assert(got.getSeq[Long](11) == Seq(100L, 65001L))
    assert(got.getLong(12) == 42L && got.getLong(13) == 110L)
    assert(got.getSeq[org.apache.spark.sql.Row](14) == Seq(org.apache.spark.sql.Row(10, 25)))
    assert(got.getSeq[org.apache.spark.sql.Row](15) == Seq(org.apache.spark.sql.Row(1L, 2L, 3L)))
    assert(got.getSeq[org.apache.spark.sql.Row](16) == Seq(org.apache.spark.sql.Row(0, 2, 200L, 300L)))
    assert(got.getTimestamp(2).getTime == 1700000000000L)
  }

  test("BMP route-monitoring: framing, per-peer header, filter_rd") {
    val inner = BgpWire.encodeUpdates(
      UpdateDecompose.messages(
        graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")).limit(1))
      .collect()(0).getAs[Array[Byte]](3)
    val bmp1 = BgpWire.encodeBmpRouteMonitoring(101L, 1000L,
      (10L << 24) + 1, 65001L, 0x01020304L, 1700000000L, 250000L, inner)
    // hand-check the framing bytes the encoder claims to write
    assert((bmp1(0) & 0xFF) == 3) // version
    assert((bmp1(5) & 0xFF) == 0) // type: route monitoring
    assert(bmp1.length == 6 + 42 + inner.length)
    val r = BgpWire.decodeBmp(bmp1)
    assert(r.getString(0) == "route_monitoring")
    assert(r.getStruct(1) == org.apache.spark.sql.Row(101L, 1000L))
    assert(r.getStruct(2).getLong(2) == (10L << 24) + 1)
    assert(r.getLong(3) == 65001L)
    assert(r.getTimestamp(5).getTime == 1700000000L * 1000 + 250)
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](6), inner))

    // filter_rd keeps only the requested VRF (src/bmppeer.rs:33-39)
    val bmp2 = BgpWire.encodeBmpRouteMonitoring(102L, 2000L,
      (10L << 24) + 2, 65002L, 0x05060708L, 1700000100L, 0L, inner)
    val s = spark
    val frames = s.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(bmp1: Any), org.apache.spark.sql.Row(bmp2: Any)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bytes",
          org.apache.spark.sql.types.BinaryType))))
    val peers = BgpWire.decodeBmpFrames(frames)
    assert(peers.count() == 2)
    val kept = BgpWire.filterRd(peers, 101L, 1000L).collect()
    assert(kept.length == 1 && kept(0).getLong(3) == 65001L)
  }
}
