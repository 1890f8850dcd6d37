package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Cbor._

/** CBOR codec goldens (RFC 8949 Appendix A vectors — public test vectors)
  * and the snapshot import: a hand-assembled golden snapshot in the
  * reference's exact layout (15 sequential table maps, 4-level nesting,
  * BAE_VARS/BA_VARS field names) loads into route rows, and the
  * q_rib_current-style view over it matches the expected counts. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dec1(bytes: Array[Byte]): Value =
    Cbor.decode(new ByteArrayInputStream(bytes)).get

  test("RFC 8949 Appendix A golden vectors decode") {
    assert(dec1(hex("00")) == CInt(0))
    assert(dec1(hex("17")) == CInt(23))
    assert(dec1(hex("1818")) == CInt(24))
    assert(dec1(hex("1a000f4240")) == CInt(1000000))
    assert(dec1(hex("1b000000e8d4a51000")) == CInt(1000000000000L))
    // 18446744073709551615 (uint64 max) exceeds Long
    assert(dec1(hex("1bffffffffffffffff")) == CBig(BigInt("18446744073709551615")))
    assert(dec1(hex("20")) == CInt(-1))
    assert(dec1(hex("3903e7")) == CInt(-1000))
    assert(dec1(hex("f4")) == CBool(false))
    assert(dec1(hex("f6")) == CNull)
    assert(dec1(hex("6449455446")) == CText("IETF"))
    assert(dec1(hex("62225c")) == CText("\"\\"))
    assert(dec1(hex("8301820203820405")) ==
      CArr(Vector(CInt(1), CArr(Vector(CInt(2), CInt(3))),
        CArr(Vector(CInt(4), CInt(5))))))
    assert(dec1(hex("a26161016162820203")) ==
      CMap(Vector(CText("a") -> CInt(1),
        CText("b") -> CArr(Vector(CInt(2), CInt(3))))))
    // indefinite-length: bytes chunks, text chunks, array, map
    assert(dec1(hex("5f42010243030405ff")).asInstanceOf[CBytes].v.toSeq ==
      Seq[Byte](1, 2, 3, 4, 5))
    assert(dec1(hex("7f657374726561646d696e67ff")) == CText("streaming"))
    assert(dec1(hex("9f018202039f0405ffff")) ==
      CArr(Vector(CInt(1), CArr(Vector(CInt(2), CInt(3))),
        CArr(Vector(CInt(4), CInt(5))))))
    assert(dec1(hex("bf61610161629f0203ffff")) ==
      CMap(Vector(CText("a") -> CInt(1),
        CText("b") -> CArr(Vector(CInt(2), CInt(3))))))
    // floats: half, single, double precision
    assert(dec1(hex("f90001")) == CFloat(5.960464477539063e-8))
    assert(dec1(hex("fa47c35000")) == CFloat(100000.0))
    assert(dec1(hex("fb7e37e43c8800759c")) == CFloat(1.0e300))
    assert(dec1(hex("f97c00")) == CFloat(Double.PositiveInfinity))
    // tag 1 (epoch seconds)
    assert(dec1(hex("c11a514b67b0")) == CTag(1, CInt(1363896240)))
  }

  test("encoder/decoder roundtrip over nested structures") {
    val v = CMap(Vector(
      CText("k") -> CArr(Vector(CInt(-500), CInt(0), CInt(1L << 40),
        CBytes(Array[Byte](1, 2, 3)), CText("x"), CBool(true), CNull)),
      CInt(42) -> CMap(Vector(CText("in") -> CFloat(2.5))),
      CText("big") -> CBig(BigInt("18446744073709551615"))))
    assert(dec1(Cbor.encode(v)) == v)
  }

  // ------------------------------------------------- snapshot fixture

  private def v4key(a: Int, b: Int, c: Int, d: Int, len: Int): Value =
    CMap(Vector(
      CText("addr") -> CArr(Vector(CInt(a), CInt(b), CInt(c), CInt(d))),
      CText("prefixlen") -> CInt(len)))

  private def entry(active: Boolean, med: Option[Long],
      labels: Option[Seq[Long]] = None): Value =
    CMap(Vector(
      CText("Active") -> CBool(active),
      CText("Attrs") -> CMap(Vector(
        CText("Origin") -> CText("Igp"),
        CText("Nexthop") -> CMap(Vector(
          CText("V4") -> CArr(Vector(CInt(192), CInt(0), CInt(2), CInt(1))))),
        CText("Aspath") -> CArr(Vector(CInt(65001), CInt(65002))),
        CText("Comms") -> CArr(Vector.empty),
        CText("LComms") -> CArr(Vector.empty),
        CText("ExtComms") -> CArr(Vector.empty),
        CText("Med") -> med.map(CInt(_)).getOrElse(CNull),
        CText("Localpref") -> CNull,
        CText("Atomicaggregate") -> CNull,
        CText("Aggregatoras") -> CNull,
        CText("Originator") -> CNull,
        CText("Clusterlist") -> CNull,
        CText("PmsiTa") -> CNull)),
      CText("Labels") ->
        labels.map(ls => CArr(ls.toVector.map(CInt(_)))).getOrElse(CNull)))

  private def hist(entries: (Long, Value)*): Value =
    CMap(entries.toVector.map { case (ts, e) => (CInt(ts): Value) -> e })

  /** The golden snapshot: ipv4u carries two routes (one with a 2-deep
    * history whose newest entry is a withdraw), ipv6u one labelled route,
    * the other 13 tables empty — write_snapshot order verbatim. */
  private def goldenSnapshot: Array[Byte] = {
    val ipv4u = CMap(Vector(
      v4key(10, 0, 0, 0, 8) -> CMap(Vector(
        (CInt(1): Value) -> CMap(Vector(
          (CInt(0): Value) -> hist(
            1000L -> entry(active = true, med = Some(100)),
            2000L -> entry(active = false, med = None)))))),
      v4key(10, 4, 0, 0, 14) -> CMap(Vector(
        (CInt(1): Value) -> CMap(Vector(
          (CInt(7): Value) -> hist(
            1500L -> entry(active = true, med = Some(5)))))))))
    val v6addr = CArr((Vector(0x20, 0x01, 0x0d, 0xb8) ++
      Vector.fill(12)(0)).map(i => CInt(i.toLong)))
    val ipv6u = CMap(Vector(
      (CMap(Vector(CText("addr") -> v6addr,
        CText("prefixlen") -> CInt(32))): Value) -> CMap(Vector(
        (CInt(2): Value) -> CMap(Vector(
          (CInt(0): Value) -> hist(
            3000L -> entry(active = true, med = None,
              labels = Some(Seq(100, 200))))))))))
    // wrapper-keyed tables in the reference serde shapes (zettabgp derive
    // maps; Snapshot key-shape scaladoc): Labeled, Labeled<WithRd>, and
    // WithRd<BgpMdtV4> — hand-assembled, independent of the writer
    val ipv4lu = CMap(Vector(
      (CMap(Vector(
        CText("labels") -> CArr(Vector(CInt(100))),
        CText("prefix") -> v4key(10, 9, 0, 0, 24))): Value) -> CMap(Vector(
        (CInt(1): Value) -> CMap(Vector(
          (CInt(0): Value) -> hist(
            4000L -> entry(active = true, med = None, labels = Some(Seq(100))))))))))
    val vpnv4u = CMap(Vector(
      (CMap(Vector(
        CText("labels") -> CArr(Vector(CInt(200))),
        CText("prefix") -> CMap(Vector(
          CText("rd") -> CMap(Vector(
            CText("rdh") -> CInt(101), CText("rdl") -> CInt(1000))),
          CText("prefix") -> v4key(10, 8, 0, 0, 24))))): Value) -> CMap(Vector(
        (CInt(1): Value) -> CMap(Vector(
          (CInt(0): Value) -> hist(
            5000L -> entry(active = true, med = Some(7), labels = Some(Seq(200))))))))))
    val ipv4mdt = CMap(Vector(
      (CMap(Vector(
        CText("rd") -> CMap(Vector(
          CText("rdh") -> CInt(130), CText("rdl") -> CInt(1030))),
        CText("prefix") -> CMap(Vector(
          CText("addr") -> v4key(10, 7, 0, 0, 24),
          CText("group") -> CArr(Vector(CInt(232), CInt(1), CInt(5), CInt(0))))))): Value) ->
        CMap(Vector(
          (CInt(3): Value) -> CMap(Vector(
            (CInt(0): Value) -> hist(
              6000L -> entry(active = true, med = None))))))))
    val empty = CMap(Vector.empty)
    val docs = Snapshot.ribOrder.map {
      case "ipv4u" => ipv4u
      case "ipv6u" => ipv6u
      case "ipv4lu" => ipv4lu
      case "vpnv4u" => vpnv4u
      case "ipv4mdt" => ipv4mdt
      case _ => empty
    }
    docs.flatMap(Cbor.encode).toArray
  }

  test("golden snapshot decodes into the expected route rows") {
    val rows = Snapshot.decodeFile("s1", goldenSnapshot).toVector
    assert(rows.length == 7)
    // wrapper keys render canonically (Snapshot.render: struct maps with
    // transparent {addr, prefixlen} and octet-array collapsing)
    val lu = rows.find(_.rib == "ipv4lu").get
    assert(lu.route_key == "{labels:[100],prefix:10.9.0.0/24}")
    assert(lu.labels.contains(Seq(100L)))
    val vpn = rows.find(_.rib == "vpnv4u").get
    assert(vpn.route_key ==
      "{labels:[200],prefix:{rd:{rdh:101,rdl:1000},prefix:10.8.0.0/24}}")
    assert(vpn.med.contains(7L))
    val mdt = rows.find(_.rib == "ipv4mdt").get
    assert(mdt.route_key ==
      "{rd:{rdh:130,rdl:1030},prefix:{addr:10.7.0.0/24,group:232.1.5.0}}")
    assert(mdt.session_id == 3)
    val r1 = rows.find(r => r.route_key == "10.0.0.0/8" && r.ts_ms == 1000L).get
    assert(r1.rib == "ipv4u" && r1.session_id == 1 && r1.path_id == 0)
    assert(r1.active && r1.med.contains(100L) && r1.localpref.isEmpty)
    assert(r1.origin.contains("Igp"))
    assert(r1.nexthop.contains("192.0.2.1")) // V4 enum wrapper is transparent
    assert(r1.aspath.contains("[65001,65002]"))
    assert(r1.labels.isEmpty)
    val r2 = rows.find(r => r.route_key == "10.0.0.0/8" && r.ts_ms == 2000L).get
    assert(!r2.active && r2.med.isEmpty)
    val r3 = rows.find(_.route_key == "10.4.0.0/14").get
    assert(r3.path_id == 7 && r3.med.contains(5L))
    val r6 = rows.find(_.rib == "ipv6u").get
    assert(r6.route_key == "2001:db8:0:0:0:0:0:0/32")
    assert(r6.session_id == 2 && r6.labels.contains(Seq(100L, 200L)))
  }

  // ----------------------------------------------------------- writer

  /** One synthetic engine event-log row with the columns `Snapshot.write`
    * consumes — hand-controlled so the written bytes are predictable. */
  private def eventRow(rib: String, v6: Boolean, ipHi: Long, ipLo: Long,
      plen: Int, sid: Int, pid: Long, tsMs: Long, active: Boolean,
      med: Option[Long], labels: Option[Seq[Long]],
      rd: Option[(Long, Long)] = None, mdtGroup: Option[Long] = None) =
    spark.range(1).selectExpr(
      s"'$rib' as rib",
      s"named_struct('version', cast(${if (v6) 6 else 4} as tinyint), " +
        s"'ip_hi', ${ipHi}L, 'ip_lo', ${ipLo}L, 'prefix_len', $plen) as prefix",
      "'unused' as prefix_str",
      rd.map { case (h, l) => s"named_struct('rdh', ${h}L, 'rdl', ${l}L) as rd" }
        .getOrElse("cast(null as struct<rdh:bigint,rdl:bigint>) as rd"),
      mdtGroup.map(g => "named_struct('version', cast(4 as tinyint), " +
          s"'ip_hi', 0L, 'ip_lo', ${g}L, 'prefix_len', 32) as mdt_group")
        .getOrElse("cast(null as struct<version:tinyint,ip_hi:bigint," +
          "ip_lo:bigint,prefix_len:int>) as mdt_group"),
      labels.map(ls => s"array(${ls.mkString("L,")}L) as labels")
        .getOrElse("cast(null as array<bigint>) as labels"),
      s"$sid as session_id",
      s"${pid}L as path_id",
      s"timestamp_millis(${tsMs}L) as ts",
      s"$active as active",
      "named_struct('origin', 'IGP', " +
        "'nexthop', named_struct('version', cast(4 as tinyint), 'ip_hi', 0L, " +
        s"'ip_lo', ${0xC0000201L}L, 'prefix_len', 32), " +
        "'as_list', array(65001L, 65002L), " +
        s"'med', ${med.map(_.toString + "L").getOrElse("cast(null as bigint)")}, " +
        "'localpref', cast(null as bigint), " +
        "'comms', cast(null as array<struct<a:int,b:int>>), " +
        "'lcomms', cast(null as array<struct<a:bigint,b:bigint,c:bigint>>)) as attrs",
      "0L as route_id")

  test("snapshot writer bytes equal the hand-assembled golden file") {
    val in = eventRow("ipv4u", v6 = false, 0L, 10L << 24, 8, 1, 0L, 1000L,
        active = true, med = Some(100), labels = None)
      .union(eventRow("ipv4u", v6 = false, 0L, 10L << 24, 8, 1, 0L, 2000L,
        active = false, med = None, labels = None))
      .union(eventRow("ipv4u", v6 = false, 0L, (10L << 24) | (4L << 16), 14,
        1, 7L, 1500L, active = true, med = Some(5), labels = None))
      .union(eventRow("ipv6u", v6 = true, 0x20010db800000000L, 0L, 32,
        2, 0L, 3000L, active = true, med = None, labels = Some(Seq(100, 200))))
      .union(eventRow("ipv4lu", v6 = false, 0L, (10L << 24) | (9L << 16), 24,
        1, 0L, 4000L, active = true, med = None, labels = Some(Seq(100))))
      .union(eventRow("vpnv4u", v6 = false, 0L, (10L << 24) | (8L << 16), 24,
        1, 0L, 5000L, active = true, med = Some(7), labels = Some(Seq(200)),
        rd = Some((101L, 1000L))))
      .union(eventRow("ipv4mdt", v6 = false, 0L, (10L << 24) | (7L << 16), 24,
        3, 0L, 6000L, active = true, med = None, labels = None,
        rd = Some((130L, 1030L)),
        mdtGroup = Some((232L << 24) | (1L << 16) | (5L << 8))))
    val dir = Files.createTempDirectory("graft_snap_wg")
    Snapshot.write(in, dir.toString, shards = 1)
    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".cbor"))
    assert(files.length == 1)
    val written = Files.readAllBytes(files(0).toPath)
    // the independent pin: the golden bytes were hand-assembled from the
    // reference's serde layout, not produced by the writer
    assert(java.util.Arrays.equals(written, goldenSnapshot))
  }

  test("writer export loads back file-parallel with route histories intact") {
    val ev = graft.sources.RouteEventGen.routeEvents(spark, "/root/testdata/sf0.001")
      .where(col("attrs_hash") % 37 === 0)
    val dir = Files.createTempDirectory("graft_snap_rt")
    Snapshot.write(ev, dir.toString, shards = 3)
    val loaded = Snapshot.load(spark, dir.toString)
    assert(loaded.count() == ev.count())
    // shard partitioning is on route_id: a route's history never splits
    val split = loaded.groupBy(col("rib"), col("route_key"),
        col("session_id"), col("path_id"))
      .agg(countDistinct(col("snapshot")).as("nf"))
      .where(col("nf") > 1).count()
    assert(split == 0L)
    // identity fields survive the round trip as a multiset
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6))
    val sent = ev.select(col("rib"), col("session_id").cast("long"),
        col("path_id"), unix_millis(col("ts")), col("active"),
        col("attrs.med"), col("attrs.localpref"))
      .collect().map(keyOf).sorted.toSeq
    val got = loaded.toDF.select(col("rib"), col("session_id"), col("path_id"),
        col("ts_ms"), col("active"), col("med"), col("localpref"))
      .collect().map(keyOf).sorted.toSeq
    assert(got == sent)
    // plain-prefix v4 keys round-trip to the engine's display form
    val v4keys = loaded.toDF.where(col("rib") === "ipv4u")
      .select(col("route_key")).distinct().collect().map(_.getString(0)).toSet
    val evKeys = ev.where(col("rib") === "ipv4u")
      .select(col("prefix_str")).distinct().collect().map(_.getString(0)).toSet
    assert(v4keys == evKeys)
  }

  test("fuzz: byte-truncation sweep — typed strict failure, lenient salvage") {
    // every cut point: the strict path fails with the TYPED CborError
    // (never a raw runtime exception, never an allocation blowup from a
    // corrupted length claim), and the lenient path never throws, never
    // invents rows, and always tallies a quarantine reason
    val golden = goldenSnapshot
    val goldenRows = Snapshot.decodeFile("s1", golden).toVector.toSet
    val (cleanRows, cleanQ) = Snapshot.decodeFileLenient("s1", golden)
    assert(cleanQ.isEmpty && cleanRows.toSet == goldenRows)
    (0 until golden.length by 3).foreach { n =>
      val cut = java.util.Arrays.copyOfRange(golden, 0, n)
      val thrown = intercept[Throwable] {
        Snapshot.decodeFile("s1", cut).toVector }
      assert(thrown.isInstanceOf[CborError], s"cut=$n threw $thrown")
      val (rows, quar) = Snapshot.decodeFileLenient("s1", cut)
      assert(rows.toSet.subsetOf(goldenRows), s"cut=$n invented rows")
      assert(quar.nonEmpty, s"cut=$n lost bytes silently")
      assert(quar.keySet.subsetOf(Set("cbor_framing", "truncated_table")),
        s"cut=$n: $quar")
    }
  }

  test("fuzz: wrong minor types quarantine the smallest unit; unknown keys pass") {
    def enc(docs: Seq[Value]): Array[Byte] = docs.flatMap(Cbor.encode).toArray
    val good = entry(active = true, med = Some(1))
    // Active as an int — wrong minor type inside the entry
    val badActive = CMap(Vector(
      CText("Active") -> CInt(1),
      CText("Attrs") -> CMap(Vector.empty)))
    // Attrs as an array — wrong minor type inside the entry
    val badAttrs = CMap(Vector(
      CText("Active") -> CBool(true),
      CText("Attrs") -> CArr(Vector.empty)))
    // unknown keys at entry AND attrs level: serde-style tolerance —
    // decoded fine, known fields intact, NOT quarantined
    val unknownKeys = CMap(Vector(
      CText("Active") -> CBool(true),
      CText("FutureFlag") -> CInt(9),
      CText("Attrs") -> CMap(Vector(
        CText("Origin") -> CText("Igp"),
        CText("SomeNewAttr") -> CArr(Vector(CInt(1))))),
      CText("Labels") -> CNull))
    val ipv4u = CMap(Vector(
      v4key(10, 0, 0, 0, 8) -> CMap(Vector(
        (CInt(1): Value) -> CMap(Vector(
          (CInt(0): Value) -> CMap(Vector(
            (CInt(1000L): Value) -> good,
            (CInt(2000L): Value) -> badActive,
            (CInt(3000L): Value) -> badAttrs,
            (CText("late"): Value) -> good)), // timestamp_not_int
          (CText("pid"): Value) -> CMap(Vector.empty))), // paths_malformed
        (CText("sid"): Value) -> CMap(Vector.empty))), // sessions_malformed
      v4key(10, 1, 0, 0, 8) -> CArr(Vector.empty), // route_sessions_not_map
      v4key(10, 2, 0, 0, 8) -> CMap(Vector(
        (CInt(2): Value) -> CMap(Vector(
          (CInt(0): Value) -> CMap(Vector(
            (CInt(9000L): Value) -> unknownKeys))))))))
    val ipv4m = CArr(Vector(CInt(1))) // table_not_map
    val docs = Snapshot.ribOrder.map {
      case "ipv4u" => ipv4u
      case "ipv4m" => ipv4m
      case _ => CMap(Vector.empty)
    }
    val (rows, quar) = Snapshot.decodeFileLenient("fz", enc(docs))
    assert(rows.map(r => (r.route_key, r.ts_ms)).toSet ==
      Set(("10.0.0.0/8", 1000L), ("10.2.0.0/8", 9000L)))
    val u = rows.find(_.ts_ms == 9000L).get
    assert(u.active && u.origin.contains("Igp") && u.labels.isEmpty)
    assert(quar == Map(
      "entry_malformed" -> 2L,
      "timestamp_not_int" -> 1L,
      "paths_malformed" -> 1L,
      "sessions_malformed" -> 1L,
      "route_sessions_not_map" -> 1L,
      "table_not_map" -> 1L), quar)
    // the strict startup path refuses the same file, typed
    intercept[CborError] { Snapshot.decodeFile("fz", enc(docs)).toVector }
  }

  test("truncated snapshot fails loudly, naming the missing table") {
    val docs = Snapshot.ribOrder.take(9).map(_ => Cbor.encode(CMap(Vector.empty)))
    val err = intercept[CborError] {
      Snapshot.decodeFile("bad", docs.flatten.toArray).toVector
    }
    assert(err.getMessage.contains("l2vpls")) // the 10th table
  }

  test("Spark import: file-parallel load + current view (q_rib_current shape)") {
    val dir = Files.createTempDirectory("graft_snap")
    Files.write(dir.resolve("router-a.snapshot"), goldenSnapshot)
    Files.write(dir.resolve("router-b.snapshot"), goldenSnapshot)
    val snap = Snapshot.load(spark, dir.toString)
    assert(snap.count() == 14) // 7 rows × 2 files
    assert(snap.filter(_.snapshot == "router-a.snapshot").count() == 7)
    // newest-active per (rib, key, session, path): the 10.0.0.0/8 history
    // ends on a withdraw → drops out; the other routes survive, per file
    val cur = Snapshot.currentRoutes(
      snap.filter(_.snapshot == "router-a.snapshot"))
    val keys = cur.collect().map(r =>
      r.getAs[String]("route_key")).sorted.toSeq
    assert(keys == Seq("10.4.0.0/14", "2001:db8:0:0:0:0:0:0/32",
      "{labels:[100],prefix:10.9.0.0/24}",
      "{labels:[200],prefix:{rd:{rdh:101,rdl:1000},prefix:10.8.0.0/24}}",
      "{rd:{rdh:130,rdl:1030},prefix:{addr:10.7.0.0/24,group:232.1.5.0}}"))
  }
}
