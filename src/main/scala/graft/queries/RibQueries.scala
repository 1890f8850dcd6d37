package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.filter.FilterParser
import graft.operators.RibViews
import graft.sources.RouteEventGen

/** Oracle-checked queries for every RIB operator of SURVEY.md §2, bound to
  * the deterministic route events derived from the `events` table
  * (RouteEventGen). The engine side goes through the real machinery —
  * parse → tri-state compile → window views; the DuckDB side (OracleCte)
  * recomputes expected results directly from the derivation arithmetic, so
  * a hash match certifies the semantics, not just the plumbing.
  */
object RibQueries {

  private def re(s: SparkSession, dir: String): DataFrame =
    RouteEventGen.routeEvents(s, dir)

  /** Count accepted rows per rib — the standard observable for scan ops. */
  private def perRib(df: DataFrame): DataFrame =
    df.groupBy(col("rib")).agg(count(lit(1)).cast("long").as("n")).orderBy(col("rib"))

  private def filterCount(filter: String): (SparkSession, String) => DataFrame =
    (s, dir) => perRib(RibViews.scan(re(s, dir), filter))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- filter-language scans (F1-F9, P1-P4, Q1/Q2; SURVEY §2.2-2.4) ----
    "q_rib_filter_subnet" -> filterCount("10.4.0.0/14"),
    "q_rib_filter_rd" -> filterCount("rd:101:1000"),
    "q_rib_filter_num" -> filterCount("24"),
    "q_rib_filter_aspath" -> filterCount("as:^100"),
    "q_rib_filter_aspath_ends" -> filterCount("as:200$"),
    "q_rib_filter_community" -> filterCount("community:10:25"),
    "q_rib_filter_rt" -> filterCount("rt:202:301"),
    "q_rib_filter_rt_num" -> filterCount("rt:203"),
    "q_rib_filter_nh" -> filterCount("nh:192.168.2.0/24"),
    "q_rib_filter_regex" -> filterCount("re:^10\\.3\\."),
    "q_rib_filter_polarity" -> filterCount("10.4.0.0/14 -community:10:25"),
    "q_rib_filter_conj" -> filterCount("rd:101:1000 10.4.0.0/14"),
    "q_rib_filter_multicast" -> filterCount("224.8.0.0/13"),
    "q_rib_filter_v6" -> filterCount("2001:0:a::/48"),
    "q_rib_filter_mvpn_group" -> filterCount("224.3.0.0/16"),
    "q_rib_filter_rd_exotic" -> filterCount("rd:301:502"),
    "q_rib_supernet" -> ((s, dir) => perRib(RibViews.scanSuper(re(s, dir), "10.3.9.50"))),

    // --- history views (S5, A4, A5; SURVEY §2.1/2.5) ---------------------
    "q_rib_current" -> ((s, dir) => perRib(RibViews.current(re(s, dir)))),
    "q_rib_retention" -> ((s, dir) => perRib(RibViews.retained(re(s, dir), 2))),
    "q_rib_onlydiffer" -> ((s, dir) => perRib(RibViews.onlyDiffer(re(s, dir)))),
    "q_rib_response_filter" -> ((s, dir) => perRib(RibViews.responseFilter(
      re(s, dir), onlyActive = true,
      changedAfterMs = Some(1704844800000L), changedBeforeMs = Some(1705708800000L)))),
    "q_rib_exists" -> ((s, dir) => perRib(
      RibViews.historyExists(re(s, dir), FilterParser.parse("community:10:25"), maxDepth = 2)
        .dropDuplicates(RibViews.keyCols))),

    // --- aggregations (A1-A3) --------------------------------------------
    "q_rib_statistics" -> ((s, dir) => re(s, dir).groupBy(col("rib")).agg(
      count(lit(1)).cast("long").as("n_events"),
      sum(when(col("active"), 1L).otherwise(0L)).cast("long").as("n_updates"),
      sum(when(col("active"), 0L).otherwise(1L)).cast("long").as("n_withdraws"),
      countDistinct(col("attrs_hash")).cast("long").as("n_attrs"))
      .orderBy(col("rib"))),
    "q_rib_stores" -> ((s, dir) => {
      val d = re(s, dir)
      d.agg(
        countDistinct(col("attrs.as_list")).cast("long").as("pathes"),
        countDistinct(col("attrs.comms")).cast("long").as("comms"),
        countDistinct(col("attrs.lcomms")).cast("long").as("lcomms"),
        countDistinct(col("attrs.extcomms")).cast("long").as("extcomms"),
        countDistinct(col("attrs_hash")).cast("long").as("attrs"))
    }),
    "q_rib_sessions" -> ((s, dir) => re(s, dir)
      .groupBy(col("session_id").cast("long").as("session_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("rib")).cast("long").as("n_ribs"))
      .orderBy(col("session_id"))),
    "q_rib_found" -> ((s, dir) => {
      val d = re(s, dir)
      val found = RibViews.scan(d, "community:10:25").dropDuplicates(RibViews.keyCols).count()
      val total = d.dropDuplicates(RibViews.keyCols).count()
      val s2 = s; import s2.implicits._
      Seq((found, total)).toDF("found", "length")
    }),

    // --- LPM / top-k / pagination (Q4-Q7) --------------------------------
    "q_rib_lpm" -> ((s, dir) => {
      val s2 = s; import s2.implicits._
      // 10.3.9.50 hits a /24 (slot 3) and a /28 (slot 19) — real LPM choice;
      // 10.0.9.77 only its /24; 224.2.9.200 a multicast /24
      val probes = Seq("10.3.9.50", "10.0.9.77", "224.2.9.200")
        .map(p => (p, graft.model.Model.parseV4(p))).toDF("probe", "probe_ip")
      val keys = re(s, dir).where(col("prefix.version") === 4)
        .select((RibViews.keyCols :+ "prefix_str").map(col) :+ RibViews.keyLen.as("key_len"): _*)
        .dropDuplicates(RibViews.keyCols)
      // native codegen'd containment expression for the column-column case
      // (SURVEY §7.4: custom Expression beats a 120-node composed predicate)
      val joined = keys.join(broadcast(probes),
        graft.functions.IpContains(col("prefix"),
          struct(lit(4.toByte).as("version"), lit(0L).as("ip_hi"),
            col("probe_ip").as("ip_lo"), lit(32).as("prefix_len"))))
      joined.groupBy(col("probe"))
        .agg(max(col("key_len")).cast("long").as("best_len"),
          count(lit(1)).cast("long").as("n_keys"))
        .orderBy(col("probe"))
    }),
    "q_rib_supernet_topk" -> ((s, dir) =>
      RibViews.supernetTopK(re(s, dir), "10.3.9.50", 25)
        .select(col("rib"), col("prefix_str"), col("key_len").cast("long").as("key_len"),
          col("rd.rdh").as("rdh"), col("rd.rdl").as("rdl"),
          col("labels").getItem(0).cast("long").as("label"),
          col("session_id").cast("long").as("session_id"), col("path_id"))),
    "q_rib_pagination" -> ((s, dir) =>
      RibViews.page(
        RibViews.scan(re(s, dir), "10.0.0.0/8").dropDuplicates(RibViews.keyCols),
        skip = 20, limit = 20)
        .select(col("prefix_str"),
          col("rd.rdh").as("rdh"), col("rd.rdl").as("rdl"),
          col("labels").getItem(0).cast("long").as("label"),
          col("session_id").cast("long").as("session_id"), col("path_id"))),

    // --- S3/S4 update decomposition ---------------------------------------
    "q_ingest_decompose" -> ((s, dir) =>
      graft.sources.UpdateDecompose.decompose(
        graft.sources.UpdateDecompose.messages(Tables(s, dir, "events")))
        .groupBy(col("rib"), col("active"))
        .agg(count(lit(1)).cast("long").as("n"),
          countDistinct(col("prefix_str")).cast("long").as("n_prefixes"))
        .orderBy(col("rib"), col("active"))),

    // --- P6 JSON tree page (rows-only: JSON text formatting has no stable
    // cross-engine oracle; semantics pinned by RibJsonSpec) ---------------
    "q_rib_json_page" -> ((s, dir) => {
      val (items, _, _) = graft.operators.RibJson.jsonPage(
        re(s, dir), "ipv4u", "10.4.0.0/14",
        graft.operators.RibJson.RibParams(skip = 0, limit = 20, maxDepth = 5))
      items.select(col("item_key"), col("items_json"))
    }),

    // --- snapshot roundtrip (S6): write the event log as a Parquet
    // checkpoint partitioned by rib (the reference's CBOR snapshot,
    // src/bgprib.rs:903-1015), read it back, aggregate. ------------------
    "q_rib_snapshot" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_snapshot").toString
      re(s, dir).drop("event_id").write.mode("overwrite")
        .partitionBy("rib").parquet(tmp)
      perRib(s.read.parquet(tmp))
    }))

  private val cte: String =
    """WITH reS AS (
      |  SELECT *, ((event_id>>4)+user_id)%20 AS slot FROM events
      |), re0 AS (
      |  SELECT event_id AS eid, user_id AS uid, ts, slot,
      |    CASE WHEN event_id%16<8 THEN 'ipv4u' WHEN event_id%16<11 THEN 'vpnv4u'
      |         WHEN event_id%16<13 THEN 'ipv6u' WHEN event_id%16<14 THEN 'ipv4lu'
      |         WHEN event_id%16=14 THEN 'ipv4m'
      |         WHEN user_id%3=0 THEN 'mvpn' WHEN user_id%3=1 THEN 'evpn'
      |         ELSE 'l2vpls' END AS rib,
      |    user_id%4 AS session_id,
      |    event_id%3 AS path_id,
      |    (event_id%7)<>0 AS active,
      |    slot%16 AS o2,
      |    user_id%256 AS o3,
      |    CASE WHEN slot%3=0 THEN 0
      |         WHEN slot%3=1 THEN (slot%16)*16
      |         ELSE (slot*12)%256 END AS o4,
      |    CASE WHEN slot%3=0 THEN 24
      |         WHEN slot%3=1 THEN 28 ELSE 32 END AS plen4,
      |    100+event_id%5 AS a1, 200+user_id%7 AS a2, event_id%2 AS len3,
      |    event_id%50 AS c1b, user_id%10 AS c2b,
      |    200+user_id%4 AS rta, 300+event_id%5 AS rtb,
      |    user_id%4 AS nh3, event_id%200 AS nh4,
      |    event_id%100 AS med, 100+user_id%10 AS lp,
      |    (event_id%600)*1000+user_id%140 AS attrs_hash
      |  FROM reS
      |), re AS (
      |  SELECT *,
      |    CASE WHEN rib='ipv6u' THEN 64
      |         WHEN rib IN ('mvpn','evpn','l2vpls') THEN NULL
      |         ELSE plen4 END AS plen,
      |    CASE WHEN rib='ipv4m' THEN 3758096384 + o2*65536 + o3*256 + o4
      |         WHEN rib IN ('ipv4u','vpnv4u','ipv4lu')
      |         THEN 167772160 + o2*65536 + o3*256 + o4 END AS ip,
      |    CASE WHEN rib='ipv6u' THEN 8193*281474976710656 + o2*65536 + o3 END AS hi6,
      |    CASE WHEN rib='vpnv4u' THEN 100+uid%3 WHEN rib='mvpn' THEN 300+uid%2
      |         WHEN rib='evpn' THEN 400+uid%2 WHEN rib='l2vpls' THEN 500+uid%2
      |         END AS rdh,
      |    CASE WHEN rib='vpnv4u' THEN 1000+eid%2 WHEN rib='mvpn' THEN 500+eid%4
      |         WHEN rib='evpn' THEN 600+eid%3 WHEN rib='l2vpls' THEN 700+eid%3
      |         END AS rdl,
      |    CASE WHEN rib IN ('ipv4lu','vpnv4u') THEN 100+eid%8 END AS label,
      |    CASE WHEN rib='ipv6u'
      |         THEN '2001:0:'||printf('%x',o2)||':'||printf('%x',o3)||':0:0:0:0/64'
      |         WHEN rib IN ('mvpn','evpn','l2vpls') THEN NULL
      |         ELSE CAST((CASE WHEN rib='ipv4m' THEN 224 ELSE 10 END) AS VARCHAR)
      |              ||'.'||CAST(o2 AS VARCHAR)||'.'||CAST(o3 AS VARCHAR)
      |              ||'.'||CAST(o4 AS VARCHAR)||'/'||CAST(plen4 AS VARCHAR) END AS prefix_str,
      |    CASE WHEN rib IN ('mvpn','evpn','l2vpls') THEN NULL
      |         ELSE CASE WHEN rib='ipv6u' THEN 64 ELSE plen4 END
      |           + CASE WHEN rib='vpnv4u' THEN 64 ELSE 0 END
      |           + CASE WHEN rib IN ('ipv4lu','vpnv4u') THEN 24 ELSE 0 END
      |         END AS key_len,
      |    COALESCE(CASE WHEN rib='ipv6u' THEN 8193*281474976710656 + o2*65536 + o3
      |         WHEN rib='ipv4m' THEN 3758096384 + o2*65536 + o3*256 + o4
      |         WHEN rib='mvpn' THEN 167772160 + o2*65536 + o3*256 + eid%100
      |         WHEN rib='evpn' THEN 167772160 + o2*65536 + o3*256 + eid%50
      |         WHEN rib='l2vpls' THEN (1+uid%5)*1000000 + (eid%4)*10*1000 + (eid%4)*10+9
      |         ELSE 167772160 + o2*65536 + o3*256 + o4 END, 0) AS keyip,
      |    CASE WHEN rib='mvpn' THEN slot%8 WHEN rib='evpn' THEN 2+eid%2 END AS keyx2
      |  FROM re0
      |)
      |""".stripMargin

  private def perRibSql(where: String): String =
    cte + s"SELECT rib, COUNT(*) AS n FROM re WHERE $where GROUP BY rib ORDER BY rib"

  private val v4PfxRibs = "rib IN ('ipv4u','vpnv4u','ipv4lu')"

  /** Full history-ring key for window partitioning, as scalar columns. */
  private val keyExpr =
    "rib, keyip, keyx2, plen, rdh, rdl, label, session_id, path_id"

  def oracleSql: Map[String, String] = Map(
    "q_rib_filter_subnet" -> perRibSql(
      s"($v4PfxRibs OR rib IN ('mvpn','evpn')) AND o2 BETWEEN 4 AND 7"),
    "q_rib_filter_rd" -> perRibSql("rib='vpnv4u' AND uid%3=1 AND eid%2=0"),
    "q_rib_filter_num" -> perRibSql(
      s"(($v4PfxRibs OR rib='ipv4m') AND plen4=24) OR (rib='l2vpls' AND eid%4=2)"),
    "q_rib_filter_aspath" -> perRibSql("eid%5=0"),
    "q_rib_filter_aspath_ends" -> perRibSql("uid%7=0 AND eid%2=0"),
    "q_rib_filter_community" -> perRibSql("eid%50=25"),
    "q_rib_filter_rt" -> perRibSql("uid%4=2 AND eid%5=1"),
    "q_rib_filter_rt_num" -> perRibSql("uid%4=3"),
    "q_rib_filter_nh" -> perRibSql("uid%4=2"),
    "q_rib_filter_regex" -> perRibSql(s"$v4PfxRibs AND o2=3"),
    "q_rib_filter_polarity" -> perRibSql(
      s"($v4PfxRibs OR rib IN ('mvpn','evpn')) AND o2 BETWEEN 4 AND 7 AND eid%50<>25"),
    "q_rib_filter_conj" ->
      perRibSql("rib='vpnv4u' AND uid%3=1 AND eid%2=0 AND o2 BETWEEN 4 AND 7"),
    "q_rib_filter_multicast" -> perRibSql("rib='ipv4m' AND o2>=8"),
    "q_rib_filter_v6" -> perRibSql("rib='ipv6u' AND o2=10"),
    // mvpn T5 group 224.(slot%8).o3.0 matched by the MCV4 net term via the
    // multi() majority (source → Unknown, group → Yes/No); ipv4m prefixes
    // match by plain containment
    "q_rib_filter_mvpn_group" -> perRibSql(
      "(rib='mvpn' AND slot%8=3) OR (rib='ipv4m' AND o2=3)"),
    "q_rib_filter_rd_exotic" -> perRibSql("rib='mvpn' AND uid%2=1 AND eid%4=2"),
    // probe 10.3.9.50 = 167971122; route contains probe ⟺ equal nets at
    // the route's prefix length (route ips are canonical network addresses)
    "q_rib_supernet" -> perRibSql(
      s"($v4PfxRibs OR rib='ipv4m') AND (167971122>>(32-plen4)) = (ip>>(32-plen4))"),

    "q_rib_current" -> (cte +
      s"""SELECT rib, COUNT(*) AS n FROM (
         |  SELECT rib, active,
         |    ROW_NUMBER() OVER (PARTITION BY $keyExpr ORDER BY ts DESC, eid DESC) AS rn
         |  FROM re) t WHERE rn=1 AND active GROUP BY rib ORDER BY rib""".stripMargin),
    "q_rib_retention" -> (cte +
      s"""SELECT rib, COUNT(*) AS n FROM (
         |  SELECT rib,
         |    ROW_NUMBER() OVER (PARTITION BY $keyExpr ORDER BY ts DESC, eid DESC) AS rn
         |  FROM re) t WHERE rn<=2 GROUP BY rib ORDER BY rib""".stripMargin),
    "q_rib_onlydiffer" -> (cte +
      s"""SELECT rib, COUNT(*) AS n FROM (
         |  SELECT rib, attrs_hash, active,
         |    LAG(attrs_hash) OVER (PARTITION BY $keyExpr ORDER BY ts, eid) AS ph,
         |    LAG(active) OVER (PARTITION BY $keyExpr ORDER BY ts, eid) AS pa
         |  FROM re) t
         |WHERE ph IS NULL OR ph<>attrs_hash OR pa<>active GROUP BY rib ORDER BY rib""".stripMargin),
    "q_rib_response_filter" -> perRibSql(
      "active AND epoch_ms(ts) > 1704844800000 AND epoch_ms(ts) < 1705708800000"),
    "q_rib_exists" -> (cte +
      s"""SELECT rib, COUNT(*) AS n FROM (
         |  SELECT rib, MAX(CASE WHEN rn > nall-2 AND c1b=25 THEN 1 ELSE 0 END) AS m
         |  FROM (
         |    SELECT $keyExpr, c1b,
         |      ROW_NUMBER() OVER (PARTITION BY $keyExpr ORDER BY ts, eid) AS rn,
         |      COUNT(*) OVER (PARTITION BY $keyExpr) AS nall
         |    FROM re) t
         |  GROUP BY $keyExpr) g
         |WHERE m=1 GROUP BY rib ORDER BY rib""".stripMargin),

    "q_rib_statistics" -> (cte +
      """SELECT rib, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
        |  CAST(SUM(CASE WHEN active THEN 0 ELSE 1 END) AS BIGINT) AS n_withdraws,
        |  COUNT(DISTINCT attrs_hash) AS n_attrs
        |FROM re GROUP BY rib ORDER BY rib""".stripMargin),
    "q_rib_stores" -> (cte +
      """SELECT
        |  COUNT(DISTINCT (eid%5)*100+(uid%7)*10+(eid%2)) AS pathes,
        |  COUNT(DISTINCT (eid%50)*100+(uid%10)) AS comms,
        |  COUNT(DISTINCT eid%5) AS lcomms,
        |  COUNT(DISTINCT (uid%4)*10+(eid%5)) AS extcomms,
        |  COUNT(DISTINCT attrs_hash) AS attrs
        |FROM re""".stripMargin),
    "q_rib_sessions" -> (cte +
      """SELECT CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT rib) AS n_ribs
        |FROM re GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_rib_found" -> (cte +
      """SELECT
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT rib, keyip, keyx2, plen, rdh, rdl, label,
        |     session_id, path_id FROM re WHERE c1b=25) a) AS found,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT rib, keyip, keyx2, plen, rdh, rdl, label,
        |     session_id, path_id FROM re) b) AS length""".stripMargin),

    "q_rib_lpm" -> (cte +
      """, keys AS (
        |  SELECT DISTINCT rib, ip, plen4, keyip, plen, rdh, rdl, label, session_id,
        |    path_id, key_len
        |  FROM re WHERE rib IN ('ipv4u','vpnv4u','ipv4lu','ipv4m')
        |), probes AS (
        |  SELECT * FROM (VALUES ('10.3.9.50', 167971122), ('10.0.9.77', 167774541),
        |    ('224.2.9.200', 3758229960)) v(probe, probe_ip)
        |)
        |SELECT probe, MAX(key_len) AS best_len, COUNT(*) AS n_keys
        |FROM keys JOIN probes ON (probe_ip>>(32-plen4)) = (ip>>(32-plen4))
        |GROUP BY probe ORDER BY probe""".stripMargin),
    "q_rib_supernet_topk" -> (cte +
      """SELECT rib, prefix_str, CAST(key_len AS BIGINT) AS key_len,
        |  rdh, rdl, CAST(label AS BIGINT) AS label,
        |  CAST(session_id AS BIGINT) AS session_id, path_id
        |FROM (SELECT DISTINCT rib, prefix_str, key_len, ip, plen4, rdh, rdl, label,
        |        session_id, path_id
        |      FROM re WHERE rib IN ('ipv4u','vpnv4u','ipv4lu','ipv4m')
        AND (ip>>(32-plen4)) = (167971122>>(32-plen4))) t
        |ORDER BY key_len DESC, ip, plen4, rdh NULLS FIRST, rdl NULLS FIRST,
        |  label NULLS FIRST, session_id, path_id
        |LIMIT 25""".stripMargin),
    "q_rib_pagination" -> (cte +
      """SELECT prefix_str, rdh, rdl, CAST(label AS BIGINT) AS label,
        |  CAST(session_id AS BIGINT) AS session_id, path_id
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY ip, plen4, rdh NULLS FIRST,
        |    rdl NULLS FIRST, label NULLS FIRST, session_id, path_id) AS rn
        |  FROM (SELECT DISTINCT rib, prefix_str, ip, plen4, rdh, rdl, label,
        |          session_id, path_id
        |        FROM re WHERE rib IN ('ipv4u','vpnv4u','ipv4lu')) k) t
        |WHERE rn > 20 AND rn <= 40 ORDER BY rn""".stripMargin),
    "q_rib_snapshot" -> perRibSql("TRUE"),
    "q_ingest_decompose" ->
      """WITH m AS (
        |  SELECT event_id AS eid, user_id AS uid FROM events
        |), rows_out AS (
        |  SELECT 'ipv4u' AS rib, TRUE AS active,
        |    '10.'||CAST((eid+0)%64 AS VARCHAR)||'.'||CAST(uid%256 AS VARCHAR)||'.0/24' AS p
        |  FROM m
        |  UNION ALL
        |  SELECT 'ipv4u', TRUE,
        |    '10.'||CAST((eid+1)%64 AS VARCHAR)||'.'||CAST(uid%256 AS VARCHAR)||'.0/24'
        |  FROM m WHERE eid%2=1
        |  UNION ALL
        |  SELECT 'ipv4u', FALSE,
        |    '10.'||CAST((eid+2)%64 AS VARCHAR)||'.'||CAST(uid%256 AS VARCHAR)||'.0/24'
        |  FROM m WHERE eid%3=0
        |  UNION ALL
        |  SELECT 'ipv6u', TRUE,
        |    '2001:0:0:'||printf('%x', eid%64)||':0:0:0:0/64'
        |  FROM m WHERE eid%4=0
        |)
        |SELECT rib, active, COUNT(*) AS n, COUNT(DISTINCT p) AS n_prefixes
        |FROM rows_out GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
}
