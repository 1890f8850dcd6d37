package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whois/DNS enrichment as cache tables + joins (reference:
  * src/whoissvc.rs:206-609 — whois referral chase, reverse-DNS PTR, and a
  * sled-backed TTL cache with refresh-ahead).
  *
  * Engine shape: external lookups happen OUTSIDE the engine (an adapter
  * appends (key, value, fetched_at) rows to a cache table); queries
  * LEFT-JOIN the cache and treat entries older than the TTL as misses —
  * the misses list is exactly the refresh work queue. The fetcher is an
  * injectable function so tests (and this zero-egress environment) use a
  * deterministic stub (src/whoissvc.rs:395-457 would be the real one).
  */
object Whois {

  /** Cache-table schema: kind ∈ {whois, dns}, key = query string. */
  def emptyCache(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("kind", StringType), StructField("key", StringType),
        StructField("value", StringType), StructField("fetched_at", TimestampType))))
  }

  /** Deterministic stub fetcher standing in for the whois referral chase:
    * AS<asn> → "AS<asn>-ORG-<asn%2>" (the reference's comment-stripping and
    * object-type matching are parse concerns of the real adapter,
    * src/whoissvc.rs:491-519). */
  def stubWhoisValue(asn: Column): Column =
    concat(lit("AS"), asn.cast("string"), lit("-ORG-"), (asn % 2).cast("string"))

  /** Serve-from-cache with TTL (src/whoissvc.rs:302-329): rows joined
    * against a fresh-enough cache; `hit` false = needs (re)fetch. */
  def lookup(rows: DataFrame, cache: DataFrame, kind: String, keyCol: Column,
      nowMs: Long, ttlSeconds: Long): DataFrame = {
    val fresh = cache.where(col("kind") === kind &&
      unix_millis(col("fetched_at")) > nowMs - ttlSeconds * 1000)
    rows.join(broadcast(fresh.select(col("key"), col("value"))),
        keyCol === col("key"), "left")
      .withColumn("hit", col("value").isNotNull)
  }

  /** Enrich route events with origin-AS whois org: key = last ASN of the
    * AS path (the origin AS), value via cache or stub fetch. */
  def enrichOriginAs(routeEvents: DataFrame): DataFrame = {
    val originAs = element_at(col("attrs.as_list"), -1)
    routeEvents
      .withColumn("origin_as", originAs)
      .withColumn("whois_org",
        when(col("origin_as").isNotNull, stubWhoisValue(col("origin_as"))))
  }

  // --- E4: response post-processing + referral chase (pure adapter logic,
  // reference src/whoissvc.rs:395-519; network fetch stays injected) -------

  /** Referral server names embedded in a whois response
    * (reference regex, src/whoissvc.rs:400-402). */
  private val ReferralRe = """\b(whois\.[\.a-z0-9\-]+)\b""".r

  /** Drop empty lines and `%` comment lines (src/whoissvc.rs:491-503). */
  def filteroutComments(s: String): Seq[String] =
    s.split('\n').toSeq.filter(l => l.nonEmpty && l.head != '%')

  /** Object-type line filter (src/whoissvc.rs:504-519): with no pattern,
    * comment filtering only; with a pattern, additionally drop `#` comments
    * and everything BEFORE the first matching line (the match and all
    * following lines are kept — reference `skip_while`). */
  def findstr(s: String, tofind: Option[scala.util.matching.Regex]): Seq[String] =
    tofind match {
      case None => filteroutComments(s)
      case Some(re) =>
        s.split('\n').toSeq
          .filter(l => l.nonEmpty && l.head != '%' && l.head != '#')
          .dropWhile(l => re.findFirstIn(l).isEmpty)
    }

  def referralServers(s: String): Seq[String] =
    ReferralRe.findAllMatchIn(s).map(_.group(1)).toSeq.distinct

  /** Referral chase (src/whoissvc.rs:395-457): query the default server,
    * then walk referred `whois.*` servers breadth-first with a depth budget.
    * A response SATISFIES the query when `checkitem` is absent or some line
    * passes [[findstr]]; otherwise its referrals are enqueued. Exhausted
    * referral set → the last response; exhausted depth → None (reference
    * `Search failed`); all referrals visited-and-spent → "" (reference
    * returns an empty string from the find-pending miss). `fetch` is the
    * injected lookup: (target, server-or-default) → response text. */
  def chaseWhois(target: String, checkitem: Option[scala.util.matching.Regex],
      fetch: (String, Option[String]) => String, maxDepth: Int = 16): Option[String] = {
    val pending = scala.collection.mutable.LinkedHashMap[String, Boolean]()
    var deep = maxDepth
    while (deep > 0) {
      deep -= 1
      val server: Option[String] =
        if (pending.isEmpty) None
        else pending.find(_._2) match {
          case None => return Some("")
          case Some((srv, _)) => pending(srv) = false; Some(srv)
        }
      val res = fetch(target, server)
      if (checkitem.isEmpty || findstr(res, checkitem).nonEmpty) return Some(res)
      referralServers(res).foreach(srv =>
        if (!pending.contains(srv)) pending(srv) = true)
      if (pending.isEmpty) return Some(res)
    }
    None
  }

  // --- E1 config surface: the whois-rust server map ----------------------

  /** One routed whois server: `host` plus the query template sent to it
    * (`$addr` substitutes the lookup target; bare-string map entries get
    * the crate's default template `"$addr\r\n"`). */
  final case class WhoisServer(host: String, query: String) {
    def queryString(target: String): String =
      query.replace("$addr", target)
  }

  /** The parsed `whois.json` routing map: domain-SUFFIX keys → server,
    * `""` the default, and the `_`/`ip` special entry for address
    * targets. */
  final case class WhoisServerMap(suffixes: Map[String, WhoisServer],
      default: Option[WhoisServer], ip: Option[WhoisServer]) {

    /** Initial-server election for `target` (the routing the reference
      * delegates to the whois-rust crate): an address literal (a REAL
      * v4/v6 parse, matching the crate's `IpAddr::from_str` validation —
      * `999.999.999.999` or `host:port` are NOT addresses and take the
      * suffix walk) routes to the `_`.`ip` entry; a domain walks its
      * suffixes LONGEST-FIRST (`a.b.org` tries `a.b.org`, `b.org`,
      * `org`) against the map, falling back to the `""` default.
      * None = no route (the reference's invalid-query response). */
    def serverFor(target: String): Option[WhoisServer] = {
      val t = target.trim.toLowerCase
      if (WhoisServerMap.isIpLiteral(t)) ip.orElse(default)
      else {
        val labels = t.split('.').toSeq
        labels.indices
          .flatMap(i => suffixes.get(labels.drop(i).mkString(".")))
          .headOption.orElse(default)
      }
    }
  }

  object WhoisServerMap {
    private val V4 = """([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})""".r

    /** Strict address-literal test matching whois-rust's
      * `IpAddr::from_str` gate: dotted quads must have every octet
      * ≤ 255; colon-bearing strings must be a parseable v6 literal
      * (so `host:port` falls through to the domain path). */
    def isIpLiteral(t: String): Boolean = t match {
      case V4(a, b, c, d) =>
        Seq(a, b, c, d).forall(o => o.toInt <= 255 && (o == "0" || !o.startsWith("0")))
      case _ if t.contains(':') =>
        // v6 literal: hex groups / '::' only — java's getByName would
        // resolve hostnames, so gate on the character set first
        t.forall(ch => ch == ':' || ch == '.' ||
          (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f')) &&
        (try {
          java.net.InetAddress.getByName(t).isInstanceOf[java.net.Inet6Address]
        } catch { case _: Exception => false })
      case _ => false
    }
  }

  /** Parse the whois-rust `whois.json` server map — the file the
    * reference's `whoisjsonconfig` key points at (loaded via
    * `WhoIs::from_path`, src/config.rs:596-604; the shipped map routes
    * `org` → whois.pir.org, default → whois.ripe.net, and IP targets →
    * whois.arin.net with the `n + $addr` ARIN query form). Map values
    * are either a bare host string or an object `{host, query}`;
    * absent `query` means the crate's default `"$addr\r\n"` template.
    * Unknown `_` sub-entries beyond `ip` are ignored (the crate only
    * consults `ip`). */
  def parseServerMap(json: String): WhoisServerMap = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = mapper.readTree(json)
    def server(n: com.fasterxml.jackson.databind.JsonNode): Option[WhoisServer] =
      if (n == null || n.isNull) None
      else if (n.isTextual) Some(WhoisServer(n.asText, "$addr\r\n"))
      else if (n.isObject && n.hasNonNull("host"))
        Some(WhoisServer(n.get("host").asText,
          if (n.hasNonNull("query")) n.get("query").asText else "$addr\r\n"))
      else None
    val fields = root.properties().iterator()
    val suffixes = Map.newBuilder[String, WhoisServer]
    var default: Option[WhoisServer] = None
    var ip: Option[WhoisServer] = None
    while (fields.hasNext) {
      val e = fields.next()
      e.getKey match {
        case ""  => default = server(e.getValue)
        case "_" => ip = server(e.getValue.get("ip"))
        case k   => server(e.getValue).foreach(s =>
          suffixes += k.toLowerCase -> s)
      }
    }
    WhoisServerMap(suffixes.result(), default, ip)
  }

  /** [[parseServerMap]] over a file path — the engine-side consumer of
    * the config's `whoisjsonconfig` value. */
  def loadServerMap(path: String): WhoisServerMap =
    parseServerMap(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** [[chaseWhois]] with the initial server elected from a parsed
    * [[WhoisServerMap]] (closing the config loop: the reference parses
    * `whoisjsonconfig` and routes the FIRST query through the map; the
    * referral walk after that is [[chaseWhois]]'s own). `fetch` here is
    * (query-string, server-host) → response. The elected entry's query
    * template applies ONLY to the initial hop: whois-rust builds
    * referral servers via `WhoIsServerValue::from_string`, which carries
    * no query, so every referral hop gets the crate's default
    * `"$addr\r\n"` form (an ARIN `n + $addr` template must NOT be sent
    * to a referred RIPE server). None = no route for the target (the
    * reference's `Invalid WHOIS query`). */
  def chaseWhoisWithMap(target: String,
      checkitem: Option[scala.util.matching.Regex], map: WhoisServerMap,
      fetch: (String, String) => String, maxDepth: Int = 16)
      : Option[String] =
    map.serverFor(target).flatMap { srv =>
      chaseWhois(target, checkitem,
        (t, serverOpt) => serverOpt match {
          case None         => fetch(srv.queryString(t), srv.host)
          case Some(refSrv) => fetch(s"$t\r\n", refSrv)
        },
        maxDepth)
    }

  /** Reverse-DNS query name (src/whoissvc.rs:251-301): v4 →
    * `d.c.b.a.IN-ADDR.ARPA.`, v6 → nibble-reversed `ip6.arpa.` form. */
  def ptrQueryName(target: String): Option[String] = {
    val V4 = """([0-9]+)\.([0-9]+)\.([0-9]+)\.([0-9]+)""".r
    V4.findFirstMatchIn(target) match {
      case Some(m) =>
        Some(s"${m.group(4)}.${m.group(3)}.${m.group(2)}.${m.group(1)}.IN-ADDR.ARPA.")
      case None if target.contains(':') =>
        // literal v6 parse only — no resolution happens for literal IPs
        try {
          val addr = java.net.InetAddress.getByName(target)
          addr match {
            case v6: java.net.Inet6Address =>
              val sb = new StringBuilder
              v6.getAddress.reverseIterator.foreach { o =>
                sb.append(f"${o & 0xf}%x.${(o >> 4) & 0xf}%x.")
              }
              Some(sb.append("ip6.arpa.").toString)
            case _ => None
          }
        } catch { case _: Exception => None }
      case None => None
    }
  }
}
