package graft.sources

/** The reference's INI configuration surface (src/config.rs — the whole
  * file), pure and engine-mapped: a user's existing `bgpexplorer.ini`
  * parses into typed settings that plug straight into this engine —
  * `ProtoPeer.sessionOpen` feeds `BgpSession`'s handshakes, `filterRd`
  * feeds `BgpWire.filterRd`, `historydepth`/`historymode` parameterize
  * `RibViews.retained`/`onlyDiffer`, `whoisCacheSecs` is the `enrich.Whois`
  * TTL, and `purgeEvery` is the `Feed.compact` cadence.
  *
  * QUIRKS KEPT VERBATIM (each cited):
  *   - mode/historymode parse only the first space-separated token
  *     (src/config.rs:391, 406);
  *   - a peer/protolisten value that is a bare IP gets the mode-dependent
  *     default port — 632 for BMP, 179 for BGP (src/config.rs:82-87,
  *     115-120); passive modes default protolisten to 0.0.0.0 with the
  *     same port rule (src/config.rs:125-136);
  *   - a MISSING `filter_rd` defaults to RD 0:0 — only a present,
  *     unparseable value is an error (src/config.rs:173-188);
  *   - `httptimeout`/whois timeouts fall back to their defaults on an
  *     unparseable value, while `historydepth`/`timeidx_granularity` make
  *     it a hard error (src/config.rs:455-462 vs 486-523);
  *   - unknown capability codes in a caps list are warned and skipped
  *     (src/config.rs:227); `addpath` in the list form add-paths ONLY the
  *     ipv4u family (src/config.rs:230-246);
  *   - invalid peer sections are skipped with a warning, and a config with
  *     no valid peers is an error (src/config.rs:422-436).
  */
object GraftConfig {
  import BgpSession.{Cap, Open}

  sealed trait PeerMode { def isBmp: Boolean; def isActive: Boolean }
  object PeerMode {
    case object BgpActive extends PeerMode { val isBmp = false; val isActive = true }
    case object BgpPassive extends PeerMode { val isBmp = false; val isActive = false }
    case object BmpActive extends PeerMode { val isBmp = true; val isActive = true }
    case object BmpPassive extends PeerMode { val isBmp = true; val isActive = false }

    /** src/config.rs:387-400 — first token only. */
    def parse(s: String): Either[String, PeerMode] =
      s.split(' ').head match {
        case "bgpactive" => Right(BgpActive)
        case "bgppassive" => Right(BgpPassive)
        case "bmpactive" => Right(BmpActive)
        case "bmppassive" => Right(BmpPassive)
        case _ => Left("invalid mode")
      }
  }

  sealed trait HistoryMode
  object HistoryMode {
    /** every update recorded, even duplicates */
    case object EveryUpdate extends HistoryMode
    /** record only when route attributes differ (`RibViews.onlyDiffer`) */
    case object OnlyDiffer extends HistoryMode
    def parse(s: String): Either[String, HistoryMode] = s.split(' ').head match {
      case "every" => Right(EveryUpdate)
      case "differ" => Right(OnlyDiffer)
      case _ => Left("invalid history mode")
    }
  }

  final case class HostPort(host: String, port: Int)

  /** One `[peer_X]` section (reference `ProtoPeer`, src/config.rs:32-41). */
  final case class ProtoPeer(routerId: Long, mode: PeerMode,
      peer: Option[HostPort], protoListen: Option[HostPort], peerAs: Long,
      filterRd: Option[(Long, Long)], caps: Vector[Cap],
      warnings: Vector[String]) {

    /** `def_caps` (src/config.rs:296-305): the configured caps with the
      * 4-octet-AS value replaced by OUR asn. */
    def defCaps(asn: Long): Vector[Cap] = caps.map {
      case Cap.FourOctetAs(_) => Cap.FourOctetAs(asn)
      case c => c
    }

    /** `get_session_params` (src/config.rs:306-327) mapped onto the
      * engine's OPEN: peer AS, hold 180, configured router-id and caps —
      * the input to `BgpSession.runPassive`/`runActive`. */
    def sessionOpen: Open =
      Open(peerAs, 180, routerId, defCaps(peerAs))
  }

  final case class SvcConfig(httpListen: HostPort, httpTimeout: Long,
      httpRoot: String, historyDepth: Int, historyMode: HistoryMode,
      timeidxGranularity: Long, purgeAfterWithdraws: Long,
      purgeEverySecs: Long, whoisJsonConfig: String, whoisDb: String,
      whoisDnses: Vector[HostPort], whoisRequestTimeout: Long,
      whoisCacheSecs: Long, snapshotFile: Option[String],
      snapshotEverySecs: Option[Long], peers: Vector[ProtoPeer],
      warnings: Vector[String])

  // ---------------------------------------------------------------- INI

  /** Minimal INI reader matching the reference's `ini!` semantics: `[name]`
    * sections, `key=value` entries, bare `key` lines map to a valueless
    * entry, `;`/`#` comment lines, section and key names lowercased. */
  def parseIni(text: String): Map[String, Map[String, Option[String]]] = {
    var section = ""
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, Option[String]]]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith(";") && !line.startsWith("#")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim.toLowerCase
          out.getOrElseUpdate(section,
            scala.collection.mutable.LinkedHashMap.empty)
        } else {
          val cur = out.getOrElseUpdate(section,
            scala.collection.mutable.LinkedHashMap.empty)
          line.indexOf('=') match {
            case -1 => cur(line.toLowerCase) = None
            case i => cur(line.substring(0, i).trim.toLowerCase) =
              Some(line.substring(i + 1).trim)
          }
        }
      }
    }
    // ListMap both levels: section order is meaningful to the config
    // surface (the peers vector follows file order), and a plain .toMap
    // would silently reorder past 4 entries
    scala.collection.immutable.ListMap.from(out.iterator.map {
      case (k, v) => k -> (scala.collection.immutable.ListMap.from(v): Map[String, Option[String]])
    })
  }

  // ------------------------------------------------------------- helpers

  /** The reference parses these fields as SocketAddr/IpAddr — IP literals
    * only, no hostnames (src/config.rs:72-90, 620-630). */
  private def looksLikeIp(h: String): Boolean =
    v4ToLong(h).isDefined ||
      (h.contains(':') && h.nonEmpty &&
        h.forall(c => "0123456789abcdefABCDEF:.".indexOf(c.toInt) >= 0))

  private def parseHostPort(s: String, defaultPort: Int): Option[HostPort] = {
    // "ip:port" (v4) | "[v6]:port" | bare IP → default port
    val t = s.trim
    val hp =
      if (t.isEmpty) None
      else if (t.startsWith("[")) t.indexOf("]:") match {
        case -1 if t.endsWith("]") =>
          Some(HostPort(t.substring(1, t.length - 1), defaultPort))
        case -1 => None
        case i => t.substring(i + 2).toIntOption.map(p =>
          HostPort(t.substring(1, i), p))
      } else t.lastIndexOf(':') match {
        case -1 => Some(HostPort(t, defaultPort))
        // a second colon means a bare v6 address, not host:port
        case i if t.indexOf(':') != i => Some(HostPort(t, defaultPort))
        case i => t.substring(i + 1).toIntOption match {
          case Some(p) => Some(HostPort(t.substring(0, i), p))
          case None => None
        }
      }
    hp.filter(h => looksLikeIp(h.host))
  }

  private def v4ToLong(s: String): Option[Long] = {
    val parts = s.trim.split('.')
    if (parts.length != 4) None
    else {
      val octets = parts.map(_.toIntOption)
      if (octets.exists(o => o.isEmpty || o.get < 0 || o.get > 255)) None
      else Some(octets.map(_.get.toLong).reduce((a, b) => (a << 8) | b))
    }
  }

  /** `A:B` / `A.B.C.D:n` route distinguishers → (rdh, rdl), the X6 parse
    * the filter grammar uses. */
  private def parseRd(s: String): Option[(Long, Long)] = {
    val i = s.lastIndexOf(':')
    if (i < 0) None
    else {
      val left = s.substring(0, i); val right = s.substring(i + 1)
      right.toLongOption.flatMap { rdl =>
        left.toLongOption.map(rdh => (rdh, rdl))
          .orElse(v4ToLong(left).map(rdh => (rdh, rdl)))
      }
    }
  }

  /** The capability-name registry of the caps list (src/config.rs:212-226)
    * expressed in the engine's Cap model (MDT SAFI 66, FlowSpec 133/134,
    * VPLS/EVPN under AFI 25). */
  private val capNames: Map[String, Cap] = Map(
    "ipv4u" -> Cap.Mp(1, 1), "ipv4lu" -> Cap.Mp(1, 4),
    "vpnv4u" -> Cap.Mp(1, 128), "vpnv4m" -> Cap.Mp(1, 129),
    "ipv4mdt" -> Cap.Mp(1, 66), "mvpn" -> Cap.Mp(1, 5),
    "vpls" -> Cap.Mp(25, 65), "evpn" -> Cap.Mp(25, 70),
    "ipv6u" -> Cap.Mp(2, 1), "ipv6lu" -> Cap.Mp(2, 4),
    "vpnv6u" -> Cap.Mp(2, 128), "vpnv6m" -> Cap.Mp(2, 129),
    "ipv6mdt" -> Cap.Mp(2, 66), "asn32" -> Cap.FourOctetAs(0L))

  /** RFC 7911 ADD-PATH capability (code 69) over the given families,
    * send+receive, as wire bytes — the reference's CapAddPath. */
  def addPathCap(families: Seq[(Int, Int)]): Cap = {
    val body = Vector.newBuilder[Byte]
    families.foreach { case (afi, safi) =>
      body += (afi >> 8).toByte += afi.toByte += safi.toByte += 3.toByte
    }
    Cap.Unknown(69, body.result())
  }

  /** `all_caps` (src/config.rs:267-295): every family the reference
    * announces by default, incl. FlowSpec and the 6-family ADD-PATH. */
  def allCaps(asn: Long): Vector[Cap] = Vector(
    Cap.Mp(1, 1), Cap.Mp(1, 133), Cap.Mp(1, 134), Cap.Mp(1, 2),
    Cap.Mp(1, 4), Cap.Mp(2, 4), Cap.Mp(2, 133), Cap.Mp(1, 128),
    Cap.Mp(1, 129), Cap.Mp(2, 128), Cap.Mp(2, 129), Cap.Mp(1, 5),
    Cap.Mp(25, 65), Cap.Mp(25, 70), Cap.Mp(1, 66), Cap.Mp(2, 66),
    Cap.FourOctetAs(asn),
    addPathCap(Seq((1, 1), (1, 4), (2, 1), (2, 4), (1, 128), (2, 128))))

  // -------------------------------------------------------------- peers

  /** One peer section (reference `ProtoPeer::from_ini`,
    * src/config.rs:49-263). */
  def peerFromIni(section: Map[String, Option[String]]):
      Either[String, ProtoPeer] = {
    def key(k: String): Option[Option[String]] = section.get(k)
    val warnings = Vector.newBuilder[String]
    for {
      modeStr <- key("mode")
        .toRight("Missing value 'mode'")
        .flatMap(_.toRight(
          "No mode (bgpactive|bgppassive|bmpactive|bmppassive) specified"))
      mode <- PeerMode.parse(modeStr)
      defPort = if (mode.isBmp) 632 else 179
      peer <- key("peer") match {
        case Some(Some(s)) =>
          parseHostPort(s, defPort).map(Some(_))
            .toRight("invalid peer was specified")
        case Some(None) => Left("invalid peer was specified")
        case None if mode.isActive => Left("peer was not specified")
        case None => Right(None)
      }
      listen <- key("protolisten") match {
        case Some(Some(s)) =>
          parseHostPort(s, if (mode == PeerMode.BmpPassive) 632 else 179)
            .map(Some(_)).toRight("invalid protolisten was specified")
        case Some(None) => Left("invalid protolisten was specified")
        case None if !mode.isActive =>
          Right(Some(HostPort("0.0.0.0",
            if (mode == PeerMode.BmpPassive) 632 else 179)))
        case None => Right(None)
      }
      routerId <- key("routerid") match {
        case Some(Some(s)) => v4ToLong(s).toRight(s"Invalid routerid - $s")
        case Some(None) => Left("invalid routerid was specified")
        case None => Right((1L << 24) | (1L << 16) | (1L << 8) | 1L) // 1.1.1.1
      }
      peerAs <- key("peeras") match {
        case Some(Some(s)) => s.toLongOption.toRight(s"Invalid bgp peer as - $s")
        case Some(None) => Left("invalid bgppeeras was specified")
        case None => Right(0L)
      }
      filterRd <- key("filter_rd") match {
        case Some(Some(s)) => parseRd(s).map(Some(_))
          .toRight(s"Invalid bmp filter_rd - $s")
        case Some(None) => Right(None)
        case None => Right(Some((0L, 0L))) // the missing-key default quirk
      }
    } yield {
      val caps: Vector[Cap] = key("caps").flatten.map(_.trim) match {
        case None | Some("all") => allCaps(0L)
        case Some("") | Some("min") | Some("minimal") => Vector(
          if (peer.exists(_.host.contains(':'))) Cap.Mp(2, 1) else Cap.Mp(1, 1),
          Cap.FourOctetAs(0L))
        case Some(list) =>
          val named = Vector.newBuilder[Cap]
          var addpath = false
          list.split(',').map(_.trim).foreach {
            case "addpath" => addpath = true
            case name => capNames.get(name) match {
              case Some(c) => named += c
              case None => warnings += s"Unknown capability code: $name"
            }
          }
          val base = named.result()
          // the reference add-paths only ipv4u in the list branch
          if (addpath && base.contains(Cap.Mp(1, 1)))
            base :+ addPathCap(Seq((1, 1)))
          else if (addpath) base :+ addPathCap(Nil)
          else base
      }
      ProtoPeer(routerId, mode, peer, listen, peerAs, filterRd, caps,
        warnings.result())
    }
  }

  // ---------------------------------------------------------------- main

  def fromIniText(text: String): Either[String, SvcConfig] = {
    val ini = parseIni(text)
    if (!ini.contains("main")) Left("Missing section 'main' in ini file")
    else {
      val main = ini("main")
      val warnings = Vector.newBuilder[String]
      val peers = ini.iterator.filter(_._1 != "main").flatMap { case (name, sec) =>
        peerFromIni(sec) match {
          case Right(p) => Some(p)
          case Left(e) => warnings += s"Peer $name error: $e"; None
        }
      }.toVector
      def softLong(k: String, dflt: Long): Long =
        main.get(k).flatten.flatMap(_.toLongOption).getOrElse(dflt)
      def hardLong(k: String, dflt: Long): Either[String, Long] =
        main.get(k) match {
          case None => Right(dflt)
          case Some(v) => v.flatMap(_.toLongOption)
            .toRight(s"invalid $k was specified")
        }
      for {
        _ <- if (peers.isEmpty) Left("No valid peers or listens specified")
          else Right(())
        httpListen <- parseHostPort(
          main.get("httplisten").flatten.getOrElse("0.0.0.0:8080"), 8080)
          .toRight("Invalid httplisten")
        granularity <- hardLong("timeidx_granularity", 86400L)
        depth <- hardLong("historydepth", 10L)
        histMode <- main.get("historymode") match {
          case None => Right(HistoryMode.OnlyDiffer)
          case Some(v) => v.toRight("invalid historymode was specified")
            .flatMap(HistoryMode.parse)
        }
        purgeWd <- hardLong("purge_after_withdraws", 0L)
        purgeEvery <- hardLong("purge_every", 300L)
        whoisJson <- main.get("whoisjsonconfig").flatten
          .toRight("Invalid whoisjsonconfig")
      } yield {
        val dnses = main.get("whoisdns").flatten match {
          case None => Vector(HostPort("1.1.1.1", 53))
          case Some(s) =>
            val parsed = s.split(',').toVector.flatMap { d =>
              val hp = parseHostPort(d.trim, 53)
              if (hp.isEmpty) warnings += s"Invalid DNS: $d"
              hp
            }
            if (parsed.isEmpty) Vector(HostPort("1.1.1.1", 53)) else parsed
        }
        SvcConfig(
          httpListen = httpListen,
          httpTimeout = softLong("httptimeout", 120L),
          httpRoot = main.get("httproot").flatten.getOrElse("./contrib"),
          historyDepth = depth.toInt,
          historyMode = histMode,
          timeidxGranularity = granularity,
          purgeAfterWithdraws = purgeWd,
          purgeEverySecs = purgeEvery,
          whoisJsonConfig = whoisJson,
          whoisDb = main.get("whoisdb").flatten.getOrElse("whoiscache.db"),
          whoisDnses = dnses,
          whoisRequestTimeout = softLong("whois_request_timeout", 30L),
          whoisCacheSecs = softLong("whois_cache_seconds", 1800L),
          snapshotFile = main.get("snapshot").flatten,
          snapshotEverySecs = main.get("snapshot_every").map(v =>
            v.flatMap(_.toLongOption).getOrElse(43200L)),
          peers = peers,
          warnings = warnings.result() ++ peers.flatMap(_.warnings))
      }
    }
  }
}
