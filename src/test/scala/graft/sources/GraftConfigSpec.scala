package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import BgpSession.{Cap, Open}
import GraftConfig._

/** The reference INI configuration surface (src/config.rs), quirks and
  * defaults pinned against a bgpexplorer.ini-shaped document. */
class GraftConfigSpec extends AnyFunSuite {

  private val ini = """
    |; bgpexplorer-shaped config
    |[main]
    |httplisten=0.0.0.0:8080
    |httptimeout=not_a_number
    |historydepth=50
    |historymode=differ extra_tokens_ignored
    |purge_every=60
    |whoisjsonconfig=whois.json
    |whois_cache_seconds=900
    |whoisdns=8.8.8.8, 9.9.9.9:5353, not an address
    |snapshot_every=bad
    |
    |[peer_router1]
    |mode=bgppassive
    |peeras=65001
    |
    |[peer_bmp]
    |mode=bmpactive
    |peer=10.0.0.9
    |routerid=10.255.0.1
    |peeras=70000
    |filter_rd=100:200
    |caps=ipv4u,vpnv4u,nonsense,addpath
    |
    |[peer_broken]
    |mode=bgpactive
    |""".stripMargin

  private lazy val cfg = fromIniText(ini).toOption.get

  test("main-section defaults, soft vs hard parse failures, dns list") {
    assert(cfg.httpListen == HostPort("0.0.0.0", 8080))
    // httptimeout: unparseable → silent default (src/config.rs:455-462)
    assert(cfg.httpTimeout == 120L)
    assert(cfg.historyDepth == 50)
    // first-token parse: "differ extra_tokens_ignored" → OnlyDiffer
    assert(cfg.historyMode == HistoryMode.OnlyDiffer)
    assert(cfg.purgeEverySecs == 60L)
    assert(cfg.whoisCacheSecs == 900L)
    assert(cfg.whoisDb == "whoiscache.db")
    assert(cfg.timeidxGranularity == 86400L)
    // present-but-bad snapshot_every → the unwrap_or default (43200)
    assert(cfg.snapshotEverySecs.contains(43200L))
    // dns entries: bare host gets :53, invalid skipped with a warning
    assert(cfg.whoisDnses ==
      Vector(HostPort("8.8.8.8", 53), HostPort("9.9.9.9", 5353)))
    assert(cfg.warnings.exists(_.startsWith("Invalid DNS")))
    // historydepth garbage is a HARD error (src/config.rs:506-523)
    val bad = fromIniText(ini.replace("historydepth=50", "historydepth=ten"))
    assert(bad == Left("invalid historydepth was specified"))
  }

  test("peer sections: defaults, mode port rule, filter_rd quirk, caps list") {
    // the broken peer (active mode without peer=) is skipped with a warning
    assert(cfg.peers.length == 2)
    assert(cfg.warnings.exists(w =>
      w.startsWith("Peer peer_broken") && w.contains("peer was not specified")))
    val passive = cfg.peers(0)
    assert(passive.mode == PeerMode.BgpPassive)
    // passive default listen 0.0.0.0:179; default routerid 1.1.1.1;
    // MISSING filter_rd defaults to RD 0:0 (src/config.rs:186-188)
    assert(passive.protoListen.contains(HostPort("0.0.0.0", 179)))
    assert(passive.routerId == ((1L << 24) | (1L << 16) | (1L << 8) | 1L))
    assert(passive.filterRd.contains((0L, 0L)))
    assert(passive.caps == allCaps(0L)) // missing caps key → all
    val bmp = cfg.peers(1)
    // bare-IP peer under bmpactive gets port 632 (src/config.rs:82-87)
    assert(bmp.peer.contains(HostPort("10.0.0.9", 632)))
    assert(bmp.filterRd.contains((100L, 200L)))
    // caps list: unknown name warned+skipped; addpath wraps ONLY ipv4u
    assert(bmp.caps == Vector(Cap.Mp(1, 1), Cap.Mp(1, 128),
      addPathCap(Seq((1, 1)))))
    assert(bmp.warnings == Vector("Unknown capability code: nonsense"))
  }

  test("sessionOpen feeds the handshake: hold 180, own-ASN 4-octet cap") {
    val bmp = cfg.peers(1)
    val o = bmp.sessionOpen
    assert(o == Open(70000L, 180, (10L << 24) | (255L << 16) | 1L,
      bmp.caps)) // no asn32 in this caps list → caps unchanged
    // defCaps swaps the 4-octet value for our ASN (src/config.rs:296-305)
    val withAsn32 = cfg.peers(0).defCaps(65001L)
    assert(withAsn32.collect { case Cap.FourOctetAs(a) => a } == Vector(65001L))
    // and the resulting Open encodes/decodes through the real codec
    val round = BgpSession.decodeOpenBody(
      BgpSession.encodeOpenBody(cfg.peers(0).sessionOpen.copy(asn = 65001L,
        caps = withAsn32)))
    assert(round.asn == 65001L && round.holdTime == 180)
  }

  test("minimal caps pick the peer's address family") {
    val v6 = peerFromIni(Map(
      "mode" -> Some("bgpactive"), "peer" -> Some("2001:db8::1"),
      "caps" -> Some("min"))).toOption.get
    assert(v6.caps == Vector(Cap.Mp(2, 1), Cap.FourOctetAs(0L)))
    assert(v6.peer.contains(HostPort("2001:db8::1", 179)))
    val v4 = peerFromIni(Map(
      "mode" -> Some("bgpactive"), "peer" -> Some("10.1.1.1:1790"),
      "caps" -> Some("min"))).toOption.get
    assert(v4.caps == Vector(Cap.Mp(1, 1), Cap.FourOctetAs(0L)))
    assert(v4.peer.contains(HostPort("10.1.1.1", 1790)))
  }

  test("parseIni keeps file order past 4 sections (peers vector follows the file)") {
    val ini = (1 to 8).map(i =>
      s"[peer_$i]\nmode=bgppassive\npeeras=${64500 + i}").mkString(
      "[main]\nhttplisten=127.0.0.1:8080\nwhoisjsonconfig=w.json\n", "\n", "")
    val parsed = GraftConfig.parseIni(ini)
    assert(parsed.keys.toVector ==
      "main" +: (1 to 8).map(i => s"peer_$i").toVector)
    // and the engine-level peers vector follows the same order
    val cfg = fromIniText(ini).toOption.get
    assert(cfg.peers.map(_.peerAs) == (1 to 8).map(i => 64500L + i).toVector)
  }

  test("config-level errors: missing main, no valid peers") {
    assert(fromIniText("[peer_x]\nmode=bgppassive")
      == Left("Missing section 'main' in ini file"))
    assert(fromIniText("[main]\nwhoisjsonconfig=w.json")
      == Left("No valid peers or listens specified"))
  }
}
