package graft

import org.apache.spark.sql.SparkSession

import graft.server.{GraftServer, ServerRoutes}
import graft.sources.RouteEventGen
import graft.streaming.Feed

/** Standalone serving main — the engine end-to-end drivable the way the
  * reference binary is (src/main.rs:178-258: load config, start services,
  * bind the hyper listener): derive the event log from a testdata dir,
  * bind the embedded HTTP/WS server, serve until interrupted.
  *
  *   sbt "runMain graft.Serve /root/testdata/sf0.001 [port] [graft.ini]"
  *   curl localhost:<port>/api/ping
  *   curl 'localhost:<port>/api/json/ipv4u?filter=10.4.0.0/14&limit=5'
  *
  * The optional third argument is the reference binary's own .ini
  * (GraftConfig): its `whoisjsonconfig` map feeds the `/api/whois`
  * initial-server election (the r17 routing, Whois.loadServerMap), and
  * its `httplisten` port applies when no explicit port argument is
  * given — the same precedence the reference's CLI has.
  *
  * WS subscriptions run a real Structured Streaming query per client over
  * the materialized log directory (the log IS the bus): the initial dump
  * pushes the whole filtered log as event frames; a live deployment's
  * ingest query appending to the same directory feeds the same
  * subscribers incrementally with no server change.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cfg = if (args.length > 2) {
      graft.sources.GraftConfig.fromIniText(java.nio.file.Files
        .readString(java.nio.file.Paths.get(args(2)))) match {
        case Right(c) => Some(c)
        case Left(e) =>
          System.err.println(s"graft: config error: $e"); None
      }
    } else None
    val whoisMap = cfg.map(_.whoisJsonConfig).flatMap { p =>
      try Some(graft.enrich.Whois.loadServerMap(p))
      catch { case e: Exception =>
        System.err.println(s"graft: whoisjsonconfig unreadable: $e"); None }
    }
    val port =
      if (args.length > 1) args(1).toInt
      else cfg.map(_.httpListen.port).getOrElse(8080)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = RouteEventGen.routeEvents(spark, sfDir)
    val logDir = RouteEventGen.routeEventsDir(spark, sfDir)
    val schema = events.schema

    val routes = ServerRoutes(
      events = () => events,
      subscribe = (rib, filter, push) => {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "8").parquet(logDir)
        val q = Feed.subscribeJson(stream, rib, filter)(_.foreach(push)).start()
        () => q.stop()
      },
      whoisServers = whoisMap,
      // the config's whoisdns resolver pool feeds the wire-codec path;
      // the UDP datagram hop itself stays injectable (zero-egress
      // sandbox — a deployment supplies the one-socket-exchange lambda)
      dnsServers = cfg.map(_.whoisDnses.map(hp => s"${hp.host}:${hp.port}"))
        .getOrElse(Nil))
    val server = new GraftServer(routes, port = port)
    println(s"graft: serving $sfDir on http://127.0.0.1:${server.boundPort}")
    // serve until the JVM is interrupted (the acceptor is a daemon thread)
    Thread.currentThread.join()
  }
}
