package graft.enrich

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** E1-E3 cache-table semantics: serve-from-cache within TTL, stale entries
  * are misses (the refresh queue), enrichment join shape
  * (reference: src/whoissvc.rs:302-329, 458-490). */
class WhoisSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val nowMs = 1700000000000L

  test("TTL cache: fresh hit, stale miss, absent miss") {
    val cache = Seq(
      ("whois", "AS100", "AS100-ORG-0", new java.sql.Timestamp(nowMs - 60 * 1000)),
      ("whois", "AS200", "AS200-ORG-0", new java.sql.Timestamp(nowMs - 3600 * 1000)),
      ("dns", "AS300", "ptr.example", new java.sql.Timestamp(nowMs - 60 * 1000)))
      .toDF("kind", "key", "value", "fetched_at")
    val rows = Seq("AS100", "AS200", "AS300").toDF("asn_key")
    val got = Whois.lookup(rows, cache, "whois", col("asn_key"),
      nowMs, ttlSeconds = 1800)
      .select("asn_key", "hit").collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map(
      "AS100" -> true, // fresh
      "AS200" -> false, // stale (older than TTL) → refresh queue
      "AS300" -> false)) // only in the dns cache, not whois
  }

  test("origin-AS enrichment derives the last ASN and a deterministic org") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    val enriched = Whois.enrichOriginAs(
      graft.sources.RouteEventGen.fromEvents(events))
    val row = enriched.where(col("event_id") === 1) // eid 1: odd → as_list ends 65001
      .select("origin_as", "whois_org").collect()(0)
    assert(row.getLong(0) == 65001L)
    assert(row.getString(1) == "AS65001-ORG-1")
  }
}
