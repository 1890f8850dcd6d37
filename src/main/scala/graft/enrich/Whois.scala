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
}
