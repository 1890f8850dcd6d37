package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.model._

/** JSON contract goldens (FIXTURES.md §3): response shape, newest-first
  * maxdepth cap, onlyactive pruning, empty-subtree pruning, supernet
  * fallback ordering, found/length fields
  * (reference: src/bgpsvc.rs:493-707). */
class RibJsonSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val base = 1700000000000L

  private def ev(ts: Long, active: Boolean, hash: Long, sess: Int = 0,
      path: Long = 0L, pfx: IpPfx = Model.v4("10.0.0.0", 24)): RouteEvent =
    RouteEvent(new java.sql.Timestamp(ts), "ipv4u", sess, path, active,
      Some(pfx), Some(Model.pfxStr(pfx)), None, None, None, None, None, None,
      Model.emptyAttrs.copy(med = Some(hash)), hash)

  private def df(evs: Seq[RouteEvent]): DataFrame = {
    val s = spark
    import s.implicits._
    s.createDataset(evs).toDF()
  }

  test("items tree: nesting, newest-first, maxdepth cap") {
    val d = df(Seq(
      ev(base, active = true, 1L),
      ev(base + 1000, active = true, 2L),
      ev(base + 2000, active = true, 3L),
      ev(base + 500, active = true, 9L, sess = 1)))
    val (items, found, length) = RibJson.jsonPage(d, "ipv4u", "10.0.0.0/24",
      RibJson.RibParams(maxDepth = 2))
    val rows = items.collect()
    assert(found == 1 && length == 1)
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("item_key") == "10.0.0.0/24")
    val json = rows(0).getAs[String]("items_json")
    // sessions 0 and 1 present; session 0 capped to newest 2 entries
    assert(json.contains("\"" + (base + 2000) + "\""))
    assert(json.contains("\"" + (base + 1000) + "\""))
    assert(!json.contains("\"" + base + "\"")) // trimmed by maxdepth
    assert(json.contains("\"" + (base + 500) + "\"")) // session 1 untouched
    // newest-first within the history map
    assert(json.indexOf((base + 2000).toString) < json.indexOf((base + 1000).toString))
    // med survives as attr payload
    assert(json.contains("\"med\":3"))
  }

  test("onlyactive prunes entries and empty subtrees") {
    val d = df(Seq(
      ev(base, active = false, 1L),
      ev(base + 1000, active = false, 2L),
      ev(base + 500, active = true, 9L, sess = 1)))
    val (items, found, _) = RibJson.jsonPage(d, "ipv4u", "10.0.0.0/24",
      RibJson.RibParams(onlyActive = true))
    val rows = items.collect()
    assert(found == 1 && rows.length == 1)
    val json = rows(0).getAs[String]("items_json")
    assert(json.startsWith("{\"1\":{")) // session 0 entirely pruned
    assert(json.contains("\"" + (base + 500) + "\""))
  }

  test("empty page falls back to supernets, most-specific first") {
    val d = df(Seq(
      ev(base, active = true, 1L, pfx = Model.v4("10.0.0.0", 8)),
      ev(base, active = true, 2L, pfx = Model.v4("10.0.0.0", 16))))
    // host 10.0.0.77 not present → fallback lists containing supernets
    val (items, found, length) = RibJson.jsonPage(d, "ipv4u", "10.0.0.77",
      RibJson.RibParams())
    assert(found == 0 && length == 2)
    val keys = items.collect().map(_.getAs[String]("item_key")).toSeq
    assert(keys == Seq("10.0.0.0/16", "10.0.0.0/8") ||
      keys.toSet == Set("10.0.0.0/16", "10.0.0.0/8"))
  }

  test("full response document shape") {
    val d = df(Seq(ev(base, active = true, 1L)))
    val resp = RibJson.response(d, "ipv4u", "10.0.0.0/24",
      RibJson.RibParams(skip = 0, limit = 10, maxDepth = 3))
    assert(resp.startsWith("{\"ribtype\":\"ipv4u\",\"length\":1,\"skip\":0,"))
    assert(resp.contains("\"found\":1"))
    assert(resp.contains("\"items\":{\"10.0.0.0/24\":{"))
    assert(resp.contains("\"changed_after\":null"))
  }

  test("statistics json shape") {
    val d = df(Seq(ev(base, active = true, 1L), ev(base + 1, active = false, 2L)))
    val j = Statistics.statisticsJson(d)
    assert(j.contains("\"stores\":{"))
    assert(j.contains("\"ribs\":{\"ipv4u\":2}"))
    assert(j.contains("\"counters\":{\"updates\":1,\"withdraws\":1}"))
  }
}
