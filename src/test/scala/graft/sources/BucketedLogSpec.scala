package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.RibViews

/** The bucketed event-log layout (SCALE.md): a log written with
  * bucketBy(ring_id) satisfies the hash distribution every ring-keyed
  * window needs, so history views plan WITHOUT any shuffle exchange —
  * and return exactly what the unbucketed path returns. */
class BucketedLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val sf = "/root/testdata/sf0.001"

  test("ring-keyed history views over the bucketed log are exchange-free") {
    val bucketed = RouteEventGen.bucketedRouteEvents(spark, sf)
    val cur = RibViews.current(bucketed)
    val plan = cur.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected no shuffle exchange over the bucketed log, got:\n$plan")
    // OnlyDiffer (lag) and retention (row_number) ride the same distribution
    val ret = RibViews.retained(bucketed, 2)
    assert(!ret.queryExecution.executedPlan.toString.contains("Exchange"))
    val od = RibViews.onlyDiffer(bucketed)
    assert(!od.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("a bucketed table name cannot be silently reused across source dirs") {
    RouteEventGen.bucketedRouteEvents(spark, sf, table = "bucketed_guard_spec")
    // same name, same dir: fine (idempotent reuse)
    RouteEventGen.bucketedRouteEvents(spark, sf, table = "bucketed_guard_spec")
    // same name, DIFFERENT dir: must refuse, not hand back stale data
    val e = intercept[IllegalArgumentException] {
      RouteEventGen.bucketedRouteEvents(spark, "/root/testdata/sf0.01",
        table = "bucketed_guard_spec")
    }
    assert(e.getMessage.contains("bucketed_guard_spec"))
  }

  test("bucketed and unbucketed paths agree") {
    val bucketed = RouteEventGen.bucketedRouteEvents(spark, sf)
    val plain = RouteEventGen.routeEvents(spark, sf)
    def rollup(df: org.apache.spark.sql.DataFrame) =
      RibViews.current(df).groupBy(col("rib")).count()
        .orderBy(col("rib")).collect().toSeq.map(_.toString)
    assert(rollup(bucketed) == rollup(plain))
    assert(bucketed.count() == plain.count())
  }
}
