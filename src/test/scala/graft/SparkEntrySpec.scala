package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the flagship query smoke-checks, every oracle
  * key has a matching query, and query names stay stable. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query inventory size") {
    // 71 oracle-checked + 4 rows-only entries (round 3); a drop means a
    // silently lost operator registration
    assert(SparkEntry.oracleSql.size >= 74)
    assert(SparkEntry.queries.size >= 78)
  }
}
