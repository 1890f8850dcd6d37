package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.tools.FixtureId

/** FixtureId is the SCALEBENCH staleness gate (VERDICT r10 item 4): a
  * rebuilt/regenerated fixture must fail the bench leg loudly. The spec
  * drives the full lifecycle on a copy of the sf0.001 fixture: pin →
  * clean check → tamper one table → check names the mismatch. */
class FixtureIdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val src = "/root/testdata/sf0.001"

  private def copyFixture(): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fixid")
    FixtureId.tables.foreach { t =>
      val d = spark.read.parquet(s"$src/$t.parquet")
      d.write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("fingerprint is order-independent and stable across rewrites") {
    val dir = copyFixture()
    val orig = FixtureId.fingerprint(spark, src)
    // the copy rewrote every table through Spark (different file layout,
    // different row order per file) — content identity must survive that
    assert(FixtureId.fingerprint(spark, dir.toString) == orig)
  }

  test("check: no pin -> pass; matching pin -> pass; tampered table -> loud fail") {
    val dir = copyFixture()
    assert(FixtureId.check(spark, dir.toString)._2.isEmpty, "no pin must pass")
    FixtureId.write(spark, dir.toString)
    assert(FixtureId.check(spark, dir.toString)._2.isEmpty, "fresh pin must pass")
    // tamper: drop half the documents (a regenerated-fixture stand-in)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .where("doc_id % 2 = 0").cache()
    docs.count()
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (_, err) = FixtureId.check(spark, dir.toString)
    assert(err.isDefined, "tampered fixture must fail the check")
    assert(err.get.contains("does not match"), err.get)
  }
}
