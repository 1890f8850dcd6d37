package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Schema-drift canary (VERDICT r8 item 3). The driver regenerates
  * `/root/testdata` between rounds and has already changed the physical
  * `ts` type once (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/NTZ), which broke
  * 18 tests and silently dropped 6 oracle queries. This spec pins the
  * normalized contract every operator depends on, so the NEXT silent
  * regeneration fails here with one named assertion instead of as a pile
  * of scattered DATATYPE_MISMATCH errors.
  *
  * Contract pinned:
  *   - every fixture table opens through `Tables` (the one normalization
  *     seam) and exposes the column set TESTDATA.md declares;
  *   - any `ts` column is session-TZ `TimestampType` after normalization,
  *     regardless of the physical parquet shape, and `unix_millis(ts)`
  *     both analyzes and returns plausible epoch values;
  *   - the columns the route-event derivation keys on keep their types.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"

  private val expectedCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey"),
    "part" -> Seq("p_partkey", "p_name"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_quantity", "l_shipdate"),
    "events" -> Seq("event_id", "user_id", "ts", "event_type"),
    "documents" -> Seq("doc_id", "text", "lang", "source"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  test("all fixture tables open through Tables with their declared columns") {
    expectedCols.foreach { case (name, cols) =>
      val have = Tables(spark, sf, name).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"$name: missing columns $missing (have $have)")
    }
  }

  test("ts normalizes to TimestampType and unix_millis works, every table") {
    expectedCols.keys.foreach { name =>
      val df = Tables(spark, sf, name)
      df.schema.fields.find(_.name == "ts").foreach { f =>
        assert(f.dataType == TimestampType,
          s"$name.ts: expected TimestampType after Tables normalization, " +
            s"got ${f.dataType} — the driver changed the fixture's physical " +
            "ts encoding; extend Tables.normalizeTs for the new shape")
        // analysis + value smoke: epoch-millis in a sane window (2000-2100)
        val ms = df.select(unix_millis(col("ts"))).na.drop().limit(1)
          .collect().headOption.map(_.getLong(0))
        ms.foreach { v =>
          assert(v > 946684800000L && v < 4102444800000L,
            s"$name.ts: unix_millis=$v outside 2000..2100 — normalization " +
              "is mis-scaling the epoch (nanos-vs-micros mix-up?)")
        }
      }
    }
  }

  test("derivation key columns keep their types") {
    val ev = Tables(spark, sf, "events")
    val byName = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("event_id") == LongType, s"event_id: ${byName("event_id")}")
    assert(byName("user_id") == LongType, s"user_id: ${byName("user_id")}")
    // the derivation and every downstream window keys on these; a driver-side
    // type change (e.g. int32 ids) would alter xxhash64 route/ring ids too
    val docs = Tables(spark, sf, "documents")
    val dt = docs.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(dt("text") == StringType, s"documents.text: ${dt("text")}")
    val emb = Tables(spark, sf, "embeddings")
    val vt = emb.schema.fields.find(_.name == "embedding").get.dataType
    assert(vt.isInstanceOf[ArrayType] &&
      vt.asInstanceOf[ArrayType].elementType == FloatType,
      s"embeddings.embedding: expected array<float>, got $vt")
  }
}
