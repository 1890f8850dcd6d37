package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Content identity for a benchmark fixture directory (VERDICT r10 item 4):
  * SCALEBENCH pins silently go stale when `target/sf1` is rebuilt or the
  * driver regenerates /root/testdata — the numbers stay plausible but stop
  * being comparable. The fingerprint (per-table row count + bit_xor of
  * xxhash64 over all columns, read through `graft.queries.Tables` so both
  * shipped ts shapes of the same logical fixture hash identically) is
  * written as `FIXTURE_ID.json` at derive time (ScaleUp) and recomputed at
  * bench time: a mismatch fails the bench leg loudly instead of producing
  * incomparable numbers. Comparison is canonical-string equality — the
  * check needs no JSON parser and can't drift from the writer.
  *
  * xor (not sum) of row hashes: order-independent (the parquet row order
  * is a write artifact) and exact — two fixtures agree iff every table has
  * the same multiset of rows up to xor-collision (2^-64 per table). */
object FixtureId {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  val fileName = "FIXTURE_ID.json"

  /** Canonical JSON: {"table":[rows,hash],...} in fixed table order. */
  def fingerprint(spark: SparkSession, dir: String): String =
    tables.map { t =>
      val df = graft.queries.Tables(spark, dir, t)
      val cols = df.columns.sorted.map(c => s"`$c`").mkString(",")
      val row = df.agg(count(lit(1)).as("n"),
        expr(s"bit_xor(xxhash64(struct($cols)))").as("h")).head()
      val h = if (row.isNullAt(1)) 0L else row.getLong(1)
      s""""$t":[${row.getLong(0)},$h]"""
    }.mkString("{", ",", "}")

  def write(spark: SparkSession, dir: String): String = {
    val fp = fingerprint(spark, dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, fileName), (fp + "\n").getBytes("UTF-8"))
    fp
  }

  /** Pin an EXISTING fixture directory in place (the ScaleUp path pins at
    * derive time; this is for a fixture already on disk). */
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[fixtureid] $dir: ${write(spark, dir)}")
    spark.stop()
  }

  /** None when the directory carries no pin (driver-shipped sfDirs don't);
    * Some(error) when the pinned and recomputed fingerprints differ. The
    * recomputed value is returned either way via `computed`. */
  def check(spark: SparkSession, dir: String): (String, Option[String]) = {
    val computed = fingerprint(spark, dir)
    val pinFile = java.nio.file.Paths.get(dir, fileName)
    val err =
      if (!java.nio.file.Files.exists(pinFile)) None
      else {
        val pinned = new String(
          java.nio.file.Files.readAllBytes(pinFile), "UTF-8").trim
        if (pinned == computed) None
        else Some(s"fixture $dir does not match its $fileName pin: " +
          s"pinned $pinned, computed $computed — re-derive the fixture " +
          "(graft.tools.ScaleUp) or expect incomparable numbers")
      }
    (computed, err)
  }
}
