package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query subset (fast iteration on
    // one oracle without paying the full 100+-query dump)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
      case _ => sys.error("usage: Verify <sfDir> <outDir> [q1,q2,...]")
    }
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
    // let data-dependent oracle generators (IVF centroid literals) train on
    // the same fixture the queries run against
    graft.queries.PipelineQueries.oracleContext = Some((spark, sfDir))
    new java.io.File(outDir).mkdirs()
    // Error rows are an artifact, not just stderr (VERDICT r8 item 3): a
    // query that fails to dump must leave a machine-readable trace next to
    // the outputs, so a downstream compare that only walks result dirs can
    // still see WHICH queries are absent and why instead of silently
    // shrinking its denominator.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val m = Option(e.getMessage).getOrElse(e.getClass.getName)
        errors(name) = m.replaceAll("\\s+", " ").take(200)
        System.err.println(s"[verify] $name failed: $m")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // subset runs write a subset-scoped artifact: overwriting
    // verify_errors.json with only the subset's errors while a previous
    // full run's result dirs remain in the same outDir would let a
    // dir-walking compare silently mix rounds
    val errFile = if (only.isDefined) "verify_errors_subset.json"
                  else "verify_errors.json"
    Files.writeString(Paths.get(s"$outDir/$errFile"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
    // exit 0 even with errors: the dumped outputs are still valid compare
    // inputs, and a nonzero exit could make a driver treat the WHOLE
    // correctness step as failed over one broken query — the loud trace is
    // verify_errors.json + stderr (Bench, by contrast, exits nonzero per
    // VERDICT r8 item 2: a bench artifact with missing queries lies)
  }
}
