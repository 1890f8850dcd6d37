package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run a declared query and print every Spark JOB it submits
  * (id, wall seconds, first-stage name) plus the total, at a configurable
  * core count — the measurement the driver-paced operators (epoch loop,
  * cluster fixpoints) need: their cost is job COUNT × per-job overhead,
  * which a plan dump cannot show. Usage:
  *   JobProfile <query> [sfDir] [cpus] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val reps = if (args.length > 3) args(3).toInt else 2
    val b = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // A/B knobs for size-proportional post-shuffle parallelism
    sys.env.get("GRAFT_ADVISORY_KB").foreach(kb => b
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${kb}k")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val ends = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse(""))
        starts(j.jobId) = (System.nanoTime(), desc.take(90))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ends(j.jobId) = System.nanoTime()
    })
    val fn = graft.SparkEntry.queries(name)
    for (rep <- 1 to reps) {
      starts.clear(); ends.clear()
      System.gc()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      // final ADAPTIVE plan (query stages + ReusedExchange visible only
      // after the query's OWN execution — count() builds a separate one)
      if (rep == reps && sys.env.contains("GRAFT_DUMP_FINAL")) {
        val qe = fn(spark, sfDir).queryExecution
        qe.toRdd.foreachPartition(_ => ())
        java.nio.file.Files.write(
          java.nio.file.Paths.get(sys.env("GRAFT_DUMP_FINAL")),
          qe.executedPlan.toString.getBytes("UTF-8"))
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"== $name rep $rep: n=$n total=$wall%.2f s, ${ends.size} jobs")
      starts.toSeq.sortBy(_._1).foreach { case (id, (s, desc)) =>
        ends.get(id).foreach { e =>
          val sec = (e - s) / 1e9
          if (sec >= 0.005) println(f"  job $id%-4d $sec%7.3f s  $desc")
        }
      }
    }
    spark.stop()
  }
}
