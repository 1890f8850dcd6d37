package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump the semantic-dedup intermediates (cluster, ccos) for
  * oracle triage. */
object SemDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val scaled = base.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("label"),
        transform(col("v"), x => x * lit(0.5d)).as("v"))
    val bumped = base.where(col("vec_id") % 10 === 5)
      .withColumn("__dim", ((col("vec_id") / lit(10)).cast("long") % 64).cast("int"))
      .select((col("vec_id") + 100000).as("vec_id"), col("label"),
        zip_with(col("v"), sequence(lit(0), lit(63)),
          (x, i) => when(i === col("__dim"), x * lit(0.75d)).otherwise(x)).as("v"))
    val planted = base.unionByName(scaled).unionByName(bumped)
      .select(col("vec_id"), col("v"))
    val cents = graft.pipeline.Similarity.ivfCentroids(planted, "vec_id", "v")
    println("CENTS0=" + cents(0).take(4).mkString(","))
    val assigned = graft.pipeline.Similarity.kmeansAssign(planted, "vec_id", "v")
    // SAME division shape as Dedup.semanticDedup (dot / (n * cnorm), commit
    // ee8a4a1): a different float association can disagree in the last ulp
    // exactly at the ccos tie boundaries this triage tool exists to debug
    val cnorm = cents.map(w => math.sqrt(w.map(x => x * x).sum))
    val cdots = array(cents.map(w =>
      graft.functions.VecDot(col("v"), lit(w))): _*)
    val cns = array(cnorm.map(lit): _*)
    val withC = assigned
      .withColumn("n", graft.functions.VecDot.norm(col("v")))
      .withColumn("ccos", element_at(cdots, col("cluster") + 1) /
        (col("n") * element_at(cns, col("cluster") + 1)))
    withC.select(col("id"), col("cluster"), col("ccos"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv("/tmp/sem_debug_engine")
    spark.stop()
  }
}
