package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the IVF k-means training phases separately. */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("warmup")(spark.range(1000).selectExpr("sum(id)").collect())
    t("scan")(emb.count())
    val c = emb.select(col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    t("seeds")(c.orderBy(pmod(xxhash64(col("id")), lit(1000003L)), col("id"))
      .limit(16).select(col("v")).collect())
    val cents = Array.tabulate(16, 64)((i, j) => (i * 64 + j) * 0.001)
    def dotLit(v: org.apache.spark.sql.Column, w: Array[Double]) =
      aggregate(zip_with(v, lit(w), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val scores = array(cents.map(w => dotLit(col("v"), w) - lit(w.map(x => x * x).sum / 2)): _*)
    val cell = (array_position(scores, array_max(scores)) - 1).cast("int")
    t("assign_only")(c.select(cell.as("cell")).groupBy(col("cell")).count().collect())
    t("assign_explode_means")(c.select(cell.as("cell"),
        posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m")).collect())
    t("assign_explode_means2")(c.select(cell.as("cell"),
        posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m")).collect())
    spark.stop()
  }
}
