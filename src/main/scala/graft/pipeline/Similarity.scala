package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * probe set against the corpus, one pass, no shuffle of the corpus. Scale
  * path: random-hyperplane LSH — signatures are one narrow projection;
  * candidate generation shuffles only (bucket, id); exact re-rank touches
  * candidates only. At 100 TB the corpus never moves: probes broadcast,
  * buckets partition.
  */
object Similarity {

  private def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  /** Brute-force cosine top-k: for each probe vector, the k nearest corpus
    * vectors (excluding the probe itself). `probes` must be small (it is
    * broadcast). Returns (probe_id, id, cosine, rank). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
      .withColumn("pn", norm(col("pv")))
    val scored = c.join(broadcast(p), col("id") =!= col("probe_id"))
      .withColumn("cosine", dot(col("v"), col("pv")) / (col("n") * col("pn")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Random-hyperplane LSH signature: `planes` sign bits packed to a long.
    * Plane components are deterministic pseudo-random values from a 64-bit
    * hash of (plane, dim) — no RNG state, reproducible across executors. */
  def rhpSignature(vec: Column, planes: Int): Column = {
    val v = asDouble(vec)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * xxhash64(p, i).cast("double")),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(planes - 1)), (b, i) => call_function("shiftleft", b, i.cast("int"))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** LSH-bucketed ANN: signature chunks as buckets, exact cosine re-rank of
    * the candidates only. Same output shape as bruteForceTopK; recall < 1
    * by construction (ScalaTest pins it against brute force). */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 16, chunks: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunkBits = planes / chunks
    def banded(df: DataFrame, idName: String) =
      df.select(col(idCol).as(idName), asDouble(col(vecCol)).as(s"${idName}_v"),
        rhpSignature(col(vecCol), planes).as(s"${idName}_sig"))
        .select(col(idName), col(s"${idName}_v"),
          posexplode(transform(sequence(lit(0), lit(chunks - 1)), c =>
            call_function("shiftright", col(s"${idName}_sig"), (c * chunkBits).cast("int"))
              .bitwiseAND(lit((1L << chunkBits) - 1)))))
        .toDF(idName, s"${idName}_v", "chunk", "chunk_val")
    val cb = banded(corpus, "id")
    val pb = banded(probes, "probe_id")
    val cands = cb.join(broadcast(pb),
        cb("chunk") === pb("chunk") && cb("chunk_val") === pb("chunk_val") &&
          col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"), col("probe_id_v").as("pv"), col("id_v").as("v"))
      .distinct()
    val scored = cands.withColumn("cosine",
      dot(col("v"), col("pv")) / (norm(col("v")) * norm(col("pv"))))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"), col("rank").cast("long").as("rank"))
  }
}
