package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, plus the decode/feature-extract plumbing a training
  * pipeline needs.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment) behind [[decodeStub]] — a deterministic fake that stands in
  * for a real decoder. Everything around it is real and tested: the blob
  * schema, the partition-preserving `mapPartitions` batch shape (the Scala
  * analog of `mapInPandas` — one iterator per partition, streaming, no
  * per-row driver round-trips), and the feature schema contract.
  */
object Multimodal {

  /** Blob-table schema: one row per media asset. At scale this is the
    * manifest layout: payloads inline for small assets, URI + byte-range
    * for large ones; partition by modality then bucket by asset id. */
  val blobSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Build a deterministic blob table from `documents`: payload = UTF-8
    * bytes of the text, modality round-robins image/audio/video, metadata
    * derived arithmetically. Stands in for a real media manifest. */
  def blobsFromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")), (id % 3 + 1).cast("int"))
    docs.select(
      id.as("asset_id"),
      modality.as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        concat(lit("application/x-fake-"), modality).as("mime"),
        when(modality === "image", (id % 640 + 64).cast("int")).otherwise(lit(null).cast("int")).as("width"),
        when(modality === "image", (id % 480 + 48).cast("int")).otherwise(lit(null).cast("int")).as("height"),
        when(modality =!= "image", (id % 60000 + 1000).cast("long"))
          .otherwise(lit(null).cast("long")).as("duration_ms")).as("meta"))
  }

  /** Frame sampling — the 1→N decode shape (a video/audio asset expands to
    * `n` evenly-spaced frames). A real pipeline would seek/decode media
    * timestamps; the byte-range arithmetic here is the stub standing in for
    * that, but the dataflow is the production one: a generator (posexplode
    * over the frame index sequence) + a byte-slice projection, scan-speed,
    * no shuffle, no driver involvement — frame explosion multiplies rows
    * INSIDE the scan stage, which is what keeps it viable when the asset
    * table is 100 TB. Frame i of an L-byte payload is the `frameLen`-byte
    * slice at offset floor(i·L/n). */
  def frameSample(blobs: DataFrame, n: Int = 4, frameLen: Int = 16): DataFrame = {
    blobs.where(col("modality").isin("video", "audio"))
      .select(col("asset_id"), col("modality"), col("payload"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("pos", "frame_idx")))
      .withColumn("off", expr(
        s"CAST((CAST(frame_idx AS BIGINT) * octet_length(payload)) div $n AS BIGINT)"))
      .select(col("asset_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("off"),
        expr(s"substring(payload, off + 1, $frameLen)").as("frame"))
  }

  /** Feature schema produced by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** STUB decoder: where a real pipeline would decode the payload (image
    * decode / resample / frame-sample) this computes a deterministic fake
    * 8-dim feature from the payload bytes. The `mapPartitions` shape —
    * iterator in, iterator out, schema-typed Rows, partitioning preserved —
    * is exactly what a real vectorized decoder plugs into. */
  def decodeStub(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    blobs.select("asset_id", "modality", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val mod = row.getString(1)
        val payload = if (row.isNullAt(2)) Array.emptyByteArray else row.getAs[Array[Byte]](2)
        // deterministic fake feature: byte-bucket histogram, L1-normalized.
        // A real decoder (??? in production terms) replaces this block.
        val hist = new Array[Float](8)
        payload.foreach(b => hist((b & 0xFF) >> 5) += 1f)
        val total = math.max(1f, payload.length.toFloat)
        Row(id, mod, payload.length.toLong, hist.map(_ / total).toSeq)
      }
    }(enc)
  }
}
