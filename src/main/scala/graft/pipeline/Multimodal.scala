package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Frame-level dedup: content-hash the sampled frames and count, per
    * distinct frame, its occurrences and the number of DISTINCT assets
    * carrying it — the signal a pipeline prunes on (intro/outro cards,
    * test patterns, still segments repeat across a corpus; a real pipeline
    * would hash decoded pixels or a perceptual hash, here it is the frame
    * bytes the stub decoder yields). One exchange on the frame hash,
    * map-side combined; returns (frame_md5, n_assets, n_occurrences). */
  def duplicateFrames(blobs: DataFrame, n: Int = 4, frameLen: Int = 16): DataFrame =
    frameSample(blobs, n, frameLen)
      .select(col("asset_id"), md5(col("frame")).as("frame_md5"))
      .groupBy(col("frame_md5"))
      .agg(countDistinct(col("asset_id")).as("n_assets"),
        count(lit(1)).as("n_occurrences"))

  /** 12-byte container header: magic "GFT0", uint16-BE width, uint16-BE
    * height, uint32-BE duration_ms (0 where the modality doesn't carry the
    * field). The synthetic container format whose header [[decodeStub]]
    * genuinely parses byte-by-byte — built with hex/lpad/unhex column
    * arithmetic: scan-speed, no UDF. */
  def containerize(blobs: DataFrame): DataFrame = {
    def be(c: Column, hexDigits: Int): Column =
      lpad(hex(coalesce(c.cast("long"), lit(0L))), hexDigits, "0")
    val header = unhex(concat(lit("47465430"), // "GFT0"
      be(col("meta.width"), 4), be(col("meta.height"), 4),
      be(col("meta.duration_ms"), 8)))
    blobs.withColumn("payload", concat(header, col("payload")))
  }

  /** Feature schema produced by the decode/extract stage. The parsed_*
    * fields come from the container header ([[containerize]]) — null when
    * the payload carries no recognizable header. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true),
    StructField("parsed_width", IntegerType, nullable = true),
    StructField("parsed_height", IntegerType, nullable = true),
    StructField("parsed_duration_ms", LongType, nullable = true)))

  /** Decoder: parses the container HEADER for real — magic check plus
    * big-endian u16/u16/u32 field extraction from raw bytes — then computes
    * a deterministic fake feature from the body where a real pipeline would
    * decode pixels/samples (no media libraries in this environment; only
    * that innermost step is stubbed). `n_bytes` and the feature cover the
    * BODY (payload minus header). The `mapPartitions` shape — iterator in,
    * iterator out, schema-typed Rows, partitioning preserved — is exactly
    * what a real vectorized decoder plugs into. */
  def decodeStub(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    blobs.select("asset_id", "modality", "payload").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val mod = row.getString(1)
        val payload = if (row.isNullAt(2)) Array.emptyByteArray else row.getAs[Array[Byte]](2)
        def u8(i: Int): Int = payload(i) & 0xFF
        val hasHdr = payload.length >= 12 && payload(0) == 'G' &&
          payload(1) == 'F' && payload(2) == 'T' && payload(3) == '0'
        val w = if (hasHdr) (u8(4) << 8) | u8(5) else 0
        val h = if (hasHdr) (u8(6) << 8) | u8(7) else 0
        val dur = if (hasHdr)
          (u8(8).toLong << 24) | (u8(9) << 16) | (u8(10) << 8) | u8(11)
        else 0L
        val body =
          if (hasHdr) java.util.Arrays.copyOfRange(payload, 12, payload.length)
          else payload
        // deterministic fake feature: byte-bucket histogram, L1-normalized.
        // A real media decoder replaces this block (and only this block).
        val hist = new Array[Float](8)
        body.foreach(b => hist((b & 0xFF) >> 5) += 1f)
        val total = math.max(1f, body.length.toFloat)
        if (hasHdr)
          Row(id, mod, body.length.toLong, hist.map(_ / total).toSeq,
            Int.box(w), Int.box(h), Long.box(dur))
        else
          Row(id, mod, body.length.toLong, hist.map(_ / total).toSeq,
            null, null, null)
      }
    }(enc)
  }
}
