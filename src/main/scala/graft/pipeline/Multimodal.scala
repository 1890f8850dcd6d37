package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, plus the decode/feature-extract plumbing a training
  * pipeline needs.
  *
  * Image decode is REAL for the formats the JVM ships decoders for
  * (BMP/PNG/JPEG/GIF via `javax.imageio`, [[decodeImages]]): actual pixel
  * access, channel statistics from the decoded raster. Audio/video decode
  * remains STUBBED behind [[decodeStub]] (no media libraries for those in
  * this environment) — a deterministic fake standing in for the decoder.
  * Everything around both is real and tested: the blob schema, the
  * partition-preserving `mapPartitions` batch shape (the Scala analog of
  * `mapInPandas` — one iterator per partition, streaming, no per-row
  * driver round-trips), and the feature schema contracts.
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

  // ------------------------------------------------------- real image path

  /** A solid-colour 24-bit BMP as a Column: the 54-byte
    * BITMAPFILEHEADER+BITMAPINFOHEADER with little-endian fields, then
    * `w×h` BGR pixels — built entirely with hex/lpad/repeat/unhex column
    * arithmetic (scan-speed, no UDF), so a deterministic image corpus can
    * be planted straight in a query and the oracle can predict the decoded
    * channel statistics arithmetically. `w` is restricted to multiples of
    * 4/3-alignment (row stride w·3 divisible by 4) so no pad bytes are
    * needed. */
  def bmpPayload(r: Column, g: Column, b: Column, w: Int = 4, h: Int = 2): Column = {
    require(w > 0 && h > 0 && (w * 3) % 4 == 0,
      s"w=$w must keep the BMP row stride (w*3) 4-byte aligned")
    def le(value: Long, nBytes: Int): String =
      (0 until nBytes).map(i => f"${(value >> (8 * i)) & 0xff}%02x").mkString
    val pixelBytes = w.toLong * 3 * h
    val header = "424d" + le(54 + pixelBytes, 4) + le(0, 4) + le(54, 4) +
      le(40, 4) + le(w.toLong, 4) + le(h.toLong, 4) + le(1, 2) + le(24, 2) +
      le(0, 4) + le(pixelBytes, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
    def ch(c: Column): Column = lpad(hex(c.cast("long") % 256), 2, "0")
    unhex(concat(lit(header),
      repeat(concat(ch(b), ch(g), ch(r)), w * h)))
  }

  /** A deterministic real-image blob table from `documents`: every doc
    * becomes a solid-colour BMP whose channels are doc_id arithmetic —
    * decodable by any BMP decoder, predictable by the oracle. */
  def imageBlobs(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(id.as("asset_id"), lit("image").as("modality"),
      bmpPayload(id % 256, (id * 7) % 256, (id * 13) % 256).as("payload"))
  }

  /** Decoded-image statistics schema: dimensions and integer-division
    * channel means over the REAL decoded raster. */
  val imageStatsSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("img_w", LongType, nullable = false),
    StructField("img_h", LongType, nullable = false),
    StructField("mean_r", LongType, nullable = false),
    StructField("mean_g", LongType, nullable = false),
    StructField("mean_b", LongType, nullable = false)))

  /** REAL pixel decode via `javax.imageio` — BMP/PNG/JPEG/GIF payloads
    * decode to a raster whose dimensions and per-channel integer means are
    * emitted; unrecognized payloads are dropped (a production pipeline
    * would route them to a quarantine sink). Same `mapPartitions` contract
    * as [[decodeStub]]: iterator in, iterator out, partitioning preserved,
    * nothing touches the driver. Per-pixel `getRGB` is fine at thumbnail
    * sizes; a bulk-raster read is the drop-in for large assets. */
  def decodeImages(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(imageStatsSchema)
    blobs.select("asset_id", "payload").mapPartitions { it =>
      // ImageIO defaults to tmp-file caching per stream: disable for the
      // in-memory decode loop (once per partition, cheap)
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = if (row.isNullAt(1)) Array.emptyByteArray
          else row.getAs[Array[Byte]](1)
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        } catch { case _: Exception => null }
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Some(Row(id, w.toLong, h.toLong, sr / n, sg / n, sb / n))
        }
      }
    }(enc)
  }

  /** A two-tone 24-bit BMP as a Column: left half one colour, right half
    * another — same header/stride arithmetic as [[bmpPayload]], but the
    * image now has horizontal structure, so a resize's sampling choices
    * (which source column feeds which target pixel) become observable in
    * the channel statistics instead of vanishing into a solid field. */
  def bmpPayload2(rl: Column, gl: Column, bl: Column,
      rr: Column, gr: Column, br: Column, w: Int = 4, h: Int = 2): Column = {
    require(w > 0 && h > 0 && w % 2 == 0 && (w * 3) % 4 == 0,
      s"w=$w must be even and keep the BMP row stride (w*3) 4-byte aligned")
    def le(value: Long, nBytes: Int): String =
      (0 until nBytes).map(i => f"${(value >> (8 * i)) & 0xff}%02x").mkString
    val pixelBytes = w.toLong * 3 * h
    val header = "424d" + le(54 + pixelBytes, 4) + le(0, 4) + le(54, 4) +
      le(40, 4) + le(w.toLong, 4) + le(h.toLong, 4) + le(1, 2) + le(24, 2) +
      le(0, 4) + le(pixelBytes, 4) + le(0, 4) + le(0, 4) + le(0, 4) + le(0, 4)
    def ch(c: Column): Column = lpad(hex(c.cast("long") % 256), 2, "0")
    val row = concat(repeat(concat(ch(bl), ch(gl), ch(rl)), w / 2),
      repeat(concat(ch(br), ch(gr), ch(rr)), w / 2))
    unhex(concat(lit(header), repeat(row, h)))
  }

  /** Deterministic two-tone image blobs from `documents`: left-half and
    * right-half channels are independent doc_id arithmetic, so resized
    * rasters have oracle-predictable means and edge pixels. */
  def imageBlobs2(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(id.as("asset_id"), lit("image").as("modality"),
      bmpPayload2(id % 256, (id * 7) % 256, (id * 13) % 256,
        (id * 3) % 256, (id * 5) % 256, (id * 11) % 256).as("payload"))
  }

  /** Resized-image statistics schema: target dimensions, integer-division
    * channel means over the RESIZED raster, and the red channel of the
    * first/last target column — the probes that pin which source columns
    * the resampler actually selected. */
  val resizeStatsSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("out_w", LongType, nullable = false),
    StructField("out_h", LongType, nullable = false),
    StructField("mean_r", LongType, nullable = false),
    StructField("mean_g", LongType, nullable = false),
    StructField("mean_b", LongType, nullable = false),
    StructField("left_r", LongType, nullable = false),
    StructField("right_r", LongType, nullable = false)))

  /** REAL image resize: ImageIO decode then an explicit nearest-neighbour
    * resample with the floor mapping `src = dst * srcDim div outDim` — the
    * deterministic choice (no Graphics2D interpolation state), so any
    * engine can predict every target pixel. Emits target dimensions,
    * channel means and edge probes of the resized raster. Same
    * `mapPartitions` contract as [[decodeImages]]: iterator in/out,
    * partitioning preserved, undecodable payloads dropped. A production
    * variant would re-encode the resized raster back into a payload
    * column; the statistics row is what the oracle can falsify. */
  def resizeImages(blobs: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"target ${outW}x$outH must be positive")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizeStatsSchema)
    blobs.select("asset_id", "payload").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = if (row.isNullAt(1)) Array.emptyByteArray
          else row.getAs[Array[Byte]](1)
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        } catch { case _: Exception => null }
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var leftR = 0L; var rightR = 0L
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val sx = x * w / outW
              val rgb = img.getRGB(sx, sy)
              val r = (rgb >> 16) & 0xff
              sr += r; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              if (y == 0 && x == 0) leftR = r
              if (y == 0 && x == outW - 1) rightR = r
              x += 1
            }
            y += 1
          }
          val n = outW.toLong * outH
          Some(Row(id, outW.toLong, outH.toLong, sr / n, sg / n, sb / n,
            leftR, rightR))
        }
      }
    }(enc)
  }

  /** dHash (difference hash) of each decoded image — the standard
    * perceptual near-duplicate signature (a re-encoded / slightly
    * retouched image keeps its hash; the exact content-hash of
    * [[duplicateFrames]] does not): sample a (gridW+1)×gridH grayscale
    * raster with the SAME deterministic floor mapping as
    * [[resizeImages]] (`src = dst·srcDim div gridDim` — no Graphics2D
    * interpolation state), set bit `y·gridW + x` when gray(x) >
    * gray(x+1) in the row. Gray is the integer mean `(r+g+b) div 3` —
    * engine-portable, so the two-tone fixture's hash is a CLOSED FORM
    * the oracle predicts from doc-id arithmetic alone. Same
    * mapPartitions contract as [[decodeImages]]; gridW·gridH must fit a
    * 64-bit signature. */
  def imageDhash(blobs: DataFrame, gridW: Int = 8,
      gridH: Int = 8): DataFrame = {
    require(gridW > 0 && gridH > 0 && gridW * gridH <= 64,
      s"grid ${gridW}x$gridH must fit 64 bits")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    blobs.select("asset_id", "payload").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = if (row.isNullAt(1)) Array.emptyByteArray
          else row.getAs[Array[Byte]](1)
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        } catch { case _: Exception => null }
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          def gray(gx: Int, gy: Int): Long = {
            val sx = gx * w / (gridW + 1)
            val sy = gy * h / gridH
            val rgb = img.getRGB(sx, sy)
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3L
          }
          var hash = 0L
          var y = 0
          while (y < gridH) {
            var x = 0
            while (x < gridW) {
              if (gray(x, y) > gray(x + 1, y))
                hash |= 1L << (y * gridW + x)
              x += 1
            }
            y += 1
          }
          Some(Row(id, hash))
        }
      }
    }(enc)
  }

  /** Scene-change detection over decoded per-frame statistics (shot
    * boundaries — the signal frame-sampling pipelines use to sample one
    * frame per shot instead of every-N blind sampling): a transition is
    * flagged when the integer gray mean `(r+g+b) div 3` jumps more than
    * `threshold` between consecutive frames of one asset. Input is
    * [[decodeVideoFrames]] output; per-asset rollup: frame count, change
    * count. The lag window partitions by asset — bounded by
    * frames-per-clip, never corpus-wide. */
  def sceneChanges(frames: DataFrame, threshold: Long = 50L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("asset_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("gray", expr("(mean_r + mean_g + mean_b) div 3"))
      .withColumn("pg", lag(col("gray"), 1).over(w))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(when(col("pg").isNotNull &&
          abs(col("gray") - col("pg")) > threshold, 1L).otherwise(0L))
          .cast("long").as("n_changes"))
  }

  // ------------------------------------------------------- real video path

  /** A deterministic real-video blob table from `documents`: every doc
    * becomes a 3-frame clip of concatenated solid-colour BMPs (the
    * raw-video analog — frame boundaries live in each frame's own header,
    * not in a fixed stride), frame i's channels shifted by `i*17` so the
    * oracle can predict every frame's decoded statistics. */
  def videoBlobs(docs: DataFrame, nFrames: Int = 3): DataFrame = {
    val id = col("doc_id")
    val frames = (0 until nFrames).map(i =>
      bmpPayload((id + i * 17) % 256, (id * 7 + i * 17) % 256,
        (id * 13 + i * 17) % 256))
    docs.select(id.as("asset_id"), lit("video").as("modality"),
      concat(frames: _*).as("payload"))
  }

  /** Per-frame decoded-video statistics: [[imageStatsSchema]] plus the
    * frame index. */
  val videoStatsSchema: StructType = StructType(
    StructField("frame_idx", LongType, nullable = false) +:
      imageStatsSchema.fields.toSeq)

  /** REAL video-frame decode: walk the concatenated-BMP container by each
    * frame's own BITMAPFILEHEADER size field (bytes 2-5, little-endian) —
    * no fixed-stride assumption — and ImageIO-decode every frame.
    * Malformed tails stop the walk for that asset (frames decoded so far
    * are kept); payloads with no leading frame are dropped. Same
    * partition-preserving `mapPartitions` contract as [[decodeImages]]. */
  def decodeVideoFrames(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoStatsSchema)
    blobs.select("asset_id", "payload").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = if (row.isNullAt(1)) Array.emptyByteArray
          else row.getAs[Array[Byte]](1)
        val out = Vector.newBuilder[Row]
        var off = 0
        var idx = 0L
        var ok = true
        while (ok && off + 6 <= payload.length &&
            payload(off) == 'B'.toByte && payload(off + 1) == 'M'.toByte) {
          val size = (payload(off + 2) & 0xffL) | ((payload(off + 3) & 0xffL) << 8) |
            ((payload(off + 4) & 0xffL) << 16) | ((payload(off + 5) & 0xffL) << 24)
          if (size < 54 || off + size > payload.length) ok = false
          else {
            val img = try {
              javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
                payload, off, size.toInt))
            } catch { case _: Exception => null }
            if (img == null) ok = false
            else {
              val w = img.getWidth; val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              out += Row(idx, id, w.toLong, h.toLong, sr / n, sg / n, sb / n)
              idx += 1
              off += size.toInt
            }
          }
        }
        out.result()
      }
    }(enc)
  }

  // ------------------------------------------------------- real audio path

  /** A mono 8-bit PCM WAV as a Column: the 44-byte RIFF/fmt/data header
    * with little-endian fields, then `nSamples` unsigned sample bytes at a
    * constant planted amplitude — the audio twin of [[bmpPayload]], built
    * with the same hex/repeat/unhex column arithmetic (scan-speed, no
    * UDF), so the oracle can predict the decoded frame count and mean
    * amplitude exactly. */
  def wavPayload(amp: Column, nSamples: Int, sampleRate: Int = 8000): Column = {
    require(nSamples > 0, "nSamples must be positive")
    def le(value: Long, nBytes: Int): String =
      (0 until nBytes).map(i => f"${(value >> (8 * i)) & 0xff}%02x").mkString
    def ascii(s: String): String = s.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    val header = ascii("RIFF") + le(36L + nSamples, 4) + ascii("WAVE") +
      ascii("fmt ") + le(16, 4) + le(1, 2) + le(1, 2) +
      le(sampleRate.toLong, 4) + le(sampleRate.toLong, 4) /* byteRate: 1ch×8bit */ +
      le(1, 2) + le(8, 2) + ascii("data") + le(nSamples.toLong, 4)
    unhex(concat(lit(header),
      repeat(lpad(hex(amp.cast("long") % 256), 2, "0"), nSamples)))
  }

  /** A deterministic real-audio blob table from `documents`: every doc
    * becomes a constant-amplitude PCM WAV whose amplitude and length are
    * doc_id arithmetic — decodable by any WAV reader, predictable by the
    * oracle (odd docs get the longer clip). */
  def audioBlobs(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val amp = (id * 11) % 256
    docs.select(id.as("asset_id"), lit("audio").as("modality"),
      when(id % 2 === 0, wavPayload(amp, 16))
        .otherwise(wavPayload(amp, 32)).as("payload"))
  }

  /** A RAMPING 8-bit PCM WAV as a Column: sample i is
    * `(base + i·step) mod 256` — the varying-amplitude twin of
    * [[wavPayload]] (whose constant tone makes every energy delta zero,
    * useless for fingerprinting). Same RIFF header arithmetic; the body
    * renders per-sample hex via a transform over the index sequence. */
  def wavPayloadRamp(base: Column, step: Column, nSamples: Int,
      sampleRate: Int = 8000): Column = {
    require(nSamples > 0, "nSamples must be positive")
    def le(value: Long, nBytes: Int): String =
      (0 until nBytes).map(i => f"${(value >> (8 * i)) & 0xff}%02x").mkString
    def ascii(s: String): String =
      s.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    val header = ascii("RIFF") + le(36L + nSamples, 4) + ascii("WAVE") +
      ascii("fmt ") + le(16, 4) + le(1, 2) + le(1, 2) +
      le(sampleRate.toLong, 4) + le(sampleRate.toLong, 4) +
      le(1, 2) + le(8, 2) + ascii("data") + le(nSamples.toLong, 4)
    val body = array_join(transform(sequence(lit(0), lit(nSamples - 1)),
      i => lpad(hex((base.cast("long") + i.cast("long") * step.cast("long"))
        % 256), 2, "0")), "")
    unhex(concat(lit(header), body))
  }

  /** Deterministic ramping-audio blobs from `documents`: base and step
    * are doc_id arithmetic, so every frame energy — and therefore the
    * fingerprint bits, wraps included — is a closed form the oracle
    * predicts. */
  def audioBlobs2(docs: DataFrame, nSamples: Int = 32): DataFrame = {
    val id = col("doc_id")
    docs.select(id.as("asset_id"), lit("audio").as("modality"),
      wavPayloadRamp(id % 256, lit(1L) + id % 5, nSamples).as("payload"))
  }

  /** Energy-delta audio fingerprint over the REAL decoded sample stream
    * — the simplified Haitsma–Kalker shape (sign of the frame-to-frame
    * energy change is the classic robust-audio-ID bit): the unsigned
    * 8-bit samples split into consecutive `frameLen`-sample frames, bit
    * f of the fingerprint is set when frame f+1's energy (plain sample
    * sum — integer, engine-portable) exceeds frame f's. Returns
    * (asset_id, n_frames, fp); non-8-bit or empty payloads drop
    * (quarantine posture). Same mapPartitions contract and sticky SPI
    * reader as [[decodeAudio]]. */
  def audioFingerprint(blobs: DataFrame, frameLen: Int = 4): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive: $frameLen")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    blobs.select("asset_id", "payload").mapPartitions { it =>
      val open = stickyAudioOpener()
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = if (row.isNullAt(1)) Array.emptyByteArray
          else row.getAs[Array[Byte]](1)
        try {
          val ais = open(payload)
          try {
            if (ais.getFormat.getSampleSizeInBits != 8) None
            else {
              val samples = Array.newBuilder[Int]
              val buf = new Array[Byte](4096)
              var read = ais.read(buf)
              while (read > 0) {
                var i = 0
                while (i < read) { samples += (buf(i) & 0xff); i += 1 }
                read = ais.read(buf)
              }
              val s = samples.result()
              val nFrames = s.length / frameLen
              if (nFrames < 1 || nFrames > 64) None
              else {
                val e = Array.tabulate(nFrames) { f =>
                  var acc = 0L; var i = f * frameLen
                  while (i < (f + 1) * frameLen) { acc += s(i); i += 1 }
                  acc
                }
                var fp = 0L
                var f = 0
                while (f < nFrames - 1) {
                  if (e(f + 1) > e(f)) fp |= 1L << f
                  f += 1
                }
                Some(Row(id, nFrames.toLong, fp))
              }
            }
          } finally ais.close()
        } catch { case _: Exception => None }
      }
    }(enc)
  }

  /** Decoded-audio statistics schema: format fields and the integer mean
    * of the REAL decoded sample stream. */
  val audioStatsSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("bits", LongType, nullable = false),
    StructField("mean_amp", LongType, nullable = false)))

  /** REAL audio decode via `javax.sound.sampled` — WAV/PCM payloads decode
    * through `AudioSystem` to format fields plus the integer mean of the
    * unsigned 8-bit sample stream; undecodable payloads are dropped (same
    * quarantine posture as [[decodeImages]]). Same partition-preserving
    * `mapPartitions` contract: iterator in, iterator out, nothing on the
    * driver. */
  /** Per-partition sticky AudioFileReader opener. Resolves the SPI once
    * and keeps the last-matching reader STICKY: the naive
    * AudioSystem.getAudioInputStream call re-enters a global synchronized
    * provider cache AND probes providers in registration order, each
    * non-matching one signalling by THROWING (2-3 stack-trace fill-ins
    * per row — measured ~9 s for 50k 58-byte WAVs vs 0.3 s matched). A
    * homogeneous corpus pays zero mismatch exceptions after the first
    * row; mixed corpora pay one miss per format switch. Falls back to
    * AudioSystem when the context classloader exposes no providers.
    * Call INSIDE mapPartitions — the returned closure carries the
    * per-partition sticky state. */
  private def stickyAudioOpener(): Array[Byte] => javax.sound.sampled.AudioInputStream = {
    import scala.jdk.CollectionConverters._
    val readers =
      try java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toArray
      catch { case _: Throwable =>
        Array.empty[javax.sound.sampled.spi.AudioFileReader] }
    var sticky: javax.sound.sampled.spi.AudioFileReader = null
    def open(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      if (readers.isEmpty)
        return javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
      if (sticky != null) {
        try return sticky.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => () }
      }
      var i = 0
      while (i < readers.length) {
        if (readers(i) ne sticky) {
          try {
            val ais = readers(i).getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            sticky = readers(i)
            return ais
          } catch { case _: Exception => () }
        }
        i += 1
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "no reader matched")
    }
    open
  }

  def decodeAudio(blobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioStatsSchema)
    blobs.select("asset_id", "payload").mapPartitions { it =>
      val open = stickyAudioOpener()
      it.flatMap { row =>
        val id = row.getLong(0)
        val payload = if (row.isNullAt(1)) Array.emptyByteArray
          else row.getAs[Array[Byte]](1)
        val decoded = try {
          val ais = open(payload)
          try {
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 8) None // stats below assume u8 PCM
            else {
              val buf = new Array[Byte](4096)
              var sum = 0L; var n = 0L
              var read = ais.read(buf)
              while (read > 0) {
                var i = 0
                while (i < read) { sum += buf(i) & 0xff; i += 1 }
                n += read
                read = ais.read(buf)
              }
              if (n == 0) None
              else Some(Row(id, n / fmt.getFrameSize, fmt.getSampleRate.toLong,
                fmt.getChannels.toLong, fmt.getSampleSizeInBits.toLong, sum / n))
            }
          } finally ais.close()
        } catch { case _: Exception => None }
        decoded
      }
    }(enc)
  }

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
