package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev triage for the audio-decode stage: times each layer of
  * q_multimodal_audio separately to localize cost (blob build vs SPI open
  * vs sample loop). */
object AudioProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/target/sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(label: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      }
    }
    val blobs = Multimodal.audioBlobs(docs)
    t("blobs_only")(blobs.count())
    t("decode")(Multimodal.decodeAudio(blobs).count())
    // raw loop: single WaveFileReader instance, no SPI iteration
    t("raw_wave_reader") {
      blobs.select("asset_id", "payload").mapPartitions { it =>
        val readers = {
          import scala.jdk.CollectionConverters._
          java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
            .iterator().asScala.toList
        }
        val wave = readers.find(_.getClass.getName.contains("Wave")).get
        it.map { row =>
          val payload = row.getAs[Array[Byte]](1)
          val ais = wave.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
          val buf = new Array[Byte](4096)
          var sum = 0L; var read = ais.read(buf)
          while (read > 0) { var i = 0; while (i < read) { sum += buf(i) & 0xff; i += 1 }; read = ais.read(buf) }
          ais.close(); sum
        }
      }(org.apache.spark.sql.Encoders.scalaLong).count()
    }
    // payload collect + pure-JVM loop (no Spark, 1 thread)
    val payloads = blobs.select("payload").collect().map(_.getAs[Array[Byte]](0))
    t("jvm_single_thread") {
      val readers = {
        import scala.jdk.CollectionConverters._
        java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .iterator().asScala.toList
      }
      val wave = readers.find(_.getClass.getName.contains("Wave")).get
      var sum = 0L
      payloads.foreach { p =>
        val ais = wave.getAudioInputStream(new java.io.ByteArrayInputStream(p))
        val buf = new Array[Byte](4096)
        var read = ais.read(buf)
        while (read > 0) { sum += read; read = ais.read(buf) }
        ais.close()
      }
      sum
    }
    spark.stop()
  }
}
