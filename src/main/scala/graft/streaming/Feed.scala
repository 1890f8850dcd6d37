package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.filter.FilterCompiler

/** Structured Streaming surface of the engine (SURVEY.md §2.6 ST1-ST5).
  *
  * The reference runs a tokio broadcast bus (capacity 2, laggards dropped,
  * src/bgprib.rs:824-839) feeding WebSocket subscribers, a bounded mpsc
  * ingest queue (src/bgpsvc.rs:227), and periodic CBOR snapshots. Here the
  * event log IS the bus: ingest appends Parquet through a checkpointed
  * streaming query (ordering + backpressure from micro-batch triggers;
  * durability from checkpoints — ST3/ST5), and each subscriber is a
  * streaming query over the same schema with its compiled filter applied
  * (ST1/ST2 — note the reference parses but never applies the subscriber
  * filter, src/subscriber.rs:58-137; we apply it, SURVEY §7.5 quirk 6).
  */
object Feed {

  /** ST3: ingest pipeline — normalize a raw event stream (any streaming
    * DataFrame with the `events` schema) into route events and append to
    * the Parquet event log with a checkpoint. */
  def ingest(rawEvents: DataFrame, logDir: String, checkpointDir: String,
      triggerMs: Long = 1000): StreamingQuery =
    graft.sources.RouteEventGen.fromEvents(rawEvents)
      .writeStream
      .format("parquet")
      .option("path", logDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .outputMode("append")
      .start()

  /** ST1/ST2: per-client subscription — rib gate + the compiled filter
    * predicate, pushed via foreachBatch (the transport callback stands in
    * for the WebSocket frame write). */
  def subscribe(eventStream: DataFrame, rib: String, filter: String)(
      push: Iterator[Row] => Unit): DataStreamWriter[Row] = {
    val pred = col("rib") === rib && FilterCompiler.accept(filter)
    eventStream.where(pred)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        push(batch.collect().iterator) // a micro-batch of matching frames
      }
  }

  /** ST4: the periodic retention/compaction job — rewrite the log keeping
    * the newest `historyDepth` records per ring, OnlyDiffer-deduped (the
    * reference's purge, src/bgprib.rs:875-902). Batch job on a schedule. */
  def compact(spark: SparkSession, logDir: String, outDir: String,
      historyDepth: Int = 10): Unit = {
    val log = spark.read.parquet(logDir)
    graft.operators.RibViews.retained(
      graft.operators.RibViews.onlyDiffer(log), historyDepth)
      .write.mode("overwrite").parquet(outDir)
  }

  /** ST5: recover the latest RIB state from the durable log — the snapshot
    * load path is just a read (checkpoint + parquet are the durability). */
  def restoreCurrent(spark: SparkSession, logDir: String): DataFrame =
    graft.operators.RibViews.current(spark.read.parquet(logDir))
}
