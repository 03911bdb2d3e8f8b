package graft.sink

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}

/** Sink surface (K1-K5 in SURVEY.md §2.2).
  *
  * The reference references `foreach_batch_function` without defining it
  * (spark_app/main.py:1096 — latent NameError); this is that sink done
  * properly: completed flows only, per-batch append as line JSON (the
  * indexer's input contract, indexer/indexer.py:26-45), Kafka variant
  * when a broker exists.
  *
  * Scale: `df.write.json` is distributed — no driver collect (the
  * reference's predict_rf.py:43 `toPandas()` is the anti-pattern we
  * replace, K3).
  */
object Sinks {

  /** K1: foreachBatch sink writing each micro-batch of finalized flows
    * as line JSON under outDir/batch=<id>/, with the reference's
    * trigger/output-mode/checkpoint settings (main.py:1093-1099).
    */
  def jsonFlowSink[T](flows: Dataset[T], outDir: String, checkpoint: String,
      triggerInterval: String = "5 seconds"): StreamingQuery =
    flows.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[T], batchId: Long) =>
        batch.toDF().write.mode("overwrite").json(s"$outDir/batch=$batchId")
        ()
      }
      .start()

  /** K1b serialization contract: one Kafka record per finalized flow —
    * key = flow_id bytes, value = UTF-8 JSON object of the full row.
    * This is exactly what the reference's indexer consumes from the
    * `ddos_result` topic (indexer/indexer.py:26-34: json.loads of each
    * message value). Factored out of the sink so the wire format is
    * testable without a broker (KafkaContractSpec).
    */
  def toKafkaRecords(flows: DataFrame): DataFrame =
    flows.selectExpr(
      "CAST(flow_id AS BINARY) AS key",
      "CAST(to_json(struct(*)) AS BINARY) AS value")

  /** K1 (Kafka variant): labeled flows → topic `ddos_result`
    * (main.py:1020, indexer/indexer.py:7).
    */
  def kafkaFlowSink(flows: DataFrame, bootstrap: String, checkpoint: String,
      topic: String = "ddos_result"): StreamingQuery =
    toKafkaRecords(flows)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .start()

  /** K2: console debugging sink (ml_model/README.md:161-165). */
  def consoleSink[T](ds: Dataset[T]): DataStreamWriter[T] =
    ds.writeStream.outputMode(OutputMode.Update()).format("console")

  /** K3: batch NDJSON writer — distributed replacement for
    * predict_rf.py:43-52's toPandas()+to_json.
    */
  def writeNdjson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** NDJSON writer for per-micro-batch sinks: writes unconditionally
    * (exactly ONE evaluation of the batch plan — any pre-write
    * emptiness probe re-runs the whole plan, the r19 floor-probe
    * lesson), then decides emptiness from the COMMITTED FILES
    * (metadata-only: sum of part-file lengths) and removes the
    * directory when the trigger emitted nothing. Returns whether the
    * directory was kept.
    */
  def writeNdjsonNonEmpty(df: DataFrame, path: String): Boolean = {
    // compression pinned off: the emptiness heuristic below reads
    // "no rows" as zero part-file bytes, which only holds for plain
    // JSON — a codec configured session-wide would write nonzero-length
    // headers for empty triggers and silently keep every empty dir
    // (r19 ADVICE)
    df.write.mode("overwrite").option("compression", "none").json(path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(p)
      .filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum
    if (bytes == 0L) { fs.delete(p, true); false } else true
  }
}
