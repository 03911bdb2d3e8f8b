package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Reader for the engine's own NDJSON flow output — the consumption
  * side of the indexer loop (K5: indexer/indexer.py:26-45 reads the
  * `ddos_result` records and indexes them). Reading with the explicit
  * FlowFeatures schema (no inference scan) closes the loop: scored
  * flows written by Sinks.writeNdjson are re-loadable as a typed table
  * for search/backfill jobs.
  */
object NdjsonFlows {

  val schema = Encoders.product[graft.flow.FlowFeatures].schema

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)
}
