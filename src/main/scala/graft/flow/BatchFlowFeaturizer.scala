package graft.flow

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch restatement of the reference's stateful flow featurizer
  * (spark_app/main.py:254-990): canonical-key grouping, first-packet
  * orientation, direction split, exact moments, IAT via window lag.
  *
  * Scale design: the three window stages and the final aggregation all
  * cluster on the same 5-column flow key, so the whole featurizer costs
  * ONE hash-partition shuffle of the packet stream (Spark reuses the
  * window's HashPartitioning for the aggregate — no second exchange;
  * verified via explain). Per-flow state is O(1) — counters and exact
  * moment accumulators, never per-packet arrays — so a 100 TB packet
  * table with billions of flows streams through; skewed heavy-hitter
  * flows (one key ≫ others) are the one risk, mitigated by AQE skew
  * handling and the O(1) per-row window accumulators.
  */
object BatchFlowFeaturizer {
  import FlowFeatureSql._

  /** events → synthetic packet stream (deterministic; see FlowFeatureSql). */
  def packetsFromEvents(events: DataFrame): DataFrame =
    events
      .selectExpr(packetStage0(SparkDialect): _*)
      .selectExpr(packetStage1: _*)

  /** packets + normalized flow-key columns (P1). */
  def withCanonicalKey(packets: DataFrame): DataFrame =
    packets.selectExpr("*" +: canonicalKeyExprs: _*)

  /** Full 82-column flow-feature table, one row per completed flow. */
  def features(packets: DataFrame): DataFrame = {
    val iat = withCanonicalKey(packets)
      .selectExpr("*" +: orientationExprs: _*)
      .selectExpr("*", isFwdExpr)
      .selectExpr("*" +: prevTsExprs: _*)
      .selectExpr("*" +: iatExprs: _*)
    val agg = iat
      .groupBy(keyCols.map(col): _*)
      .agg(expr(aggExprs.head), aggExprs.tail.map(expr): _*)
    agg.selectExpr(finalExprs: _*).orderBy("flow_id")
  }

  def fromEvents(events: DataFrame): DataFrame =
    features(packetsFromEvents(events))

  /** Cached flow-feature stage for catalog queries: the 78-feature
    * relation is the fan-in point of the reference surface — the
    * feature dump, detection labeling, and all three RF scorers
    * consume it — so it materializes once per (session, corpus) like
    * the dedup family's stage views instead of re-running the
    * featurizer windows per query (r11 task 7: q_detect_label's 5.1 s
    * sf1 was one of five private featurizer runs). At 100 TB this is
    * the persisted flow-features table every scorer reads.
    */
  def flowsView(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.operators.StageViews.ensureCached(spark, "flows_v", dir)(
      fromEvents(Tables.events(spark, dir)))

  // ---- driver-contract queries ----

  val qFlowFeatures = Q(
    "q_flow_features",
    (spark, dir) => flowsView(spark, dir).orderBy("flow_id"),
    Some(oracleSql)
  )

  /** P1 standalone: canonical key projection over the packet stream. */
  val qCanonicalKey = Q(
    "q_flow_key_canonical",
    (spark, dir) =>
      withCanonicalKey(packetsFromEvents(Tables.events(spark, dir)))
        .selectExpr("event_id", "src_ip", "dst_ip", "src_port", "dst_port",
          "protocol", "n_src_ip", "n_dst_ip", "n_src_port", "n_dst_port")
        .orderBy("event_id"),
    Some(s"""WITH p0 AS (SELECT ${packetStage0(DuckDialect).mkString(", ")} FROM events),
packets AS (SELECT ${packetStage1.mkString(", ")} FROM p0),
keyed AS (SELECT *, ${canonicalKeyExprs.mkString(", ")} FROM packets)
SELECT event_id, src_ip, dst_ip, src_port, dst_port, protocol, n_src_ip, n_dst_ip, n_src_port, n_dst_port
FROM keyed ORDER BY event_id""")
  )

  val all: Seq[Q] = Seq(qFlowFeatures, qCanonicalKey)
}
