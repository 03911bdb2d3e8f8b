package graft.ml

import graft.Q
import graft.flow.BatchFlowFeaturizer
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-forest DDoS detector — the reference's ML surface re-expressed
  * in Scala MLlib (same classes): VectorAssembler → RandomForest with the
  * persisted parameters numTrees=100, maxDepth=6, gini, sqrt, seed 42
  * (train_rf.py:52-72; rf_binary_model stage metadata), trained on the
  * 78-feature flow records, evaluated with the same four
  * MulticlassClassificationEvaluator metrics (train_rf.py:95-99).
  *
  * Training labels: the reference trains on externally-labeled
  * CIC-DDoS2019 CSVs (not shipped); here the deterministic threshold rule
  * of graft.operators.Detection provides labels so train/serve runs
  * end-to-end on the driver tables.
  *
  * Scale: RF training is treeAggregate-based (driver holds tree stats,
  * executors scan partitions); scoring is a stateless projection —
  * streaming-safe exactly as the reference exploits (main.py:1087).
  */
object RfDetector {

  /** expected_features.txt:1-78, in order. */
  val featureCols: Seq[String] = Seq(
    "source_port", "destination_port", "protocol",
    "total_fwd_packets", "total_backward_packets",
    "total_length_of_fwd_packets", "total_length_of_bwd_packets",
    "fwd_packet_length_max", "fwd_packet_length_min",
    "fwd_packet_length_mean", "fwd_packet_length_std",
    "bwd_packet_length_max", "bwd_packet_length_min",
    "bwd_packet_length_mean", "bwd_packet_length_std",
    "flow_bytes_s", "flow_packets_s",
    "flow_iat_mean", "flow_iat_std", "flow_iat_max", "flow_iat_min",
    "fwd_iat_total", "fwd_iat_mean", "fwd_iat_std", "fwd_iat_max", "fwd_iat_min",
    "bwd_iat_total", "bwd_iat_mean", "bwd_iat_std", "bwd_iat_max", "bwd_iat_min",
    "fwd_psh_flags", "bwd_psh_flags", "fwd_urg_flags", "bwd_urg_flags",
    "fwd_header_length", "bwd_header_length",
    "fwd_packets_s", "bwd_packets_s",
    "min_packet_length", "max_packet_length",
    "packet_length_mean", "packet_length_std", "packet_length_variance",
    "fin_flag_count", "syn_flag_count", "rst_flag_count", "psh_flag_count",
    "ack_flag_count", "urg_flag_count", "cwe_flag_count", "ece_flag_count",
    "down_up_ratio", "average_packet_size",
    "avg_fwd_segment_size", "avg_bwd_segment_size",
    "fwd_avg_bytes_bulk", "fwd_avg_packets_bulk", "fwd_avg_bulk_rate",
    "bwd_avg_bytes_bulk", "bwd_avg_packets_bulk", "bwd_avg_bulk_rate",
    "subflow_fwd_packets", "subflow_fwd_bytes",
    "subflow_bwd_packets", "subflow_bwd_bytes",
    "init_win_bytes_forward", "init_win_bytes_backward",
    "act_data_pkt_fwd", "min_seg_size_forward",
    "active_mean", "active_std", "active_max", "active_min",
    "idle_mean", "idle_std", "idle_max", "idle_min")

  /** Deterministic training label (stands in for CIC's Label column,
    * cleaned per train_rf.py:30-33).
    */
  def withLabel(flows: DataFrame): DataFrame = {
    import flows.sparkSession.implicits._
    flows.withColumn("binary_label",
      when($"flow_packets_s" >= 1 && $"total_fwd_packets" + $"total_backward_packets" >= 8, 1.0)
        .otherwise(0.0))
  }

  def pipeline(numTrees: Int = 100, maxDepth: Int = 6): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
    val rf = new RandomForestClassifier()
      .setLabelCol("binary_label").setFeaturesCol("features")
      .setNumTrees(numTrees).setMaxDepth(maxDepth)
      .setImpurity("gini").setFeatureSubsetStrategy("sqrt")
      .setSeed(42)
    new Pipeline().setStages(Array(assembler, rf))
  }

  case class TrainResult(model: PipelineModel, metrics: Map[String, Double],
      confusion: DataFrame)

  /** train_rf.py end-to-end: 80/20 split (seed 42), fit, confusion
    * matrix, four evaluator passes.
    */
  def train(labeledFlows: DataFrame, numTrees: Int = 100): TrainResult = {
    val Array(tr, te) = labeledFlows.randomSplit(Array(0.8, 0.2), 42)
    val model = pipeline(numTrees).fit(tr)
    val pred = model.transform(te)
    val ev = new MulticlassClassificationEvaluator()
      .setLabelCol("binary_label").setPredictionCol("prediction")
    val metrics = Seq("accuracy", "weightedPrecision", "weightedRecall", "f1")
      .map(m => m -> ev.setMetricName(m).evaluate(pred)).toMap
    val confusion = pred.groupBy("binary_label", "prediction").count()
      .orderBy("binary_label", "prediction")
    TrainResult(model, metrics, confusion)
  }

  /** P2 label mapping on scored rows (main.py:1090). */
  def score(model: PipelineModel, flows: DataFrame): DataFrame = {
    import flows.sparkSession.implicits._
    model.transform(flows)
      .withColumn("Label", when($"prediction" === 1.0, "DDoS").otherwise("Normal"))
  }

  /** Full train+score cycle on the driver tables. Per-row RF
    * predictions depend on partition-level sampling (randomSplit +
    * feature subsampling are partition-order-sensitive), so no
    * cross-engine oracle can pin them row-by-row. Instead the query
    * emits the model-quality invariant that IS deterministic: the flow
    * count and a boolean asserting scored-vs-rule agreement ≥ 0.9 over
    * the full table — a wildly wrong model (or a broken feature/label
    * chain) flips the boolean and fails the hash gate, the same
    * tolerance-oracle pattern as q_approx_distinct_users. Per-row
    * deterministic scoring coverage lives in q_rf_pretrained_score.
    */
  val qRfScore = Q(
    "q_rf_train_score",
    (spark, dir) => {
      import spark.implicits._
      // cache the assembled training table: RF makes O(depth × trees)
      // passes and must not re-run the featurizer windows each time;
      // flow tables are tiny relative to the packet stream, so a few
      // partitions suffice
      val flows = withLabel(BatchFlowFeaturizer.flowsView(spark, dir))
        .repartition(4).cache()
      try {
        val res = train(flows)
        val agg = score(res.model, flows)
          .agg(
            count(lit(1)).as("n_flows"),
            (avg(when($"prediction" === $"binary_label", 1.0).otherwise(0.0)) >= 0.9)
              .as("agree_ok"))
        // materialize the 1-row summary while the training cache is
        // still alive — returning it lazily would re-run the whole
        // featurizer chain after the finally-unpersist below
        val row = agg.collect().toSeq
        spark.createDataFrame(spark.sparkContext.parallelize(row, 1), agg.schema)
      } finally flows.unpersist(blocking = false)
    },
    Some(s"""WITH feats AS (${graft.flow.FlowFeatureSql.oracleBody})
SELECT count(*) AS n_flows, true AS agree_ok FROM feats""")
  )

  /** Gradient-boosted trees over the same feature chain — the second
    * ensemble family a complete ML surface carries (sequential boosting
    * vs RF's bagging: can't parallelize across trees, so iterations are
    * kept at 10 — each is a full pass over the cached training table).
    * Same agreement-boolean oracle pattern as the RF cycle: per-row
    * predictions are sampling-order-sensitive, the ≥0.9 scored-vs-rule
    * agreement over the full table is not.
    */
  val qGbtScore = Q(
    "q_gbt_train_score",
    (spark, dir) => {
      import org.apache.spark.ml.Pipeline
      import org.apache.spark.ml.classification.GBTClassifier
      import org.apache.spark.ml.feature.VectorAssembler
      import spark.implicits._
      val flows = withLabel(BatchFlowFeaturizer.flowsView(spark, dir))
        .repartition(4).cache()
      try {
        val assembler = new VectorAssembler()
          .setInputCols(featureCols.toArray).setOutputCol("features")
          .setHandleInvalid("skip")
        val gbt = new GBTClassifier()
          .setLabelCol("binary_label").setFeaturesCol("features")
          .setMaxIter(10).setMaxDepth(4).setSeed(42)
        val Array(tr, te) = flows.randomSplit(Array(0.8, 0.2), 42)
        val model = new Pipeline().setStages(Array(assembler, gbt)).fit(tr)
        val agg = model.transform(flows)
          .agg(
            count(lit(1)).as("n_flows"),
            (avg(when($"prediction" === $"binary_label", 1.0).otherwise(0.0)) >= 0.9)
              .as("agree_ok"))
        val row = agg.collect().toSeq
        spark.createDataFrame(spark.sparkContext.parallelize(row, 1), agg.schema)
      } finally flows.unpersist(blocking = false)
    },
    Some(s"""WITH feats AS (${graft.flow.FlowFeatureSql.oracleBody})
SELECT count(*) AS n_flows, true AS agree_ok FROM feats""")
  )

  val all: Seq[Q] = Seq(qRfScore, qGbtScore)
}
