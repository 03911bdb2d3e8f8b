package graft.ml

import graft.Q
import graft.flow.{BatchFlowFeaturizer, FlowFeatureSql}
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch scoring with the reference's PRETRAINED model
  * (predict_rf.py:15-52): load the persisted Spark 3.3.4
  * VectorAssembler+RandomForest pipeline, run the P5/P6/P9/P10 cleaning
  * chain, score, map predictions to DDoS/Normal labels (P2). The NDJSON
  * write (K3, replacing predict_rf.py:43's toPandas collect) is
  * exercised by PretrainedRfSpec.
  *
  * Correctness: unlike q_rf_train_score (whose model is fit at query
  * time), the pretrained forest is a fixed artifact — so its scoring IS
  * cross-engine checkable: TreeSql compiles the 100 trees into vote
  * expressions the DuckDB oracle evaluates over the same flow-feature
  * CTE, reproducing MLlib's prediction (and the raw class-1 vote sum)
  * bit-for-bit.
  *
  * Scale: model load is a driver-side one-off; scoring is a stateless
  * per-row projection (the property the reference exploits to score a
  * stream, main.py:1087) — embarrassingly parallel at any data size.
  */
object PretrainedRf {

  val ModelPath = "/root/reference/spark_app/ml_model/rf_binary_model"

  /** Loaded once per JVM; MLlib persistence is language- and
    * version-neutral here (3.3.4 artifact in 4.1, proven by
    * RfDetectorSpec's load test).
    */
  lazy val model: PipelineModel = {
    // model load needs an active SparkContext; tools that touch the
    // catalog before building their session get a small local one
    if (SparkSession.getActiveSession.isEmpty && SparkSession.getDefaultSession.isEmpty)
      graft.GraftSession.getOrCreate("2")
    PipelineModel.load(ModelPath)
  }

  def assembler: VectorAssembler = model.stages(0).asInstanceOf[VectorAssembler]
  def rf: RandomForestClassificationModel = model.stages(1).asInstanceOf[RandomForestClassificationModel]

  /** predict_rf.py:16-33 on the flow-feature table: P6 name
    * normalization is a no-op (featurizer output is already
    * clean snake_case = the model's inputCols), P5 drops the id/meta
    * columns, P9 scrubs ±inf to null, P10 drops null rows. The scrub
    * and drop are structural no-ops on exact BIGINT features (no inf
    * can exist) — kept so the chain matches the reference's shape.
    */
  def cleaned(flows: DataFrame): DataFrame = {
    val featCols = assembler.getInputCols.toSeq
    val dropped = flows.drop("source_ip", "destination_ip", "timestamp_us")
    val scrubbed = dropped.select(dropped.columns.toSeq.map { c =>
      if (featCols.contains(c))
        when(col(c).isin(Double.PositiveInfinity, Double.NegativeInfinity), lit(null))
          .otherwise(col(c)).as(c)
      else col(c)
    }: _*)
    scrubbed.na.drop(featCols)
  }

  /** Score + P2 label mapping; emits the raw class-1 vote sum so the
    * oracle checks the vote arithmetic itself, not just its sign.
    */
  def score(flows: DataFrame): DataFrame = {
    import flows.sparkSession.implicits._
    model.transform(cleaned(flows))
      .withColumn("Label", when($"prediction" === 1.0, "DDoS").otherwise("Normal"))
      .select($"flow_id",
        vector_to_array($"rawPrediction").getItem(1).as("ddos_votes"),
        $"prediction", $"Label")
  }

  /** Compiled-forest scoring: identical predictions to [[score]] but
    * evaluated entirely as SQL expressions inside whole-stage codegen —
    * no VectorAssembler, no MLlib transform, no model objects on the
    * executors. This is the 100 TB deployment shape for a frozen model:
    * the forest becomes a pure projection any Spark (or SQL) reader can
    * run, and the scan/filter pushdown around it stays intact. At bench
    * SF the row is dominated by fixed costs (Janino compiling the
    * ~0.6 MB expression, plus whichever of the two RF queries runs
    * first paying the one-off model load) — the per-row advantage only
    * materializes once row count amortizes the compile, exactly like
    * every whole-stage-codegen trade.
    */
  /** The two vote expressions parsed ONCE per JVM: the rendered forest
    * is ~0.6 MB of SQL, and re-parsing it on every scoreCompiled call
    * made the query's steady-state cost ~1.3 s of DRIVER time at every
    * scale factor (measured identical at sf0.001 and sf0.1 — plan-time,
    * not execution; r17 VERDICT task 5's adjudication). Analysis of the
    * parsed tree still runs per query — only the parse is cacheable —
    * but it is the parse that dominates.
    */
  private lazy val voteCols: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val cols = assembler.getInputCols
    val feat = (i: Int) => cols(i)
    (expr(TreeSql.votesSql(rf, 0, feat)), expr(TreeSql.votesSql(rf, 1, feat)))
  }

  def scoreCompiled(flows: DataFrame): DataFrame = {
    cleaned(flows)
      .select(col("flow_id"), voteCols._1.as("v0"), voteCols._2.as("v1"))
      .selectExpr("flow_id",
        "v1 AS ddos_votes",
        s"${TreeSql.predictionSql()} AS prediction",
        s"CASE WHEN ${TreeSql.predCondition()} THEN 'DDoS' ELSE 'Normal' END AS Label")
  }

  private def oracle: String = {
    val cols = assembler.getInputCols
    val feat = (i: Int) => cols(i)
    s"""WITH feats AS (${FlowFeatureSql.oracleBody}),
scored AS (SELECT flow_id,
                  ${TreeSql.votesSql(rf, 0, feat)} AS v0,
                  ${TreeSql.votesSql(rf, 1, feat)} AS v1
           FROM feats)
SELECT flow_id, v1 AS ddos_votes,
       ${TreeSql.predictionSql()} AS prediction,
       CASE WHEN ${TreeSql.predCondition()} THEN 'DDoS' ELSE 'Normal' END AS Label
FROM scored ORDER BY flow_id"""
  }

  lazy val qPretrained: Q = Q(
    "q_rf_pretrained_score",
    (spark, dir) =>
      score(BatchFlowFeaturizer.flowsView(spark, dir))
        .orderBy("flow_id"),
    Some(oracle))

  /** Same result through the compiled path — the DuckDB oracle is
    * literally the same SQL, so this also proves the two engine-side
    * scorers agree (MLlib transform vs codegen'd expression tree).
    */
  lazy val qCompiled: Q = Q(
    "q_rf_compiled_score",
    (spark, dir) =>
      scoreCompiled(BatchFlowFeaturizer.flowsView(spark, dir))
        .orderBy("flow_id"),
    Some(oracle))

  def all: Seq[Q] = Seq(qPretrained, qCompiled)
}
