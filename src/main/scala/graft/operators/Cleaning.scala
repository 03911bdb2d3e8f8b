package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's batch cleaning surface (train_rf.py:16-48,
  * predict_rf.py:15-33): column rename/normalization, string cleaning,
  * binary label derivation, ±inf scrubbing to null, null-row drop, and
  * the label-distribution / confusion-matrix hash aggregates.
  *
  * Scale: pure narrow projections + filters — fully codegen'd, pushed
  * onto the scan; the aggregates are map-side-combinable two-column
  * groupBys. Nothing here shuffles more than the final tiny agg.
  */
object Cleaning {

  /** P5-P11 pipeline. Infs are injected deterministically (the driver
    * tables contain none), scrubbed with the reference's isin(±inf)→null
    * pattern, then dropped via na.drop — the surviving rows are what the
    * oracle reproduces with a WHERE filter.
    */
  def cleaned(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val raw = events
      .withColumn("maybe_inf",
        when($"event_id" % 97 === 0, lit(Double.PositiveInfinity)).otherwise($"value"))
      .withColumn("maybe_neg",
        when($"event_id" % 89 === 0, lit(Double.NegativeInfinity)).otherwise(-$"value"))
    val scrubbed = Seq("maybe_inf", "maybe_neg").foldLeft(raw) { (df, c) =>
      df.withColumn(c,
        when(col(c).isin(Double.PositiveInfinity, Double.NegativeInfinity), lit(null))
          .otherwise(col(c)))
    }
    scrubbed
      .na.drop(Seq("maybe_inf", "maybe_neg"))
      .withColumn("label", upper(trim(concat(lit("  "), $"event_type", lit(" ")))))
      .withColumn("binary_label", when($"label" === "VIEW", 0.0).otherwise(1.0))
      .select("event_id", "maybe_inf", "maybe_neg", "label", "binary_label")
  }

  private val cleanedOracle = """
    SELECT event_id,
           value AS maybe_inf,
           -value AS maybe_neg,
           upper(trim('  ' || event_type || ' ')) AS label,
           CAST(CASE WHEN upper(trim('  ' || event_type || ' ')) = 'VIEW' THEN 0.0 ELSE 1.0 END AS DOUBLE) AS binary_label
    FROM events
    WHERE event_id % 97 <> 0 AND event_id % 89 <> 0"""

  val qCleanPipeline = Q(
    "q_clean_scrub_label",
    (spark, dir) => cleaned(Tables.events(spark, dir)).orderBy("event_id"),
    Some(s"$cleanedOracle ORDER BY event_id")
  )

  /** A2: label distribution (train_rf.py:48). */
  val qLabelDist = Q(
    "q_label_distribution",
    (spark, dir) =>
      cleaned(Tables.events(spark, dir))
        .groupBy("binary_label").count().orderBy("binary_label"),
    Some(s"""SELECT binary_label, count(*) AS count FROM ($cleanedOracle)
             GROUP BY binary_label ORDER BY binary_label""")
  )

  /** A2: confusion matrix shape (train_rf.py:92) against a threshold
    * stand-in classifier.
    */
  val qConfusion = Q(
    "q_confusion_matrix",
    (spark, dir) => {
      import spark.implicits._
      cleaned(Tables.events(spark, dir))
        .withColumn("prediction", when($"maybe_inf" > 50.0, 1.0).otherwise(0.0))
        .groupBy("binary_label", "prediction").count()
        .orderBy("binary_label", "prediction")
    },
    Some(s"""SELECT binary_label,
                    CAST(CASE WHEN maybe_inf > 50.0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS prediction,
                    count(*) AS count
             FROM ($cleanedOracle)
             GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  val all: Seq[Q] = Seq(qCleanPipeline, qLabelDist, qConfusion)
}
