package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch CSV ingestion of CIC-style labeled flow tables (S3/P5/P6/P9/P10:
  * train_rf.py:16-40, predict_rf.py:15-33): header read, column-name
  * normalization (strip, space/dot → underscore), metadata-column drop,
  * ±inf scrub to null, null-row drop.
  *
  * The reference relies on inferSchema (an extra full scan at scale);
  * `load` accepts an explicit schema and only falls back to inference
  * when none is given.
  */
object CsvFlows {

  /** train_rf.py:26-27 */
  val MetaCols: Seq[String] = Seq(
    "Unnamed:_0", "Flow_ID", "Source_IP", "Destination_IP", "Timestamp",
    "SimillarHTTP", "Inbound")

  def cleanName(c: String): String =
    c.trim.replace(" ", "_").replace(".", "_")

  def load(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = spark.read.option("header", "true")
    val df = schema match {
      case Some(s) => reader.schema(s).csv(path)
      case None    => reader.option("inferSchema", "true").csv(path)
    }
    df.toDF(df.columns.map(cleanName).toIndexedSeq: _*)
  }

  def dropMeta(df: DataFrame): DataFrame =
    df.drop(MetaCols.filter(df.columns.contains): _*)

  /** P9/P10: per-column ±inf → null, then drop null rows. */
  def scrubInf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val scrubbed = cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isin(Double.PositiveInfinity, Double.NegativeInfinity), lit(null))
          .otherwise(col(c)))
    }
    scrubbed.na.drop()
  }

  /** P7/P8: Label cleaning + binary derivation (train_rf.py:30-33). */
  def withBinaryLabel(df: DataFrame): DataFrame =
    df.withColumn("Label", upper(trim(col("Label"))))
      .withColumn("binary_label",
        when(col("Label") === "BENIGN", 0.0).otherwise(1.0))
}
