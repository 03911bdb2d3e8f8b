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

  /** Source/sink format gate as an oracle query family: write the
    * events table through the given format's distributed sink, read it
    * back with an explicit schema, and aggregate — the DuckDB oracle
    * computes the same aggregate from the PARQUET table, so any loss in
    * the round trip (header handling, type parsing, double formatting —
    * Spark writes shortest-round-trip decimals) breaks the hash. The
    * timestamp rides as epoch-nano BIGINT (the text-safe spelling);
    * comparison is at µs because DuckDB reads parquet TIMESTAMP(NANOS)
    * at µs precision, and min/max not sum because a BIGINT sum of nano
    * epochs overflows in Spark where DuckDB silently widens.
    *
    * Bench note: this query's time is dominated by the tmp-dir write
    * leg and is I/O-contention-prone — the r7 driver bench's 1.85 s
    * outlier (vs 0.86 s in r6) did not reproduce across 3 clean r8
    * runs (0.45/0.63/0.48 s, same plan), so treat >2× moves here as
    * noise unless they repeat.
    */
  def roundtripQuery(fmt: String): graft.Q = graft.Q(
    s"q_${fmt}_roundtrip",
    (spark, dir) => {
      import org.apache.spark.sql.types._
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_${fmt}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      // xml needs its record-framing tag on both legs (csv's `header`
      // is ignored by the other writers, rowTag by the non-xml ones)
      val fmtOpts = if (fmt == "xml") Map("rowTag" -> "event") else Map.empty[String, String]
      // XML only: the StAX encode is CPU-bound per row, and the small-SF
      // events table arrives as ONE parquet split, so the encode leg ran
      // as a single task while every other core idled (guide §2.5's
      // unsplittable-input shape). Round-robin repartition to the
      // session's parallelism moves 5 narrow columns once; same-window
      // A/B at sf0.1: xml 1.46 -> 0.97 s, but csv 0.67 -> 0.97 and
      // orc 0.57 -> 0.82 — for cheap encoders the exchange plus
      // many-small-files overhead LOSES at this volume (guide §6 sizes
      // output files by bytes, and 2 MB is correctly one file), so only
      // the CPU-heavy format pays for parallelism. Aggregation output
      // is partition-order invariant (BIGINT sums/min/max).
      val src = graft.Tables.events(spark, dir)
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      val writeSrc =
        if (fmt == "xml") src.repartition(spark.sparkContext.defaultParallelism)
        else src
      writeSrc
        .write.mode("overwrite").option("header", "true").options(fmtOpts).format(fmt).save(tmp)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val back =
        if (fmt == "csv") load(spark, tmp, Some(schema))
        else spark.read.schema(schema).options(fmtOpts).format(fmt).load(tmp)
      back
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("event_id")).as("sum_ids"),
          min(expr("ts DIV 1000")).as("min_ts_us"),
          max(expr("ts DIV 1000")).as("max_ts_us"),
          sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("value_cents"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
       CAST(sum(event_id) AS BIGINT) AS sum_ids,
       CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type ORDER BY event_type"""))

  /** csv (S3 proper) + orc + json + xml (the former spark-xml StAX
    * source, bundled in Spark 4's core) — every bundled format a
    * reference user could bring data in as. Parquet is every other
    * query's scan. (Avro is NOT bundled: spark-sql 4.1 carries the
    * shim classes but the datasource registration lives in the
    * external spark-avro module, absent from /opt/spark/jars — probed
    * and reverted r12.)
    */
  /** Schema-evolution read: two parquet file sets under one table path
    * with DIFFERENT column sets (the shape of a table whose schema grew
    * over time), read back as one relation via partition discovery +
    * `mergeSchema` — rows from the older layout surface the added
    * column as null. The oracle restates the union with explicit NULL
    * placeholders from the source table. At 100 TB schema merge costs
    * one footer read per file at planning time, nothing at execution.
    */
  def schemaMergeQuery: graft.Q = graft.Q(
    "q_schema_merge",
    (spark, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_merge_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val ev = graft.Tables.events(spark, dir)
      ev.where(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"))
        .write.mode("overwrite").parquet(s"$tmp/gen=1")
      ev.where(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .write.mode("overwrite").parquet(s"$tmp/gen=2")
      spark.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy(col("gen").cast("bigint").as("gen"))
        .agg(
          count(lit(1)).as("n"),
          count(col("user_id")).as("n_user"),
          count(col("event_type")).as("n_type"),
          sum(col("event_id")).as("sum_ids"))
        .orderBy("gen")
    },
    Some("""
WITH m AS (
  SELECT 1 AS gen, event_id, user_id, NULL AS event_type
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT 2, event_id, user_id, event_type
  FROM events WHERE event_id % 2 = 1)
SELECT CAST(gen AS BIGINT) AS gen, count(*) AS n, count(user_id) AS n_user,
       count(event_type) AS n_type, CAST(sum(event_id) AS BIGINT) AS sum_ids
FROM m GROUP BY gen ORDER BY gen"""))

  /** Hive-style partitioned layout + partition pruning: write events
    * partitioned by event_type, then read back filtering ONE partition
    * value — at 100 TB the filter must prune at PLANNING time (directory
    * listing), not scan-and-discard; PartitionedScanSpec asserts the
    * plan shows it as a PartitionFilter with only the matching files
    * read. The oracle recomputes the same aggregate with a WHERE on the
    * source table.
    */
  def partitionedScanQuery: graft.Q = graft.Q(
    "q_partitioned_scan",
    (spark, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_part_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val src = graft.Tables.events(spark, dir)
        .selectExpr("event_id", "user_id", "value", "event_type")
      src.write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      // schema-on-read, not inference: an empty day writes a partitioned
      // table with ZERO partition directories, and schema inference then
      // throws UNABLE_TO_INFER_SCHEMA — the declared schema (partition
      // column included) keeps the read planning-time cheap on a large
      // store and empty-input-safe (EmptyCorpusSpec)
      spark.read.schema(src.schema).parquet(tmp)
        .where(col("event_type") === "purchase")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("value_cents"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events WHERE event_type = 'purchase'
GROUP BY event_type ORDER BY event_type"""))

  /** Codec gate: parquet written with zstd (the compression a 100 TB
    * store actually uses — ~2× smaller than snappy at similar scan
    * cost) must round-trip bit-exactly. Same aggregate oracle as the
    * format family.
    */
  def zstdRoundtripQuery: graft.Q = graft.Q(
    "q_parquet_zstd_roundtrip",
    (spark, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_zstd_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.Tables.events(spark, dir)
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").option("compression", "zstd").parquet(tmp)
      spark.read.parquet(tmp)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("event_id")).as("sum_ids"),
          min(expr("ts DIV 1000")).as("min_ts_us"),
          max(expr("ts DIV 1000")).as("max_ts_us"),
          sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("value_cents"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
       CAST(sum(event_id) AS BIGINT) AS sum_ids,
       CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY event_type ORDER BY event_type"""))

  def roundtripQueries: Seq[graft.Q] =
    Seq("csv", "orc", "json", "xml").map(roundtripQuery) :+ schemaMergeQuery :+
      partitionedScanQuery :+ zstdRoundtripQuery
}
