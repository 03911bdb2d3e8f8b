package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured (JSON) column processing — the schema-on-read step a
  * 100 TB log/training pipeline runs before anything relational: parse a
  * JSON string column against a declared schema, surface malformed rows
  * as nulls, and aggregate the extracted fields.
  *
  * The reference decodes its packet JSON the same way (`from_json` with
  * an explicit schema over the Kafka value, spark_app/main.py — see
  * ingest.PacketIngest for that path); this operator is the batch
  * column-level counterpart on `events.props`.
  *
  * Scale: `from_json` is a per-row projection (no shuffle, stays inside
  * whole-stage codegen), and the declared 1-field schema means Jackson
  * parses exactly one key instead of materializing a map — the
  * aggregation after it is an ordinary map-side-combinable hash agg on
  * a 5-value key. Malformed JSON must NOT kill a 100 TB job: the
  * PERMISSIVE default yields a null struct, counted here explicitly.
  */
object SemiStructured {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  val qJsonExtract = Q(
    "q_json_extract",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select($"event_type",
          from_json($"props", propsSchema).getField("k").as("k"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count($"k").as("n_with_k"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
WITH x AS (SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT event_type, count(*) AS n_events, count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY event_type ORDER BY event_type""")
  )

  /** The Spark-4-native semi-structured path: VARIANT. Where
    * [[qJsonExtract]] parses against a DECLARED schema (the right call
    * when the shape is known), `parse_json` → VariantType keeps the
    * full document in a binary-encoded form that `variant_get` then
    * path-extracts with per-call types — schema-on-read without
    * committing to a schema at parse time, the shape evolving-log
    * pipelines need. `try_parse_json` yields NULL on malformed input
    * instead of failing the job; one fabricated malformed row rides
    * along (same row on the oracle side) so the null path is actually
    * exercised, not just available. Per-row projections only — no
    * shuffle before the 5-key hash agg, same scale posture as the
    * schema'd variant.
    */
  val qVariantExtract = Q(
    "q_variant_extract",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir).select($"event_type", $"props")
        .unionAll(Seq(("error", "{not json")).toDF("event_type", "props"))
      ev
        .select($"event_type", try_parse_json($"props").as("v"))
        .select($"event_type", $"v",
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count($"v").as("n_parsed"),
          count($"k").as("n_with_k"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
WITH ev AS (SELECT event_type, props FROM events
            UNION ALL SELECT 'error', '{not json'),
x AS (SELECT event_type,
             CASE WHEN json_valid(props) THEN 1 END AS parsed,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
      FROM ev)
SELECT event_type, count(*) AS n_events, count(parsed) AS n_parsed,
       count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY event_type ORDER BY event_type""")
  )

  /** Calendar rollup — gates the date-function surface (truncation to
    * civil days, day-of-week numbering) whose conventions differ across
    * engines: Spark's `dayofweek` is 1=Sunday while DuckDB's `isodow`
    * is 1=Monday, so both sides are spelled onto the ISO convention
    * (Spark `weekday`+1). Days are derived from the µs timestamp in
    * UTC (the session timezone both engines run). One map-side
    * combinable aggregate on ~30 day keys.
    */
  val qCalendar = Q(
    "q_calendar_rollup",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select(expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))").as("t"), $"value")
        .select(
          date_format($"t", "yyyy-MM-dd").as("day"),
          (weekday($"t") + 1).cast("bigint").as("iso_dow"),
          $"value")
        .groupBy($"day", $"iso_dow")
        .agg(
          count(lit(1)).as("n"),
          sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("value_cents"))
        .orderBy($"day")
    },
    Some("""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(isodow(ts) AS BIGINT) AS iso_dow,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2 ORDER BY day""")
  )

  val all: Seq[Q] = Seq(qJsonExtract, qVariantExtract, qCalendar)
}
