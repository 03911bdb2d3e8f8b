package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Oracle-gated stream-stream join: clicks and errors are two
  * independent watermarked streams (both fed from the events file
  * source), inner-joined on user with an event-time range — "errors
  * within 2 hours after a click". The batch oracle states the same
  * interval join relationally.
  *
  * Scale semantics: both sides carry a watermark and the join predicate
  * bounds event-time distance in BOTH directions (e.ts ≥ c.ts AND
  * e.ts ≤ c.ts + 2 h; the 10 min is the WATERMARK, not the range), so
  * each side's buffered state is GC-able once
  * the other side's watermark passes — the state store holds a sliding
  * ~(watermark + range) horizon per side, not the whole stream. Inner
  * matches emit as soon as both rows are present (no watermark-end
  * withholding — that caveat is append-mode AGGREGATION, not inner
  * joins), so a terminating AvailableNow run is complete.
  */
object StreamJoin {

  private val RangeUs: Long = 7200L * 1000000

  private val oracle = Some(s"""
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'click'),
e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'error')
SELECT c.user_id AS user_id, c.event_id AS click_id, e.event_id AS error_id,
       e.ts_us - c.ts_us AS lag_us
FROM c JOIN e ON c.user_id = e.user_id
            AND e.ts_us >= c.ts_us AND e.ts_us <= c.ts_us + $RangeUs
ORDER BY c.user_id, click_id, error_id""")

  val qStreamStreamJoin = Q(
    "q_stream_stream_join",
    (spark, dir) => {
      import spark.implicits._
      def side(tpe: String, prefix: String) =
        graft.Tables.eventsStream(spark, dir)
          .where($"event_type" === tpe)
          .select(
            $"user_id".as(s"${prefix}_user"),
            $"event_id".as(s"${prefix}_id"),
            expr("CAST(ts DIV 1000 AS BIGINT)").as(s"${prefix}_ts_us"),
            timestamp_micros(expr("CAST(ts DIV 1000 AS BIGINT)")).as(s"${prefix}_time"))
          .withWatermark(s"${prefix}_time", "10 minutes")
      val sinkName = graft.GraftSession.newSinkName(spark, "ssj")
      // stream-stream joins open FOUR state stores per partition (2
      // sides × 2 store families) — see withStreamingShuffle. Floor
      // tuning, measured (StreamFloorProbe, sf0.1, steady-state):
      // the no-data watermark batch cost ~0.9 s of pure state-store
      // commits for ZERO rows — and an INNER interval join's emissions
      // are complete without it (it only evicts state), so it is
      // skipped; the left join below keeps it (null emissions NEED the
      // final watermark advance). Partition count is the adaptive
      // input-size rule with storesPerPartition = 4, which reproduces
      // the measured local optimum (8 partitions: 2.9 s total; 2:
      // 1.9 s; 1 regresses to 2.3 s — the join loses parallelism) and
      // grows with the stream instead of staying a local constant.
      // On a cluster with real volume the no-data batch flips back on
      // for liveness.
      graft.GraftSession.withStreamingShuffle(spark,
        graft.GraftSession.adaptiveStreamParts(spark, dir, storesPerPartition = 4, floor = graft.GraftSession.MinStreamParts),
        noDataBatch = false) {
        val q = side("click", "c")
          .join(side("error", "e"),
            expr(s"""c_user = e_user AND
                     e_time >= c_time AND
                     e_time <= c_time + INTERVAL 2 HOURS"""))
          .select($"c_user".as("user_id"), $"c_id".as("click_id"),
            $"e_id".as("error_id"), ($"e_ts_us" - $"c_ts_us").as("lag_us"))
          .writeStream.outputMode("append")
          .format("memory").queryName(sinkName)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      spark.table(sinkName).orderBy("user_id", "click_id", "error_id")
    },
    oracle)

  /** The same interval join in batch (the plan a user writes when the
    * data is at rest) — gated by the identical oracle, so the two
    * spellings are proven equal.
    */
  val qIntervalJoin = Q(
    "q_interval_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"user_id", $"event_id", $"event_type",
          expr("CAST(ts DIV 1000 AS BIGINT)").as("ts_us"))
      val c = ev.where($"event_type" === "click")
        .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"ts_us".as("c_ts"))
      val e = ev.where($"event_type" === "error")
        .select($"user_id".as("e_user"), $"event_id".as("error_id"), $"ts_us".as("e_ts"))
      c.join(e, $"c_user" === $"e_user" &&
          $"e_ts" >= $"c_ts" && $"e_ts" <= $"c_ts" + RangeUs)
        .select($"c_user".as("user_id"), $"click_id", $"error_id",
          ($"e_ts" - $"c_ts").as("lag_us"))
        .orderBy("user_id", "click_id", "error_id")
    },
    oracle)

  /** Watermark horizon of the streams (10 minutes, µs). */
  private val WmUs: Long = 600L * 1000000

  /** LEFT OUTER stream-stream join — the shape with real state-expiry
    * semantics: a click with no error in its 2-hour window emits a
    * NULL-error row only when the GLOBAL watermark (min over inputs of
    * max-event-time − 10 min) passes the click's join horizon
    * (c_ts + 2 h), because until then a matching error could still
    * arrive. The oracle states exactly that: matched rows are the
    * inner interval join; null rows are the anti-joined clicks whose
    * horizon the final watermark passed. Clicks still inside the
    * horizon at end-of-stream are CORRECTLY absent — asserting the
    * full batch left-join here would demand results a streaming engine
    * cannot soundly emit. `noDataMicroBatches` (default on) runs the
    * final watermark-advancing batch under AvailableNow, so the run
    * terminates with state flushed to that horizon deterministically.
    *
    * Floor (measured, `artifacts/FLOOR_r15_left_join.txt`): that final
    * batch costs ~0.85 s at sf0.1 — ~650-780 ms of addBatch for ZERO
    * rows, i.e. the per-micro-batch state-store open/commit floor of
    * 2 partitions × 4 join store families — and it is irreducible: a
    * synthetic max-ts row per side would advance the watermark
    * "in-band" but Spark only applies a batch's recomputed watermark
    * (and emits these NULLs) in the NEXT batch, so the trick buys a
    * 2-row data batch with the identical store-commit floor plus a
    * second source's offset tracking. Left-outer null emission
    * semantically requires a second batch; this query pays exactly
    * one.
    */
  val qStreamStreamLeftJoin = Q(
    "q_stream_stream_left_join",
    (spark, dir) => {
      import spark.implicits._
      def side(tpe: String, prefix: String) =
        graft.Tables.eventsStream(spark, dir)
          .where($"event_type" === tpe)
          .select(
            $"user_id".as(s"${prefix}_user"),
            $"event_id".as(s"${prefix}_id"),
            expr("CAST(ts DIV 1000 AS BIGINT)").as(s"${prefix}_ts_us"),
            timestamp_micros(expr("CAST(ts DIV 1000 AS BIGINT)")).as(s"${prefix}_time"))
          .withWatermark(s"${prefix}_time", "10 minutes")
      val sinkName = graft.GraftSession.newSinkName(spark, "ssjl")
      // adaptive partitions like the inner join (4 stores/partition);
      // the no-data batch STAYS — the final watermark advance is what
      // emits the expired-click nulls
      graft.GraftSession.withStreamingShuffle(spark,
        graft.GraftSession.adaptiveStreamParts(spark, dir, storesPerPartition = 4, floor = graft.GraftSession.MinStreamParts)) {
        val q = side("click", "c")
          .join(side("error", "e"),
            expr(s"""c_user = e_user AND
                     e_time >= c_time AND
                     e_time <= c_time + INTERVAL 2 HOURS"""),
            "leftOuter")
          .select($"c_user".as("user_id"), $"c_id".as("click_id"),
            $"e_id".as("error_id"), ($"e_ts_us" - $"c_ts_us").as("lag_us"))
          .writeStream.outputMode("append")
          .format("memory").queryName(sinkName)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      spark.table(sinkName).orderBy("user_id", "click_id", "error_id")
    },
    Some(s"""
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'click'),
e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'error'),
wm AS (SELECT least((SELECT max(ts_us) FROM c), (SELECT max(ts_us) FROM e)) - $WmUs AS wm_us),
matched AS (SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
                   e.ts_us - c.ts_us AS lag_us
            FROM c JOIN e ON c.user_id = e.user_id
                         AND e.ts_us >= c.ts_us AND e.ts_us <= c.ts_us + $RangeUs),
expired AS (SELECT c.user_id, c.event_id AS click_id,
                   CAST(NULL AS BIGINT) AS error_id, CAST(NULL AS BIGINT) AS lag_us
            FROM c CROSS JOIN wm
            WHERE c.ts_us + $RangeUs < wm.wm_us
              AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.event_id))
SELECT user_id, click_id, error_id, lag_us FROM matched
UNION ALL
SELECT user_id, click_id, error_id, lag_us FROM expired
ORDER BY user_id, click_id, error_id"""))

  val all: Seq[Q] = Seq(qStreamStreamJoin, qIntervalJoin, qStreamStreamLeftJoin)
}
