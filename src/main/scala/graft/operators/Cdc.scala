package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a log of keyed upsert/delete events
  * onto a base snapshot, latest-wins by (sequence, key). This is the
  * ingestion-side complement of the SCD2 history merge ([[Scd]]): CDC
  * apply produces the CURRENT state, SCD2 the full history.
  *
  * Spark shape: one window pass picks each key's latest change (shuffle
  * on key), one LEFT join applies it to the base — left, not full-outer,
  * because every change key here derives from the base so there are no
  * pure inserts (same key partitioning — AQE reuses the exchange);
  * deletes drop, upserts override, untouched rows pass through. A log
  * with genuine inserts would widen this to full-outer, which is the
  * [[Scd]] spelling. At 100 TB the change log is
  * usually far smaller than the snapshot, so the join broadcasts the
  * folded log; nothing ever scans the snapshot twice.
  *
  * The synthetic change log derives from the base (orders): even keys
  * get TWO changes (seq 1 reprice, seq 2 either delete — keys divisible
  * by 10 — or a second reprice), so latest-wins is genuinely exercised.
  * Money is exact cents throughout.
  */
object Cdc {

  private val oracle = Some("""
WITH base AS (SELECT o_orderkey AS key, o_orderstatus AS status,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
              FROM orders),
chg AS (SELECT key, 1 AS seq, 'U' AS op, cents + 100 AS cents FROM base WHERE key % 2 = 0
        UNION ALL
        SELECT key, 2 AS seq,
               CASE WHEN key % 10 = 0 THEN 'D' ELSE 'U' END AS op,
               cents + 200 AS cents
        FROM base WHERE key % 2 = 0),
latest AS (SELECT key, op, cents FROM (
             SELECT key, op, cents,
                    row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
             FROM chg)
           WHERE rn = 1)
SELECT b.key AS o_orderkey, b.status AS o_orderstatus,
       CASE WHEN l.key IS NULL THEN b.cents ELSE l.cents END AS cents,
       (l.key IS NOT NULL) AS was_updated
FROM base b LEFT JOIN latest l ON b.key = l.key
WHERE l.op IS NULL OR l.op <> 'D'
ORDER BY o_orderkey""")

  val qCdcApply = Q(
    "q_cdc_apply",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = Tables.orders(spark, dir)
        .select($"o_orderkey".as("key"), $"o_orderstatus".as("status"),
          expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      val even = base.where($"key" % 2 === 0)
      val chg = even.select($"key", lit(1).as("seq"), lit("U").as("op"),
          ($"cents" + 100).as("c_cents"))
        .unionAll(even.select($"key", lit(2).as("seq"),
          when($"key" % 10 === 0, "D").otherwise("U").as("op"),
          ($"cents" + 200).as("c_cents")))
      val latest = chg
        .withColumn("rn", row_number().over(
          Window.partitionBy($"key").orderBy($"seq".desc)))
        .where($"rn" === 1)
        .select($"key".as("l_key"), $"op", $"c_cents")
      base.join(latest, $"key" === $"l_key", "left")
        .where($"op".isNull || $"op" =!= "D")
        .select($"key".as("o_orderkey"), $"status".as("o_orderstatus"),
          when($"l_key".isNull, $"cents").otherwise($"c_cents").as("cents"),
          $"l_key".isNotNull.as("was_updated"))
        .orderBy($"o_orderkey")
    },
    oracle)

  val all: Seq[Q] = Seq(qCdcApply)
}
