package graft.operators

import graft.Q

/** Data-layout operators: Z-order (Morton) curve keys, the standard
  * multi-dimensional clustering trick for min/max data skipping.
  *
  * A 100 TB table filtered on TWO columns cannot be range-pruned by a
  * linear sort on either one; writing it clustered by the interleaved-bit
  * Morton key keeps rows close in (x, y) space close in file order, so
  * parquet row-group min/max statistics prune both predicates at once.
  * The curve key here is pure integer bit arithmetic — `(x >> i) & 1`
  * terms scaled by power-of-two literals — rendered identically for
  *  Spark and DuckDB, so the oracle gates the actual interleaving.
  *
  * The catalog query aggregates per z-bucket (bounded output, one
  * map-side-combinable shuffle); [[graft.operators.SketchLayoutSpec]]-side
  * tests pin the interleave/deinterleave roundtrip and the skipping
  * benefit of a z-sorted write.
  */
object Layout {

  /** Bits per dimension (8 → 16-bit Morton key, 256 z-buckets). */
  private val Bits = 8

  /** Morton-interleave two `Bits`-bit non-negative ints: x occupies even
    * bit positions, y odd. Spelled as a sum of literal-scaled bit
    * extractions — no shift-left needed, so it renders on both dialects.
    */
  private def interleave(d: SqlDialect, x: String, y: String): String =
    (0 until Bits)
      .flatMap { i =>
        Seq(
          s"((${d.shr(x, i.toString)}) & 1) * CAST(${1L << (2 * i)} AS BIGINT)",
          s"((${d.shr(y, i.toString)}) & 1) * CAST(${1L << (2 * i + 1)} AS BIGINT)")
      }
      .mkString("(", " + ", ")")

  /** Per-z-bucket profile of orders laid out on a (custkey, price-band)
    * Morton curve: bucket population plus the exact x/y envelope each
    * bucket covers — the quantity min/max skipping would consult.
    */
  private def zorderSql(d: SqlDialect): String = {
    val z = interleave(d, "x", "y")
    s"""
WITH o AS (SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
                  CAST((${d.idiv(s"CAST(round(o_totalprice * 100, 0) AS BIGINT)", "100000")}) % 256 AS BIGINT) AS y
           FROM orders),
z AS (SELECT x, y, $z AS zval FROM o)
SELECT ${d.idiv("zval", "256")} AS z_bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(zval) AS z_min, max(zval) AS z_max,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM z
GROUP BY ${d.idiv("zval", "256")}
ORDER BY z_bucket"""
  }

  val qZorderCurve = Q(
    "q_zorder_curve",
    (spark, dir) => {
      graft.Tables.orders(spark, dir).createOrReplaceTempView("orders")
      spark.sql(zorderSql(SparkSql))
    },
    Some(zorderSql(DuckSql)))

  val all: Seq[Q] = Seq(qZorderCurve)
}
