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

  /** Bucketed co-located join, driver-gated: both fact sides are
    * written `bucketBy(8, key)` + sorted, then joined WITHOUT any
    * exchange — the layout investment that turns a repeated 100 TB
    * fact-fact join from shuffle-bound into local merge work (pay the
    * bucketed write once, join shuffle-free forever after).
    * [[BucketedJoinSpec]] pins the zero-Exchange plan; this query
    * gates the RESULT against the plain-join oracle so the bucketed
    * path provably computes the same relation.
    *
    * The writes go through [[StageViews.ensureSideEffect]], so one
    * session pays them once per corpus and bench itemizes them as a
    * stage build (`bkt_tables`) — the query's own time is then the
    * join-only cost, which is the number that proves the zero-Exchange
    * payoff (r11: 9.5 s sf1 was ~all rewrite-every-invocation write).
    * Stale-file cleanup resolves paths with the Hadoop FileSystem API;
    * the previous java.io.File on a `stripPrefix("file:")` path would
    * silently skip cleanup on any non-local warehouse URI (r11 ADVICE).
    */
  val qBucketedJoin = Q(
    "q_bucketed_join",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val (liT, ordT) = (s"li_bkt_$tag", s"ord_bkt_$tag")
      StageViews.ensureSideEffect(spark, "bkt_tables", dir) {
        Seq(liT, ordT).foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $t")
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), t)
          val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(loc)) { fs.delete(loc, true); () }
        }
        graft.Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag")
          .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(liT)
        graft.Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(ordT)
      }
      // the merge hint forces the sort-merge path at ANY table size
      // (the tiny test tables would otherwise broadcast and leave the
      // bucket layout unexercised) — with both sides bucket-sorted on
      // the key, SMJ plans with zero exchanges
      spark.table(liT).hint("merge")
        .join(spark.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_items"),
          (sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)")) / 10000.0)
            .as("revenue"))
        .orderBy("o_orderpriority", "l_returnflag")
    },
    Some("""
SELECT o_orderpriority, l_returnflag, count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, l_returnflag
ORDER BY o_orderpriority, l_returnflag"""))

  val all: Seq[Q] = Seq(qZorderCurve, qBucketedJoin)
}
