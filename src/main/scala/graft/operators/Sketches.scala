package graft.operators

import graft.Q

/** Probabilistic-filter operators a 100 TB pipeline runs BEFORE its
  * expensive joins and aggregations: a bloom-filter semi-join (prune a
  * huge fact scan against a selective dimension without shuffling the
  * fact) and a count-min sketch (bounded-memory frequency estimates with
  * a one-sided error guarantee).
  *
  * Both are spelled once as SQL templates over [[SqlDialect]] +
  * [[SqlHash]] and rendered for Spark and the DuckDB oracle, so the
  * sketch arithmetic — md5-derived hash positions, counter updates,
  * min-of-rows estimates — is bit-identical in both engines and the
  * driver's hash gate checks the actual sketch contents, not just row
  * counts.
  *
  * Scale design:
  *  - Bloom: the bit-set relation is O(|dim| · k) rows (NOT O(m) — only
  *    occupied positions are materialized), so Spark broadcasts it and
  *    the fact side is pruned in a narrow scan with three broadcast
  *    existence joins; the fact table is never shuffled. This is the
  *    manual spelling of the runtime row-level filtering a warehouse
  *    does implicitly, and the shape survives any fact size.
  *  - CMS: the sketch is d·w ≤ 768 counter rows built by ONE
  *    map-side-combinable aggregate (partial maps are capped at d·w
  *    entries per task regardless of input size); estimation joins the
  *    tiny sketch to the probe keys. At 100 TB the sketch build is the
  *    cheapest possible full-scan shape: no row survives the mapper.
  */
object Sketches {

  /** Bloom bits (2^16) — sized so the sf0.1 dimension (~3k keys × 3
    * probes) fills <15% of the filter; false positives stay rare while
    * the occupied-position relation stays broadcast-tiny.
    */
  private val M = 65536L

  /** Hashes per key: classic k=3, read from disjoint md5 words. */
  private val Offsets = Seq(1, 9, 17)

  private val W = 256L // CMS width
  private val D = 3 // CMS depth (rows)

  private def posExprs(d: SqlDialect, mod: Long): Seq[String] =
    Offsets.map(off => s"(${SqlHash.hex32(d, "hx", off)}) % $mod")

  /** Bloom-filter semi-join: orders pruned against the BUILDING-segment
    * customer keys. Emits the filter's confusion counts; bloom's
    * no-false-negative guarantee makes `n_false_negatives` provably 0 —
    * the query checks the theorem end-to-end in both engines.
    */
  private def bloomSql(d: SqlDialect): String = {
    val Seq(p1, p2, p3) = posExprs(d, M)
    s"""
WITH dim AS (SELECT c_custkey AS key, md5(CAST(c_custkey AS STRING)) AS hx
             FROM customer WHERE c_mktsegment = 'BUILDING'),
bits AS (SELECT DISTINCT pos FROM (
           SELECT $p1 AS pos FROM dim
           UNION ALL SELECT $p2 AS pos FROM dim
           UNION ALL SELECT $p3 AS pos FROM dim)),
probe AS (SELECT o_orderkey, o_custkey,
                 $p1 AS p1, $p2 AS p2, $p3 AS p3
          FROM (SELECT o_orderkey, o_custkey,
                       md5(CAST(o_custkey AS STRING)) AS hx FROM orders)),
flags AS (SELECT (dk.key IS NOT NULL) AS is_exact,
                 (b1.pos IS NOT NULL AND b2.pos IS NOT NULL
                  AND b3.pos IS NOT NULL) AS bloom_pass
          FROM probe p
          LEFT JOIN bits b1 ON p.p1 = b1.pos
          LEFT JOIN bits b2 ON p.p2 = b2.pos
          LEFT JOIN bits b3 ON p.p3 = b3.pos
          LEFT JOIN (SELECT DISTINCT key FROM dim) dk ON p.o_custkey = dk.key)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count_if(bloom_pass) AS BIGINT) AS n_candidates,
       CAST(count_if(is_exact) AS BIGINT) AS n_exact,
       CAST(count_if(is_exact AND NOT bloom_pass) AS BIGINT) AS n_false_negatives,
       CAST(count_if(bloom_pass AND NOT is_exact) AS BIGINT) AS n_false_positives
FROM flags
ORDER BY n_orders"""
  }

  /** Run the bloom pass over explicit relations (ScaleSmoke feeds
    * replicated inputs through this).
    */
  def bloomOn(spark: org.apache.spark.sql.SparkSession,
      orders: org.apache.spark.sql.DataFrame,
      customer: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    orders.createOrReplaceTempView("orders")
    customer.createOrReplaceTempView("customer")
    spark.sql(bloomSql(SparkSql))
  }

  val qBloomSemiJoin = Q(
    "q_bloom_semi_join",
    (spark, dir) => bloomOn(spark,
      graft.Tables.orders(spark, dir), graft.Tables.customer(spark, dir)),
    Some(bloomSql(DuckSql)))

  /** Count-min sketch heavy hitters: build a d=3 × w=256 sketch over the
    * event stream's user_id frequencies, then estimate the exact top-10
    * users' counts from the sketch. CMS guarantees estimate ≥ truth
    * (`admissible`); the estimates themselves are deterministic, so the
    * oracle gate compares the sketch's actual error behavior.
    */
  /** The stream is pre-aggregated to per-key exact counts FIRST (one
    * map-side-combinable shuffle — the partial maps never exceed the
    * distinct-key count per task), and the md5 positions are computed
    * per DISTINCT key only, never per event row. counter[i][col] =
    * Σ n(key) over keys hashing there — identical values to per-row
    * updates at a fraction of the hashing cost, at any scale.
    */
  private def cmsSql(d: SqlDialect): String = {
    val Seq(c1, c2, c3) = posExprs(d, W)
    val colCase =
      "CASE WHEN i = 1 THEN c1 WHEN i = 2 THEN c2 ELSE c3 END"
    s"""
WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY user_id),
p AS (SELECT user_id, n, $c1 AS c1, $c2 AS c2, $c3 AS c3
      FROM (SELECT user_id, n, md5(CAST(user_id AS STRING)) AS hx FROM k)),
cnt AS (SELECT i, $colCase AS col, CAST(sum(n) AS BIGINT) AS c
        FROM (${d.series("user_id, n, c1, c2, c3", D.toString, "i", "p")})
        GROUP BY i, $colCase),
heavy AS (SELECT user_id, n AS n_exact, c1, c2, c3 FROM p
          ORDER BY n DESC, user_id LIMIT 10)
SELECT h.user_id, h.n_exact,
       least(e1.c, e2.c, e3.c) AS n_est,
       least(e1.c, e2.c, e3.c) >= h.n_exact AS admissible
FROM heavy h
JOIN cnt e1 ON e1.i = 1 AND e1.col = h.c1
JOIN cnt e2 ON e2.i = 2 AND e2.col = h.c2
JOIN cnt e3 ON e3.i = 3 AND e3.col = h.c3
ORDER BY user_id"""
  }

  /** Run the CMS pass over an explicit events relation. */
  def cmsOn(spark: org.apache.spark.sql.SparkSession,
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    events.createOrReplaceTempView("events")
    spark.sql(cmsSql(SparkSql))
  }

  val qCmsHeavyHitters = Q(
    "q_cms_heavy_hitters",
    // register the FULL events relation (same convention as
    // AsOfJoin/Sessionize, so view replacement is always
    // like-for-like); pruning narrows the scan to user_id
    (spark, dir) => cmsOn(spark, graft.Tables.events(spark, dir)),
    Some(cmsSql(DuckSql)))

  /** Misra–Gries heavy hitters over the event stream's users — the
    * bounded-memory "find the keys" summary ([[graft.functions.MisraGries]]):
    * each task keeps ≤ [[MgCap]] counters whatever the key cardinality
    * and partials merge with the Mergeable-Summaries cut. At the
    * oracle SF the user domain sits under the capacity, so the summary
    * is provably EXACT (the hash gate compares it against plain
    * `GROUP BY user_id` counts); above the capacity the output
    * degrades to ≤ m guaranteed-underestimate rows whose error bound
    * `MisraGriesSpec` pins on skewed synthetic streams across
    * partitionings. REGIME WARNING: the oracle is valid ONLY below
    * capacity — the driver's hash gate runs at sf0.01 (150 users ≤
    * 256, canary-pinned in `MisraGriesSpec`), while sf0.1 has 1500
    * users and would hash-mismatch BY DESIGN if check.py were pointed
    * there; that is the sketch being a sketch, not an engine bug.
    * Scale: one narrow scan, O(m) state per task, one
    * m-bounded partial per partition into a single m-bounded merge —
    * strictly cheaper than the exact groupBy it replaces once the key
    * space outgrows memory, which is its entire reason to exist.
    */
  val MgCap = 256

  private[graft] def mgOn(events: org.apache.spark.sql.DataFrame,
      cap: Int = MgCap): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val mg = graft.functions.MisraGries.aggregator(cap).toColumn
    events.selectExpr("CAST(user_id AS STRING) AS k").as[String]
      .select(mg.name("entries"))
      .toDF("entries")
      .select(org.apache.spark.sql.functions.explode($"entries").as("e"))
      .selectExpr("CAST(e.key AS BIGINT) AS user_id",
        "e.min_count AS mg_count")
      .orderBy("user_id")
  }

  val qMgHeavyHitters = Q(
    "q_mg_heavy_hitters",
    (spark, dir) => mgOn(graft.Tables.events(spark, dir)),
    Some("""
SELECT user_id, CAST(count(*) AS BIGINT) AS mg_count
FROM events
GROUP BY user_id
ORDER BY user_id"""))

  val all: Seq[Q] = Seq(qBloomSemiJoin, qCmsHeavyHitters, qMgHeavyHitters)
}
