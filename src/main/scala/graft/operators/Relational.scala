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
          // exact-cents sums: bit-deterministic under any partitioning
          (sum(expr("CAST(round(l_quantity * 100, 0) AS BIGINT)")) / 100.0).as("sum_qty"),
          (sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")) / 100.0).as("sum_base_price"),
          (sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)")) / 10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
        .withColumn("avg_qty", $"sum_qty" / $"count_order")
        .withColumn("avg_price", $"sum_base_price" / $"count_order")
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
             count(*) AS count_order,
             CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_qty,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_price
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)
  )

  /** Distinct aggregation (absent in the reference, SURVEY.md §2.4 —
    * part of a complete engine surface): exact distinct counts shuffle
    * on (group, distinct-key) with partial aggregation.
    */
  val qDistinct = Q(
    "q_distinct_users",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(
          countDistinct($"user_id").as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type
    """)
  )

  /** Skew-aware two-phase aggregation: salt the hot key space, partial-
    * aggregate per (key, salt), then finalize per key. Result is
    * identical to a direct groupBy (the oracle), but the first exchange
    * spreads a heavy-hitter key over 16 reducers — the pattern for
    * skewed keys at scale (AQE handles join skew; aggregation skew needs
    * this).
    */
  val qSalted = Q(
    "q_heavy_hitters_salted",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("salt", pmod(xxhash64($"event_id"), lit(16)))
        .groupBy($"user_id", $"salt")
        .agg(
          count(lit(1)).as("pn"),
          sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("pv"))
        .groupBy($"user_id")
        .agg(
          sum($"pn").as("n_events"),
          (sum($"pv") / 100.0).as("total_value"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
      FROM events GROUP BY user_id ORDER BY user_id
    """)
  )

  /** Sketch-based distinct (HLL, rsd=0.02): the raw sketch value differs
    * across engines by construction, so the oracle checks a TOLERANCE
    * instead — the query emits the exact distinct count plus a boolean
    * asserting |approx − exact| ≤ 6σ (6 × rsd × exact), and the oracle
    * expects that boolean to be true for every group. A wildly-wrong
    * sketch (order-of-magnitude breakage, wrong column, sign error)
    * still flips the boolean and fails the hash gate.
    *
    * Why 6σ, not 3σ: rsd is a standard deviation over random data, so
    * on a REGENERATED corpus a legitimate estimate exceeds 3σ for
    * ~0.3% of groups — a real flake source (r5 ADVICE). At 6σ the
    * two-sided normal tail is ~2·10⁻⁹ per group; with 5 groups the
    * false-failure budget is ~10⁻⁸ per run, under the 10⁻⁶ target.
    * Spark's HLL++ is additionally deterministic and merge-order-free
    * for a fixed input SET (register maxima), so on pinned testdata
    * the boolean cannot flap at all; the 6σ margin is what makes the
    * gate safe on fresh data too.
    *
    * The exact countDistinct here exists to FEED the tolerance check;
    * the pure sketch-speed claim belongs to the approx aggregate alone
    * (its timing is q_distinct_users' exact pass vs this query's
    * combined pass — the bench row for this query measures the
    * verification harness, not HLL throughput).
    */
  val qApproxDistinct = Q(
    "q_approx_distinct_users",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(
          approx_count_distinct($"user_id", 0.02).as("approx_users"),
          countDistinct($"user_id").as("n_users_exact"))
        .select($"event_type", $"n_users_exact",
          (abs($"approx_users" - $"n_users_exact") <= lit(6 * 0.02) * $"n_users_exact")
            .as("within_bound"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_users_exact, true AS within_bound
      FROM events GROUP BY event_type ORDER BY event_type
    """)
  )

  /** Sketch-based quantiles (percentile_approx, accuracy 1000): like
    * the HLL entry, the raw sketch value is engine-local, so the oracle
    * checks a tolerance — the approximate p50/p90 must land within the
    * exact [p45, p55] / [p85, p95] value bands (computed exactly in
    * both engines). GK-sketch error at accuracy 1000 is ≤ 0.1% of rank,
    * far inside the ±5pp band, so the booleans are stable on any
    * corpus, not just the pinned ones.
    */
  val qApproxPercentiles = Q(
    "q_approx_percentiles",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
      val ranked = Tables.events(spark, dir)
        .select($"event_type", $"value", $"event_id")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      def exact(p: Double, name: String) =
        max(when($"rn" === ceil(lit(p) * $"n").cast("int"), $"value")).as(name)
      val bands = ranked.groupBy($"event_type")
        .agg(exact(0.45, "lo50"), exact(0.55, "hi50"),
          exact(0.85, "lo90"), exact(0.95, "hi90"))
      val approx = Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(
          percentile_approx($"value", lit(0.5), lit(1000)).as("a50"),
          percentile_approx($"value", lit(0.9), lit(1000)).as("a90"))
      approx.join(bands, "event_type")
        .select($"event_type",
          ($"a50" >= $"lo50" && $"a50" <= $"hi50").as("p50_in_band"),
          ($"a90" >= $"lo90" && $"a90" <= $"hi90").as("p90_in_band"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, true AS p50_in_band, true AS p90_in_band
FROM (SELECT DISTINCT event_type FROM events)
ORDER BY event_type""")
  )

  /** Per-group top-k (top-3 users by event count per event_type) — the
    * grouped counterpart of q_top_customers' global LIMIT. Two-phase:
    * a map-side-combinable (event_type, user) count, then a per-group
    * rank. The rank window partitions on event_type (5 values here),
    * which at 100 TB is the canonical low-cardinality-window skew; the
    * count relation it sorts is already reduced to |types|×|users|
    * rows, so the window input is tiny relative to the scan — if even
    * that skews, the salted-agg pattern (q_heavy_hitters_salted)
    * pre-thins each group to its per-salt top-k first. rank is cast to
    * BIGINT (Spark row_number is int32, DuckDB's int64).
    */
  val qTopkPerGroup = Q(
    "q_topk_users_per_type",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val counts = Tables.events(spark, dir)
        .groupBy($"event_type", $"user_id")
        .agg(count(lit(1)).as("n_events"))
      counts
        .withColumn("rank",
          row_number().over(Window.partitionBy($"event_type")
            .orderBy($"n_events".desc, $"user_id")).cast("bigint"))
        .where($"rank" <= 3)
        .select($"event_type", $"rank", $"user_id", $"n_events")
        .orderBy($"event_type", $"rank")
    },
    Some("""
WITH uc AS (SELECT event_type, user_id, count(*) AS n_events
            FROM events GROUP BY event_type, user_id),
rk AS (SELECT event_type, user_id, n_events,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY n_events DESC, user_id) AS r
       FROM uc)
SELECT event_type, CAST(r AS BIGINT) AS rank, user_id, n_events
FROM rk WHERE r <= 3
ORDER BY event_type, rank""")
  )

  /** Fixed-width histogram of a double measure (binning / bucketing).
    * bin = floor(value / 5.0): one IEEE divide + floor per row — both
    * engines read identical parquet doubles and apply the same two ops,
    * so the bin is bit-deterministic; the per-bin sum uses the
    * exact-cents grid per the [[graft.Q]] policy. A single map-side-
    * combinable aggregate on a small integer key — histogram cost at
    * 100 TB is the scan, nothing else.
    */
  val qHistogram = Q(
    "q_value_histogram",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select(floor($"value" / lit(5.0d)).cast("bigint").as("bin"), $"value")
        .groupBy($"bin")
        .agg(
          count(lit(1)).as("n"),
          (sum(expr("CAST(round(value * 100, 0) AS BIGINT)")) / 100.0).as("sum_value"))
        .withColumn("bin_lo", $"bin" * 5)
        .select($"bin", $"bin_lo", $"n", $"sum_value")
        .orderBy($"bin")
    },
    Some("""
SELECT CAST(floor(value / 5.0e0) AS BIGINT) AS bin,
       CAST(floor(value / 5.0e0) AS BIGINT) * 5 AS bin_lo,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY bin""")
  )

  /** The analytic-rank family over per-(type, user) counts: rank,
    * dense_rank, ntile, percent_rank, cume_dist in one window pass.
    * The ordering (n_events DESC, user_id) is total, so tie-free —
    * ntile bucket assignment and both ratio functions are then pure
    * functions of (rank, n): percent_rank = (rank−1)/(n−1) and
    * cume_dist = rank/n are single int-int IEEE divisions, identical in
    * both engines. Ranks cast to BIGINT (Spark's are int32).
    */
  val qRankFamily = Q(
    "q_rank_family",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"n_events".desc, $"user_id")
      Tables.events(spark, dir)
        .groupBy($"event_type", $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"event_type", $"user_id", $"n_events",
          rank().over(w).cast("bigint").as("rnk"),
          dense_rank().over(w).cast("bigint").as("drnk"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy($"event_type", $"rnk")
    },
    Some("""
WITH uc AS (SELECT event_type, user_id, count(*) AS n_events
            FROM events GROUP BY event_type, user_id)
SELECT event_type, user_id, n_events,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cdist
FROM uc
WINDOW w AS (PARTITION BY event_type ORDER BY n_events DESC, user_id)
ORDER BY event_type, rnk""")
  )

  /** MERGEABLE sketches (DataSketches HLL): the 100 TB cardinality
    * pattern is partial sketch per partition/day, stored, then unioned
    * at query time — so beyond the estimate-accuracy bound (as in
    * q_approx_distinct_users) this gates MERGEABILITY: two sketches
    * over disjoint halves, `hll_union`ed, must estimate the same
    * cardinality WITHIN THE SAME 10% BOUND as the single whole-data
    * sketch. (Not exact equality: in dense HLL mode union is a
    * register-maxima fold, but DataSketches' sparse/coupon mode — where
    * a 1.5k-distinct group lives — transitions representations at
    * different points for sequential build vs union, so the two
    * estimates legitimately differ by a few counts; observed at sf0.1,
    * equal at sf0.01.) Both booleans ride to the oracle as true.
    *
    * Bound width: default lgConfigK=12 ⇒ rsd ≈ 1.04/√4096 ≈ 1.63%, so
    * 10% ≈ 6σ — two-sided tail ~2·10⁻⁹ per boolean, ~10⁻⁸ per run over
    * the 10 booleans (de-flaked from the r5 5% ≈ 3σ bound, which could
    * legitimately fail on a regenerated corpus).
    */
  val qHllSketch = Q(
    "q_hll_sketch_merge",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val full = ev.groupBy($"event_type")
        .agg(
          hll_sketch_agg($"user_id").as("sk"),
          countDistinct($"user_id").as("n_exact"))
        .select($"event_type", $"n_exact",
          hll_sketch_estimate($"sk").as("est_full"))
      val halves = ev
        .withColumn("half", ($"event_id" % 2).cast("int"))
        .groupBy($"event_type", $"half")
        .agg(hll_sketch_agg($"user_id").as("sk"))
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_merged"))
      full.join(halves, "event_type")
        .select($"event_type", $"n_exact",
          (abs($"est_full" - $"n_exact") <= lit(0.10) * $"n_exact").as("within_bound"),
          (abs($"est_merged" - $"n_exact") <= lit(0.10) * $"n_exact").as("merged_within_bound"))
        .orderBy($"event_type")
    },
    Some("""
SELECT event_type, count(DISTINCT user_id) AS n_exact,
       true AS within_bound, true AS merged_within_bound
FROM events GROUP BY event_type ORDER BY event_type""")
  )

  /** Sketch ALGEBRA beyond union: HLL sketches support no native
    * intersection, so the 100 TB pattern for "users who did A and B"
    * from per-segment sketches is inclusion–exclusion —
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) — priced here for every
    * event-type pair against the exact intersection. Three sketches
    * contribute error, so the tolerance band is wider than the
    * single-sketch queries: each has rsd ≈ 1.04/√4096 ≈ 1.63% of its
    * own cardinality, the union bounds all three, and the combined σ
    * is ≤ √3·1.63% ≈ 2.8% of the exact union — the 15% band is ≈ 5.3σ
    * (tail ~10⁻⁷ per boolean; and on the pinned corpora the sketches
    * sit in sparse mode where the estimates are EXACT, so the booleans
    * cannot flap at all). Exact counts ride to the oracle as BIGINTs;
    * the estimate rides only inside the boolean.
    *
    * Plan shape: ONE distinct pass over (event_type, user_id) feeds
    * both the per-type sketches and the exact pairwise intersection;
    * the sketch relation after groupBy is |types| rows, so the pair
    * join is a broadcast cross of a tiny relation — the expensive
    * exact-intersection join exists only to FEED the tolerance check,
    * as in q_approx_distinct_users.
    */
  val qHllIntersect = Q(
    "q_hll_intersect",
    (spark, dir) => {
      import spark.implicits._
      // distinct (event_type, user_id) — cached: both the sketch pass
      // and the exact-intersection join consume it
      val du = StageViews.ensureCached(spark, "hll_du_v", dir)(
        Tables.events(spark, dir).select($"event_type", $"user_id").distinct())
      val sk = du.groupBy($"event_type")
        .agg(hll_sketch_agg($"user_id").as("sk"), count(lit(1)).as("n_exact"))
      // |types|-row relation: explicit broadcast so the inequality
      // pair join is a BroadcastNestedLoopJoin by construction, never
      // a stats-estimate gamble that degrades to CartesianProduct
      val pairs = sk.as("a").join(broadcast(sk.as("b")), $"a.event_type" < $"b.event_type")
        .select(
          $"a.event_type".as("et_a"), $"b.event_type".as("et_b"),
          $"a.n_exact".as("n_a_exact"), $"b.n_exact".as("n_b_exact"),
          (hll_sketch_estimate($"a.sk") + hll_sketch_estimate($"b.sk") -
            hll_sketch_estimate(hll_union($"a.sk", $"b.sk"))).as("est_inter"))
      val inter = du.as("x").join(du.as("y"),
          $"x.user_id" === $"y.user_id" && $"x.event_type" < $"y.event_type")
        .groupBy($"x.event_type".as("et_a"), $"y.event_type".as("et_b"))
        .agg(count(lit(1)).as("n_inter_exact"))
      val out = pairs.join(inter, Seq("et_a", "et_b"), "left")
        .select($"et_a", $"et_b", $"n_a_exact", $"n_b_exact",
          coalesce($"n_inter_exact", lit(0L)).as("n_inter_exact"),
          (abs($"est_inter" - coalesce($"n_inter_exact", lit(0L))) <=
            lit(0.15) * ($"n_a_exact" + $"n_b_exact" -
              coalesce($"n_inter_exact", lit(0L)))).as("within_bound"))
        .orderBy($"et_a", $"et_b")
      out
    },
    Some("""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
n AS (SELECT event_type, count(*) AS n_exact FROM du GROUP BY event_type),
it AS (SELECT x.event_type AS et_a, y.event_type AS et_b, count(*) AS n_inter_exact
       FROM du x JOIN du y ON x.user_id = y.user_id AND x.event_type < y.event_type
       GROUP BY x.event_type, y.event_type)
SELECT a.event_type AS et_a, b.event_type AS et_b,
       a.n_exact AS n_a_exact, b.n_exact AS n_b_exact,
       CAST(coalesce(it.n_inter_exact, 0) AS BIGINT) AS n_inter_exact,
       true AS within_bound
FROM n a JOIN n b ON a.event_type < b.event_type
LEFT JOIN it ON it.et_a = a.event_type AND it.et_b = b.event_type
ORDER BY et_a, et_b""")
  )

  /** Custom typed Aggregator (UDAF surface): Welford/Chan one-pass
    * variance ([[graft.functions.WelfordVariance]]) checked against the
    * EXACT variance derived from integer cents sums. The exact value
    * (Q/n − (S/n)²)/10⁴ is built only from ratios of exact BIGINTs —
    * deterministic IEEE, so it hash-compares; the one-pass result is
    * merge-order-sensitive in its low bits by nature, so it rides as a
    * tolerance boolean. One aggregate pass computes all of S, Q, n and
    * the UDAF buffer.
    */
  val qWelford = Q(
    "q_welford_variance",
    (spark, dir) => {
      import spark.implicits._
      graft.functions.WelfordVariance.register(spark)
      val cents = "CAST(round(value * 100, 0) AS BIGINT)"
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(expr(cents)).as("s"),
          sum(expr(s"$cents * $cents")).as("q"),
          expr("welford_var(value)").as("wv"))
        .select($"event_type", $"n",
          (($"q" / $"n" - ($"s" / $"n") * ($"s" / $"n")) / 10000.0).as("var_exact"),
          (abs($"wv" - ($"q" / $"n" - ($"s" / $"n") * ($"s" / $"n")) / 10000.0)
            <= lit(1e-9) * (($"q" / $"n") / 10000.0 + 1.0)).as("within_tol"))
        .orderBy($"event_type")
    },
    Some("""
WITH a AS (SELECT event_type, count(*) AS n,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                         * CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS q
           FROM events GROUP BY event_type)
SELECT event_type, n,
       (q / n - (s / n) * (s / n)) / 10000.0 AS var_exact,
       true AS within_tol
FROM a ORDER BY event_type""")
  )

  /** Set-valued aggregation (collect_set): the per-key distinct-values
    * rollup every feature store materializes. collect_set's order is
    * partition-dependent, so determinism comes from array_sort before
    * the join-to-string (emitted as a string so the compare never
    * depends on either engine's array encoding). One shuffle.
    */
  val qCollectSet = Q(
    "q_collect_types",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"user_id")
        .agg(
          array_join(array_sort(collect_set($"event_type")), ",").as("types_seen"),
          countDistinct($"event_type").as("n_types"))
        .orderBy($"user_id")
    },
    Some("""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
       count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id ORDER BY user_id""")
  )

  /** Recursive-CTE hierarchy traversal — Spark 4's `WITH RECURSIVE`
    * (planned as `UnionLoopExec`), the one relational construct the
    * catalog had only ever stated on the ORACLE side (the dedup
    * cluster oracles are recursive; the Spark side used distributed
    * CC). The hierarchy is synthesized over the customer table as a
    * binary tree (parent = id DIV 2, rooted at id 1; id 0 is its own
    * parent — a degenerate self-loop excluded from the tree), walked
    * top-down with (id, depth), then joined back to the table for the
    * per-depth balance rollup, keeping the recursive frontier skinny.
    * The traversal invariant depth == floor(log2(id)) is pinned in
    * `Round12OpsSpec` via [[SqlDialect.floorLog2]].
    *
    * Scale: a recursive traversal executes as one join per LEVEL
    * (frontier × table), so cost is O(depth) joins — depth is
    * log-bounded here and shallow (≤ dozens) in any real org/BOM
    * hierarchy; the frontier carries two BIGINTs per row. Spark caps
    * runaway recursion at spark.sql.cteRecursionLevelLimit (default
    * 100), which a log-depth tree never approaches.
    */
  private def hierarchySql(d: SqlDialect, rel: String = "customer"): String = s"""
WITH RECURSIVE anc AS (
  SELECT c_custkey AS id, 0 AS depth
  FROM $rel WHERE c_custkey = 1
  UNION ALL
  SELECT c.c_custkey AS id, a.depth + 1 AS depth
  FROM $rel c JOIN anc a ON ${d.idiv("c.c_custkey", "2")} = a.id
  WHERE c.c_custkey > 1)
SELECT CAST(a.depth AS BIGINT) AS depth, count(*) AS n_nodes,
       CAST(min(a.id) AS BIGINT) AS min_id,
       CAST(max(a.id) AS BIGINT) AS max_id,
       CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM anc a JOIN $rel c ON a.id = c.c_custkey
GROUP BY a.depth
ORDER BY depth"""

  val qHierarchy = Q(
    "q_hierarchy_rollup",
    (spark, dir) => {
      // Cached relation for the RECURSION (r21): UnionLoopExec re-plans
      // and re-executes the step per level, so an uncached view re-reads
      // the parquet O(depth) times per run — with a cached relation each
      // level is an InMemoryTableScan (measured 2.8 -> 2.0 s at sf0.1;
      // AQE-off was also tried and LOST, 3.5 s). A private view name,
      // not the shared `customer`: Sketches re-registers that name
      // bare, which would invalidate this cache mid-session.
      StageViews.ensureCached(spark, "customer_c", dir)(Tables.customer(spark, dir))
      spark.sql(hierarchySql(SparkSql, "customer_c"))
    },
    Some(hierarchySql(DuckSql)))

  /** Correlated LATERAL top-k — the per-row-subquery spelling of
    * grouped top-k ("for every nation, its 3 richest customers"),
    * exercising a decorrelation path none of the other queries touch:
    * Catalyst rewrites the LATERAL (ORDER BY ... LIMIT 3) subquery
    * into WindowGroupLimit operators with a MAP-SIDE partial group
    * limit BEFORE the exchange (each task forwards at most 3 rows per
    * nation) plus a broadcast join of the 25-row nation dimension — at
    * 100 TB the shuffle carries ≤ 3·|nations|·|tasks| rows, not the
    * customer table. The identical SQL text runs on DuckDB (LATERAL is
    * standard there), so the oracle also pins that Spark's
    * decorrelation preserves per-group LIMIT semantics exactly.
    * Determinism: the inner ORDER BY (cents DESC, c_custkey) is total,
    * so the kept set is unique regardless of balance ties.
    */
  private val lateralTopkSql = """
SELECT n.n_name, l.c_custkey, l.cents
FROM nation n,
LATERAL (SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
         FROM customer c WHERE c.c_nationkey = n.n_nationkey
         ORDER BY cents DESC, c_custkey LIMIT 3) l
ORDER BY n.n_name, l.cents DESC, l.c_custkey"""

  val qLateralTopk = Q(
    "q_lateral_topk",
    (spark, dir) => {
      StageViews.ensure(spark, "nation", dir)(Tables.nation(spark, dir))
      StageViews.ensure(spark, "customer", dir)(Tables.customer(spark, dir))
      spark.sql(lateralTopkSql)
    },
    Some(lateralTopkSql))

  /** 2-D Pareto front (skyline) — the orders no other order beats on
    * BOTH price and recency: the multi-objective "best offers" question
    * (maximize value, maximize freshness) that cannot be answered by
    * any single ORDER BY. A point is dominated iff some point is ≥ on
    * both axes and strictly better on one; equal points share a front
    * cell with their order count.
    *
    * The Spark side exploits the 2-D structure instead of the O(n²)
    * dominance join: (1) reduce to one (cents, max-date) cell per
    * price point — same-price dominance resolved by a map-side
    * combinable groupBy, never a self-join; (2) one running-max window
    * over cents DESC with a RANGE frame excluding peers — a point
    * survives iff its date strictly beats every strictly-higher-priced
    * cell's best date. The window input is bounded by the PRICE DOMAIN
    * (≤ |distinct cents|, a value-range bound like q_wow_delta's
    * calendar bound), not by order count — at 100 TB the reduce sees
    * the data, the window sees ≤ ~10⁷ narrow rows (range-partitioned
    * prefix-max, the Packing two-phase pattern, is the documented
    * fallback if the price domain ever widens). The oracle is the
    * DEFINITION — a NOT EXISTS dominance anti-join — so the hash gate
    * proves the windowed rewrite equals the quadratic spec.
    */
  private[graft] def skylineOn(pts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = pts.sparkSession
    locally {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val agg = pts.groupBy($"cents", $"dt").agg(count(lit(1)).as("n_orders"))
      val best = agg.groupBy($"cents".as("bc")).agg(max($"dt").as("bdt"))
      val cells = agg.join(best, $"cents" === $"bc" && $"dt" === $"bdt")
        .select($"cents", $"dt", $"n_orders")
      cells
        .withColumn("hmax", max($"dt").over(
          Window.orderBy($"cents".desc).rangeBetween(Window.unboundedPreceding, -1)))
        .where($"hmax".isNull || $"dt" > $"hmax")
        .select($"cents", $"dt", $"n_orders")
        .orderBy($"cents".desc)
    }
  }

  val qParetoFront = Q(
    "q_pareto_front",
    (spark, dir) => skylineOn(
      Tables.orders(spark, dir).selectExpr(
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS dt")),
    Some("""
WITH pts AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
                    epoch_us(o_orderdate) AS dt
             FROM orders),
agg AS (SELECT cents, dt, count(*) AS n_orders FROM pts GROUP BY 1, 2),
front AS (SELECT a.* FROM agg a WHERE NOT EXISTS (
  SELECT 1 FROM agg b
  WHERE b.cents >= a.cents AND b.dt >= a.dt
    AND (b.cents > a.cents OR b.dt > a.dt)))
SELECT cents, dt, n_orders FROM front ORDER BY cents DESC""")
  )

  val all: Seq[Q] =
    Seq(q1, qDistinct, qSalted, qApproxDistinct, qApproxPercentiles, qTopkPerGroup,
      qHistogram, qRankFamily, qHllSketch, qHllIntersect, qWelford, qCollectSet,
      qHierarchy, qLateralTopk, qParetoFront)
}
