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

  /** Count-min JOIN-SIZE estimation — the planner-side use of the same
    * d×w sketch (Cormode & Muthukrishnan 2005, §4.2: the CMS inner
    * product): estimate |orders ⋈ customer_BUILDING| on custkey from
    * two 768-counter summaries WITHOUT executing the join. Estimate =
    * min over rows i of Σ_col a_i[col]·b_i[col]; every true key pair
    * lands in matching counters and collisions only ADD non-negative
    * mass, so the estimate is a guaranteed OVERcount (`admissible` —
    * the same one-sided theorem-checked-end-to-end discipline as
    * `q_bloom_semi_join`'s zero false negatives).
    *
    * Why it matters at 100 TB: join-size estimates drive
    * broadcast-vs-shuffle and reorder decisions, and this is the
    * sketch that answers them from two map-side-combinable narrow
    * scans — each side's per-key aggregate never exceeds d·w counters
    * per task, the dot product is sketch-sized (≤ d·w rows), and the
    * two relations are never shuffled against each other. The exact
    * side (for the audit) is the per-key count join, itself
    * domain-sized after the two aggregates.
    */
  private def cmsJoinSizeSql(d: SqlDialect): String = {
    val Seq(c1, c2, c3) = posExprs(d, W)
    val colCase = "CASE WHEN i = 1 THEN c1 WHEN i = 2 THEN c2 ELSE c3 END"
    def side(name: String, keyed: String): String =
      s"""p$name AS (SELECT key, n, $c1 AS c1, $c2 AS c2, $c3 AS c3
       FROM (SELECT key, n, md5(CAST(key AS STRING)) AS hx FROM $keyed)),
cnt$name AS (SELECT i, $colCase AS col, CAST(sum(n) AS BIGINT) AS c
        FROM (${d.series("key, n, c1, c2, c3", D.toString, "i", s"p$name")})
        GROUP BY i, $colCase)"""
    s"""
WITH ka AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey),
kb AS (SELECT c_custkey AS key, CAST(count(*) AS BIGINT) AS n
       FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_custkey),
${side("a", "ka")},
${side("b", "kb")},
ip AS (SELECT a.i, CAST(sum(a.c * b.c) AS BIGINT) AS dot
       FROM cnta a JOIN cntb b ON a.i = b.i AND a.col = b.col
       GROUP BY a.i),
est AS (SELECT CAST(coalesce(min(dot), 0) AS BIGINT) AS n_est FROM ip),
exact AS (SELECT CAST(coalesce(sum(ka.n * kb.n), 0) AS BIGINT) AS n_exact
          FROM ka JOIN kb ON ka.key = kb.key)
SELECT e.n_exact, s.n_est,
       s.n_est >= e.n_exact AS admissible,
       CAST(s.n_est - e.n_exact AS BIGINT) AS overcount
FROM exact e CROSS JOIN est s
ORDER BY n_exact"""
  }

  /** Run the join-size estimate over explicit relations. */
  def cmsJoinSizeOn(spark: org.apache.spark.sql.SparkSession,
      orders: org.apache.spark.sql.DataFrame,
      customer: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    orders.createOrReplaceTempView("orders")
    customer.createOrReplaceTempView("customer")
    spark.sql(cmsJoinSizeSql(SparkSql))
  }

  val qCmsJoinSize = Q(
    "q_cms_join_size",
    (spark, dir) => cmsJoinSizeOn(spark,
      graft.Tables.orders(spark, dir), graft.Tables.customer(spark, dir)),
    Some(cmsJoinSizeSql(DuckSql)))

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

  /** Misra–Gries in its ABOVE-capacity (approximate) regime, driver-
    * visible: capacity [[MgErrCap]] counters over the documents
    * corpus's `lang` column, whose 5-key domain is genuinely skewed
    * (~44% `en` at every SF) and strictly larger than the capacity —
    * the decrement/merge-cut paths fire on the real corpus, not just
    * in specs. Above capacity the retained counter VALUES are
    * merge-order-dependent (Spark's partial-merge order varies run to
    * run), so the oracle cannot hash counter values; what IS
    * deterministic is the algorithm's contract, and that is what the
    * query emits: one row per GUARANTEED-heavy key (exact count
    * c·(m+1) > N — a deterministic, oracle-computable set, non-empty
    * at every probed SF) carrying the exact counts plus the bound
    * verdicts computed from the ACTUAL summary —
    *  - `retained`: the guaranteed-heavy key is present in the summary
    *    (the theorem: any k with c(k) > (N−M)/(m+1) ≥ … survives);
    *  - `underestimate_ok`: its ĉ ≤ c;
    *  - `within_bound`: (m+1)·(c−ĉ) ≤ N−M, exact integer arithmetic —
    *    the Mergeable-Summaries error bound with M read from the
    *    summary's retained weight;
    *  - `summary_le_cap`: the summary holds ≤ m counters (the hard
    *    memory bound — the sketch's defining property);
    *  - `all_underestimate`: EVERY retained key (not just heavy ones)
    *    underestimates its exact count, and every retained key is a
    *    real input key.
    * The oracle states the theory side: the same heavy set from exact
    * counts with every verdict TRUE. A broken sketch flips a boolean
    * and the hash gate catches it — the same
    * theorem-checked-end-to-end style as `q_bloom_semi_join`'s
    * provably-zero false negatives and `q_minhash_est_error`.
    *
    * Scale: the MG pass is one narrow scan with O(m) state per task
    * (see [[qMgHeavyHitters]]); the audit side's exact GROUP BY is over
    * a 5-key domain — every post-scan relation here is ≤ |domain| rows.
    */
  val MgErrCap = 3

  private[graft] def mgEstErrOn(docs: org.apache.spark.sql.DataFrame,
      cap: Int = MgErrCap): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mg = graft.functions.MisraGries.aggregator(cap).toColumn
    val est = docs.selectExpr("lang AS k").as[String]
      .select(mg.name("entries"))
      .toDF("entries")
      .select(explode($"entries").as("e"))
      .selectExpr("e.key AS k", "e.min_count AS est")
    val exact = docs.groupBy($"lang")
      .agg(count(lit(1)).cast("bigint").as("c_exact"))
    // ONE pass per input: exact counts FULL-OUTER summary (a phantom
    // summary key the corpus never contained lands as a null-c_exact
    // row), then every global invariant — N, D, retained weight M,
    // counter count, min slack, phantom count — as null-skipping
    // window aggregates over the ≤(D+m)-row joined relation (a
    // single-partition window over the DOMAIN-sized relation, the
    // spend-deciles discipline — never over data volume). The first
    // spelling re-derived the whole MG subtree for the audit
    // constants; this plan aggregates each input exactly once.
    import org.apache.spark.sql.expressions.Window
    val full = Window.partitionBy()
    exact.join(est, $"lang" === $"k", "full_outer")
      .select($"lang", $"c_exact", $"est",
        sum($"c_exact").over(full).cast("bigint").as("n_total"),
        count($"c_exact").over(full).as("n_distinct"),
        sum($"est").over(full).cast("bigint").as("m_retained"),
        count($"est").over(full).as("n_retained"),
        min($"c_exact" - $"est").over(full).as("min_slack"),
        sum(when($"c_exact".isNull, 1L).otherwise(0L)).over(full)
          .as("n_phantom"))
      .where($"c_exact" * (cap + 1) > $"n_total") // guaranteed-heavy set
      .select($"lang", $"c_exact", $"n_total", $"n_distinct",
        $"est".isNotNull.as("retained"),
        ($"est".isNotNull && $"est" <= $"c_exact").as("underestimate_ok"),
        ($"est".isNotNull &&
          lit(cap + 1L) * ($"c_exact" - $"est") <= $"n_total" - $"m_retained")
          .as("within_bound"),
        ($"n_retained" <= cap).as("summary_le_cap"),
        ($"n_phantom" === 0L && coalesce($"min_slack" >= 0, lit(false)))
          .as("all_underestimate"))
      .orderBy("lang")
  }

  val qMgEstError = Q(
    "q_mg_est_error",
    (spark, dir) => mgEstErrOn(graft.Tables.documents(spark, dir)),
    Some(s"""
WITH x AS (SELECT lang, CAST(count(*) AS BIGINT) AS c_exact
           FROM documents GROUP BY lang),
t AS (SELECT CAST(sum(c_exact) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_distinct FROM x)
SELECT lang, c_exact, n_total, n_distinct,
       TRUE AS retained, TRUE AS underestimate_ok, TRUE AS within_bound,
       TRUE AS summary_le_cap, TRUE AS all_underestimate
FROM x CROSS JOIN t
WHERE c_exact * ${MgErrCap + 1} > n_total
ORDER BY lang"""))

  // ================= q-digest mergeable quantile summary =================

  /** The engine's own mergeable quantile sketch ([[graft.functions.QDigest]])
    * over the event-value cents — the rank member of the sketch family
    * (HLL distinct / CMS frequency / MG heavy keys / Bloom membership).
    * Same two-query discipline as the Misra–Gries pair:
    *
    * `q_qdigest_quantiles` runs at capacity [[QdExactK]] — ABOVE the
    * stream weight at the oracle SFs, so t = ⌊N/k⌋ = 0, nothing ever
    * compresses, the digest is the exact value histogram and the
    * post-order quantile rule degenerates to the textbook discrete
    * quantile the oracle states (REGIME WARNING: at sf0.1+ the weight
    * exceeds k, compression fires and the hash would mismatch BY
    * DESIGN — the q_mg_heavy_hitters convention).
    *
    * `q_qdigest_est_error` runs at capacity [[QdErrK]] — compression
    * fires at EVERY probed SF (t ≥ 15 at sf0.001) — and emits the
    * sketch CONTRACT per probed quantile, computed against exact
    * ranks: the answer never undershoots its rank target
    * (`lower_ok`: count(≤ q̂) ≥ ⌈φN⌉) and overshoots by at most the
    * O(t·log u) ancestor budget (`upper_ok`: count(< q̂) ≤ ⌈φN⌉ +
    * [[graft.functions.QDigest.epsN]]), with the hard size bound
    * (`size_le_bound`: nodes ≤ 4k). Deterministic columns (N, t, εN)
    * are oracle-computed; the booleans are the theory side, TRUE under
    * every merge order — a broken digest flips one and the hash gate
    * catches it.
    *
    * Scale: the digest build is ONE narrow scan with O(k·log u) state
    * per task and O(size) partials (map-side combined); everything
    * after it is sketch-sized (≤ 4k nodes) or value-DOMAIN-sized (the
    * exact-rank audit's cents histogram, ≤ 2^20 rows whatever N —
    * the q_spend_deciles argument).
    */
  val QdExactK = 16384
  val QdErrK = 64
  val QdPhiBp: Seq[Long] = Seq(500L, 2500L, 5000L, 7500L, 9500L)

  private val QdClampSql =
    s"least(greatest(CAST(round(value * 100, 0) AS BIGINT), 0), ${graft.functions.QDigest.Universe - 1})"

  /** Digest nodes (lo, hi, cnt) for the events value stream at
    * capacity k — the one data-sized pass.
    */
  private[graft] def qdigestNodes(events: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val agg = graft.functions.QDigest.aggregator(k).toColumn
    events.selectExpr(s"$QdClampSql AS c").as[Long]
      .select(agg.name("nodes")).toDF("nodes")
      .select(explode($"nodes").as("nd"))
      .selectExpr("nd.lo AS lo", "nd.hi AS hi", "nd.cnt AS cnt")
  }

  /** Post-order rank selection: per φ the first node (ascending upper
    * bound, descendants before ancestors) whose cumulative count
    * reaches r = ⌈φN⌉; the answer is that node's max value. The
    * windows run over the SKETCH-sized node relation.
    */
  private[graft] def qdQuantilesFromNodes(
      nodes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // node totals as window aggregates over the SAME sketch-sized
    // relation (not a second agg subtree — fresh Aggregator instances
    // never canonicalize equal, so ReuseExchange cannot dedupe them
    // and a crossJoin spelling would rebuild the whole digest)
    val cum = nodes
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"hi", $"hi" - $"lo")))
      .withColumn("n_total", sum($"cnt").over(Window.partitionBy()))
      .withColumn("n_nodes", count(lit(1)).over(Window.partitionBy()))
    val phis = QdPhiBp.toDF("phi_bp")
    broadcast(phis).join(cum,
        $"cum" >= expr("(phi_bp * n_total + 9999) DIV 10000"))
      .groupBy($"phi_bp", $"n_total")
      .agg((min($"hi") - 1L).as("qhat_cents"),
        max($"n_nodes").as("n_nodes"))
      .orderBy("phi_bp")
  }

  private[graft] def qdQuantilesOn(events: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    qdQuantilesFromNodes(qdigestNodes(events, k))
      .select($"phi_bp", $"n_total", $"qhat_cents")
  }

  val qQdigestQuantiles = Q(
    "q_qdigest_quantiles",
    (spark, dir) => qdQuantilesOn(graft.Tables.events(spark, dir), QdExactK),
    Some(s"""
WITH c AS (SELECT $QdClampSql AS v FROM events),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM c),
h AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY v),
r AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM h),
p(phi_bp) AS (VALUES (500),(2500),(5000),(7500),(9500))
SELECT CAST(phi_bp AS BIGINT) AS phi_bp, n_total,
       (SELECT min(v) FROM r WHERE cum >= (phi_bp * n_total + 9999) // 10000)
         AS qhat_cents
FROM p CROSS JOIN t
WHERE n_total > 0
ORDER BY phi_bp"""))

  /** The above-capacity bound audit: q̂ from the real sketch, ranks
    * from the exact histogram, verdict booleans from the contract.
    */
  private[graft] def qdEstErrOn(events: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // ONE digest build: quantiles AND the node count come off the same
    // node relation (the mgEstErrOn single-pass discipline)
    val qhat = qdQuantilesFromNodes(qdigestNodes(events, k))
      .select($"phi_bp", $"n_total", $"qhat_cents", $"n_nodes",
        expr("(phi_bp * n_total + 9999) DIV 10000").as("r"))
    val hist = events.selectExpr(s"$QdClampSql AS v")
      .groupBy($"v").agg(count(lit(1)).cast("bigint").as("cnt"))
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"v")))
    val rankLe = broadcast(qhat).join(hist, $"v" <= $"qhat_cents", "left")
      .groupBy($"phi_bp").agg(coalesce(max($"cum"), lit(0L)).as("rank_le"))
    val rankLt = broadcast(qhat).join(hist, $"v" < $"qhat_cents", "left")
      .groupBy($"phi_bp".as("pb2")).agg(coalesce(max($"cum"), lit(0L)).as("rank_lt"))
    val epsExpr = s"2 * (n_total DIV $k) * ${graft.functions.QDigest.Bits + 1}"
    qhat.join(rankLe, "phi_bp").join(rankLt, $"phi_bp" === $"pb2")
      .select($"phi_bp", $"n_total",
        expr(s"n_total DIV $k").as("t_thresh"),
        expr(epsExpr).as("eps_n"),
        ($"rank_le" >= $"r").as("lower_ok"),
        ($"rank_lt" <= $"r" + expr(epsExpr)).as("upper_ok"),
        ($"n_nodes" <= graft.functions.QDigest.sizeBound(k).toLong)
          .as("size_le_bound"))
      .orderBy("phi_bp")
  }

  val qQdigestEstError = Q(
    "q_qdigest_est_error",
    (spark, dir) => qdEstErrOn(graft.Tables.events(spark, dir), QdErrK),
    Some(s"""
WITH c AS (SELECT $QdClampSql AS v FROM events),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM c),
p(phi_bp) AS (VALUES (500),(2500),(5000),(7500),(9500))
SELECT CAST(phi_bp AS BIGINT) AS phi_bp, n_total,
       n_total // $QdErrK AS t_thresh,
       2 * (n_total // $QdErrK) * ${graft.functions.QDigest.Bits + 1} AS eps_n,
       TRUE AS lower_ok, TRUE AS upper_ok, TRUE AS size_le_bound
FROM p CROSS JOIN t
WHERE n_total > 0
ORDER BY phi_bp"""))

  val all: Seq[Q] = Seq(qBloomSemiJoin, qCmsHeavyHitters, qCmsJoinSize,
    qMgHeavyHitters, qMgEstError, qQdigestQuantiles, qQdigestEstError)
}
