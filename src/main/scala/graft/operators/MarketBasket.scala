package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item co-occurrence — "bought together" affinity, the
  * collaborative-filtering primitive behind every recommendation
  * shelf. For each part, the top-[[TopK]] partner parts by the number
  * of shared orders, with a Jaccard affinity over order sets in exact
  * basis points.
  *
  * Shape at scale: the pair join is the canonical bounded self-join —
  * pairs are generated WITHIN an order key, so its cost is
  * Σ k_i·(k_i−1)/2 over basket sizes k_i. That is linear in the fact
  * only while baskets are bounded, so the operator ENFORCES the bound
  * ([[MaxBasket]]): an oversized basket (a crawler cart, a bot order)
  * contributes O(k²) pairs of zero recommendation signal and is
  * dropped whole, the same cap-the-hot-key discipline as the LSH
  * BandCap. Everything downstream is pair-sized: one groupBy to
  * (a,b,n_ab), a broadcast of the |parts|-row order-frequency
  * relation onto both sides, and a per-part top-K window over the
  * pair relation (bounded by parts·avg-neighbors, never fact-sized).
  *
  * Determinism: neighbors rank by (n_ab DESC, partner id ASC) — a
  * total order; Jaccard is floor-division bp over exact distinct
  * counts. All outputs BIGINT.
  */
object MarketBasket {

  val MaxBasket: Int = 32
  val TopK: Int = 3

  /** Top-K co-occurrence neighbors over any (l_orderkey, l_partkey)
    * fact — spec entry for the cap and hand-affinity laws. The capped
    * basket relation `b` is referenced FOUR times (both self-join
    * sides and both frequency lookups); the catalog entry passes it
    * through a cached StageView so the fact is scanned and deduped
    * once — the r12c plan audit counted 24 parquet scans in the
    * uncached spelling.
    */
  private[graft] def cooccurrenceOn(lineitem: DataFrame): DataFrame =
    cooccurrenceOnBasket(cappedBasket(lineitem))

  /** The deduped, MaxBasket-capped (l_orderkey, l_partkey) relation. */
  private[graft] def cappedBasket(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val basket = lineitem.select($"l_orderkey", $"l_partkey").distinct()
    val sized = basket
      .groupBy($"l_orderkey").agg(count(lit(1)).as("bsize"))
      .where($"bsize" <= MaxBasket)
      .select($"l_orderkey")
    basket.join(sized, "l_orderkey")
  }

  /** Unfiltered within-order pair counts (pa < pb, n_ab) — the ONE
    * self-join the whole family runs: co-occurrence, the k-core, and
    * the rules all consume this relation (kcore/rules filter it by
    * support), so the catalog caches it as `mb_pairs_v` and the
    * expensive join happens once per corpus.
    */
  private[graft] def pairCounts(b: DataFrame): DataFrame = {
    val spark = b.sparkSession
    import spark.implicits._
    b.as("x").join(b.as("y"), Seq("l_orderkey"))
      .where($"x.l_partkey" < $"y.l_partkey")
      .groupBy($"x.l_partkey".as("pa"), $"y.l_partkey".as("pb"))
      .agg(count(lit(1)).as("n_ab"))
  }

  private[graft] def basketView(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    // stored, not cached (r16 VERDICT #3): the basket and pair
    // relations are the whole graph family's shared input and were
    // LRU-evicted mid-sweep under ~42-view residency — a local
    // parquet store can't be evicted and frees the memory budget
    StageViews.ensureStored(spark, "mb_basket_v", dir) {
      cappedBasket(Tables.lineitem(spark, dir))
    }

  private[graft] def pairsView(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    StageViews.ensureStored(spark, "mb_pairs_v", dir) {
      pairCounts(basketView(spark, dir))
    }

  private[graft] def cooccurrenceOnBasket(b: DataFrame): DataFrame =
    cooccurrenceOnParts(pairCounts(b), b)

  private[graft] def cooccurrenceOnParts(pairs: DataFrame, b: DataFrame): DataFrame = {
    val spark = b.sparkSession
    import spark.implicits._
    val freq = b.groupBy($"l_partkey").agg(count(lit(1)).as("n_orders"))
    val sym = pairs.select($"pa".as("part"), $"pb".as("neighbor"), $"n_ab")
      .unionAll(pairs.select($"pb".as("part"), $"pa".as("neighbor"), $"n_ab"))
    val withFreq = sym
      .join(broadcast(freq.select($"l_partkey".as("part"), $"n_orders".as("na"))), "part")
      .join(broadcast(freq.select($"l_partkey".as("neighbor"), $"n_orders".as("nb"))), "neighbor")
    withFreq
      .withColumn("rank", row_number().over(
        Window.partitionBy($"part").orderBy($"n_ab".desc, $"neighbor".asc)))
      .where($"rank" <= TopK)
      .selectExpr("part", "CAST(rank AS BIGINT) AS rank", "neighbor", "n_ab",
        "(10000 * n_ab) DIV (na + nb - n_ab) AS jaccard_bp")
      .orderBy("part", "rank")
  }

  val qItemCooccurrence = Q(
    "q_item_cooccurrence",
    (spark, dir) => cooccurrenceOnParts(
      pairsView(spark, dir), basketView(spark, dir)),
    Some(s"""
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (SELECT l_orderkey FROM basket GROUP BY 1 HAVING count(*) <= $MaxBasket),
b AS (SELECT basket.* FROM basket JOIN sized ON basket.l_orderkey = sized.l_orderkey),
pairs AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS n_ab
          FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2),
freq AS (SELECT l_partkey, count(*) AS n_orders FROM b GROUP BY 1),
sym AS (SELECT pa AS part, pb AS neighbor, n_ab FROM pairs
        UNION ALL SELECT pb, pa, n_ab FROM pairs),
ranked AS (SELECT s.part, s.neighbor, s.n_ab, fa.n_orders AS na, fb.n_orders AS nb,
                  row_number() OVER (PARTITION BY s.part
                                     ORDER BY s.n_ab DESC, s.neighbor) AS rank
           FROM sym s JOIN freq fa ON s.part = fa.l_partkey
                      JOIN freq fb ON s.neighbor = fb.l_partkey)
SELECT part, CAST(rank AS BIGINT) AS rank, neighbor, CAST(n_ab AS BIGINT) AS n_ab,
       (10000 * n_ab) // (na + nb - n_ab) AS jaccard_bp
FROM ranked WHERE rank <= $TopK
ORDER BY part, rank""")
  )

  /** 3-core of the co-purchase graph — the dense product communities
    * that survive after every weakly-attached part peels away: parts
    * co-bought (support ≥ [[CoreMinSupport]]) with at least 3 OTHER
    * core members. The assortment-planning cut ("which products form
    * self-reinforcing bundles") that top-K neighbor lists can't
    * answer, because k-core membership is a global fixpoint, not a
    * local rank — a chain hanging off a community peels link by link
    * ([[graft.operators.Graph.kcore]]'s iterative semantics; the dup
    * graph was the wrong host — its sf0.01 components are paths with
    * max degree 2, so every k≥2 core is structurally empty there).
    *
    * Scale: same capped-basket stage as `q_item_cooccurrence`
    * (shared `mb_basket_v` cache); the support filter bounds the edge
    * relation before any peel; [[CorePeels]] = 20 fixed rounds (the
    * sf0.01 graph reaches its fixpoint at 18 — the spec pins
    * convergence), each round degree-count + two semi-joins with the
    * per-round checkpoint. The ORACLE states the identical 20 peels
    * as generated MATERIALIZED CTEs — DuckDB's default inlining would
    * otherwise re-plan the basket pipeline 2^20 times (the
    * fd-exhaustion failure the first spelling hit), the exact dual of
    * the Spark-side lineage blowup.
    */
  val CoreMinSupport: Long = 2L
  val CoreK: Int = 3
  val CorePeels: Int = 20

  private[graft] def supportPairs(b: DataFrame): DataFrame =
    supportEdges(pairCounts(b))

  /** The support-filtered undirected edge list off the shared pair
    * relation. */
  private[graft] def supportEdges(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.where($"n_ab" >= CoreMinSupport)
      .select($"pa".as("u"), $"pb".as("v"))
  }

  val qKcoreCopurchase = Q(
    "q_kcore_copurchase",
    (spark, dir) => {
      import spark.implicits._
      Graph.kcore(supportEdges(pairsView(spark, dir)), CoreK, CorePeels)
        .select($"u".as("part"), $"core_degree")
        .orderBy("part")
    },
    Some {
      val peels = (1 to CorePeels).map { i =>
        s"""k$i AS MATERIALIZED (SELECT u FROM e${i - 1} GROUP BY u HAVING count(*) >= $CoreK),
e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
        JOIN k$i a ON e.u = a.u JOIN k$i b ON e.v = b.u)"""
      }.mkString(",\n")
      s"""
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (SELECT l_orderkey FROM basket GROUP BY 1 HAVING count(*) <= $MaxBasket),
b AS (SELECT basket.* FROM basket JOIN sized ON basket.l_orderkey = sized.l_orderkey),
pairs AS (SELECT x.l_partkey AS u, y.l_partkey AS v
          FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= $CoreMinSupport),
e0 AS MATERIALIZED (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
$peels
SELECT u AS part, count(*) AS core_degree
FROM e$CorePeels
GROUP BY u
ORDER BY part"""
    })

  /** Association rules — directed `antecedent → consequent` over the
    * same capped baskets: support (share of all baskets containing the
    * pair), confidence (share of antecedent baskets that also hold the
    * consequent), and the lift VERDICT stated as the cross-multiplied
    * integer test `n_ab · n_baskets > n_ant · n_cons` (lift > 1 ⟺ the
    * consequent is over-represented among the antecedent's baskets) —
    * no division by a product, so no precision loss and no overflow
    * until counts pass 3·10⁹ (documented bound; far beyond any
    * per-pair count). Every pair emits BOTH directions: confidence is
    * asymmetric, which is the whole point of rules over plain
    * co-occurrence.
    *
    * Scale: pair counts and part frequencies both reduce off the
    * shared cached basket stage; the rule relation is pair-sized.
    */
  val RuleMinSupport: Long = 2L

  private[graft] def rulesOnBasket(b: DataFrame): DataFrame =
    rulesOnParts(pairCounts(b), b)

  private[graft] def rulesOnParts(allPairs: DataFrame, b: DataFrame): DataFrame = {
    val spark = b.sparkSession
    import spark.implicits._
    val pairs = allPairs.where($"n_ab" >= RuleMinSupport)
    val freq = b.groupBy($"l_partkey").agg(count(lit(1)).as("n_orders"))
    val nb = b.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val sym = pairs.select($"pa".as("antecedent"), $"pb".as("consequent"), $"n_ab")
      .unionAll(pairs.select($"pb".as("antecedent"), $"pa".as("consequent"), $"n_ab"))
    sym
      .join(broadcast(freq.select($"l_partkey".as("antecedent"), $"n_orders".as("n_ant"))), "antecedent")
      .join(broadcast(freq.select($"l_partkey".as("consequent"), $"n_orders".as("n_cons"))), "consequent")
      .join(broadcast(nb))
      .selectExpr("antecedent", "consequent", "n_ab", "n_ant",
        "(10000 * n_ab) DIV n_baskets AS support_bp",
        "(10000 * n_ab) DIV n_ant AS confidence_bp",
        "n_ab * n_baskets > n_ant * n_cons AS lifted")
      .orderBy("antecedent", "consequent")
  }

  val qBasketRules = Q(
    "q_basket_rules",
    (spark, dir) => rulesOnParts(
      pairsView(spark, dir), basketView(spark, dir)),
    Some(s"""
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (SELECT l_orderkey FROM basket GROUP BY 1 HAVING count(*) <= $MaxBasket),
b AS (SELECT basket.* FROM basket JOIN sized ON basket.l_orderkey = sized.l_orderkey),
pairs AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb, count(*) AS n_ab
          FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= $RuleMinSupport),
freq AS (SELECT l_partkey, count(*) AS n_orders FROM b GROUP BY 1),
nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM b),
sym AS (SELECT pa AS antecedent, pb AS consequent, n_ab FROM pairs
        UNION ALL SELECT pb, pa, n_ab FROM pairs)
SELECT s.antecedent, s.consequent, CAST(s.n_ab AS BIGINT) AS n_ab,
       CAST(fa.n_orders AS BIGINT) AS n_ant,
       (10000 * s.n_ab) // n_baskets AS support_bp,
       (10000 * s.n_ab) // fa.n_orders AS confidence_bp,
       s.n_ab * n_baskets > fa.n_orders * fc.n_orders AS lifted
FROM sym s
JOIN freq fa ON s.antecedent = fa.l_partkey
JOIN freq fc ON s.consequent = fc.l_partkey
CROSS JOIN nb
ORDER BY antecedent, consequent""")
  )

  /** Triangle census of the co-purchase graph — the community-density
    * complement to the k-core: the core says which parts SURVIVE
    * peeling, the triangle count says how CLOSED the surviving
    * neighborhoods are (a hub-and-spoke assortment has zero triangles
    * at any core depth; bundles close their wedges). Same
    * support-filtered edge set off the shared `mb_pairs_v` stage.
    *
    * The Spark side runs [[graft.operators.Graph.triangleStats]]'s
    * degree-oriented wedge join (|E|^{3/2} bound, hub-safe); the
    * oracle states the naive id-ordered 3-way self-join — identical
    * census by the orientation-correctness law `Round15OpsSpec` pins.
    *
    * SF1-replica note: the ×10 pressure corpus replicates ORDERS over
    * an unreplicated part catalog, so co-purchase density rises ~×10
    * and the wedge relation (the |E|^{3/2} term) dominates the probe's
    * cost there — an artifact of the replica, not the plan; a real
    * ×10 scale-up grows the part domain with the fact (TPC-H scales
    * both), keeping density and per-part degrees roughly constant.
    * ScaleSmoke's probe replicates NODES (disjoint subgraphs), which
    * is that realistic shape, and measures exact ×m census linearity.
    */
  val qTriangleCount = Q(
    "q_triangle_count",
    (spark, dir) =>
      Graph.triangleStats(supportEdges(pairsView(spark, dir))),
    Some(s"""
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (SELECT l_orderkey FROM basket GROUP BY 1 HAVING count(*) <= $MaxBasket),
b AS (SELECT basket.* FROM basket JOIN sized ON basket.l_orderkey = sized.l_orderkey),
pairs AS (SELECT x.l_partkey AS u, y.l_partkey AS v
          FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= $CoreMinSupport),
sym AS (SELECT u FROM pairs UNION ALL SELECT v AS u FROM pairs),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) AS n_wedges
      FROM deg),
e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM pairs),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM pairs e1 JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v
                    JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT n_nodes, n_edges, n_triangles, n_wedges,
       CASE WHEN n_wedges = 0 THEN 0
            ELSE (10000 * 3 * n_triangles) // n_wedges END AS clustering_bp
FROM g CROSS JOIN e CROSS JOIN t
ORDER BY n_nodes"""))

  val all: Seq[Q] = Seq(qItemCooccurrence, qKcoreCopurchase, qBasketRules,
    qTriangleCount)
}
