package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the pairs→clusters step every dedup family needs before it can pick
  * one canonical document per duplicate group (the LSH queries emit
  * verified PAIRS; transitively-linked pairs are one cluster).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each
  * round is two shuffle stages (a per-node min aggregation joined back
  * to the symmetric edge list), and the edge set provably converges to
  * one star per component rooted at the component's minimum id in
  * O(log²​ n) rounds (2-3 in practice for dedup graphs, whose
  * components are small and dense). No adjacency list is ever
  * materialized per node beyond the shuffle, so a 100 TB corpus's
  * pair graph streams through; the per-round `localCheckpoint`
  * truncates the iterative plan lineage (on a cluster, substitute a
  * reliable `checkpoint` to a DFS dir — the call site is the only
  * change).
  *
  * The per-round convergence probe is a 2-long scalar aggregate
  * (count + order-independent xxhash64 XOR — XOR, not sum, because the
  * edge relation is distinct and an ANSI-mode sum of 2^63-scale hashes
  * overflows), not a data collect.
  */
object Graph {

  private val MaxRounds = 25

  /** Canonical (hi, lo) orientation with self-loops dropped. The
    * `distinct` is a full shuffle, so it is applied only where the
    * algorithm needs set semantics (the round output that feeds the
    * convergence signature) — large-star's intermediate may carry
    * duplicate rows freely: they change neither the min aggregation
    * nor the next orient-distinct, only shuffle volume bounded by |E|.
    */
  private def orient(edges: DataFrame, dedup: Boolean = true): DataFrame = {
    val o = edges
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    if (dedup) o.distinct() else o
  }

  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** large-star: every node links its LARGER neighbors to the minimum
    * of its neighborhood (min over N(u) ∪ {u}).
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    orient(
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")),
      dedup = false)
  }

  /** small-star: every node links its not-larger neighbors (and itself)
    * to the minimum of that set. Input must be (hi, lo) oriented.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min("v").as("m"))
    val relink = edges.join(mins, "u").where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    orient(relink.union(mins.select(col("u"), col("m").as("v"))))
  }

  /** One large-star ∘ small-star round over raw (u, v) pairs — exposed
    * for PlanHygieneSpec: the converged loop localCheckpoints every
    * round, so the final output's physical plan no longer contains the
    * iterated join shape and a plan sweep over the query result would
    * silently skip it.
    */
  private[graft] def ccRound(edges: DataFrame): DataFrame =
    smallStar(largeStar(orient(edges)))

  /** One PageRank power-iteration round: (u, v, d) weighted edges ⋈
    * (id, r) ranks → next ranks. Exposed for the same plan-sweep reason
    * as [[ccRound]]; [[pageRankInt]] iterates exactly this.
    */
  private[graft] def prRound(edges: DataFrame, ranks: DataFrame): DataFrame =
    edges.join(ranks, edges("u") === ranks("id"))
      .select(col("v").as("id"), expr("r DIV d").as("c"))
      .groupBy("id")
      .agg(expr("150000 + (85 * sum(c)) DIV 100").as("r"))

  /** Edge count under which the whole graph is solved on the driver —
    * the same adaptive logic as a broadcast join threshold: a verified
    * duplicate-pair graph is typically orders of magnitude smaller than
    * the corpus that produced it, and union-find on ≤1M edges is
    * milliseconds versus several distributed star rounds (each 2
    * shuffles + a convergence job). Above the threshold the O(log² n)
    * distributed iteration runs unchanged.
    */
  private[graft] val LocalEdgeThreshold: Long = 1L << 20

  /** Weighted-by-rank union-find with path compression (driver-side
    * small-graph path).
    */
  private def localComponents(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Connected components of the undirected graph given by `pairs`
    * (two BIGINT columns, any names). Returns (id, rep): one row per
    * non-isolated vertex, rep = minimum id of its component (rep rows
    * map to themselves). Callers left-join their full vertex set and
    * coalesce to cover singletons.
    */
  def connectedComponents(pairs: DataFrame,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val cols = pairs.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    // Materialize the oriented-but-not-deduped edges first: a NARROW
    // stage (no shuffle). The threshold decision uses the raw pair
    // count (conservative — duplicates only push toward the
    // distributed path), and union-find is duplicate-proof, so the
    // local path never pays a shuffle at all.
    val e0 = orient(pairs.toDF("u", "v")
      .select(col("u").cast("bigint"), col("v").cast("bigint")), dedup = false)
      .localCheckpoint(true)
    if (e0.count() <= localThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val comp = localComponents(
        e0.collect().map(r => (r.getLong(0), r.getLong(1))))
      e0.unpersist(blocking = false)
      return comp.toSeq.toDF("id", "rep")
    }
    var e = e0.distinct().localCheckpoint(true)
    e0.unpersist(blocking = false)
    var sig = signature(e)
    var round = 0
    var converged = e.isEmpty
    while (!converged && round < MaxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nsig = signature(next)
      e.unpersist(blocking = false)
      e = next
      converged = nsig == sig
      sig = nsig
      round += 1
    }
    require(converged, s"connected components did not converge in $MaxRounds rounds")
    // converged: every edge is (member, component-min); add the rep itself
    e.select(col("u").as("id"), col("v").as("rep"))
      .union(e.select(col("v").as("id"), col("v").as("rep")).distinct())
  }

  /** Fixed-iteration PageRank in EXACT integer micro-units over an
    * undirected pair list — centrality without floats, so two engines
    * agree bit-for-bit (double PageRank sums neighbor contributions in
    * partition order; integer sums are order-free).
    *
    * Per-node form, damping 0.85, ranks in millionths:
    * r₀ = 1,000,000;  rₖ₊₁(v) = 150,000 + (85 · Σ_{u→v} (rₖ(u) DIV
    * deg(u))) DIV 100. Each DIV floors exactly the same way everywhere;
    * the (bounded, documented) truncation loss is the price of
    * determinism. Symmetric edges mean in-degree = out-degree ≥ 1 for
    * every node in the pair graph, so there is no dangling mass.
    *
    * Adaptive like [[connectedComponents]]: a verified duplicate-pair
    * graph is orders of magnitude smaller than the corpus that produced
    * it, and below [[LocalEdgeThreshold]] raw pairs the whole power
    * iteration runs on the driver over collected arrays (integer
    * arithmetic is identical, so the result is bit-equal — pinned by
    * Round9OpsSpec) instead of paying `iters` shuffle-join rounds, each
    * with a localCheckpoint materialization job, to rank a few hundred
    * thousand edges. Measured at sf1 (250 k pairs / 50 k nodes,
    * q_pagerank_dup steady-state with warm stage views): 18.6 s
    * distributed → 4.7 s local, and the remaining cost is the verified-
    * pair generation, not the rank solve. Above the threshold the
    * distributed iteration runs unchanged.
    *
    * Scale (distributed path): the edge list with degrees is cached
    * once; each of the `iters` rounds is ONE shuffle join (ranks ⋈
    * edges on the source) plus a sum aggregation on the destination —
    * the same join keys every round, so a cluster run co-partitions
    * edges once and reuses the layout. Iterations are a fixed constant:
    * this is power iteration for ranking, not convergence detection.
    */
  def pageRankInt(pairs: DataFrame, iters: Int,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    // narrow stage (no shuffle), same device as connectedComponents:
    // the threshold decision reads the RAW pair count, conservative
    // because duplicates only push toward the distributed path
    // no self-loop filter: the distributed path never had one (a (u,u)
    // pair survives sym-distinct as one edge feeding its own rank), and
    // the Set-based local adjacency reproduces exactly that
    val p0 = pairs.select(col("u").cast("bigint"), col("v").cast("bigint"))
      .localCheckpoint(true)
    if (p0.count() <= localThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val ranked = localPageRank(
        p0.collect().map(r => (r.getLong(0), r.getLong(1))), iters)
      p0.unpersist(blocking = false)
      return ranked.toSeq.toDF("id", "degree", "rank_micros")
    }
    val sym = p0.union(p0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    // materialize ONCE and cut lineage: without the per-round
    // truncation the rank plan re-embeds the (possibly huge) pair
    // derivation per iteration and Catalyst replans a multiplying DAG
    // (measured: ~3k Exchange nodes and 72 s at sf1 for 5 rounds; ~2 s
    // truncated). Same device as connectedComponents; on a cluster,
    // substitute reliable checkpoints.
    val edges = sym.join(deg, "u")
      .select(col("u"), col("v"), col("d")).localCheckpoint(true)
    p0.unpersist(blocking = false)
    val nodes = edges.select(col("u").as("id")).distinct()
    var r = nodes.select(col("id"), lit(1000000L).as("r")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val next = prRound(edges, r).localCheckpoint(true)
      r.unpersist(blocking = false)
      r = next
    }
    edges.select(col("u").as("id"), col("d")).distinct()
      .join(r, "id")
      .select(col("id"), col("d").as("degree"), col("r").as("rank_micros"))
  }

  /** Driver-side power iteration, the exact integer recurrence of
    * [[prRound]]: symmetric-distinct neighbor lists, then `iters`
    * rounds of rₖ₊₁(v) = 150,000 + (85 · Σ (rₖ(u) DIV d(u))) DIV 100.
    * Sum order cannot matter (exact integers), so this is bit-equal to
    * the distributed path by construction.
    */
  private def localPageRank(rawPairs: Array[(Long, Long)],
      iters: Int): Seq[(Long, Long, Long)] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    rawPairs.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set[Long]()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set[Long]()) += u
    }
    var r = adj.keysIterator.map(k => k -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val next = scala.collection.mutable.Map[Long, Long]()
      adj.foreach { case (u, nbrs) =>
        val c = r(u) / nbrs.size
        nbrs.foreach(v => next(v) = next.getOrElse(v, 0L) + c)
      }
      r = next.iterator.map { case (v, s) => v -> (150000L + (85L * s) / 100L) }.toMap
    }
    adj.iterator.map { case (u, nbrs) => (u, nbrs.size.toLong, r(u)) }.toSeq
  }

  /** k-core of an undirected edge list by iterative peeling: drop every
    * node with degree < k, recompute degrees, repeat `peels` times —
    * membership depends on earlier removals, so a single degree filter
    * is NOT the answer (a chain hanging off a clique peels one link
    * per round). Each round is one map-side-combinable degree count
    * plus two semi-joins of the shrinking symmetric edge relation,
    * with a `localCheckpoint` per round: every peel references its
    * predecessor twice, so an unbroken lineage doubles the ANALYZED
    * plan each round (2^peels blowup in planning — the same hazard the
    * CC solve breaks the same way). Callers pick `peels` ≥ the
    * observed fixpoint depth of their graph family and assert
    * convergence in a spec.
    *
    * Returns (doc/node id as `u`, `core_degree`) for surviving nodes.
    */
  def kcore(pairs: DataFrame, k: Int, peels: Int): DataFrame = {
    var edges = pairs.select(col("u"), col("v"))
      .unionAll(pairs.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    // early exit on the fixpoint: counts are near-free on the
    // checkpointed relation, and a converged peel is the identity —
    // stopping early cannot change the result, only skip no-op rounds
    // (the sf1 probe showed 20 blind rounds costing 21 s where the
    // graph converges in far fewer)
    var prev = edges.count()
    var i = 0
    var converged = false
    while (i < peels && !converged) {
      val keep = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select(col("u").as("kn"))
      edges = edges
        .join(keep, col("u") === col("kn")).drop("kn")
        .join(keep.withColumnRenamed("kn", "kv"), col("v") === col("kv")).drop("kv")
        .localCheckpoint()
      val n = edges.count()
      converged = n == prev
      prev = n
      i += 1
    }
    edges.groupBy(col("u")).agg(count(lit(1)).as("core_degree"))
  }

  /** Global triangle census over a canonical (u < v, set-semantics)
    * undirected edge list: node/edge/triangle/wedge counts and the
    * global clustering coefficient (closed-wedge share) in exact basis
    * points.
    *
    * Algorithm: DEGREE-ORIENTED wedge join (Suri & Vassilvitskii,
    * "Counting Triangles and the Curse of the Last Reducer", WWW'11).
    * Every edge is directed from its lower-(degree, id) endpoint to the
    * higher; wedges are pairs of out-edges sharing an apex, closed
    * against the canonical edge set. The orientation makes every
    * node's out-degree O(√|E|), so the wedge relation — the only
    * super-linear intermediate a triangle count can produce — is
    * bounded by |E|^{3/2} with NO dependence on the max raw degree:
    * the one hub that shows up in every basket stops generating
    * deg²≈|E|² wedges (the "last reducer" the naive apex join dies
    * on) because almost all its edges point INTO it. Each triangle is
    * counted exactly once — its unique lowest-(degree, id) corner is
    * the only apex whose two triangle edges both point outward.
    *
    * Everything else is linear: degrees are one map-side-combinable
    * aggregate (broadcast back onto edges — node-sized), the closure
    * join keys wedges against edges on the (lo, hi) pair, and the
    * output is a single global-aggregate row. The wedge TOTAL (the
    * clustering denominator) comes off the degree relation as
    * Σ d·(d−1)/2 without materializing any wedge.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // The census reads `edges` five ways (degrees, two orientation
    // sides, closure, edge count) and `dir` twice (both wedge sides);
    // left lazy, every consumer re-runs the upstream support filter
    // and the broadcast-degree join as its own chain of stages — pure
    // plan overhead that at sf0.1 cost more than the data (2.7 s for
    // a 3.6k-edge graph). A LAZY local checkpoint materializes each
    // |E|-bounded relation once on first use and lets every later
    // branch read the persisted blocks, while keeping plan BUILDING
    // execution-free (eager checkpointing here would break the
    // explain-only consumers — the StageViews lazy-registration rule).
    val edges = pairs.select(col("u"), col("v")).localCheckpoint(eager = false)
    val sym = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val globals = deg.agg(
      count(lit(1)).cast("bigint").as("n_nodes"),
      coalesce(sum(expr("d * (d - 1) DIV 2")), lit(0L)).cast("bigint")
        .as("n_wedges"))
    val withDeg = edges
      .join(broadcast(deg.select(col("u"), col("d").as("du"))), Seq("u"))
      .join(broadcast(deg.select(col("u").as("v"), col("d").as("dv"))), Seq("v"))
    val dir = withDeg.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      .localCheckpoint(eager = false)
    // out-neighbor pairs in id order (each unordered pair once), closed
    // against the id-canonical edge set
    val wedges = dir.as("w1").join(dir.as("w2"),
        col("w1.s") === col("w2.s") && col("w1.t") < col("w2.t"))
      .select(col("w1.t").as("u"), col("w2.t").as("v"))
    val tri = wedges.join(edges, Seq("u", "v"))
      .agg(count(lit(1)).cast("bigint").as("n_triangles"))
    val ecnt = edges.agg(count(lit(1)).cast("bigint").as("n_edges"))
    globals.crossJoin(ecnt).crossJoin(tri)
      .selectExpr("n_nodes", "n_edges", "n_triangles", "n_wedges",
        "CASE WHEN n_wedges = 0 THEN 0 ELSE (10000 * 3 * n_triangles) DIV n_wedges END AS clustering_bp")
      .orderBy("n_nodes")
  }
}
