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

  /** Canonical (hi, lo) orientation with self-loops dropped. */
  private def orient(edges: DataFrame): DataFrame =
    edges
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

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
        .select(col("v").as("u"), col("m").as("v")))
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

  /** Connected components of the undirected graph given by `pairs`
    * (two BIGINT columns, any names). Returns (id, rep): one row per
    * non-isolated vertex, rep = minimum id of its component (rep rows
    * map to themselves). Callers left-join their full vertex set and
    * coalesce to cover singletons.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val cols = pairs.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    var e = orient(pairs.toDF("u", "v")
      .select(col("u").cast("bigint"), col("v").cast("bigint")))
      .localCheckpoint(true)
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
}
