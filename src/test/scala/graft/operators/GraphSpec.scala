package graft.operators

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Graph.connectedComponents]] against a brute-force union-find
  * on random graphs — the oracle gate only exercises it on the LSH pair
  * graph, whose components are small; these cover long paths (many
  * star rounds), large stars, duplicate/reversed/self-loop input, and
  * the empty graph.
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
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

  /** threshold 0 forces the distributed star iteration; the default
    * takes the driver-local union-find shortcut — both must agree with
    * brute force.
    */
  private def ccOf(edges: Seq[(Long, Long)], threshold: Long): Map[Long, Long] = {
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("u", "v"), threshold).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  for ((label, threshold) <- Seq(("distributed", 0L), ("local", Graph.LocalEdgeThreshold))) {

    test(s"[$label] random sparse graphs match brute-force union-find") {
      val rnd = new Random(42)
      for (trial <- 1 to 3) {
        val n = 200 + trial * 100
        val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        assert(ccOf(edges, threshold) == bruteForce(edges.filter(e => e._1 != e._2)),
          s"trial $trial mismatch")
      }
    }

    test(s"[$label] a single long path converges to one component (stress rounds)") {
      val path = (0L until 300L).map(i => (i, i + 1))
      val cc = ccOf(path, threshold)
      assert(cc.keySet == (0L to 300L).toSet)
      assert(cc.values.toSet == Set(0L))
    }

    test(s"[$label] one large star plus duplicates/reversed edges/self-loops") {
      val star = (1L to 500L).flatMap(i => Seq((0L, i), (i, 0L), (i, i)))
      val cc = ccOf(star ++ star, threshold)
      assert(cc.values.toSet == Set(0L))
      assert(cc.keySet == (0L to 500L).toSet)
    }

    test(s"[$label] empty edge list yields empty output") {
      assert(ccOf(Seq.empty, threshold).isEmpty)
    }

    test(s"[$label] representatives map to themselves") {
      val rnd = new Random(7)
      val edges = Seq.fill(400)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      val cc = ccOf(edges, threshold)
      cc.values.toSet.foreach { (rep: Long) => assert(cc(rep) == rep) }
    }
  }

  private def prOf(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Graph.pageRankInt(edges.toDF("u", "v"), iters).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("rank_micros"))).toMap
  }

  test("pageRankInt: star center outranks leaves; leaves are symmetric") {
    val star = (1L to 8L).map(i => (0L, i))
    val pr = prOf(star)
    val (centerDeg, centerRank) = pr(0L)
    assert(centerDeg == 8L)
    val leafRanks = (1L to 8L).map(pr(_)._2).distinct
    assert(leafRanks.size == 1, "symmetric leaves must have equal ranks")
    assert(centerRank > leafRanks.head, "hub must outrank leaves")
  }

  test("pageRankInt: regular graphs are rank-uniform fixpoints (isolated pair, ring)") {
    // every node of a k-regular graph keeps r = 1,000,000 exactly:
    // contribution sum = r, and 150000 + (85*r) DIV 100 = r at r=1e6
    val pair = Seq((10L, 11L))
    assert(prOf(pair).values.map(_._2).toSet == Set(1000000L))
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6))
    assert(prOf(ring).values.map(_._2).toSet == Set(1000000L))
  }

  test("pageRankInt: disconnected components rank independently; iteration count matters") {
    val g = Seq((0L, 1L), (0L, 2L), (5L, 6L))  // a path-star + an isolated pair
    val pr = prOf(g)
    assert(pr(5L)._2 == 1000000L && pr(6L)._2 == 1000000L)
    assert(pr(0L)._2 > pr(1L)._2)
    // 1 iteration differs from 5 on the non-regular component
    val pr1 = prOf(g, iters = 1)
    assert(pr1(0L)._2 != pr(0L)._2)
  }
}
