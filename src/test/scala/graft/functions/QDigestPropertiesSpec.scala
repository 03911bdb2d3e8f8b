package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the q-digest algebra, driver-side (no Spark):
  * for RANDOM value streams, RANDOM capacities, and RANDOM chunk/merge
  * orders, the digest must satisfy its contract — weight conservation,
  * the 4k size bound, the two-sided rank guarantee of the post-order
  * query rule, and exactness below capacity. Randomizing the merge
  * tree is the point (the MisraGriesPropertiesSpec discipline):
  * Spark's partial-merge order is scheduler-dependent, so the
  * guarantees must hold under EVERY order.
  */
class QDigestPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** skewed values: two hot points, a warm band, a wide cold tail */
  private val valueGen: Gen[Long] = Gen.frequency(
    5 -> Gen.oneOf(17L, 4242L),
    3 -> Gen.chooseNum(100L, 140L),
    2 -> Gen.chooseNum(0L, 60000L))

  private case class Case(stream: List[Long], k: Int,
      cuts: List[Int], order: List[Int])

  private val caseGen: Gen[Case] = for {
    n <- Gen.chooseNum(0, 500)
    stream <- Gen.listOfN(n, valueGen)
    k <- Gen.chooseNum(4, 64)
    nChunks <- Gen.chooseNum(1, 6)
    cuts <- Gen.listOfN(nChunks - 1, Gen.chooseNum(0, math.max(n, 1)))
    order <- Gen.listOfN(nChunks + 4, Gen.chooseNum(0, 1000))
  } yield Case(stream, k, cuts, order)

  /** Chunk the stream, reduce each chunk, fold the partials in a
    * pseudo-random merge order, finish (final compress) to nodes.
    */
  private def digest(c: Case): Array[QDigest.Node] = {
    val agg = QDigest.aggregator(c.k)
    val bounds = (0 +: c.cuts.map(_ min c.stream.size).sorted :+ c.stream.size)
    val chunks = bounds.zip(bounds.tail).map { case (a, b) =>
      c.stream.slice(a, b).foldLeft(agg.zero)(agg.reduce)
    }
    var pool = chunks.toVector
    var i = 0
    while (pool.size > 1) {
      val a = c.order(i % c.order.size) % pool.size
      val rest = pool.patch(a, Nil, 1)
      val b = c.order((i + 1) % c.order.size) % rest.size
      pool = rest.patch(b, Nil, 1) :+ agg.merge(pool(a), rest(b))
      i += 2
    }
    agg.finish(pool.head)
  }

  /** The catalog query's post-order rank rule over finished nodes. */
  private def quantile(nodes: Array[QDigest.Node], r: Long): Long = {
    var cum = 0L
    var ans = QDigest.Universe - 1
    val it = nodes.sortBy(n => (n.hi, n.hi - n.lo)).iterator
    var found = false
    while (it.hasNext && !found) {
      val n = it.next()
      cum += n.cnt
      if (cum >= r) { ans = n.hi - 1; found = true }
    }
    ans
  }

  test("weight conservation, size bound, and the two-sided rank guarantee") {
    check(Prop.forAll(caseGen) { c =>
      val nodes = digest(c)
      val n = c.stream.size.toLong
      val weightOk = nodes.map(_.cnt).sum == n
      val sizeOk = nodes.length <= QDigest.sizeBound(c.k)
      val eps = QDigest.epsN(n, c.k)
      val rankOk = n == 0 || Seq(1L, n / 4 max 1, n / 2 max 1, n).forall { r =>
        val q = quantile(nodes, r)
        val le = c.stream.count(_ <= q).toLong
        val lt = c.stream.count(_ < q).toLong
        le >= r && lt <= r + eps
      }
      weightOk && sizeOk && rankOk
    })
  }

  test("exact histogram below capacity under every chunking and merge order") {
    val gen = for {
      n <- Gen.chooseNum(0, 120)
      stream <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L))
      nChunks <- Gen.chooseNum(1, 6)
      cuts <- Gen.listOfN(nChunks - 1, Gen.chooseNum(0, math.max(n, 1)))
      order <- Gen.listOfN(nChunks + 4, Gen.chooseNum(0, 1000))
    } yield Case(stream, 128, cuts, order) // N ≤ 120 < k = 128 → t = 0
    check(Prop.forAll(gen) { c =>
      val nodes = digest(c)
      val truth = c.stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val leavesOnly = nodes.forall(nd => nd.hi - nd.lo == 1)
      val exact = nodes.map(nd => nd.lo -> nd.cnt).toMap == truth
      leavesOnly && exact
    })
  }
}
