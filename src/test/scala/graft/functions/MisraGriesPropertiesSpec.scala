package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Misra–Gries summary algebra, driver-side (no
  * Spark): for RANDOM streams, RANDOM capacities, and RANDOM
  * chunk/merge orders, the summary must satisfy the paper guarantees —
  * capacity bound, underestimate-only, (N−M)/(m+1) error, guaranteed
  * retention of provably-heavy keys — and be exact below capacity.
  * Randomizing the merge tree is the point: Spark's partial-aggregate
  * merge order is scheduler-dependent, so the guarantees must hold
  * under EVERY order, not the one a unit test happens to build.
  */
class MisraGriesPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** skewed alphabet: few hot keys, long cold tail */
  private val keyGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("h1", "h2"),
    3 -> Gen.oneOf((1 to 8).map(i => s"w$i")),
    2 -> Gen.chooseNum(1, 200).map(i => s"t$i"))

  private val streamGen: Gen[List[String]] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, keyGen))

  private case class Case(stream: List[String], m: Int,
      cuts: List[Int], order: List[Int])

  private val caseGen: Gen[Case] = for {
    stream <- streamGen
    m <- Gen.chooseNum(1, 12)
    nChunks <- Gen.chooseNum(1, 6)
    cuts <- Gen.listOfN(nChunks - 1,
      Gen.chooseNum(0, math.max(stream.size, 1)))
    order <- Gen.listOfN(nChunks + 4, Gen.chooseNum(0, 1000))
  } yield Case(stream, m, cuts, order)

  /** Split the stream at the (sorted) cut points, reduce each chunk,
    * then fold the chunk summaries in a pseudo-random order drawn from
    * `order` — a different merge tree per generated case.
    */
  private def summarize(c: Case): Map[String, Long] = {
    val agg = MisraGries.aggregator(c.m)
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
    val s = pool.head
    s.keys.zip(s.counts).toMap
  }

  test("guarantees hold under every chunking and merge order") {
    check(Prop.forAll(caseGen) { c =>
      val est = summarize(c)
      val truth = c.stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = c.stream.size.toLong
      val retained = est.values.sum
      val bound = (n - retained) / (c.m + 1)
      val capacityOk = est.size <= c.m
      val underOk = est.forall { case (k, v) => v <= truth.getOrElse(k, 0L) }
      val errorOk = truth.forall { case (k, v) => v - est.getOrElse(k, 0L) <= bound }
      val retainOk = truth.forall { case (k, v) => v <= bound || est.contains(k) }
      capacityOk && underOk && errorOk && retainOk
    })
  }

  test("exact below capacity under every chunking and merge order") {
    val smallAlphabet = Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((1 to 6).map(i => s"k$i"))))
    val gen = for {
      stream <- smallAlphabet
      nChunks <- Gen.chooseNum(1, 6)
      cuts <- Gen.listOfN(nChunks - 1, Gen.chooseNum(0, math.max(stream.size, 1)))
      order <- Gen.listOfN(nChunks + 4, Gen.chooseNum(0, 1000))
    } yield Case(stream, 8, cuts, order) // 6 distinct keys < m = 8
    check(Prop.forAll(gen) { c =>
      summarize(c) ==
        c.stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    })
  }
}
