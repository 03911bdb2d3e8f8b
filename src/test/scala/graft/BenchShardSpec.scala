package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function laws of the bench shard cutter (no Spark session).
  * r20 ADVICE: the 1.5x hard cap must bind on the LAST planned shard
  * too — with a stale cost record that prices alphabetically-early
  * queries expensive, the old remShards > 1 guard cut the first k-1
  * shards small and piled everything else into the final shard.
  */
class BenchShardSpec extends AnyFunSuite {

  private def items(n: Int): Seq[(String, Int)] =
    (0 until n).map(i => f"q$i%03d" -> i)

  test("hard cap binds on every shard, including past the planned count") {
    // stale record: the first 10 queries look enormous, the rest cheap
    val costs = items(100).map { case (n, i) =>
      n -> (if (i < 10) 100.0 else 0.01)
    }.toMap
    val shards = Bench.costBalancedShards(items(100), costs, Map.empty, 30)
    val hardCap = 30 + 30 / 2
    assert(shards.forall(_.size <= hardCap),
      s"shard over cap: sizes ${shards.map(_.size)}")
    assert(shards.flatten == items(100), "order/coverage must be preserved")
  }

  test("balanced costs cut near the target count with no empty shards") {
    val costs = items(90).map { case (n, _) => n -> 1.0 }.toMap
    val shards = Bench.costBalancedShards(items(90), costs, Map.empty, 30)
    assert(shards.nonEmpty && shards.forall(_.nonEmpty))
    assert(shards.flatten == items(90))
    assert(shards.size >= 3 && shards.size <= 4)
  }

  test("no cost record degrades to fixed-size grouping") {
    val shards = Bench.costBalancedShards(items(65), Map.empty, Map.empty, 30)
    assert(shards.map(_.size) == Seq(30, 30, 5))
  }

  test("affinity order: no touch data is the identity permutation") {
    assert(Bench.affinityOrder(items(20), Seq.empty) == items(20))
  }

  test("affinity order: stage-sharing queries become contiguous, rest stable") {
    val base = items(8) // q000..q007
    val touches = Seq("mb_v" -> "q001", "mb_v" -> "q006")
    val got = Bench.affinityOrder(base, touches).map(_._1)
    // cluster {q001, q006} anchors at q001's position; everything else
    // keeps sorted order
    assert(got == Seq("q000", "q001", "q006", "q002", "q003", "q004", "q005", "q007"))
  }

  test("affinity order: transitive union across shared views") {
    val base = items(8)
    val touches = Seq(
      "v1" -> "q002", "v1" -> "q005",
      "v2" -> "q005", "v2" -> "q007")
    val got = Bench.affinityOrder(base, touches).map(_._1)
    assert(got == Seq("q000", "q001", "q002", "q005", "q007", "q003", "q004", "q006"))
  }

  test("affinity order: unknown query names are ignored, coverage preserved") {
    val base = items(6)
    val touches = Seq("v" -> "q001", "v" -> "q_not_in_catalog", "v" -> "q004")
    val got = Bench.affinityOrder(base, touches)
    assert(got.map(_._1).sorted == base.map(_._1))
    assert(got.map(_._1) == Seq("q000", "q001", "q004", "q002", "q003", "q005"))
  }

  test("cluster size cap skips the cheapest spanning view") {
    // expensive view E binds q000..q005; cheap view C would chain that
    // cluster on through q009 (combined 10 > cap 8), so C is the union
    // that gets skipped — its rebuild is the cheap one
    val base = items(10)
    val touches =
      (0 to 5).map(i => "E" -> f"q$i%03d") ++
        (5 to 9).map(i => "C" -> f"q$i%03d")
    val costs = Map("E" -> 2.0, "C" -> 0.1)
    val (_, clusters) = Bench.affinityPlan(base, touches, costs, 8)
    val eCluster = (0 to 5).map(i => clusters(f"q$i%03d")).toSet
    assert(eCluster.size == 1, "expensive view's members must stay together")
    assert((6 to 9).forall(i => clusters(f"q$i%03d") != eCluster.head),
      "cheap spanning view must not merge past the cap")
  }

  test("cost cuts defer to cluster boundaries") {
    // uniform costs would cut 30|30 — but q029/q030 share a cluster,
    // so the cut slides to the next boundary and the cluster stays
    // whole in one shard
    val base = items(60)
    val costs = base.map { case (n, _) => n -> 1.0 }.toMap
    val clusters = base.map { case (n, i) =>
      n -> (if (i >= 28 && i <= 33) 1000 else i)
    }.toMap
    val shards = Bench.costBalancedShards(base, costs, Map.empty, 30,
      2.0, clusters)
    assert(shards.flatten == base)
    val cl = shards.map(_.map(_._1).filter(n => clusters(n) == 1000))
    assert(cl.count(_.nonEmpty) == 1,
      s"cluster split across shards: ${cl.filter(_.nonEmpty)}")
  }

  test("hard cap still cuts inside a cluster bigger than the cap") {
    val base = items(100)
    val costs = base.map { case (n, _) => n -> 1.0 }.toMap
    val clusters = base.map { case (n, _) => n -> 0 }.toMap // one mega-cluster
    val shards = Bench.costBalancedShards(base, costs, Map.empty, 30,
      2.0, clusters)
    val hardCap = 30 + 30 / 2
    assert(shards.forall(_.size <= hardCap))
    assert(shards.flatten == base)
  }

  test("repMult reweights query seconds against build seconds") {
    // two expensive-query regions; under repMult=10 the query seconds
    // dominate the single big build and boundaries shift accordingly
    val base = items(60)
    val costs = base.map { case (n, i) => n -> (if (i < 30) 2.0 else 0.1) }.toMap
    val builds = Map("q045" -> 60.0)
    val s2 = Bench.costBalancedShards(base, costs, builds, 30, 2.0)
    val s10 = Bench.costBalancedShards(base, costs, builds, 30, 10.0)
    assert(s2.flatten == base && s10.flatten == base)
    // first-shard size shrinks when query cost is weighted 5x higher
    assert(s10.head.size <= s2.head.size)
  }
}
