package graft.flow

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure state fold (SURVEY.md §5.4): direction
  * split, IAT/duration relations, orientation, truncation bounds — over
  * randomly generated single-flow packet sequences.
  */
class FlowPropertiesSpec extends AnyFunSuite {

  /** scalacheck runner without the scalatestplus bridge (offline deps). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val genPacket: Gen[PacketRow] = for {
    ts <- Gen.choose(0L, 100000000L)
    rev <- Gen.oneOf(true, false)
    len <- Gen.choose(40L, 2000L)
    proto <- Gen.oneOf(6L, 17L)
    psh <- Gen.choose(0L, 1L)
    syn <- Gen.choose(0L, 1L)
  } yield {
    val (s, d, sp, dp) = if (rev) ("9.9.9.9", "1.1.1.1", 2L, 1L) else ("1.1.1.1", "9.9.9.9", 1L, 2L)
    PacketRow(0L, ts, proto, len, s, d, sp, dp,
      if (proto == 6) math.max(len - 60, 0) else 0,
      if (proto == 17) math.max(len - 48, 0) else 0,
      0, syn, 0, psh, 0, 0, 0, 0)
  }

  private val genFlow: Gen[List[PacketRow]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, genPacket))
      // one flow key: fix the protocol; unique event ids keep the
      // (ts, id) sort a total order so folds are well-defined
      .map(ps => ps.zipWithIndex.map { case (p, i) =>
        p.copy(protocol = ps.head.protocol, event_id = i.toLong)
      })

  private def feats(ps: List[PacketRow]): FlowFeatures =
    FlowFeaturizer.features(FlowFeaturizer.foldBatch(None, ps), "")

  test("packet and byte conservation; subflow aliases") {
    check(Prop.forAll(genFlow) { ps =>
      val f = feats(ps)
      f.total_fwd_packets + f.total_backward_packets == ps.size &&
      f.total_length_of_fwd_packets + f.total_length_of_bwd_packets == ps.map(_.length).sum &&
      f.subflow_fwd_packets == f.total_fwd_packets &&
      f.subflow_bwd_bytes == f.total_length_of_bwd_packets
    })
  }

  test("orientation comes from the first packet in time order") {
    check(Prop.forAll(genFlow) { ps =>
      val first = ps.minBy(p => (p.ts_us, p.event_id))
      val f = feats(ps)
      f.source_ip == first.src_ip && f.destination_ip == first.dst_ip
    })
  }

  test("IAT totals telescope to at most the flow duration") {
    check(Prop.forAll(genFlow) { ps =>
      val f = feats(ps)
      val span = ps.map(_.ts_us).max - ps.map(_.ts_us).min
      f.fwd_iat_total <= span && f.bwd_iat_total <= span &&
      f.flow_iat_max <= span && f.flow_iat_min >= 0
    })
  }

  test("length stats are ordered: min <= mean <= max; std bounded by range") {
    check(Prop.forAll(genFlow) { ps =>
      val f = feats(ps)
      val ok = f.min_packet_length <= f.packet_length_mean + 1 &&
        f.packet_length_mean <= f.max_packet_length &&
        f.packet_length_std <= (f.max_packet_length - f.min_packet_length)
      ok
    })
  }

  test("canonical key invariance under full src/dst swap") {
    check(Prop.forAll(genFlow) { ps =>
      val swapped = ps.map(p => p.copy(src_ip = p.dst_ip, dst_ip = p.src_ip,
        src_port = p.dst_port, dst_port = p.src_port))
      ps.map(FlowKey.of).toSet == swapped.map(FlowKey.of).toSet
    })
  }

  test("fold is insensitive to input order within a batch") {
    check(Prop.forAll(genFlow) { ps =>
      feats(ps) == feats(scala.util.Random.shuffle(ps))
    })
  }

  test("cross-batch split at any point preserves all non-bulk features") {
    check(Prop.forAll(genFlow, Gen.chooseNum(0, 100)) { (ps0, cut) =>
      val ps = ps0.sortBy(p => (p.ts_us, p.event_id))
      val k = cut % (ps.size + 1)
      val (a, b) = ps.splitAt(k)
      val once = FlowFeaturizer.foldBatch(None, ps)
      val twice =
        if (a.isEmpty || b.isEmpty) once
        else FlowFeaturizer.foldBatch(Some(FlowFeaturizer.foldBatch(None, a)), b)
      // bulk counters are per-batch by design; null them out for compare
      def scrub(s: FlowState) = s.copy(fwdBulkCount = 0, bwdBulkCount = 0)
      scrub(once) == scrub(twice)
    })
  }
}
