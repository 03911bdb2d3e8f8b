package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Q-digest quantile summary as a typed, MERGEABLE custom aggregate —
  * the rank/quantile member of the engine's sketch family (HLL =
  * distinct, CMS = frequency, Misra–Gries = heavy keys, Bloom =
  * membership; this = "what value sits at rank φ·N" with bounded
  * state). Unlike `percentile_approx`'s library sketch, this is the
  * engine's own summary with spec-pinned guarantees and a
  * driver-visible bound audit (`q_qdigest_est_error`), the same arc as
  * [[MisraGries]].
  *
  * Algorithm (Shrivastava, Buragohain, Agrawal, Suri 2004 — sensor
  * q-digest; merge per Agarwal et al., "Mergeable Summaries", PODS
  * 2012): counts live on nodes of the dyadic tree over the integer
  * universe [0, 2^[[QDigest.Bits]]); an input value increments its
  * leaf; COMPRESS walks levels bottom-up merging every family whose
  * combined count c(left)+c(right)+c(parent) < t = ⌊N/k⌋ into the
  * parent, so detail survives exactly where mass concentrates. Merge
  * sums counts nodewise and recompresses under the combined N.
  *
  * Guarantees (spec-pinned, `QDigestSpec`/`QDigestPropertiesSpec`,
  * asserted across chunkings and merge orders):
  *  - query rule: nodes in post-order (ascending upper bound,
  *    descendants before ancestors), first node where the cumulative
  *    count reaches r = ⌈φN⌉, answer = that node's max value. Then
  *    count(values ≤ answer) ≥ r (never undershoots) and
  *    count(values < answer) ≤ r + [[QDigest.epsN]] — ancestors on the
  *    query path each hold ≤ ~t misattributable mass and there are
  *    ≤ Bits of them, so the rank error is O(t·log u) = O(N·log(u)/k);
  *  - size after compression ≤ 4k nodes whatever N (the hard memory
  *    bound; the paper's 3k plus small-N slop — property-tested);
  *  - EXACT when t = ⌊N/k⌋ = 0 (N < k): nothing ever compresses, the
  *    digest is the exact value histogram and the query rule
  *    degenerates to the textbook discrete quantile. The catalog
  *    query `q_qdigest_quantiles` runs in this regime at the oracle
  *    SFs — the same hash-checkable-below-capacity /
  *    bound-audited-above discipline as the Misra–Gries pair.
  *
  * Engine mechanics: identical to [[MisraGries]] — the buffer is
  * parallel id/count arrays (product-encodable, no kryo), kept sorted
  * by node id so the hot path is an in-place binary-search increment,
  * and compression amortizes (triggered when the buffer outgrows ~6k
  * slots, always applied at partial-output and finish).
  */
object QDigest {

  /** log2 of the value universe: values are clamped to [0, 2^Bits). */
  val Bits = 20
  val Universe: Long = 1L << Bits

  /** Digest buffer: heap-numbered dyadic-tree node ids (root 1; leaf
    * for value v = Universe + v) with counts, plus the total weight.
    */
  final case class Digest(ids: Array[Long], counts: Array[Long], n: Long)

  /** One emitted node: values in [lo, hi) with `cnt` occurrences
    * attributed (hi − lo = 1 for leaves = exact values).
    */
  final case class Node(lo: Long, hi: Long, cnt: Long)

  private def level(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Rank-error budget εN for a digest of weight n at capacity k: each
    * of the ≤ Bits strict ancestors on the query path carries ≤ ~2t
    * misattributable mass (t from compression, ×2 for pre-compress
    * merge sums) — the O(N·log(u)/k) q-digest bound with an explicit
    * constant the property specs validate across merge orders.
    */
  def epsN(n: Long, k: Int): Long = 2L * (n / k) * (Bits + 1)

  /** Hard size bound after compression (paper's 3k + small-N slop). */
  def sizeBound(k: Int): Int = 4 * k


  /** Bottom-up family compression under t = ⌊n/k⌋. Deterministic given
    * the node counts; a no-op while t = 0 (the exact regime).
    */
  private[graft] def compress(d: Digest, k: Int): Digest = {
    val t = d.n / k
    if (t == 0 || d.ids.isEmpty) return d
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < d.ids.length) {
      if (d.counts(i) > 0) m(d.ids(i)) = m.getOrElse(d.ids(i), 0L) + d.counts(i)
      i += 1
    }
    var lvl = Bits
    while (lvl >= 1) {
      // parents of this level's nodes; families merging up must not be
      // re-examined within the sweep (their parent level comes later)
      val parents = m.keys.iterator.filter(id => level(id) == lvl)
        .map(_ >> 1).toArray.distinct
      var j = 0
      while (j < parents.length) {
        val p = parents(j)
        val family = m.getOrElse(2 * p, 0L) + m.getOrElse(2 * p + 1, 0L) +
          m.getOrElse(p, 0L)
        if (family < t) {
          m -= 2 * p
          m -= (2 * p + 1)
          if (family > 0) m(p) = family else m -= p
        }
        j += 1
      }
      lvl -= 1
    }
    val ids = m.keys.toArray.sorted
    Digest(ids, ids.map(m), d.n)
  }

  /** One update step: clamp to the universe, binary-search the leaf
    * (ids are maintained SORTED — zero/compress/merge all emit sorted
    * arrays, so the invariant holds across every construction path),
    * increment in place on a hit, sorted-insert on a miss, compress
    * when the buffer outgrows its amortization window. O(log s) per
    * tracked value instead of the previous O(s) linear probe — the
    * hit path dominates (misses ≤ distinct values), so updates stay
    * cheap even at large capacities over wide value domains.
    */
  private[graft] def update(d: Digest, value: Long, k: Int): Digest = {
    val v = math.min(math.max(value, 0L), Universe - 1)
    val id = Universe + v
    val i = java.util.Arrays.binarySearch(d.ids, id)
    val grown =
      if (i >= 0) { d.counts(i) += 1L; Digest(d.ids, d.counts, d.n + 1) }
      else {
        val ins = -(i + 1)
        val nids = new Array[Long](d.ids.length + 1)
        val ncnt = new Array[Long](d.counts.length + 1)
        System.arraycopy(d.ids, 0, nids, 0, ins)
        System.arraycopy(d.counts, 0, ncnt, 0, ins)
        nids(ins) = id
        ncnt(ins) = 1L
        System.arraycopy(d.ids, ins, nids, ins + 1, d.ids.length - ins)
        System.arraycopy(d.counts, ins, ncnt, ins + 1, d.counts.length - ins)
        Digest(nids, ncnt, d.n + 1)
      }
    if (grown.ids.length > 6 * k + 64) compress(grown, k) else grown
  }

  /** PODS-2012 merge: nodewise count sums, recompress under the
    * combined weight.
    */
  private[graft] def mergeDigests(a: Digest, b: Digest, k: Int): Digest = {
    if (a.ids.isEmpty) return b
    if (b.ids.isEmpty) return a
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < a.ids.length) { m(a.ids(i)) = a.counts(i); i += 1 }
    i = 0
    while (i < b.ids.length) {
      m(b.ids(i)) = m.getOrElse(b.ids(i), 0L) + b.counts(i)
      i += 1
    }
    val ids = m.keys.toArray.sorted
    compress(Digest(ids, ids.map(m), a.n + b.n), k)
  }

  def aggregator(k: Int): Aggregator[Long, Digest, Array[Node]] = {
    require(k >= 1, s"compression factor must be >= 1: $k")
    new Aggregator[Long, Digest, Array[Node]] {
      def zero: Digest = Digest(Array.empty, Array.empty, 0L)
      def reduce(b: Digest, value: Long): Digest = QDigest.update(b, value, k)
      def merge(a: Digest, b: Digest): Digest = QDigest.mergeDigests(a, b, k)
      def finish(r: Digest): Array[Node] = {
        val c = compress(r, k)
        val out = new Array[Node](c.ids.length)
        var i = 0
        while (i < out.length) {
          val id = c.ids(i)
          val lvl = level(id)
          val width = Universe >> lvl
          val lo = (id - (1L << lvl)) * width
          out(i) = Node(lo, lo + width, c.counts(i))
          i += 1
        }
        out
      }
      def bufferEncoder: Encoder[Digest] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Digest]()
      def outputEncoder: Encoder[Array[Node]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Node]]()
    }
  }
}
