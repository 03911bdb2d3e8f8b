package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a typed, MERGEABLE custom
  * aggregate — the "which keys are heavy" complement to the engine's
  * count-min sketch (`q_cms_heavy_hitters` estimates counts for keys
  * you already know; MG *finds* the frequent keys in one pass with a
  * hard memory bound). This is the summary a 100 TB profiler keeps per
  * partition and merges up the tree: capacity `m` counters, never
  * more, whatever the key cardinality.
  *
  * Algorithm (Misra & Gries 1982; merge per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): maintain ≤ m counters; an
  * incoming key increments its counter, claims a free slot, or — when
  * all m slots are full — decrements EVERY counter by 1 (dropping
  * zeros), charging one occurrence of each tracked key to pay for the
  * untracked one. Merge sums counters keywise, then subtracts the
  * (m+1)-th largest combined count from every counter and drops
  * non-positives — the paper's proof gives the summed error bound.
  *
  * Guarantees (spec-pinned, `MisraGriesSpec`):
  *  - underestimate only: ĉ(k) ≤ c(k);
  *  - bounded error: c(k) − ĉ(k) ≤ (N − M)/(m+1) where N is the total
  *    stream weight and M the summary's retained weight — so any key
  *    with c(k) > (N − M)/(m+1) is guaranteed retained;
  *  - EXACT when distinct keys ≤ m (neither decrement nor merge-cut
  *    ever fires): ĉ(k) = c(k) for every key. The catalog query runs
  *    in this regime at the oracle SF (capacity above the key domain),
  *    which is what makes it hash-checkable; the approximate regime is
  *    spec-tested on skewed synthetic streams, where exact counter
  *    values are merge-order-dependent but the guarantees above hold
  *    under EVERY order (asserted across partitionings).
  *
  * Engine mechanics: Spark wraps an `Aggregator` as a
  * `TypedImperativeAggregate` (ScalaAggregator), so the buffer lives
  * as a JVM object across a partition's rows and is encoded (product
  * encoder over parallel arrays — no kryo) only at
  * partial-output/shuffle boundaries. The hot path (a tracked key)
  * probes a TRANSIENT key→slot hash index carried on the buffer
  * object (a class-body field the product encoder never sees — a
  * decoded or compacted buffer starts index-less and rebuilds it
  * lazily in one O(m) pass) and increments its counter IN PLACE:
  * O(1) per row, not O(m). The miss-on-full global decrement still
  * reallocates O(m), but it is amortized O(1) per input row — each
  * decrement event does O(m) work while consuming m units of counted
  * mass, and total counted mass never exceeds the stream length, so
  * decrement events number ≤ N/m across any stream.
  */
object MisraGries {

  /** Summary buffer: parallel key/count arrays (product-encodable). */
  final case class Summary(keys: Array[String], counts: Array[Long]) {
    /** Transient key→slot index: a class-body field, so the product
      * encoder neither serializes nor restores it — a buffer decoded
      * at a shuffle boundary (or rebuilt by a compaction) arrives
      * index-less and [[MisraGries.slotIndex]] rebuilds it lazily.
      * HashMap (not an open-coded probe table) because keys are
      * Strings and null is a legal tracked key.
      */
    @transient private[functions] var idx: java.util.HashMap[String, Integer] = _
  }

  /** One (key, retained-count) row of the final summary. */
  final case class Entry(key: String, min_count: Long)

  /** Lazily (re)build the summary's transient slot index — one O(m)
    * pass after a decode/compaction, then O(1) probes per row.
    */
  private def slotIndex(s: Summary): java.util.HashMap[String, Integer] = {
    var m = s.idx
    if (m == null) {
      m = new java.util.HashMap[String, Integer](s.keys.length * 2 + 8)
      var i = 0
      while (i < s.keys.length) { m.put(s.keys(i), i); i += 1 }
      s.idx = m
    }
    m
  }

  /** Subtract `cut` from every counter, dropping non-positive slots. */
  private def subtractCompact(s: Summary, cut: Long): Summary = {
    var keep = 0
    var i = 0
    while (i < s.counts.length) {
      if (s.counts(i) > cut) keep += 1
      i += 1
    }
    val ks = new Array[String](keep)
    val cs = new Array[Long](keep)
    var j = 0
    i = 0
    while (i < s.counts.length) {
      if (s.counts(i) > cut) { ks(j) = s.keys(i); cs(j) = s.counts(i) - cut; j += 1 }
      i += 1
    }
    Summary(ks, cs)
  }

  /** One MG update step under capacity `m`. The tracked-key hot path
    * increments IN PLACE and returns the same buffer; slot claims and
    * the global decrement return a fresh one — shared verbatim by the
    * batch [[aggregator]] and the streaming
    * [[graft.operators.MgStream.TopTalkersProcessor]] state, so the
    * two deployments cannot drift.
    */
  private[graft] def update(b: Summary, key: String, m: Int): Summary = {
    val map = slotIndex(b)
    val i = map.get(key)
    if (i != null) { b.counts(i.intValue) += 1L; b }
    else if (b.keys.length < m) {
      // slot claim: existing positions are unchanged in the new
      // arrays, so the index carries over with one put. The map is
      // STOLEN from `b` (whose idx is nulled below): the new entry is
      // out of bounds for b's arrays, and although every current call
      // site replaces `b` with the result, a future probe of a stale
      // `b` must rebuild its own index rather than hit the stolen one.
      val ns = Summary(b.keys :+ key, b.counts :+ 1L)
      map.put(key, b.keys.length)
      b.idx = null
      ns.idx = map
      ns
    } else subtractCompact(b, 1L) // classic global decrement pays for `key`
  }

  /** [[update]] plus a flag reporting whether THIS step took the
    * global-decrement branch (key absent, no free slot). Callers that
    * need "did this summary ever hit capacity" must track the flag
    * per step: the final summary's SIZE cannot tell — subtractCompact
    * drops zero-count keys, so a summary that degraded usually closes
    * under capacity, while a summary with exactly m distinct keys and
    * no eviction sits at capacity while still exact (r16 ADVICE).
    */
  private[graft] def updateTracked(b: Summary, key: String, m: Int): (Summary, Boolean) = {
    val hit = b.keys.length >= m && slotIndex(b).get(key) == null
    (update(b, key, m), hit)
  }

  /** PODS-2012 merge: keywise counter sums, then subtract the
    * (m+1)-th largest combined count and drop non-positives.
    */
  private[graft] def mergeSummaries(a: Summary, b: Summary, m: Int): Summary = {
    if (a.keys.isEmpty) return b
    if (b.keys.isEmpty) return a
    val amap = slotIndex(a)
    var extra = 0
    var i = 0
    while (i < b.keys.length) {
      if (!amap.containsKey(b.keys(i))) extra += 1
      i += 1
    }
    val ks = new Array[String](a.keys.length + extra)
    val cs = new Array[Long](a.keys.length + extra)
    System.arraycopy(a.keys, 0, ks, 0, a.keys.length)
    System.arraycopy(a.counts, 0, cs, 0, a.counts.length)
    var j = a.keys.length
    i = 0
    while (i < b.keys.length) {
      val at = amap.get(b.keys(i))
      if (at != null) cs(at.intValue) += b.counts(i)
      else { ks(j) = b.keys(i); cs(j) = b.counts(i); j += 1 }
      i += 1
    }
    val merged = Summary(ks, cs)
    if (ks.length <= m) merged
    else {
      // subtract the (m+1)-th largest combined count
      val cut = cs.clone().sorted(Ordering[Long].reverse).apply(m)
      subtractCompact(merged, cut)
    }
  }

  def aggregator(m: Int): Aggregator[String, Summary, Array[Entry]] = {
    require(m >= 1, s"capacity must be >= 1: $m")
    new Aggregator[String, Summary, Array[Entry]] {

      def zero: Summary = Summary(Array.empty, Array.empty)

      def reduce(b: Summary, key: String): Summary =
        MisraGries.update(b, key, m)

      def merge(a: Summary, b: Summary): Summary =
        MisraGries.mergeSummaries(a, b, m)

      def finish(r: Summary): Array[Entry] =
        r.keys.zip(r.counts).map { case (k, c) => Entry(k, c) }
          // null keys are tracked like any other (a null-keyed input
          // group is data, not an error — the '' bucket convention);
          // the sort must therefore be null-safe: non-null first on
          // count ties, Ordering[String] alone would NPE
          .sortBy(e => (-e.min_count, e.key == null,
            Option(e.key).getOrElse("")))

      def bufferEncoder: Encoder[Summary] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Summary]()
      def outputEncoder: Encoder[Array[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Entry]]()
    }
  }
}
