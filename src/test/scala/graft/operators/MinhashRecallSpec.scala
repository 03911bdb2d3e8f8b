package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Statistical behavior of the Carter-Wegman min-wise family on
  * corpora the driver tables don't cover: high-similarity recall, and
  * the documented BandCap trade-off under an adversarial mega-duplicate
  * cluster (skewed shingle frequencies). Deterministic: the 16 (a,b)
  * constants are fixed, so these are exact regression pins, not flaky
  * statistical tests.
  */
class MinhashRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 100-word doc from a doc-unique vocabulary. */
  private def words(i: Int, n: Int = 100): IndexedSeq[String] =
    (0 until n).map(j => s"d${i}w$j")

  test("recall >= 0.9 on J≈0.9 near-dup pairs (4 bands x 4 rows, independent hashes)") {
    import spark.implicits._
    // 50 originals + one near-dup each (1 of 100 words replaced):
    // shared 5-gram shingles 91, union 101 -> J = 91/101 ≈ 0.90;
    // P(candidate) = 1-(1-J^4)^4 ≈ 0.986 per pair under independence.
    val docs = (0 until 50).flatMap { i =>
      val base = words(i)
      val dup = base.updated(50, s"d${i}CHANGED")
      Seq((i.toLong, base.mkString(" ")), (i + 100000L, dup.mkString(" ")))
    }.toDF("doc_id", "text")
    val pairs = Dedup.minhashOn(spark, "recall-hi", docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = (0 until 50).map(i => (i.toLong, i + 100000L)).toSet
    val recall = truePairs.count(pairs.contains).toDouble / truePairs.size
    assert(pairs.subsetOf(truePairs), s"false positives: ${pairs -- truePairs}")
    assert(recall >= 0.9, s"recall $recall")
  }

  test("adversarial mega-cluster is frequency-capped; unrelated near-dups still found") {
    import spark.implicits._
    // 200 byte-identical docs: every signature identical -> one band
    // value shared by 200 docs > BandCap=50 -> dropped BEFORE the
    // self-join. The 199·200/2 quadratic pair blow-up never reaches the
    // candidate stage; identical-text clusters are exact-dedup's job
    // (q_dedup_exact groups on the text hash) — the trade documented on
    // BandCap.
    val mega = (1 to 200).map(i => (i.toLong, (0 until 30).map(j => s"common$j").mkString(" ")))
    // plus 5 near-dup pairs from disjoint vocab that must still surface
    val clean = (0 until 5).flatMap { i =>
      val base = words(1000 + i)
      Seq((10000 + i.toLong, base.mkString(" ")),
        (20000 + i.toLong, base.updated(3, "swapped").mkString(" ")))
    }
    val docs = (mega ++ clean).toDF("doc_id", "text")
    val pairs = Dedup.minhashOn(spark, "recall-skew", docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val megaPairs = pairs.filter { case (a, b) => a <= 200 && b <= 200 }
    assert(megaPairs.isEmpty, s"capped cluster leaked ${megaPairs.size} pairs")
    val cleanPairs = (0 until 5).map(i => (10000 + i.toLong, 20000 + i.toLong)).toSet
    val found = cleanPairs.count(pairs.contains)
    assert(found >= 4, s"only $found/5 clean near-dups found alongside the hot cluster")
    // and exact dedup semantics catch what the cap dropped
    val copies = docs.groupBy("text").count().filter("count > 1").collect()
    assert(copies.length == 1 && copies.head.getLong(1) == 200L)
  }

  test("simhash64 recall LAW: every pair at hamming <= 3 is a banded candidate (pigeonhole)") {
    import spark.implicits._
    // Word-overlap docs drive fingerprints toward small hamming
    // distances: 60 docs in 20 families of 3, each family sharing 95 of
    // 100 words. The law is checked against ground truth computed from
    // the fingerprints themselves (brute-force all-pairs hamming), so
    // it holds for WHATEVER distances the corpus realises — no
    // distributional assumption, pure pigeonhole: <= 3 differing bits
    // cannot touch all 4 of the 16-bit bands.
    val docs = (0 until 20).flatMap { f =>
      val base = words(f)
      (0 until 3).map { v =>
        val t = (0 until 5).foldLeft(base)((w, k) => w.updated(19 * k + v, s"f${f}v${v}k$k"))
        ((f * 3 + v).toLong, t.mkString(" "))
      }
    }.toDF("doc_id", "text")
    val fps = Dedup.simhash64FingerprintsOn(spark, "sim64-law", docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = (for {
      (a, la, ha) <- fps; (b, lb, hb) <- fps if a < b
      h = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
      if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(truth.nonEmpty, "corpus produced no hamming<=3 pairs - law not exercised")
    val got = Dedup.simhash64On(spark, "sim64-law", docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth,
      s"banded candidates must EQUAL brute-force hamming<=3 pairs; missing=${truth -- got} extra=${got -- truth}")
    // contrast: the 32-bit 2-band query CAN miss h<=2 pairs (documented
    // gap) - the 64-bit 4-band spelling is the guaranteed one.
  }
}
