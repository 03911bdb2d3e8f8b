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
}
