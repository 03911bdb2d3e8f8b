package graft.ml

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.tree.{ContinuousSplit, GraftTreeBridge, InternalNode, LeafNode, Node}

/** Compiles a trained random-forest classifier into portable ANSI SQL
  * that reproduces MLlib's prediction bit-for-bit — giving RF scoring a
  * real cross-engine oracle (DuckDB) instead of a rows-only check.
  *
  * Faithfulness to RandomForestClassificationModel.predictRaw /
  * raw2probability / probability2prediction:
  *  - each tree routes a row to a leaf via `feature <= threshold` goes
  *    left (ContinuousSplit.shouldGoLeft);
  *  - the leaf contributes `classCounts(c) / classCounts.sum` to class
  *    c's vote — that division is performed HERE, at compile time, on
  *    the identical doubles MLlib divides at runtime, and the result is
  *    embedded as a round-trip literal;
  *  - votes are summed left-to-right in tree order (IEEE addition order
  *    matches MLlib's foreach accumulation, 0.0 + t1 + t2 + …);
  *  - prediction = argmax of the NORMALIZED votes, first index winning
  *    ties: `1.0` iff v1/(v0+v1) > v0/(v0+v1), exactly the divisions
  *    MLlib performs (normalization can round two near-equal votes into
  *    equality, so comparing raw v1 > v0 would be subtly wrong).
  *
  * Every literal is rendered with an exponent suffix so BOTH engines
  * type it DOUBLE (plain `0.5` is DECIMAL in DuckDB and Spark SQL
  * alike, which would silently switch the arithmetic to exact decimal).
  *
  * Scale note: the compiled form is also how you'd score at 100 TB
  * without shipping MLlib to every reader — a depth-6 forest becomes a
  * pure codegen-able projection, no vector assembly, no UDF boundary.
  */
object TreeSql {

  /** Round-trip double literal, typed DOUBLE in Spark SQL and DuckDB. */
  def dlit(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite literal: $d")
    val s = java.lang.Double.toString(d)
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  private def leafVote(n: Node, cls: Int): Double = {
    val counts = GraftTreeBridge.classCounts(n)
    counts(cls) / counts.sum
  }

  /** One tree's vote for `cls` as a nested CASE ladder. */
  def nodeSql(n: Node, cls: Int, feat: Int => String): String = n match {
    case l: LeafNode => dlit(leafVote(l, cls))
    case i: InternalNode =>
      i.split match {
        case c: ContinuousSplit =>
          s"(CASE WHEN ${feat(c.featureIndex)} <= ${dlit(c.threshold)} " +
            s"THEN ${nodeSql(i.leftChild, cls, feat)} ELSE ${nodeSql(i.rightChild, cls, feat)} END)"
        case other =>
          // the reference model is trained on all-continuous features
          // (train_rf.py:52-62; no categorical indexing stage)
          sys.error(s"unsupported split type for SQL compilation: $other")
      }
  }

  /** Σ over trees of the per-leaf class-`cls` vote, in tree order. */
  def votesSql(rf: RandomForestClassificationModel, cls: Int, feat: Int => String): String =
    rf.trees.map(t => nodeSql(t.rootNode, cls, feat)).mkString("(", " + ", ")")

  /** argmax(normalized votes) condition for class 1 (binary forest). */
  def predCondition(v0: String = "v0", v1: String = "v1"): String =
    s"$v1 / ($v0 + $v1) > $v0 / ($v0 + $v1)"

  /** prediction expression over vote columns v0/v1 (binary forest). */
  def predictionSql(v0: String = "v0", v1: String = "v1"): String =
    s"CASE WHEN ${predCondition(v0, v1)} THEN 1.0e0 ELSE 0.0e0 END"
}
