package org.apache.spark.ml.tree

/** Leaf-statistics access for tree-model compilation.
  *
  * `Node.impurityStats` is `private[ml]` (the class behind it,
  * `ImpurityCalculator`, is `private[spark]`), but MLlib's prediction
  * semantics depend on the per-leaf class counts it holds:
  * RandomForestClassificationModel.predictRaw sums
  * `classCounts(i) / classCounts.sum` over trees. Compiling a forest to
  * SQL (graft.ml.TreeSql) has to reproduce exactly those per-leaf
  * probabilities, so this one-file residency in the tree package exposes
  * the counts as a plain Array[Double] — the same pattern as
  * org.apache.spark.sql.GraftColumnBridge.
  */
object GraftTreeBridge {
  /** Per-class instance counts recorded at `node` during training. */
  def classCounts(node: Node): Array[Double] = node.impurityStats.stats.clone()
}
