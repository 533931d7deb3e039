package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (minhash/simhash/embedding candidates) into dedup CLUSTERS.
  * Keeping one representative per pair is wrong the moment similarity
  * is transitive (A~B, B~C: keeping min-per-pair retains B); the
  * production contract is one representative per connected component.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the min of its own
  * label and its neighbors' labels; fixpoint after O(diameter) rounds —
  * near-dup clusters are shallow (diameter ≤ a few hops), so this
  * converges in a handful of rounds, each a partial-aggregable
  * join+min on (node, label) pairs only.
  *
  * 100 TB posture: per round, the shuffle carries 2|E| (node, label)
  * longs; `localCheckpoint` truncates the iterative lineage so plans
  * don't recompile/recompute per round (swap for reliable
  * `checkpoint(dir)` on a cluster). For graphs whose diameter scales
  * (not dedup graphs), the Large-Star/Small-Star variant
  * [Kiveris et al., "Connected Components in MapReduce", SoCC'14]
  * drops rounds to O(log n) with the same join+min primitive. */
object Graph {

  /** Components of the undirected graph given by (srcCol, dstCol) pairs.
    * Returns (node, component) where component = min node id reachable.
    * Nodes appearing in no edge are absent (callers union isolated ids
    * back in if needed — dedup treats them as singleton clusters). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("component")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels + own label, min per node
      val next = und.join(labels, und("dst") === labels("node"))
        .select(und("src").as("node"), col("component"))
        .unionAll(labels)
        .groupBy(col("node")).agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("component", "old"), "node")
        .filter(col("component") =!= col("old")).isEmpty
      // drop the previous round's checkpointed blocks — otherwise the
      // loop accumulates O(rounds × |V|) stale cached copies
      labels.unpersist()
      labels = next
      iter += 1
    }
    und.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "(diameter too large — use the Large-Star/Small-Star variant)")
    labels
  }

  /** Cluster-correct dedup: from near-dup pairs over `df`, keep exactly
    * one row (the min id) per connected component, plus every row that
    * appears in no pair. The output is the deduplicated id set. */
  def keepClusterRepresentatives(df: DataFrame, idCol: String,
                                 pairs: DataFrame,
                                 srcCol: String = "id_a",
                                 dstCol: String = "id_b"): DataFrame = {
    val comps = connectedComponents(pairs, srcCol, dstCol)
    val losers = comps.filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
