package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * converges in a handful of rounds.
  *
  * Round cost: ONE Spark action per round. The propagation join carries
  * the node's previous label through the aggregation (tagged union →
  * `min(component)` + `max(own)`), so the same pass that produces the
  * new labels also counts how many changed — there is no separate
  * convergence join and no extra eager-materialization job. Each round
  * shuffles 2|E| + |V| (node, label) pairs and nothing else.
  *
  * 100 TB posture: results are persisted per round to truncate
  * recomputation; pass `checkpointDir` on a real cluster to cut lineage
  * with RELIABLE (HDFS/object-store) checkpoints instead — executor-local
  * storage (`persist`/`localCheckpoint`) loses blocks when an executor
  * dies, which aborts an iterative job mid-flight. The reliable path
  * costs one extra cache-read/write job per round, only when opted in.
  * For graphs whose diameter scales (not dedup graphs), the
  * Large-Star/Small-Star variant [Kiveris et al., "Connected Components
  * in MapReduce", SoCC'14] drops rounds to O(log n) with the same
  * join+min primitive. */
object Graph {

  /** Components of the undirected graph given by (srcCol, dstCol) pairs.
    * Returns (node, component) where component = min node id reachable.
    * Nodes appearing in no edge are absent (callers union isolated ids
    * back in if needed — dedup treats them as singleton clusters).
    *
    * @param checkpointDir reliable checkpoint location (HDFS/S3 path on a
    *   cluster); when set, per-round results and the edge list are
    *   checkpointed there instead of relying on executor-local storage. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val reliable = checkpointDir.isDefined

    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und0 = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val und = if (reliable) und0.checkpoint() else und0.localCheckpoint(true)
    // initial labels: node -> itself; materialized by round 1's action
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
    var prevHandle = labels.persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var changed = -1L
    while (changed != 0 && iter < maxIter) {
      // tagged union: neighbor label contributions carry a typed-null
      // `own`, the node's own row carries its previous label — so one
      // groupBy yields BOTH the new label (min over neighbors+self) and
      // the old one (max(own): exactly one non-null per node)
      val neigh = und.join(labels, und("dst") === labels("node"))
        .select(und("src").as("node"), col("component"),
          when(lit(false), col("component")).as("own"))
      val own = labels.select(col("node"), col("component"),
        col("component").as("own"))
      val step = neigh.unionAll(own)
        .groupBy(col("node"))
        .agg(min(col("component")).as("component"), max(col("own")).as("old"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // the ONE action of the round: populates the persisted round result
      // and returns the changed-label count (min includes the own label,
      // so component <= old always; != means strictly improved)
      val row = step.agg(
        coalesce(sum(when(col("component") =!= col("old"), 1L)), lit(0L)).as("c"))
        .first()
      changed = row.getLong(0)
      val next =
        if (reliable) { val ck = step.checkpoint(); step.unpersist(); ck }
        else step
      prevHandle.unpersist()
      prevHandle = next
      labels = next.select(col("node"), col("component"))
      iter += 1
    }
    und.unpersist()
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds " +
      "(diameter too large — use the Large-Star/Small-Star variant)")
    labels
  }

  /** Cluster-correct dedup: from near-dup pairs over `df`, keep exactly
    * one row (the min id) per connected component, plus every row that
    * appears in no pair. The output is the deduplicated id set. */
  def keepClusterRepresentatives(df: DataFrame, idCol: String,
                                 pairs: DataFrame,
                                 srcCol: String = "id_a",
                                 dstCol: String = "id_b",
                                 checkpointDir: Option[String] = None): DataFrame = {
    val comps = connectedComponents(pairs, srcCol, dstCol,
      checkpointDir = checkpointDir)
    val losers = comps.filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
