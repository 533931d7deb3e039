package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Connected-components contract: correctness, the one-action-per-round
  * cost model (VERDICT r2 "What's wrong" #1), and the reliable
  * checkpoint path for cluster runs. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pathGraph = {
    import spark.implicits._
    // path 1-2-3-4 (diameter 3 -> exactly 4 propagation rounds to
    // fixpoint) plus a separate pair
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
  }

  private val expected =
    Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)

  test("one Spark action per propagation round (fused convergence check)") {
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        events.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        events.add(funcName)
    }
    spark.listenerManager.register(listener)
    try {
      val comps = Graph.connectedComponents(pathGraph, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comps == expected)
      // the execution listener is async — poll until the count stabilizes
      var prev = -1; var cur = events.size; var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur; Thread.sleep(100); cur = events.size; spins += 1
      }
      val byName = scala.jdk.CollectionConverters.IteratorHasAsScala(
        events.iterator).asScala.toSeq.groupBy(identity).view.mapValues(_.size).toMap
      // the 4-round path graph must run EXACTLY one fused
      // propagate-and-count action per round (agg.first)...
      assert(byName.getOrElse("head", 0) == 4,
        s"expected 4 per-round actions (one first()/head per round), saw $byName")
      // ...and NO separate convergence pass (the pre-fix shape ran an
      // isEmpty join and an eager checkpoint job per round)
      assert(byName.getOrElse("isEmpty", 0) == 0 && byName.getOrElse("count", 0) == 0,
        s"separate convergence action detected: $byName")
      // non-eager checkpoint marks are job-less plan-truncation events:
      // 4 rounds + 1 eager edge-list materialization
      assert(byName.getOrElse("localCheckpoint", 0) <= 5, s"extra checkpoints: $byName")
    } finally spark.listenerManager.unregister(listener)
  }

  test("reliable checkpointDir path produces identical components and writes files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ck").toFile
    try {
      val comps = Graph.connectedComponents(pathGraph, "id_a", "id_b",
        checkpointDir = Some(dir.getAbsolutePath))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comps == expected)
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(dir).nonEmpty, "no reliable checkpoint files were written")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("keepClusterRepresentatives keeps singletons and one id per component") {
    import spark.implicits._
    val rows = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    val kept = Graph.keepClusterRepresentatives(rows, "id", pathGraph)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L))
  }

  test("star CC handles a diameter-199 path that exceeds propagation's round budget") {
    import spark.implicits._
    val path = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // min-label propagation needs O(diameter) rounds — must refuse, not spin
    intercept[IllegalArgumentException] {
      Graph.connectedComponents(path, "id_a", "id_b", maxIter = 5)
    }
    // Large-Star/Small-Star converges in O(log n) alternations
    val comps = Graph.connectedComponentsStar(path, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length == 200 && comps.forall(_._2 == 1L))
  }

  test("star CC and propagation CC agree on a seeded random graph (self-loops kept)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // keep self-loops: both variants must emit self-loop-only nodes as
    // singletons (contract parity)
    val edges = (Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      :+ (999L, 999L))
      .toDF("id_a", "id_b")
    val prop = Graph.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Graph.connectedComponentsStar(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("star CC short-circuits a self-loop-only graph (zero star rounds)") {
    import spark.implicits._
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        events.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        events.add(funcName)
    }
    spark.listenerManager.register(listener)
    try {
      val out = Graph.connectedComponentsStar(
          Seq((7L, 7L), (9L, 9L)).toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(7L -> 7L, 9L -> 9L))
      var prev = -1; var cur = events.size; var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur; Thread.sleep(100); cur = events.size; spins += 1
      }
      val heads = scala.jdk.CollectionConverters.IteratorHasAsScala(
        events.iterator).asScala.count(_ == "head")
      // the initial fingerprint excludes self-loops, so no star rounds
      // ran: one edge-set materialization + one final-labels
      // materialization (the round-4 action that lets eMat release)
      assert(heads == 2, s"self-loop-only graph ran star rounds: $heads head actions")
    } finally spark.listenerManager.unregister(listener)
  }

  test("reliable star CC releases its transient caches after checkpointing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-star-ck").toFile
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val comps = Graph.connectedComponentsStar(pathGraph, "id_a", "id_b",
        checkpointDir = Some(dir.getAbsolutePath))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comps == expected)
      // checkpoint-file-backed frames need no cache: every persist made on
      // the reliable path must be released once its checkpoint is written
      // (unpersist is async — poll)
      var spins = 0
      def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      while (leaked.nonEmpty && spins < 50) { Thread.sleep(100); spins += 1 }
      assert(leaked.isEmpty, s"reliable star CC leaked cached RDDs: $leaked")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("keepClusterRepresentatives survives a diameter-199 graph via auto-fallback") {
    import spark.implicits._
    val path = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val rows = ((1L to 200L) :+ 999L).toDF("id")
    // maxIter 5 makes propagation refuse; auto must fall back to star
    // and still dedup the whole chain to its min id (singleton kept)
    val kept = Graph.keepClusterRepresentatives(rows, "id", path, maxIter = 5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 999L))
    // pinned variants: star succeeds outright, propagation refuses
    val keptStar = Graph.keepClusterRepresentatives(rows, "id", path, algo = "star")
      .collect().map(_.getLong(0)).toSet
    assert(keptStar == Set(1L, 999L))
    intercept[IllegalArgumentException] {
      Graph.keepClusterRepresentatives(rows, "id", path,
        algo = "propagation", maxIter = 5).collect()
    }
    intercept[IllegalArgumentException] {
      Graph.keepClusterRepresentatives(rows, "id", path, algo = "bogus")
    }
  }

  test("star CC releases the edge-set cache once labels are materialized") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val comps = Graph.connectedComponentsStar(pathGraph, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == expected)
    // eMat and per-round handles must be gone; only the final labels
    // frame may remain cached (ContextCleaner reclaims it on GC).
    // unpersist is async — poll
    var spins = 0
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.size > 1 && spins < 50) { Thread.sleep(100); spins += 1 }
    val detail = (spark.sparkContext.getPersistentRDDs -- before)
      .map { case (id, r) => s"$id=${r.name}:${r.toDebugString.linesIterator.next()}" }
    assert(leaked.size <= 1, s"star CC retained edge caches: $detail")
  }

  test("keepBestRepresentatives picks max score, id tie-break, keeps singletons") {
    import spark.implicits._
    // component {1,2,3,4}: best score is 2 (0.9); pair {10,11}: tied
    // scores -> lowest id 10; 99 is a singleton
    val rows = Seq((1L, 0.5), (2L, 0.9), (3L, 0.7), (4L, 0.9 - 1e-9),
      (10L, 0.4), (11L, 0.4), (99L, 0.1)).toDF("id", "score")
    val kept = Graph.keepBestRepresentatives(rows, "id", "score", pathGraph)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L, 99L))
  }

  test("empty edge list converges immediately with no components") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Graph.connectedComponents(empty, "id_a", "id_b").count() == 0)
  }
}
