package graft.operators

/** Overlap INDEPENDENT Spark actions from a small driver thread pool —
  * the spark_optimization_guide §2.6 recipe ("Overlap independent
  * jobs"): Spark's scheduler happily runs several jobs at once inside
  * one application; actions are sequential only because driver code
  * calls them sequentially. A store-lifecycle gate that writes a
  * postings store AND its doc-length sidecar (or six KN model tables)
  * pays each job's tail/stragglers back-to-back when the writes run
  * serially; submitted together, the next job's tasks back-fill cores
  * freed by the current job's tail.
  *
  * Correctness contract (the caller's): the actions must be mutually
  * independent — no two may write the same path, and an action reading
  * a path another is writing must be sequenced by the caller (group
  * dependent steps INSIDE one action). Shared lazy lineage (e.g. two
  * writes off one non-eager `localCheckpoint`) is safe: Spark's block
  * manager computes each cached partition once under a per-block lock.
  *
  * FIFO scheduling (the default) gives exactly the back-fill behaviour
  * wanted; job descriptions are thread-local, so each action may label
  * itself. Failures propagate: the first throwable is rethrown after
  * all actions settle (never swallowed, never deadlocked on a dead
  * sibling).
  */
object Par {
  def jobs(actions: (() => Unit)*): Unit = {
    if (actions.lengthCompare(1) <= 0) { actions.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(actions.size, 4))
    try {
      val futures = actions.map(a => pool.submit(new Runnable {
        def run(): Unit = a()
      }))
      var firstFailure: Option[Throwable] = None
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }
}
