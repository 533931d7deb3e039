package graft

import org.apache.spark.sql.SparkSession

/** The measurement-hygiene helper shared by [[Bench]] and
  * [[ProfileQuery]] (extracted per ADVICE r14 — one definition, not two
  * drifting copies): every `Reuse.Local`/`localCheckpoint` a query
  * materializes leaves persisted blocks behind after its action
  * finishes; across a 486-key sweep they pile up in the block store and
  * keys late in the alphabet run under eviction + GC churn caused by
  * FINISHED keys' garbage, not their own computation (measured round
  * 14: j7_range 10.5 s at sweep position ~250 vs 0.68 s isolated — a
  * 10× position artifact). Guide §1 says time THE computation: drop
  * dead blocks BEFORE each timed run, outside the clock. Nothing is
  * pre-computed or reused across runs — the opposite: every run starts
  * from parquet inputs and an empty block store. NOTE this makes every
  * repetition of a key COLD (the round-14 protocol change recorded in
  * BASELINE.md): cross-round comparisons must use baselines re-measured
  * under this protocol (r14+ records are).
  *
  * `blocking = true`: removal completes BEFORE the caller's clock
  * starts, so the async block-removal work can never race the timed
  * run it precedes. */
object BlockHygiene {
  def dropDeadBlocks(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
}
