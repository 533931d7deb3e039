package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY.md §7.3 "100 TB posture"): salting
  * for hot keys when AQE's skew handling isn't enough (e.g., a single
  * key holding >1 executor's worth of rows in an aggregation, where AQE
  * skew-join splitting doesn't apply).
  *
  * `saltedAgg` runs sum/count-style aggregations in two phases: a
  * partial aggregate over (key, salt) — spreading each hot key over
  * `buckets` reducers — then the final merge over key. Correct for any
  * commutative re-aggregable pair (sum/sum, count/sum, min/min,
  * max/max). */
object Skew {

  /** Deterministic salt column in [0, buckets). Uses a hash of random
    * per-row columns when provided, else a uniform random salt
    * (nondeterministic but aggregation-safe). */
  def salt(buckets: Int, by: Seq[Column] = Seq.empty): Column =
    if (by.isEmpty) (rand() * buckets).cast("int")
    else pmod(hash(by: _*), lit(buckets))

  /** Two-phase salted aggregation: `partial` aggregates run per
    * (keys..., salt); `merge` re-aggregates per keys. Example:
    * {{{
    * Skew.saltedAgg(df, Seq(col("k")), 16,
    *   partial = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
    *   merge   = Seq(sum(col("s")).as("total"), sum(col("c")).as("n")))
    * }}} */
  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
                partial: Seq[Column], merge: Seq[Column],
                saltBy: Seq[Column] = Seq.empty): DataFrame = {
    val salted = df.withColumn("__salt", salt(buckets, saltBy))
    val phase1 = salted.groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys: _*).agg(merge.head, merge.tail: _*)
  }

  /** Broadcast-salt pattern for a skewed equi-join: explode the SMALL
    * side `buckets` times with every salt value, salt the big side's key
    * randomly — each hot key's rows spread across `buckets` tasks. Use
    * when AQE skew-join splitting can't kick in (e.g., non-shuffle
    * stages feeding the join). */
  def saltedJoinKeys(big: DataFrame, small: DataFrame, keyCol: String,
                     buckets: Int): (DataFrame, DataFrame) = {
    val bigSalted = big.withColumn("__salt", (rand() * buckets).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    (bigSalted, smallExploded)
  }
}
