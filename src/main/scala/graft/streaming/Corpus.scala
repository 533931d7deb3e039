package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Streaming corpus preparation (SURVEY §2.8 × §2.10): incremental
  * document ingestion with benchmark decontamination against a STATIC
  * eval set — the shape a production pipeline runs when new crawl
  * shards arrive continuously but the eval benchmarks are fixed.
  *
  * The key design point is STATELESSNESS: the batch operator
  * ([[Dedup.decontaminate]]) explodes shingles and re-aggregates per
  * document, which on a stream would demand keyed state; here each
  * document is one row whose shingles are one ARRAY column, and
  * contamination is a stream-static LEFT ANTI join against the
  * broadcast eval hash set — no watermark, no state store, identical
  * code path in batch (the oracle gate) and streaming (StreamingSpec
  * parity). */
object Corpus {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based streaming read of the documents table. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(schema)
      // the file-stream source wants a directory; documents.parquet is
      // a single file inside the sf dir, so glob-filter to it
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Per-row hashed n-token shingles as one array column (no explode,
    * no aggregate — the stream-safe shape). Engine-reproducible via
    * [[Dedup.sharedHash]], like the batch pipeline. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(Dedup.shinglesOfTokens(split(text, "\\s+"), n),
      s => Dedup.sharedHash(s))

  /** Documents sharing NO n-token shingle with `evalDocs` — the
    * decontamination KEEP-side as a stateless stream-static anti-join.
    * The eval hash set is computed with the batch relational shape
    * (it's static and small — benchmark MBs vs corpus TBs) and
    * broadcast; docs with fewer than `n` tokens have no shingles and
    * pass clean, matching [[Dedup.decontaminate]].
    *
    * COST MODEL (deliberate): set membership is not an equi-key, so
    * this plans a broadcast nested-loop anti-join — per kept document
    * one pass over the eval hash array (contaminated docs early-exit).
    * That is the right trade while the eval set is benchmark-sized
    * (10⁴–10⁶ hashes); for an eval side too big to probe per row, run
    * the batch [[Dedup.decontaminate]] (explode + broadcast hash
    * semi-join) inside `foreachBatch` instead — same results, one
    * micro-batch of state at a time. */
  def cleanAgainst(docs: DataFrame, evalDocs: DataFrame,
                   idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val evalH = Dedup.shingleRows(
        evalDocs.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(Dedup.sharedHash(col("s")).as("h")).distinct()
    docs.select(col(idCol), shingleHashes(col(textCol), n).as("__sh"))
      .join(broadcast(evalH), array_contains(col("__sh"), col("h")), "left_anti")
      .select(col(idCol))
  }
}
