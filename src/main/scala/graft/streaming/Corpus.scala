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

  /** Documents sharing NO n-token shingle with `evalDocs` — the
    * decontamination KEEP-side as a stateless per-row filter. The eval
    * hash set is computed with the batch relational shape and collected
    * ONCE (it's static and benchmark-sized — MBs vs corpus TBs); each
    * incoming document is then probed by ONE fused expression
    * ([[graft.functions.ShingleContaminated]]) that builds gram bytes,
    * digests, and hash-probes with early exit — no per-row HOF lambda
    * tree, no join. Docs with fewer than `n` tokens have no shingles
    * and pass clean, matching [[Dedup.decontaminate]]. For an eval side
    * too big to ship in the plan (beyond ~10⁶ hashes), run the batch
    * semi-join inside `foreachBatch` instead. */
  def cleanAgainst(docs: DataFrame, evalDocs: DataFrame,
                   idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val evalH: Seq[Long] = Dedup.shingleRows(
        evalDocs.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(Dedup.sharedHash(col("s")).as("h")).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
    val contaminated = org.apache.spark.sql.GraftBridge.column(
      graft.functions.ShingleContaminated(
        org.apache.spark.sql.GraftBridge.expression(split(col(textCol), "\\s+")),
        n, evalH))
    docs.filter(!coalesce(contaminated, lit(false))).select(col(idCol))
  }
}
