package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Events

/** Structured Streaming behavior (SURVEY.md §2.8): stream/batch parity
  * over the same files, watermark late-data semantics, custom keyed
  * state. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tumbling window: stream over files == batch over same files") {
    val batch = Events.tumbling(Tables.load(spark, TestSpark.sf, "events"))
      .collect().map(_.toSeq).toSet
    val stream = Events.readStream(spark, TestSpark.sf)
    Events.runToMemory(spark, Events.tumbling(stream), "t_tumbling")
    val streamed = spark.table("t_tumbling").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("session windows: stream == batch") {
    val batch = Events.sessions(Tables.load(spark, TestSpark.sf, "events"))
      .collect().map(_.toSeq).toSet
    val stream = Events.readStream(spark, TestSpark.sf)
    Events.runToMemory(spark, Events.sessions(stream), "t_sessions")
    val streamed = spark.table("t_sessions").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-static enrich: stream over files == batch, no state store") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val dim = Events.userDim(ev) // static side, precomputed in batch
    val batch = Events.enrich(ev, dim).collect().map(_.toSeq).toSet
    val stream = Events.readStream(spark, TestSpark.sf)
    Events.runToMemory(spark, Events.enrich(stream, dim), "t_enrich",
      OutputMode.Append())
    val streamed = spark.table("t_enrich").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming admission path: quality -> decontaminate -> probe == batch") {
    import org.apache.spark.sql.functions._
    // the full continuous-ingestion admission pipeline composed on one
    // stream — every stage stateless/stream-static; parity against the
    // st_admission batch gate's stages run on the same input
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ev = docs.filter(col("doc_id") > mx - 100)
    val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text")
    def pipeline(in: org.apache.spark.sql.DataFrame) = {
      val q = in.filter(graft.operators.TextAnalysis.gopherKeep(col("text"),
        minTokens = 10, maxTokens = 100000, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minStopwordHits = 1))
      val clean = graft.streaming.Corpus.cleanAgainst(q, ev, "doc_id", "text")
      graft.streaming.Corpus.admitProbe(clean, idx, "doc_id", "text")
    }
    // batch ground truth over a clone slice (every clone is a near-dup
    // of its original, so the probe must reject all survivors)
    val incoming = docs.filter(col("doc_id") > mx - 200)
      .select((col("doc_id") + 3000000).as("doc_id"), col("text"))
    val batchHits = pipeline(incoming)
      .select(col("id_new"), col("id_corpus")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the same docs arrive as a STREAM (re-id applied on the stream)
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
      .filter(col("doc_id") > mx - 200)
      .select((col("doc_id") + 3000000).as("doc_id"), col("text"))
    Events.runToMemory(spark, pipeline(stream), "t_admit", OutputMode.Append())
    val streamedHits = spark.table("t_admit")
      .select(col("id_new"), col("id_corpus")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedHits == batchHits && batchHits.nonEmpty)
  }

  test("streaming admission from STORED indexes: restart path == recompute path == stream") {
    import org.apache.spark.sql.functions._
    // production-restart attestation: both stores written once, read
    // back, and the stream resumes admission with zero eval/corpus
    // recomputation — keep set identical to the recompute pipeline
    val out = "target/test_sink/admission_stores"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ev = docs.filter(col("doc_id") > mx - 100)
    val dcIdx = graft.operators.Dedup.decontamIndex(ev, "doc_id", "text",
      n = 13, expectedItems = 1L << 16, numBits = 1L << 20)
    dcIdx.sketch.write.mode("overwrite").parquet(s"$out/dc_sketch")
    dcIdx.hashes.write.mode("overwrite").parquet(s"$out/dc_hashes")
    val mhIdx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text")
    mhIdx.bands.write.mode("overwrite").parquet(s"$out/mh_bands")
    mhIdx.sets.write.mode("overwrite").parquet(s"$out/mh_sets")
    val dcStored = graft.operators.Dedup.DecontamIndex(
      spark.read.parquet(s"$out/dc_sketch"), spark.read.parquet(s"$out/dc_hashes"))
    val mhStored = graft.operators.Dedup.MinhashIndex(
      spark.read.parquet(s"$out/mh_bands"), spark.read.parquet(s"$out/mh_sets"))
    def stored(in: org.apache.spark.sql.DataFrame) = {
      val q = in.filter(graft.operators.TextAnalysis.gopherKeep(col("text"),
        minTokens = 10, maxTokens = 100000, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minStopwordHits = 1))
      graft.streaming.Corpus.admitProbe(
        graft.streaming.Corpus.cleanAgainstStored(q, dcStored, "doc_id", "text"),
        mhStored, "doc_id", "text")
    }
    val incoming = docs.filter(col("doc_id") > mx - 200)
      .select((col("doc_id") + 3000000).as("doc_id"), col("text"))
    val batchStored = stored(incoming)
      .select(col("id_new"), col("id_corpus")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the recompute pipeline (cleanAgainst + in-memory index) agrees
    val recompute = {
      val q = incoming.filter(graft.operators.TextAnalysis.gopherKeep(col("text"),
        minTokens = 10, maxTokens = 100000, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minStopwordHits = 1))
      graft.streaming.Corpus.admitProbe(
        graft.streaming.Corpus.cleanAgainst(q, ev, "doc_id", "text"),
        mhIdx, "doc_id", "text")
        .select(col("id_new"), col("id_corpus")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(batchStored == recompute && batchStored.nonEmpty)
    // and the same stored pipeline runs stream-side unchanged
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
      .filter(col("doc_id") > mx - 200)
      .select((col("doc_id") + 3000000).as("doc_id"), col("text"))
    Events.runToMemory(spark, stored(stream), "t_admit_stored", OutputMode.Append())
    val streamedHits = spark.table("t_admit_stored")
      .select(col("id_new"), col("id_corpus")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedHits == batchStored)
    // a truncated stored hash frame refuses at composition time, before
    // any stream starts
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Corpus.cleanAgainstStored(incoming,
        graft.operators.Dedup.DecontamIndex(
          dcStored.sketch, dcStored.hashes.limit(3)), "doc_id", "text")
    }
    assert(e.getMessage.contains("drift"))
  }

  test("admit→append loop: foreachBatch maintains the stores; clones of admits bounce; final store == batch build") {
    import spark.implicits._
    import graft.operators.{Dedup, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val out = "target/test_sink/admit_append"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ev = docs.filter(col("doc_id") > mx - 100)
    // corpus-build time: fingerprint store + minhash index on disk
    docs.select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
      .write.mode("overwrite").parquet(s"$out/fp")
    val mh = Dedup.minhashIndex(docs, "doc_id", "text")
    mh.bands.write.mode("overwrite").parquet(s"$out/mh/bands")
    mh.sets.write.mode("overwrite").parquet(s"$out/mh/sets")
    def admitOne(batch: org.apache.spark.sql.DataFrame) = {
      val q = batch.filter(TextAnalysis.gopherKeep(col("text"),
        minTokens = 10, maxTokens = 100000, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minStopwordHits = 1))
      val clean = graft.streaming.Corpus.cleanAgainst(q, ev, "doc_id", "text")
      val fresh = clean.join(spark.read.parquet(s"$out/fp"),
          TextAnalysis.fingerprint(col("text")) === col("fp"), "left_anti")
        .select(col("doc_id"), col("text"))
      val hits = graft.streaming.Corpus.admitProbe(fresh,
          Dedup.MinhashIndex(spark.read.parquet(s"$out/mh/bands"),
            spark.read.parquet(s"$out/mh/sets")), "doc_id", "text")
        .select(col("id_new").as("doc_id")).distinct()
      fresh.join(hits, Seq("doc_id"), "left_anti")
    }
    // the production sink: admit the micro-batch, then APPEND the
    // admitted docs' fingerprints and band/sketch delta to the stores
    val admittedIds = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialize the admission BEFORE the appends mutate the
        // stores the probe plans read (collect: micro-batch-sized)
        val adm = admitOne(batch).collect().map(r => (r.getLong(0), r.getString(1)))
        admittedIds ++= adm
        if (adm.nonEmpty) {
          val admDf = adm.toSeq.toDF("doc_id", "text")
          admDf.select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
            .write.mode("append").parquet(s"$out/fp")
          val delta = Dedup.minhashIndex(admDf, "doc_id", "text")
          delta.bands.write.mode("append").parquet(s"$out/mh/bands")
          delta.sets.write.mode("append").parquet(s"$out/mh/sets")
        }
        ()
      }.start()
    // micro-batch 1: clones of corpus docs (bounce off the corpus
    // stores) + novel three-doc concatenations (admitted)
    val b1 = {
      val a = docs.filter(col("doc_id") > mx - 300 && col("doc_id") <= mx - 200)
      val clones = a.select((col("doc_id") + 3000000).as("doc_id"), col("text"))
      val novel = a.select(col("doc_id").as("aid"), col("text").as("atext"))
        .join(docs.select(col("doc_id").as("bid"), col("text").as("btext")),
          col("aid") - 120 === col("bid"))
        .join(docs.select(col("doc_id").as("cid"), col("text").as("ctext")),
          col("aid") - 240 === col("cid"))
        .select((col("aid") + 4000000).as("doc_id"),
          concat_ws(" ", col("atext"), col("btext"), col("ctext")).as("text"))
      clones.unionAll(novel).collect().map(r => (r.getLong(0), r.getString(1)))
    }
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    val adm1 = admittedIds.toVector
    assert(adm1.nonEmpty, "batch 1 must admit the novel docs")
    assert(adm1.forall(_._1 >= 4000000L), "corpus clones must bounce in batch 1")
    // micro-batch 2: exact clones of batch-1 admits (must bounce at the
    // APPENDED fingerprint store) + near clones with a never-in-corpus
    // token prepended (different fingerprint — must bounce at the
    // APPENDED minhash index). Neither store held them before batch 1.
    val b2 = adm1.map { case (id, t) => (id + 5000000L, t) } ++
      adm1.map { case (id, t) => (id + 6000000L, "zqx " + t) }
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()
    assert(admittedIds.toVector == adm1,
      s"batch-2 clones of batch-1 admits must ALL bounce off the appended " +
        s"stores, extra=${admittedIds.drop(adm1.length).take(5)}")
    // the maintained stores equal a fresh batch build over ALL admitted
    // docs — the append path cannot drift from the rebuild path
    val full = docs.unionAll(adm1.toSeq.toDF("doc_id", "text"))
    val fresh = Dedup.minhashIndex(full, "doc_id", "text")
    def bandRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("band_idx"), col("band_val")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(bandRows(spark.read.parquet(s"$out/mh/bands")) == bandRows(fresh.bands))
    def setRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("hset")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(setRows(spark.read.parquet(s"$out/mh/sets")) == setRows(fresh.sets))
    val fpStore = spark.read.parquet(s"$out/fp").collect().map(_.getString(0)).toSet
    val fpFull = full.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(fpStore == fpFull)
  }

  test("image admit→append loop: foreachBatch maintains the dHash store; edited clones of admits bounce; final store == fresh build") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val out = "target/test_sink/image_admit_append"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val slice = docs
      .filter(col("doc_id") > mx - 300 && length(col("text")) >= 400)
      .select(col("doc_id"), col("text"))
    // corpus-build time: the 8-byte-per-row dHash frame on disk
    Multimodal.dHash(Multimodal.asMedia(slice, "doc_id", "text"))
      .write.mode("overwrite").parquet(s"$out/dh")
    def admitOne(batch: org.apache.spark.sql.DataFrame) = {
      val hits = Multimodal.imageNearDupsBetween(
          Multimodal.asMedia(batch, "doc_id", "text"),
          spark.read.parquet(s"$out/dh"), maxHamming = 3, nBands = 4)
        .select(col("id_new").as("doc_id")).distinct()
      batch.join(hits, Seq("doc_id"), "left_anti")
    }
    val admittedIds = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialize the admission BEFORE the append mutates the store
        // the probe plan reads (collect: micro-batch-sized)
        val adm = admitOne(batch).collect().map(r => (r.getLong(0), r.getString(1)))
        admittedIds ++= adm
        if (adm.nonEmpty) {
          Multimodal.dHash(Multimodal.asMedia(
              adm.toSeq.toDF("doc_id", "text"), "doc_id", "text"))
            .write.mode("append").parquet(s"$out/dh")
        }
        ()
      }.start()
    // micro-batch 1: exact clones of corpus media (bounce at the stored
    // frame) + novel reversed payloads (admitted)
    val b1 = slice.select((col("doc_id") + 3000000).as("doc_id"), col("text"))
      .unionAll(slice.select((col("doc_id") + 4000000).as("doc_id"),
        reverse(col("text")).as("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    val adm1 = admittedIds.toVector
    assert(adm1.nonEmpty, "batch 1 must admit the novel reversed payloads")
    assert(adm1.forall(_._1 >= 4000000L), "corpus clones must bounce in batch 1")
    // micro-batch 2: exact clones of batch-1 admits + same-length local
    // edits (≤ 2 adjacent luma cells ⇒ ≤ 3 gradient bits ⇒ within
    // maxHamming) — neither existed in the store before the append
    val b2 = adm1.map { case (id, t) => (id + 5000000L, t) } ++
      adm1.map { case (id, t) =>
        (id + 6000000L, t.substring(0, 29) + "ZZZZ" + t.substring(33)) }
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()
    assert(admittedIds.toVector == adm1,
      s"batch-2 clones/edits of batch-1 admits must ALL bounce off the " +
        s"appended store, extra=${admittedIds.drop(adm1.length).take(5)}")
    // the maintained store equals a fresh dHash build over corpus +
    // every admitted payload — append cannot drift from rebuild
    val fresh = Multimodal.dHash(Multimodal.asMedia(
        slice.unionAll(adm1.toSeq.toDF("doc_id", "text")), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = spark.read.parquet(s"$out/dh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == fresh,
      "appended dHash store must equal the fresh batch build")
  }

  test("streamed sampling: micro-batch merges keep exactly the one-shot sample (min-k associativity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Sampling
    implicit val sqlCtx = spark.sqlContext
    val out = "target/test_sink/st_sample_k_stream"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    // seed: the standing corpus's sample (versioned store — a parquet
    // store cannot be overwritten from its own read)
    Sampling.exactK(docs.filter(col("doc_id") <= mx - 100),
        col("text"), k = 50, tieBreak = Seq(col("doc_id")), salt = "eval:")
      .write.mode("overwrite").parquet(s"$out/v0")
    @volatile var ver = 0
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cur = batch.unionByName(spark.read.parquet(s"$out/v$ver"))
        Sampling.exactK(cur, col("text"), k = 50,
            tieBreak = Seq(col("doc_id")), salt = "eval:")
          .write.mode("overwrite").parquet(s"$out/v${ver + 1}")
        ver += 1
        ()
      }.start()
    val tail = docs.filter(col("doc_id") > mx - 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = tail.partition(_._1 <= mx - 50)
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$out/v$ver")
      .collect().map(_.getLong(0)).toSet
    val oneShot = Sampling.exactK(docs, col("text"), k = 50,
        tieBreak = Seq(col("doc_id")), salt = "eval:")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(streamed.size == 50)
    assert(streamed == oneShot,
      "the merged streamed sample must equal the one-shot batch sample")
  }

  test("bm25 append loop: foreachBatch appends each micro-batch's index delta; final store serves == fresh build") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val out = "target/test_sink/bm25_append_stream"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    // seed the store with the standing corpus (all but the last 100)
    val seed = docs.filter(col("doc_id") <= mx - 100)
    val seedIx = TextAnalysis.bm25Index(seed, "doc_id", "text")
      .localCheckpoint(false)
    seedIx.write.mode("overwrite").parquet(s"$out/postings")
    TextAnalysis.bm25DocLens(seedIx, "doc_id")
      .write.mode("overwrite").parquet(s"$out/doclens")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ix = TextAnalysis.bm25Index(batch, "doc_id", "text")
          .localCheckpoint(false)
        ix.write.mode("append").parquet(s"$out/postings")
        TextAnalysis.bm25DocLens(ix, "doc_id")
          .write.mode("append").parquet(s"$out/doclens")
        ()
      }.start()
    // the last 100 docs arrive as two micro-batches
    val tail = docs.filter(col("doc_id") > mx - 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = tail.partition(_._1 <= mx - 50)
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // the maintained store holds exactly the fresh one-shot index rows…
    val freshIx = TextAnalysis.bm25Index(docs, "doc_id", "text")
      .localCheckpoint(false)
    val storedRows = spark.read.parquet(s"$out/postings")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val freshRows = freshIx
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(storedRows == freshRows,
      "appended postings must equal the fresh one-shot index")
    // …and SERVES the fresh-build answer (stats recompute per query, so
    // df/N/avgdl reflect every appended micro-batch)
    val served = TextAnalysis.bm25TopKStored(
        spark.read.parquet(s"$out/postings"),
        spark.read.parquet(s"$out/doclens"), "doc_id",
        Seq("hash", "join", "vector"), k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fresh = TextAnalysis.bm25TopKStored(freshIx,
        TextAnalysis.bm25DocLens(freshIx, "doc_id"), "doc_id",
        Seq("hash", "join", "vector"), k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == fresh,
      "the appended store must serve the fresh-build retrieval answer")
  }

  test("streaming CMS heavy hitters: micro-batch sketches merge exactly to the corpus sketch; contract attested") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    // the streaming frequency pipeline: one fixed-size CMS per
    // micro-batch, merged into the running corpus sketch (the mergeable
    // state a stream keeps instead of exact counts)
    var merged: Option[org.apache.spark.util.sketch.CountMinSketch] = None
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TextAnalysis.cmsSketch(batch, "doc_id", "text",
            eps = 0.001, confidence = 0.99).foreach { sk =>
          merged match {
            case Some(acc) => acc.mergeInPlace(sk)
            case None => merged = Some(sk)
          }
        }
        ()
      }.start()
    def half(p: org.apache.spark.sql.Column) = docs.filter(p)
      .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    mem.addData(half(col("doc_id") <= mid))
    q.processAllAvailable()
    mem.addData(half(col("doc_id") > mid))
    q.processAllAvailable()
    q.stop()
    val oneShot = TextAnalysis.cmsSketch(docs, "doc_id", "text",
      eps = 0.001, confidence = 0.99).get
    val m = merged.get
    // merge EXACTNESS: counter arrays are additive, so the merged
    // sketch equals the one-shot corpus sketch — same total and the
    // same estimate for every attested hash (same eps/confidence/seed)
    assert(m.totalCount() == oneShot.totalCount())
    val topHashes = docs
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .select(graft.operators.Dedup.sharedHash60(col("t")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(topHashes.nonEmpty)
    val bound = math.ceil(0.001 * oneShot.totalCount()).toLong
    topHashes.foreach { case (h, exact) =>
      val em = m.estimateCount(java.lang.Long.valueOf(h))
      val eo = oneShot.estimateCount(java.lang.Long.valueOf(h))
      assert(em == eo, s"merged sketch diverged from one-shot at hash $h: $em != $eo")
      assert(em >= exact && em <= exact + bound,
        s"CMS contract violated at hash $h: exact=$exact est=$em bound=$bound")
    }
    // and the attested report THROUGH the merged sketch equals the
    // batch gate's report (heavyHittersAgainstCms over the same corpus)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(rows(TextAnalysis.heavyHittersAgainstCms(
        docs, "doc_id", "text", merged, topK = 20)) ==
      rows(TextAnalysis.heavyHittersCms(docs, "doc_id", "text", topK = 20)))
  }

  test("streaming mixed-modality admission: text AND media probes on one stream == batch") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    // pipeline9's admission stages composed on ONE stream of rows
    // carrying BOTH columns — every stage stateless or stream-static
    // (quality filter, inlined-hash decontamination, band equi-joins,
    // dHash projection + band equi-join), so the probe-hit frame is
    // identical batch and stream
    val out = "target/test_sink/mixed_admission"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ev = docs.filter(col("doc_id") > mx - 100)
    val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text")
    Multimodal.dHash(Multimodal.asMedia(docs, "doc_id", "text"))
      .write.mode("overwrite").parquet(s"$out/dh")
    val storedDh = spark.read.parquet(s"$out/dh")
    def probes(in: org.apache.spark.sql.DataFrame) = {
      val q = in.filter(graft.operators.TextAnalysis.gopherKeep(col("text"),
        minTokens = 10, maxTokens = 100000, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minStopwordHits = 1))
      val clean = graft.streaming.Corpus.cleanAgainst(q, ev, "doc_id", "text")
      val mh = graft.streaming.Corpus.admitProbe(
          clean.select(col("doc_id"), col("text")), idx, "doc_id", "text")
        .select(col("id_new").as("doc_id"), lit("text").as("path"))
      val img = Multimodal.imageNearDupsBetween(
          Multimodal.asMedia(in.select(col("doc_id"), col("pay")),
            "doc_id", "pay"),
          storedDh, maxHamming = 3, nBands = 4)
        .select(col("id_new").as("doc_id"), lit("media").as("path"))
      mh.unionAll(img)
    }
    // fixture: text clones with novel payloads + novel texts with clone
    // payloads — each row must hit EXACTLY one path
    def fixture(in: org.apache.spark.sql.DataFrame) = {
      val slice = in.filter(col("doc_id") > mx - 200)
      slice.select((col("doc_id") + 3000000).as("doc_id"), col("text"),
          reverse(col("text")).as("pay"))
        .unionAll(slice.select((col("doc_id") + 4000000).as("doc_id"),
          reverse(col("text")).as("text"), col("text").as("pay")))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("path")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = rows(probes(fixture(docs)))
    assert(batch.nonEmpty)
    assert(batch.filter(_._2 == "text").nonEmpty &&
      batch.filter(_._2 == "media").nonEmpty)
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
    Events.runToMemory(spark, probes(fixture(stream)), "t_mixed_admit",
      OutputMode.Append())
    assert(rows(spark.table("t_mixed_admit")) == batch)
  }

  test("mixed admit→append loop: foreachBatch maintains BOTH stores; batch-2 bounces on each; final stores == fresh builds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Multimodal, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    // st_pipeline9 as a REAL two-micro-batch stream: rows carry text
    // AND a media payload; per micro-batch the pipeline9 admission runs
    // against the current stores, then BOTH deltas append
    val out = "target/test_sink/mixed_admit_append"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ev = docs.filter(col("doc_id") > mx - 100)
    val idx0 = Dedup.minhashIndex(docs, "doc_id", "text")
    idx0.bands.write.mode("overwrite").parquet(s"$out/mh/bands")
    idx0.sets.write.mode("overwrite").parquet(s"$out/mh/sets")
    Multimodal.dHash(Multimodal.asMedia(docs, "doc_id", "text"))
      .write.mode("overwrite").parquet(s"$out/dh")
    def admitOne(batch: org.apache.spark.sql.DataFrame) = {
      val q = batch.filter(TextAnalysis.gopherKeep(col("text"),
        minTokens = 10, maxTokens = 100000, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minStopwordHits = 1))
      val clean = graft.streaming.Corpus.cleanAgainst(q, ev, "doc_id", "text")
      val mhHits = graft.streaming.Corpus.admitProbe(
          clean.select(col("doc_id"), col("text")),
          Dedup.MinhashIndex(spark.read.parquet(s"$out/mh/bands"),
            spark.read.parquet(s"$out/mh/sets")), "doc_id", "text")
        .select(col("id_new").as("doc_id")).distinct()
      val textOk = clean.join(mhHits, Seq("doc_id"), "left_anti")
      val imgHits = Multimodal.imageNearDupsBetween(
          Multimodal.asMedia(batch.select(col("doc_id"), col("pay")),
            "doc_id", "pay"),
          spark.read.parquet(s"$out/dh"), maxHamming = 3, nBands = 4)
        .select(col("id_new").as("doc_id")).distinct()
      textOk.join(imgHits, Seq("doc_id"), "left_anti")
    }
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("doc_id", "text", "pay").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialize BEFORE the appends mutate the stores the probe
        // plans read (collect: micro-batch-sized)
        val adm = admitOne(batch).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        admitted ++= adm
        if (adm.nonEmpty) {
          val admDf = adm.toSeq.toDF("doc_id", "text", "pay")
          val delta = Dedup.minhashIndex(admDf, "doc_id", "text")
          delta.bands.write.mode("append").parquet(s"$out/mh/bands")
          delta.sets.write.mode("append").parquet(s"$out/mh/sets")
          Multimodal.dHash(Multimodal.asMedia(
              admDf.select(col("doc_id"), col("pay")), "doc_id", "pay"))
            .write.mode("append").parquet(s"$out/dh")
        }
        ()
      }.start()
    // micro-batch 1: the pipeline9 fixture — the both-novel group is
    // the only admissible one
    val b1 = {
      val a = docs.filter(col("doc_id") > mx - 300 && col("doc_id") <= mx - 200)
      val novel = a.select(col("doc_id").as("aid"), col("text").as("atext"))
        .join(docs.select(col("doc_id").as("bid"), col("text").as("btext")),
          col("aid") - 120 === col("bid"))
        .join(docs.select(col("doc_id").as("cid"), col("text").as("ctext")),
          col("aid") - 240 === col("cid"))
        .select(col("aid"), col("atext"),
          concat_ws(" ", col("atext"), col("btext"), col("ctext")).as("ntext"))
      a.select((col("doc_id") + 3000000).as("doc_id"), col("text"),
          col("text").as("pay"))
        .unionAll(novel.select((col("aid") + 4000000).as("doc_id"),
          col("ntext").as("text"), col("atext").as("pay")))
        .unionAll(a.select((col("doc_id") + 5000000).as("doc_id"), col("text"),
          reverse(col("text")).as("pay")))
        .unionAll(novel.select((col("aid") + 6000000).as("doc_id"),
          col("ntext").as("text"), reverse(col("atext")).as("pay")))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    }
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    val adm1 = admitted.toVector
    assert(adm1.nonEmpty, "batch 1 must admit the both-novel group")
    assert(adm1.forall(_._1 >= 6000000L),
      "every group with a cloned text OR cloned payload must bounce in batch 1")
    // micro-batch 2: near-clone texts with novel payloads (the appended
    // MINHASH index is their only rejector) + fresh 3-doc concat texts
    // with exact clones of admitted payloads (the appended DHASH frame
    // is theirs)
    val comp = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b2 = adm1.map { case (id, t, _) =>
        (id + 10000000L, "zqx " + t, t.reverse) } ++
      adm1.flatMap { case (id, _, p) =>
        val aid = id - 6000000L
        // fresh 3-doc concat sharing only atext with the appended text;
        // rows whose -60/-180 components fall off the corpus skip (the
        // exact-clone payload group is what pins the dHash append)
        for (a <- comp.get(aid); b <- comp.get(aid - 60);
             c <- comp.get(aid - 180))
          yield (id + 11000000L, s"$a $b $c", p)
      }
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()
    assert(admitted.toVector == adm1,
      s"batch-2 rows must ALL bounce off the appended stores, " +
        s"extra=${admitted.drop(adm1.length).map(_._1).take(5)}")
    // the maintained stores equal fresh builds over corpus + admits on
    // BOTH modalities — neither append path can drift from rebuild
    val fullText = docs.unionAll(
      adm1.map(t => (t._1, t._2)).toSeq.toDF("doc_id", "text"))
    val freshMh = Dedup.minhashIndex(fullText, "doc_id", "text")
    def bandRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("band_idx"), col("band_val")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(bandRows(spark.read.parquet(s"$out/mh/bands")) == bandRows(freshMh.bands))
    val freshDh = Multimodal.dHash(Multimodal.asMedia(
        docs.select(col("doc_id"), col("text").as("pay"))
          .unionAll(adm1.map(t => (t._1, t._3)).toSeq.toDF("doc_id", "pay")),
        "doc_id", "pay"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val storedDh = spark.read.parquet(s"$out/dh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedDh == freshDh,
      "appended dHash store must equal the fresh batch build")
  }

  test("streamed hybrid serving: two query micro-batches against static stores == one-shot batch serve") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val emb = Tables.load(spark, sf, "embeddings")
    val out = "target/test_sink/st_hybrid_serve_spec"
    val ix = graft.operators.TextAnalysis.bm25Index(docs, "doc_id", "text")
      .localCheckpoint(false)
    ix.write.mode("overwrite").parquet(s"$out/postings")
    graft.operators.TextAnalysis.bm25DocLens(ix, "doc_id")
      .write.mode("overwrite").parquet(s"$out/doclens")
    val post = spark.read.parquet(s"$out/postings")
    val dls = spark.read.parquet(s"$out/doclens")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val served = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("query_id", "qtext").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        served ++= graft.streaming.Corpus.serveHybrid(batch, post, dls,
            emb, "doc_id", "query_id", "qtext", "vec_id", "embedding",
            kLeg = 20, kFused = 10)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        ()
      }.start()
    mem.addData((1L, "hash join"))
    q.processAllAvailable()
    mem.addData((2L, "vector scan slow"), (3L, "zzzunknown"))
    q.processAllAvailable()
    q.stop()
    val oneShot = graft.streaming.Corpus.serveHybrid(
        Seq((1L, "hash join"), (2L, "vector scan slow"),
          (3L, "zzzunknown")).toDF("query_id", "qtext"),
        post, dls, emb, "doc_id", "query_id", "qtext", "vec_id",
        "embedding", kLeg = 20, kFused = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(served.toSet == oneShot, s"streamed ${served.toSet} vs batch $oneShot")
    assert(oneShot.nonEmpty)
    // query 3's lexical leg matches nothing — its fusion is the
    // semantic leg alone, and it still serves
    assert(oneShot.exists(_._1 == 3L))
  }

  test("streamed KN scoring: two doc micro-batches under the stored model == one-shot batch scores") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val out = "target/test_sink/kn_stream_spec"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    // train on the even half, store, read back (the gate recipe)
    TextAnalysis.trigramKnTrain(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
      .foreach { case (k, v) => v.write.mode("overwrite").parquet(s"$out/$k") }
    val model = Seq("c3", "ctx", "sfx", "mid", "uni")
      .map(k => k -> spark.read.parquet(s"$out/$k")).toMap
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val scored = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-batch scoring is exact: every trigram of a doc arrives
        // with its row — the per-doc aggregate never spans batches
        scored ++= TextAnalysis.trigramKnScoreStored(batch, "doc_id",
            "text", model).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        ()
      }.start()
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val oneShot = TextAnalysis.trigramKnScoreStored(docs, "doc_id",
        "text", model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(scored.toSet == oneShot,
      s"streamed ${scored.size} rows != one-shot ${oneShot.size}")
    // the drift signal flows on the stream: odd (unseen-half) docs
    // carry unseen trigrams, even (training-half) docs none
    assert(scored.exists(r => r._1 % 2 == 1 && r._3 > 0))
    assert(scored.filter(_._1 % 2 == 0).forall(_._3 == 0L))
  }

  test("streaming image admission: per-row dHash probe vs stored hashes == batch") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    val out = "target/test_sink/image_dhash"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val slice = docs.filter(col("doc_id") > mx - 300 && length(col("text")) >= 400)
    // corpus hashes written once — payloads never re-read
    Multimodal.dHash(Multimodal.asMedia(slice, "doc_id", "text"))
      .write.mode("overwrite").parquet(out)
    val stored = spark.read.parquet(out)
    def edited(in: org.apache.spark.sql.DataFrame) = Multimodal.asMedia(
      in.filter(col("doc_id") > mx - 300 && length(col("text")) >= 400)
        .select((col("doc_id") + 3000000).as("doc_id"),
          concat(substring(col("text"), 1, 10), lit("QQQQ"),
            expr("substring(text, 15)")).as("text")),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id_new"), col("id_corpus"), col("hamming")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = rows(Multimodal.imageNearDupsBetween(edited(docs), stored))
    assert(batch.nonEmpty && batch.forall(_._3 <= 3))
    // the identical probe runs on a STREAM — per-row hashing is a pure
    // projection, the pairing a stateless stream-static join
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
    Events.runToMemory(spark,
      Multimodal.imageNearDupsBetween(edited(stream), stored),
      "t_image_admit", OutputMode.Append())
    assert(rows(spark.table("t_image_admit")) == batch)
  }

  test("streaming LR quality scoring: stream == batch == the decimal-algebra scorer") {
    import org.apache.spark.sql.functions._
    import graft.operators.Classifier
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val pos = docs.filter(col("doc_id") % 2 === 0)
    val neg = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), upper(col("text")).as("text"))
    val w = Classifier.lrTrain(pos, neg, "doc_id", "text",
      buckets = 64, iters = 2, lr = 0.5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val batchStream = rows(graft.streaming.Corpus.scoreQualityStream(
      docs, "doc_id", "text", w, buckets = 64))
    // the per-row scorer lands on the batch scorer's round(·,6) logits
    val batchLr = rows(Classifier.lrScore(docs, "doc_id", "text",
      Classifier.weightsToDf(spark, w), buckets = 64))
    assert(batchStream == batchLr && batchLr.nonEmpty)
    // and the same expression runs stream-side unchanged (stateless)
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
    Events.runToMemory(spark, graft.streaming.Corpus.scoreQualityStream(
      stream, "doc_id", "text", w, buckets = 64), "t_quality_lr",
      OutputMode.Append())
    assert(rows(spark.table("t_quality_lr")) == batchStream)
  }

  test("streaming corpus KL: per-micro-batch drift rows == the batch-parity form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ref = docs.filter(col("doc_id") <= mx - 100)
    def slice(lo: Long, hi: Long) = docs
      .filter(col("doc_id") > mx - lo && col("doc_id") <= mx - hi)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // the drift dashboard loop: one KL row per arriving generation,
    // scored against the static reference corpus
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    var nBatch = 0
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        nBatch += 1
        val r = graft.operators.TextAnalysis
          .unigramKlReport(ref, batch, "text").collect()(0)
        rows += (nBatch +: r.toSeq)
        ()
      }.start()
    mem.addData(slice(100, 50).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(slice(50, 0).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = rows.toVector
    val batchForm = SparkEntry.queries("st_corpus_kl")(spark, TestSpark.sf)
      .collect().sortBy(_.getInt(0)).map(_.toSeq.toVector).toVector
    assert(streamed.map(_.toVector) == batchForm,
      s"streamed $streamed vs batch $batchForm")
    // drift is measured, not degenerate: both generations diverge from
    // the reference
    assert(batchForm.forall(r => r(4).asInstanceOf[Double] > 0.0))
  }

  test("streaming quality panel: Gopher rules on a stream == batch, stateless") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    def panel(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.gopherRules(df, "doc_id", "text",
        minTokens = 10, maxTokens = 100000,
        minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
        maxSymbolRatio = 0.1, minStopwordHits = 1)
    val batch = panel(docs).collect().map(_.toSeq).toSet
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
    Events.runToMemory(spark, panel(stream), "t_quality", OutputMode.Append())
    val streamed = spark.table("t_quality").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
    // the panel discriminates on this corpus (some keep=false)
    assert(batch.exists(r => r.last == false))
  }

  test("streaming corpus report: complete-mode aggregate == batch") {
    // the ingestion dashboard on the ingestion stream: a stateful
    // complete-mode aggregate (unlike the stateless parity cases) —
    // counts/sums/min/max merge exactly; avg is exact-integer double
    // addition below 2^53, so incremental merge order cannot change it
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val batch = graft.operators.TextAnalysis
      .corpusReport(docs, "source", "lang", "text")
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
    Events.runToMemory(spark,
      graft.operators.TextAnalysis.corpusReport(stream, "source", "lang", "text"),
      "t_report", OutputMode.Complete())
    val streamed = spark.table("t_report").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
    // the panel is real: more than one (source, lang) slice
    assert(batch.size > 1)
  }

  test("streaming decontamination: stream over files == batch, stateless") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ev = docs.filter(col("doc_id") > mx - 100).select(col("doc_id"), col("text"))
    val batchCorpus = docs.filter(col("doc_id") <= mx - 100)
    val batch = graft.streaming.Corpus
      .cleanAgainst(batchCorpus, ev, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    // stream the whole documents file; apply the same corpus filter +
    // decontamination transform — identical code path
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
      .filter(col("doc_id") <= mx - 100)
    Events.runToMemory(spark,
      graft.streaming.Corpus.cleanAgainst(stream, ev, "doc_id", "text"),
      "t_decon", OutputMode.Append())
    val streamed = spark.table("t_decon").collect().map(_.getLong(0)).toSet
    assert(streamed == batch && batch.nonEmpty)
    // and contamination is real: some corpus docs were dropped
    assert(batch.size < batchCorpus.count())
  }

  test("streaming admission dedup: stream probe == batch minhashPairsBetween") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    // the ground truth: the batch relational incremental-dedup operator
    val batch = graft.operators.Dedup.minhashPairsBetween(
        docs.filter(col("doc_id") > mx - 300)
          .select((col("doc_id") + 3000000).as("doc_id"), col("text")),
        docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the static index is precomputed in batch; the NEW side arrives as
    // a stream over the same files — identical admitProbe code path
    val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text")
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
      .filter(col("doc_id") > mx - 300)
      .select((col("doc_id") + 3000000).as("doc_id"), col("text"))
    Events.runToMemory(spark,
      graft.streaming.Corpus.admitProbe(stream, idx, "doc_id", "text"),
      "t_admit", OutputMode.Append())
    // collapse the documented per-shared-band duplicates; the pair SET
    // (with jaccard) must match batch exactly
    val streamed = spark.table("t_admit")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
    // the probe found the planted re-ingested clones (jaccard 1.0)
    assert(batch.exists(_._3 == 1.0))
  }

  test("admitBatch lineage truncation: admitted set == the untruncated composition") {
    import org.apache.spark.sql.functions._
    // round 15 checkpoints admitBatch's internal fan-outs (the batch
    // frame feeds the pair sketch + keep-first; the survivors feed the
    // store probe + final anti-join). Pin that the truncation changes
    // NOTHING about the admitted set by recomputing the pre-r15
    // composition inline on the same fixture.
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text")
    val corpusClone = docs.filter(col("doc_id") === 5)
      .select((col("doc_id") + 101).as("doc_id"), col("text"))  // bounces at the store
    val novelText = (1 to 40).map(i => s"zqnovel$i").mkString(" ")
    val novel = docs.limit(1)
      .select(lit(102L).as("doc_id"), lit(novelText).as("text")) // admitted
    val novelDup = novel.select(lit(103L).as("doc_id"), col("text")) // in-batch twin, drops
    val batch = corpusClone.unionByName(novel).unionByName(novelDup)
    val got = graft.streaming.Corpus.admitBatch(batch, idx, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // the untruncated composition (the exact pre-r15 operator body)
    val losers = graft.operators.Dedup.minhashPairs(batch, "doc_id", "text")
      .select(col("id_b").as("doc_id")).distinct()
    val reps = batch.join(losers, Seq("doc_id"), "left_anti")
    val hits = graft.streaming.Corpus.admitProbe(reps, idx, "doc_id", "text")
      .select(col("id_new").as("doc_id")).distinct()
    val want = reps.join(hits, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
    assert(got.sameElements(Array(102L)),
      s"keep-first must drop 103, the store must bounce 101+: got ${got.toSeq}")
  }

  test("streaming semantic admission: stream == batch, stateless") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val mx = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cents = graft.operators.Similarity.collectCentroids(
      emb, "vec_id", "embedding", 8)
    def probe(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.semanticPairsBetween(df, emb,
        "vec_id", "vec_id", "embedding", "embedding", cents,
        simThreshold = 0.99)
    val incoming = emb.filter(col("vec_id") > mx - 100)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val batch = probe(incoming).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the same vectors arrive as a STREAM (re-id applied on the stream);
    // cell assignment is a pure projection, the probe a stream-static
    // equi-join — no watermark, no state store
    val stream = graft.streaming.Corpus.readEmbeddingsStream(spark, TestSpark.sf)
      .filter(col("vec_id") > mx - 100)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    Events.runToMemory(spark, probe(stream), "t_semadmit", OutputMode.Append())
    val streamed = spark.table("t_semadmit")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
    // every clone is cosine-1.0 with its original in the same cell
    assert(batch.exists(_._3 == 1.0))
  }

  test("decontamination eval-set ceiling: batch falls back, streaming refuses") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val ev = docs.filter(col("doc_id") > mx - 100).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") <= mx - 100)
    // inline (fused-expression) path vs forced relational fallback:
    // identical keep set — the ceiling changes the PLAN, not the answer
    val inline = graft.streaming.Corpus
      .cleanAgainst(corpus, ev, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val fallback = graft.streaming.Corpus
      .cleanAgainst(corpus, ev, "doc_id", "text", maxInlineHashes = 1)
      .collect().map(_.getLong(0)).toSet
    assert(fallback == inline && inline.nonEmpty)
    // a streaming input over the ceiling must refuse LOUDLY with the
    // foreachBatch escape hatch, not silently plan an 8-GB literal
    val stream = graft.streaming.Corpus.readStream(spark, TestSpark.sf)
    val err = intercept[IllegalArgumentException] {
      graft.streaming.Corpus.cleanAgainst(stream, ev, "doc_id", "text",
        maxInlineHashes = 1)
    }
    assert(err.getMessage.contains("foreachBatch"))
  }

  test("session gap boundary: exactly-gap-apart events start a new session") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:30:00")),
        (1L, t("2024-01-01 10:59:59")))
      .toDF("user_id", "ts")
    val sessions = Events.sessions(df, "30 minutes").collect()
    // Spark session_window treats the interval as CLOSED: an event at
    // exactly start+gap EXTENDS the session — all three events merge.
    // (The st_session oracle's gaps-and-islands SQL therefore splits
    // only on strictly-greater gaps.)
    assert(sessions.length == 1)
    assert(sessions.head.getAs[Long]("n_events") == 3L)
  }

  test("watermark drops events later than the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val agg = df.withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w_start"), $"event_type", $"n")
    val q = agg.writeStream.format("memory").queryName("t_late")
      .outputMode(OutputMode.Append()).start()
    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: events up to 10:30 → watermark advances to 09:30
    mem.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:30:00"), "a"))
    q.processAllAvailable()
    // batch 2: an event at 08:00 — older than watermark − window, dropped;
    // and one at 10:40 — accepted
    mem.addData((t("2024-01-01 08:00:00"), "late"), (t("2024-01-01 10:40:00"), "a"))
    q.processAllAvailable()
    // close all windows
    mem.addData((t("2024-01-01 14:00:00"), "z"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_late").collect()
      .map(r => (r.getAs[Timestamp]("w_start").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n")))
    assert(!rows.exists(_._2 == "late"), s"late event must be dropped: ${rows.mkString(",")}")
    assert(rows.contains(("2024-01-01 10:00:00.0", "a", 3L)))
  }

  test("streaming dedup within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val q = df.withWatermark("ts", "1 hour").dropDuplicates("event_id")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode(OutputMode.Append()).start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:01:00")))
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 10:02:00")), (3L, t("2024-01-01 10:03:00")))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("t_dedup").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("file sink + checkpoint: restart is exactly-once (no reprocessing)") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def runOnce(): Unit = {
      val q = Events.readStream(spark, TestSpark.sf)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    try {
      runOnce()
      val n1 = spark.read.parquet(out).count()
      assert(n1 == Tables.load(spark, TestSpark.sf, "events").count(),
        "first run must sink every source row")
      // restart against the same checkpoint: the source offsets are
      // committed, so nothing is reprocessed and nothing is duplicated
      runOnce()
      val n2 = spark.read.parquet(out).count()
      assert(n2 == n1, s"restart duplicated rows: $n1 -> $n2")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("stream-stream interval join: stream == batch") {
    val events = Tables.load(spark, TestSpark.sf, "events")
    val batch = Events.purchaseClickJoin(events).collect().map(_.toSeq).toSet
    val stream = Events.readStream(spark, TestSpark.sf)
    // self-join of one stream: purchases side joined to clicks side,
    // append mode (stream-stream joins emit once both watermarks pass)
    Events.runToMemory(spark, Events.purchaseClickJoin(stream), "t_ssjoin",
      OutputMode.Append())
    val streamed = spark.table("t_ssjoin").collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("custom keyed state: per-user running totals (mapGroupsWithState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("user_id", "value")
    val q = Events.userRunningTotals(df)
      .writeStream.format("memory").queryName("t_state")
      .outputMode(OutputMode.Update()).start()
    mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
    q.processAllAvailable()
    mem.addData((1L, 2.0))
    q.processAllAvailable()
    q.stop()
    val byUser = spark.table("t_state").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    assert(byUser(1L) == ((3L, 17.0)))
    assert(byUser(2L) == ((1L, 1.0)))
  }
}
