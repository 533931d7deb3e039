package graft.engine

import org.apache.spark.sql.{DataFrame, GraftBridge, GraftDeferred, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}
import graft.operators.{Dedup, Graph, Multimodal, Sampling, Similarity, TextAnalysis, TimeSeries}

/** SQL façade over the §2.10 LLM-pipeline operators — the reference's
  * identity is "SQL to whatever" (`README.md` [U]), so the dedup /
  * containment / chunk / pack / sample pipelines must be reachable from
  * `Engine.query` SQL text, not only the Scala API.
  *
  * Each pipeline registers as a session-scoped TABLE-VALUED function
  * (Catalyst `TableFunctionRegistry`), usable in FROM position:
  *
  * {{{
  *   SELECT * FROM graft_minhash_pairs('documents', 'doc_id', 'text', 0.5)
  *   SELECT * FROM graft_chunk('documents', 'doc_id', 'text', 64, 16)
  * }}}
  *
  * The builder runs at ANALYSIS time and returns the operator's logical
  * plan — execution stays fully distributed and LAZY, including the
  * iterative cluster functions: their connected-components rounds sit
  * behind a [[org.apache.spark.sql.GraftDeferredScan]] leaf, so
  * `EXPLAIN`/`prepare`/re-analysis launch no Spark job and the rounds
  * fire (once — the builder thunk is memoized) only when the statement
  * actually executes. Arguments must be literals
  * (they parameterize plan construction, like every SQL TVF). Table
  * arguments resolve through the session catalog, so they compose with
  * temp views, catalog namespaces ([[Catalog.registerParquetDb]]) and
  * the dialect shim's `$vars`.
  */
object LlmSql {

  private def bad(sig: String, args: Seq[Expression]): Nothing =
    throw new IllegalArgumentException(
      s"expected $sig, got ${args.length} argument(s)")

  private def lit(e: Expression, fn: String): Any = {
    require(e.foldable, s"$fn: arguments must be literals, got: ${e.sql}")
    e.eval()
  }
  private def str(e: Expression, fn: String): String =
    String.valueOf(lit(e, fn))
  private def int(e: Expression, fn: String): Int = lit(e, fn) match {
    case n: java.lang.Number => n.intValue
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer, got $other")
  }
  // for id-valued params: intValue would silently TRUNCATE a bigint
  // literal above Int.MaxValue (routine for shifted doc/vec ids)
  private def lng(e: Expression, fn: String): Long = lit(e, fn) match {
    case n: java.lang.Number => n.longValue
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer, got $other")
  }
  // optional reuse-tail arguments: anything other than the documented
  // 'local' (or an explicit 'off') is REJECTED — a typo like 'Local'
  // silently disabling input truncation is the failure mode this guards
  private def reuseOpt(e: Expression, fn: String): graft.operators.Reuse =
    str(e, fn) match {
      // 'local' maps to the DEFERRED local checkpoint on the SQL
      // surface: TVF builders run at analysis, and SQL temp views
      // re-analyze per downstream statement — an eager Reuse.Local
      // here re-ran the upstream chain once per CREATE VIEW (see
      // Reuse.LocalDeferred's scaladoc; BASELINE.md round-12)
      case "local" => graft.operators.Reuse.LocalDeferred
      case "off"   => graft.operators.Reuse.Off
      case other => throw new IllegalArgumentException(
        s"$fn: unrecognized reuse option '$other' (expected 'local' or 'off')")
    }
  // optional pre-tokenization tail for the BPE family: 'pretok'
  // selects the Sennrich-style class split (TextAnalysis.pretokPattern),
  // 'ws' the whitespace default; anything else refuses loudly (the
  // reuseOpt typo-guard convention)
  private def pretokOpt(e: Expression, fn: String): Boolean =
    str(e, fn) match {
      case "pretok" => true
      case "ws"     => false
      case other => throw new IllegalArgumentException(
        s"$fn: unrecognized pre-tokenization option '$other' (expected 'pretok' or 'ws')")
    }
  private def dbl(e: Expression, fn: String): Double = lit(e, fn) match {
    case n: java.lang.Number => n.doubleValue // covers Decimal literals
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: expected a number, got $other")
  }

  /** Resolve a table-name argument through the active session catalog
    * (temp views, `db.table` namespaces — anything spark.table sees). */
  private def table(name: String): DataFrame = SparkSession.active.table(name)

  /** Memoize a deferred builder: plan-tree copies and repeated actions
    * on the statement share ONE run of the iterative computation. */
  private def memo(f: () => DataFrame): () => DataFrame = {
    lazy val v = f()
    () => v
  }

  private def reg(spark: SparkSession, name: String)
                 (b: Seq[Expression] => DataFrame): Unit =
    GraftBridge.registerTableFunction(spark, name,
      args => GraftBridge.logicalPlan(b(args)))

  /** Sessions already registered — same WARN-flood guard as
    * [[graft.functions.Builtins.registerAll]] (re-running
    * createOrReplaceTempFunction logs a "replaced" WARN per function). */
  private val registeredSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Register every LLM-pipeline table function on `spark`. Idempotent
    * per session, called by the [[Engine]] constructor. */
  def registerAll(spark: SparkSession): Unit = {
    // mark-before-register guards re-entrancy, but a partial failure
    // must UNmark — otherwise the session is permanently half-registered
    // and every later call returns early instead of retrying
    if (!registeredSessions.add(spark)) return
    try registerAllImpl(spark)
    catch { case t: Throwable => registeredSessions.remove(spark); throw t }
  }

  private def registerAllImpl(spark: SparkSession): Unit = {
    reg(spark, "graft_exact_dedup") {
      case Seq(t, id, text) =>
        val f = "graft_exact_dedup"
        Dedup.exactDedup(table(str(t, f)), str(id, f), str(text, f))
      case args => bad("graft_exact_dedup(table, id_col, text_col)", args)
    }
    reg(spark, "graft_minhash_pairs") {
      case args if args.length == 4 || args.length == 5 =>
        val f = "graft_minhash_pairs"
        val cap = if (args.length == 5) Some(int(args(4), f)) else None
        Dedup.minhashPairs(table(str(args(0), f)), str(args(1), f),
          str(args(2), f), threshold = dbl(args(3), f), maxBucketSize = cap)
      case args => bad(
        "graft_minhash_pairs(table, id_col, text_col, threshold[, max_bucket])", args)
    }
    reg(spark, "graft_minhash_between") {
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_minhash_between"
        val cap = if (args.length == 6) Some(int(args(5), f)) else None
        Dedup.minhashPairsBetween(table(str(args(0), f)), table(str(args(1), f)),
          str(args(2), f), str(args(3), f),
          threshold = dbl(args(4), f), maxBucketSize = cap)
      case args => bad(
        "graft_minhash_between(new_table, corpus_table, id_col, text_col, threshold[, max_bucket])", args)
    }
    reg(spark, "graft_minhash_probe") {
      // probe a STORED index: bands/sets are any registered views —
      // typically parquet read-backs of a minhashIndex write; k and
      // n_bands must match the build (minhashProbe's contract)
      case Seq(bands, sets, t, id, text, k, nb, thr) =>
        val f = "graft_minhash_probe"
        Dedup.minhashProbe(table(str(t, f)),
          Dedup.MinhashIndex(table(str(bands, f)), table(str(sets, f))),
          str(id, f), str(text, f),
          k = int(k, f), nBands = int(nb, f), threshold = dbl(thr, f))
      case args => bad(
        "graft_minhash_probe(bands_table, sets_table, new_table, id_col, text_col, k, n_bands, threshold)", args)
    }
    reg(spark, "graft_containment_pairs") {
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_containment_pairs"
        val cap = if (args.length == 6) Some(int(args(5), f)) else None
        Dedup.containmentPairs(table(str(args(0), f)), str(args(1), f),
          str(args(2), f), n = int(args(3), f),
          threshold = dbl(args(4), f), maxShingleDf = cap)
      case args => bad(
        "graft_containment_pairs(table, id_col, text_col, n, threshold[, max_df])", args)
    }
    reg(spark, "graft_chunk") {
      case Seq(t, id, text, ct, ov) =>
        val f = "graft_chunk"
        TextAnalysis.chunk(table(str(t, f)), str(id, f), str(text, f),
          chunkTokens = int(ct, f), overlap = int(ov, f))
      case args => bad(
        "graft_chunk(table, id_col, text_col, chunk_tokens, overlap)", args)
    }
    reg(spark, "graft_pack_offsets") {
      // 6-arg form packs in LEARNED tokens: the stored merge table
      // drives the counter (KB-scale collect, the graft_bpe_count
      // boundary); id order / hierarchy / straddle contract unchanged
      case Seq(t, id, text, sl, dpb) =>
        val f = "graft_pack_offsets"
        TextAnalysis.packOffsets(table(str(t, f)), str(id, f), str(text, f),
          seqLen = int(sl, f), docsPerBucket = int(dpb, f))
      case Seq(t, id, text, sl, dpb, merges) =>
        val f = "graft_pack_offsets"
        TextAnalysis.packOffsets(table(str(t, f)), str(id, f), str(text, f),
          seqLen = int(sl, f), docsPerBucket = int(dpb, f),
          tokenCounter = TextAnalysis.bpeCounter(table(str(merges, f))))
      case args => bad(
        "graft_pack_offsets(table, id_col, text_col, seq_len, docs_per_bucket[, merges_table])", args)
    }
    reg(spark, "graft_store_compact") {
      // physical store compaction (purge tombstones from the files +
      // consolidate append deltas into a new versioned path) — the
      // rewrite is an ACTION, so it is deferred like every
      // store-writing TVF: EXPLAIN sees a fixed-schema leaf (the input
      // store's columns, partition keys last — the parquet read-back
      // layout), the rewrite fires at first execution. Empty
      // tombstone-table name = compact-only (no purge).
      case Seq(st, id, tombT, pathE, partsE, nfE) =>
        val f = "graft_store_compact"
        val store = table(str(st, f))
        val idc = str(id, f)
        val tombName = str(tombT, f)
        val tomb = if (tombName.isEmpty) None else Some(table(tombName))
        val path = str(pathE, f)
        val parts = str(partsE, f).split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        parts.foreach(p => require(store.columns.contains(p),
          s"$f: partition column `$p` not in store (${store.columns.sorted.mkString(",")})"))
        val nf = int(nfE, f)
        val outSchema = StructType(
          store.schema.filterNot(fd => parts.contains(fd.name)) ++
            parts.map(p => store.schema(p)))
        GraftDeferred.frame(spark, outSchema, memo { () =>
          Dedup.storeCompact(store, idc, tomb, path,
            partitionCols = parts, numFiles = nf)
        })
      case args => bad(
        "graft_store_compact(store_table, id_col, tombstone_table_or_empty, out_path, partition_cols_csv, num_files)", args)
    }
    reg(spark, "graft_store_compact_selective") {
      // partition-SELECTIVE compaction IN PLACE over a partitioned
      // store directory: only tombstone-bearing partitions rewrite,
      // untouched partition files stay byte-identical. store_table must
      // be a view over store_path (it supplies the schema so analysis
      // stays job-free); the rewrite is a deferred ACTION like
      // graft_store_compact.
      case Seq(st, id, tombT, storeP, stagingP, partsE) =>
        val f = "graft_store_compact_selective"
        val store = table(str(st, f))
        val idc = str(id, f)
        val tomb = table(str(tombT, f))
        val sp = str(storeP, f)
        val gp = str(stagingP, f)
        val parts = str(partsE, f).split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(parts.nonEmpty, s"$f: partition_cols_csv must be non-empty")
        parts.foreach(p => require(store.columns.contains(p),
          s"$f: partition column `$p` not in store (${store.columns.sorted.mkString(",")})"))
        val outSchema = StructType(
          store.schema.filterNot(fd => parts.contains(fd.name)) ++
            parts.map(p => store.schema(p)))
        GraftDeferred.frame(spark, outSchema, memo { () =>
          Dedup.storeCompactSelective(spark, sp, idc, tomb, parts, gp)
        })
      case args => bad(
        "graft_store_compact_selective(store_table, id_col, tombstone_table, store_path, staging_path, partition_cols_csv)", args)
    }
    reg(spark, "graft_bm25_stored") {
      // retrieval from the stored inverted index: fully LAZY (pushed
      // term filter, broadcast df/stats, top-k)
      case Seq(pT, dT, id, terms, k) =>
        val f = "graft_bm25_stored"
        TextAnalysis.bm25TopKStored(table(str(pT, f)), table(str(dT, f)),
          str(id, f),
          queryTerms = str(terms, f).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          k = int(k, f))
      case args => bad(
        "graft_bm25_stored(postings_table, doclens_table, id_col, terms_csv, k)", args)
    }
    reg(spark, "graft_bm25_pruned") {
      // bucket-partitioned stored serving: the query terms' bucket
      // literals are a pure driver function (no data read) — fully
      // LAZY, and the tbucket IN (...) lands in PartitionFilters
      case Seq(pT, dT, id, terms, nB, kE) =>
        val f = "graft_bm25_pruned"
        TextAnalysis.bm25TopKStoredPruned(table(str(pT, f)),
          table(str(dT, f)), str(id, f),
          queryTerms = str(terms, f).split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          nBuckets = int(nB, f), k = int(kE, f))
      case args => bad(
        "graft_bm25_pruned(postings_table, doclens_table, id_col, terms_csv, n_buckets, k)", args)
    }
    reg(spark, "graft_bm25_join") {
      // batch retrieval over the stored index: the query-batch term
      // union collects to a driver literal (the probe-cell-union
      // recipe) — an ACTION, so deferred; EXPLAIN launches no job
      case Seq(pT, dT, qT, id, qid, qtext, k) =>
        val f = "graft_bm25_join"
        val postings = table(str(pT, f)); val dls = table(str(dT, f))
        val qs = table(str(qT, f))
        val idc = str(id, f); val qidc = str(qid, f)
        val qtc = str(qtext, f); val kk = int(k, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(qidc, qs.select(col(qidc)).schema.head.dataType),
            StructField(idc, postings.select(col(idc)).schema.head.dataType),
            StructField("bm25", org.apache.spark.sql.types.DoubleType),
            StructField("rank", org.apache.spark.sql.types.IntegerType))),
          memo { () =>
            TextAnalysis.bm25Join(postings, dls, qs, idc, qidc, qtc, k = kk)
          })
      case args => bad(
        "graft_bm25_join(postings_table, doclens_table, queries_table, id_col, query_id_col, query_text_col, k)", args)
    }
    reg(spark, "graft_corpus_kl") {
      // corpus drift between two snapshot tables: smoothed unigram KL
      // both directions, one report row
      case Seq(ta, tb, text) =>
        val f = "graft_corpus_kl"
        TextAnalysis.unigramKlReport(table(str(ta, f)), table(str(tb, f)),
          str(text, f))
      case args => bad(
        "graft_corpus_kl(table_a, table_b, text_col)", args)
    }
    reg(spark, "graft_bm25") {
      // keyword retrieval: query terms as a comma-separated literal
      // (split here — no per-row work), top-k by the quantized score
      case Seq(t, id, text, terms, k) =>
        val f = "graft_bm25"
        TextAnalysis.bm25TopK(table(str(t, f)), str(id, f), str(text, f),
          queryTerms = str(terms, f).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          k = int(k, f))
      case args => bad(
        "graft_bm25(table, id_col, text_col, terms_csv, k)", args)
    }
    reg(spark, "graft_rrf_fuse") {
      // hybrid-retrieval fusion: comma-separated ranked views (each
      // carrying id_col + rank), reciprocal-rank contributions added in
      // declared order via a full-outer chain — fully lazy
      case Seq(tablesCsv, id, kE, kR) =>
        val f = "graft_rrf_fuse"
        val ts = str(tablesCsv, f).split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        TextAnalysis.rrfFuse(ts.map(table), str(id, f),
          k = int(kE, f), kRrf = int(kR, f))
      case args => bad(
        "graft_rrf_fuse(ranked_tables_csv, id_col, k, k_rrf)", args)
    }
    reg(spark, "graft_rrf_fuse_by") {
      // per-query hybrid fusion: ranked views each carrying
      // (by_col, id_col, rank), fused within each by_col group, the cut
      // a by-partitioned window — fully lazy
      case Seq(tablesCsv, by, id, kE, kR) =>
        val f = "graft_rrf_fuse_by"
        val ts = str(tablesCsv, f).split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        TextAnalysis.rrfFuseBy(ts.map(table), str(by, f), str(id, f),
          k = int(kE, f), kRrf = int(kR, f))
      case args => bad(
        "graft_rrf_fuse_by(ranked_tables_csv, by_col, id_col, k, k_rrf)", args)
    }
    reg(spark, "graft_retrieval_eval") {
      // retrieval-quality report: a ranked run view + a relevance pair
      // view → per-query hits/precision/recall@k, RR, nDCG@k — fully
      // lazy
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_retrieval_eval"
        // optional 6th arg: graded-gain column name in the relevance
        // table -> the 2^rel - 1 DCG form; absent = binary relevance
        val gain = if (args.length == 6) Some(str(args(5), f)) else None
        TextAnalysis.retrievalEvalReport(table(str(args(0), f)),
          table(str(args(1), f)), str(args(2), f), str(args(3), f),
          k = int(args(4), f), gainCol = gain)
      case args => bad(
        "graft_retrieval_eval(run_table, relevance_table, query_col, id_col, k[, gain_col])", args)
    }
    reg(spark, "graft_snippet_join") {
      // batch snippets: a ranked run view + the docs + the queries —
      // per-query terms ride as an array column; pure lazy projection
      case Seq(runT, docsT, qT, qc, idc, tc, qtc, w) =>
        val f = "graft_snippet_join"
        TextAnalysis.snippetJoin(table(str(runT, f)), table(str(docsT, f)),
          table(str(qT, f)), str(qc, f), str(idc, f), str(tc, f),
          str(qtc, f), window = int(w, f))
      case args => bad(
        "graft_snippet_join(run_table, docs_table, queries_table, query_col, doc_id_col, text_col, query_text_col, window)", args)
    }
    reg(spark, "graft_snippet") {
      // search-result snippets: densest query-term window per matching
      // doc — a pure per-row projection, fully lazy
      case Seq(t, id, text, terms, w) =>
        val f = "graft_snippet"
        TextAnalysis.snippetExtract(table(str(t, f)), str(id, f),
          str(text, f),
          queryTerms = str(terms, f).split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          window = int(w, f))
      case args => bad(
        "graft_snippet(table, id_col, text_col, terms_csv, window)", args)
    }
    reg(spark, "graft_mmr") {
      // diversified selection: k sequential greedy rounds, each a tiny
      // action over the bounded candidate view — DEFERRED so EXPLAIN
      // launches no job
      case Seq(t, id, vec, rel, kE, lamE) =>
        val f = "graft_mmr"
        val cand = table(str(t, f))
        val idc = str(id, f); val vc = str(vec, f); val rc = str(rel, f)
        val kk = int(kE, f); val lam = dbl(lamE, f)
        val outSchema = StructType(Seq(
          cand.schema(idc), cand.schema(rc),
          StructField("mmr", org.apache.spark.sql.types.DoubleType),
          StructField("rank", org.apache.spark.sql.types.IntegerType,
            nullable = false)))
        GraftDeferred.frame(spark, outSchema, memo { () =>
          Similarity.mmrSelect(cand, idc, vc, rc, k = kk, lam = lam)
        })
      case args => bad(
        "graft_mmr(candidates_table, id_col, vec_col, rel_col, k, lambda)", args)
    }
    reg(spark, "graft_bm25_prf_join") {
      // batch PRF over stored index frames: round-1 feedback ids +
      // candidate-union + chosen expansions are driver actions —
      // DEFERRED so EXPLAIN launches no job
      case Seq(pT, dT, qT, id, qid, qtx, kE, fbD, fbT) =>
        val f = "graft_bm25_prf_join"
        val post = table(str(pT, f)); val dls = table(str(dT, f))
        val qs = table(str(qT, f))
        val idc = str(id, f); val qidc = str(qid, f); val qtc = str(qtx, f)
        val kk = int(kE, f); val fd = int(fbD, f); val ft = int(fbT, f)
        val outSchema = StructType(Seq(
          qs.schema(qidc), post.schema(idc),
          StructField("bm25", org.apache.spark.sql.types.DoubleType),
          StructField("rank", org.apache.spark.sql.types.IntegerType,
            nullable = false)))
        GraftDeferred.frame(spark, outSchema, memo { () =>
          TextAnalysis.bm25PrfJoin(post, dls, qs, idc, qidc, qtc,
            k = kk, fbDocs = fd, fbTerms = ft)
        })
      case args => bad(
        "graft_bm25_prf_join(postings_table, doclens_table, queries_table, id_col, query_id_col, query_text_col, k, fb_docs, fb_terms)", args)
    }
    reg(spark, "graft_mmr_join") {
      // per-query batch MMR: k shared rounds of bounded joins +
      // query-partitioned argmax windows (checkpoints + the per-group
      // bound guard are actions) — DEFERRED so EXPLAIN launches no job
      case Seq(t, by, id, vec, rel, kE, lamE) =>
        val f = "graft_mmr_join"
        val cand = table(str(t, f))
        val byc = str(by, f); val idc = str(id, f)
        val vc = str(vec, f); val rc = str(rel, f)
        val kk = int(kE, f); val lam = dbl(lamE, f)
        val outSchema = StructType(Seq(
          cand.schema(byc), cand.schema(idc), cand.schema(rc),
          StructField("mmr", org.apache.spark.sql.types.DoubleType),
          StructField("rank", org.apache.spark.sql.types.IntegerType,
            nullable = false)))
        GraftDeferred.frame(spark, outSchema, memo { () =>
          Similarity.mmrSelectBy(cand, byc, idc, vc, rc, k = kk, lam = lam)
        })
      case args => bad(
        "graft_mmr_join(candidates_table, by_col, id_col, vec_col, rel_col, k, lambda)", args)
    }
    reg(spark, "graft_bm25_prf") {
      // query-expansion retrieval: the feedback round + term selection
      // are driver actions — DEFERRED so EXPLAIN launches no job
      case Seq(t, id, text, terms, kE, fbD, fbT) =>
        val f = "graft_bm25_prf"
        val corpus = table(str(t, f))
        val idc = str(id, f); val tc = str(text, f)
        val qts = str(terms, f).split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val kk = int(kE, f); val fd = int(fbD, f); val ft = int(fbT, f)
        val outSchema = StructType(Seq(
          corpus.schema(idc),
          StructField("bm25", org.apache.spark.sql.types.DoubleType)))
        GraftDeferred.frame(spark, outSchema, memo { () =>
          TextAnalysis.bm25Prf(corpus, idc, tc, qts, k = kk,
            fbDocs = fd, fbTerms = ft)
        })
      case args => bad(
        "graft_bm25_prf(table, id_col, text_col, terms_csv, k, fb_docs, fb_terms)", args)
    }
    reg(spark, "graft_crawl_delta") {
      // membership drift between two snapshot tables: fp-classified
      // full-outer counts, fully lazy
      case Seq(ta, tb, id, text) =>
        val f = "graft_crawl_delta"
        TextAnalysis.crawlDelta(table(str(ta, f)), table(str(tb, f)),
          str(id, f), str(text, f))
      case args => bad(
        "graft_crawl_delta(table_a, table_b, id_col, text_col)", args)
    }
    reg(spark, "graft_funnel") {
      // sequential-conversion funnel: bounded step list, per-step
      // user-keyed joins — fully lazy
      case Seq(t, u, ts, ty, stepsCsv, w) =>
        val f = "graft_funnel"
        TimeSeries.funnel(table(str(t, f)), str(u, f), str(ts, f),
          str(ty, f),
          steps = str(stepsCsv, f).split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq,
          windowSeconds = int(w, f).toLong)
      case args => bad(
        "graft_funnel(events_table, user_col, ts_col, type_col, steps_csv, window_seconds)", args)
    }
    reg(spark, "graft_retention") {
      // weekly cohort retention matrix — fully lazy
      case Seq(t, u, ts, mo) =>
        val f = "graft_retention"
        TimeSeries.retention(table(str(t, f)), str(u, f), str(ts, f),
          maxOffsetWeeks = int(mo, f))
      case args => bad(
        "graft_retention(events_table, user_col, ts_col, max_offset_weeks)", args)
    }
    reg(spark, "graft_sessionize") {
      // gap-based batch sessionization — fully lazy, user-partitioned
      // windows only
      case Seq(t, u, ts, o, g) =>
        val f = "graft_sessionize"
        TimeSeries.sessionize(table(str(t, f)), str(u, f), str(ts, f),
          str(o, f), gapSeconds = int(g, f).toLong)
      case args => bad(
        "graft_sessionize(events_table, user_col, ts_col, order_col, gap_seconds)", args)
    }
    reg(spark, "graft_lr_calibration") {
      // reliability-diagram table over a labeled eval set and a stored
      // weight table — fully lazy (disjoint-id refusal in-plan, fires
      // at execution, never at analysis)
      case Seq(pT, nT, id, text, wT, b, nb) =>
        val f = "graft_lr_calibration"
        graft.operators.Classifier.lrCalibrationReport(
          table(str(pT, f)), table(str(nT, f)), str(id, f), str(text, f),
          table(str(wT, f)), buckets = int(b, f), nBins = int(nb, f))
      case args => bad(
        "graft_lr_calibration(pos_table, neg_table, id_col, text_col, weights_table, buckets, n_bins)", args)
    }
    reg(spark, "graft_transitions") {
      // first-order Markov transition table over per-user sequences —
      // fully lazy
      case Seq(t, u, ts, o, ty) =>
        val f = "graft_transitions"
        TimeSeries.transitions(table(str(t, f)), str(u, f), str(ts, f),
          str(o, f), str(ty, f))
      case args => bad(
        "graft_transitions(events_table, user_col, ts_col, order_col, type_col)", args)
    }
    reg(spark, "graft_chunk_bpe") {
      // chunking denominated in LEARNED tokens: training windows are
      // token-ID sequences under the stored merge table
      case Seq(t, id, text, ct, ov, merges) =>
        val f = "graft_chunk_bpe"
        TextAnalysis.chunkBpe(table(str(t, f)), str(id, f), str(text, f),
          table(str(merges, f)), chunkTokens = int(ct, f), overlap = int(ov, f))
      case args => bad(
        "graft_chunk_bpe(table, id_col, text_col, chunk_tokens, overlap, merges_table)", args)
    }
    reg(spark, "graft_sample_k") {
      case Seq(t, key, tie, k, salt) =>
        val f = "graft_sample_k"
        Sampling.exactK(table(str(t, f)), col(str(key, f)), int(k, f),
          tieBreak = Seq(col(str(tie, f))), salt = str(salt, f))
      case args => bad(
        "graft_sample_k(table, key_col, tiebreak_col, k, salt)", args)
    }
    reg(spark, "graft_sample_weighted") {
      case Seq(t, key, w, tie, k, salt) =>
        val f = "graft_sample_weighted"
        Sampling.weightedK(table(str(t, f)), col(str(key, f)),
          col(str(w, f)), int(k, f),
          tieBreak = Seq(col(str(tie, f))), salt = str(salt, f))
      case args => bad(
        "graft_sample_weighted(table, key_col, weight_col, tiebreak_col, k, salt)", args)
    }
    reg(spark, "graft_sample_weighted_by") {
      case Seq(t, strat, key, w, tie, k, salt) =>
        val f = "graft_sample_weighted_by"
        Sampling.weightedKPerStratum(table(str(t, f)), col(str(strat, f)),
          col(str(key, f)), col(str(w, f)), int(k, f),
          tieBreak = Seq(col(str(tie, f))), salt = str(salt, f))
      case args => bad(
        "graft_sample_weighted_by(table, stratum_col, key_col, weight_col, tiebreak_col, k, salt)", args)
    }
    reg(spark, "graft_tfidf") {
      case Seq(t, id, text, k) =>
        val f = "graft_tfidf"
        TextAnalysis.tfidfTopTerms(table(str(t, f)), str(id, f),
          str(text, f), topK = int(k, f))
      case args => bad("graft_tfidf(table, id_col, text_col, top_k)", args)
    }
    reg(spark, "graft_simhash_pairs") {
      case Seq(t, id, text, ham) =>
        val f = "graft_simhash_pairs"
        Dedup.simhashPairs(table(str(t, f)), str(id, f), str(text, f),
          maxHamming = int(ham, f))
      case args => bad(
        "graft_simhash_pairs(table, id_col, text_col, max_hamming)", args)
    }
    reg(spark, "graft_boilerplate") {
      case Seq(t, id, text, n, k) =>
        val f = "graft_boilerplate"
        TextAnalysis.topShinglesByDf(table(str(t, f)), str(id, f),
          str(text, f), n = int(n, f), topK = int(k, f))
      case args => bad(
        "graft_boilerplate(table, id_col, text_col, n, top_k)", args)
    }
    reg(spark, "graft_sentences") {
      case Seq(t, id, text) =>
        val f = "graft_sentences"
        TextAnalysis.sentenceRows(table(str(t, f)), str(id, f), str(text, f))
      case args => bad("graft_sentences(table, id_col, text_col)", args)
    }
    reg(spark, "graft_vocab") {
      case Seq(t, id, text, k) =>
        val f = "graft_vocab"
        TextAnalysis.vocabReport(table(str(t, f)), str(id, f),
          str(text, f), topK = int(k, f))
      case args => bad("graft_vocab(table, id_col, text_col, top_k)", args)
    }
    reg(spark, "graft_split") {
      case Seq(t, key, salt, tr, va, te) =>
        val f = "graft_split"
        Sampling.splitByHash(table(str(t, f)), col(str(key, f)),
          Seq("train" -> int(tr, f), "val" -> int(va, f), "test" -> int(te, f)),
          salt = str(salt, f))
      case args => bad(
        "graft_split(table, key_col, salt, train_bp, val_bp, test_bp)", args)
    }
    reg(spark, "graft_sample_strat") {
      case Seq(t, stratum, key, tie, k, salt) =>
        val f = "graft_sample_strat"
        Sampling.exactKPerStratum(table(str(t, f)), col(str(stratum, f)),
          col(str(key, f)), int(k, f),
          tieBreak = Seq(col(str(tie, f))), salt = str(salt, f))
      case args => bad(
        "graft_sample_strat(table, stratum_col, key_col, tiebreak_col, k, salt)", args)
    }
    reg(spark, "graft_domain_cap") {
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_domain_cap"
        // optional 6th arg: quality column — each domain keeps its k
        // HIGHEST-scoring docs instead of a hash subsample
        val by = if (args.length == 6) Some(col(str(args(5), f))) else None
        Sampling.domainCap(table(str(args(0), f)), col(str(args(1), f)),
          col(str(args(2), f)), int(args(3), f),
          tieBreak = Seq(col(str(args(4), f))), by = by)
      case args => bad(
        "graft_domain_cap(table, domain_col, key_col, k, tiebreak_col[, by_col])", args)
    }
    reg(spark, "graft_cluster_keep") {
      case args if args.length == 4 || args.length == 5 =>
        val f = "graft_cluster_keep"
        val tbl = table(str(args(0), f))
        val id = str(args(1), f); val text = str(args(2), f)
        val thr = dbl(args(3), f)
        val algo = if (args.length == 5) str(args(4), f) else "auto"
        val ids = tbl.select(col(id))
        // connected components is ITERATIVE (one Spark action per
        // round) — it cannot be a lazy plan, so it is DEFERRED: the
        // statement stays a lazy anti-join of the corpus ids against a
        // deferred-scan leaf whose builder (memoized — analyze/copy/
        // re-run share one computation) runs the minhash+CC rounds the
        // first time the statement executes. EXPLAIN launches no job.
        val losers = GraftDeferred.frame(spark,
          StructType(Seq(StructField(id, ids.schema.head.dataType))),
          memo(() => Graph.componentLosers(
            Dedup.minhashPairs(tbl, id, text, threshold = thr),
            idColName = id, algo = algo)))
        ids.join(losers, Seq(id), "left_anti")
      case args => bad(
        "graft_cluster_keep(table, id_col, text_col, threshold[, algo])", args)
    }
    reg(spark, "graft_cluster_best") {
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_cluster_best"
        val tbl = table(str(args(0), f))
        val id = str(args(1), f); val text = str(args(2), f)
        val thr = dbl(args(3), f); val score = str(args(4), f)
        val algo = if (args.length == 6) str(args(5), f) else "auto"
        // same deferred contract as graft_cluster_keep; the winner
        // aggregation (partial-aggregable max_by, no corpus window)
        // lives inside the deferred builder with the CC rounds
        GraftDeferred.frame(spark,
          StructType(Seq(StructField(id,
            tbl.select(col(id)).schema.head.dataType))),
          memo(() => Graph.keepBestRepresentatives(
            tbl.select(col(id), col(score)), id, score,
            Dedup.minhashPairs(tbl, id, text, threshold = thr),
            algo = algo)))
      case args => bad(
        "graft_cluster_best(table, id_col, text_col, threshold, score_col[, algo])", args)
    }
    reg(spark, "graft_decontaminate") {
      case Seq(c, ev, id, text, n) =>
        val f = "graft_decontaminate"
        Dedup.decontaminate(table(str(c, f)), table(str(ev, f)),
          str(id, f), str(text, f), n = int(n, f))
      case args => bad(
        "graft_decontaminate(corpus_table, eval_table, id_col, text_col, n)", args)
    }
    reg(spark, "graft_decontaminate_bloom") {
      case Seq(c, ev, id, text, n, items, bits) =>
        val f = "graft_decontaminate_bloom"
        val corpus = table(str(c, f)); val evalSet = table(str(ev, f))
        val idc = str(id, f); val textc = str(text, f)
        // lng, not int: a production filter's item count / bit width
        // routinely exceeds Int.MaxValue (4 Gbit = 4.3e9 bits)
        val ng = int(n, f); val ei = lng(items, f)
        val nb = lng(bits, f)
        // the bloom build is an ACTION (the sketch bytes inline into the
        // probe filter) — defer it like the cluster/semdedup TVFs so
        // EXPLAIN/prepare launch no job and the build runs once
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, corpus.select(col(idc)).schema.head.dataType),
            StructField("eval_shingles", org.apache.spark.sql.types.LongType,
              nullable = false),
            StructField("contaminated", org.apache.spark.sql.types.BooleanType,
              nullable = false))),
          memo { () =>
            Dedup.decontaminateBloom(corpus, evalSet, idc, textc, n = ng,
              expectedItems = ei, numBits = nb)
          })
      case args => bad(
        "graft_decontaminate_bloom(corpus_table, eval_table, id_col, text_col, n, expected_items, num_bits)", args)
    }
    reg(spark, "graft_decontaminate_stored") {
      case Seq(c, sk, hs, id, text) =>
        val f = "graft_decontaminate_stored"
        val corpus = table(str(c, f))
        val sketch = table(str(sk, f)); val hashes = table(str(hs, f))
        val idc = str(id, f); val textc = str(text, f)
        // reading the 1-row sketch is an ACTION (and the probe inlines
        // its bytes) — defer like graft_decontaminate_bloom so EXPLAIN
        // launches no job and the read happens once
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, corpus.select(col(idc)).schema.head.dataType),
            StructField("eval_shingles", org.apache.spark.sql.types.LongType,
              nullable = false),
            StructField("contaminated", org.apache.spark.sql.types.BooleanType,
              nullable = false))),
          memo { () =>
            Dedup.decontaminateStored(corpus,
              Dedup.DecontamIndex(sketch, hashes), idc, textc)
          })
      case args => bad(
        "graft_decontaminate_stored(corpus_table, sketch_table, hashes_table, id_col, text_col)", args)
    }
    reg(spark, "graft_contamination") {
      case Seq(c, ev, id, text, n, mf) =>
        val f = "graft_contamination"
        Dedup.contaminationFraction(table(str(c, f)), table(str(ev, f)),
          str(id, f), str(text, f), n = int(n, f), minFrac = dbl(mf, f))
      case args => bad(
        "graft_contamination(corpus_table, eval_table, id_col, text_col, n, min_frac)", args)
    }
    reg(spark, "graft_token_budget") {
      // lng, not int: real token budgets (1e9–1e12) exceed Int.MaxValue
      case Seq(t, id, text, b) =>
        val f = "graft_token_budget"
        Sampling.tokenBudget(table(str(t, f)), str(id, f), str(text, f),
          budget = lng(b, f))
      case Seq(t, id, text, b, salt) =>
        val f = "graft_token_budget"
        Sampling.tokenBudget(table(str(t, f)), str(id, f), str(text, f),
          budget = lng(b, f), salt = str(salt, f))
      case args => bad(
        "graft_token_budget(table, id_col, text_col, budget[, salt])", args)
    }
    reg(spark, "graft_token_budget_bpe") {
      // the budget fill denominated in LEARNED tokens: the stored
      // merge table drives the counter (KB-scale collect, the
      // graft_bpe_count boundary); order/hierarchy contract unchanged
      case Seq(t, id, text, b, merges) =>
        val f = "graft_token_budget_bpe"
        Sampling.tokenBudget(table(str(t, f)), str(id, f), str(text, f),
          budget = lng(b, f),
          tokenCounter = TextAnalysis.bpeCounter(table(str(merges, f))))
      case args => bad(
        "graft_token_budget_bpe(table, id_col, text_col, budget, merges_table)", args)
    }
    reg(spark, "graft_token_budget_by") {
      case Seq(t, id, grp, text, b) =>
        val f = "graft_token_budget_by"
        Sampling.tokenBudgetByGroup(table(str(t, f)), str(id, f),
          str(grp, f), str(text, f), budget = lng(b, f))
      case args => bad(
        "graft_token_budget_by(table, id_col, group_col, text_col, budget)", args)
    }
    reg(spark, "graft_rep_ratio") {
      case Seq(t, id, text, n) =>
        val f = "graft_rep_ratio"
        TextAnalysis.repetitionRatio(table(str(t, f)), str(id, f),
          str(text, f), n = int(n, f))
      case args => bad("graft_rep_ratio(table, id_col, text_col, n)", args)
    }
    reg(spark, "graft_resample") {
      case Seq(t, ts, value, unit) =>
        val f = "graft_resample"
        TimeSeries.resample(table(str(t, f)), str(ts, f), str(value, f),
          unit = str(unit, f))
      case args => bad("graft_resample(table, ts_col, value_col, unit)", args)
    }
    reg(spark, "graft_embedding_dups") {
      case Seq(t, id, vec, thr, planes, dim) =>
        val f = "graft_embedding_dups"
        Similarity.embeddingNearDups(table(str(t, f)), str(id, f),
          str(vec, f), simThreshold = dbl(thr, f),
          nPlanes = int(planes, f), dim = int(dim, f))
      case args => bad(
        "graft_embedding_dups(table, id_col, vec_col, threshold, n_planes, dim)", args)
    }

    reg(spark, "graft_temperature_mix") {
      case Seq(t, src, key, a, tf) =>
        val f = "graft_temperature_mix"
        Sampling.temperatureMix(table(str(t, f)), col(str(src, f)),
          col(str(key, f)), alpha = dbl(a, f), targetFraction = dbl(tf, f))
      case args => bad(
        "graft_temperature_mix(table, source_col, key_col, alpha, target_fraction)", args)
    }
    reg(spark, "graft_corpus_report") {
      case Seq(t, src, lang, text) =>
        val f = "graft_corpus_report"
        TextAnalysis.corpusReport(table(str(t, f)), str(src, f),
          str(lang, f), str(text, f))
      case args => bad(
        "graft_corpus_report(table, source_col, lang_col, text_col)", args)
    }
    reg(spark, "graft_c4_filters") {
      case Seq(t, id, text, minW, minK) =>
        val f = "graft_c4_filters"
        TextAnalysis.c4LineFilters(table(str(t, f)), str(id, f), str(text, f),
          minWordsPerLine = int(minW, f), minKeptLines = int(minK, f))
      case args => bad(
        "graft_c4_filters(table, id_col, text_col, min_words_per_line, min_kept_lines)", args)
    }
    reg(spark, "graft_line_dedup") {
      // optional 5th arg 'local' truncates the INPUT chain (both the
      // hash and reassembly branches read it — when the table arg is a
      // view over an expensive TVF pipeline stage, recompute doubles it)
      case args @ Seq(t, id, text, mdf, _*) if args.length <= 5 =>
        val f = "graft_line_dedup"
        val inputReuse = if (args.length == 5) reuseOpt(args(4), f)
          else graft.operators.Reuse.Off
        TextAnalysis.removeRepeatedLines(table(str(t, f)), str(id, f),
          str(text, f), maxDf = int(mdf, f), inputReuse = inputReuse)
      case args => bad(
        "graft_line_dedup(table, id_col, text_col, max_df[, 'local'])", args)
    }
    reg(spark, "graft_span_dedup") {
      case Seq(t, id, text, st, mdf) =>
        val f = "graft_span_dedup"
        TextAnalysis.removeRepeatedSpans(table(str(t, f)), str(id, f),
          str(text, f), spanTokens = int(st, f), maxDf = int(mdf, f))
      case args => bad(
        "graft_span_dedup(table, id_col, text_col, span_tokens, max_df)", args)
    }
    reg(spark, "graft_semdedup") {
      case Seq(t, id, vec, cells, iters, thr) =>
        val f = "graft_semdedup"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val nCells = int(cells, f); val nIters = int(iters, f)
        val threshold = dbl(thr, f)
        // k-means training iterates driver-side (one action per Lloyd
        // round, centroids collected as plan literals) — same deferred
        // contract as graft_cluster_keep so EXPLAIN/re-analysis launch
        // no job and the training runs once, at first execution
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("cell", org.apache.spark.sql.types.LongType, nullable = false))),
          memo { () =>
            val cents = Similarity.centroidsOf(
              Similarity.kmeansTrain(tbl, idc, vecc, nCells, nIters))
            Similarity.semanticDedup(tbl, idc, vecc, cents, threshold)
          })
      case args => bad(
        "graft_semdedup(table, id_col, vec_col, n_cells, iters, threshold)", args)
    }
    reg(spark, "graft_embed_outliers") {
      case Seq(t, id, vec, cells, iters, q) =>
        val f = "graft_embed_outliers"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val nCells = int(cells, f); val nIters = int(iters, f)
        val quant = dbl(q, f)
        // centroid collection (and optional Lloyd training) is an
        // ACTION — same deferred contract as graft_semdedup
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("cell", org.apache.spark.sql.types.LongType,
              nullable = false),
            StructField("centroid_sim", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val cents =
              if (nIters == 0) Similarity.collectCentroids(tbl, idc, vecc, nCells)
              else Similarity.centroidsOf(
                Similarity.kmeansTrain(tbl, idc, vecc, nCells, nIters))
            Similarity.embeddingOutliers(tbl, idc, vecc, cents, quant)
          })
      case args => bad(
        "graft_embed_outliers(table, id_col, vec_col, n_cells, iters, q)", args)
    }
    reg(spark, "graft_ann_topk") {
      // exact brute-force cosine top-k: fully LAZY (the query row is a
      // broadcast inside the plan, no driver action)
      case Seq(t, id, vec, q, k) =>
        val f = "graft_ann_topk"
        Similarity.bruteForceTopK(table(str(t, f)), str(id, f), str(vec, f),
          queryId = lng(q, f), k = int(k, f))
      case args => bad(
        "graft_ann_topk(table, id_col, vec_col, query_id, k)", args)
    }
    reg(spark, "graft_ann_lsh") {
      // multi-probe hyperplane LSH top-k: planes are pure Scala
      // constants, the bucket filter a broadcast join — fully LAZY
      case Seq(t, id, vec, q, k, planes, dim) =>
        val f = "graft_ann_lsh"
        Similarity.lshTopK(table(str(t, f)), str(id, f), str(vec, f),
          queryId = lng(q, f), k = int(k, f),
          nPlanes = int(planes, f), dim = int(dim, f))
      case args => bad(
        "graft_ann_lsh(table, id_col, vec_col, query_id, k, n_planes, dim)", args)
    }
    reg(spark, "graft_ann_ivf") {
      // seed-centroid IVF: collectCentroids is an ACTION — deferred
      // like every training TVF
      case Seq(t, id, vec, q, k, cells, probes) =>
        val f = "graft_ann_ivf"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f)
        val nCells = int(cells, f); val np = int(probes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("cos_sim", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.ivfTopKWith(tbl, idc, vecc,
              Similarity.collectCentroids(tbl, idc, vecc, nCells),
              qid, kk, np)
          })
      case args => bad(
        "graft_ann_ivf(table, id_col, vec_col, query_id, k, n_cells, probes)", args)
    }
    reg(spark, "graft_bpe_count") {
      // trained-tokenizer counts under a stored merge table; the
      // merge-table collect is driver-side but vocabulary-sized (KB) —
      // registered directly like the other pure per-row counters
      case args if args.length == 4 || args.length == 5 =>
        val f = "graft_bpe_count"
        val pt = if (args.length == 5) pretokOpt(args(4), f) else false
        TextAnalysis.bpeCount(table(str(args(0), f)), str(args(1), f),
          str(args(2), f), table(str(args(3), f)), preTokenize = pt)
      case args => bad(
        "graft_bpe_count(table, id_col, text_col, merges_table[, 'pretok'])", args)
    }
    reg(spark, "graft_bpe_vocab") {
      // learned-token vocabulary report under a stored merge table;
      // same KB-scale merge-table collect as the other BPE serving TVFs
      case Seq(t, id, text, merges, k) =>
        val f = "graft_bpe_vocab"
        TextAnalysis.bpeVocabReport(table(str(t, f)), str(id, f),
          str(text, f), table(str(merges, f)), topK = int(k, f))
      case args => bad(
        "graft_bpe_vocab(table, id_col, text_col, merges_table, top_k)", args)
    }
    reg(spark, "graft_bpe_tokenize") {
      // tokenize-to-ids under a stored merge table — the sequence the
      // count TVF only measures; same KB-scale merge-table collect
      case args if args.length == 4 || args.length == 5 =>
        val f = "graft_bpe_tokenize"
        val pt = if (args.length == 5) pretokOpt(args(4), f) else false
        TextAnalysis.bpeTokenize(table(str(args(0), f)), str(args(1), f),
          str(args(2), f), table(str(args(3), f)), preTokenize = pt)
      case args => bad(
        "graft_bpe_tokenize(table, id_col, text_col, merges_table[, 'pretok'])", args)
    }
    reg(spark, "graft_ann_sq") {
      // int8 scalar-quantized serving: the query-vector lookup is an
      // ACTION — deferred like graft_ann_stored
      case Seq(t, id, vec, q, k) =>
        val f = "graft_ann_sq"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("sq_score", org.apache.spark.sql.types.DoubleType))),
          memo { () => Similarity.sqTopK(tbl, idc, vecc, qid, kk) })
      case args => bad(
        "graft_ann_sq(table, id_col, vec_col, query_id, k)", args)
    }
    reg(spark, "graft_ann_ivf_sq") {
      // IVF×SQ: centroid collection + query-vector lookup are ACTIONS —
      // deferred like graft_ann_ivf
      case Seq(t, id, vec, q, k, cells, probes) =>
        val f = "graft_ann_ivf_sq"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f)
        val nCells = int(cells, f); val np = int(probes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("sq_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.ivfSqTopK(tbl, idc, vecc,
              Similarity.collectCentroids(tbl, idc, vecc, nCells),
              qid, kk, np)
          })
      case args => bad(
        "graft_ann_ivf_sq(table, id_col, vec_col, query_id, k, n_cells, probes)", args)
    }
    reg(spark, "graft_ann_sq_stored") {
      // SQ serving from the STORED (id, scale, q) codes table; the
      // query-vector lookup is an ACTION — deferred like graft_ann_stored
      case Seq(codesT, embT, id, vec, q, k) =>
        val f = "graft_ann_sq_stored"
        val codes = table(str(codesT, f)); val emb = table(str(embT, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, codes.select(col(idc)).schema.head.dataType),
            StructField("sq_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.sqTopKStored(codes, idc,
              Similarity.queryVecOf(emb, idc, vecc, qid),
              k = kk, excludeId = Some(qid))
          })
      case args => bad(
        "graft_ann_sq_stored(codes_table, emb_table, id_col, vec_col, query_id, k)", args)
    }
    reg(spark, "graft_ann_ivf_sq_stored") {
      // IVF×SQ serving from stored artifacts (cell-partitioned codes +
      // the cells table): centroid reconstruction and the query-vector
      // lookup are ACTIONS — deferred; the driver-literal probe-cell
      // filter keeps static partition pruning
      case Seq(codesT, cellsT, embT, id, vec, q, k, probes) =>
        val f = "graft_ann_ivf_sq_stored"
        val codes = table(str(codesT, f)); val cells = table(str(cellsT, f))
        val emb = table(str(embT, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f); val np = int(probes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, codes.select(col(idc)).schema.head.dataType),
            StructField("sq_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.ivfSqTopKStored(codes, idc,
              Similarity.centroidsFromDf(cells),
              Similarity.queryVecOf(emb, idc, vecc, qid),
              k = kk, probes = np, excludeId = Some(qid))
          })
      case args => bad(
        "graft_ann_ivf_sq_stored(codes_table, cells_table, emb_table, id_col, vec_col, query_id, k, probes)", args)
    }
    reg(spark, "graft_ann_recall") {
      // recall attestation: centroid collection is an ACTION — deferred
      // like the other index TVFs
      case Seq(qt, ct, qid, cid, qvec, cvec, k, cells, probes) =>
        val f = "graft_ann_recall"
        val queries = table(str(qt, f)); val corpus = table(str(ct, f))
        val qidc = str(qid, f); val cidc = str(cid, f)
        val qvecc = str(qvec, f); val cvecc = str(cvec, f)
        val kk = int(k, f); val nCells = int(cells, f); val np = int(probes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("query_id",
              queries.select(col(qidc)).schema.head.dataType),
            StructField("n_exact", org.apache.spark.sql.types.LongType),
            StructField("n_hit", org.apache.spark.sql.types.LongType),
            StructField("recall_at_k", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.annRecallReport(queries, corpus, qidc, cidc,
              qvecc, cvecc,
              Similarity.collectCentroids(corpus, cidc, cvecc, nCells),
              k = kk, probes = np)
          })
      case args => bad(
        "graft_ann_recall(queries_table, corpus_table, q_id_col, c_id_col, q_vec_col, c_vec_col, k, n_cells, probes)", args)
    }
    reg(spark, "graft_bpe_train") {
      // BPE merge-table training is an ACTION (one distributed corpus
      // pass, then the driver-side merge rounds — bpeTrainLocal, the
      // production-vocab engine, bit-equal to the distributed oracle
      // form) — deferred like the cluster/training TVFs; EXPLAIN
      // launches no job, the rounds run once on execute
      case args if args.length == 4 || args.length == 5 =>
        val f = "graft_bpe_train"
        val tbl = table(str(args(0), f))
        val idc = str(args(1), f); val textc = str(args(2), f)
        val nm = int(args(3), f)
        val pt = if (args.length == 5) pretokOpt(args(4), f) else false
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("rank", org.apache.spark.sql.types.IntegerType,
              nullable = false),
            StructField("left", org.apache.spark.sql.types.StringType),
            StructField("right", org.apache.spark.sql.types.StringType))),
          memo { () => TextAnalysis.bpeTrainLocal(tbl, idc, textc, nm,
            preTokenize = pt) })
      case args => bad(
        "graft_bpe_train(table, id_col, text_col, n_merges[, 'pretok'])", args)
    }
    reg(spark, "graft_unigram_train") {
      // unigram-LM (SentencePiece-style) tokenizer training is an
      // ACTION (one distributed word-frequency pass, then driver-side
      // hard-EM + prune rounds) — deferred like graft_bpe_train
      case Seq(t, id, text, vs, nr, mpl, ss) =>
        val f = "graft_unigram_train"
        val tbl = table(str(t, f))
        val idc = str(id, f); val textc = str(text, f)
        val (v, n, m, sd) = (int(vs, f), int(nr, f), int(mpl, f), int(ss, f))
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("token_id", org.apache.spark.sql.types.IntegerType),
            StructField("piece", org.apache.spark.sql.types.StringType),
            StructField("cnt", org.apache.spark.sql.types.LongType),
            StructField("logp", org.apache.spark.sql.types.DoubleType))),
          memo { () => TextAnalysis.unigramTokTrain(tbl, idc, textc,
            vocabSize = v, nRounds = n, maxPieceLen = m, seedSize = sd) })
      case args => bad(
        "graft_unigram_train(table, id_col, text_col, vocab_size, n_rounds, max_piece_len, seed_size)", args)
    }
    reg(spark, "graft_unigram_tokenize") {
      // Viterbi tokenize under a stored piece table: the vocab-scale
      // table collect is an ACTION, so the build is deferred — EXPLAIN
      // / CREATE VIEW launch no job (the Reuse.LocalDeferred lesson)
      case Seq(t, id, text, pT) =>
        val f = "graft_unigram_tokenize"
        val tbl = table(str(t, f))
        val idc = str(id, f); val textc = str(text, f)
        val pieces = table(str(pT, f))
        GraftDeferred.frame(spark,
          StructType(Seq(
            tbl.schema(idc),
            StructField("pos", org.apache.spark.sql.types.IntegerType),
            StructField("token", org.apache.spark.sql.types.StringType),
            StructField("token_id", org.apache.spark.sql.types.IntegerType))),
          memo { () =>
            TextAnalysis.unigramTokenize(tbl, idc, textc, pieces) })
      case args => bad(
        "graft_unigram_tokenize(table, id_col, text_col, pieces_table)", args)
    }
    reg(spark, "graft_image_dups") {
      // perceptual dHash near-dup over a media table — pure lazy
      // transformation (no training action), registered directly;
      // optional 6th arg = the hot-bucket cap (max_bucket_size)
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_image_dups"
        val cap = if (args.length == 6) Some(int(args(5), f)) else None
        Multimodal.imageNearDups(table(str(args(0), f)), str(args(1), f),
          str(args(2), f), int(args(3), f), int(args(4), f), cap)
      case args => bad(
        "graft_image_dups(table, id_col, payload_col, max_hamming, n_bands[, max_bucket_size])", args)
    }
    reg(spark, "graft_image_probe") {
      // incremental perceptual admission: new media vs a STORED dhash
      // frame — pure lazy transformation, stream-safe probe; optional
      // 7th arg = the corpus-side hot-bucket cap (max_bucket_size)
      case args if args.length == 6 || args.length == 7 =>
        val f = "graft_image_probe"
        val cap = if (args.length == 7) Some(int(args(6), f)) else None
        Multimodal.imageNearDupsBetween(table(str(args(0), f)),
          table(str(args(1), f)), str(args(2), f), str(args(3), f),
          int(args(4), f), int(args(5), f), cap)
      case args => bad(
        "graft_image_probe(media_table, hashes_table, id_col, payload_col, max_hamming, n_bands[, max_bucket_size])", args)
    }
    reg(spark, "graft_latency_trend") {
      // the SLO trend-store maintenance verb from SQL: append the
      // report view to the run_seq-stamped store, return the per-
      // surface delta frame — an ACTION (store append), deferred like
      // graft_store_compact. NOT idempotent under re-execution
      // (ADVICE r13): the memo is per builder invocation (one
      // statement's plan tree), so each EXECUTED statement over a
      // downstream view re-invokes the builder and appends ONE more
      // run_seq round — by design (a trend store records every run);
      // callers wanting exactly-one append per report must execute the
      // TVF statement once and read the result back from the store
      case Seq(rT, pathE) =>
        val f = "graft_latency_trend"
        val rep = table(str(rT, f))
        val path = str(pathE, f)
        GraftDeferred.frame(spark, StructType(Seq(
          StructField("surface", org.apache.spark.sql.types.StringType),
          StructField("run_seq", org.apache.spark.sql.types.LongType),
          StructField("p50_ms", org.apache.spark.sql.types.DoubleType),
          StructField("p95_ms", org.apache.spark.sql.types.DoubleType),
          StructField("prev_p50_ms", org.apache.spark.sql.types.DoubleType),
          StructField("prev_p95_ms", org.apache.spark.sql.types.DoubleType),
          StructField("delta_p50_pct", org.apache.spark.sql.types.DoubleType),
          StructField("delta_p95_pct", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            graft.operators.ServingLatency.latencyTrend(rep, path) })
      case args => bad(
        "graft_latency_trend(report_table, store_path)", args)
    }
    reg(spark, "graft_audio_fp") {
      // the audio modality's fingerprint frame (Haitsma-Kalker
      // energy-difference bits over the stub energy grid) — pure lazy
      // zero-shuffle projection
      case Seq(t, id, pay) =>
        val f = "graft_audio_fp"
        Multimodal.audioFp(table(str(t, f)), str(id, f), str(pay, f))
      case args => bad(
        "graft_audio_fp(table, id_col, payload_col)", args)
    }
    reg(spark, "graft_audio_dups") {
      // audio near-dup pairs over a media table — graft_image_dups'
      // shape on the audio fingerprint; optional cap arg
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_audio_dups"
        val cap = if (args.length == 6) Some(int(args(5), f)) else None
        Multimodal.audioNearDups(table(str(args(0), f)), str(args(1), f),
          str(args(2), f), int(args(3), f), int(args(4), f), cap)
      case args => bad(
        "graft_audio_dups(table, id_col, payload_col, max_hamming, n_bands[, max_bucket_size])", args)
    }
    reg(spark, "graft_audio_probe") {
      // incremental audio admission vs a STORED afp frame — pure lazy,
      // stream-safe probe; optional corpus-side cap
      case args if args.length == 6 || args.length == 7 =>
        val f = "graft_audio_probe"
        val cap = if (args.length == 7) Some(int(args(6), f)) else None
        Multimodal.audioNearDupsBetween(table(str(args(0), f)),
          table(str(args(1), f)), str(args(2), f), str(args(3), f),
          int(args(4), f), int(args(5), f), cap)
      case args => bad(
        "graft_audio_probe(media_table, fps_table, id_col, payload_col, max_hamming, n_bands[, max_bucket_size])", args)
    }
    reg(spark, "graft_video_frames") {
      // the video modality's frame table: stub frame-sample + fused
      // per-frame dHash — pure lazy zero-shuffle projection
      case Seq(t, id, pay, nf) =>
        val f = "graft_video_frames"
        Multimodal.videoFrames(table(str(t, f)), str(id, f), str(pay, f),
          int(nf, f))
      case args => bad(
        "graft_video_frames(table, id_col, payload_col, n_frames)", args)
    }
    reg(spark, "graft_video_dups") {
      // video near-dup pairs: frame-aligned banded candidates, exact
      // hamming, matched-frame count >= min_frames; optional cap
      case args if args.length == 7 || args.length == 8 =>
        val f = "graft_video_dups"
        val cap = if (args.length == 8) Some(int(args(7), f)) else None
        Multimodal.videoNearDups(table(str(args(0), f)), str(args(1), f),
          str(args(2), f), int(args(3), f), int(args(4), f),
          int(args(5), f), int(args(6), f), cap)
      case args => bad(
        "graft_video_dups(table, id_col, payload_col, n_frames, max_hamming, n_bands, min_frames[, max_bucket_size])", args)
    }
    reg(spark, "graft_video_probe") {
      // incremental video admission vs a STORED frame table — the
      // matched-frame count gates admission; optional corpus-side cap
      case args if args.length == 8 || args.length == 9 =>
        val f = "graft_video_probe"
        val cap = if (args.length == 9) Some(int(args(8), f)) else None
        Multimodal.videoNearDupsBetween(table(str(args(0), f)),
          table(str(args(1), f)), str(args(2), f), str(args(3), f),
          int(args(4), f), int(args(5), f), int(args(6), f),
          int(args(7), f), cap)
      case args => bad(
        "graft_video_probe(media_table, frames_table, id_col, payload_col, n_frames, max_hamming, n_bands, min_frames[, max_bucket_size])", args)
    }
    reg(spark, "graft_image_clusters") {
      // perceptual near-dup CLUSTERS: the banded dHash pair set closed
      // into connected components. Large-Star/Small-Star CC is
      // ITERATIVE (one Spark action per round) — deferred like
      // graft_cluster_keep so EXPLAIN/prepare launch no job and the
      // rounds run once per statement
      case Seq(t, id, payload, maxHam, bands) =>
        val f = "graft_image_clusters"
        val tbl = table(str(t, f))
        val idc = str(id, f); val pc = str(payload, f)
        val mh = int(maxHam, f); val nb = int(bands, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("node", org.apache.spark.sql.types.LongType),
            StructField("component", org.apache.spark.sql.types.LongType))),
          memo { () =>
            Graph.connectedComponentsStar(
              Multimodal.imageNearDups(tbl, idc, pc, mh, nb),
              "id_a", "id_b")
          })
      case args => bad(
        "graft_image_clusters(table, id_col, payload_col, max_hamming, n_bands)", args)
    }
    reg(spark, "graft_distinct_ngrams") {
      case Seq(t, id, text) =>
        val f = "graft_distinct_ngrams"
        TextAnalysis.distinctNgramReport(table(str(t, f)), str(id, f),
          str(text, f))
      case args => bad(
        "graft_distinct_ngrams(table, id_col, text_col)", args)
    }
    reg(spark, "graft_cms_heavy_hitters") {
      // the sketch build + probe are ACTIONS — deferred like the bloom
      // and training TVFs
      case Seq(t, id, text, k, eps, conf) =>
        val f = "graft_cms_heavy_hitters"
        val tbl = table(str(t, f))
        val idc = str(id, f); val textc = str(text, f)
        val kk = int(k, f); val e = dbl(eps, f); val c = dbl(conf, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("token", org.apache.spark.sql.types.StringType),
            StructField("n_occurrences", org.apache.spark.sql.types.LongType,
              nullable = false),
            StructField("within_contract",
              org.apache.spark.sql.types.BooleanType, nullable = false))),
          memo { () =>
            TextAnalysis.heavyHittersCms(tbl, idc, textc, kk, e, c)
          })
      case args => bad(
        "graft_cms_heavy_hitters(table, id_col, text_col, top_k, eps, confidence)", args)
    }
    reg(spark, "graft_sentence_filter") {
      // fully lazy: the 1-row quantile threshold is an in-plan aggregate
      case args @ Seq(t, id, text, q, _*) if args.length <= 5 =>
        val f = "graft_sentence_filter"
        val acc = if (args.length == 5) Some(int(args(4), f)).filter(_ > 0) else None
        TextAnalysis.filterSentencesByLm(table(str(t, f)), str(id, f),
          str(text, f), q = dbl(q, f), accuracy = acc)
      case args => bad(
        "graft_sentence_filter(table, id_col, text_col, q[, accuracy_or_0])", args)
    }
    reg(spark, "graft_ann_stored") {
      // IVF-PQ serving from stored artifacts: the centroid/codebook
      // reconstruction collects KB-scale tables — deferred like the
      // other index TVFs; the query vector is read from `emb_table` by
      // id (the serving coordinator's lookup)
      case Seq(codesT, cellsT, cbT, embT, id, vec, q, k, probes) =>
        val f = "graft_ann_stored"
        val codes = table(str(codesT, f)); val cells = table(str(cellsT, f))
        val cb = table(str(cbT, f)); val emb = table(str(embT, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f); val np = int(probes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, codes.select(col(idc)).schema.head.dataType),
            StructField("adc_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val books = Similarity.codebooksFromDf(cb)
            require(books.nonEmpty && books.head.nonEmpty,
              s"$f: empty codebook table")
            // subDim is carried by the stored artifact itself — each
            // codebook entry's element count — so it cannot drift
            Similarity.ivfPqTopKStored(codes, idc,
              Similarity.centroidsFromDf(cells), books,
              subDim = books.head.head._2.length,
              Similarity.queryVecOf(emb, idc, vecc, qid),
              k = kk, probes = np, excludeId = Some(qid))
          })
      case args => bad(
        "graft_ann_stored(codes_table, cells_table, codebooks_table, emb_table, id_col, vec_col, query_id, k, probes)", args)
    }
    reg(spark, "graft_knn_join") {
      // exact kNN join: fully LAZY (queries broadcast inside the plan,
      // no driver action)
      case Seq(qt, ct, qid, cid, qvec, cvec, k, excl) =>
        val f = "graft_knn_join"
        Similarity.knnJoin(table(str(qt, f)), table(str(ct, f)),
          str(qid, f), str(cid, f), str(qvec, f), str(cvec, f),
          k = int(k, f), excludeSelf = int(excl, f) != 0)
      case args => bad(
        "graft_knn_join(queries_table, corpus_table, q_id_col, c_id_col, q_vec_col, c_vec_col, k, exclude_self)", args)
    }
    reg(spark, "graft_knn_join_ivf") {
      // seed-centroid IVF-pruned kNN join: collectCentroids is an
      // ACTION — deferred like every training TVF
      case Seq(qt, ct, qid, cid, qvec, cvec, cells, probes, k, excl) =>
        val f = "graft_knn_join_ivf"
        val queries = table(str(qt, f)); val corpus = table(str(ct, f))
        val qidc = str(qid, f); val cidc = str(cid, f)
        val qvecc = str(qvec, f); val cvecc = str(cvec, f)
        val nCells = int(cells, f); val np = int(probes, f)
        val kk = int(k, f); val ex = int(excl, f) != 0
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("query_id",
              queries.select(col(qidc)).schema.head.dataType),
            StructField("neighbor_id",
              corpus.select(col(cidc)).schema.head.dataType),
            StructField("cos_sim", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.ivfKnnJoin(queries, corpus, qidc, cidc, qvecc, cvecc,
              Similarity.collectCentroids(corpus, cidc, cvecc, nCells),
              k = kk, probes = np, excludeSelf = ex)
          })
      case args => bad(
        "graft_knn_join_ivf(queries_table, corpus_table, q_id_col, c_id_col, q_vec_col, c_vec_col, n_cells, probes, k, exclude_self)", args)
    }
    reg(spark, "graft_knn_join_stored") {
      // batch serving from the stored index: centroid/codebook
      // reconstruction collects KB-scale tables — deferred like
      // graft_ann_stored; subDim comes from the stored codebook itself
      case Seq(codesT, cellsT, cbT, qt, qid, cid, qvec, k, probes, excl) =>
        val f = "graft_knn_join_stored"
        val codes = table(str(codesT, f)); val cells = table(str(cellsT, f))
        val cb = table(str(cbT, f)); val queries = table(str(qt, f))
        val qidc = str(qid, f); val cidc = str(cid, f)
        val qvecc = str(qvec, f); val kk = int(k, f)
        val np = int(probes, f); val ex = int(excl, f) != 0
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("query_id",
              queries.select(col(qidc)).schema.head.dataType),
            StructField("neighbor_id",
              codes.select(col(cidc)).schema.head.dataType),
            StructField("adc_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val books = Similarity.codebooksFromDf(cb)
            require(books.nonEmpty && books.head.nonEmpty,
              s"$f: empty codebook table")
            Similarity.ivfPqKnnJoinStored(queries, codes, qidc, cidc, qvecc,
              Similarity.centroidsFromDf(cells), books,
              subDim = books.head.head._2.length,
              k = kk, probes = np, excludeSelf = ex)
          })
      case args => bad(
        "graft_knn_join_stored(codes_table, cells_table, codebooks_table, queries_table, q_id_col, c_id_col, q_vec_col, k, probes, exclude_self)", args)
    }
    reg(spark, "graft_knn_join_pruned") {
      // batch serving with STATIC probe-cell pruning: the query batch's
      // distinct probe-cell union (≤ nCells values at any |Q|) pushes
      // into the codes read as a literal filter — on a partitionBy(cell)
      // store the whole batch becomes static partition pruning. The
      // cell-union collect is an ACTION — deferred like graft_ann_stored
      case Seq(codesT, cellsT, cbT, qt, qid, cid, qvec, k, probes, excl) =>
        val f = "graft_knn_join_pruned"
        val codes = table(str(codesT, f)); val cells = table(str(cellsT, f))
        val cb = table(str(cbT, f)); val queries = table(str(qt, f))
        val qidc = str(qid, f); val cidc = str(cid, f)
        val qvecc = str(qvec, f); val kk = int(k, f)
        val np = int(probes, f); val ex = int(excl, f) != 0
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("query_id",
              queries.select(col(qidc)).schema.head.dataType),
            StructField("neighbor_id",
              codes.select(col(cidc)).schema.head.dataType),
            StructField("adc_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val books = Similarity.codebooksFromDf(cb)
            require(books.nonEmpty && books.head.nonEmpty,
              s"$f: empty codebook table")
            Similarity.ivfPqKnnJoinStoredPruned(queries, codes, qidc, cidc,
              qvecc, Similarity.centroidsFromDf(cells), books,
              subDim = books.head.head._2.length,
              k = kk, probes = np, excludeSelf = ex)
          })
      case args => bad(
        "graft_knn_join_pruned(codes_table, cells_table, codebooks_table, queries_table, q_id_col, c_id_col, q_vec_col, k, probes, exclude_self)", args)
    }
    reg(spark, "graft_ann_residual_stored") {
      // RESIDUAL IVF-PQ serving from stored artifacts — graft_ann_stored
      // over residual-trained codebooks (the per-probed-cell q·centroid
      // constant plus the residual LUT sum). Same deferred contract;
      // subDim comes from the stored codebook itself
      case Seq(codesT, cellsT, cbT, embT, id, vec, q, k, probes) =>
        val f = "graft_ann_residual_stored"
        val codes = table(str(codesT, f)); val cells = table(str(cellsT, f))
        val cb = table(str(cbT, f)); val emb = table(str(embT, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f); val np = int(probes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, codes.select(col(idc)).schema.head.dataType),
            StructField("adc_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val books = Similarity.codebooksFromDf(cb)
            require(books.nonEmpty && books.head.nonEmpty,
              s"$f: empty codebook table")
            Similarity.ivfPqTopKResidualStored(codes, idc,
              Similarity.centroidsFromDf(cells), books,
              subDim = books.head.head._2.length,
              Similarity.queryVecOf(emb, idc, vecc, qid),
              k = kk, probes = np, excludeId = Some(qid))
          })
      case args => bad(
        "graft_ann_residual_stored(codes_table, cells_table, codebooks_table, emb_table, id_col, vec_col, query_id, k, probes)", args)
    }
    reg(spark, "graft_ann_rerank") {
      // two-stage retrieval: ADC proposes cand_c, exact cosine re-ranks
      // only those — codebook collection + query LUT are ACTIONS, deferred
      case Seq(t, id, vec, q, k, cells, probes, m, subDim, nCodes, candC) =>
        val f = "graft_ann_rerank"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f)
        val nCells = int(cells, f); val np = int(probes, f)
        val mm = int(m, f); val sd = int(subDim, f); val nc = int(nCodes, f)
        val cc = int(candC, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("cos_sim", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.ivfPqTopKRerank(tbl, idc, vecc,
              Similarity.collectCentroids(tbl, idc, vecc, nCells),
              Similarity.pqCodebooks(tbl, idc, vecc, mm, sd, nc),
              sd, qid, kk, np, cc)
          })
      case args => bad(
        "graft_ann_rerank(table, id_col, vec_col, query_id, k, n_cells, probes, m, sub_dim, n_codes, cand_c)", args)
    }
    reg(spark, "graft_knn_join_rerank") {
      // batch two-stage retrieval from the stored codes: ADC proposes
      // cand_c per query, exact cosine re-ranks — deferred like
      // graft_knn_join_stored
      case Seq(codesT, cellsT, cbT, qt, ct, qid, cid, qvec, cvec, k,
               probes, candC, excl) =>
        val f = "graft_knn_join_rerank"
        val codes = table(str(codesT, f)); val cells = table(str(cellsT, f))
        val cb = table(str(cbT, f)); val queries = table(str(qt, f))
        val corpusVec = table(str(ct, f))
        val qidc = str(qid, f); val cidc = str(cid, f)
        val qvecc = str(qvec, f); val cvecc = str(cvec, f)
        val kk = int(k, f); val np = int(probes, f)
        val cc = int(candC, f); val ex = int(excl, f) != 0
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField("query_id",
              queries.select(col(qidc)).schema.head.dataType),
            StructField("neighbor_id",
              corpusVec.select(col(cidc)).schema.head.dataType),
            StructField("cos_sim", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val books = Similarity.codebooksFromDf(cb)
            require(books.nonEmpty && books.head.nonEmpty,
              s"$f: empty codebook table")
            Similarity.ivfPqKnnJoinStoredRerank(queries, codes, corpusVec,
              qidc, cidc, qvecc, cvecc,
              Similarity.centroidsFromDf(cells), books,
              subDim = books.head.head._2.length,
              k = kk, probes = np, candC = cc, excludeSelf = ex)
          })
      case args => bad(
        "graft_knn_join_rerank(codes_table, cells_table, codebooks_table, queries_table, corpus_table, q_id_col, c_id_col, q_vec_col, c_vec_col, k, probes, cand_c, exclude_self)", args)
    }
    reg(spark, "graft_quality_classifier") {
      // LR quality filter: training collects per-iteration gradients —
      // deferred like every training TVF
      case Seq(posT, negT, scoreT, id, text, buckets, iters) =>
        val f = "graft_quality_classifier"
        val pos = table(str(posT, f)); val neg = table(str(negT, f))
        val score = table(str(scoreT, f))
        val idc = str(id, f); val textc = str(text, f)
        val nb = int(buckets, f); val ni = int(iters, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, score.select(col(idc)).schema.head.dataType),
            StructField("z", org.apache.spark.sql.types.DoubleType),
            StructField("quality_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val w = graft.operators.Classifier.lrTrain(pos, neg, idc, textc,
              buckets = nb, iters = ni)
            graft.operators.Classifier.lrScore(score, idc, textc,
              graft.operators.Classifier.weightsToDf(spark, w), buckets = nb)
          })
      case args => bad(
        "graft_quality_classifier(pos_table, neg_table, score_table, id_col, text_col, buckets, iters)", args)
    }
    reg(spark, "graft_lr_score") {
      // serve a STORED weight table (train once with
      // graft_quality_classifier / Classifier.lrTrain, score every
      // ingestion run from the read-back frame): fully LAZY — the
      // weight frame broadcasts inside the plan, no driver action
      case Seq(wT, t, id, text, buckets) =>
        val f = "graft_lr_score"
        graft.operators.Classifier.lrScore(table(str(t, f)), str(id, f),
          str(text, f), table(str(wT, f)), int(buckets, f))
      case args => bad(
        "graft_lr_score(weights_table, table, id_col, text_col, buckets)", args)
    }
    reg(spark, "graft_lr_eval") {
      // the eval panel over a STORED weight table: fully LAZY like
      // graft_lr_score (broadcast weights, threshold explode, counts);
      // the disjoint-id refusal is IN-PLAN (raise_error at execution),
      // so CREATE VIEW / EXPLAIN / prepare launch no job
      case Seq(wT, posT, negT, id, text, buckets) =>
        val f = "graft_lr_eval"
        graft.operators.Classifier.lrEvalReport(table(str(posT, f)),
          table(str(negT, f)), str(id, f), str(text, f),
          table(str(wT, f)), buckets = int(buckets, f))
      case args => bad(
        "graft_lr_eval(weights_table, pos_table, neg_table, id_col, text_col, buckets)", args)
    }
    reg(spark, "graft_domain_report") {
      // fully LAZY: the corpus total is a broadcast 1-row aggregate
      case Seq(t, url, k) =>
        val f = "graft_domain_report"
        TextAnalysis.domainReport(table(str(t, f)), str(url, f),
          topK = int(k, f))
      case args => bad(
        "graft_domain_report(table, url_col, top_k)", args)
    }
    reg(spark, "graft_url_filter") {
      // URL/domain admission: fully LAZY (the blocklist broadcasts
      // inside the plan, no driver action)
      case Seq(t, id, url, bl) =>
        val f = "graft_url_filter"
        TextAnalysis.urlFilter(table(str(t, f)), str(id, f), str(url, f),
          table(str(bl, f)))
      case args => bad(
        "graft_url_filter(table, id_col, url_col, blocklist_table)", args)
    }
    reg(spark, "graft_ann_pq") {
      // PQ/ADC: codebook collection + the query LUT build are ACTIONS —
      // deferred
      case Seq(t, id, vec, q, k, m, subDim, nCodes) =>
        val f = "graft_ann_pq"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f)
        val mm = int(m, f); val sd = int(subDim, f); val nc = int(nCodes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("adc_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Similarity.pqTopK(tbl, idc, vecc,
              Similarity.pqCodebooks(tbl, idc, vecc, mm, sd, nc),
              sd, qid, kk)
          })
      case args => bad(
        "graft_ann_pq(table, id_col, vec_col, query_id, k, m, sub_dim, n_codes)", args)
    }
    reg(spark, "graft_ann_ivf_pq_residual") {
      // residual IVF-PQ (the full published recipe): centroid
      // collection + residual codebook training + the probe-cell /
      // cell-constant builds are ACTIONS — deferred
      case Seq(t, id, vec, q, k, cells, probes, m, subDim, nCodes) =>
        val f = "graft_ann_ivf_pq_residual"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val qid = lng(q, f); val kk = int(k, f)
        val nCells = int(cells, f); val np = int(probes, f)
        val mm = int(m, f); val sd = int(subDim, f); val nc = int(nCodes, f)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("adc_score", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            val cents = Similarity.collectCentroids(tbl, idc, vecc, nCells)
            Similarity.ivfPqTopKResidual(tbl, idc, vecc, cents,
              Similarity.pqCodebooksResidual(tbl, idc, vecc, cents,
                mm, sd, nc),
              sd, qid, kk, np)
          })
      case args => bad(
        "graft_ann_ivf_pq_residual(table, id_col, vec_col, query_id, k, " +
          "n_cells, probes, m, sub_dim, n_codes)", args)
    }
    reg(spark, "graft_cluster_sample") {
      case Seq(t, id, vec, cells, iters, k, salt) =>
        val f = "graft_cluster_sample"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vecc = str(vec, f)
        val nCells = int(cells, f); val nIters = int(iters, f)
        val kk = int(k, f); val sl = str(salt, f)
        // same deferred contract as graft_semdedup: the Lloyd rounds
        // are driver actions and must not run at analysis time
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField("cell", org.apache.spark.sql.types.LongType, nullable = false))),
          memo { () =>
            val cents = Similarity.centroidsOf(
              Similarity.kmeansTrain(tbl, idc, vecc, nCells, nIters))
            val assigned = tbl.select(col(idc), col(vecc),
              Similarity.cellOf(col(vecc), cents).as("cell"))
            Sampling.exactKPerStratum(assigned, col("cell"),
                col(idc).cast("string"), kk, Seq(col(idc)), sl)
              .select(col(idc), col("cell"))
          })
      case args => bad(
        "graft_cluster_sample(table, id_col, vec_col, n_cells, iters, k, salt)", args)
    }
    reg(spark, "graft_rank_norm") {
      case Seq(t, id, value, buckets) =>
        val f = "graft_rank_norm"
        val tbl = table(str(t, f))
        val idc = str(id, f); val vc = str(value, f)
        val nb = int(buckets, f)
        // the boundary sketch is an ACTION (approx_percentile collected
        // as CASE-chain literals) — defer it like semdedup/the cluster
        // TVFs so EXPLAIN/prepare launch no job
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField(vc, tbl.select(col(vc)).schema.head.dataType),
            StructField("rnk", org.apache.spark.sql.types.LongType),
            StructField("pct_rank", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Sampling.percentRank(tbl, idc, vc, numBuckets = nb)
              .select(col(idc), col(vc).cast(
                  tbl.select(col(vc)).schema.head.dataType),
                col("rnk").cast("long"), col("pct_rank").cast("double"))
          })
      case args => bad(
        "graft_rank_norm(table, id_col, value_col, n_buckets)", args)
    }
    reg(spark, "graft_rank_norm_by") {
      case Seq(t, id, grp, value, buckets) =>
        val f = "graft_rank_norm_by"
        val tbl = table(str(t, f))
        val idc = str(id, f); val gc = str(grp, f); val vc = str(value, f)
        val nb = int(buckets, f)
        // same deferred contract as graft_rank_norm (the boundary
        // sketch is an action)
        GraftDeferred.frame(spark,
          StructType(Seq(
            StructField(idc, tbl.select(col(idc)).schema.head.dataType),
            StructField(gc, tbl.select(col(gc)).schema.head.dataType),
            StructField(vc, tbl.select(col(vc)).schema.head.dataType),
            StructField("rnk", org.apache.spark.sql.types.LongType),
            StructField("pct_rank", org.apache.spark.sql.types.DoubleType))),
          memo { () =>
            Sampling.percentRankByGroup(tbl, idc, gc, vc, numBuckets = nb)
              .select(col(idc),
                col(gc).cast(tbl.select(col(gc)).schema.head.dataType),
                col(vc).cast(tbl.select(col(vc)).schema.head.dataType),
                col("rnk").cast("long"), col("pct_rank").cast("double"))
          })
      case args => bad(
        "graft_rank_norm_by(table, id_col, group_col, value_col, n_buckets)", args)
    }
    reg(spark, "graft_shards") {
      case Seq(t, key, n, salt) =>
        val f = "graft_shards"
        Sampling.assignShards(table(str(t, f)), col(str(key, f)),
          numShards = int(n, f), salt = str(salt, f))
      case args => bad("graft_shards(table, key_col, num_shards, salt)", args)
    }
    reg(spark, "graft_span_dedup_doc") {
      case Seq(t, id, text, st) =>
        val f = "graft_span_dedup_doc"
        TextAnalysis.dedupSpansWithinDoc(table(str(t, f)), str(id, f),
          str(text, f), spanTokens = int(st, f))
      case args => bad(
        "graft_span_dedup_doc(table, id_col, text_col, span_tokens)", args)
    }
    reg(spark, "graft_gopher") {
      case Seq(t, id, text, minT, maxT, minW, maxW, maxSym, minStops) =>
        val f = "graft_gopher"
        TextAnalysis.gopherRules(table(str(t, f)), str(id, f), str(text, f),
          minTokens = int(minT, f), maxTokens = int(maxT, f),
          minMeanWordLen = dbl(minW, f), maxMeanWordLen = dbl(maxW, f),
          maxSymbolRatio = dbl(maxSym, f), minStopwordHits = int(minStops, f))
      case args => bad(
        "graft_gopher(table, id_col, text_col, min_tokens, max_tokens, min_word_len, max_word_len, max_symbol_ratio, min_stop_hits)", args)
    }
    reg(spark, "graft_gopher_rep") {
      case Seq(t, id, text) =>
        val f = "graft_gopher_rep"
        TextAnalysis.gopherRepetition(table(str(t, f)), str(id, f), str(text, f))
      case Seq(t, id, text, topN, dupN) =>
        val f = "graft_gopher_rep"
        TextAnalysis.gopherRepetition(table(str(t, f)), str(id, f), str(text, f),
          topN = int(topN, f), dupN = int(dupN, f))
      case args => bad(
        "graft_gopher_rep(table, id_col, text_col[, top_n, dup_n])", args)
    }
    reg(spark, "graft_quantile_filter") {
      case args if args.length >= 3 && args.length <= 5 =>
        val f = "graft_quantile_filter"
        // optional 4th arg selects the bounded-memory GK estimator
        // (accuracy a → boundary rank within N/a; 0 = the exact
        // oracle-gated percentile); optional 5th arg 'local' truncates
        // the input diamond (threshold agg + filter) when the table is
        // an expensive view chain rather than a cheap scan
        val acc = if (args.length >= 4) Some(int(args(3), f)).filter(_ > 0) else None
        val reuse = if (args.length == 5) reuseOpt(args(4), f)
          else graft.operators.Reuse.Off
        Sampling.keepAboveQuantile(table(str(args(0), f)),
          col(str(args(1), f)), dbl(args(2), f), accuracy = acc, reuse = reuse)
      case args => bad(
        "graft_quantile_filter(table, value_col, q[, accuracy_or_0[, 'local']])", args)
    }
    reg(spark, "graft_quantile_filter_by") {
      // per-GROUP thresholds — same optional estimator/reuse tail as
      // graft_quantile_filter
      case args if args.length >= 4 && args.length <= 6 =>
        val f = "graft_quantile_filter_by"
        val acc = if (args.length >= 5) Some(int(args(4), f)).filter(_ > 0) else None
        val reuse = if (args.length == 6) reuseOpt(args(5), f)
          else graft.operators.Reuse.Off
        Sampling.keepAboveQuantileByGroup(table(str(args(0), f)),
          col(str(args(1), f)), col(str(args(2), f)), dbl(args(3), f),
          accuracy = acc, reuse = reuse)
      case args => bad(
        "graft_quantile_filter_by(table, group_col, value_col, q[, accuracy_or_0[, 'local']])", args)
    }
    reg(spark, "graft_winnow") {
      case Seq(t, id, text, k, w) =>
        val f = "graft_winnow"
        TextAnalysis.winnowFingerprints(table(str(t, f)), str(id, f),
          str(text, f), k = int(k, f), w = int(w, f))
      case args => bad("graft_winnow(table, id_col, text_col, k, w)", args)
    }
    reg(spark, "graft_overlap_extents") {
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_overlap_extents"
        // optional 6th arg: minimum run length in tokens (default w+k-1,
        // the winnow completeness threshold)
        val minT = if (args.length == 6) int(args(5), f) else 0
        TextAnalysis.sharedSpanExtents(table(str(args(0), f)),
          str(args(1), f), str(args(2), f),
          k = int(args(3), f), w = int(args(4), f), minTokens = minT)
      case args => bad(
        "graft_overlap_extents(table, id_col, text_col, k, w[, min_tokens])", args)
    }
    reg(spark, "graft_dedup_substrings") {
      case args if args.length == 5 || args.length == 6 =>
        val f = "graft_dedup_substrings"
        val minT = if (args.length == 6) int(args(5), f) else 0
        TextAnalysis.dedupExactSubstrings(table(str(args(0), f)),
          str(args(1), f), str(args(2), f),
          k = int(args(3), f), w = int(args(4), f), minTokens = minT)
      case args => bad(
        "graft_dedup_substrings(table, id_col, text_col, k, w[, min_tokens])", args)
    }
    reg(spark, "graft_unigram_lp") {
      case Seq(t, id, text) =>
        val f = "graft_unigram_lp"
        TextAnalysis.unigramLogProb(table(str(t, f)), str(id, f), str(text, f))
      case args => bad("graft_unigram_lp(table, id_col, text_col)", args)
    }
    reg(spark, "graft_bigram_lp") {
      case Seq(t, id, text) =>
        val f = "graft_bigram_lp"
        TextAnalysis.bigramLogProb(table(str(t, f)), str(id, f), str(text, f))
      case args => bad("graft_bigram_lp(table, id_col, text_col)", args)
    }
    reg(spark, "graft_trigram_kn_stored") {
      // score under a STORED KN model (five count-table views) — fully
      // LAZY: left joins on hashes, broadcast 1-row totals, back-off
      // branches in-plan
      case Seq(c3T, ctxT, sfxT, midT, uniT, t, id, text, disc) =>
        val f = "graft_trigram_kn_stored"
        TextAnalysis.trigramKnScoreStored(table(str(t, f)), str(id, f),
          str(text, f),
          Map("c3" -> table(str(c3T, f)), "ctx" -> table(str(ctxT, f)),
            "sfx" -> table(str(sfxT, f)), "mid" -> table(str(midT, f)),
            "uni" -> table(str(uniT, f))),
          discount = dbl(disc, f))
      case args => bad(
        "graft_trigram_kn_stored(c3_table, ctx_table, sfx_table, mid_table, uni_table, table, id_col, text_col, discount)", args)
    }
    reg(spark, "graft_trigram_kn") {
      // interpolated Kneser-Ney trigram LM score — fully lazy (hash
      // count tables join relationally, 1-row broadcast total)
      case Seq(t, id, text, disc) =>
        val f = "graft_trigram_kn"
        TextAnalysis.trigramKnLogProb(table(str(t, f)), str(id, f),
          str(text, f), discount = dbl(disc, f))
      case args => bad(
        "graft_trigram_kn(table, id_col, text_col, discount)", args)
    }
    reg(spark, "graft_dsir") {
      case Seq(t, tgt, id, text, b) =>
        val f = "graft_dsir"
        Sampling.importanceWeights(table(str(t, f)), table(str(tgt, f)),
          str(id, f), str(text, f), buckets = int(b, f))
      case args => bad(
        "graft_dsir(table, target_table, id_col, text_col, buckets)", args)
    }

    // per-row text-analysis SCALAR functions (pure codegen'd column
    // expressions — usable anywhere an expression is, including as the
    // score feeding graft_cluster_best)
    val freg = spark.sessionState.functionRegistry
    def scalar(name: String)(b: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      freg.createOrReplaceTempFunction(name, {
        case Seq(e) => GraftBridge.resolvedExpression(spark,
          b(GraftBridge.column(e)))
        case args => bad(s"$name(text)", args)
      }, "scala_udf")
    scalar("graft_normalize")(t => TextAnalysis.normalizeText(t))
    scalar("graft_strip_html")(TextAnalysis.stripMarkup)
    scalar("graft_script")(TextAnalysis.scriptOf)
    scalar("graft_quality")(TextAnalysis.qualityScore)
    scalar("graft_pii_redact")(TextAnalysis.piiRedact)
    scalar("graft_langid")(TextAnalysis.langId)
    scalar("graft_fingerprint")(TextAnalysis.fingerprint)
    // perceptual 64-bit dHash of a binary payload (the fused
    // DHash64 expression — one digest loop, not 72 md5 subtrees)
    scalar("graft_dhash64")(p => GraftBridge.column(
      graft.functions.DHash64(GraftBridge.expression(
        p.cast(org.apache.spark.sql.types.BinaryType)))))
    scalar("graft_token_count")(TextAnalysis.tokenCount)
    scalar("graft_bpeish_count")(TextAnalysis.bpeishTokenCount)
    scalar("graft_punct_ratio")(TextAnalysis.punctRatio)
    scalar("graft_stopword_ratio")(TextAnalysis.stopwordRatio)
    // two-arg: elementwise cosine over embedding columns (the codegen'd
    // CosineSim kernel — SQL-side vector math)
    freg.createOrReplaceTempFunction("graft_cosine", {
      case Seq(a, b) => GraftBridge.resolvedExpression(spark,
        Similarity.cosine(GraftBridge.column(a), GraftBridge.column(b)))
      case args => bad("graft_cosine(vec_a, vec_b)", args)
    }, "scala_udf")
    // deterministic sampling gate: keep iff hash(salt||key) lands under
    // rate_bp basis points — the SQL form of Sampling.bernoulli/mix
    freg.createOrReplaceTempFunction("graft_sample_gate", {
      case Seq(key, rate, salt) => GraftBridge.resolvedExpression(spark,
        Sampling.hashGate(GraftBridge.column(key), GraftBridge.column(rate),
          str(salt, "graft_sample_gate")))
      case args => bad("graft_sample_gate(key, rate_bp, salt)", args)
    }, "scala_udf")
  }
}
