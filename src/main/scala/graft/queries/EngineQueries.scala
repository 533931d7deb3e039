package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.engine.Engine

/** Queries routed through the Engine façade (SURVEY.md §3) so the
  * dialect shim itself sits in the correctness gate. */
object EngineQueries {

  private def via(s: SparkSession, d: String)(sql: String,
      vars: Map[String, Any] = Map.empty): DataFrame = {
    Tables.registerAll(s, d)
    new Engine(s).query(sql, vars)
  }

  /** Share a SQL-defined temp view ACROSS its consumers: re-register the
    * view under the same name as a [[graft.operators.Reuse.LocalDeferred]]
    * frame. SQL temp views store PARSED plans, so a pipeline view
    * referenced k times across later statements re-expands — and
    * re-EXECUTES — its whole upstream chain k times (measured round 15:
    * e_sql_pipeline9's final statement expanded the p9_inc fixture chain
    * 8×, a 5,179-line physical plan). A view registered FROM a DataFrame
    * stores the analyzed plan, so every consumer shares the single
    * deferred-checkpoint leaf: the chain runs once, at first execution,
    * into executor-local blocks (guide §3.3 — materialize an intermediate
    * to truncate a plan the optimizer cannot deduplicate; column pruning
    * specializes each consumer so ReuseExchange never fires). Nothing
    * materializes at CREATE/EXPLAIN/analysis time — the
    * [[graft.operators.Reuse.LocalDeferred]] contract. */
  private def shareViews(s: SparkSession, names: String*): Unit =
    names.foreach { n =>
      graft.operators.Reuse.LocalDeferred(s.table(n))
        .createOrReplaceTempView(n)
    }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_distinct_on" -> ((s, d) => via(s, d)(
      """SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
         FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey""")),
    // nested DISTINCT ON (CTE body + FROM-subquery) — the recursive
    // region rewrite; DuckDB runs the identical SQL natively
    "e_distinct_on_nested" -> ((s, d) => via(s, d)(
      """WITH top_cust AS (
           SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
           FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey)
         SELECT t.c_nationkey, t.c_custkey, t.c_acctbal, o.max_order
         FROM top_cust t
         LEFT JOIN (SELECT DISTINCT ON (o_custkey) o_custkey, o_totalprice AS max_order
                    FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey) o
           ON o.o_custkey = t.c_custkey""")),
    // QUALIFY (window filter clause) — dialect rewrite to a subquery;
    // DuckDB runs the identical SQL natively
    "e_qualify" -> ((s, d) => via(s, d)(
      """SELECT c_nationkey, c_custkey, c_acctbal,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer
         QUALIFY rn <= 2""")),
    // DISTINCT ON in set-operation arms (round 4): unparenthesized
    // first arm (window order = keys; c_custkey is unique so the pick
    // is deterministic) + parenthesized second arm with its own
    // arm-level ORDER BY; the statement-level ORDER BY stays outside.
    // DuckDB runs the identical SQL natively
    "e_distinct_on_setop" -> ((s, d) => via(s, d)(
      """SELECT DISTINCT ON (c_custkey) c_custkey AS id, c_acctbal AS val
         FROM customer WHERE c_nationkey < 5
         UNION ALL
         (SELECT DISTINCT ON (o_custkey) o_custkey AS id, o_totalprice AS val
          FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey)
         ORDER BY id, val""")),
    // QUALIFY in an unparenthesized first arm: the predicate must bind
    // to the arm, not swallow the UNION that follows it
    "e_qualify_setop" -> ((s, d) => via(s, d)(
      """SELECT c_nationkey AS k, c_custkey AS id,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer
         QUALIFY rn <= 2
         UNION ALL
         SELECT 999 AS k, o_orderkey AS id, 1 AS rn FROM orders
         WHERE o_orderkey < 50
         ORDER BY k, id""")),
    // the reference's core identity: one statement spanning two
    // "databases" (SELECT ... FROM A.x JOIN B.y — SURVEY §1.1); here two
    // catalog namespaces over the same parquet dir
    "e_federation" -> ((s, d) => {
      graft.engine.Catalog.dropDb(s, "feda")
      graft.engine.Catalog.dropDb(s, "fedb")
      graft.engine.Catalog.registerParquetDb(s, "feda", d, Seq("customer", "nation"))
      graft.engine.Catalog.registerParquetDb(s, "fedb", d, Seq("orders"))
      new Engine(s).query(
        """SELECT n.n_name, count(*) AS n_orders,
                  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM feda.customer c
           JOIN fedb.orders o ON o.o_custkey = c.c_custkey
           JOIN feda.nation n ON n.n_nationkey = c.c_nationkey
           GROUP BY n.n_name""")
    }),
    "e_vars" -> ((s, d) => via(s, d)(
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE o_totalprice > $min_price GROUP BY o_orderpriority""",
      Map("min_price" -> 250000.0))),
    "e_builtin_sql" -> ((s, d) => via(s, d)(
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym,
              exo_substr(o_orderpriority, -3) AS prio_tail
         FROM orders WHERE o_orderkey < 500""")),
    // §2.10 pipelines driven from SQL TEXT through the façade's
    // table-valued functions (graft.engine.LlmSql) — same distributed
    // plans as the Scala API, same oracles (reused verbatim below)
    "e_sql_minhash" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_minhash_pairs('documents', 'doc_id', 'text', 0.5)")),
    "e_sql_chunk" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_chunk('documents', 'doc_id', 'text', 64, 16)")),
    "e_sql_pack" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_pack_offsets('documents', 'doc_id', 'text', 512, 64)")),
    "e_sql_pipeline10" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the tokenizer-era chain composed from TVFs and views alone:
      // exact dedup (semi-join on the winners) → learned-token budget
      // (semi-join on the fill) → id-sequence chunks
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p10_merges AS
                 SELECT * FROM (VALUES (0,'t','h'),(1,'th','e'),(2,'i','n'),
                                       (3,'a','n'),(4,'an','d'),(5,'e','r'),
                                       (6,'o','n'),(7,'r','e'))
                   AS m(rank, left, right)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p10_corpus AS
                 SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id + 500000 AS doc_id, text FROM documents""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p10_dedup AS
                 SELECT c.doc_id, c.text FROM p10_corpus c
                 LEFT SEMI JOIN graft_exact_dedup('p10_corpus', 'doc_id', 'text') w
                   ON c.doc_id = w.doc_id""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p10_sel AS
                 SELECT d.doc_id, d.text FROM p10_dedup d
                 LEFT SEMI JOIN graft_token_budget_bpe('p10_dedup', 'doc_id',
                                                       'text', 8000, 'p10_merges') b
                   ON d.doc_id = b.doc_id""")
      e.query("""SELECT doc_id, start_tok, n_tokens,
                        array_join(CAST(token_ids AS ARRAY<STRING>), ',')
                          AS token_ids
                 FROM graft_chunk_bpe('p10_sel', 'doc_id', 'text',
                                      64, 16, 'p10_merges')""")
    }),
    "e_sql_chunk_bpe" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // learned-token chunking from SQL: merge view -> id-sequence
      // windows (joined to a comma string for the portable compare)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bpe_merges_chunk AS
                 SELECT * FROM (VALUES (0,'t','h'),(1,'th','e'),(2,'i','n'),
                                       (3,'a','n'),(4,'an','d'),(5,'e','r'),
                                       (6,'o','n'),(7,'r','e'))
                   AS m(rank, left, right)""")
      e.query("""SELECT doc_id, start_tok, n_tokens,
                        array_join(CAST(token_ids AS ARRAY<STRING>), ',')
                          AS token_ids
                 FROM graft_chunk_bpe('documents', 'doc_id', 'text',
                                      64, 16, 'bpe_merges_chunk')""")
    }),
    "e_sql_pack_bpe" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // learned-token packing from SQL: the 6-arg graft_pack_offsets
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bpe_merges_pack AS
                 SELECT * FROM (VALUES (0,'t','h'),(1,'th','e'),(2,'i','n'),
                                       (3,'a','n'),(4,'an','d'),(5,'e','r'),
                                       (6,'o','n'),(7,'r','e'))
                   AS m(rank, left, right)""")
      e.query("""SELECT doc_id, n_toks, token_offset, first_seq, last_seq
                 FROM graft_pack_offsets('documents', 'doc_id', 'text',
                                         512, 64, 'bpe_merges_pack')""")
    }),
    "e_sql_sample_k" -> ((s, d) => via(s, d)(
      "SELECT doc_id FROM graft_sample_k('documents', 'text', 'doc_id', 200, 'eval:')")),
    "e_sql_sample_weighted" -> ((s, d) => via(s, d)(
      """SELECT doc_id, n_chars AS weight, priority
         FROM graft_sample_weighted('documents', 'text', 'n_chars',
                                    'doc_id', 200, 'wpri:')""")),
    "e_sql_sample_weighted_strat" -> ((s, d) => via(s, d)(
      """SELECT doc_id, source, priority
         FROM graft_sample_weighted_by('documents', 'source', 'text',
                                       'n_chars', 'doc_id', 10, 'wps:')""")),
    "e_sql_tfidf" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_tfidf('documents', 'doc_id', 'text', 3)")),
    "e_sql_bm25" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_bm25('documents', 'doc_id', 'text', 'hash,join,vector', 25)")),
    "e_sql_snippet" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_snippet('documents', 'doc_id', 'text', 'hash,join,vector', 12)")),
    "e_sql_pipeline12" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the serving chain from TVFs and views alone: ranked legs →
      // fusion TVF → deferred MMR TVF → snippet TVF left-joined
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p12_bm AS
                 SELECT doc_id, row_number() OVER (
                   ORDER BY bm25 DESC, doc_id ASC) AS rank
                 FROM graft_bm25('documents', 'doc_id', 'text',
                                 'hash,join,vector', 20)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p12_ann AS
                 SELECT vec_id AS doc_id, row_number() OVER (
                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
                 FROM graft_ann_topk('embeddings', 'vec_id', 'embedding',
                                     0, 20)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p12_fused AS
                 SELECT doc_id, rrf
                 FROM graft_rrf_fuse('p12_bm,p12_ann', 'doc_id', 10, 60)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p12_cand AS
                 SELECT f.doc_id, e.embedding, f.rrf
                 FROM p12_fused f JOIN embeddings e
                   ON e.vec_id = f.doc_id""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p12_sel AS
                 SELECT doc_id, mmr, rank
                 FROM graft_mmr('p12_cand', 'doc_id', 'embedding',
                                'rrf', 5, 0.7)""")
      // p12_sel feeds the snippet-docs semi-join AND the final
      // statement: share it so the full bm25+ann+mmr chain above
      // executes once, not twice (guide §3.3)
      shareViews(s, "p12_sel")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p12_docs AS
                 SELECT d.doc_id, d.text FROM documents d
                 LEFT SEMI JOIN p12_sel s ON d.doc_id = s.doc_id""")
      e.query("""SELECT s.doc_id, s.mmr, s.rank,
                        p.hits, p.start_tok, p.snippet
                 FROM p12_sel s
                 LEFT JOIN graft_snippet('p12_docs', 'doc_id', 'text',
                                         'hash,join,vector', 12) p
                   ON p.doc_id = s.doc_id
                 ORDER BY s.rank""")
    }),
    "e_sql_crawl_delta" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // membership drift from SQL: the two generations are plain views
      // (scalar-subquery split bounds), the report TVF on top
      e.query("""CREATE OR REPLACE TEMPORARY VIEW cdelta_a AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id <= (SELECT max(doc_id) FROM documents) - 100""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW cdelta_b AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > 50
                   AND doc_id <= (SELECT max(doc_id) FROM documents) - 150
                 UNION ALL
                 SELECT doc_id, text || ' rev2' AS text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) FROM documents) - 150
                   AND doc_id <= (SELECT max(doc_id) FROM documents) - 100
                 UNION ALL
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) FROM documents) - 100""")
      e.query("""SELECT status, n_docs
                 FROM graft_crawl_delta('cdelta_a', 'cdelta_b',
                                        'doc_id', 'text')""")
    }),
    "e_sql_bm25_prf" -> ((s, d) => via(s, d)(
      """SELECT * FROM graft_bm25_prf('documents', 'doc_id', 'text',
                                      'hash,join,vector', 25, 10, 5)""")),
    "e_sql_mmr" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // diversified selection from SQL: the candidate view joins the
      // serve TVF back to its vectors; the deferred MMR TVF re-ranks
      e.query("""CREATE OR REPLACE TEMPORARY VIEW mmr_cand AS
                 SELECT t.vec_id, e.embedding, t.cos_sim
                 FROM graft_ann_topk('embeddings', 'vec_id', 'embedding',
                                     0, 50) t
                 JOIN embeddings e ON e.vec_id = t.vec_id""")
      e.query("""SELECT vec_id, cos_sim, mmr, rank
                 FROM graft_mmr('mmr_cand', 'vec_id', 'embedding',
                                'cos_sim', 5, 0.7)""")
    }),
    "e_sql_bm25_stored" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the stored-index serve from SQL: index built + persisted in
      // Scala (the write side), postings/doclens views, the lazy TVF
      val out = "target/gate_sink/bm25_index_sql"
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
      // one index pass feeds BOTH sinks, written concurrently (guide
      // §2.6 — the llm_bm25_stored shape)
      val ix = graft.operators.Reuse.Local(
        graft.operators.TextAnalysis.bm25Index(docs, "doc_id", "text"))
      graft.operators.Par.jobs(Seq(ix),
        () => ix.write.mode("overwrite").parquet(s"$out/postings"),
        () => graft.operators.TextAnalysis.bm25DocLens(ix, "doc_id")
          .write.mode("overwrite").parquet(s"$out/doclens"))
      s.read.parquet(s"$out/postings").createOrReplaceTempView("bm25_postings")
      s.read.parquet(s"$out/doclens").createOrReplaceTempView("bm25_doclens")
      e.query("""SELECT doc_id, bm25
                 FROM graft_bm25_stored('bm25_postings', 'bm25_doclens',
                                        'doc_id', 'hash,join,vector', 25)""")
    }),
    "e_sql_bm25_join" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // batch retrieval from SQL: index persisted in Scala, queries a
      // VALUES view, the deferred join TVF
      val out = "target/gate_sink/bm25_index_join_sql"
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
      // one index pass, two overlapped sinks (the llm_bm25_stored shape)
      val ix = graft.operators.Reuse.Local(
        graft.operators.TextAnalysis.bm25Index(docs, "doc_id", "text"))
      graft.operators.Par.jobs(Seq(ix),
        () => ix.write.mode("overwrite").parquet(s"$out/postings"),
        () => graft.operators.TextAnalysis.bm25DocLens(ix, "doc_id")
          .write.mode("overwrite").parquet(s"$out/doclens"))
      s.read.parquet(s"$out/postings").createOrReplaceTempView("bm25j_postings")
      s.read.parquet(s"$out/doclens").createOrReplaceTempView("bm25j_doclens")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bm25j_queries AS
                 SELECT * FROM (VALUES (1, 'hash join'),
                                       (2, 'vector scan slow'),
                                       (3, 'zzzunknown'))
                   AS q(query_id, qtext)""")
      e.query("""SELECT query_id, doc_id, bm25, rank
                 FROM graft_bm25_join('bm25j_postings', 'bm25j_doclens',
                                      'bm25j_queries', 'doc_id',
                                      'query_id', 'qtext', 10)""")
    }),
    "e_sql_bm25_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // index maintenance from SQL: generation A written, generation
      // B's postings + doclens parquet-appended (the write side stays
      // Scala — SQL serves), the union served through the stored TVF;
      // same oracle as llm_bm25, so a lost append hash-mismatches
      val out = "target/gate_sink/bm25_index_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val a = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 100)
        .select(col("doc_id"), col("text"))
      val b = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 100)
        .select(col("doc_id"), col("text"))
      val ia = graft.operators.Reuse.Local(
        graft.operators.TextAnalysis.bm25Index(a, "doc_id", "text"))
      val ib = graft.operators.Reuse.Local(
        graft.operators.TextAnalysis.bm25Index(b, "doc_id", "text"))
      // overlap the two per-path lifecycle chains (guide §2.6;
      // overwrite→append order preserved WITHIN each path)
      graft.operators.Par.jobs(Seq(ia, ib),
        () => {
          ia.write.mode("overwrite").parquet(s"$out/postings")
          ib.write.mode("append").parquet(s"$out/postings")
        },
        () => {
          graft.operators.TextAnalysis.bm25DocLens(ia, "doc_id")
            .write.mode("overwrite").parquet(s"$out/doclens")
          graft.operators.TextAnalysis.bm25DocLens(ib, "doc_id")
            .write.mode("append").parquet(s"$out/doclens")
        })
      s.read.parquet(s"$out/postings")
        .createOrReplaceTempView("bm25a_postings")
      s.read.parquet(s"$out/doclens")
        .createOrReplaceTempView("bm25a_doclens")
      e.query("""SELECT doc_id, bm25
                 FROM graft_bm25_stored('bm25a_postings', 'bm25a_doclens',
                                        'doc_id', 'hash,join,vector', 25)""")
    }),
    "e_sql_bm25_delete" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // takedown from SQL: index persisted in Scala (the write side),
      // the tombstone an anti-predicate view over BOTH store tables
      // (the e_sql_ann_delete pattern), the stored-serve TVF unchanged
      // — df/N/avgdl recompute from the purged views
      val out = "target/gate_sink/bm25_index_delete_sql"
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val ix = graft.operators.Reuse.Local(
        graft.operators.TextAnalysis.bm25Index(docs, "doc_id", "text"))
      // two independent sinks off the shared checkpoint — overlap (§2.6)
      graft.operators.Par.jobs(Seq(ix),
        () => ix.write.mode("overwrite").parquet(s"$out/postings"),
        () => graft.operators.TextAnalysis.bm25DocLens(ix, "doc_id")
          .write.mode("overwrite").parquet(s"$out/doclens"))
      s.read.parquet(s"$out/postings")
        .createOrReplaceTempView("bm25d_postings_raw")
      s.read.parquet(s"$out/doclens")
        .createOrReplaceTempView("bm25d_doclens_raw")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bm25d_postings AS
                 SELECT * FROM bm25d_postings_raw WHERE doc_id % 7 <> 0""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bm25d_doclens AS
                 SELECT * FROM bm25d_doclens_raw WHERE doc_id % 7 <> 0""")
      e.query("""SELECT doc_id, bm25
                 FROM graft_bm25_stored('bm25d_postings', 'bm25d_doclens',
                                        'doc_id', 'hash,join,vector', 25)""")
    }),
    "e_sql_hybrid_rrf" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // hybrid retrieval from SQL: both ranked lists are views over the
      // serving TVFs (each window ranks an already-cut 50-row frame),
      // the fusion TVF full-outer-joins them in declared order
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hybrid_bm AS
                 SELECT doc_id, row_number() OVER (
                   ORDER BY bm25 DESC, doc_id ASC) AS rank
                 FROM graft_bm25('documents', 'doc_id', 'text',
                                 'hash,join,vector', 50)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hybrid_ann AS
                 SELECT vec_id AS doc_id, row_number() OVER (
                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
                 FROM graft_ann_topk('embeddings', 'vec_id', 'embedding',
                                     0, 50)""")
      e.query("""SELECT doc_id, rrf
                 FROM graft_rrf_fuse('hybrid_bm,hybrid_ann', 'doc_id',
                                     20, 60)""")
    }),
    "e_sql_hybrid_join" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // batch hybrid from SQL: index persisted in Scala (the write
      // side), the lexical leg ranked by the join TVF itself (it emits
      // rank), the semantic leg a window over the knn TVF, the fusion
      // TVF cutting per query
      val out = "target/gate_sink/hybrid_join_sql"
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val ix = graft.operators.Reuse.Local(
        graft.operators.TextAnalysis.bm25Index(docs, "doc_id", "text"))
      // two independent sinks off the shared checkpoint — overlap (§2.6)
      graft.operators.Par.jobs(Seq(ix),
        () => ix.write.mode("overwrite").parquet(s"$out/postings"),
        () => graft.operators.TextAnalysis.bm25DocLens(ix, "doc_id")
          .write.mode("overwrite").parquet(s"$out/doclens"))
      s.read.parquet(s"$out/postings")
        .createOrReplaceTempView("hybridj_postings")
      s.read.parquet(s"$out/doclens")
        .createOrReplaceTempView("hybridj_doclens")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hybridj_queries AS
                 SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'hash join'),
                                       (CAST(2 AS BIGINT), 'vector scan slow'),
                                       (CAST(3 AS BIGINT), 'zzzunknown'))
                   AS q(query_id, qtext)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hybridj_bm AS
                 SELECT query_id, doc_id, rank
                 FROM graft_bm25_join('hybridj_postings', 'hybridj_doclens',
                                      'hybridj_queries', 'doc_id',
                                      'query_id', 'qtext', 20)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hybridj_qvecs AS
                 SELECT vec_id AS query_id, embedding FROM embeddings
                 WHERE vec_id IN (1, 2, 3)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hybridj_ann AS
                 SELECT query_id, neighbor_id AS doc_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                 FROM graft_knn_join('hybridj_qvecs', 'embeddings',
                                     'query_id', 'vec_id', 'embedding',
                                     'embedding', 20, 1)""")
      e.query("""SELECT query_id, doc_id, rrf, rank
                 FROM graft_rrf_fuse_by('hybridj_bm,hybridj_ann',
                                        'query_id', 'doc_id', 10, 60)""")
    }),
    "e_sql_pipeline11" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the retrieval-era chain composed from TVFs and views alone:
      // gopher keep (semi-join on the keep flag) → exact dedup
      // (semi-join on the winners) → index built + STORED in Scala over
      // the surviving view (the write side stays Scala — SQL serves) →
      // lexical leg via the stored join TVF, semantic leg a window over
      // the knn TVF on the surviving embeddings, fused per query
      val out = "target/gate_sink/pipeline11_sql"
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_crawl AS
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 500000 AS doc_id, text FROM documents""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_kept AS
                 SELECT c.doc_id, c.text FROM p11_crawl c
                 LEFT SEMI JOIN graft_gopher('p11_crawl', 'doc_id', 'text',
                                             10, 100000, 2.0, 10.0,
                                             0.1, 1) g
                   ON c.doc_id = g.doc_id AND g.keep""")
      // p11_kept feeds the dedup stage twice (rows + the exact-dedup
      // TVF); p11_dedup feeds the index build AND the embeddings
      // semi-join — share each so its chain executes once (guide §3.3)
      shareViews(s, "p11_kept")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_dedup AS
                 SELECT c.doc_id, c.text FROM p11_kept c
                 LEFT SEMI JOIN graft_exact_dedup('p11_kept', 'doc_id',
                                                  'text') w
                   ON c.doc_id = w.doc_id""")
      shareViews(s, "p11_dedup")
      val ded = s.table("p11_dedup")
      // LocalDeferred, not Local: the index frame now contains the
      // p11_dedup deferred leaf, on which Local deliberately degrades
      // to a no-op (its construction-time toRdd hazard) — the deferred
      // variant truncates the same diamond at first execution instead
      val ix = graft.operators.Reuse.LocalDeferred(
        graft.operators.TextAnalysis.bm25Index(ded, "doc_id", "text"))
      // two independent sinks off the shared checkpoint — overlap (§2.6)
      graft.operators.Par.jobs(Seq(ix),
        () => ix.write.mode("overwrite").parquet(s"$out/postings"),
        () => graft.operators.TextAnalysis.bm25DocLens(ix, "doc_id")
          .write.mode("overwrite").parquet(s"$out/doclens"))
      s.read.parquet(s"$out/postings")
        .createOrReplaceTempView("p11_postings")
      s.read.parquet(s"$out/doclens")
        .createOrReplaceTempView("p11_doclens")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_queries AS
                 SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'hash join'),
                                       (CAST(2 AS BIGINT), 'vector scan slow'),
                                       (CAST(3 AS BIGINT), 'zzzunknown'))
                   AS q(query_id, qtext)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_bm AS
                 SELECT query_id, doc_id, rank
                 FROM graft_bm25_join('p11_postings', 'p11_doclens',
                                      'p11_queries', 'doc_id',
                                      'query_id', 'qtext', 20)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_ce AS
                 SELECT e.vec_id, e.embedding FROM embeddings e
                 LEFT SEMI JOIN p11_dedup d ON e.vec_id = d.doc_id""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_qvecs AS
                 SELECT vec_id AS query_id, embedding FROM embeddings
                 WHERE vec_id IN (1, 2, 3)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p11_ann AS
                 SELECT query_id, neighbor_id AS doc_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                 FROM graft_knn_join('p11_qvecs', 'p11_ce', 'query_id',
                                     'vec_id', 'embedding', 'embedding',
                                     20, 1)""")
      e.query("""SELECT query_id, doc_id, rrf, rank
                 FROM graft_rrf_fuse_by('p11_bm,p11_ann', 'query_id',
                                        'doc_id', 10, 60)""")
    }),
    "e_sql_retrieval_eval" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the eval verb from SQL: the run a window over the knn TVF, the
      // relevance a plain label self-join view, the report TVF on top
      e.query("""CREATE OR REPLACE TEMPORARY VIEW reval_qvecs AS
                 SELECT vec_id AS query_id, embedding, label
                 FROM embeddings WHERE vec_id IN (1, 2, 3)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW reval_q AS
                 SELECT query_id, embedding FROM reval_qvecs""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW reval_run AS
                 SELECT query_id, neighbor_id AS doc_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                 FROM graft_knn_join('reval_q', 'embeddings', 'query_id',
                                     'vec_id', 'embedding', 'embedding',
                                     10, 1)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW reval_rel AS
                 SELECT q.query_id, e.vec_id AS doc_id
                 FROM reval_qvecs q JOIN embeddings e
                   ON e.label = q.label AND e.vec_id <> q.query_id""")
      e.query("""SELECT query_id, n_rel, hits, precision_k, recall_k,
                        rr, ndcg
                 FROM graft_retrieval_eval('reval_run', 'reval_rel',
                                           'query_id', 'doc_id', 10)""")
    }),
    "e_sql_hybrid_eval" -> ((s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // eval of the fused production ranking from SQL: both legs via
      // TVFs, rrf_fuse_by, label relevance view, the report TVF on top
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val ta = graft.operators.TextAnalysis
      val ix = graft.operators.Reuse.Local(
        ta.bm25Index(docs, "doc_id", "text"))
      ix.createOrReplaceTempView("hev_post")
      ta.bm25DocLens(ix, "doc_id").createOrReplaceTempView("hev_dl")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hev_queries AS
                 SELECT * FROM VALUES (CAST(1 AS BIGINT), 'hash join'),
                                      (2, 'vector scan slow'),
                                      (3, 'zzzunknown') AS t(query_id, qtext)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hev_bm AS
                 SELECT query_id, doc_id, rank
                 FROM graft_bm25_join('hev_post', 'hev_dl', 'hev_queries',
                                      'doc_id', 'query_id', 'qtext', 20)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hev_qv AS
                 SELECT vec_id AS query_id, embedding FROM embeddings
                 WHERE vec_id IN (1, 2, 3)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hev_ann AS
                 SELECT query_id, neighbor_id AS doc_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                 FROM graft_knn_join('hev_qv', 'embeddings', 'query_id',
                                     'vec_id', 'embedding', 'embedding',
                                     20, 1)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hev_run AS
                 SELECT query_id, doc_id, rank
                 FROM graft_rrf_fuse_by('hev_bm,hev_ann', 'query_id',
                                        'doc_id', 10, 60)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW hev_rel AS
                 SELECT q.query_id, e.vec_id AS doc_id
                 FROM (SELECT vec_id AS query_id, label FROM embeddings
                       WHERE vec_id IN (1, 2, 3)) q
                 JOIN embeddings e
                   ON e.label = q.label AND e.vec_id <> q.query_id""")
      e.query("""SELECT query_id, n_rel, hits, precision_k, recall_k,
                        rr, ndcg
                 FROM graft_retrieval_eval('hev_run', 'hev_rel',
                                           'query_id', 'doc_id', 10)""")
    }),
    "e_sql_retrieval_eval_graded" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // graded eval from SQL: the gain column rides the relevance view
      // (equi-join via the exploded adjacent-label key list — no range
      // BNLJ), the TVF takes the optional gain_col tail
      e.query("""CREATE OR REPLACE TEMPORARY VIEW revalg_qvecs AS
                 SELECT vec_id AS query_id, embedding, label
                 FROM embeddings WHERE vec_id IN (1, 2, 3)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW revalg_q AS
                 SELECT query_id, embedding FROM revalg_qvecs""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW revalg_run AS
                 SELECT query_id, neighbor_id AS doc_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                 FROM graft_knn_join('revalg_q', 'embeddings', 'query_id',
                                     'vec_id', 'embedding', 'embedding',
                                     10, 1)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW revalg_rel AS
                 SELECT q.query_id, e.vec_id AS doc_id,
                        CASE WHEN e.label = q.ql THEN 2 ELSE 1 END AS rel
                 FROM (SELECT query_id, label AS ql,
                              explode(array(label - 1, label, label + 1)) AS jl
                       FROM revalg_qvecs) q
                 JOIN embeddings e
                   ON e.label = q.jl AND e.vec_id <> q.query_id""")
      e.query("""SELECT query_id, n_rel, hits, precision_k, recall_k,
                        rr, ndcg
                 FROM graft_retrieval_eval('revalg_run', 'revalg_rel',
                                           'query_id', 'doc_id', 10, 'rel')""")
    }),
    "e_sql_mmr_join" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // batch MMR from SQL: per-query candidates from the knn TVF,
      // vectors joined back, the deferred batch-MMR TVF on top
      e.query("""CREATE OR REPLACE TEMPORARY VIEW mmrj_q AS
                 SELECT vec_id AS query_id, embedding
                 FROM embeddings WHERE vec_id IN (1, 2, 3)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW mmrj_cand AS
                 SELECT k.query_id, k.neighbor_id AS doc_id,
                        e.embedding, k.cos_sim
                 FROM graft_knn_join('mmrj_q', 'embeddings', 'query_id',
                                     'vec_id', 'embedding', 'embedding',
                                     20, 1) k
                 JOIN embeddings e ON e.vec_id = k.neighbor_id""")
      e.query("""SELECT query_id, doc_id, cos_sim, mmr, rank
                 FROM graft_mmr_join('mmrj_cand', 'query_id', 'doc_id',
                                     'embedding', 'cos_sim', 3, 0.7)""")
    }),
    "e_sql_corpus_kl" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // drift between two snapshot VIEWS defined in SQL (the
      // contamination split), measured by the TVF
      e.query("""CREATE OR REPLACE TEMPORARY VIEW kl_ref AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id <= (SELECT max(doc_id) - 100 FROM documents)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW kl_new AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)""")
      e.query("SELECT * FROM graft_corpus_kl('kl_ref', 'kl_new', 'text')")
    }),
    // composition: the TVFs resolve through the catalog, so a view
    // DEFINED IN SQL feeds the pipeline — the whole near-dup-tail
    // containment flow without a line of Scala
    "e_sql_containment" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_doc_tail AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 300 FROM documents)""")
      e.query(
        "SELECT * FROM graft_containment_pairs('graft_doc_tail', 'doc_id', 'text', 3, 0.5)")
    }),
    // the flagship dedup flow — near-dup pairs -> connected components
    // -> one representative per cluster — from one line of SQL. The CC
    // rounds are DEFERRED (GraftDeferredScan): analysis/EXPLAIN launch
    // no job; the rounds run once, at first execution
    "e_sql_cluster_keep" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_cluster_keep('documents', 'doc_id', 'text', 0.5)")),
    // production representative choice from SQL: keep the HIGHEST-
    // QUALITY cluster member, score computed by the graft_quality
    // scalar inside a SQL-defined view
    "e_sql_cluster_best" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_scored_docs AS
                 SELECT doc_id, text, graft_quality(text) AS q FROM documents""")
      e.query(
        "SELECT * FROM graft_cluster_best('graft_scored_docs', 'doc_id', 'text', 0.5, 'q')")
    }),
    "e_sql_exact_dedup" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_dup_corpus AS
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 100000 AS doc_id, text FROM documents""")
      e.query("SELECT * FROM graft_exact_dedup('graft_dup_corpus', 'doc_id', 'text')")
    }),
    "e_sql_simhash" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_sim_corpus AS
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 1000000 AS doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 300 FROM documents)""")
      e.query("SELECT * FROM graft_simhash_pairs('graft_sim_corpus', 'doc_id', 'text', 3)")
    }),
    "e_sql_boilerplate" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_boilerplate('documents', 'doc_id', 'text', 3, 20)")),
    "e_sql_vocab" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_vocab('documents', 'doc_id', 'text', 100)")),
    // sentence segmentation from SQL over the same planted fixture
    "e_sql_sentences" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_sent_docs AS
                 SELECT doc_id,
                        text || ' Ellipsis... mixed?! A tail without terminator'
                             || char(10) AS text
                 FROM documents""")
      e.query("SELECT * FROM graft_sentences('graft_sent_docs', 'doc_id', 'text')")
    }),
    // incremental-ingestion dedup from SQL: a re-ingested shard (view)
    // deduplicated AGAINST the corpus
    "e_sql_minhash_incr" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_incoming AS
                 SELECT doc_id + 3000000 AS doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 300 FROM documents)""")
      e.query(
        "SELECT * FROM graft_minhash_between('graft_incoming', 'documents', 'doc_id', 'text', 0.5)")
    }),
    // probe a PERSISTED index from SQL: the band/sketch parquet of a
    // minhashIndex write registered as plain views — the per-ingestion
    // run never touches corpus text (same oracle as the recompute path)
    "e_sql_minhash_probe" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/minhash_index_sql"
      val docs = Tables.load(s, d, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text",
        k = 16, nBands = 4)
      // two independent sinks off the shared sketch — overlap (§2.6)
      graft.operators.Par.jobs(Seq(idx.sets),
        () => idx.bands.write.mode("overwrite").parquet(s"$out/bands"),
        () => idx.sets.write.mode("overwrite").parquet(s"$out/sets"))
      s.read.parquet(s"$out/bands").createOrReplaceTempView("graft_idx_bands")
      s.read.parquet(s"$out/sets").createOrReplaceTempView("graft_idx_sets")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_probe_new AS
                 SELECT doc_id + 3000000 AS doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 300 FROM documents)""")
      e.query("""SELECT * FROM graft_minhash_probe(
                   'graft_idx_bands', 'graft_idx_sets', 'graft_probe_new',
                   'doc_id', 'text', 16, 4, 0.5)""")
    }),
    "e_sql_sample_strat" -> ((s, d) => via(s, d)(
      "SELECT doc_id, source FROM graft_sample_strat('documents', 'source', 'text', 'doc_id', 10, 'strat:')")),
    // per-row text-analysis SCALARS from SQL text (same codegen'd
    // expressions as the Scala API, same oracles)
    "e_sql_pii_redact" -> ((s, d) => via(s, d)(
      "SELECT doc_id, graft_pii_redact(text) AS redacted FROM documents")),
    "e_sql_langid" -> ((s, d) => via(s, d)(
      "SELECT doc_id, graft_langid(text) AS lang_guess FROM documents")),
    "e_sql_fingerprint" -> ((s, d) => via(s, d)(
      "SELECT doc_id, graft_fingerprint(text) AS fp FROM documents")),
    // deterministic train/val/test cut from SQL text
    "e_sql_split" -> ((s, d) => via(s, d)(
      "SELECT doc_id, split FROM graft_split('documents', 'text', 'split:', 9800, 100, 100)")),
    // the whole text-stats panel through SQL scalars
    "e_sql_text_stats" -> ((s, d) => via(s, d)(
      """SELECT doc_id,
                graft_token_count(text) AS token_cnt,
                graft_bpeish_count(text) AS bpeish_cnt,
                round(graft_punct_ratio(text), 6) AS punct_ratio,
                round(graft_stopword_ratio(text), 6) AS stop_ratio,
                graft_quality(text) AS quality
         FROM documents""")),
    // weighted corpus mixing from SQL: two deterministic gates + union
    "e_sql_mix" -> ((s, d) => via(s, d)(
      """SELECT doc_id, 'web' AS source_ds FROM documents
         WHERE graft_sample_gate(text, 7000, 'mixweb:')
         UNION ALL
         SELECT doc_id, 'books' AS source_ds FROM documents
         WHERE graft_sample_gate(text, 3000, 'mixbooks:')""")),
    // SQL-side vector math: cosine against a scalar-subquery query vector
    "e_sql_cosine" -> ((s, d) => via(s, d)(
      """SELECT e.vec_id, round(graft_cosine(e.embedding, q.qv), 6) AS cos_sim
         FROM embeddings e
         CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         WHERE e.vec_id <> 0""")),
    "e_sql_rep_ratio" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_rep_ratio('documents', 'doc_id', 'text', 3)")),
    // time-series resample from SQL over the events view
    "e_sql_resample" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_resample('events', 'ts', 'value', 'minute')")),
    "e_sql_funnel" -> ((s, d) => via(s, d)(
      """SELECT * FROM graft_funnel('events', 'user_id', 'ts',
                                    'event_type', 'view,click,purchase',
                                    604800)""")),
    "e_sql_retention" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_retention('events', 'user_id', 'ts', 8)")),
    "e_sql_sessionize" -> ((s, d) => via(s, d)(
      """SELECT * FROM graft_sessionize('events', 'user_id', 'ts',
                                        'event_id', 1800)""")),
    "e_sql_transitions" -> ((s, d) => via(s, d)(
      """SELECT * FROM graft_transitions('events', 'user_id', 'ts',
                                         'event_id', 'event_type')""")),
    "e_sql_embedding_dups" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_embdup_corpus AS
                 SELECT vec_id, embedding FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings""")
      e.query(
        "SELECT * FROM graft_embedding_dups('graft_embdup_corpus', 'vec_id', 'embedding', 0.99, 6, 64)")
    }),
    "e_sql_decontaminate" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_eval_v AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_corpus_v AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id <= (SELECT max(doc_id) - 100 FROM documents)""")
      e.query(
        "SELECT * FROM graft_decontaminate('graft_corpus_v', 'graft_eval_v', 'doc_id', 'text', 13)")
    }),
    // the bloom scale path from SQL — deferred sketch build (EXPLAIN
    // launches no job), same oracle as the broadcast path
    "e_sql_decontaminate_bloom" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_eval_v AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_corpus_v AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id <= (SELECT max(doc_id) - 100 FROM documents)""")
      e.query(
        """SELECT * FROM graft_decontaminate_bloom(
             'graft_corpus_v', 'graft_eval_v', 'doc_id', 'text', 13, 65536, 1048576)""")
    }),
    // the stored admission index probed from SQL: build+persist in
    // Scala (the write side), reconstruct as plain views over the
    // parquet, probe via the deferred TVF — same oracle as the inline
    // bloom path, so storage drift hash-mismatches
    "e_sql_decontam_roundtrip" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/decontam_index_sql"
      import org.apache.spark.sql.functions.{broadcast, col, max}
      val docs = Tables.load(s, d, "documents")
      val m = docs.agg(max(col("doc_id")).as("m"))
      val ev = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 100).select(col("doc_id"), col("text"))
      val idx = graft.operators.Dedup.decontamIndex(ev, "doc_id", "text",
        n = 13, expectedItems = 1L << 16, numBits = 1L << 20)
      // two independent sinks off the shared index — overlap (§2.6)
      graft.operators.Par.jobs(
        () => idx.sketch.write.mode("overwrite").parquet(s"$out/sketch"),
        () => idx.hashes.write.mode("overwrite").parquet(s"$out/hashes"))
      s.read.parquet(s"$out/sketch").createOrReplaceTempView("graft_dc_sketch")
      s.read.parquet(s"$out/hashes").createOrReplaceTempView("graft_dc_hashes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_corpus_v AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id <= (SELECT max(doc_id) - 100 FROM documents)""")
      e.query("""SELECT * FROM graft_decontaminate_stored(
                   'graft_corpus_v', 'graft_dc_sketch', 'graft_dc_hashes',
                   'doc_id', 'text')""")
    }),
    // graded contamination fraction from SQL — same eval/corpus views
    "e_sql_contamination" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_eval_v AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_corpus_v AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id <= (SELECT max(doc_id) - 100 FROM documents)""")
      e.query(
        """SELECT * FROM graft_contamination(
             'graft_corpus_v', 'graft_eval_v', 'doc_id', 'text', 13, 0.2)""")
    }),
    // deterministic token-budget fill from one line of SQL
    "e_sql_token_budget" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_token_budget('documents', 'doc_id', 'text', 10000)")),
    "e_sql_token_budget_group" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_token_budget_by('documents', 'doc_id', 'lang', 'text', 4000)")),
    "e_sql_token_budget_bpe" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // budget in learned tokens from SQL: merge view -> counter TVF
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bpe_merges_budget AS
                 SELECT * FROM (VALUES (0,'t','h'),(1,'th','e'),(2,'i','n'),
                                       (3,'a','n'),(4,'an','d'),(5,'e','r'),
                                       (6,'o','n'),(7,'r','e'))
                   AS m(rank, left, right)""")
      e.query("""SELECT doc_id, n_toks, token_offset
                 FROM graft_token_budget_bpe('documents', 'doc_id', 'text',
                                             10000, 'bpe_merges_budget')""")
    }),
    // exact percent-rank normalization from SQL (deferred boundary
    // sketch — EXPLAIN launches no job)
    "e_sql_rank_norm" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_rank_norm('documents', 'doc_id', 'n_chars', 16)")),
    "e_sql_rank_norm_group" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_rank_norm_by('documents', 'doc_id', 'lang', 'n_chars', 16)")),
    // the Gopher repetition panel from SQL, over the same planted
    // fixture as llm_gopher_rep (doubled text / repeated footer lines)
    "e_sql_gopher_rep" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_rep_fixture AS
                 SELECT doc_id,
                   (CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text ELSE text END) ||
                   (CASE WHEN doc_id % 5 = 0
                         THEN chr(10) || 'repeated footer line' || chr(10) || 'repeated footer line'
                         ELSE '' END) AS text
                 FROM documents""")
      e.query(
        "SELECT * FROM graft_gopher_rep('graft_rep_fixture', 'doc_id', 'text', 2, 5)")
    }),
    // C4-style repeated-span removal from one line of SQL
    "e_sql_span_dedup" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_span_dedup('documents', 'doc_id', 'text', 16, 1)")),
    // tempered source mixing and the ingestion dashboard from SQL
    "e_sql_temperature_mix" -> ((s, d) => via(s, d)(
      """SELECT doc_id, source
         FROM graft_temperature_mix('documents', 'source', 'text', 0.5, 0.25)""")),
    "e_sql_corpus_report" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_corpus_report('documents', 'source', 'lang', 'text')")),
    // Unicode normalization from SQL: the planted fixture is built via
    // the DataFrame API (Spark SQL chr() is ASCII-only, so the
    // codepoints can't be spliced in SQL text), then the scalar applies
    "e_sql_normalize" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      Tables.load(s, d, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.col("text"),
            org.apache.spark.sql.functions.lit(
              "  cafe\u0301 \u00a0 nai\u0308ve\r\nx\u0001y  ")).as("text"))
        .createOrReplaceTempView("graft_norm_docs")
      e.query("""SELECT doc_id, graft_normalize(text) AS norm_text,
                        length(graft_normalize(text)) AS n_chars_norm
                 FROM graft_norm_docs""")
    }),
    // markup strip from SQL: the fixture is ASCII, so it splices
    // directly into the statement (unlike the normalize codepoints)
    "e_sql_html_strip" -> ((s, d) => via(s, d)(
      """SELECT doc_id, clean_text, CAST(length(clean_text) AS INT) AS n_chars
         FROM (SELECT doc_id, graft_strip_html(
                 '<!DOCTYPE html><html><head><style type="text/css">p{color:red}</style><script>if (1 < 2 && x > 0) { y = "a&b"; }</script></head><body><h1>Title</h1><p class="a">'
                 || text ||
                 '</p><!-- hidden note --> 3 &lt; 4 &amp;&amp; y &gt; 1&nbsp;&quot;it&#39;s&quot; &copy; fine</body></html>') AS clean_text
               FROM documents)""")),
    "e_sql_bigram_lp" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_bigram_lp('documents', 'doc_id', 'text')")),
    "e_sql_trigram_kn" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_trigram_kn('documents', 'doc_id', 'text', 0.75)")),
    "e_sql_trigram_kn_stored" -> ((s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // stored-model KN scoring from SQL: the five count tables trained
      // and written in Scala (the write side), read back as views, the
      // whole corpus scored through the lazy TVF
      val out = "target/gate_sink/kn_model_sql"
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val model = graft.operators.TextAnalysis.trigramKnTrain(
        docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
      // independent-sink writes off shared checkpointed frames — run
      // concurrently (guide §2.6); the cheap view registrations follow
      graft.operators.Par.jobs(Seq(model("types")), model.toSeq.map { case (k, v) => () =>
        v.write.mode("overwrite").parquet(s"$out/$k") }: _*)
      model.keys.foreach { k =>
        s.read.parquet(s"$out/$k").createOrReplaceTempView(s"knm_$k")
      }
      e.query("""SELECT * FROM graft_trigram_kn_stored('knm_c3', 'knm_ctx',
                   'knm_sfx', 'knm_mid', 'knm_uni', 'documents',
                   'doc_id', 'text', 0.75)""")
    }),
    "e_sql_trigram_kn_append" -> ((s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // KN model append twin: gen A trained+stored and gen B merged in
      // Scala (the write side — the merge law is trigramKnAppend's),
      // the merged store read back as views and the whole corpus
      // scored through the unchanged lazy TVF
      val out = "target/gate_sink/kn_model_append_sql"
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val mA = graft.operators.TextAnalysis.trigramKnTrain(
        docs.filter($"doc_id" % 4 === 0), "doc_id", "text")
      // concurrent independent-sink writes per generation (guide §2.6);
      // v2 depends on v1 via the read-back, so the batches stay ordered
      graft.operators.Par.jobs(Seq(mA("types")), mA.toSeq.map { case (k, v) => () =>
        v.write.mode("overwrite").parquet(s"$out/v1/$k") }: _*)
      val stored = mA.keys.map(k => k -> s.read.parquet(s"$out/v1/$k")).toMap
      val merged = graft.operators.TextAnalysis.trigramKnAppend(stored,
        docs.filter($"doc_id" % 4 === 2), "doc_id", "text")
      graft.operators.Par.jobs(Seq(merged("types")), merged.toSeq.map { case (k, v) => () =>
        v.write.mode("overwrite").parquet(s"$out/v2/$k") }: _*)
      merged.keys.foreach { k =>
        s.read.parquet(s"$out/v2/$k").createOrReplaceTempView(s"knma_$k")
      }
      e.query("""SELECT * FROM graft_trigram_kn_stored('knma_c3', 'knma_ctx',
                   'knma_sfx', 'knma_mid', 'knma_uni', 'documents',
                   'doc_id', 'text', 0.75)""")
    }),
    "e_sql_unigram_train" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_unigram_train('documents', 'doc_id', 'text', 48, 2, 4, 64)")),
    "e_sql_unigram_tokenize" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // train in Scala (the write side), store, serve from the view
      // through the deferred TVF — the stored-artifact twin convention
      val out = "target/gate_sink/unigram_pieces_sql"
      graft.operators.TextAnalysis.unigramTokTrain(
          Tables.load(s, d, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", vocabSize = 48, nRounds = 2,
          maxPieceLen = 4, seedSize = 64)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("unig_pieces")
      e.query("""SELECT * FROM graft_unigram_tokenize('documents',
                   'doc_id', 'text', 'unig_pieces')""")
    }),
    // script detection from SQL over the same multilingual fixture
    // (DataFrame-built: Spark SQL chr() is ASCII-only)
    "e_sql_script" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, concat, lit, when}
      Tables.registerAll(s, d)
      val e = new Engine(s)
      Tables.load(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 9 === 0, "ДДДДД")
            .when(col("doc_id") % 9 === 1, "中中中中")
            .when(col("doc_id") % 9 === 2, "اااااا")
            .when(col("doc_id") % 9 === 3, "ααααα")
            .when(col("doc_id") % 9 === 4, "가가가")
            .when(col("doc_id") % 9 === 5, "कककक")
            .when(col("doc_id") % 9 === 6, lit("123 456"))
            .when(col("doc_id") % 9 === 7, concat(col("text"), lit(" ДД")))
            .otherwise(col("text")).as("t"))
        .createOrReplaceTempView("graft_script_docs")
      e.query("SELECT doc_id, graft_script(t) AS script FROM graft_script_docs")
    }),
    // C4 line panel from SQL: the planted multi-line fixture is itself
    // a SQL view (same construction as the llm_c4_filters oracle)
    "e_sql_c4_filters" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_c4_docs AS
                 SELECT doc_id,
                   text || chr(10) || 'no terminal punctuation line' || chr(10) ||
                   CASE WHEN doc_id % 5 = 0 THEN 'Please enable javascript to continue reading.'
                        ELSE 'A perfectly fine closing sentence.' END ||
                   CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'short one.' ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'code sample { return 0; }' ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
                   AS text
                 FROM documents""")
      e.query(
        "SELECT * FROM graft_c4_filters('graft_c4_docs', 'doc_id', 'text', 3, 2)")
    }),
    // corpus line dedup from SQL over the same planted fixture
    "e_sql_line_dedup" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_line_docs AS
                 SELECT doc_id,
                   text || chr(10) || 'Subscribe to our newsletter today.' ||
                   chr(10) || chr(10) || 'Unique closing line for document ' ||
                   doc_id || '.' AS text
                 FROM documents""")
      e.query(
        "SELECT * FROM graft_line_dedup('graft_line_docs', 'doc_id', 'text', 1)")
    }),
    // SemDeDup from SQL: train+dedup on the clone-doubled corpus — the
    // doubled corpus trains to BIT-IDENTICAL centroids (exact decimal
    // sums: 2S/2n = S/n; clones share their original's cell at every
    // round), so the llm_semdedup oracle (which trains on the base)
    // verifies this gate verbatim
    // the ANN family from SQL: brute/LSH lazy, IVF/PQ deferred
    "e_sql_ann_topk" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_ann_topk('embeddings', 'vec_id', 'embedding', 0, 10)")),
    "e_sql_ann_lsh" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_ann_lsh('embeddings', 'vec_id', 'embedding', 0, 10, 6, 64)")),
    "e_sql_ann_ivf" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_ann_ivf('embeddings', 'vec_id', 'embedding', 0, 10, 8, 2)")),
    "e_sql_ann_pq" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_ann_pq('embeddings', 'vec_id', 'embedding', 0, 10, 4, 16, 8)")),
    "e_sql_ann_residual" -> ((s, d) => via(s, d)(
      """SELECT * FROM graft_ann_ivf_pq_residual('embeddings', 'vec_id',
                                                 'embedding', 0, 10, 8, 2, 4, 16, 8)""")),
    "e_sql_cluster_sample" -> ((s, d) => via(s, d)(
      """SELECT vec_id, cell
         FROM graft_cluster_sample('embeddings', 'vec_id', 'embedding',
                                   8, 2, 20, 'csamp:')""")),
    "e_sql_embed_outliers" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_embed_outliers('embeddings', 'vec_id', 'embedding', 8, 0, 0.25)")),
    "e_sql_sentence_filter" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_sentence_filter('documents', 'doc_id', 'text', 0.2)")),
    "e_sql_cms_heavy_hitters" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_cms_heavy_hitters('documents', 'doc_id', 'text', 20, 0.001, 0.99)")),
    "e_sql_distinct_n" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_distinct_ngrams('documents', 'doc_id', 'text')")),
    // the full stored ANN index served from SQL: artifacts written in
    // Scala (the write side), read back as plain views, probed via the
    // deferred TVF — same oracle as the in-memory IVF-PQ path
    "e_sql_ann_stored" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/ann_index_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      // three independent sinks (cents/cbs already driver-side) —
      // overlap them (guide §2.6)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => sim.ivfPqEncode(emb, "vec_id", "embedding", cents, cbs, 16)
          .write.mode("overwrite").parquet(s"$out/codes"))
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_ann_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("graft_ann_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_ann_codes")
      e.query("""SELECT vec_id, adc_score
                 FROM graft_ann_stored('graft_ann_codes', 'graft_ann_cells',
                                       'graft_ann_cbs', 'embeddings',
                                       'vec_id', 'embedding', 0, 10, 2)""")
    }),
    "e_sql_bpe_count" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the merge table as a catalog view (VALUES — the SQL-side twin
      // of the parquet store), applied via the TVF
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bpe_merges AS
                 SELECT * FROM (VALUES (0,'t','h'),(1,'th','e'),(2,'i','n'),
                                       (3,'a','n'),(4,'an','d'),(5,'e','r'),
                                       (6,'o','n'),(7,'r','e'))
                   AS m(rank, left, right)""")
      e.query("""SELECT doc_id, bpe_cnt
                 FROM graft_bpe_count('documents', 'doc_id', 'text', 'bpe_merges')""")
    }),
    "e_sql_bpe_vocab" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the learned-token coverage curve from SQL: VALUES merge view →
      // vocab-report TVF
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bpe_merges_vocab AS
                 SELECT * FROM (VALUES (0,'t','h'),(1,'th','e'),(2,'i','n'),
                                       (3,'a','n'),(4,'an','d'),(5,'e','r'),
                                       (6,'o','n'),(7,'r','e'))
                   AS m(rank, left, right)""")
      e.query("""SELECT token_id, token, cnt, df, rank, coverage
                 FROM graft_bpe_vocab('documents', 'doc_id', 'text',
                                      'bpe_merges_vocab', 50)""")
    }),
    "e_sql_bpe_tokenize" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // tokenize-to-ids from SQL: the same VALUES merge view, the
      // sequence-emitting twin of graft_bpe_count
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bpe_merges_tok AS
                 SELECT * FROM (VALUES (0,'t','h'),(1,'th','e'),(2,'i','n'),
                                       (3,'a','n'),(4,'an','d'),(5,'e','r'),
                                       (6,'o','n'),(7,'r','e'))
                   AS m(rank, left, right)""")
      e.query("""SELECT doc_id, pos, token, token_id
                 FROM graft_bpe_tokenize('documents', 'doc_id', 'text',
                                         'bpe_merges_tok')""")
    }),
    "e_sql_ann_sq" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""SELECT vec_id, sq_score
                 FROM graft_ann_sq('embeddings', 'vec_id', 'embedding', 0, 10)""")
    }),
    "e_sql_ann_ivf_sq" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""SELECT vec_id, sq_score
                 FROM graft_ann_ivf_sq('embeddings', 'vec_id', 'embedding',
                                       0, 10, 8, 2)""")
    }),
    "e_sql_ann_recall" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // serving quality as one line of SQL: recall@5 of the IVF-pruned
      // batch serving vs its brute-force twin, per query
      e.query("""CREATE OR REPLACE TEMPORARY VIEW recall_queries AS
                 SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10""")
      e.query("""SELECT query_id, n_exact, n_hit, recall_at_k
                 FROM graft_ann_recall('recall_queries', 'embeddings',
                        'vec_id', 'vec_id', 'embedding', 'embedding',
                        5, 8, 2)""")
    }),
    "e_sql_ann_sq_stored" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the SQ store served from SQL: codes written Scala-side (the
      // write side), read back into a view, probed via the TVF
      val out = "target/gate_sink/sq_codes_sql"
      val emb = Tables.load(s, d, "embeddings")
      graft.operators.Similarity.sqEncode(emb, "vec_id", "embedding")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("graft_sq_codes")
      e.query("""SELECT vec_id, sq_score
                 FROM graft_ann_sq_stored('graft_sq_codes', 'embeddings',
                                          'vec_id', 'embedding', 0, 10)""")
    }),
    "e_sql_ann_sq_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // SQ index maintenance from SQL: per-row encode means the delta
      // IS the append — gen A written, gen B parquet-appended (Scala,
      // the write side), the read-back union served via the TVF
      val out = "target/gate_sink/sq_codes_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, max}
      val emb = Tables.load(s, d, "embeddings")
      val m = emb.agg(max(col("vec_id")).as("m"))
      val a = emb.crossJoin(broadcast(m)).filter(col("vec_id") <= col("m") - 100)
        .select(col("vec_id"), col("embedding"))
      val b = emb.crossJoin(broadcast(m)).filter(col("vec_id") > col("m") - 100)
        .select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.sqEncode(a, "vec_id", "embedding")
        .write.mode("overwrite").parquet(out)
      graft.operators.Similarity.sqEncode(b, "vec_id", "embedding")
        .write.mode("append").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("graft_sq_codes_apnd")
      e.query("""SELECT vec_id, sq_score
                 FROM graft_ann_sq_stored('graft_sq_codes_apnd', 'embeddings',
                                          'vec_id', 'embedding', 0, 10)""")
    }),
    "e_sql_ann_ivf_sq_stored" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the IVF×SQ store from SQL: cell-partitioned codes + the cells
      // table written Scala-side, served via the TVF with the
      // driver-literal probe-cell filter (static partition pruning)
      val out = "target/gate_sink/ivf_sq_codes_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      // two independent sinks — overlap them (guide §2.6)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.ivfSqEncode(emb, "vec_id", "embedding", cents)
          .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes"))
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_ivfsq_cells")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_ivfsq_codes")
      e.query("""SELECT vec_id, sq_score
                 FROM graft_ann_ivf_sq_stored('graft_ivfsq_codes',
                        'graft_ivfsq_cells', 'embeddings',
                        'vec_id', 'embedding', 0, 10, 2)""")
    }),
    "e_sql_image_delete" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // image takedown from SQL: the dHash store is a plain table, so
      // the purge is a plain anti-predicate VIEW over the read-back
      // (the e_sql_ann_delete pattern) — clones of purged images admit
      // again, survivors' clones still bounce, via the unchanged TVF
      val out = "target/gate_sink/image_dhash_delete_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      graft.operators.Multimodal.dHash(
          graft.operators.Multimodal.asMedia(slice, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("image_hashes_del")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW image_hashes_purged AS
                 SELECT * FROM image_hashes_del WHERE doc_id % 5 <> 1""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW image_probe_del AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_image_probe('image_probe_del', 'image_hashes_purged',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_bpe_train" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // tokenizer training from SQL: the deferred TVF runs the merge
      // rounds once on execute (EXPLAIN launches no job)
      e.query("""SELECT rank, left, right
                 FROM graft_bpe_train('documents', 'doc_id', 'text', 8)""")
    }),
    "e_sql_bpe_pretok" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // pre-tokenized training from SQL: the optional 'pretok' tail
      // selects the class split before the merge loop
      e.query("""SELECT rank, left, right
                 FROM graft_bpe_train('documents', 'doc_id', 'text', 8, 'pretok')""")
    }),
    "e_sql_bpe_roundtrip" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the tokenizer lifecycle from SQL: train via the TVF INTO a
      // view, count every document under the learned table via the
      // apply TVF — one statement pair, no Scala between them
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bpe_merges_learned AS
                 SELECT rank, left, right
                 FROM graft_bpe_train('documents', 'doc_id', 'text', 8)""")
      e.query("""SELECT doc_id, bpe_cnt
                 FROM graft_bpe_count('documents', 'doc_id', 'text',
                                      'bpe_merges_learned')""")
    }),
    "e_sql_pipeline8" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the multimodal front door composed PURELY in SQL: media fixture
      // view → graft_image_dups TVF → keep-first anti-predicate →
      // decode/resize geometry as plain SQL over the payload (the stub
      // decode is u32(md5(payload)) arithmetic — expressible in any SQL)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p8_media AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id, CAST(text AS BINARY) AS payload FROM sl
                 UNION ALL
                 SELECT doc_id + 3000000,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY)
                 FROM sl""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p8_dups AS
                 SELECT DISTINCT id_b
                 FROM graft_image_dups('p8_media', 'doc_id', 'payload', 3, 4)""")
      e.query("""WITH kept AS (
                   SELECT doc_id, payload FROM p8_media
                   WHERE doc_id NOT IN (SELECT id_b FROM p8_dups)),
                 acc AS (SELECT doc_id,
                           CAST(conv(substring(md5(payload), 1, 8), 16, 10)
                             AS BIGINT) AS a
                         FROM kept),
                 d AS (SELECT doc_id,
                         CAST(320 + a % 1600 AS INT) AS width,
                         CAST(240 + (a >> 7) % 840 AS INT) AS height
                       FROM acc),
                 sc AS (SELECT doc_id, width, height,
                          least(1.0D, least(1280.0D / width, 720.0D / height)) AS s
                        FROM d)
                 SELECT doc_id, width, height, round(s, 6) AS scale,
                        CAST(floor(width * s / 2) * 2 AS INT) AS out_w,
                        CAST(floor(height * s / 2) * 2 AS INT) AS out_h
                 FROM sc""")
    }),
    "e_sql_admission_selfdedup_media" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the image intra-batch window composed purely in SQL:
      // graft_image_dups WITHIN the batch view (higher id of every
      // pair drops), survivors probe the read-back dHash store via
      // graft_image_probe — admitBatchMedia's semantics, statement form
      val out = "target/gate_sink/selfdedup_media_sql"
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      graft.operators.Multimodal.dHash(
          graft.operators.Multimodal.asMedia(docs, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("sddm_hashes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW sddm_batch AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 aa AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND doc_id <= mx - 200)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(text AS BINARY) AS payload FROM aa
                 UNION ALL
                 SELECT doc_id + 4000000, CAST(reverse(text) AS BINARY) FROM aa
                 UNION ALL
                 SELECT doc_id + 5000000, CAST(reverse(text) AS BINARY) FROM aa""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW sddm_reps AS
                 SELECT i.doc_id, i.payload FROM sddm_batch i
                 LEFT ANTI JOIN (
                     SELECT DISTINCT id_b FROM graft_image_dups(
                       'sddm_batch', 'doc_id', 'payload', 3, 4)) l
                   ON i.doc_id = l.id_b""")
      e.query("""SELECT r.doc_id FROM sddm_reps r
                 LEFT ANTI JOIN (
                     SELECT DISTINCT id_new FROM graft_image_probe(
                       'sddm_reps', 'sddm_hashes', 'doc_id', 'payload',
                       3, 4)) h
                   ON r.doc_id = h.id_new""")
    }),
    "e_sql_admission_selfdedup" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // intra-batch keep-first + stored-index probe composed purely in
      // SQL: graft_minhash_pairs WITHIN the batch view (higher id of
      // every pair drops), survivors probe the read-back index via
      // graft_minhash_probe — the admitBatch semantics, statement form
      val out = "target/gate_sink/selfdedup_sql"
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text")
      // two independent sinks off the shared sketch — overlap (§2.6)
      graft.operators.Par.jobs(Seq(idx.sets),
        () => idx.bands.write.mode("overwrite").parquet(s"$out/bands"),
        () => idx.sets.write.mode("overwrite").parquet(s"$out/sets"))
      s.read.parquet(s"$out/bands").createOrReplaceTempView("sdd_bands")
      s.read.parquet(s"$out/sets").createOrReplaceTempView("sdd_sets")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW sdd_batch AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 aa AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND doc_id <= mx - 200),
                 nov AS (SELECT a.doc_id,
                                concat_ws(' ', a.text, b.text, c.text) AS ntext
                         FROM aa a
                         JOIN documents b ON b.doc_id = a.doc_id - 120
                         JOIN documents c ON c.doc_id = a.doc_id - 240)
                 SELECT doc_id + 3000000 AS doc_id, text FROM aa
                 UNION ALL SELECT doc_id + 4000000, ntext FROM nov
                 UNION ALL SELECT doc_id + 5000000, ntext FROM nov""")
      // sdd_batch feeds sdd_reps twice (rows + the pairs TVF), sdd_reps
      // feeds the final statement twice (rows + the probe TVF) — share
      // each stage so its chain executes once (guide §3.3)
      shareViews(s, "sdd_batch")
      // BROADCAST hints: the shared deferred leaf reports conservative
      // (huge) stats, which would push these anti-joins to sort-merge —
      // but pair-loser / probe-hit sets are micro-batch-bounded, the
      // textbook broadcast side (guide §3.1)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW sdd_reps AS
                 SELECT /*+ BROADCAST(l) */ i.doc_id, i.text
                 FROM sdd_batch i
                 LEFT ANTI JOIN (
                     SELECT DISTINCT id_b FROM graft_minhash_pairs(
                       'sdd_batch', 'doc_id', 'text', 0.5)) l
                   ON i.doc_id = l.id_b""")
      shareViews(s, "sdd_reps")
      e.query("""SELECT /*+ BROADCAST(h) */ r.doc_id FROM sdd_reps r
                 LEFT ANTI JOIN (
                     SELECT DISTINCT id_new FROM graft_minhash_probe(
                       'sdd_bands', 'sdd_sets', 'sdd_reps',
                       'doc_id', 'text', 16, 4, 0.5)) h
                   ON r.doc_id = h.id_new""")
    }),
    "e_sql_pipeline9" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the mixed-modality front door composed from SQL: stores written
      // in Scala (the write side — minhash index frames + dHash frame),
      // then the four-group incoming fixture, gopher keep,
      // decontamination, minhash probe, and dHash probe ALL composed as
      // engine SQL over the graft_* TVFs
      val out = "target/gate_sink/pipeline9_sql"
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text")
      // three independent store sinks — overlap (guide §2.6)
      graft.operators.Par.jobs(
        () => graft.operators.Par.jobs(Seq(idx.sets),
          () => idx.bands.write.mode("overwrite").parquet(s"$out/mh/bands"),
          () => idx.sets.write.mode("overwrite").parquet(s"$out/mh/sets")),
        () => graft.operators.Multimodal.dHash(
            graft.operators.Multimodal.asMedia(docs, "doc_id", "text"))
          .write.mode("overwrite").parquet(s"$out/dh"))
      s.read.parquet(s"$out/mh/bands").createOrReplaceTempView("p9_mh_bands")
      s.read.parquet(s"$out/mh/sets").createOrReplaceTempView("p9_mh_sets")
      s.read.parquet(s"$out/dh").createOrReplaceTempView("p9_dh")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p9_inc AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 aa AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND doc_id <= mx - 200),
                 nov AS (SELECT a.doc_id, a.text AS atext,
                                concat_ws(' ', a.text, b.text, c.text) AS ntext
                         FROM aa a
                         JOIN documents b ON b.doc_id = a.doc_id - 120
                         JOIN documents c ON c.doc_id = a.doc_id - 240)
                 SELECT doc_id + 3000000 AS doc_id, text, text AS pay FROM aa
                 UNION ALL SELECT doc_id + 4000000, ntext, atext FROM nov
                 UNION ALL SELECT doc_id + 5000000, text, reverse(text) FROM aa
                 UNION ALL SELECT doc_id + 6000000, ntext, reverse(atext) FROM nov""")
      // p9_inc feeds the quality gate (twice: rows + the gopher TVF) AND
      // the media view; p9_quality feeds p9_clean twice (rows + the
      // decontaminate TVF); p9_clean appears twice in the final statement
      // (rows + the minhash probe). Shared, each stage runs once.
      shareViews(s, "p9_inc")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p9_quality AS
                 SELECT i.doc_id, i.text, i.pay
                 FROM p9_inc i
                 JOIN graft_gopher('p9_inc', 'doc_id', 'text',
                                   10, 100000, 2.0, 10.0, 0.1, 1) g
                   ON i.doc_id = g.doc_id AND g.keep""")
      shareViews(s, "p9_quality")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p9_eval AS
                 SELECT doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p9_clean AS
                 SELECT q.doc_id, q.text, q.pay
                 FROM p9_quality q
                 JOIN graft_decontaminate('p9_quality', 'p9_eval',
                                          'doc_id', 'text', 13) d
                   ON q.doc_id = d.doc_id AND NOT d.contaminated""")
      shareViews(s, "p9_clean")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p9_media AS
                 SELECT doc_id, CAST(pay AS BINARY) AS payload FROM p9_inc""")
      // LEFT ANTI joins, not NOT IN (the null-aware form plans a BNLJ)
      // BROADCAST hints: the shared deferred leaves report conservative
      // (huge) stats by design, which would push these anti-joins to
      // sort-merge — but a probe-hit set is bounded by the incoming
      // micro-batch, the textbook broadcast side (guide §3.1: hint when
      // the estimate is wrong)
      e.query("""SELECT /*+ BROADCAST(mh), BROADCAST(im) */ c.doc_id
                 FROM p9_clean c
                 LEFT ANTI JOIN (
                     SELECT DISTINCT id_new FROM graft_minhash_probe(
                       'p9_mh_bands', 'p9_mh_sets', 'p9_clean',
                       'doc_id', 'text', 16, 4, 0.5)) mh
                   ON c.doc_id = mh.id_new
                 LEFT ANTI JOIN (
                     SELECT DISTINCT id_new FROM graft_image_probe(
                       'p9_media', 'p9_dh', 'doc_id', 'payload', 3, 4)) im
                   ON c.doc_id = im.id_new""")
    }),
    "e_sql_image_dups" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the media fixture built in engine SQL (same slice + same-length
      // local edit as llm_image_dups), probed via the TVF
      e.query("""CREATE OR REPLACE TEMPORARY VIEW image_media AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id, CAST(text AS BINARY) AS payload FROM sl
                 UNION ALL
                 SELECT doc_id + 3000000,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY)
                 FROM sl""")
      e.query("""SELECT id_a, id_b, hamming
                 FROM graft_image_dups('image_media', 'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_audio_fp" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the audio fingerprint surface from SQL: the media view + the
      // pure-projection TVF (llm_audio_fp's oracle gates it)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audio_media_fp AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id, CAST(text AS BINARY) AS payload FROM sl""")
      e.query("""SELECT doc_id, afp
                 FROM graft_audio_fp('audio_media_fp', 'doc_id', 'payload')""")
    }),
    "e_sql_audio_dups" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // audio near-dup pairs from SQL — the e_sql_image_dups fixture
      // through the audio-fingerprint TVF
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audio_media AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id, CAST(text AS BINARY) AS payload FROM sl
                 UNION ALL
                 SELECT doc_id + 3000000,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY)
                 FROM sl""")
      e.query("""SELECT id_a, id_b, hamming
                 FROM graft_audio_dups('audio_media', 'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_audio_probe" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // incremental audio admission from SQL: fingerprint store written
      // in Scala (the write side), edited-clone probe via the TVF
      val out = "target/gate_sink/audio_fp_store_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      graft.operators.Multimodal.audioFp(
          graft.operators.Multimodal.asMedia(slice, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("audio_fps")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audio_probe AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_audio_probe('audio_probe', 'audio_fps',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_audio_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // audio-store append from SQL: two generations written in Scala
      // (the llm_audio_append fixture — the append IS the 8-byte
      // delta), the read-back union probed via the unchanged TVF
      val out = "target/gate_sink/audio_fp_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      val genA = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 150)
        .select(col("doc_id"), col("text"))
      val genB = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 150)
        .select(col("doc_id"), col("text"))
      val mm = graft.operators.Multimodal
      mm.audioFp(mm.asMedia(genA, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      mm.audioFp(mm.asMedia(genB, "doc_id", "text"))
        .write.mode("append").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("audio_fps_app")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audio_probe_app AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_audio_probe('audio_probe_app', 'audio_fps_app',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_audio_delete" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // audio takedown from SQL: the fingerprint store is a plain
      // table, so the purge is a plain anti-predicate VIEW over the
      // read-back (the e_sql_image_delete pattern) — clones of purged
      // tracks admit again, survivors' clones still bounce
      val out = "target/gate_sink/audio_fp_delete_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      graft.operators.Multimodal.audioFp(
          graft.operators.Multimodal.asMedia(slice, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("audio_fps_del")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audio_fps_purged AS
                 SELECT * FROM audio_fps_del WHERE doc_id % 5 <> 1""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audio_probe_del AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_audio_probe('audio_probe_del', 'audio_fps_purged',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_audio_compact" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // audio-store compaction from SQL — the family's twin matrix
      // closed: two generations written in Scala (the llm_audio_compact
      // fixture), doc-id tombstones purged via graft_store_compact, the
      // edited-clone shard probed against the compacted view
      val out = "target/gate_sink/audio_fp_compact_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      val genA = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 150)
        .select(col("doc_id"), col("text"))
      val genB = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 150)
        .select(col("doc_id"), col("text"))
      val mm = graft.operators.Multimodal
      mm.audioFp(mm.asMedia(genA, "doc_id", "text"))
        .write.mode("overwrite").parquet(s"$out/store")
      mm.audioFp(mm.asMedia(genB, "doc_id", "text"))
        .write.mode("append").parquet(s"$out/store")
      s.read.parquet(s"$out/store").createOrReplaceTempView("audcmp_store")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audcmp_tomb AS
                 SELECT doc_id FROM audcmp_store WHERE doc_id % 5 = 1""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW audcmp_v2 AS
                 SELECT * FROM graft_store_compact('audcmp_store', 'doc_id',
                   'audcmp_tomb', '$out/store_v2', '', 1)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW audcmp_probe AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_audio_probe('audcmp_probe', 'audcmp_v2',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_video_frames" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the video frame table from SQL: the media view + the pure
      // per-frame-hash TVF (llm_video_frames' oracle gates it)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW video_media_fr AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id, CAST(text AS BINARY) AS payload FROM sl""")
      e.query("""SELECT doc_id, frame_idx, fhash
                 FROM graft_video_frames('video_media_fr', 'doc_id', 'payload', 4)""")
    }),
    "e_sql_video_dups" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // video near-dup pairs from SQL — the audio/image fixture through
      // the frame-aligned matched-count TVF
      e.query("""CREATE OR REPLACE TEMPORARY VIEW video_media AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id, CAST(text AS BINARY) AS payload FROM sl
                 UNION ALL
                 SELECT doc_id + 3000000,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY)
                 FROM sl""")
      e.query("""SELECT id_a, id_b, n_frames_matched
                 FROM graft_video_dups('video_media', 'doc_id', 'payload',
                                       4, 3, 4, 3)""")
    }),
    "e_sql_video_probe" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // incremental video admission from SQL: frame store written in
      // Scala (the write side), edited-clone probe via the TVF
      val out = "target/gate_sink/video_frames_store_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      graft.operators.Multimodal.videoFrames(
          graft.operators.Multimodal.asMedia(slice, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("video_frames_v")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW video_probe AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT id_new, id_corpus, n_frames_matched
                 FROM graft_video_probe('video_probe', 'video_frames_v',
                                        'doc_id', 'payload', 4, 3, 4, 3)""")
    }),
    "e_sql_video_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // video-store append from SQL: two generations written in Scala
      // (the frame delta IS videoFrames over the new media), the
      // read-back union probed via the unchanged TVF
      val out = "target/gate_sink/video_frames_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      val genA = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 150)
        .select(col("doc_id"), col("text"))
      val genB = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 150)
        .select(col("doc_id"), col("text"))
      val mm = graft.operators.Multimodal
      mm.videoFrames(mm.asMedia(genA, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      mm.videoFrames(mm.asMedia(genB, "doc_id", "text"))
        .write.mode("append").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("video_frames_app")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW video_probe_app AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT id_new, id_corpus, n_frames_matched
                 FROM graft_video_probe('video_probe_app', 'video_frames_app',
                                        'doc_id', 'payload', 4, 3, 4, 3)""")
    }),
    "e_sql_video_delete" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // video takedown from SQL: the frame store is a plain table, so
      // the purge is an anti-predicate VIEW over the read-back — all of
      // a tombstoned video's frame rows drop together on doc_id
      val out = "target/gate_sink/video_frames_delete_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      graft.operators.Multimodal.videoFrames(
          graft.operators.Multimodal.asMedia(slice, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("video_frames_del")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW video_frames_purged AS
                 SELECT * FROM video_frames_del WHERE doc_id % 5 <> 1""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW video_probe_del AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT id_new, id_corpus, n_frames_matched
                 FROM graft_video_probe('video_probe_del', 'video_frames_purged',
                                        'doc_id', 'payload', 4, 3, 4, 3)""")
    }),
    "e_sql_video_compact" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // video-store compaction from SQL — tombstones purged via
      // graft_store_compact, the clone shard probed against the
      // compacted view through the unchanged TVF
      val out = "target/gate_sink/video_frames_compact_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      val genA = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 150)
        .select(col("doc_id"), col("text"))
      val genB = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 150)
        .select(col("doc_id"), col("text"))
      val mm = graft.operators.Multimodal
      mm.videoFrames(mm.asMedia(genA, "doc_id", "text"))
        .write.mode("overwrite").parquet(s"$out/store")
      mm.videoFrames(mm.asMedia(genB, "doc_id", "text"))
        .write.mode("append").parquet(s"$out/store")
      s.read.parquet(s"$out/store").createOrReplaceTempView("vidcmp_store")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW vidcmp_tomb AS
                 SELECT DISTINCT doc_id FROM vidcmp_store WHERE doc_id % 5 = 1""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW vidcmp_v2 AS
                 SELECT * FROM graft_store_compact('vidcmp_store', 'doc_id',
                   'vidcmp_tomb', '$out/store_v2', '', 1)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW vidcmp_probe AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT id_new, id_corpus, n_frames_matched
                 FROM graft_video_probe('vidcmp_probe', 'vidcmp_v2',
                                        'doc_id', 'payload', 4, 3, 4, 3)""")
    }),
    "e_sql_image_incr" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // store side written in Scala (the write side), read back as a
      // view; probe media fixture + TVF probe from SQL
      val out = "target/gate_sink/image_dhash_store_sql"
      val docs = Tables.load(s, d, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val mx = docs.agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("doc_id"))).head().getLong(0)
      val slice = docs.filter(
        org.apache.spark.sql.functions.col("doc_id") > mx - 300 &&
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")) >= 400)
      graft.operators.Multimodal.dHash(
          graft.operators.Multimodal.asMedia(slice, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("image_hashes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW image_probe AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_image_probe('image_probe', 'image_hashes',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_image_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the appended dHash store served from SQL — same artifacts
      // recipe as llm_image_append (generation A written, generation
      // B's 8-byte delta parquet-appended in Scala, the write side),
      // the read-back union probed via the TVF from SQL
      val out = "target/gate_sink/image_dhash_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      val genA = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 150)
        .select(col("doc_id"), col("text"))
      val genB = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 150)
        .select(col("doc_id"), col("text"))
      graft.operators.Multimodal.dHash(
          graft.operators.Multimodal.asMedia(genA, "doc_id", "text"))
        .write.mode("overwrite").parquet(out)
      graft.operators.Multimodal.dHash(
          graft.operators.Multimodal.asMedia(genB, "doc_id", "text"))
        .write.mode("append").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("image_hashes_apnd")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW image_probe_apnd AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_image_probe('image_probe_apnd', 'image_hashes_apnd',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_image_clusters" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // near-dup clusters from SQL: the llm_image_clusters fixture
      // (two independent same-length edits per original) built as a
      // view, closed into components by the deferred TVF — EXPLAIN
      // launches no job, the CC rounds run on execute
      e.query("""CREATE OR REPLACE TEMPORARY VIEW imgc_media AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id, CAST(text AS BINARY) AS payload FROM sl
                 UNION ALL
                 SELECT doc_id + 3000000,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY)
                 FROM sl
                 UNION ALL
                 SELECT doc_id + 6000000,
                        CAST(concat(substring(text, 1, 29), 'ZZZZ',
                                    substring(text, 34)) AS BINARY)
                 FROM sl""")
      e.query("""SELECT node AS doc_id, component AS cluster
                 FROM graft_image_clusters('imgc_media', 'doc_id',
                                           'payload', 3, 4)""")
    }),
    "e_sql_fp_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the appended fingerprint store probed from SQL: generations
      // written/appended in Scala (the write side), the probe a plain
      // SQL anti-predicate over the graft_fingerprint scalar — clones
      // of EITHER generation bounce, novel suffixes pass
      val out = "target/gate_sink/fingerprint_store_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      docs.crossJoin(broadcast(m)).filter(col("doc_id") <= col("m") - 150)
        .select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
        .distinct()
        .write.mode("overwrite").parquet(out)
      docs.crossJoin(broadcast(m)).filter(col("doc_id") > col("m") - 150)
        .select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
        .distinct()
        .write.mode("append").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("graft_fp_store_sql")
      // LEFT ANTI, not NOT IN: the null-aware NOT IN form plans a
      // BroadcastNestedLoopJoin (fingerprints are never null here, so
      // the anti equi-join is semantics-equal and hash-joinable)
      e.query("""WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 tail AS (SELECT doc_id, text FROM documents, m
                          WHERE doc_id > mx - 300),
                 inc AS (SELECT doc_id + 3000000 AS doc_id, text FROM tail
                         UNION ALL
                         SELECT doc_id + 4000000, concat(text, ' novel suffix')
                         FROM tail)
                 SELECT i.doc_id
                 FROM inc i LEFT ANTI JOIN graft_fp_store_sql f
                   ON graft_fingerprint(i.text) = f.fp""")
    }),
    "e_sql_minhash_delete" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // takedown on the dedup index from SQL: the stored frames purge
      // via plain anti-predicate views, the unchanged probe TVF serves
      // them — clones of purged docs admit, survivors' clones bounce
      val out = "target/gate_sink/minhash_index_delete_sql"
      val docs = Tables.load(s, d, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val idx = graft.operators.Dedup.minhashIndex(docs, "doc_id", "text",
        k = 16, nBands = 4)
      idx.bands.write.mode("overwrite").parquet(s"$out/bands")
      idx.sets.write.mode("overwrite").parquet(s"$out/sets")
      s.read.parquet(s"$out/bands").createOrReplaceTempView("del_mh_bands")
      s.read.parquet(s"$out/sets").createOrReplaceTempView("del_mh_sets")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW del_mh_bands_p AS
                 SELECT * FROM del_mh_bands WHERE doc_id % 7 <> 2""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW del_mh_sets_p AS
                 SELECT * FROM del_mh_sets WHERE doc_id % 7 <> 2""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW del_mh_incoming AS
                 SELECT doc_id + 3000000 AS doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 300 FROM documents)""")
      e.query("""SELECT id_new, id_corpus, jaccard
                 FROM graft_minhash_probe('del_mh_bands_p', 'del_mh_sets_p',
                                          'del_mh_incoming', 'doc_id', 'text',
                                          16, 4, 0.5)""")
    }),
    "e_sql_ann_delete" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // takedown from SQL: the stores are plain tables, so the purge is
      // a plain anti-predicate VIEW over the codes read-back — no new
      // machinery, the TVF serves the purged view unchanged
      val out = "target/gate_sink/ann_index_delete_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      // three independent sinks (cents/cbs already driver-side) —
      // overlap them (guide §2.6)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => sim.ivfPqEncode(emb, "vec_id", "embedding", cents, cbs, 16)
          .write.mode("overwrite").parquet(s"$out/codes"))
      s.read.parquet(s"$out/cells").createOrReplaceTempView("del_ann_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("del_ann_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("del_ann_codes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW del_ann_codes_purged AS
                 SELECT * FROM del_ann_codes WHERE vec_id % 10 <> 3""")
      e.query("""SELECT vec_id, adc_score
                 FROM graft_ann_stored('del_ann_codes_purged', 'del_ann_cells',
                                       'del_ann_cbs', 'embeddings',
                                       'vec_id', 'embedding', 0, 10, 2)""")
    }),
    "e_sql_ann_compact" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{broadcast, max}
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // physical compaction from SQL: store prep in Scala (the
      // e_sql_ann_delete convention), then tombstone view →
      // graft_store_compact (deferred rewrite) → unchanged stored
      // serving over the compacted view. Same fixture as
      // llm_ann_index_compact ⇒ the delete oracle gates it
      val out = "target/gate_sink/ann_index_compact_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      val mx = emb.agg(max($"vec_id").as("m"))
      val a = emb.crossJoin(broadcast(mx)).filter($"vec_id" <= $"m" - 100)
        .select($"vec_id", $"embedding")
      val b = emb.crossJoin(broadcast(mx)).filter($"vec_id" > $"m" - 100)
        .select($"vec_id", $"embedding")
      // cells, codebooks and the codes chain are three independent
      // sinks (cents/cbs are already driver-side) — overlap them
      // (guide §2.6; overwrite→append order preserved within codes)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => {
          sim.ivfPqEncode(a, "vec_id", "embedding", cents, cbs, 16)
            .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes")
          sim.ivfPqEncode(b, "vec_id", "embedding", cents, cbs, 16)
            .write.mode("append").partitionBy("cell").parquet(s"$out/codes")
        })
      s.read.parquet(s"$out/cells").createOrReplaceTempView("cmp_ann_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("cmp_ann_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("cmp_ann_codes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW cmp_ann_tomb AS
                 SELECT vec_id FROM cmp_ann_codes WHERE vec_id % 10 = 3""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW cmp_ann_codes_v2 AS
                 SELECT * FROM graft_store_compact('cmp_ann_codes', 'vec_id',
                   'cmp_ann_tomb', '$out/codes_v2', 'cell', 1)""")
      e.query("""SELECT vec_id, adc_score
                 FROM graft_ann_stored('cmp_ann_codes_v2', 'cmp_ann_cells',
                                       'cmp_ann_cbs', 'embeddings',
                                       'vec_id', 'embedding', 0, 10, 2)""")
    }),
    "e_sql_bm25_prf_join" -> ((s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // batch PRF from SQL: stored-index views + the queries view into
      // the deferred batch-PRF TVF
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val ta = graft.operators.TextAnalysis
      val ix = graft.operators.Reuse.Local(
        ta.bm25Index(docs, "doc_id", "text"))
      ix.createOrReplaceTempView("prfj_post")
      ta.bm25DocLens(ix, "doc_id").createOrReplaceTempView("prfj_dl")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW prfj_queries AS
                 SELECT * FROM VALUES (CAST(1 AS BIGINT), 'hash join'),
                                      (2, 'vector scan slow'),
                                      (3, 'zzzunknown') AS t(query_id, qtext)""")
      e.query("""SELECT query_id, doc_id, bm25, rank
                 FROM graft_bm25_prf_join('prfj_post', 'prfj_dl',
                                          'prfj_queries', 'doc_id',
                                          'query_id', 'qtext', 10, 5, 3)""")
    }),
    "e_sql_snippet_join" -> ((s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // batch snippets from SQL: bm25_join run view -> the batch
      // snippet TVF with per-query terms
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val ta = graft.operators.TextAnalysis
      val ix = graft.operators.Reuse.Local(
        ta.bm25Index(docs, "doc_id", "text"))
      ix.createOrReplaceTempView("snj_post")
      ta.bm25DocLens(ix, "doc_id").createOrReplaceTempView("snj_dl")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW snj_queries AS
                 SELECT * FROM VALUES (CAST(1 AS BIGINT), 'hash join'),
                                      (2, 'vector scan slow'),
                                      (3, 'zzzunknown') AS t(query_id, qtext)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW snj_run AS
                 SELECT query_id, doc_id
                 FROM graft_bm25_join('snj_post', 'snj_dl', 'snj_queries',
                                      'doc_id', 'query_id', 'qtext', 5)""")
      e.query("""SELECT query_id, doc_id, hits, start_tok, snippet
                 FROM graft_snippet_join('snj_run', 'documents',
                                         'snj_queries', 'query_id',
                                         'doc_id', 'text', 'qtext', 12)""")
    }),
    "e_sql_bm25_pruned" -> ((s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // bucket-partitioned stored serving from SQL: store prep in
      // Scala (the e_sql_ann convention), the pruned TVF on top
      val out = "target/gate_sink/bm25_index_pruned_sql"
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val ta = graft.operators.TextAnalysis
      val ix = graft.operators.Reuse.Local(
        ta.bm25IndexPartitioned(docs, "doc_id", "text", nBuckets = 8))
      // two independent sinks off the shared checkpoint — overlap (§2.6)
      graft.operators.Par.jobs(Seq(ix),
        () => ix.write.mode("overwrite").partitionBy("tbucket")
          .parquet(s"$out/postings"),
        () => ta.bm25DocLens(ix, "doc_id")
          .write.mode("overwrite").parquet(s"$out/doclens"))
      s.read.parquet(s"$out/postings").createOrReplaceTempView("bm25p_post")
      s.read.parquet(s"$out/doclens").createOrReplaceTempView("bm25p_dl")
      e.query("""SELECT doc_id, bm25
                 FROM graft_bm25_pruned('bm25p_post', 'bm25p_dl', 'doc_id',
                                        'hash,join,vector', 8, 25)""")
    }),
    "e_sql_pipeline13" -> ((s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the batch serving chain as pure TVF/view composition: the
      // bm25_join + knn_join legs ranked per query -> rrf_fuse_by ->
      // the batch-MMR TVF with rel = rrf
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val ta = graft.operators.TextAnalysis
      val ix = graft.operators.Reuse.Local(
        ta.bm25Index(docs, "doc_id", "text"))
      ix.createOrReplaceTempView("p13_post")
      ta.bm25DocLens(ix, "doc_id").createOrReplaceTempView("p13_dl")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p13_queries AS
                 SELECT * FROM VALUES (CAST(1 AS BIGINT), 'hash join'),
                                      (2, 'vector scan slow'),
                                      (3, 'zzzunknown') AS t(query_id, qtext)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p13_bm AS
                 SELECT query_id, doc_id, rank
                 FROM graft_bm25_join('p13_post', 'p13_dl', 'p13_queries',
                                      'doc_id', 'query_id', 'qtext', 20)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p13_qv AS
                 SELECT vec_id AS query_id, embedding FROM embeddings
                 WHERE vec_id IN (1, 2, 3)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p13_ann AS
                 SELECT query_id, neighbor_id AS doc_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                 FROM graft_knn_join('p13_qv', 'embeddings', 'query_id',
                                     'vec_id', 'embedding', 'embedding',
                                     20, 1)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p13_fused AS
                 SELECT query_id, doc_id, rrf
                 FROM graft_rrf_fuse_by('p13_bm,p13_ann', 'query_id',
                                        'doc_id', 10, 60)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p13_cand AS
                 SELECT f.query_id, f.doc_id, e.embedding, f.rrf
                 FROM p13_fused f
                 JOIN embeddings e ON e.vec_id = f.doc_id""")
      e.query("""SELECT query_id, doc_id, rrf, mmr, rank
                 FROM graft_mmr_join('p13_cand', 'query_id', 'doc_id',
                                     'embedding', 'rrf', 3, 0.7)""")
    }),
    "e_sql_bm25_compact" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{broadcast, max}
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // BM25 store compaction from SQL — the e_sql_ann_compact
      // convention: store prep in Scala (same two-generation fixture
      // as llm_bm25_compact), then tombstone view → TWO
      // graft_store_compact rewrites (postings + doclens — the generic
      // TVF serves any id-keyed store) → unchanged stored serving over
      // the compacted views. Same fixture ⇒ the delete oracle gates it
      val out = "target/gate_sink/bm25_index_compact_sql"
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val ta = graft.operators.TextAnalysis
      val m = docs.agg(max($"doc_id").as("m"))
      val a = docs.crossJoin(broadcast(m)).filter($"doc_id" <= $"m" - 100)
        .select($"doc_id", $"text")
      val b = docs.crossJoin(broadcast(m)).filter($"doc_id" > $"m" - 100)
        .select($"doc_id", $"text")
      val ia = graft.operators.Reuse.Local(ta.bm25Index(a, "doc_id", "text"))
      val ib = graft.operators.Reuse.Local(ta.bm25Index(b, "doc_id", "text"))
      // overlap the two per-path lifecycle chains (guide §2.6)
      graft.operators.Par.jobs(Seq(ia, ib),
        () => {
          ia.write.mode("overwrite").parquet(s"$out/postings")
          ib.write.mode("append").parquet(s"$out/postings")
        },
        () => {
          ta.bm25DocLens(ia, "doc_id")
            .write.mode("overwrite").parquet(s"$out/doclens")
          ta.bm25DocLens(ib, "doc_id")
            .write.mode("append").parquet(s"$out/doclens")
        })
      s.read.parquet(s"$out/postings").createOrReplaceTempView("bm25c_post")
      s.read.parquet(s"$out/doclens").createOrReplaceTempView("bm25c_dl")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bm25c_tomb AS
                 SELECT doc_id FROM documents WHERE doc_id % 7 = 0""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW bm25c_post_v2 AS
                 SELECT * FROM graft_store_compact('bm25c_post', 'doc_id',
                   'bm25c_tomb', '$out/postings_v2', '', 1)""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW bm25c_dl_v2 AS
                 SELECT * FROM graft_store_compact('bm25c_dl', 'doc_id',
                   'bm25c_tomb', '$out/doclens_v2', '', 1)""")
      e.query("""SELECT doc_id, bm25
                 FROM graft_bm25_stored('bm25c_post_v2', 'bm25c_dl_v2',
                                        'doc_id', 'hash,join,vector', 25)""")
    }),
    "e_sql_bm25_selective_compact" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{broadcast, max}
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // partition-SELECTIVE compaction from SQL: the bucket-partitioned
      // postings (two generations, the llm_bm25_selective_compact
      // fixture) rewritten IN PLACE by the selective TVF — only
      // tombstone-bearing tbucket partitions rewrite — then the pruned
      // serve over the compacted store; the delete oracle gates it
      val out = "target/gate_sink/bm25_selective_compact_sql"
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val ta = graft.operators.TextAnalysis
      val m = docs.agg(max($"doc_id").as("m"))
      val a = docs.crossJoin(broadcast(m)).filter($"doc_id" <= $"m" - 100)
        .select($"doc_id", $"text")
      val b = docs.crossJoin(broadcast(m)).filter($"doc_id" > $"m" - 100)
        .select($"doc_id", $"text")
      val ia = graft.operators.Reuse.Local(
        ta.bm25IndexPartitioned(a, "doc_id", "text", nBuckets = 8))
      val ib = graft.operators.Reuse.Local(
        ta.bm25IndexPartitioned(b, "doc_id", "text", nBuckets = 8))
      // overlap the two per-path lifecycle chains (guide §2.6)
      graft.operators.Par.jobs(Seq(ia, ib),
        () => {
          ia.write.mode("overwrite").partitionBy("tbucket")
            .parquet(s"$out/postings")
          ib.write.mode("append").partitionBy("tbucket")
            .parquet(s"$out/postings")
        },
        () => {
          ta.bm25DocLens(ia, "doc_id")
            .write.mode("overwrite").parquet(s"$out/doclens")
          ta.bm25DocLens(ib, "doc_id")
            .write.mode("append").parquet(s"$out/doclens")
        })
      s.read.parquet(s"$out/postings").createOrReplaceTempView("bm25sc_post")
      s.read.parquet(s"$out/doclens").createOrReplaceTempView("bm25sc_dl")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW bm25sc_tomb AS
                 SELECT doc_id FROM documents WHERE doc_id % 7 = 0""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW bm25sc_post_v2 AS
                 SELECT * FROM graft_store_compact_selective('bm25sc_post',
                   'doc_id', 'bm25sc_tomb', '$out/postings',
                   '$out/postings_staging', 'tbucket')""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW bm25sc_dl_v2 AS
                 SELECT * FROM graft_store_compact('bm25sc_dl', 'doc_id',
                   'bm25sc_tomb', '$out/doclens_v2', '', 1)""")
      e.query("""SELECT doc_id, bm25
                 FROM graft_bm25_pruned('bm25sc_post_v2', 'bm25sc_dl_v2',
                                        'doc_id', 'hash,join,vector', 8, 25)""")
    }),
    "e_sql_ann_selective_compact" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{broadcast, max}
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // selective compaction on the cell-partitioned codes store from
      // SQL (the e_sql_ann_compact fixture, in-place selective rewrite)
      val out = "target/gate_sink/ann_selective_compact_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      val mx = emb.agg(max($"vec_id").as("m"))
      val a = emb.crossJoin(broadcast(mx)).filter($"vec_id" <= $"m" - 100)
        .select($"vec_id", $"embedding")
      val b = emb.crossJoin(broadcast(mx)).filter($"vec_id" > $"m" - 100)
        .select($"vec_id", $"embedding")
      // three independent sinks — overlap (guide §2.6; the codes chain
      // keeps its overwrite→append order)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => {
          sim.ivfPqEncode(a, "vec_id", "embedding", cents, cbs, 16)
            .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes")
          sim.ivfPqEncode(b, "vec_id", "embedding", cents, cbs, 16)
            .write.mode("append").partitionBy("cell").parquet(s"$out/codes")
        })
      s.read.parquet(s"$out/cells").createOrReplaceTempView("selann_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("selann_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("selann_codes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW selann_tomb AS
                 SELECT vec_id FROM selann_codes WHERE vec_id % 10 = 3""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW selann_codes_v2 AS
                 SELECT * FROM graft_store_compact_selective('selann_codes',
                   'vec_id', 'selann_tomb', '$out/codes',
                   '$out/codes_staging', 'cell')""")
      e.query("""SELECT vec_id, adc_score
                 FROM graft_ann_stored('selann_codes_v2', 'selann_cells',
                                       'selann_cbs', 'embeddings',
                                       'vec_id', 'embedding', 0, 10, 2)""")
    }),
    "e_sql_fp_compact" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // fingerprint-store compaction from SQL — closes the twin matrix
      // for this store (every verb Scala AND SQL): two generations
      // written in Scala (the e_sql_fp_append write side), tombstone
      // fps as a graft_fingerprint view, graft_store_compact rewrite,
      // then the admission probe over the compacted view — clones of
      // PURGED docs admit again, survivors' clones still bounce
      val out = "target/gate_sink/fingerprint_store_compact_sql"
      import org.apache.spark.sql.functions.{broadcast, col, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      docs.crossJoin(broadcast(m)).filter(col("doc_id") <= col("m") - 150)
        .select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
        .distinct()
        .write.mode("overwrite").parquet(s"$out/store")
      docs.crossJoin(broadcast(m)).filter(col("doc_id") > col("m") - 150)
        .select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
        .distinct()
        .write.mode("append").parquet(s"$out/store")
      s.read.parquet(s"$out/store").createOrReplaceTempView("fpcmp_store")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW fpcmp_tomb AS
                 SELECT DISTINCT graft_fingerprint(text) AS fp
                 FROM documents WHERE doc_id % 7 = 0""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW fpcmp_v2 AS
                 SELECT * FROM graft_store_compact('fpcmp_store', 'fp',
                   'fpcmp_tomb', '$out/store_v2', '', 1)""")
      e.query("""WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 tail AS (SELECT doc_id, text FROM documents, m
                          WHERE doc_id > mx - 300),
                 inc AS (SELECT doc_id + 3000000 AS doc_id, text FROM tail
                         UNION ALL
                         SELECT doc_id + 4000000, concat(text, ' novel suffix')
                         FROM tail)
                 SELECT i.doc_id
                 FROM inc i LEFT ANTI JOIN fpcmp_v2 f
                   ON graft_fingerprint(i.text) = f.fp""")
    }),
    "e_sql_image_compact" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // dHash-store compaction from SQL — the image index's last
      // twin-matrix hole closed: two generations written in Scala (the
      // llm_image_compact fixture), doc-id tombstones purged via
      // graft_store_compact, the edited-clone shard probed against the
      // compacted view through the unchanged TVF
      val out = "target/gate_sink/image_dhash_compact_sql"
      import org.apache.spark.sql.functions.{broadcast, col, length, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val slice = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 300 && length(col("text")) >= 400)
        .select(col("doc_id"), col("text"))
      val genA = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 150)
        .select(col("doc_id"), col("text"))
      val genB = slice.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 150)
        .select(col("doc_id"), col("text"))
      val mm = graft.operators.Multimodal
      mm.dHash(mm.asMedia(genA, "doc_id", "text"))
        .write.mode("overwrite").parquet(s"$out/store")
      mm.dHash(mm.asMedia(genB, "doc_id", "text"))
        .write.mode("append").parquet(s"$out/store")
      s.read.parquet(s"$out/store").createOrReplaceTempView("imgcmp_store")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW imgcmp_tomb AS
                 SELECT doc_id FROM imgcmp_store WHERE doc_id % 5 = 1""")
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW imgcmp_v2 AS
                 SELECT * FROM graft_store_compact('imgcmp_store', 'doc_id',
                   'imgcmp_tomb', '$out/store_v2', '', 1)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW imgcmp_probe AS
                 WITH m AS (SELECT max(doc_id) AS mx FROM documents),
                 sl AS (SELECT doc_id, text FROM documents, m
                        WHERE doc_id > mx - 300 AND length(text) >= 400)
                 SELECT doc_id + 3000000 AS doc_id,
                        CAST(concat(substring(text, 1, 10), 'QQQQ',
                                    substring(text, 15)) AS BINARY) AS payload
                 FROM sl""")
      e.query("""SELECT DISTINCT id_new, id_corpus, hamming
                 FROM graft_image_probe('imgcmp_probe', 'imgcmp_v2',
                                        'doc_id', 'payload', 3, 4)""")
    }),
    "e_sql_knn_join" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW knn_queries AS
                 SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10""")
      e.query("""SELECT query_id, neighbor_id, cos_sim
                 FROM graft_knn_join('knn_queries', 'embeddings', 'vec_id',
                                     'vec_id', 'embedding', 'embedding', 5, 1)""")
    }),
    "e_sql_knn_join_ivf" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW knn_queries AS
                 SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10""")
      e.query("""SELECT query_id, neighbor_id, cos_sim
                 FROM graft_knn_join_ivf('knn_queries', 'embeddings', 'vec_id',
                                         'vec_id', 'embedding', 'embedding',
                                         8, 2, 5, 1)""")
    }),
    // batch serving against the stored index from SQL: artifacts
    // written in Scala (the write side), read back as plain views,
    // served via the deferred TVF — same oracle as llm_knn_join_stored
    "e_sql_knn_join_stored" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/knn_stored_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      // three independent sinks (cents/cbs already driver-side) —
      // overlap them (guide §2.6)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => sim.ivfPqEncode(emb, "vec_id", "embedding", cents, cbs, 16)
          .write.mode("overwrite").parquet(s"$out/codes"))
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_knn_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("graft_knn_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_knn_codes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW knn_queries AS
                 SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10""")
      e.query("""SELECT query_id, neighbor_id, adc_score
                 FROM graft_knn_join_stored('graft_knn_codes', 'graft_knn_cells',
                                            'graft_knn_cbs', 'knn_queries',
                                            'vec_id', 'vec_id', 'embedding',
                                            5, 2, 1)""")
    }),
    // two-stage retrieval from one line of SQL (deferred TVF)
    "e_sql_ann_rerank" -> ((s, d) => via(s, d)(
      """SELECT * FROM graft_ann_rerank('embeddings', 'vec_id', 'embedding',
                                        0, 10, 8, 2, 4, 16, 8, 20)""")),
    // the appended minhash index probed from SQL: generation A written
    // in Scala, the admitted shard's delta frames parquet-APPENDED, the
    // union read back as plain views and probed via the existing
    // deferred probe TVF — same oracle as the full-corpus incremental
    // probe, so a lost append hash-mismatches
    "e_sql_minhash_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/minhash_index_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, max}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val m = docs.agg(max(col("doc_id")).as("m"))
      val a = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") <= col("m") - 150).select(col("doc_id"), col("text"))
      val b = docs.crossJoin(broadcast(m))
        .filter(col("doc_id") > col("m") - 150).select(col("doc_id"), col("text"))
      val idxA = graft.operators.Dedup.minhashIndex(a, "doc_id", "text",
        k = 16, nBands = 4)
      idxA.bands.write.mode("overwrite").parquet(s"$out/bands")
      idxA.sets.write.mode("overwrite").parquet(s"$out/sets")
      val delta = graft.operators.Dedup.minhashIndex(b, "doc_id", "text",
        k = 16, nBands = 4)
      delta.bands.write.mode("append").parquet(s"$out/bands")
      delta.sets.write.mode("append").parquet(s"$out/sets")
      s.read.parquet(s"$out/bands").createOrReplaceTempView("graft_mh_bands")
      s.read.parquet(s"$out/sets").createOrReplaceTempView("graft_mh_sets")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_incoming_v AS
                 SELECT doc_id + 3000000 AS doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 300 FROM documents)""")
      e.query("""SELECT * FROM graft_minhash_probe(
                   'graft_mh_bands', 'graft_mh_sets', 'graft_incoming_v',
                   'doc_id', 'text', 16, 4, 0.5)""")
    }),
    // batch two-stage retrieval from SQL: artifacts written in Scala,
    // read back as views, served via the deferred rerank TVF
    "e_sql_knn_join_rerank" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/knn_rerank_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      // three independent sinks (cents/cbs already driver-side) —
      // overlap them (guide §2.6)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => sim.ivfPqEncode(emb, "vec_id", "embedding", cents, cbs, 16)
          .write.mode("overwrite").parquet(s"$out/codes"))
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_rr_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("graft_rr_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_rr_codes")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW knn_queries AS
                 SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10""")
      e.query("""SELECT query_id, neighbor_id, cos_sim
                 FROM graft_knn_join_rerank('graft_rr_codes', 'graft_rr_cells',
                                            'graft_rr_cbs', 'knn_queries',
                                            'embeddings', 'vec_id', 'vec_id',
                                            'embedding', 'embedding',
                                            5, 2, 15, 1)""")
    }),
    // the appended ANN codes table served from SQL — same artifacts
    // recipe as llm_ann_index_append (generation A's index + read-back
    // encode of B + parquet append), probed via graft_ann_stored
    "e_sql_ann_append" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/ann_index_append_sql"
      import org.apache.spark.sql.functions.{broadcast, col, max}
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val m = emb.agg(max(col("vec_id")).as("m"))
      val a = emb.crossJoin(broadcast(m)).filter(col("vec_id") <= col("m") - 100)
        .select(col("vec_id"), col("embedding"))
      val b = emb.crossJoin(broadcast(m)).filter(col("vec_id") > col("m") - 100)
        .select(col("vec_id"), col("embedding"))
      val cents = sim.collectCentroids(a, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(a, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      // three independent corpus-build sinks — overlap them (§2.6);
      // the maintenance append below reads them back, so it follows
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => sim.ivfPqEncode(a, "vec_id", "embedding", cents, cbs, 16)
          .write.mode("overwrite").parquet(s"$out/codes"))
      val cents2 = sim.centroidsFromDf(s.read.parquet(s"$out/cells"))
      val cbs2 = sim.codebooksFromDf(s.read.parquet(s"$out/codebooks"))
      sim.ivfPqEncode(b, "vec_id", "embedding", cents2, cbs2, 16)
        .write.mode("append").parquet(s"$out/codes")
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_apnd_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("graft_apnd_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_apnd_codes")
      e.query("""SELECT vec_id, adc_score
                 FROM graft_ann_stored('graft_apnd_codes', 'graft_apnd_cells',
                                       'graft_apnd_cbs', 'embeddings',
                                       'vec_id', 'embedding', 0, 10, 2)""")
    }),
    // the cell-PARTITIONED store served from SQL: artifacts written
    // partitionBy(cell) in Scala (the write side), graft_ann_stored
    // probes it with the driver-literal cell filter — the scan opens
    // only the probed cells' files; same llm_ann_ivf_pq oracle
    "e_sql_ann_partition_prune" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/ann_index_part_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      // three independent sinks — overlap them (guide §2.6)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => sim.ivfPqEncode(emb, "vec_id", "embedding", cents, cbs, 16)
          .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes"))
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_part_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("graft_part_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_part_codes")
      e.query("""SELECT vec_id, adc_score
                 FROM graft_ann_stored('graft_part_codes', 'graft_part_cells',
                                       'graft_part_cbs', 'embeddings',
                                       'vec_id', 'embedding', 0, 10, 2)""")
    }),
    // the batch serve with static probe-cell pruning from SQL — the
    // graft_knn_join_pruned TVF over the partitioned store; output
    // identical to the unpruned batch serve (same oracle)
    "e_sql_knn_join_pruned" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/knn_stored_part_sql"
      import org.apache.spark.sql.functions.col
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooks(emb, "vec_id", "embedding",
        m = 4, subDim = 16, nCodes = 8)
      // three independent sinks — overlap them (guide §2.6)
      graft.operators.Par.jobs(
        () => sim.centroidsToDf(s, cents)
          .write.mode("overwrite").parquet(s"$out/cells"),
        () => sim.codebooksToDf(s, cbs)
          .write.mode("overwrite").parquet(s"$out/codebooks"),
        () => sim.ivfPqEncode(emb, "vec_id", "embedding", cents, cbs, 16)
          .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes"))
      emb.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
        .createOrReplaceTempView("graft_knnp_queries")
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_knnp_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("graft_knnp_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_knnp_codes")
      e.query("""SELECT query_id, neighbor_id, adc_score
                 FROM graft_knn_join_pruned('graft_knnp_codes',
                        'graft_knnp_cells', 'graft_knnp_cbs',
                        'graft_knnp_queries', 'vec_id', 'vec_id',
                        'embedding', 5, 2, 1)""")
    }),
    // residual serving from SQL: residual-trained artifacts written in
    // Scala (cells + residual codebooks + cell-partitioned residual
    // codes), served by the graft_ann_residual_stored TVF; same oracle
    // as the in-memory residual path
    "e_sql_ann_residual_stored" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/ann_residual_store_sql"
      val emb = Tables.load(s, d, "embeddings")
      val sim = graft.operators.Similarity
      val cents = sim.collectCentroids(emb, "vec_id", "embedding", 8)
      val cbs = sim.pqCodebooksResidual(emb, "vec_id", "embedding", cents,
        m = 4, subDim = 16, nCodes = 8)
      sim.centroidsToDf(s, cents).write.mode("overwrite").parquet(s"$out/cells")
      sim.codebooksToDf(s, cbs).write.mode("overwrite").parquet(s"$out/codebooks")
      sim.ivfPqEncodeResidual(emb, "vec_id", "embedding", cents, cbs, 16)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes")
      s.read.parquet(s"$out/cells").createOrReplaceTempView("graft_res_cells")
      s.read.parquet(s"$out/codebooks").createOrReplaceTempView("graft_res_cbs")
      s.read.parquet(s"$out/codes").createOrReplaceTempView("graft_res_codes")
      e.query("""SELECT vec_id, adc_score
                 FROM graft_ann_residual_stored('graft_res_codes',
                        'graft_res_cells', 'graft_res_cbs', 'embeddings',
                        'vec_id', 'embedding', 0, 10, 2)""")
    }),
    // the crawl front door composed PURELY from TVFs through views:
    // url filter → domain cap → gopher gate → token budget → shards —
    // same oracle as llm_pipeline7
    "e_sql_pipeline7" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_url_docs AS
                 SELECT doc_id,
                   CASE CAST(doc_id % 6 AS INT)
                     WHEN 0 THEN 'https://www.example.com/a/' || doc_id
                     WHEN 1 THEN 'http://blog.spamsite.com/p?id=' || doc_id
                     WHEN 2 THEN 'https://news.bbc.co.uk:443/story/' || doc_id
                     WHEN 3 THEN 'http://EXAMPLE.com/x'
                     WHEN 4 THEN 'https://ads.tracker.net/c'
                     ELSE 'not a url ' || doc_id END AS url
                 FROM documents""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_p7_bl AS
                 SELECT * FROM (VALUES ('spamsite.com'), ('tracker.net'))
                 AS t(domain)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_p7_adm AS
                 SELECT f.doc_id, f.domain, doc.text
                 FROM graft_url_filter('graft_url_docs', 'doc_id', 'url',
                                       'graft_p7_bl') f
                 JOIN documents doc ON doc.doc_id = f.doc_id""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_p7_capped AS
                 SELECT doc_id, text
                 FROM graft_domain_cap('graft_p7_adm', 'domain', 'text',
                                       60, 'doc_id')""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_p7_q AS
                 SELECT g.doc_id, c.text
                 FROM graft_gopher('graft_p7_capped', 'doc_id', 'text',
                                   10, 100000, 2.0, 10.0, 0.1, 1) g
                 JOIN graft_p7_capped c ON c.doc_id = g.doc_id
                 WHERE g.keep""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_p7_b AS
                 SELECT b.doc_id, b.n_toks, b.token_offset, q.text
                 FROM graft_token_budget('graft_p7_q', 'doc_id', 'text', 5000) b
                 JOIN graft_p7_q q ON q.doc_id = b.doc_id""")
      e.query("""SELECT doc_id, n_toks, token_offset, shard, order_key
                 FROM graft_shards('graft_p7_b', 'text', 8, 'shard:')""")
    }),
    // the LR quality filter from SQL: labeled fixture as views, train +
    // score via the deferred TVF — same oracle as llm_quality_classifier
    "e_sql_quality_classifier" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_lr_pos AS
                 SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_lr_neg AS
                 SELECT doc_id, upper(text) AS text FROM documents
                 WHERE doc_id % 2 = 1""")
      e.query("""SELECT * FROM graft_quality_classifier(
                   'graft_lr_pos', 'graft_lr_neg', 'documents',
                   'doc_id', 'text', 64, 2)""")
    }),
    // the SERVING side decoupled: weights trained + persisted in Scala
    // (the write side), the corpus scored from the read-back weight
    // view via the LAZY scoring TVF — same oracle again, so any drift
    // through the weight store hash-mismatches
    "e_sql_lr_score_stored" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/quality_lr_sql"
      import org.apache.spark.sql.functions.{col, upper}
      val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
      val pos = docs.filter(col("doc_id") % 2 === 0)
      val neg = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), upper(col("text")).as("text"))
      val w = graft.operators.Classifier.lrTrain(pos, neg, "doc_id", "text",
        buckets = 64, iters = 2, lr = 0.5)
      graft.operators.Classifier.weightsToDf(s, w)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("graft_lr_weights")
      e.query("""SELECT * FROM graft_lr_score('graft_lr_weights', 'documents',
                                              'doc_id', 'text', 64)""")
    }),
    // the EVAL panel from SQL: weights trained + persisted in Scala,
    // the labeled views defined in SQL, the threshold report via the
    // lazy eval TVF — the llm_lr_eval oracle gates it
    "e_sql_lr_eval" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      val out = "target/gate_sink/quality_lr_eval_sql"
      import org.apache.spark.sql.functions.{col, upper}
      val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
      val pos = docs.filter(col("doc_id") % 2 === 0)
      val neg = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), upper(col("text")).as("text"))
      val w = graft.operators.Classifier.lrTrain(pos, neg, "doc_id", "text",
        buckets = 64, iters = 2, lr = 0.5)
      graft.operators.Classifier.weightsToDf(s, w)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("graft_lr_eval_w")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_lre_pos AS
                 SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_lre_neg AS
                 SELECT doc_id, upper(text) AS text FROM documents
                 WHERE doc_id % 2 = 1""")
      e.query("""SELECT * FROM graft_lr_eval('graft_lr_eval_w',
                   'graft_lre_pos', 'graft_lre_neg', 'doc_id', 'text', 64)""")
    }),
    "e_sql_lr_calibration" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // the reliability table from SQL: weights trained + stored in
      // Scala (the write side), labeled views, the calibration TVF
      val out = "target/gate_sink/quality_lr_calibration_sql"
      import org.apache.spark.sql.functions.{col, upper}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val pos = docs.filter(col("doc_id") % 2 === 0)
      val neg = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), upper(col("text")).as("text"))
      val w = graft.operators.Classifier.lrTrain(pos, neg, "doc_id",
        "text", buckets = 64, iters = 2, lr = 0.5)
      graft.operators.Classifier.weightsToDf(s, w)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView("graft_lrc_w")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_lrc_pos AS
                 SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_lrc_neg AS
                 SELECT doc_id, upper(text) AS text FROM documents
                 WHERE doc_id % 2 = 1""")
      e.query("""SELECT * FROM graft_lr_calibration('graft_lrc_pos',
                   'graft_lrc_neg', 'doc_id', 'text', 'graft_lrc_w',
                   64, 10)""")
    }),
    // the crawl-domain dashboard from one line of SQL over the same
    // URL fixture view as e_sql_url_filter
    "e_sql_domain_report" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_url_docs AS
                 SELECT doc_id,
                   CASE CAST(doc_id % 6 AS INT)
                     WHEN 0 THEN 'https://www.example.com/a/' || doc_id
                     WHEN 1 THEN 'http://blog.spamsite.com/p?id=' || doc_id
                     WHEN 2 THEN 'https://news.bbc.co.uk:443/story/' || doc_id
                     WHEN 3 THEN 'http://EXAMPLE.com/x'
                     WHEN 4 THEN 'https://ads.tracker.net/c'
                     ELSE 'not a url ' || doc_id END AS url
                 FROM documents""")
      e.query(
        "SELECT * FROM graft_domain_report('graft_url_docs', 'url', 20)")
    }),
    // URL/domain admission from SQL over the same deterministic fixture
    "e_sql_url_filter" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_url_docs AS
                 SELECT doc_id,
                   CASE CAST(doc_id % 6 AS INT)
                     WHEN 0 THEN 'https://www.example.com/a/' || doc_id
                     WHEN 1 THEN 'http://blog.spamsite.com/p?id=' || doc_id
                     WHEN 2 THEN 'https://news.bbc.co.uk:443/story/' || doc_id
                     WHEN 3 THEN 'http://EXAMPLE.com/x'
                     WHEN 4 THEN 'https://ads.tracker.net/c'
                     ELSE 'not a url ' || doc_id END AS url
                 FROM documents""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_url_blocklist AS
                 SELECT * FROM (VALUES ('spamsite.com'), ('Tracker.NET'))
                 AS t(domain)""")
      e.query("""SELECT * FROM graft_url_filter('graft_url_docs', 'doc_id',
                                                'url', 'graft_url_blocklist')""")
    }),
    "e_sql_semdedup" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_semdup_corpus AS
                 SELECT vec_id, embedding FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings""")
      e.query(
        "SELECT * FROM graft_semdedup('graft_semdup_corpus', 'vec_id', 'embedding', 8, 1, 0.99)")
    }),
    // deterministic global shuffle from SQL
    "e_sql_shards" -> ((s, d) => via(s, d)(
      "SELECT doc_id, shard, order_key FROM graft_shards('documents', 'text', 32, 'shard:')")),
    // in-document span dedup from SQL
    "e_sql_span_dedup_doc" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_span_dedup_doc('documents', 'doc_id', 'text', 2)")),
    // the Gopher rule panel, fully parameterized from SQL
    "e_sql_gopher" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_gopher('documents', 'doc_id', 'text', 10, 100000, 2.0, 10.0, 0.1, 1)")),
    // relative-threshold pruning from SQL
    "e_sql_quantile_filter" -> ((s, d) => via(s, d)(
      "SELECT doc_id, n_chars FROM graft_quantile_filter('documents', 'n_chars', 0.25)")),
    "e_sql_quantile_by_group" -> ((s, d) => via(s, d)(
      """SELECT doc_id, lang, n_chars
         FROM graft_quantile_filter_by('documents', 'lang', 'n_chars', 0.25)""")),
    // perplexity-proxy scoring from SQL
    "e_sql_unigram_lp" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_unigram_lp('documents', 'doc_id', 'text')")),
    // positional winnowing fingerprints from SQL
    "e_sql_winnow" -> ((s, d) => via(s, d)(
      "SELECT * FROM graft_winnow('documents', 'doc_id', 'text', 3, 4)")),
    // exact shared-span extents from SQL over the planted-overlap view
    "e_sql_overlap_extents" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_ov_docs AS
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 3000000 AS doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)""")
      e.query(
        "SELECT * FROM graft_overlap_extents('graft_ov_docs', 'doc_id', 'text', 8, 4)")
    }),
    // exact-substring removal from SQL over the same planted view
    "e_sql_substr_dedup" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_ov_docs AS
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 3000000 AS doc_id, text FROM documents
                 WHERE doc_id > (SELECT max(doc_id) - 100 FROM documents)""")
      e.query(
        "SELECT * FROM graft_dedup_substrings('graft_ov_docs', 'doc_id', 'text', 8, 4)")
    }),
    // the round-6 flagship prep chain as PURE TVF composition through
    // views — C4 rules, normalize scalar, line dedup, quantile filter,
    // domain cap, shards — zero Scala between stages
    "e_sql_pipeline3" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p3_fix AS
                 SELECT doc_id, source,
                   text || ' end.' || chr(10) || 'no terminal punctuation line' || chr(10) ||
                   CASE WHEN doc_id % 5 = 0 THEN 'Please enable javascript to continue reading.'
                        ELSE 'A perfectly fine closing sentence.' END ||
                   CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'code sample { return 0; }' ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END
                   AS text
                 FROM documents""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p3_clean AS
                 SELECT c.doc_id, graft_normalize(c.clean_text) AS text
                 FROM graft_c4_filters('p3_fix', 'doc_id', 'text', 3, 1) c
                 WHERE c.keep""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p3_dedup AS
                 SELECT l.doc_id, f.source, l.clean_text,
                        length(l.clean_text) AS n_clean
                 FROM graft_line_dedup('p3_clean', 'doc_id', 'text', 1, 'local') l
                 JOIN p3_fix f ON f.doc_id = l.doc_id""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p3_kept AS
                 SELECT * FROM graft_quantile_filter(
                   'p3_dedup', 'n_clean', 0.25, 0, 'local')""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p3_capped AS
                 SELECT * FROM graft_domain_cap(
                   'p3_kept', 'source', 'clean_text', 25, 'doc_id', 'n_clean')""")
      e.query("""SELECT doc_id, source, n_clean, shard, order_key
                 FROM graft_shards('p3_capped', 'clean_text', 8, 'p3:')""")
    }),
    // the round-6b data-selection flow as PURE TVF composition through
    // views: repetition panel -> quality scalar -> deferred rank TVF ->
    // token-budget TVF -> shard TVF, zero Scala between stages.
    // id-keyed stages join text back from the base documents SCAN, not
    // the derived views — re-deriving text through the gopher/rank
    // chain re-evaluated the whole corpus stage once per consumer (the
    // llm_pipeline4 Scala twin always had this shape; 7.5s -> Scala-twin
    // parity on the driver bench)
    "e_sql_pipeline4" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p4_scored AS
                 SELECT d.doc_id, d.text, graft_quality(d.text) AS quality
                 FROM documents d
                 JOIN (SELECT doc_id
                       FROM graft_gopher_rep('documents', 'doc_id', 'text', 2, 5)
                       WHERE keep) k USING (doc_id)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p4_top AS
                 SELECT r.doc_id, d.text
                 FROM graft_rank_norm('p4_scored', 'doc_id', 'quality', 16) r
                 JOIN documents d USING (doc_id)
                 WHERE r.pct_rank >= 0.25""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p4_sel AS
                 SELECT b.doc_id, d.text, b.n_toks, b.token_offset
                 FROM graft_token_budget('p4_top', 'doc_id', 'text', 8000) b
                 JOIN documents d USING (doc_id)""")
      e.query("""SELECT doc_id, n_toks, token_offset, shard, order_key
                 FROM graft_shards('p4_sel', 'text', 8, 'p4:')""")
    }),
    // the round-7 quality-weighted balanced draw as pure SQL: gopher
    // TVF keep -> quality scalar as the sampling weight -> per-language
    // weighted-priority TVF -> shard TVF
    "e_sql_pipeline6" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p6_scored AS
                 SELECT d.doc_id, d.lang, d.text, graft_quality(d.text) AS quality
                 FROM documents d
                 JOIN (SELECT doc_id
                       FROM graft_gopher('documents', 'doc_id', 'text',
                              10, 100000, 2.0, 10.0, 0.1, 1)
                       WHERE keep) k USING (doc_id)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p6_sel AS
                 SELECT doc_id, lang, text, priority
                 FROM graft_sample_weighted_by('p6_scored', 'lang', 'text',
                                               'quality', 'doc_id', 25, 'p6:')""")
      e.query("""SELECT doc_id, lang, priority, shard, order_key
                 FROM graft_shards('p6_sel', 'text', 4, 'p6s:')""")
    }),
    // the raw-crawl ingestion flow as pure SQL composition: strip +
    // normalize scalars -> gopher TVF keep -> keep-first dedup on the
    // fingerprint scalar -> shard TVF
    "e_sql_pipeline5" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query(s"""CREATE OR REPLACE TEMPORARY VIEW p5_clean AS
                 SELECT doc_id,
                        graft_normalize(graft_strip_html(
                          '${LlmQueries.htmlPre}' || text || '${LlmQueries.htmlPost}'))
                          AS text
                 FROM (SELECT doc_id, text FROM documents
                       UNION ALL SELECT doc_id + 700000, text FROM documents)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p5_kept AS
                 SELECT c.doc_id, c.text
                 FROM p5_clean c
                 JOIN graft_gopher('p5_clean', 'doc_id', 'text',
                        10, 100000, 2.0, 10.0, 0.2, 1) g
                   ON g.doc_id = c.doc_id
                 WHERE g.keep""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p5_dedup AS
                 SELECT doc_id, text FROM (
                   SELECT doc_id, text, row_number() OVER (
                     PARTITION BY graft_fingerprint(text)
                     ORDER BY doc_id) AS rn
                   FROM p5_kept) WHERE rn = 1""")
      e.query("""SELECT doc_id, shard, order_key
                 FROM graft_shards('p5_dedup', 'text', 8, 'p5:')""")
    }),
    "e_sql_pipeline14" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      // crawl-to-corpus from SQL: the gzip-member WARC fixture written
      // and the extractor read-back registered in Scala (the source
      // side — the stored-artifact twin convention), the whole prep
      // chain — strip, normalize, gopher, dedup, PACK — in pure TVF
      // composition
      val out = "target/gate_sink/pipeline14_warc_sql"
      import org.apache.spark.sql.functions.{col, concat, lit}
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val base = docs.unionAll(
        docs.select((col("doc_id") + 700000).as("doc_id"), col("text")))
      val wrapped = base.select(col("doc_id"),
        concat(lit("http://graft.local/doc/"), col("doc_id")).as("uri"),
        concat(lit(LlmQueries.htmlPre), col("text"),
          lit(LlmQueries.htmlPost)).as("html"))
      graft.sources.Warc.write(wrapped, "doc_id", "uri", "html", out,
        nFiles = 4, gzip = true)
      s.read.format("graft-extractor").option("extractor", "warc")
        // split size derived from the ACTUAL part-file size (≈4 split
        // boundaries per file, 256 KiB cap — same task count as the
        // fixed 256 KiB at bench scale, but resync coverage holds at
        // any corpus scale; ADVICE r14)
        .option("path", out).option("splitBytes",
          graft.sources.Warc.resyncSplitBytes(s, out).toString).load()
        .createOrReplaceTempView("p14_records")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p14_clean AS
                 SELECT CAST(regexp_extract(record_id, '[0-9]+', 0) AS BIGINT)
                          AS doc_id,
                        graft_normalize(graft_strip_html(payload)) AS text
                 FROM p14_records""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p14_kept AS
                 SELECT c.doc_id, c.text
                 FROM p14_clean c
                 JOIN graft_gopher('p14_clean', 'doc_id', 'text',
                        10, 100000, 2.0, 10.0, 0.2, 1) g
                   ON g.doc_id = c.doc_id
                 WHERE g.keep""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW p14_dedup AS
                 SELECT doc_id, text FROM (
                   SELECT doc_id, text, row_number() OVER (
                     PARTITION BY graft_fingerprint(text)
                     ORDER BY doc_id) AS rn
                   FROM p14_kept) WHERE rn = 1""")
      e.query("""SELECT doc_id, n_toks, token_offset, first_seq, last_seq
                 FROM graft_pack_offsets('p14_dedup', 'doc_id', 'text', 512, 64)""")
    }),
    // DSIR importance weights from SQL: the target corpus is just
    // another SQL view — any predicate can define "what good data looks
    // like" without a line of Scala
    "e_sql_dsir" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_dsir_target AS
                 SELECT doc_id, text FROM documents WHERE lang = 'en'""")
      e.query(
        "SELECT * FROM graft_dsir('documents', 'graft_dsir_target', 'doc_id', 'text', 1024)")
    }),
    // quality-aware per-source cap from SQL (optional by_col arg)
    "e_sql_domain_cap" -> ((s, d) => via(s, d)(
      """SELECT doc_id, source, n_chars
         FROM graft_domain_cap('documents', 'source', 'text', 15, 'doc_id', 'n_chars')""")),
    // the round-5 flagship as pure TVF COMPOSITION: gopher filter and
    // span dedup feed each other through SQL views; the shard TVF reads
    // the cleaned view — three operators chained without a line of Scala
    "e_sql_pipeline2" -> ((s, d) => {
      Tables.registerAll(s, d)
      val e = new Engine(s)
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_p2_kept AS
                 SELECT d.doc_id, d.text FROM documents d
                 JOIN (SELECT doc_id
                       FROM graft_gopher('documents', 'doc_id', 'text',
                                         10, 100000, 2.0, 10.0, 0.1, 1)
                       WHERE keep) k
                 USING (doc_id)""")
      e.query("""CREATE OR REPLACE TEMPORARY VIEW graft_p2_clean AS
                 SELECT doc_id, n_dropped, clean_text
                 FROM graft_span_dedup('graft_p2_kept', 'doc_id', 'text', 16, 1)""")
      e.query(
        "SELECT doc_id, n_dropped, shard, order_key FROM graft_shards('graft_p2_clean', 'clean_text', 32, 'shard:')")
    })
  )

  def oracle: Map[String, String] = Map(
    "e_distinct_on" ->
      """SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
         FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey""",
    "e_distinct_on_nested" ->
      """WITH top_cust AS (
           SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
           FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey)
         SELECT t.c_nationkey, t.c_custkey, t.c_acctbal, o.max_order
         FROM top_cust t
         LEFT JOIN (SELECT DISTINCT ON (o_custkey) o_custkey, o_totalprice AS max_order
                    FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey) o
           ON o.o_custkey = t.c_custkey""",
    "e_qualify" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer
         QUALIFY rn <= 2""",
    "e_distinct_on_setop" ->
      """SELECT DISTINCT ON (c_custkey) c_custkey AS id, c_acctbal AS val
         FROM customer WHERE c_nationkey < 5
         UNION ALL
         (SELECT DISTINCT ON (o_custkey) o_custkey AS id, o_totalprice AS val
          FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey)
         ORDER BY id, val""",
    "e_qualify_setop" ->
      """SELECT c_nationkey AS k, c_custkey AS id,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer
         QUALIFY rn <= 2
         UNION ALL
         SELECT 999 AS k, o_orderkey AS id, 1 AS rn FROM orders
         WHERE o_orderkey < 50
         ORDER BY k, id""",
    "e_federation" ->
      """SELECT n_name, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM customer JOIN orders ON o_custkey = c_custkey
         JOIN nation ON n_nationkey = c_nationkey
         GROUP BY n_name""",
    "e_vars" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE o_totalprice > 250000.0 GROUP BY o_orderpriority""",
    "e_builtin_sql" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym,
              substr(o_orderpriority, -3) AS prio_tail
         FROM orders WHERE o_orderkey < 500""",
    // the SQL-façade gates reuse the Scala-API gates' oracles verbatim:
    // same pipeline, different entry point
    "e_sql_minhash" -> LlmQueries.oracle("llm_minhash_pairs"),
    "e_sql_chunk" -> LlmQueries.oracle("llm_chunk"),
    "e_sql_pack" -> LlmQueries.oracle("llm_pack"),
    "e_sql_chunk_bpe" -> LlmQueries.oracle("llm_chunk_bpe"),
    "e_sql_pack_bpe" -> LlmQueries.oracle("llm_pack_bpe"),
    "e_sql_pipeline10" -> LlmQueries.oracle("llm_pipeline10"),
    "e_sql_sample_k" -> LlmQueries.oracle("llm_sample_k"),
    "e_sql_sample_weighted" -> LlmQueries.oracle("llm_sample_weighted"),
    "e_sql_sample_weighted_strat" -> LlmQueries.oracle("llm_sample_weighted_strat"),
    "e_sql_tfidf" -> LlmQueries.oracle("llm_tfidf"),
    "e_sql_bm25" -> LlmQueries.oracle("llm_bm25"),
    "e_sql_bm25_stored" -> LlmQueries.oracle("llm_bm25"),
    "e_sql_bm25_join" -> LlmQueries.oracle("llm_bm25_join"),
    "e_sql_bm25_append" -> LlmQueries.oracle("llm_bm25"),
    "e_sql_bm25_delete" -> LlmQueries.oracle("llm_bm25_delete"),
    "e_sql_hybrid_rrf" -> LlmQueries.oracle("llm_hybrid_rrf"),
    "e_sql_hybrid_join" -> LlmQueries.oracle("llm_hybrid_join"),
    "e_sql_retrieval_eval" -> LlmQueries.oracle("llm_retrieval_eval"),
    "e_sql_pipeline11" -> LlmQueries.oracle("llm_pipeline11"),
    "e_sql_snippet" -> LlmQueries.oracle("llm_snippet"),
    "e_sql_mmr" -> LlmQueries.oracle("llm_mmr"),
    "e_sql_bm25_prf" -> LlmQueries.oracle("llm_bm25_prf"),
    "e_sql_crawl_delta" -> LlmQueries.oracle("llm_crawl_delta"),
    "e_sql_pipeline12" -> LlmQueries.oracle("llm_pipeline12"),
    "e_sql_corpus_kl" -> LlmQueries.oracle("llm_corpus_kl"),
    "e_sql_containment" -> LlmQueries.oracle("llm_containment"),
    "e_sql_decontaminate" -> LlmQueries.oracle("llm_decontaminate"),
    "e_sql_contamination" -> LlmQueries.oracle("llm_contamination"),
    "e_sql_token_budget" -> LlmQueries.oracle("llm_token_budget"),
    "e_sql_token_budget_bpe" -> LlmQueries.oracle("llm_token_budget_bpe"),
    "e_sql_token_budget_group" -> LlmQueries.oracle("llm_token_budget_group"),
    "e_sql_rank_norm" -> LlmQueries.oracle("llm_rank_norm"),
    "e_sql_rank_norm_group" -> LlmQueries.oracle("llm_rank_norm_group"),
    "e_sql_gopher_rep" -> LlmQueries.oracle("llm_gopher_rep"),
    "e_sql_pipeline4" -> LlmQueries.oracle("llm_pipeline4"),
    "e_sql_cluster_keep" -> LlmQueries.oracle("llm_cluster_keep"),
    "e_sql_cluster_best" -> LlmQueries.oracle("llm_cluster_best"),
    "e_sql_exact_dedup" -> LlmQueries.oracle("llm_exact_dedup"),
    "e_sql_simhash" -> LlmQueries.oracle("llm_simhash_pairs"),
    "e_sql_boilerplate" -> LlmQueries.oracle("llm_boilerplate"),
    "e_sql_vocab" -> LlmQueries.oracle("llm_vocab"),
    "e_sql_sentences" -> LlmQueries.oracle("llm_sentences"),
    "e_sql_minhash_incr" -> LlmQueries.oracle("llm_minhash_incr"),
    "e_sql_sample_strat" -> LlmQueries.oracle("llm_sample_strat"),
    "e_sql_pii_redact" -> LlmQueries.oracle("llm_pii_redact"),
    "e_sql_langid" -> LlmQueries.oracle("llm_langid"),
    "e_sql_fingerprint" -> LlmQueries.oracle("llm_fingerprint"),
    "e_sql_split" -> LlmQueries.oracle("llm_split"),
    "e_sql_text_stats" -> LlmQueries.oracle("llm_text_stats"),
    "e_sql_mix" -> LlmQueries.oracle("llm_mix"),
    "e_sql_cosine" -> LlmQueries.oracle("llm_cosine"),
    "e_sql_rep_ratio" -> LlmQueries.oracle("llm_rep_ratio"),
    "e_sql_resample" -> ExtraQueries.oracle("ts_resample"),
    "e_sql_funnel" -> ExtraQueries.oracle("ts_funnel"),
    "e_sql_retention" -> ExtraQueries.oracle("ts_retention"),
    "e_sql_sessionize" -> ExtraQueries.oracle("ts_sessionize"),
    "e_sql_transitions" -> ExtraQueries.oracle("ts_transitions"),
    "e_sql_embedding_dups" -> LlmQueries.oracle("llm_embedding_dups"),
    "e_sql_span_dedup" -> LlmQueries.oracle("llm_span_dedup"),
    "e_sql_c4_filters" -> LlmQueries.oracle("llm_c4_filters"),
    "e_sql_decontaminate_bloom" -> LlmQueries.oracle("llm_decontaminate"),
    "e_sql_decontam_roundtrip" -> LlmQueries.oracle("llm_decontaminate"),
    "e_sql_normalize" -> LlmQueries.oracle("llm_normalize"),
    "e_sql_html_strip" -> LlmQueries.oracle("llm_html_strip"),
    "e_sql_pipeline5" -> LlmQueries.oracle("llm_pipeline5"),
    "e_sql_pipeline14" -> LlmQueries.oracle("llm_pipeline14"),
    "e_sql_pipeline6" -> LlmQueries.oracle("llm_pipeline6"),
    "e_sql_minhash_probe" -> LlmQueries.oracle("llm_minhash_incr"),
    "e_sql_script" -> LlmQueries.oracle("llm_script"),
    "e_sql_bigram_lp" -> LlmQueries.oracle("llm_bigram_lp"),
    "e_sql_trigram_kn" -> LlmQueries.oracle("llm_trigram_kn"),
    "e_sql_trigram_kn_stored" -> LlmQueries.oracle("llm_trigram_kn_stored"),
    "e_sql_trigram_kn_append" -> LlmQueries.oracle("llm_trigram_kn_stored"),
    "e_sql_unigram_train" -> LlmQueries.oracle("llm_unigram_tok_train"),
    "e_sql_unigram_tokenize" -> LlmQueries.oracle("llm_unigram_tokenize"),
    "e_sql_temperature_mix" -> LlmQueries.oracle("llm_temperature_mix"),
    "e_sql_corpus_report" -> LlmQueries.oracle("llm_corpus_report"),
    "e_sql_line_dedup" -> LlmQueries.oracle("llm_line_dedup"),
    "e_sql_semdedup" -> LlmQueries.oracle("llm_semdedup"),
    "e_sql_embed_outliers" -> LlmQueries.oracle("llm_embed_outliers"),
    "e_sql_knn_join" -> LlmQueries.oracle("llm_knn_join"),
    "e_sql_ann_stored" -> LlmQueries.oracle("llm_ann_ivf_pq"),
    "e_sql_sentence_filter" -> LlmQueries.oracle("llm_sentence_filter"),
    "e_sql_cms_heavy_hitters" -> LlmQueries.oracle("llm_cms_heavy_hitters"),
    "e_sql_distinct_n" -> LlmQueries.oracle("llm_distinct_n"),
    "e_sql_knn_join_ivf" -> LlmQueries.oracle("llm_knn_join_ivf"),
    "e_sql_cluster_sample" -> LlmQueries.oracle("llm_cluster_sample"),
    "e_sql_ann_topk" -> LlmQueries.oracle("llm_ann_topk"),
    "e_sql_ann_lsh" -> LlmQueries.oracle("llm_ann_lsh"),
    "e_sql_ann_ivf" -> LlmQueries.oracle("llm_ann_ivf"),
    "e_sql_ann_pq" -> LlmQueries.oracle("llm_ann_pq"),
    "e_sql_ann_residual" -> LlmQueries.oracle("llm_ann_ivf_pq_residual"),
    "e_sql_image_dups" -> LlmQueries.oracle("llm_image_dups"),
    "e_sql_bpe_count" -> LlmQueries.oracle("llm_bpe_count"),
    "e_sql_bpe_tokenize" -> LlmQueries.oracle("llm_bpe_tokenize"),
    "e_sql_bpe_vocab" -> LlmQueries.oracle("llm_bpe_vocab"),
    "e_sql_image_incr" -> LlmQueries.oracle("llm_image_incr"),
    "e_sql_image_append" -> LlmQueries.oracle("llm_image_incr"),
    "e_sql_image_clusters" -> LlmQueries.oracle("llm_image_clusters"),
    "e_sql_fp_append" -> LlmQueries.oracle("llm_exact_incr"),
    "e_sql_ann_delete" -> LlmQueries.oracle("llm_ann_index_delete"),
    "e_sql_ann_compact" -> LlmQueries.oracle("llm_ann_index_compact"),
    "e_sql_bm25_compact" -> LlmQueries.oracle("llm_bm25_compact"),
    "e_sql_ann_selective_compact" ->
      LlmQueries.oracle("llm_ann_selective_compact"),
    "e_sql_bm25_selective_compact" ->
      LlmQueries.oracle("llm_bm25_selective_compact"),
    "e_sql_fp_compact" -> LlmQueries.oracle("llm_fp_compact"),
    "e_sql_image_compact" -> LlmQueries.oracle("llm_image_compact"),
    "e_sql_bm25_pruned" -> LlmQueries.oracle("llm_bm25_pruned"),
    "e_sql_snippet_join" -> LlmQueries.oracle("llm_snippet_join"),
    "e_sql_bm25_prf_join" -> LlmQueries.oracle("llm_bm25_prf_join"),
    "e_sql_pipeline13" -> LlmQueries.oracle("llm_pipeline13"),
    "e_sql_ann_recall" -> LlmQueries.oracle("llm_ann_recall"),
    "e_sql_ann_sq_stored" -> LlmQueries.oracle("llm_ann_sq_stored"),
    "e_sql_ann_sq_append" -> LlmQueries.oracle("llm_ann_sq_append"),
    "e_sql_ann_ivf_sq_stored" -> LlmQueries.oracle("llm_ann_ivf_sq_stored"),
    "e_sql_image_delete" -> LlmQueries.oracle("llm_image_delete"),
    "e_sql_audio_fp" -> LlmQueries.oracle("llm_audio_fp"),
    "e_sql_audio_dups" -> LlmQueries.oracle("llm_audio_dups"),
    "e_sql_audio_probe" -> LlmQueries.oracle("llm_audio_probe"),
    // the SQL-gated audio lifecycle twins share the Scala verbs'
    // oracles: append serves like the full-slice store, delete/compact
    // like the purge view
    "e_sql_audio_append" -> LlmQueries.oracle("llm_audio_probe"),
    "e_sql_audio_delete" -> LlmQueries.oracle("llm_audio_delete"),
    "e_sql_audio_compact" -> LlmQueries.oracle("llm_audio_delete"),
    // the video family's SQL twins share the Scala verbs' oracles
    "e_sql_video_frames" -> LlmQueries.oracle("llm_video_frames"),
    "e_sql_video_dups" -> LlmQueries.oracle("llm_video_dups"),
    "e_sql_video_probe" -> LlmQueries.oracle("llm_video_probe"),
    "e_sql_video_append" -> LlmQueries.oracle("llm_video_probe"),
    "e_sql_video_delete" -> LlmQueries.oracle("llm_video_delete"),
    "e_sql_video_compact" -> LlmQueries.oracle("llm_video_delete"),
    "e_sql_ann_sq" -> LlmQueries.oracle("llm_ann_sq"),
    "e_sql_ann_ivf_sq" -> LlmQueries.oracle("llm_ann_ivf_sq"),
    "e_sql_bpe_train" -> LlmQueries.oracle("llm_bpe_train"),
    "e_sql_bpe_pretok" -> LlmQueries.oracle("llm_bpe_pretok"),
    "e_sql_retrieval_eval_graded" -> LlmQueries.oracle("llm_retrieval_eval_graded"),
    "e_sql_mmr_join" -> LlmQueries.oracle("llm_mmr_join"),
    "e_sql_hybrid_eval" -> LlmQueries.oracle("llm_hybrid_eval"),
    "e_sql_bpe_roundtrip" -> LlmQueries.oracle("llm_bpe_roundtrip"),
    "e_sql_pipeline8" -> LlmQueries.oracle("llm_pipeline8"),
    "e_sql_pipeline9" -> LlmQueries.oracle("llm_pipeline9"),
    "e_sql_admission_selfdedup" -> LlmQueries.oracle("llm_admission_selfdedup"),
    "e_sql_admission_selfdedup_media" ->
      LlmQueries.oracle("llm_admission_selfdedup_media"),
    "e_sql_minhash_delete" -> LlmQueries.oracle("llm_minhash_index_delete"),
    "e_sql_shards" -> LlmQueries.oracle("llm_shards"),
    "e_sql_span_dedup_doc" -> LlmQueries.oracle("llm_span_dedup_doc"),
    "e_sql_gopher" -> LlmQueries.oracle("llm_gopher"),
    "e_sql_quantile_filter" -> LlmQueries.oracle("llm_quantile_filter"),
    "e_sql_quantile_by_group" -> LlmQueries.oracle("llm_quantile_by_group"),
    "e_sql_unigram_lp" -> LlmQueries.oracle("llm_unigram_lp"),
    "e_sql_winnow" -> LlmQueries.oracle("llm_winnow"),
    "e_sql_domain_cap" -> LlmQueries.oracle("llm_domain_cap"),
    "e_sql_dsir" -> LlmQueries.oracle("llm_dsir"),
    "e_sql_overlap_extents" -> LlmQueries.oracle("llm_overlap_extents"),
    "e_sql_substr_dedup" -> LlmQueries.oracle("llm_substr_dedup"),
    "e_sql_pipeline2" -> LlmQueries.oracle("llm_pipeline2"),
    "e_sql_pipeline3" -> LlmQueries.oracle("llm_pipeline3"),
    "e_sql_knn_join_stored" -> LlmQueries.oracle("llm_knn_join_stored"),
    "e_sql_ann_rerank" -> LlmQueries.oracle("llm_ann_rerank"),
    "e_sql_minhash_append" -> LlmQueries.oracle("llm_minhash_incr"),
    "e_sql_url_filter" -> LlmQueries.oracle("llm_url_filter"),
    "e_sql_knn_join_rerank" -> LlmQueries.oracle("llm_knn_join_rerank"),
    "e_sql_ann_append" -> LlmQueries.oracle("llm_ann_ivf_pq"),
    "e_sql_ann_partition_prune" -> LlmQueries.oracle("llm_ann_ivf_pq"),
    "e_sql_knn_join_pruned" -> LlmQueries.oracle("llm_knn_join_stored"),
    "e_sql_ann_residual_stored" -> LlmQueries.oracle("llm_ann_ivf_pq_residual"),
    "e_sql_domain_report" -> LlmQueries.oracle("llm_domain_report"),
    "e_sql_quality_classifier" -> LlmQueries.oracle("llm_quality_classifier"),
    "e_sql_lr_eval" -> LlmQueries.oracle("llm_lr_eval"),
    "e_sql_lr_calibration" -> LlmQueries.oracle("llm_lr_calibration"),
    "e_sql_pipeline7" -> LlmQueries.oracle("llm_pipeline7"),
    "e_sql_lr_score_stored" -> LlmQueries.oracle("llm_quality_classifier")
  )
}
