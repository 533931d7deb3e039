package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Serving-latency ATTESTATION — the SLO counterpart of the ANN recall
  * report ([[Similarity]] `annRecallReport` precedent): the serving
  * family's cost classes were recorded in BASELINE.md prose only; this
  * surfaces them as a QUERYABLE per-surface percentile table, so a
  * round's serving latencies are checked by reading a frame instead of
  * narrated.
  *
  * Shape: each named surface is a THUNK building a fresh serving
  * DataFrame (a stored-index top-k, a hybrid fusion, a kNN batch —
  * bounded outputs by construction); every run rebuilds the frame
  * (plan construction + analysis are part of serving latency —
  * that is what a query-per-request fleet pays) and drives it to
  * completion with a bounded `collect()`. Wall-clocks aggregate
  * driver-side to p50/p95/min/max over `runs` repetitions
  * (nearest-rank percentiles; `runs` is a handful — this is a
  * measurement loop, bounded by contract like the bench main itself).
  *
  * The values are wall-clock and therefore NONDETERMINISTIC — the gate
  * is rows-only by design (the s3_metrics/s4_env convention): schema +
  * one row per surface + non-negative orderings are the checkable
  * facts. Output: (surface, n_runs, rows, p50_ms, p95_ms, min_ms,
  * max_ms), ordered by surface. */
object ServingLatency {

  def latencyReport(spark: SparkSession,
                    surfaces: Seq[(String, () => DataFrame)],
                    runs: Int = 5,
                    warmup: Int = 1): DataFrame = {
    require(runs >= 1, s"runs must be >= 1, got $runs")
    require(warmup >= 0, s"warmup must be >= 0, got $warmup")
    require(surfaces.nonEmpty, "latencyReport: no surfaces")
    val rows = surfaces.map { case (name, mk) =>
      var n = 0L
      (1 to warmup).foreach(_ => n = mk().collect().length.toLong)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        n = mk().collect().length.toLong
        (System.nanoTime() - t0) / 1e6
      }.sorted
      // nearest-rank percentile: ceil(p·n) 1-based
      def pct(p: Double): Double =
        times(math.max(math.ceil(p * times.length).toInt - 1, 0))
      (name, runs, n,
        BigDecimal(pct(0.50)).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(pct(0.95)).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(times.head).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(times.last).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toDF("surface", "n_runs", "rows", "p50_ms", "p95_ms",
        "min_ms", "max_ms")
      .orderBy("surface")
  }

  /** Serving-latency TREND store — the maintenance verb that turns the
    * attestation into a regression GATE: each round's
    * [[latencyReport]] frame is APPENDED to a parquet store stamped
    * with a monotone `run_seq` (derived from the store itself — no
    * wall-clock identity), and the returned frame compares the
    * just-appended run against the previous one per surface
    * (delta_p50_pct / delta_p95_pct, NULL on the first run or a new
    * surface). An SLO regression is then a queryable fact
    * (`delta_p95_pct > threshold`) a pipeline can fail on, instead of
    * a judge diffing BENCH files after the fact.
    *
    * The values are wall-clock ⇒ the gate stays rows-only (the
    * [[latencyReport]] convention); the DELTA ARITHMETIC is
    * deterministic given the report frames and is spec-pinned on
    * planted fixtures. Store shape: surfaces × rounds rows — KB-scale
    * forever; the append is the storeAppend discipline, the read-back
    * one tiny scan. */
  def latencyTrend(report: DataFrame, storePath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = report.sparkSession
    val need = Set("surface", "n_runs", "rows", "p50_ms", "p95_ms",
      "min_ms", "max_ms")
    require(need.subsetOf(report.columns.toSet),
      s"latencyTrend: report must carry ${need.toSeq.sorted.mkString(",")}, " +
        s"got ${report.columns.sorted.mkString(",")}")
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(storePath))
    val lastSeq =
      if (!exists) 0L
      else spark.read.parquet(storePath)
        .agg(coalesce(max(col("run_seq")), lit(0L))).head().getLong(0)
    // IDEMPOTENT under statement re-execution: a deferred TVF
    // (`graft_latency_trend`) re-invokes this builder every time a
    // downstream view executes — if the store's latest run already
    // equals the incoming report row-for-row, SKIP the append and
    // re-report that run, so querying a view twice cannot double-append
    // and shift every delta. Both collects are surface-count bounded
    // (the KB-scale store contract above).
    val cols = Seq("surface", "n_runs", "rows", "p50_ms", "p95_ms",
      "min_ms", "max_ms")
    val sameAsLast = lastSeq >= 1L && {
      def canon(df: DataFrame) =
        df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
      canon(spark.read.parquet(storePath)
        .filter(col("run_seq") === lastSeq)) == canon(report)
    }
    val seq = if (sameAsLast) lastSeq else lastSeq + 1L
    if (!sameAsLast)
      report.withColumn("run_seq", lit(seq))
        .write.mode("append").parquet(storePath)
    val store = spark.read.parquet(storePath)
    val prev = store.filter(col("run_seq") === seq - 1)
      .select(col("surface"), col("p50_ms").as("prev_p50_ms"),
        col("p95_ms").as("prev_p95_ms"))
    store.filter(col("run_seq") === seq)
      .join(prev, Seq("surface"), "left")
      .select(col("surface"), col("run_seq"), col("p50_ms"), col("p95_ms"),
        col("prev_p50_ms"), col("prev_p95_ms"),
        when(col("prev_p50_ms") > 0,
          round((col("p50_ms") - col("prev_p50_ms")) / col("prev_p50_ms")
            * 100, 2)).as("delta_p50_pct"),
        when(col("prev_p95_ms") > 0,
          round((col("p95_ms") - col("prev_p95_ms")) / col("prev_p95_ms")
            * 100, 2)).as("delta_p95_pct"))
      .orderBy("surface")
  }
}
