package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog helper over the driver-generated parquet testdata
  * (TESTDATA.md / FIXTURES.md §A). The reference serves every table on
  * demand through an "extractor" (serverboards/exosql `lib/exosql.ex` [U],
  * see SURVEY.md §1.2); here the equivalent role is played by Spark's
  * parquet source — lazy, columnar, with predicate pushdown and column
  * pruning for free. Custom extractor-style connectors live in
  * [[graft.sources]].
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver has generated events.ts two ways across rounds:
      // TIMESTAMP(NANOS) (which Spark's reader rejects — read nanos as
      // long, floor to micros) and plain µs TIMESTAMP (read as NTZ under
      // inferTimestampNTZ). Branch on the read type and normalize both to
      // a session-UTC TimestampType column, so downstream queries and the
      // DuckDB oracle see identical µs wall-clock values either way.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Last dir registered per session — registerAll is called from every
    * SQL-surface query builder, and each call re-reads ten parquet
    * footers on the driver (~0.7 s at sf0.1: measured as the constant
    * overhead every `e_*` bench key paid over its Scala twin). Weak keys
    * so dropped sessions can be collected. */
  private val registeredDirs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every testdata table as a temp view named after the table.
    * Idempotent per (session, dir): repeat calls are no-ops unless the
    * dir switched or a canonical view was dropped (cheap in-memory
    * catalog probes). A view REPLACED under a canonical name is not
    * detected — callers own those names. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (dir == registeredDirs.get(spark) &&
        all.forall(n => spark.catalog.tableExists(n))) return
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    registeredDirs.put(spark, dir)
  }

  /** Standard session used by runnable mains. local[N] but every choice
    * (AQE, 32 shuffle partitions, broadcast threshold) is the one you'd
    * make on a multi-executor cluster; partition counts come from data
    * size, not hardware assumptions. */
  def session(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(graft.sources.CsvCoercion.extensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
