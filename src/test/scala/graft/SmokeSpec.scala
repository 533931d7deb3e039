package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (local[4] keeps test startup light;
  * all plan-shaping configs match production settings in Tables.session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(graft.sources.CsvCoercion.extensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** t1 smoke (SURVEY.md §5): every declared operator runs on sf0.001. */
class SmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry flagship query returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    assert(rows.map(_.getAs[Double]("revenue")).forall(_ > 0))
  }

  test("every declared query has an oracle or is explicitly oracle-free") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // oracle-free queries are allowed (driver does rows-only check) but
    // must be deliberate — keep this list in sync when adding them.
    // llm_serving_latency reports wall-clock percentiles — the values
    // are nondeterministic by nature; schema + per-surface rows are
    // the checkable facts (rows-only driver check)
    val allowedOracleFree = Set("s3_metrics", "s4_env",
      "llm_serving_latency", "llm_latency_trend")
    assert(missing == allowedOracleFree, s"queries without oracle: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty)
      df.collect() // must not throw
    }
  }
}
