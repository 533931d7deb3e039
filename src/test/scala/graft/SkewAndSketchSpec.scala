package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** Skew-salting correctness + sketch aggregates (SURVEY.md A4/A8 scale
  * variants) + a typed-Dataset usage check (§1.3). */
class SkewAndSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted aggregation equals plain aggregation (sum/count/min/max)") {
    import spark.implicits._
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("total"), count(lit(1)).as("n"),
        min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Skew.saltedAgg(li, Seq($"l_returnflag"), buckets = 16,
      partial = Seq(sum($"l_quantity").as("s"), count(lit(1)).as("c"),
        min($"l_orderkey").as("mn"), max($"l_orderkey").as("mx")),
      merge = Seq(sum($"s").as("total"), sum($"c").as("n"),
        min($"mn").as("lo"), max($"mx").as("hi")),
      saltBy = Seq($"l_orderkey", $"l_linenumber"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted == plain)
  }

  test("salted join spreads hot keys and preserves the join result") {
    import spark.implicits._
    // heavily skewed big side: 10k rows all with key 1, few with others
    val big = spark.range(10000).select(lit(1L).as("k"), $"id".as("payload"))
      .unionAll(spark.range(10).select(($"id" + 2).as("k"), $"id".as("payload")))
    val small = Seq((1L, "hot"), (2L, "a"), (5L, "b")).toDF("k", "name")
    val (bs, ss) = Skew.saltedJoinKeys(big, small, "k", buckets = 8)
    val saltedResult = bs.join(ss, Seq("k", "__salt"))
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plainResult = big.join(small, Seq("k"))
      .groupBy($"name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedResult == plainResult)
    assert(plainResult("hot") == 10000L)
  }

  test("HLL sketch: approx_count_distinct within rsd of exact (A4 scale variant)") {
    import spark.implicits._
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx $approx too far from exact $exact")
  }

  test("AQE splits skewed join partitions at runtime (the no-rewrite skew path)") {
    import spark.implicits._
    // salting (above) is the query-rewrite answer to skew; AQE's skew
    // join is the runtime answer — same query text, the engine splits
    // oversized partitions after seeing map-stage sizes. Thresholds are
    // lowered so the toy corpus trips the optimization the way a
    // multi-GB hot key would on a cluster.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // the downstream agg would need a re-shuffle after the split, which
      // AQE declines by default — force it, as one would for a genuinely
      // hot key where the split is worth an extra exchange
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val big = spark.range(200000).select(lit(1L).as("k"), $"id".as("payload"))
        .unionAll(spark.range(200).select(($"id" % 50 + 2).as("k"), $"id".as("payload")))
      val small = spark.range(60).select($"id".as("k"), ($"id" * 7).as("v"))
      val joined = big.join(small, "k").groupBy($"k").agg(count(lit(1)).as("n"))
      val result = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(result(1L) == 200000L, "skew-split join must stay correct")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have marked the hot-key join partition as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("typed Dataset over the TPC-H schema (§1.3 Dataset[T] usage)") {
    import spark.implicits._
    val ds = Tables.load(spark, TestSpark.sf, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_returnflag").as[Line]
    val byFlag = ds.groupByKey(_.l_returnflag)
      .mapGroups((k, it) => (k, it.map(_.l_quantity).sum))
      .collect().toMap
    val sql = Tables.load(spark, TestSpark.sf, "lineitem")
      .groupBy($"l_returnflag").agg(sum($"l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byFlag.keySet == sql.keySet)
    byFlag.foreach { case (k, v) => assert(math.abs(v - sql(k)) < 1e-6) }
  }
}
