package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins (SURVEY.md §7.3 / the 100 TB playbook):
  * pre-bucketing both sides of a recurring join key removes the shuffle
  * entirely — the technique for repeated fact-fact joins at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    Tables.load(spark, TestSpark.sf, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    Tables.load(spark, TestSpark.sf, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    try {
      // disable broadcast so the join strategy must rely on bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no shuffle before the join (only possibly after, for
      // the final agg — which also reuses the bucketing here)
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 0, s"bucketed join must not shuffle; plan had $exchanges exchanges:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("LSH-bucket-partitioned embeddings: ANN probe scans only its partitions") {
    import graft.operators.Similarity
    import spark.implicits._
    // the scale claim behind lshTopK/embeddingNearDups: when the corpus
    // is WRITTEN partitioned by bucket, probing is partition PRUNING —
    // the scan never touches other buckets' files
    val planes = Similarity.planeSigns(4, 64)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshpart").toString
    try {
      Tables.load(spark, TestSpark.sf, "embeddings")
        .withColumn("bucket", Similarity.lshBucket($"embedding", planes))
        .write.partitionBy("bucket").mode("overwrite").parquet(dir)
      val part = spark.read.parquet(dir)
      val nBuckets = part.select($"bucket").distinct().count()
      assert(nBuckets > 1, "fixture corpus must span multiple buckets")
      val probe = part.filter($"bucket" === 3)
      val plan = probe.queryExecution.executedPlan.toString
      // the bucket predicate must land in PartitionFilters, not as a
      // post-scan filter over all files
      assert(plan.contains("PartitionFilters: [isnotnull(bucket"),
        s"bucket probe must prune partitions:\n$plan")
      val scannedAll = part.queryExecution.executedPlan.toString
      // and the pruned scan reads fewer files than the full corpus scan
      def files(p: org.apache.spark.sql.DataFrame): Long =
        p.queryExecution.executedPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }.sum
      assert(files(probe) < files(part),
        "pruned probe must touch strictly fewer files than a full scan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
