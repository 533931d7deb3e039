package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query PROFILER (VERDICT r11 #1): for each named query, a fresh
  * run counting Spark jobs / stages / tasks plus the build-vs-execute
  * wall split — build = `SparkEntry.queries(name)(spark, dir)` (plan
  * construction: Dialect rewrite, spark.sql parse+analyze, TVF builder
  * invocation), exec = the noop-sink action. The tool behind the
  * `e_sql_*`-façade-vs-Scala-twin adjudication in BASELINE.md.
  *
  * Usage: runMain graft.ProfileQuery [sfDir] name1 name2 ...
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail)
      else (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), args)
    val spark = Tables.session("graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    println(f"${"query"}%-28s ${"build_s"}%8s ${"exec_s"}%8s ${"total_s"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s")
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      // deterministic drain: block until every queued event from the
      // previous query is delivered — a fixed sleep can bleed one
      // query's events into the next counters on a loaded machine
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      // same block hygiene as Bench.timeOne: earlier queries' dead
      // localCheckpoint blocks must not tax this query's measurement
      BlockHygiene.dropDeadBlocks(spark)
      jobs.set(0); stages.set(0); tasks.set(0L)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      println(f"$name%-28s ${(t1 - t0) / 1e9}%8.3f ${(t2 - t1) / 1e9}%8.3f ${(t2 - t0) / 1e9}%8.3f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d")
    }
    spark.stop()
  }
}
