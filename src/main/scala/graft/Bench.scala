package graft

import org.apache.spark.sql.SparkSession

/** Bench protocol (BASELINE.md): per-query wall-clock on
  * SPARK_GRAFT_SF_DIR, one warm-up of the catalog, noop sink so every
  * query's full column set is actually computed (a count() would let
  * Catalyst prune the projections being measured). Prints exactly one
  * JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Tables.session("graft-bench")
    // warm-up: touch every table's footer + JIT the read path
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // failure sentinel — keeps broken queries visible in the JSON
        }
      }.sorted
      name -> (if (times.contains(-1.0)) -1.0 else times(times.length / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
