package graft

import java.nio.file.{Files, Paths}

/** Optimization-round deliverable helper: write each named query's
  * `.explain("formatted")` output to <outDir>/<name>_<tag>.txt so plan
  * claims in OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.ExplainDump <outDir> <tag> name1 name2 ...
  * sfDir comes from SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 —
  * the bench scale, so plan shapes match what the bench measures).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // a failed dump must FAIL the tool (ADVICE r14): exiting 0 with the
    // output file never (re)written lets an adjudication silently diff a
    // stale artifact. Also delete any pre-existing file up front so a
    // failure can never leave an old plan masquerading as this run's.
    var failures = 0
    for (name <- names) {
      Files.deleteIfExists(Paths.get(s"$outDir/${name}_$tag.txt"))
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
            println(s"[explain] wrote $outDir/${name}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
            failures += 1
          }
        case None =>
          System.err.println(s"[explain] no such query: $name")
          failures += 1
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
