package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
