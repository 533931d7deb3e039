package graft

import graft.engine.{Catalog, Engine}

/** End-to-end demo of the user surface (what a serverboards/exosql user
  * would run after switching): federation across catalog namespaces,
  * exosql builtins in SQL, $variables, DISTINCT ON, format_result.
  * `sbt "runMain graft.Demo [sfDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session("graft-demo")
    val engine = new Engine(spark)
    Tables.registerAll(spark, dir)
    Catalog.registerParquetDb(spark, "tpch", dir, Seq("customer", "orders", "nation"))

    println("== flagship (TPC-H Q5 shape) ==")
    println(engine.formatResult(SparkEntry.queries("q5_flagship")(spark, dir)))

    println("== exosql builtins + $vars through SQL ==")
    println(engine.formatResult(engine.query(
      """SELECT o_orderpriority,
                strftime(min(o_orderdate), '%Y-%m-%d (%A)') AS first_order,
                count(*) AS n
         FROM orders WHERE o_totalprice > $min GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
      Map("min" -> 200000.0))))

    println("== DISTINCT ON (dialect shim) ==")
    println(engine.formatResult(engine.query(
      """SELECT DISTINCT ON (c_nationkey) c_nationkey, c_name, c_acctbal
         FROM customer ORDER BY c_nationkey, c_acctbal DESC LIMIT 5""")))

    println("== cross-namespace federation ==")
    println(engine.formatResult(engine.query(
      """SELECT n.n_name, count(*) AS n_orders
         FROM tpch.customer c JOIN tpch.orders o ON c.c_custkey = o.o_custkey
         JOIN tpch.nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name ORDER BY n_orders DESC LIMIT 5""")))

    println("== extractor table (DSv2, pushdown) ==")
    println(engine.formatResult(
      spark.read.format("graft-extractor").option("extractor", "range")
        .option("end", "1000000").load()
        .filter(org.apache.spark.sql.functions.col("id") > 999995)))

    Catalog.dropDb(spark, "tpch")
    spark.stop()
  }
}
