package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical "operator Spark lacks" (SURVEY.md J7):
  * for every left row, the latest right row with `rightTs <= leftTs`
  * within the same key (LEFT semantics: unmatched left rows keep nulls).
  *
  * Implemented by COMPOSITION (preference (a) of the custom-operator
  * ladder): tag both sides, union on (key, ts), and carry the most
  * recent right payload forward with an ignore-nulls `last` window.
  * One shuffle on the key, one per-key sort — the scalable shape; no
  * nested-loop, no per-key driver logic. Ties (rightTs == leftTs) take
  * the right row (ASOF >= semantics, matching DuckDB's ASOF JOIN).
  */
object AsOf {

  /** @param rightCols right columns to carry (beyond the keys). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    val rightStructType = right.select(rightCols.map(col): _*).schema
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(rightStructType).as("__r")): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(left.schema).as("__l") :+ payload.as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(n => col(s"__l.$n").as(n)) ++
        rightCols.map(n => col(s"__match.$n").as(s"r_$n")): _*)
  }
}
