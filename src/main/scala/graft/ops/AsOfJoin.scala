package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (SPARK-22947):
  * for every left row, attach the LATEST right row whose timestamp is
  * `<=` the left timestamp, per key (time-series point-in-time lookup:
  * "the metric value in effect when this event happened").
  *
  * Physical shape — the scale-correct formulation: tag both inputs,
  * UNION them, and run one `last(..., ignoreNulls)` window per key over
  * the merged time order. That is ONE hash shuffle on the key plus a
  * per-key sort — never a range join (quadratic per key) and never a
  * per-left-row probe. Right rows at the exact left timestamp win (side
  * ordering puts right before left on ties), matching DuckDB/Kusto
  * `ASOF JOIN` `>=` semantics, which the correctness oracle uses.
  *
  * Right rows should be unique per (keys, ts) — pre-aggregate ties
  * upstream (e.g. `max_by`) to keep the picked row deterministic.
  */
object AsOfJoin {

  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.fields)).as("__lv"),
        struct(rightCols.map(col): _*).as("__rv")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__lv"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)).as("__rv")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__lv.$c").as(c)) ++
        rightCols.map(c => col(s"__asof.$c").as(prefix + c)): _*)
  }
}
