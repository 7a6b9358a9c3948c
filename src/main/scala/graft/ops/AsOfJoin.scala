package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — an operator family Spark lacks natively (SPARK-22947):
  * for every left row, attach the right row whose timestamp is the
  * latest `<=` (backward), the earliest `>=` (forward), or the closest
  * in either direction (nearest) per key, optionally bounded by a
  * `tolerance` on the time gap (time-series point-in-time lookup:
  * "the metric value in effect when this event happened").
  *
  * Physical shape — the scale-correct formulation: tag both inputs,
  * UNION them, and run `last(..., ignoreNulls)` windows per key over
  * the merged time order. That is ONE hash shuffle on the key plus a
  * per-key sort (nearest adds a second sort, NOT a second shuffle —
  * both windows share the partitioning) — never a range join
  * (quadratic per key) and never a per-left-row probe. Right rows at
  * the exact left timestamp win in both directions (side ordering puts
  * right before left on ties), matching DuckDB/Kusto `ASOF JOIN`
  * inclusive semantics, which the correctness oracle uses.
  *
  * Tolerance: the matched right timestamp rides inside the window
  * payload, so the bound is a post-window `when` filter on the gap —
  * no extra join or shuffle. Pass an interval column for timestamp
  * keys (`expr("INTERVAL 5 MINUTES")`) or a numeric literal for
  * numeric ones; a match outside the bound degrades to null, same as
  * no match (DuckDB has no tolerance, so tolerant variants are
  * spec-tested rather than oracle-gated).
  *
  * Right rows should be unique per (keys, ts) — pre-aggregate ties
  * upstream (e.g. `max_by`) to keep the picked row deterministic.
  */
object AsOfJoin {

  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightCols: Seq[String], prefix: String = "asof_",
                   tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, rightCols, Backward, tolerance, prefix)

  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String], prefix: String = "asof_",
                  tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, rightCols, Forward, tolerance, prefix)

  /** Ties in gap size prefer the backward match (the value already in
    * effect), the usual time-series convention. */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String], prefix: String = "asof_",
                  tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, rightCols, Nearest, tolerance, prefix)

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           direction: Direction, tolerance: Option[Column],
           prefix: String): DataFrame = {
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
    // candidate payload: only right rows, carrying their ts for the
    // tolerance / nearest-gap comparison after the window
    val cand = when(col("__side") === 0, struct(col("__ts").as("ts"), col("__rv").as("rv")))
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val union = rTagged.unionByName(lTagged)
    val withCands = direction match {
      case Backward => union.withColumn("__b", last(cand, ignoreNulls = true).over(wBack))
      case Forward  => union.withColumn("__f", last(cand, ignoreNulls = true).over(wFwd))
      case Nearest  => union
        .withColumn("__b", last(cand, ignoreNulls = true).over(wBack))
        .withColumn("__f", last(cand, ignoreNulls = true).over(wFwd))
    }
    val backGap = col("__ts") - col("__b.ts")
    val fwdGap = col("__f.ts") - col("__ts")
    def ok(c: Column, gap: Column): Column =
      tolerance.fold(c.isNotNull)(t => c.isNotNull && gap <= t)
    val picked = direction match {
      case Backward => when(ok(col("__b"), backGap), col("__b.rv"))
      case Forward  => when(ok(col("__f"), fwdGap), col("__f.rv"))
      case Nearest =>
        val bOk = ok(col("__b"), backGap)
        val fOk = ok(col("__f"), fwdGap)
        when(bOk && fOk, when(backGap <= fwdGap, col("__b.rv")).otherwise(col("__f.rv")))
          .when(bOk, col("__b.rv"))
          .when(fOk, col("__f.rv"))
    }
    withCands.filter(col("__side") === 1)
      .withColumn("__asof", picked)
      .select(leftCols.map(c => col(s"__lv.$c").as(c)) ++
        rightCols.map(c => col(s"__asof.$c").as(prefix + c)): _*)
  }
}
