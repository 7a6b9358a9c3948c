package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel matching — the restricted, scale-safe core of
  * Kusto's `scan` operator (sequence detection over an event stream):
  * for each key, find the EARLIEST completion of an ordered step
  * sequence, where step i must occur strictly after the matched step
  * i−1. The greedy earliest-match is the standard funnel semantics
  * (matching earliest t1 then earliest subsequent t2, … minimizes each
  * prefix, so a sequence is found iff one exists).
  *
  * Scale shape: ONE hash shuffle on the key; each step is a window
  * `min(when(step ∧ ts > prev))` over the SAME partitioning, so Catalyst
  * plans consecutive Window operators over one Exchange (plan-pinned in
  * PlanShapeSpec) — no self-joins, no per-key arrays, no state larger
  * than a timestamp per step. At 100 TB this is the only shape that
  * survives: funnels over billions of users are exactly "partition by
  * user, a handful of running minima per partition".
  *
  * Reference note: the reference connector has no query engine; funnel
  * probes are what its users run IN Kusto over sunk events (`scan` /
  * funnel dashboards). This supplies that capability Spark-side.
  */
object Funnel {

  /** Per-key earliest completion of `steps` (matched on `stepCol`),
    * ordered by `tsCol`. Output: one row per key that entered the funnel
    * (has step 1), with `t1..tn` timestamps (null from the first stalled
    * step on) and `converted` = reached the last step. */
  def earliest(df: DataFrame, keyCol: Column, tsCol: Column, stepCol: Column,
               steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = df.select(keyCol.as("k"), tsCol.as("ts"), stepCol.as("step"))
    val w = Window.partitionBy(col("k"))
    val stepped = steps.zipWithIndex.foldLeft(base) { case (d, (s, i)) =>
      val cond =
        if (i == 0) col("step") === s
        else col("step") === s && col("ts") > col(s"t$i")
      d.withColumn(s"t${i + 1}", min(when(cond, col("ts"))).over(w))
    }
    // window columns are constant per key — any agg collapses to one row
    val aggs = steps.indices.map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}"))
    stepped
      .where(col("t1").isNotNull)
      .groupBy(col("k"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("converted", col(s"t${steps.length}").isNotNull)
  }
}
