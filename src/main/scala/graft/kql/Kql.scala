package graft.kql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KQL-parity query surface, expressed as thin DataFrame combinators.
  *
  * The reference connector (Azure/kafka-sink-azure-kusto) delegates all
  * relational work to Kusto and emits KQL for validation/verification
  * (see SURVEY.md §2.2). This object re-expresses every KQL construct the
  * reference emits as a Catalyst-native transform, so the same assertions
  * run inside Spark with full optimizer support (pushdown, pruning,
  * whole-stage codegen) instead of a remote engine:
  *
  *  - `TBL | count`                         — reference KustoSinkTask.java:46
  *  - `where … | project …, pack_all()`     — reference it/KustoSinkIT.java:269-271
  *  - `where c == v / in (…) / startswith`  — reference grafana dashboards
  *  - `extend S = case(p1, v1, …, default)`
  *  - `order by … / top N by … / take N`
  *  - `summarize arg_max(ts, v) by k`
  *
  * Everything here is a pure logical-plan builder: no shuffles beyond what
  * the operator semantically requires, no UDFs, nothing that blocks
  * whole-stage codegen. At 100 TB these operators scale exactly as their
  * underlying Catalyst plans do (aggregates are partial+final, top-k is
  * TakeOrderedAndProject — no global sort materialization).
  */
object Kql {

  /** KQL emits `"k":null` for null property-bag entries; Spark's to_json
    * drops null fields by default, so force them kept (matches both KQL
    * pack_all and DuckDB to_json(struct_pack(...)) semantics).
    */
  private val packOpts = Map("ignoreNullFields" -> "false")

  /** KQL `pack_all()`: every column of the row packed into a JSON object
    * (property bag). Equivalent Catalyst form: `to_json(struct(*))`.
    */
  def packAll(df: DataFrame): Column =
    to_json(struct(df.columns.toIndexedSeq.map(col): _*), packOpts)

  /** `pack(...)` over an explicit column list (preserves given order). */
  def pack(cols: Column*): Column = to_json(struct(cols: _*), packOpts)

  /** JSON-pack an already-built struct column (the `*_dynamic` scalar
    * family returns one struct that becomes one bag). */
  def packStruct(s: Column): Column = to_json(s, packOpts)

  /** KQL `case(p1, v1, p2, v2, …, default)`. */
  def kqlCase(branches: Seq[(Column, Column)], default: Column): Column = {
    require(branches.nonEmpty, "case() needs at least one predicate/value pair")
    val first = when(branches.head._1, branches.head._2)
    branches.tail.foldLeft(first) { case (acc, (p, v)) => acc.when(p, v) }
      .otherwise(default)
  }

  /** KQL `arg_max(maximized, returned)` as an aggregate: value of
    * `returned` on the row where `maximized` is largest. Catalyst
    * `max_by` — a single-pass partial/final aggregate, no window shuffle.
    */
  def argMax(maximized: Column, returned: Column): Column = max_by(returned, maximized)

  /** KQL `arg_min(minimized, returned)`. */
  def argMin(minimized: Column, returned: Column): Column = min_by(returned, minimized)

  implicit class KqlOps(private val df: DataFrame) extends AnyVal {
    /** KQL `| where pred`. */
    def kqlWhere(pred: Column): DataFrame = df.filter(pred)

    /** KQL `| project cols…`. */
    def kqlProject(cols: Column*): DataFrame = df.select(cols: _*)

    /** KQL `| extend name = expr`. */
    def kqlExtend(name: String, expr: Column): DataFrame = df.withColumn(name, expr)

    /** KQL `| count` → one row, column `cnt`. */
    def kqlCount(alias: String = "cnt"): DataFrame = df.agg(count(lit(1)).as(alias))

    /** KQL `| summarize aggs by keys`. */
    def kqlSummarize(by: Seq[Column], aggs: (String, Column)*): DataFrame = {
      require(aggs.nonEmpty, "summarize needs at least one aggregate")
      df.groupBy(by: _*).agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    }

    /** KQL `| order by cols` (stable only if cols are a total order). */
    def kqlOrderBy(cols: Column*): DataFrame = df.orderBy(cols: _*)

    /** KQL `| top n by cols` — planned as TakeOrderedAndProject (per-
      * partition top-n + merge), never a full global sort at scale.
      */
    def kqlTop(n: Int, by: Column*): DataFrame = df.orderBy(by: _*).limit(n)

    /** KQL `| take n` (row choice is engine-dependent in Kusto too; callers
      * needing determinism should order first).
      */
    def kqlTake(n: Int): DataFrame = df.limit(n)

    /** KQL `| distinct`. */
    def kqlDistinct: DataFrame = df.distinct()
  }
}
