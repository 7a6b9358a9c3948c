package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-20 size-gated driver-local LPA against the
  * distributed loop it bypasses: both paths run over the same sf0.001
  * testdata and must agree row-for-row (LPA state is integer — labels,
  * counts, min tie-breaks — so the paths are bit-identical, not just
  * approximately equal). The DuckDB oracle additionally gates q199's
  * public output every round; this spec is the direct local-vs-
  * distributed pin. */
class LabelPropagationParitySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("local LPA == distributed LPA on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val dist = LlmQueries.labelPropDistributed(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val pairs = graft.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey * 2 AS src", "l_partkey * 2 + 1 AS dst")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val local = LlmQueries.lpaLocal(spark, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(local == dist)
    assert(dist.nonEmpty)
  }
}
