package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PageRank against hand-computed iterations. */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def ranksOf(edges: Seq[(String, String)], k: Int): Map[String, Double] = {
    import spark.implicits._
    PageRank.run(edges.toDF("src", "dst"), k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("3-cycle is the uniform fixed point at every iteration count") {
    for (k <- Seq(1, 4)) {
      val r = ranksOf(Seq("a" -> "b", "b" -> "c", "c" -> "a"), k)
      assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12), r)
    }
  }

  test("fan-in graph matches two hand-computed damped iterations") {
    // a→b, a→c, b→c; N=3, d=0.85, r0 = 1/3 each
    // iter1: a=0.05, b=0.05+0.85*(1/6)=0.19166667, c=0.05+0.85*(1/6+1/3)=0.475
    // iter2: a=0.05, b=0.05+0.85*0.025=0.07125, c=0.05+0.85*(0.025+0.19166667)
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c")
    val r1 = ranksOf(edges, 1)
    assert(math.abs(r1("a") - 0.05) < 1e-12)
    assert(math.abs(r1("b") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r1("c") - 0.475) < 1e-12)
    val r2 = ranksOf(edges, 2)
    assert(math.abs(r2("a") - 0.05) < 1e-12)
    assert(math.abs(r2("b") - 0.07125) < 1e-12)
    assert(math.abs(r2("c") - (0.05 + 0.85 * (0.025 + 0.05 + 0.85 / 6))) < 1e-12)
  }

  test("tol-based early stop halts on a converged graph, fixed-k path unchanged") {
    import spark.implicits._
    // a 2-cycle starts AT the fixed point (uniform 1/2): the first
    // iteration reproduces it exactly, so delta = 0 and tol stops after
    // one round instead of burning all 50
    val cycle = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    val (df, iters) = PageRank.runCounted(cycle, 50, tol = 1e-9)
    assert(iters == 1)
    val r = df.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.values.forall(v => math.abs(v - 0.5) < 1e-12), r)
    // an unconverged graph under a tiny budget runs all k rounds and
    // matches the fixed-k form value-for-value
    val fan = Seq("a" -> "b", "a" -> "c", "b" -> "c").toDF("src", "dst")
    val (dfFan, itersFan) = PageRank.runCounted(fan, 2, tol = 1e-12)
    assert(itersFan == 2)
    val fixed = ranksOf(Seq("a" -> "b", "a" -> "c", "b" -> "c"), 2)
    val early = dfFan.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(fixed.forall { case (k, v) => math.abs(early(k) - v) < 1e-15 })
  }

  test("normalized ranks average ~1 and preserve order") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c").toDF("src", "dst")
    val n = PageRank.run(edges, 2, normalize = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(n("c") > n("b") && n("b") > n("a"))
    assert(math.abs(n("a") - 0.15) < 1e-12) // 0.05 * 3
  }

  test("node ids keep the caller's type: long keys stay 8-byte through the loop") {
    import spark.implicits._
    // long-keyed graphs (q111's shape) must come back long — a string
    // cast inside the loop would shuffle/hash UTF8 keys every round and
    // parse them back per row at the output filter (round 17)
    val edges = Seq(2L -> 3L, 3L -> 5L, 5L -> 2L).toDF("src", "dst")
    val out = PageRank.run(edges, 2)
    assert(out.schema("node").dataType == org.apache.spark.sql.types.LongType,
      s"long node ids must not degrade to ${out.schema("node").dataType}")
    val r = out.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(2L, 3L, 5L))
    assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12), r) // 3-cycle fixpoint
    // mixed-type endpoints still normalize (union safety)
    val mixed = spark.range(1).selectExpr("1 AS src", "CAST(2 AS BIGINT) AS dst")
    assert(PageRank.run(mixed, 1).schema("node").dataType ==
      org.apache.spark.sql.types.StringType)
  }
}
