package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring dedup (q130, Lee et al. 2021 class) — span-merge
  * correctness on a hand fixture, within-doc repetition, and the scale
  * contract: there is NO pair join anywhere in the plan, so a boilerplate
  * window shared by every document in the corpus costs O(df) rows through
  * one shuffle key, never O(df²) pairs (the q22/q24 caps exist to bound
  * pair GENERATION; this query never generates pairs, so it needs none). */
class ExactSubstringSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def view(rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").createOrReplaceTempView("documents")
    // the round-18 kernel queries read the repartitioned view the prod
    // session registers (LlmShared.docsRp) — mirror it here
    spark.table("documents").repartition(4)
      .createOrReplaceTempView("documents_rp")
  }

  test("span merge: cross-doc run, within-doc repeat, multi-span doc, clean doc") {
    view(Seq(
      1L -> "p q r s t u v",                    // shares "p q r s t" with doc 2
      2L -> "z1 z2 p q r s t z3",
      3L -> "w w w w",                          // within-doc repeated window
      4L -> "unique tokens only here nothing shared",
      5L -> "p q r ga gb gc gd m n o",          // two disjoint shared runs
      6L -> "p q r xa xb xc xd m n o"))
    val got = spark.sql(LlmQueries.exactSubstringSql(k = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // doc1: one span covering tokens [0,5); doc2: [2,7); doc3: both windows
    // of "w w w w" are the same hash -> one 4-token span; doc5/doc6: "p q r"
    // and "m n o" merge separately (gap > k) -> 2 spans of 3 tokens each.
    assert(got == Seq(
      (1L, 1L, 5L, 0L),
      (2L, 1L, 5L, 2L),
      (3L, 1L, 4L, 0L),
      (5L, 2L, 6L, 0L),
      (6L, 2L, 6L, 0L)))
  }

  test("touching spans merge: a long duplicated run reports as ONE span") {
    // 10-token shared run, k=3: flagged windows at pos 0..7 all chain
    // (gap 1 <= k) into a single [0,10) span on both docs.
    view(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j"))
    val got = spark.sql(LlmQueries.exactSubstringSql(k = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 10L), (2L, 1L, 10L)))
  }

  test("worst case all-identical corpus stays linear: no pair join in the plan") {
    view((0L until 300L).map(i =>
      i -> "the quick brown fox jumps over the lazy dog again"))
    val df = spark.sql(LlmQueries.exactSubstringSql(k = 8))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"exact-substring must not form pairs:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // every doc fully covered by one merged 10-token span — O(N) output,
    // and the run completes without a d² blowup behind the hot hash key
    val rows = df.collect()
    assert(rows.length == 300)
    assert(rows.forall(r => r.getLong(1) == 1L && r.getLong(2) == 10L))
  }
}
