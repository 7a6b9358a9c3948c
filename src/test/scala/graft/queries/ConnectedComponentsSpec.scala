package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Min-label-propagation CC on graph shapes the LSH pair source never
  * produces in tests: long chains (worst-case O(diameter) rounds), rings,
  * several disjoint components, and stars. Representatives must be the
  * component minimum and sizes must partition the vertex set. */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    LlmQueries.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("chain of 12 converges to one component (worst-case diameter)") {
    val got = cc((0L until 11L).map(i => (i, i + 1)))
    assert(got.size == 12)
    assert(got.values.forall(_ == (0L, 12L)))
  }

  test("ring plus disjoint pair plus star") {
    val ring = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val pair = Seq((30L, 31L))
    val star = Seq((20L, 25L), (20L, 26L), (20L, 27L))
    val got = cc(ring ++ pair ++ star)
    assert(got(10L) == (10L, 3L) && got(11L) == (10L, 3L) && got(12L) == (10L, 3L))
    assert(got(30L) == (30L, 2L) && got(31L) == (30L, 2L))
    assert(Seq(20L, 25L, 26L, 27L).forall(got(_) == (20L, 4L)))
  }

  test("edge order and direction do not matter") {
    assert(cc(Seq((5L, 1L), (3L, 5L))) == cc(Seq((1L, 5L), (5L, 3L))))
  }
}
