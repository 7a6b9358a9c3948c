package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions has every native function in SQL with no register
  * call, and the results match the explicitly-registered path exactly
  * (same Expression classes behind both). */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("all native functions resolve in SQL without explicit registration") {
    val r = spark.sql(
      """SELECT simhash32('alpha beta gamma') AS sh,
         size(word_shingles('a b c d', 3)) AS ns,
         size(word_shingle_hashes('a b c d', 3)) AS nh,
         size(winnow_fps('abcdefghijklmnop', 8, 4)) AS nw,
         dot_d(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
         size(minhash_sig('x y z w v u t s')) AS nm""").head()
    assert(r.getAs[Long]("sh") >= 0L)
    assert(r.getAs[Int]("ns") == 2 && r.getAs[Int]("nh") == 2)
    assert(r.getAs[Int]("nw") >= 1)
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Int]("nm") == 12)
  }

  test("round-13 additions resolve in SQL: tdigest family + bag mutators") {
    spark.range(1000).createOrReplaceTempView("r13")
    val r = spark.sql(
      """SELECT percentile_tdigest(tdigest_merge(s), 50) AS p50 FROM (
           SELECT tdigest(CAST(id AS DOUBLE)) AS s FROM r13 GROUP BY id % 7)""").head()
    assert(math.abs(r.getDouble(0) - 500.0) <= 6.0) // within 1% + bucket width
    val b = spark.sql(
      """SELECT bag_merge('{"a":1}', '{"a":9,"b":2.5}') AS m,
                bag_remove_keys('{"x":1,"y":2}', '["y"]') AS rm,
                bag_set_key('{"k":1}', 'n', '7') AS sk""").head()
    assert(b.getString(0) == """{"a":1,"b":2.5}""")
    assert(b.getString(1) == """{"x":1}""")
    assert(b.getString(2) == """{"k":1,"n":7}""")
  }

  test("extension-injected functions match the explicitly-registered path") {
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    val q = "SELECT simhash32('the quick brown fox') AS v"
    assert(spark.sql(q).head().getLong(0) == s2.sql(q).head().getLong(0))
  }
}
