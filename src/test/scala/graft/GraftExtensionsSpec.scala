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

  test("extension-injected functions match the explicitly-registered path") {
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    val q = "SELECT simhash32('the quick brown fox') AS v"
    assert(spark.sql(q).head().getLong(0) == s2.sql(q).head().getLong(0))
  }
}
