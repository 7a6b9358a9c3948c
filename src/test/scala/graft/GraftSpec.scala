package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The one-call front door: after init, SQL, KQL text, and the native
  * functions all work against the registered views. */
class GraftSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("init registers every table view and the native functions") {
    Graft.init(spark, "/root/testdata/sf0.001")
    for (t <- Tables.names)
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, s"view $t")
    assert(spark.sql("SELECT simhash32(text) AS s FROM documents LIMIT 5").count() == 5)
    assert(spark.sql(
      "SELECT dot_d(array(1.0D, 2.0D), array(3.0D, 4.0D))").collect().head.getDouble(0) == 11.0)
    // events ts normalized to a real timestamp
    assert(spark.table("events").schema("ts").dataType.typeName == "timestamp")
  }

  test("KQL text runs against the initialized views") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val n = Graft.kql(spark, "events | where value > 50 | count").collect().head.getLong(0)
    val expected = spark.sql("SELECT count(1) FROM events WHERE value > 50").collect().head.getLong(0)
    assert(n == expected && n > 0)
  }
}
