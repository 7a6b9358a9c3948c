package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query, timed end-to-end with a
  * noop-format write so the FULL plan executes (a bare .count() lets
  * Catalyst prune projections/sorts and measures only the scan —
  * VERDICT r1 item 2). Failures are reported explicitly as -1 and kept
  * out of the total instead of masquerading as fast queries.
  *
  * Each query runs TWICE and reports the min (VERDICT r4 item 5): a
  * single cold shot records GC/run-order phantoms up to 8× the true
  * plan cost, which poisons round-over-round comparison; min-of-2 is
  * the cheapest estimator that kills them while still timing the full
  * plan each time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen once so per-query numbers measure the plan,
    // not first-use classloading. Fixed query (not Map ordering) so the
    // warm-up cost is identical run-over-run (VERDICT r5 item 7).
    try SparkEntry.queries.get("q01_count").foreach(_(spark, sfDir).write
      .format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }

    var errors = List.empty[String]
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        errors ::= name; -1.0
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = timeOnce(name, fn)
      name -> (if (first < 0) first else math.min(first, timeOnce(name, fn)))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(json)
    // sbt appends its own "[success]" line after main returns, so stdout's
    // LAST line is never ours — also persist the JSON to a well-known file
    // the driver can read directly (VERDICT r5 item 8: "parsed": null).
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_result.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
