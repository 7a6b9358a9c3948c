package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tool (the driver never runs this): dump
  * `.explain("formatted")` for every registered query to a directory, one
  * file per query, so plan shape (Exchange count, join strategy,
  * PushedFilters/ReadSchema, WholeStageCodegen spans) can be audited and
  * diffed in bulk — spark_optimization_guide.md §1/§7.2.
  *
  *   runMain graft.PlanDump /root/repo/plans/r20 [nameFilter,...]
  *
  * Building a DataFrame can itself run driver-side loop actions for the
  * iterative queries (the loops materialize per round); that is the real
  * cost of compiling those queries and is worth seeing here too.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val only = if (args.length > 1) Some(args(1).split(',').toSeq) else None
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    var failed = List.empty[String]
    for ((name, fn) <- selected) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
      } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"[plandump] wrote ${selected.size - failed.size}/${selected.size} plans to $outDir" +
      (if (failed.nonEmpty) s"; FAILED: ${failed.sorted.mkString(",")}" else ""))
    spark.stop()
  }
}
