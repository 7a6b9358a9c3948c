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
  * plan each time. On a machine already loaded at start
  * (loadavg > cpus/4) every query takes a third pass.
  *
  * Load guard (VERDICT r7 item 2 — two rounds in a row, a loaded driver
  * machine faked a regression that burned diagnosis time): the JSON now
  * records `/proc/loadavg` + available processors so a hot machine is
  * visible in the artifact, and any query whose min-of-2 exceeds the
  * previous round's time (read from the last committed
  * `bench_result.json`) by >2× is re-run twice more with the min kept —
  * transient load spikes self-correct, real regressions survive the
  * re-measure and are then trustworthy. Re-run names are listed under
  * `reruns`.
  *
  * `formats` times JSON/CSV/Avro encode→gzip→stage through the REAL
  * RollingFileWriter at a fixed record count
  * ([[graft.sink.FormatThroughputBench]]) — the sink path is
  * bench-visible, not just spec-visible, grounding the reference's
  * "Avro … and CSV perform more-or-less similarly" claim (README.md:703).
  */
object Bench {
  private def loadavg(): Seq[Double] =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Nil }

  /** Per-query seconds from one bench artifact, or None when it is
    * absent/unparseable or was measured at a DIFFERENT sf dir
    * (comparing sf0.01 against sf0.1 would flag everything). */
  private def timesFrom(path: java.nio.file.Path, sfDir: String): Option[Map[String, Double]] =
    try {
      import org.json4s._
      val txt = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      val j = org.json4s.jackson.JsonMethods.parse(txt)
      val sameSf = j \ "sf" match { case JString(s) => s == sfDir; case _ => false }
      if (!sameSf) None
      else j \ "queries" match {
        case JObject(fields) => Some(fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
        }.toMap)
        case _ => None
      }
    } catch { case _: Throwable => None }

  /** Previous round's per-query seconds, for the outlier re-run guard:
    * the committed bench_result.json when its sf matches, else the
    * NEWEST same-sf BENCH_r*.json (r9 post-mortem: a committed sf0.01
    * baseline silently starved the guard and the driver's sf0.1 round
    * recorded 3-9× load phantoms with `reruns: []`). A loud stderr
    * warning marks the fallback so a mismatched baseline is visible in
    * the round log, never silent again. */
  private def previousTimes(sfDir: String): Map[String, Double] = {
    val committed = timesFrom(java.nio.file.Paths.get("bench_result.json"), sfDir)
    committed.getOrElse {
      System.err.println(
        s"[bench] WARNING: committed bench_result.json missing or not at sf '$sfDir' — " +
        "falling back to the newest same-sf BENCH_r*.json for the re-run guard")
      val rounds =
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.list(java.nio.file.Paths.get(".")).iterator.asScala
            .filter(_.getFileName.toString.matches("BENCH_r\\d+\\.json"))
            .toSeq.sortBy(p => "\\d+".r.findFirstIn(p.getFileName.toString).get.toInt)(
              Ordering[Int].reverse)
        } catch { case _: Throwable => Seq.empty }
      rounds.view.flatMap(p => timesFrom(p, sfDir)).headOption.getOrElse {
        System.err.println("[bench] WARNING: no same-sf baseline found — outlier guard disabled this run")
        Map.empty
      }
    }
  }

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
    val loadBefore = loadavg()
    val prev = previousTimes(sfDir)
    // A machine already under load at start (loadavg > cpus/4) noises
    // even min-of-2; take min-of-3 there so the artifact stays
    // comparable round-over-round (VERDICT r9 item 1c).
    val passes =
      if (loadBefore.headOption.exists(_ > Runtime.getRuntime.availableProcessors / 4.0)) 3 else 2
    // SPARK_GRAFT_ONLY=q41,q146 benches just the matching queries (comma-
    // separated substrings) — the iteration loop for perf work (not used
    // by the driver)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    val firstPass = selected.map { case (name, fn) =>
      val first = timeOnce(name, fn)
      val best =
        if (first < 0) first
        else (2 to passes).foldLeft(first)((b, _) => math.min(b, timeOnce(name, fn)))
      (name, fn, best)
    }
    // load guard: >2× the last committed round → re-measure, keep the min
    val reruns = List.newBuilder[String]
    val results = firstPass.map { case (name, fn, t) =>
      val suspect = t >= 0 && prev.get(name).exists(p => p > 0 && t > 2 * p)
      if (!suspect) name -> t
      else {
        reruns += name
        name -> math.min(t, math.min(timeOnce(name, fn), timeOnce(name, fn)))
      }
    }
    val rerunsList = reruns.result()
    // Per-query seconds at 3 decimals (VERDICT r20 item 1a): full
    // nanosecond precision made the 255-query line ~15 KB, which outlived
    // the driver's tail-capture window; 1 ms resolution is far below the
    // machine-day noise band and roughly halves the line.
    def sec(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jsonLine(results: Seq[(String, Double)], fmtJson: String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + sec(v) }
        .mkString("{", ",", "}")
      val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val rerunJson = rerunsList.map("\"" + _ + "\"").mkString("[", ",", "]")
      def loadJson(l: Seq[Double]) = l.map(_.toString).mkString("[", ",", "]")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      // "cpus" reports the CONTRACT value ($SPARK_GRAFT_CPUS — what the
      // session's master/parallelism actually use); availableProcessors
      // moves to cpus_avail (VERDICT r20 item 1c: the 8-core artifact
      // self-labeled as 32)
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$errJson,"reruns":$rerunJson,"loadavg":${loadJson(loadBefore)},"loadavg_after":${loadJson(loadavg())},"cpus":$cpus,"cpus_avail":${Runtime.getRuntime.availableProcessors},"formats":$fmtJson,"sf":"$sfDir"}"""
    }
    // Emit the contract line IMMEDIATELY after the last query (VERDICT
    // r20 item 1a) so a wall-budget kill during the format block still
    // leaves a parseable artifact; the authoritative line (with formats)
    // follows as the final line of output.
    println(jsonLine(results, s"""{"records":0}"""))
    val FormatRecords = 200000
    val formats =
      try graft.sink.FormatThroughputBench.run(FormatRecords,
        System.getProperty("java.io.tmpdir", "/tmp"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] format throughput FAILED: ${e.getMessage}"); Nil }
    val fmtJson = (formats.map { case (k, v) => "\"" + k + "\":" + v } :+
      s""""records":$FormatRecords""").mkString("{", ",", "}")
    val json = jsonLine(results, fmtJson)
    println(json)
    // sbt appends its own "[success]" line after main returns, so stdout's
    // LAST line is never ours — also persist the JSON to a well-known file
    // the driver can read directly (VERDICT r5 item 8: "parsed": null).
    // A filtered (SPARK_GRAFT_ONLY) run never overwrites the reference
    // files. bench_result_c$cpus.json keeps each core count's run in its
    // own file so the driver's low-core invocation no longer clobbers the
    // 32-core ground truth (VERDICT r20 item 1b).
    if (only.isEmpty)
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get("bench_result.json"),
          (json + "\n").getBytes("UTF-8"))
        java.nio.file.Files.write(java.nio.file.Paths.get(s"bench_result_c$cpus.json"),
          (json + "\n").getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    spark.stop()
  }
}
