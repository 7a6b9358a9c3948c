package graft

import org.apache.spark.sql.SparkSession

/** Interleaved perf A/B for registered queries (perf work only — the
  * driver never runs this). Runs each named query `reps` times per
  * variant, ALTERNATING variants within one JVM so JIT/GC/load drift
  * hits both sides equally (the round-15/17 lesson: sequential A-then-B
  * comparisons recorded up to 2× phantoms). A variant is a set of
  * system properties (e.g. the `graft.bfs.cache` hook); variants are
  * applied before each run and cleared after.
  *
  *   runMain graft.PerfAB q146 7 graft.bfs.cache=persist graft.bfs.cache=checkpoint
  *
  * prints per-variant min/median plus every raw sample.
  */
object PerfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args(0).split(',').toSeq
    val reps = args(1).toInt
    val variants: Seq[String] = args.drop(2).toSeq match {
      case Nil => Seq("")
      case vs => vs
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.contains) }
    require(queries.nonEmpty, s"no query matches ${names.mkString(",")}")

    // GRAFT_AB_JOBS=1: print every Spark job's wall time + call site —
    // the per-stage profile for loop-heavy queries
    val profileJobs = sys.env.get("GRAFT_AB_JOBS").contains("1")
    if (profileJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val label = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(60)}[${si.numTasks}]")
            .mkString(" <- ")
          starts.put(js.jobId, (System.nanoTime(), label.take(200)))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            println(f"JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1e3)
            .getOrElse(-1.0)
          val tm = si.taskMetrics
          println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d wall=$wall%7.3f run=${tm.executorRunTime / 1e3}%7.2f cpu=${tm.executorCpuTime / 1e9}%7.2f gc=${tm.jvmGCTime / 1e3}%5.2f in=${tm.inputMetrics.recordsRead}%9d sr=${tm.shuffleReadMetrics.recordsRead}%9d sw=${tm.shuffleWriteMetrics.recordsWritten}%9d  ${si.name.takeWhile(_ != '\n').take(50)}")
        }
      })

    // a variant element "conf:spark.x.y=z" sets a runtime SQLConf for the
    // run (restored after); anything else is a system property
    val savedConf = scala.collection.mutable.Map.empty[String, Option[String]]
    def applyVariant(v: String): Unit = v.split(',').filter(_.contains("=")).foreach { kv =>
      val Array(k, value) = kv.split("=", 2)
      if (k.startsWith("conf:")) {
        val key = k.stripPrefix("conf:")
        savedConf(key) = spark.conf.getOption(key)
        spark.conf.set(key, value)
      } else sys.props(k) = value
    }
    def clearVariant(v: String): Unit = v.split(',').filter(_.contains("=")).foreach { kv =>
      val k = kv.split("=", 2)(0)
      if (k.startsWith("conf:")) {
        val key = k.stripPrefix("conf:")
        savedConf.remove(key).foreach {
          case Some(old) => spark.conf.set(key, old)
          case None => spark.conf.unset(key)
        }
      } else sys.props.remove(k)
    }

    // warm-up: one run of each (query, variant) pair, unrecorded
    for ((name, fn) <- queries; v <- variants) {
      applyVariant(v)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally clearVariant(v)
      val _ = name
    }
    val samples = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    // GRAFT_AB_SPLIT=1: report build (compile incl. any loop actions)
    // and execute (the noop write) separately
    val split = sys.env.get("GRAFT_AB_SPLIT").contains("1")
    for (_ <- 1 to reps; (name, fn) <- queries; v <- variants) {
      applyVariant(v)
      def gcMillis(): Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
          .map(_.getCollectionTime).sum
      }
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        if (split) println(f"SPLIT $name ${if (v.isEmpty) "<none>" else v} build=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f gc=${(gcMillis() - gc0) / 1e3}%.3f")
      } finally clearVariant(v)
      val dt = (System.nanoTime() - t0) / 1e9
      samples((name, v)) = dt :: samples((name, v))
    }
    for ((name, _) <- queries; v <- variants) {
      val xs = samples((name, v)).sorted
      val med = xs(xs.size / 2)
      println(f"AB $name%-32s ${if (v.isEmpty) "<none>" else v}%-40s min=${xs.head}%.3f med=$med%.3f raw=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
