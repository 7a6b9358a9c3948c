package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the bench harness drives all three formats through the real
  * RollingFileWriter and cleans up after itself. */
class FormatThroughputBenchSpec extends AnyFunSuite {
  test("format throughput harness times json/csv/avro and leaves no files behind") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt-bench")
    val r = FormatThroughputBench.run(500, tmp.toString)
    assert(r.map(_._1) == Seq("json", "csv", "avro"))
    assert(r.forall(_._2 > 0), s"all formats must report positive seconds: $r")
    // staged files are deleted on roll and writer dirs removed on finish
    val leftovers = java.nio.file.Files.list(tmp).toArray
    assert(leftovers.isEmpty, s"bench left files: ${leftovers.mkString(", ")}")
  }

  test("avro stays within 4x of csv (guards the per-record block-flush regression class)") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt-gate")
    FormatThroughputBench.run(5000, tmp.toString) // JIT warm-up pass
    val r = FormatThroughputBench.run(50000, tmp.toString).toMap
    val (csv, avro) = (r("csv"), r("avro"))
    // reference claim: "Avro ... and CSV perform more-or-less similarly"
    // (README.md:703). 4x is deliberately loose for CI noise — the defect
    // class this guards (a block close per record) measured ~9-10x.
    assert(avro <= csv * 4,
      f"avro $avro%.3fs vs csv $csv%.3fs exceeds the 4x gate — per-record flush regression?")
    java.nio.file.Files.deleteIfExists(tmp)
  }
}
