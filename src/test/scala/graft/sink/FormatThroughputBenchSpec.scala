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
}
