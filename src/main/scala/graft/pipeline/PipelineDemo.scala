package graft.pipeline

import graft.config.{SinkConfig, TableMapping}
import graft.ingest.LocalTableIngestClient
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runnable example of the streaming sink pipeline: source with the
  * kafka-source schema → tombstone filter → route → gzip-staged JSON
  * lines → local-table ingest → verification readback. `sbt "runMain
  * graft.pipeline.PipelineDemo"` prints the ingested-table counts and the
  * staged-file layout — the library's end-to-end hello world.
  */
object PipelineDemo {
  final case class KRecord(topic: String, partition: Int, offset: Long,
                           key: Array[Byte], value: Array[Byte])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tablesRoot = Files.createTempDirectory("demo-tables").toString
    val config = SinkConfig(
      mappings = Seq(
        TableMapping("telemetry", "demo_db", "telemetry_table", streaming = true),
        TableMapping("*", "demo_db", "catchall")),
      flushSizeBytes = 256, flushIntervalMs = 0,
      enableTableValidation = true, // opt in to the startup metadata probes
      tempDir = Files.createTempDirectory("demo-stage").toString)

    // V1 startup validation before any stream starts (fail-fast)
    Preflight.validate(config, new MetadataClient {
      def tableExists(db: String, table: String) = true
      def mappingExists(db: String, table: String, format: String, mapping: String) = true
      def hasIngestPermission(db: String, table: String) = true
      def streamingPolicyEnabled(db: String, table: String) = true
    })
    println("preflight: config validated")

    val metrics = SinkMetrics.forSpark(spark)
    // K2: streaming ingestion with managed fallback to the queued path
    val pipeline = new KustoSparkPipeline(
      config,
      () => new graft.ingest.ManagedStreamingIngestClient(
        new LocalTableIngestClient(tablesRoot), new LocalTableIngestClient(tablesRoot)),
      None, metrics)

    val stream = MemoryStream[KRecord]
    stream.addData(
      (0 until 100).map(i => KRecord("telemetry", i % 4, i / 4, null,
        s"""{"device":$i,"temp":${20 + i % 7}}""".getBytes(UTF_8))) ++
        Seq(KRecord("surprise-topic", 0, 0, null, """{"who":"dis"}""".getBytes(UTF_8)),
          KRecord("telemetry", 0, 999, null, null))) // tombstone

    val q = pipeline.start(stream.toDF(), Files.createTempDirectory("demo-ckpt").toString)
    q.processAllAvailable()
    q.stop()

    val telemetry = spark.read.json(s"$tablesRoot/demo_db/telemetry_table")
    println(s"telemetry_table rows ingested: ${telemetry.count()}")
    telemetry.groupBy("temp").count().orderBy("temp").show()
    println(s"catchall rows: ${spark.read.json(s"$tablesRoot/demo_db/catchall").count()}")
    println(s"metrics: ${metrics.snapshot.toSeq.sorted.mkString(", ")}")
    val staged = java.nio.file.Files.list(java.nio.file.Path.of(tablesRoot, "demo_db", "telemetry_table"))
    println("ingested blobs: " + staged.iterator().next().getFileName)

    // multimodal plumbing over the documents table: binary payloads →
    // stubbed decode → feature table ready for the ANN queries
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = graft.ops.Multimodal.asMedia(
      docs.selectExpr("doc_id", "cast(text as binary) AS payload"), "doc_id", "payload", "image")
    val features = graft.ops.Multimodal.featureTable(spark, media)
    println(s"multimodal features: ${features.count()} rows, " +
      s"schema=${features.schema.fieldNames.mkString(",")}")
    features.orderBy("doc_id").show(3, truncate = 40)
    spark.stop()
  }
}
