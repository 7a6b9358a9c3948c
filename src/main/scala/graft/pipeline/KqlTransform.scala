package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** In-flight KQL transforms over a kafka-schema stream — the capability
  * the reference explicitly lacks: "The connector does not support
  * transformers. Prefer transformation … in Azure Data Explorer"
  * (reference: README.md:158-162), because Kafka Connect has no
  * expression engine. Spark does, so this engine offers the transform as
  * a composable PRE-STAGE in front of [[KustoSparkPipeline]]:
  *
  * {{{
  * val shaped = KqlTransform(source, topic = "events", valueSchema,
  *   "src | where vtype != 'debug' | extend vdouble = vlong * 2")
  * pipeline.start(shaped, checkpointDir)
  * }}}
  *
  * Records of `topic` have their JSON values parsed with `valueSchema`,
  * the KQL pipeline applied row-wise (where/extend/project — the
  * stream-safe subset; summarize/join would change the record model),
  * and the surviving rows re-encoded as JSON values. Records of other
  * topics (and tombstones, which must reach the sink's F1 filter intact)
  * pass through untouched. Kafka metadata (topic/partition/offset/key/
  * headers) rides along protected: a transform that drops or collides
  * with a metadata column fails loudly at compile time.
  *
  * Scale: parse → row-wise ops → re-encode are all narrow (one codegen
  * span, no shuffle), so the pipeline's linear-in-partitions scaling is
  * preserved; at-least-once semantics are untouched because the stage is
  * upstream of the offset-gated sink.
  */
object KqlTransform {

  private val MetaCols = Seq("topic", "partition", "offset", "key", "headers")

  def apply(df: DataFrame, topic: String, valueSchema: StructType, kql: String): DataFrame = {
    require(Set("topic", "value").subsetOf(df.columns.toSet),
      s"KqlTransform needs kafka-schema input (topic, value); got ${df.columns.mkString(", ")}")
    val meta = MetaCols.filter(df.columns.contains) // key/headers optional upstream
    val collisions = valueSchema.fieldNames.toSeq.intersect(MetaCols)
    require(collisions.isEmpty,
      s"value schema collides with kafka metadata columns: ${collisions.mkString(", ")}")
    val isTarget = col("topic") === topic && col("value").isNotNull
    val passthrough = df.filter(!coalesce(isTarget, lit(false)))
      .select(meta.map(col) :+ col("value"): _*)

    val parsed = df.filter(isTarget)
      .withColumn("__v", from_json(col("value").cast("string"), valueSchema))
      .select(meta.map(col) ++ valueSchema.fieldNames.map(f => col(s"__v.$f").as(f)): _*)
    val transformed = graft.kql.KqlCompiler.compile(kql, _ => parsed)
    val missing = meta.filterNot(transformed.columns.contains)
    require(missing.isEmpty,
      s"KQL transform must not drop kafka metadata columns; lost: ${missing.mkString(", ")} " +
        "(use project-away on value fields only)")
    // Metadata must ride through UNMODIFIED — an `extend topic = ...` or
    // `project offset = ...` would corrupt routing/offset gating
    // downstream. An untouched column keeps its attribute id through the
    // compiled plan; any rewrite (extend/project alias/rename) mints a
    // new one, so id comparison detects semantic overwrites exactly.
    val sourceIds = parsed.queryExecution.analyzed.output.map(a => a.name -> a.exprId).toMap
    val outIds = transformed.queryExecution.analyzed.output.map(a => a.name -> a.exprId).toMap
    val overwritten = meta.filter(m => sourceIds.get(m).exists(id => !outIds.get(m).contains(id)))
    require(overwritten.isEmpty,
      s"KQL transform must not overwrite kafka metadata columns: ${overwritten.mkString(", ")} " +
        "(extend/project may only target value fields)")
    val valueCols = transformed.columns.filterNot(meta.contains)
    require(valueCols.nonEmpty, "KQL transform removed every value field")
    val reEncoded = transformed.select(
      meta.map(col) :+
        to_json(struct(valueCols.map(col): _*)).cast("binary").as("value"): _*)

    reEncoded.unionByName(passthrough)
  }
}
