package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-expressed semantics of the reference's §2.1 dataflow operators,
  * registered against the DuckDB oracle so the pipeline behaviors that
  * ARE SQL-expressible get correctness coverage on real data in addition
  * to their Scala implementations (graft.sink / graft.pipeline) and
  * ScalaTest suites. Non-expressible behaviors (gzip staging, retries,
  * checkpoint gating) are covered by PipelineE2ESpec instead.
  *
  * The events table stands in for the record stream: `event_id` is the
  * offset, `pmod(user_id, 8)` the partition, `props` the payload.
  */
object PipelineQueries extends QueryModule {

  private def ev(s: SparkSession, dir: String): Unit =
    Tables.events(s, dir).createOrReplaceTempView("events")

  /** F1 tombstone filter: a payload made null by a deterministic rule
    * (value < 1.0 marks a tombstone) is dropped before sinking; survivors
    * counted per route. Filter is a Catalyst predicate — pushed to the
    * scan, no shuffle until the count. */
  private val tombstoneSql = """
    WITH rec AS (
      SELECT event_id, event_type,
             CASE WHEN value < 1.0 THEN NULL ELSE props END AS payload
      FROM events)
    SELECT event_type, count(payload) AS n_live, count(1) - count(payload) AS n_tombstones,
           sum(CASE WHEN payload IS NOT NULL THEN octet_length(payload) ELSE 0 END) AS live_bytes
    FROM rec GROUP BY event_type ORDER BY event_type"""

  private val tombstoneOracle = """
    WITH rec AS (
      SELECT event_id, event_type,
             CASE WHEN value < 1.0 THEN NULL ELSE props END AS payload
      FROM events)
    SELECT event_type, count(payload) AS n_live, count(1) - count(payload) AS n_tombstones,
           sum(CASE WHEN payload IS NOT NULL THEN octet_length(payload::BLOB) ELSE 0 END)::BIGINT AS live_bytes
    FROM rec GROUP BY event_type ORDER BY event_type"""

  /** R1 topic→table router with `*` wildcard: exact mappings for three
    * event types, everything else falls through to the catchall — the
    * routing table is a broadcast-sized CASE, evaluated map-side. */
  private val routerSql = """
    SELECT CASE event_type
             WHEN 'click' THEN 'db1.clicks'
             WHEN 'purchase' THEN 'db2.purchases'
             WHEN 'signup' THEN 'db1.signups'
             ELSE 'db1.catchall' END AS route,
           count(1) AS n_records, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1 ORDER BY route"""

  /** E1/E3 encoders: JSON-lines and CSV wire sizes per record — the
    * byte-counting that drives size-based rolling (B3). Uses a manual
    * canonical concat (not engine to_json) so both engines produce the
    * byte-identical encoding. */
  private val encodeSql = """
    WITH enc AS (
      SELECT event_id, event_type,
             concat('{"event_id":', cast(event_id AS string), ',"event_type":"', event_type,
                    '","props":', props, '}') AS json_line,
             concat(cast(event_id AS string), ',', event_type, ',', props) AS csv_line
      FROM events)
    SELECT event_type, count(1) AS n,
           sum(octet_length(json_line) + 1) AS json_bytes_with_newline,
           sum(octet_length(csv_line) + 1) AS csv_bytes_with_newline,
           min(octet_length(json_line)) AS min_json, max(octet_length(json_line)) AS max_json
    FROM enc GROUP BY event_type ORDER BY event_type"""

  private val encodeOracle = """
    WITH enc AS (
      SELECT event_id, event_type,
             concat('{"event_id":', event_id::VARCHAR, ',"event_type":"', event_type,
                    '","props":', props, '}') AS json_line,
             concat(event_id::VARCHAR, ',', event_type, ',', props) AS csv_line
      FROM events)
    SELECT event_type, count(1) AS n,
           sum(octet_length(json_line::BLOB) + 1)::BIGINT AS json_bytes_with_newline,
           sum(octet_length(csv_line::BLOB) + 1)::BIGINT AS csv_bytes_with_newline,
           min(octet_length(json_line::BLOB)) AS min_json, max(octet_length(json_line::BLOB)) AS max_json
    FROM enc GROUP BY event_type ORDER BY event_type"""

  /** B1 size-based batching: running byte total per partition (ordered by
    * offset), batch index = floor(cumulative/4096) — the declarative
    * statement of the roll rule. Window is per-partition with bounded
    * state; at scale the partition count grows with the source, never the
    * window size. */
  private val batchingSql = """
    WITH rec AS (
      SELECT pmod(user_id, 8) AS part, event_id, octet_length(props) + 1 AS nbytes
      FROM events),
    cum AS (
      SELECT part, event_id, nbytes,
             sum(nbytes) OVER (PARTITION BY part ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bytes
      FROM rec)
    SELECT part, cast(floor((cum_bytes - 1) / 4096) AS bigint) AS batch_id,
           count(1) AS n_records, sum(nbytes) AS batch_bytes,
           min(event_id) AS first_offset, max(event_id) AS last_offset
    FROM cum GROUP BY part, cast(floor((cum_bytes - 1) / 4096) AS bigint)
    ORDER BY part, batch_id"""

  private val batchingOracle = """
    WITH rec AS (
      SELECT user_id % 8 AS part, event_id, octet_length(props::BLOB) + 1 AS nbytes
      FROM events),
    cum AS (
      SELECT part, event_id, nbytes,
             sum(nbytes) OVER (PARTITION BY part ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bytes
      FROM rec)
    SELECT part, floor((cum_bytes - 1) / 4096)::BIGINT AS batch_id,
           count(1) AS n_records, sum(nbytes)::BIGINT AS batch_bytes,
           min(event_id) AS first_offset, max(event_id) AS last_offset
    FROM cum GROUP BY part, floor((cum_bytes - 1) / 4096)::BIGINT
    ORDER BY part, batch_id"""

  /** K6 offset-commit gate: per partition, the committed high-water mark
    * is the greatest offset BELOW the first failed record (value > 489
    * marks a poison record) — offsets never advance past un-ingested
    * data. Anti-join-style window logic, all per-partition. */
  private val offsetGateSql = """
    WITH rec AS (
      SELECT pmod(user_id, 8) AS part, event_id, value > 489.0 AS poison
      FROM events),
    gate AS (SELECT part, min(CASE WHEN poison THEN event_id END) AS first_poison FROM rec GROUP BY part)
    SELECT rec.part,
           max(CASE WHEN first_poison IS NULL OR event_id < first_poison THEN event_id END) AS committed_offset,
           count(CASE WHEN first_poison IS NULL OR event_id < first_poison THEN 1 END) AS n_committed,
           count(1) AS n_total
    FROM rec JOIN gate ON rec.part = gate.part
    GROUP BY rec.part ORDER BY rec.part"""

  private val offsetGateOracle = """
    WITH rec AS (
      SELECT user_id % 8 AS part, event_id, value > 489.0 AS poison
      FROM events),
    gate AS (SELECT part, min(CASE WHEN poison THEN event_id END) AS first_poison FROM rec GROUP BY part)
    SELECT rec.part,
           max(CASE WHEN first_poison IS NULL OR event_id < first_poison THEN event_id END) AS committed_offset,
           count(CASE WHEN first_poison IS NULL OR event_id < first_poison THEN 1 END) AS n_committed,
           count(1) AS n_total
    FROM rec JOIN gate ON rec.part = gate.part
    GROUP BY rec.part ORDER BY rec.part"""

  private def sqlQuery(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { ev(s, dir); s.sql(sql) }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_tombstone_filter" -> sqlQuery(tombstoneSql),
    "q33_router_wildcard" -> sqlQuery(routerSql),
    "q34_encoders" -> sqlQuery(encodeSql),
    "q35_size_batching" -> sqlQuery(batchingSql),
    "q36_offset_gate" -> sqlQuery(offsetGateSql))

  override val oracles: Map[String, String] = Map(
    "q32_tombstone_filter" -> tombstoneOracle,
    "q33_router_wildcard" -> routerSql, // identical ANSI SQL runs in DuckDB
    "q34_encoders" -> encodeOracle,
    "q35_size_batching" -> batchingOracle,
    "q36_offset_gate" -> offsetGateOracle)
}
