package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval-point range join — the scale path for a PURE range
  * predicate (`point BETWEEN start AND end` with no equi key), which
  * Spark otherwise plans as a broadcast-nested-loop / cartesian filter:
  * O(|intervals| × |points|) comparisons.
  *
  * Both sides are keyed by coarse time bucket (`floor(ms / binMillis)`):
  * an interval is exploded to every bucket it covers (`span/bin + 1`
  * rows — choose binMillis on the order of the typical interval length),
  * a point belongs to exactly ONE bucket, and the exact containment
  * filter runs after the bucket equi-join. The cross product never
  * materializes — work is proportional to true matches plus same-bucket
  * near-misses, and the bucket id is a plain shuffle key that AQE can
  * re-balance. A point's bucket is unique, so no post-join dedup is
  * needed.
  */
object RangeJoin {

  /** `intervals` must carry `startMsCol`/`endMsCol` (epoch millis,
    * inclusive bounds); `points` carries `tsMsCol`. Returns every
    * (interval row ++ point row) pair with the point inside the
    * interval. Column names must not collide across the two inputs. */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        startMsCol: String, endMsCol: String, tsMsCol: String,
                        binMillis: Long): DataFrame = {
    require(binMillis > 0, "binMillis must be positive")
    val binned = intervals.withColumn("__bucket",
      explode(sequence((col(startMsCol) / binMillis).cast("long"),
        (col(endMsCol) / binMillis).cast("long"))))
    val pointBinned = points.withColumn("__bucket", (col(tsMsCol) / binMillis).cast("long"))
    binned.join(pointBinned, "__bucket")
      .filter(col(tsMsCol) >= col(startMsCol) && col(tsMsCol) <= col(endMsCol))
      .drop("__bucket")
  }
}
