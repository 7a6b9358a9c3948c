package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank by power iteration over a directed edge list — the
  * graph-centrality scorer a training-data pipeline uses for link-based
  * document quality (and the other classic iterated-join workload next
  * to [[KMeans]] and the connected-components dedup clustering).
  *
  * rank_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_t(u) / outdeg(u)
  *
  * Scale design (100 TB edge lists):
  *  - Per iteration: ONE shuffle join of edges⋈ranks on src (the
  *    rank table is nodes-sized, edges dominate) + one hash aggregate
  *    on dst. Nothing driver-side except N (a single count — the same
  *    bounded-scalar class as KMeans' convergence checksum).
  *  - edges/outdeg are computed once and persisted; ranks
  *    localCheckpoints per round so round k never replays rounds 1..k-1.
  *  - Dangling mass (nodes with no out-edges) is dropped, not
  *    redistributed — documented choice, mirrored exactly by the
  *    oracle's unrolled iterations.
  */
object PageRank {

  /** @param edges (src, dst) string-keyed directed edges
    * @param normalize scale ranks by N so the mean sits at ~1 (stable
    *                  magnitudes for thresholds/oracles at any graph size)
    * @return (node, rank) after `k` damped iterations from uniform */
  def run(edges: DataFrame, k: Int, damping: Double = 0.85,
          normalize: Boolean = false): DataFrame = {
    require(k >= 1, "PageRank needs at least one iteration")
    // out-degree is loop-invariant: bake it into the persisted edge
    // table once (one window shuffle on src) instead of re-joining a
    // degree table every round — per round there is then exactly ONE
    // join (edges ⋈ ranks) plus the dst aggregate.
    val e = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .withColumn("od", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("src"))
        .cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // O(1) driver scalar
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to k) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("od")).as("c"))
        .groupBy("node").agg(sum("c").as("in"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("in"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    e.unpersist(); nodes.unpersist()
    if (normalize) ranks.withColumn("rank", col("rank") * lit(n.toDouble)) else ranks
  }
}
