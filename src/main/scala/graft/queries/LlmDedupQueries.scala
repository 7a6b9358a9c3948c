package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family: exact hash dedup, MinHash-LSH, SimHash,
  * n-gram Jaccard, connected-component clusters + keep-list
  * materializer, line-level dedup, LSH precision/recall audit,
  * incremental delta-vs-corpus dedup, exact-substring spans, SemDeDup.
  *
  * Pure code motion from the original single-file LlmQueries (round-14
  * maintainability split); wiring + oracle maps stay in [[LlmQueries]].
  */
private[queries] trait LlmDedupQueries extends LlmShared {
  // ---------------------------------------------------------------- dedup

  /** Exact dedup by content hash: hash-groupBy with partial aggregation —
    * the canonical shuffle-light exact dedup at any scale (hashes are
    * uniform, so no skew; map-side combine keeps the shuffle at one row
    * per distinct hash per partition). The trailing orderBy — like every
    * global ORDER BY in this module — exists only so the correctness
    * oracle compares deterministically; a production run drops it. */
  private[queries] def exactDedup(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.groupBy(md5(lower(col("text"))).as("content_hash"))
      .agg(min("doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .select("content_hash", "keeper_doc_id", "n_copies")
      .orderBy("keeper_doc_id")
  }

  private[queries] def minhashLanes(minExpr: String => String): String =
    MinhashParams.map { case (a, b) => minExpr(s"($a * hx + $b) % $MinhashP") }.mkString(",\n                   ")

  /** Round 21: the 12-lane `mh` array rides the band explode, the
    * bucket-count window and the band join instead of being re-attached
    * to candidate pairs by two `sig` self-joins — each join re-ran the
    * full minhash_sig kernel pass over the corpus (Spark inlines every
    * CTE reference). mh is functionally dependent on doc_id, so the
    * pair DISTINCT over (id, mh) pairs is 1:1 with the old id-only
    * DISTINCT and est_jaccard per pair is unchanged. The band rows
    * widen by ~100 B against a kernel pass saved per removed join; the
    * band fan-in is BandCap-bounded at any scale.
    * `-Dgraft.lsh.mh=join` restores the join shape (A/B hook). */
  private[graft] def minhashSql(bandCap: Int = BandCap): String = {
    val carry = !sys.props.get("graft.lsh.mh").contains("join")
    val candEst =
      if (carry) s"""
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.mh AS mh_a, b.doc_id AS id_b, b.mh AS mh_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      WHERE a.bsz <= $bandCap),
    est AS (
      SELECT id_a, id_b,
             size(filter(sequence(0, 11), k -> element_at(mh_a, k+1) = element_at(mh_b, k+1))) / cast(12 AS double) AS est_jaccard
      FROM cand)"""
      else s"""
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      WHERE a.bsz <= $bandCap),
    est AS (
      SELECT id_a, id_b,
             size(filter(sequence(0, 11), k -> element_at(sa.mh, k+1) = element_at(sb.mh, k+1))) / cast(12 AS double) AS est_jaccard
      FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id)"""
    val mhCol = if (carry) ", mh" else ""
    s"""
    WITH sig AS (
      -- minhash_sig is a native codegen'd Expression (graft.functions
      -- .MinhashSignature): shingling + md5 + the 12 min-lanes run as one
      -- JVM loop per document, map-side — no shingle explode, no shuffle
      -- of shingle rows, no interpreted HOF lambdas. The cheap split()
      -- filter mirrors the old WHERE size(t) >= 3 so the optimizer never
      -- pushes an IsNotNull(mh) through the project (which would compute
      -- the signature twice).
      SELECT doc_id, minhash_sig(text) AS mh
      FROM documents WHERE size(split(lower(text), '\\\\s+')) >= 3),
    bands AS (
      SELECT doc_id$mhCol, b,
             md5(concat_ws(',', cast(element_at(mh, b*3+1) AS string), cast(element_at(mh, b*3+2) AS string), cast(element_at(mh, b*3+3) AS string))) AS bh
      FROM sig LATERAL VIEW explode(sequence(0, 3)) bt AS b),
    bandsc AS (
      -- bucket-size window shares the (b, bh) shuffle the self-join needs
      SELECT doc_id$mhCol, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),$candEst
    SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b"""
  }

  /** The q22 oracle's CTE list up through `est` — shared with the q41
    * cluster oracle, which extends it with a recursive reachability CTE. */
  private[queries] def minhashOracleCtes(bandCap: Int) = s"""toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents),
    shingles AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))) AS sh
      FROM toks WHERE len(t) >= 3),
    shingle_rows AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $MinhashP AS hx
      FROM (SELECT doc_id, unnest(sh) AS shingle FROM shingles)),
    sig AS (
      SELECT doc_id,
             [${minhashLanes(e => s"min($e)")}] AS mh
      FROM shingle_rows GROUP BY doc_id),
    bands AS (
      SELECT doc_id, b, md5(concat_ws(',', mh[b*3+1]::VARCHAR, mh[b*3+2]::VARCHAR, mh[b*3+3]::VARCHAR)) AS bh
      FROM sig, unnest(range(4)) AS bt(b)),
    bandsc AS (
      SELECT doc_id, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      WHERE a.bsz <= $bandCap),
    est AS (
      SELECT id_a, id_b,
             len(list_filter(range(12), k -> sa.mh[k+1] = sb.mh[k+1])) / 12.0 AS est_jaccard
      FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id)"""

  private[graft] def minhashOracle(bandCap: Int = BandCap) = s"""
    WITH ${minhashOracleCtes(bandCap)}
    SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b"""

  /** q41 oracle: same pair generation, then connected components by
    * recursive reachability (DuckDB supports recursive CTEs; Spark does
    * not, so the engine side iterates min-propagation — see
    * [[dupClusters]]). `reach(id, r)` holds every (node, reachable node);
    * min(r) per id is the component's minimum doc_id. */
  private[graft] def dupClustersOracle(bandCap: Int = BandCap) = s"""
    WITH RECURSIVE ${minhashOracleCtes(bandCap)},
    pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    verts AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
    comp AS (SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id)
    SELECT doc_id, cluster_rep,
           count(1) OVER (PARTITION BY cluster_rep) AS cluster_size
    FROM comp ORDER BY doc_id"""

  /** Near-dup CLUSTERS from the q22 pair graph: connected components with
    * the component's minimum doc_id as representative — the operation a
    * corpus dedup actually runs after LSH pair detection (keep the rep,
    * drop the rest). Spark has no recursive CTE, so components are
    * computed by alternating large-star/small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14):
    * rounds are O(log n) on ANY graph shape — including the pathological
    * chain that makes plain min-label propagation take O(diameter) = O(n)
    * Spark jobs. Each round is two neighborhood-min passes over the edge
    * list (window-min + dedup — no join); the driver loop only reads a
    * COUNT/CHECKSUM per round, no row data ever reaches the driver. */
  private[queries] def dupClusters(s: SparkSession, dir: String): DataFrame = {
    val s2 = docs(s, dir)
    connectedComponents(s2.sql(minhashSql()).select(col("id_a"), col("id_b")),
      allowLocal = graft.ops.InterpretedLoop.isSmall(s2.table("documents")))
  }

  /** The dedup MATERIALIZER — what a corpus pipeline actually runs after
    * near-dup detection: keep each cluster's representative (minimum
    * doc_id), drop the other members, emit the surviving corpus. The
    * anti-join carries NO broadcast hint on purpose (VERDICT r5): on a
    * duplicate-heavy crawl corpus the drop set is O(corpus) doc_ids —
    * 30-80% of documents is routine — and a forced broadcast of billions
    * of ids OOMs the driver. Left unhinted, AQE broadcasts when the drop
    * side measures small at runtime and degrades to a shuffled hash
    * anti-join (both sides partitioned by doc_id, still one shuffle of
    * 8-byte keys) when it doesn't — the correct behavior at every dup
    * rate. Everything upstream is the q22+q41 machinery unchanged. */
  private[queries] def dedupKeep(s: SparkSession, dir: String): DataFrame = {
    val s2 = docs(s, dir)
    val clusters = connectedComponents(s2.sql(minhashSql()).select(col("id_a"), col("id_b")),
      allowLocal = graft.ops.InterpretedLoop.isSmall(s2.table("documents")))
    val drop = clusters.filter(col("doc_id") =!= col("cluster_rep")).select("doc_id")
    s2.table("documents").join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy("doc_id")
  }

  /** q57 oracle: q41's recursive-CTE components, then keep docs that are
    * not a non-representative member. */
  private[queries] def dedupKeepOracle(bandCap: Int = BandCap) = s"""
    WITH RECURSIVE ${minhashOracleCtes(bandCap)},
    pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    verts AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
    comp AS (SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id),
    dropset AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_rep)
    SELECT d.doc_id, d.source, d.lang
    FROM documents d LEFT JOIN dropset x ON d.doc_id = x.doc_id
    WHERE x.doc_id IS NULL
    ORDER BY d.doc_id"""

  private[queries] lazy val ccWin = org.apache.spark.sql.expressions.Window.partitionBy("src")

  /** Large-star: every node connects its strictly-LARGER neighbors to the
    * minimum of its closed neighborhood. One window-min shuffle over the
    * symmetric edge list + one dedup shuffle; output stays oriented
    * src > dst (m <= u < v). */
  private[queries] def largeStar(edges: DataFrame): DataFrame =
    edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .withColumn("m", least(col("src"), min("dst").over(ccWin)))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()

  /** Small-star: every node connects its smaller-or-equal neighbors (and
    * itself) to its neighborhood minimum. Operates on edges oriented
    * src > dst, so the window min IS the neighborhood min. */
  private[queries] def smallStar(edges: DataFrame): DataFrame = {
    val withM = edges
      .select(greatest(col("src"), col("dst")).as("src"), least(col("src"), col("dst")).as("dst"))
      .withColumn("m", min("dst").over(ccWin))
    withM.select(col("dst").as("src"), col("m").as("dst"))
      .union(withM.select(col("src"), col("m").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** Connected components over an undirected pair list (`id_a`, `id_b`)
    * → (`doc_id`, `cluster_rep`, `cluster_size`), rep = component
    * minimum. Exposed for direct testing on pathological graph shapes
    * (chains, rings) independent of the LSH pair source. */
  private[graft] def connectedComponents(pairs: DataFrame,
                                         allowLocal: Boolean = false): DataFrame =
    connectedComponentsWithRounds(pairs, allowLocal)._1

  /** Driver-local pair cap for the size-gated CC fast path (~32 MB of
    * longs at the cap — far above any gated corpus's pair set). */
  private[queries] val MaxDriverPairs = 2000000

  /** Driver-local connected components: union-find with min-id
    * representatives — bit-identical to the star-contraction fixpoint
    * (both compute min-reachability on INTEGER ids; no float order
    * anywhere). One pass over the collected pairs, O(E α(V)). */
  private[queries] def componentsLocal(spark: SparkSession,
                                       pairs: Array[(Long, Long)]): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x
      while (parent.getOrDefault(c, c) != r) { val n = parent.getOrDefault(c, c); parent.put(c, r); c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    // union-by-min already keeps the root the minimum id of its tree,
    // since every union links the larger root under the smaller one
    val repOf = new java.util.HashMap[Long, Long]()
    val sizeOf = new java.util.HashMap[Long, Long]()
    val ids = new Array[Long](parent.size)
    var i = 0
    val it = parent.keySet().iterator()
    while (it.hasNext) { ids(i) = it.next(); i += 1 }
    ids.foreach { id =>
      val r = find(id)
      repOf.put(id, r)
      sizeOf.merge(r, 1L, (a, b) => a + b)
    }
    import spark.implicits._
    ids.toIndexedSeq.sorted
      .map(id => (id, repOf.get(id), sizeOf.get(repOf.get(id)).longValue()))
      .toDF("doc_id", "cluster_rep", "cluster_size")
  }

  /** Alternating large-star/small-star contraction to a star-forest
    * fixpoint: every non-root node ends up with a single edge to its
    * component's minimum id. Returns the result plus the number of
    * contraction rounds taken (spec-asserted O(log n) on a chain).
    * LAZY localCheckpoint each round truncates the logical plan (without
    * which the round-over-round lineage makes Catalyst re-optimize an
    * ever-deeper plan — the classic iterative-algorithm blowup;
    * GraphFrames checkpoints for the same reason) while the round's
    * checksum probe materializes the marked frame in the SAME job — one
    * driver action per round, the SCC/PageRank loop discipline.
    * Convergence = (count, xxhash64-xor) checksum of the
    * canonically-oriented edge set unchanged — an O(1) driver-side
    * comparison of two aggregates (xor, not sum: overflow-free under
    * ANSI mode, order-independent, and the edge set is distinct so no
    * duplicate cancellation can occur). */
  private[graft] def connectedComponentsWithRounds(pairs: DataFrame,
                                                   allowLocal: Boolean = false): (DataFrame, Int) = {
    // Size-gated driver-local fast path (optimization round 20, guide
    // §1.2): dedup pair sets are CLUSTER-sized (bounded by bandCap and
    // the corpus's duplicate rate), yet the star-contraction fixpoint
    // pays 2 jobs + a checksum action per round for them. Callers that
    // can see the corpus is small (the documents_rp/BPE isSmall gate)
    // pass allowLocal; a hard row cap confirms before anything is
    // collected, so a mis-estimated giant pair set falls through to the
    // distributed loop. Union-find on integer ids is EXACTLY min-
    // reachability — no float order anywhere — and the parity is pinned
    // in ConnectedComponentsSpec (local == distributed on chains/rings/
    // stars), with q41/q57 staying DuckDB-oracle hash-gated.
    if (allowLocal) {
      val rows = pairs.limit(MaxDriverPairs + 1).collect()
      if (rows.length <= MaxDriverPairs)
        return (componentsLocal(pairs.sparkSession,
          rows.map(r => (r.getLong(0), r.getLong(1)))), 0)
    }
    // checkpoint the pair SOURCE once: both the edge canonicalization
    // (materialized by the first checksum) and the vertex set (first
    // read at the caller's final action) ride one block set — for an
    // LSH pair source (q41/q57) this halves the dominant minhash pass
    val p0 = pairs.localCheckpoint(eager = false)
    // explode, not union(select, select): ONE pass over p0 — two union
    // branches in one stage race to fill the unmaterialized checkpoint
    // blocks, doubling the pair-source pass (the q146/q223 finding)
    val verts = p0.select(
        explode(array(col(p0.columns(0)), col(p0.columns(1)))).as("id"))
      .distinct().localCheckpoint(eager = false)
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var edges = p0.toDF("src", "dst")
      .select(greatest(col("src"), col("dst")).as("src"), least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint(eager = false)
    val ccDebug = sys.env.contains("GRAFT_CC_DEBUG") || sys.props.contains("graft.cc.debug")
    var sig = checksum(edges)
    var rounds = 0
    var converged = sig._1 == 0L
    // NOT an InterpretedLoop scope: every star-contraction round
    // rewrites the FULL edge set (unlike frontier-bounded BFS levels),
    // so codegen pays for itself (r18 A/B: interpreted rounds cost q41
    // +0.3 s)
    while (!converged) {
      val t0 = System.nanoTime()
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      rounds += 1
      val nextSig = checksum(next)
      if (ccDebug) System.err.println(
        f"[cc] round $rounds: ${(System.nanoTime() - t0) / 1e6}%.0f ms, edges=${nextSig._1}")
      converged = nextSig == sig
      sig = nextSig
      edges = next
    }
    // At the fixpoint edges form stars (child -> component-min root);
    // the groupBy is belt-and-braces canonicalization, roots/isolated
    // vertices label themselves via the left join.
    val reps = verts.join(
        edges.groupBy(col("src").as("id")).agg(min("dst").as("rep")), Seq("id"), "left")
      .select(col("id").as("doc_id"), coalesce(col("rep"), col("id")).as("cluster_rep"))
    val out = reps.withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("cluster_rep")))
      .orderBy("doc_id")
    (out, rounds)
  }

  /** 32-bit SimHash over token hashes (frequency-weighted, standard
    * construction). Physical shape: simhash32 is a native codegen'd
    * Expression (graft.functions.SimHash32) — tokenization, per-token
    * md5, the 32 vote counters, and bit assembly run as one JVM loop per
    * DOCUMENT, entirely map-side. The previous shape (explode tokens →
    * 32-sum hash aggregation) shuffled one row per document; this one
    * shuffles nothing. Integer vote sums are order-independent, so the
    * result is bit-identical to the aggregation form (property-tested). */
  private[queries] lazy val simhashSql = """
    SELECT doc_id, simhash32(text) AS simhash
    FROM documents ORDER BY doc_id"""

  private[queries] lazy val simhashOracle = """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
    h AS (SELECT doc_id, list_transform(t, tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS hs FROM toks)
    SELECT doc_id,
      list_reduce(list_transform(range(32), i ->
        CASE WHEN list_reduce(list_transform(hs, x -> ((x >> i) & 1) * 2 - 1), (s, x) -> s + x) > 0
             THEN (1::BIGINT << i) ELSE 0::BIGINT END), (s, x) -> s + x) AS simhash
    FROM h ORDER BY doc_id"""

  /** Exact n-gram Jaccard via an inverted index: group shingles into
    * posting lists, generate candidate pairs only WITHIN a posting list,
    * then |A∩B| / (|A|+|B|-|A∩B|). Physical shape: ONE shuffle of the
    * (shingle, doc) rows into a hash aggregation (vs TWO for a self-join)
    * keyed on `xxhash64(shingle)` — 8-byte shuffle keys instead of long
    * strings (collision odds ~|shingles|²/2^65, immaterial); single-doc
    * shingles are dropped before pair generation, so unique shingles
    * (the vast majority) never produce join work. Per-doc shingle counts
    * are map-side (`size(shs)`) and broadcast into the final join. Hot
    * shingles (stop phrases) are dropped by the document-frequency cap
    * in the HAVING — a shingle in >cap docs would make the posting-list
    * explode d² for that key, and it cannot by itself push any pair's
    * Jaccard high (both docs have ≥cap other shingles' worth of text
    * only if they share much more than the stop phrase). */
  /** Round 21: the per-doc shingle count rides the explode into the
    * posting lists as a struct field and comes back out of the pair
    * group-by via max() (cnt is functionally dependent on doc_id) — the
    * separate `n` CTE re-ran the word_shingle_hashes kernel pass over
    * the corpus (Spark inlines every CTE reference) and joined it back
    * twice. Posting entries widen by 8 B against a kernel pass saved;
    * the posting fan-in is df-capped at any scale.
    * `-Dgraft.jaccard.cnt=join` restores the join shape (A/B hook). */
  private[graft] def ngramJaccardSql(dfCap: Int = DocFreqCap): String = {
    val carry = !sys.props.get("graft.jaccard.cnt").contains("join")
    val body =
      if (carry) s"""
    ds AS (SELECT doc_id, cast(size(shs) AS bigint) AS cnt, sid
           FROM sh LATERAL VIEW explode(shs) st AS sid),
    posting AS (
      SELECT sid, collect_list(struct(doc_id, cnt)) AS ids FROM ds GROUP BY sid
      HAVING count(1) BETWEEN 2 AND $dfCap),
    common AS (
      SELECT id_a, id_b, max(cnt_a) AS cnt_a, max(cnt_b) AS cnt_b, count(1) AS cm
      FROM (SELECT a.doc_id AS id_a, a.cnt AS cnt_a, b.doc_id AS id_b, b.cnt AS cnt_b
            FROM posting
            LATERAL VIEW explode(ids) ta AS a
            LATERAL VIEW explode(ids) tb AS b) p
      WHERE id_a < id_b
      GROUP BY id_a, id_b)
    SELECT id_a, id_b, cast(cm AS double) / (cnt_a + cnt_b - cm) AS jaccard
    FROM common
    WHERE cast(cm AS double) / (cnt_a + cnt_b - cm) >= 0.4
    ORDER BY id_a, id_b"""
      else s"""
    n AS (SELECT doc_id, cast(size(shs) AS bigint) AS cnt FROM sh),
    ds AS (SELECT doc_id, sid FROM sh LATERAL VIEW explode(shs) st AS sid),
    posting AS (
      SELECT sid, collect_list(doc_id) AS ids FROM ds GROUP BY sid
      HAVING count(1) BETWEEN 2 AND $dfCap),
    common AS (
      SELECT id_a, id_b, count(1) AS cm
      FROM (SELECT a AS id_a, b AS id_b
            FROM posting
            LATERAL VIEW explode(ids) ta AS a
            LATERAL VIEW explode(ids) tb AS b) p
      WHERE id_a < id_b
      GROUP BY id_a, id_b)
    SELECT id_a, id_b, cast(cm AS double) / (na.cnt + nb.cnt - cm) AS jaccard
    FROM common JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
    WHERE cast(cm AS double) / (na.cnt + nb.cnt - cm) >= 0.4
    ORDER BY id_a, id_b"""
    s"""
    WITH sh AS (
      -- word_shingle_hashes (native Expression): tokenize + shingle +
      -- xxhash64 in one codegen'd loop per row; only 8-byte hashes are
      -- exploded and shuffled, never shingle strings.
      SELECT doc_id, word_shingle_hashes(text, 3) AS shs
      FROM documents WHERE size(split(lower(text), '\\\\s+')) >= 3),$body"""
  }

  private[graft] def ngramJaccardOracle(dfCap: Int = DocFreqCap) = s"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))) AS shs
      FROM toks WHERE len(t) >= 3),
    ds AS (SELECT doc_id, unnest(shs) AS shingle FROM sh),
    n AS (SELECT doc_id, count(1) AS cnt FROM ds GROUP BY doc_id),
    df AS (SELECT shingle FROM ds GROUP BY shingle HAVING count(1) BETWEEN 2 AND $dfCap),
    dsf AS (SELECT ds.doc_id, ds.shingle FROM ds JOIN df USING (shingle)),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(1) AS cm
      FROM dsf a JOIN dsf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b, cm::DOUBLE / (na.cnt + nb.cnt - cm) AS jaccard
    FROM common JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id
    WHERE cm::DOUBLE / (na.cnt + nb.cnt - cm) >= 0.4
    ORDER BY id_a, id_b"""

  /** Line-level cross-document dedup audit (q154) — the CCNet shard
    * pass (Wenzek et al. 2020): normalize each line, hash it, drop every
    * later occurrence of a line seen anywhere else in the corpus, report
    * per-source retention. The synthetic corpus has no '\n', so the line
    * segmenter is PINNED to 12-token segments (documented stand-in — in
    * production the boundary function is the newline split; everything
    * downstream is segmenter-agnostic). "First occurrence" is pinned to
    * min (doc_id, line_idx) — deterministic under any parallelism, where
    * CCNet's shard-order rule is not. Physical shape at 100 TB: one
    * map-only segment explode, ONE window over the line-hash key (hash
    * shuffle — the same class as q130's fingerprint window; a duplicated
    * boilerplate line costs O(df), never O(df²)), one doc-keyed agg, one
    * source-keyed agg. No pair join anywhere. */
  private[queries] lazy val lineDedupSql = """
    WITH tok AS (SELECT doc_id, source, split(text, ' ') AS t FROM documents),
    lines AS (
      SELECT doc_id, source, start div 12 AS line_idx,
             array_join(slice(t, start + 1, 12), ' ') AS line
      FROM tok LATERAL VIEW explode(sequence(0, greatest(size(t) - 1, 0), 12)) AS start),
    ranked AS (
      SELECT doc_id, source, line,
             row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, line_idx) AS occ
      FROM lines),
    perdoc AS (
      SELECT doc_id, source, count(1) AS n_lines,
             sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS kept,
             sum(CASE WHEN occ = 1 THEN length(line) ELSE 0 END) AS kept_chars,
             sum(length(line)) AS chars
      FROM ranked GROUP BY doc_id, source)
    SELECT source, count(1) AS docs, sum(n_lines) AS n_lines,
           sum(n_lines - kept) AS dropped_lines,
           round(sum(kept_chars) / sum(chars), 6) AS retained_frac,
           sum(CASE WHEN kept = 0 THEN 1 ELSE 0 END) AS empty_docs
    FROM perdoc GROUP BY source ORDER BY source"""

  private[queries] lazy val lineDedupOracle = """
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    lines AS (
      SELECT doc_id, source, s.s // 12 AS line_idx,
             array_to_string(t[s.s + 1 : s.s + 12], ' ') AS line
      FROM tok, unnest(range(0, greatest(len(t) - 1, 0) + 1, 12)) AS s(s)),
    ranked AS (
      SELECT doc_id, source, line,
             row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, line_idx) AS occ
      FROM lines),
    perdoc AS (
      SELECT doc_id, source, count(1) AS n_lines,
             sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS kept,
             sum(CASE WHEN occ = 1 THEN length(line) ELSE 0 END) AS kept_chars,
             sum(length(line)) AS chars
      FROM ranked GROUP BY doc_id, source)
    SELECT source, CAST(count(1) AS BIGINT) AS docs, CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(n_lines - kept) AS BIGINT) AS dropped_lines,
           round(CAST(sum(kept_chars) AS DOUBLE) / sum(chars), 6) AS retained_frac,
           CAST(sum(CASE WHEN kept = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_docs
    FROM perdoc GROUP BY source ORDER BY source"""

  /** MinHash-LSH dedup-quality audit (q164) — the eval harness every
    * production dedup deployment runs (the q85 recall-audit idea, for
    * the q22 pipeline): compare the LSH near-dup decision (band-bucket
    * candidates + est-Jaccard ≥ 0.5 — exactly the q22 pipeline, band
    * cap included) against ground truth = the q24 exact 3-gram Jaccard
    * pipeline at ≥ 0.5. Reports candidate/truth/hit counts, precision
    * and recall (pinned 1.0 on empty denominators). Both passes are the
    * proven corpus-scale shapes: truth is the df-capped posting-list
    * join (pairs sharing zero informative shingles never materialize;
    * the cap may hide pathological boilerplate pairs — the documented
    * q24 stance), candidates are the capped band buckets. An id-random
    * doc sample would be WRONG here: near-dup pairs almost never
    * co-survive random sampling (verified on the corpus — the %5 sample
    * holds 0 of the 25 true pairs), so the audit joins two full
    * scale-sane passes instead. */
  /** The truth side's document sizes and the candidate side's signatures
    * are each needed at two+ places; Spark inlines every CTE reference,
    * so each extra reference re-runs the kernel pass (word_shingle_hashes
    * / minhash_sig over the corpus). Round 21 measures two alternative
    * shapes per side, interleaved-A/B-selectable via system properties
    * (`graft.audit.shingle`, `graft.audit.mh` — value `join` restores the
    * round-20 shape):
    *  - shingle side `carry`: size(shs) rides the explode into the
    *    posting lists as a struct field and comes back out of the pair
    *    group-by via max() (cnt is functionally dependent on doc_id, so
    *    max = the value) — the separate `n` CTE (a second kernel pass)
    *    and its two joins disappear;
    *  - minhash side `carry`: the 12-lane mh array rides the band
    *    explode, the bucket-count window and the band join, and the
    *    DISTINCT dedupes (id, mh) pairs (mh functionally dependent on
    *    doc_id) — two of the three sig kernel passes disappear. */
  private[queries] def dedupAuditSql: String = {
    val shingleCarry = !sys.props.get("graft.audit.shingle").contains("join")
    val mhCarry = !sys.props.get("graft.audit.mh").contains("join")
    val truthSide =
      if (shingleCarry) s"""
    ds AS (SELECT doc_id, cast(size(shs) AS bigint) AS cnt, sid
           FROM sh LATERAL VIEW explode(shs) st AS sid),
    posting AS (SELECT sid, collect_list(struct(doc_id, cnt)) AS ids FROM ds GROUP BY sid
                HAVING count(1) BETWEEN 2 AND $DocFreqCap),
    common AS (
      SELECT id_a, id_b, max(cnt_a) AS cnt_a, max(cnt_b) AS cnt_b, count(1) AS cm
      FROM (SELECT a.doc_id AS id_a, a.cnt AS cnt_a, b.doc_id AS id_b, b.cnt AS cnt_b
            FROM posting LATERAL VIEW explode(ids) ta AS a LATERAL VIEW explode(ids) tb AS b) p
      WHERE id_a < id_b GROUP BY id_a, id_b),
    exact AS (
      SELECT id_a, id_b, cast(cm AS double) / (cnt_a + cnt_b - cm) AS jaccard
      FROM common),"""
      else s"""
    n AS (SELECT doc_id, cast(size(shs) AS bigint) AS cnt FROM sh),
    ds AS (SELECT doc_id, sid FROM sh LATERAL VIEW explode(shs) st AS sid),
    posting AS (SELECT sid, collect_list(doc_id) AS ids FROM ds GROUP BY sid
                HAVING count(1) BETWEEN 2 AND $DocFreqCap),
    common AS (
      SELECT id_a, id_b, count(1) AS cm
      FROM (SELECT a AS id_a, b AS id_b FROM posting
            LATERAL VIEW explode(ids) ta AS a LATERAL VIEW explode(ids) tb AS b) p
      WHERE id_a < id_b GROUP BY id_a, id_b),
    exact AS (
      SELECT id_a, id_b, cast(cm AS double) / (na.cnt + nb.cnt - cm) AS jaccard
      FROM common JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id),"""
    val candSide =
      if (mhCarry) s"""
    bands AS (
      SELECT doc_id, mh, b,
             md5(concat_ws(',', cast(element_at(mh, b*3+1) AS string),
                 cast(element_at(mh, b*3+2) AS string),
                 cast(element_at(mh, b*3+3) AS string))) AS bh
      FROM sig LATERAL VIEW explode(sequence(0, 3)) bt AS b),
    bandsc AS (
      SELECT doc_id, mh, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),
    cand0 AS (
      SELECT DISTINCT a.doc_id AS id_a, a.mh AS mh_a, b.doc_id AS id_b, b.mh AS mh_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      WHERE a.bsz <= $BandCap),
    cand AS (
      SELECT id_a, id_b FROM cand0
      WHERE size(filter(sequence(0, 11), k -> element_at(mh_a, k+1) = element_at(mh_b, k+1)))
              / cast(12 AS double) >= 0.5),"""
      else s"""
    bands AS (
      SELECT doc_id, b,
             md5(concat_ws(',', cast(element_at(mh, b*3+1) AS string),
                 cast(element_at(mh, b*3+2) AS string),
                 cast(element_at(mh, b*3+3) AS string))) AS bh
      FROM sig LATERAL VIEW explode(sequence(0, 3)) bt AS b),
    bandsc AS (
      SELECT doc_id, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),
    cand0 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      WHERE a.bsz <= $BandCap),
    cand AS (
      SELECT c.id_a, c.id_b
      FROM cand0 c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
      WHERE size(filter(sequence(0, 11), k -> element_at(sa.mh, k+1) = element_at(sb.mh, k+1)))
              / cast(12 AS double) >= 0.5),"""
    s"""
    WITH sh AS (SELECT doc_id, word_shingle_hashes(text, 3) AS shs
           FROM documents_rp WHERE size(split(lower(text), '\\\\s+')) >= 3),$truthSide
    truth AS (SELECT id_a, id_b FROM exact WHERE jaccard >= 0.5),
    sig AS (SELECT doc_id, minhash_sig(text) AS mh
            FROM documents_rp WHERE size(split(lower(text), '\\\\s+')) >= 3),$candSide
    j AS (
      -- both pair sets are unique per (id_a, id_b) (cand via DISTINCT,
      -- truth via the pair group-by), so ONE full outer join yields all
      -- three counts in a single pass — the old three scalar subqueries
      -- re-ran the cand subtree twice and the truth subtree twice
      SELECT (c.id_a IS NOT NULL) AS in_c, (t.id_a IS NOT NULL) AS in_t
      FROM cand c FULL JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b),
    cnts AS (SELECT coalesce(sum(CASE WHEN in_t THEN 1 ELSE 0 END), cast(0 AS bigint)) AS n_truth,
                    coalesce(sum(CASE WHEN in_c THEN 1 ELSE 0 END), cast(0 AS bigint)) AS n_cand,
                    coalesce(sum(CASE WHEN in_c AND in_t THEN 1 ELSE 0 END), cast(0 AS bigint)) AS n_hit
             FROM j)
    SELECT n_truth, n_cand, n_hit,
           round(CASE WHEN n_cand = 0 THEN 1.0 ELSE cast(n_hit AS double) / n_cand END, 6) AS precision_,
           round(CASE WHEN n_truth = 0 THEN 1.0 ELSE cast(n_hit AS double) / n_truth END, 6) AS recall_
    FROM cnts"""
  }

  private[queries] lazy val dedupAuditOracle = s"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents),
    shl AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))) AS shs
      FROM toks WHERE len(t) >= 3),
    ds AS (SELECT doc_id, unnest(shs) AS shingle FROM shl),
    n AS (SELECT doc_id, count(1) AS cnt FROM ds GROUP BY doc_id),
    dfs AS (SELECT shingle FROM ds GROUP BY shingle HAVING count(1) BETWEEN 2 AND $DocFreqCap),
    dsf AS (SELECT ds.doc_id, ds.shingle FROM ds JOIN dfs USING (shingle)),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(1) AS cm
      FROM dsf a JOIN dsf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    exact AS (
      SELECT id_a, id_b, cm::DOUBLE / (na.cnt + nb.cnt - cm) AS jaccard
      FROM common JOIN n na ON id_a = na.doc_id JOIN n nb ON id_b = nb.doc_id),
    truth AS (SELECT id_a, id_b FROM exact WHERE jaccard >= 0.5),
    shingle_rows AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $MinhashP AS hx
      FROM (SELECT doc_id, unnest(shs) AS shingle FROM shl)),
    sig AS (
      SELECT doc_id,
             [${minhashLanes(e => s"min($e)")}] AS mh
      FROM shingle_rows GROUP BY doc_id),
    bands AS (
      SELECT doc_id, b, md5(concat_ws(',', mh[b*3+1]::VARCHAR, mh[b*3+2]::VARCHAR, mh[b*3+3]::VARCHAR)) AS bh
      FROM sig, unnest(range(4)) AS bt(b)),
    bandsc AS (
      SELECT doc_id, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),
    cand0 AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
      WHERE a.bsz <= $BandCap),
    cand AS (
      SELECT c.id_a, c.id_b
      FROM cand0 c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
      WHERE len(list_filter(range(12), k -> sa.mh[k+1] = sb.mh[k+1])) / 12.0 >= 0.5),
    hit AS (SELECT c.id_a FROM cand c JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b),
    cnts AS (SELECT (SELECT count(1) FROM truth) AS n_truth,
                    (SELECT count(1) FROM cand) AS n_cand,
                    (SELECT count(1) FROM hit) AS n_hit)
    SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(CASE WHEN n_cand = 0 THEN 1.0 ELSE n_hit::DOUBLE / n_cand END, 6) AS precision_,
           round(CASE WHEN n_truth = 0 THEN 1.0 ELSE n_hit::DOUBLE / n_truth END, 6) AS recall_
    FROM cnts"""

  /** q202 — INCREMENTAL snapshot dedup: dedupe a new batch against the
    * existing corpus index, never corpus×corpus — the operational
    * reality at 100 TB (daily deltas dedupe against yesterday's index;
    * nobody re-dedupes the whole corpus). New docs (doc_id %% 3 == 0
    * here; production = the arriving snapshot) are classified exact-dup
    * (content hash present in the index), near-dup (shares a capped LSH
    * band bucket with an index doc AND q22's est-Jaccard ≥ 0.5
    * decision), or kept. Per-source admission report out.
    *
    * Scale shape: the exact pass is a hash semi-join against the
    * DISTINCT index-hash set; the near pass reuses the q22 machinery
    * with candidates RESTRICTED to new×old at the band join (the new
    * side is delta-sized, so candidate volume is O(|delta|·bucket),
    * independent of corpus size). */
  /** Round 21: same mh-carry as [[minhashSql]] — the two `sig` joins
    * that re-attached signatures to new×old candidates each re-ran the
    * minhash_sig kernel pass; the arrays now ride the band join and the
    * pair DISTINCT ((id, mh) is 1:1 with id). `-Dgraft.lsh.mh=join`
    * restores the join shape (shared A/B hook). */
  private[queries] def incrementalDedupSql: String = {
    val carry = !sys.props.get("graft.lsh.mh").contains("join")
    val mhCol = if (carry) ", mh" else ""
    val candNear =
      if (carry) s"""
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, n.mh AS mh_n, o.doc_id AS old_id, o.mh AS mh_o
      FROM bandsc n JOIN bandsc o ON n.b = o.b AND n.bh = o.bh
      WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 != 0 AND n.bsz <= $BandCap),
    near0 AS (
      SELECT DISTINCT new_id FROM (
        SELECT new_id,
               size(filter(sequence(0, 11), k -> element_at(mh_n, k+1) = element_at(mh_o, k+1))) / cast(12 AS double) AS ej
        FROM cand)
      WHERE ej >= 0.5),"""
      else s"""
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM bandsc n JOIN bandsc o ON n.b = o.b AND n.bh = o.bh
      WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 != 0 AND n.bsz <= $BandCap),
    near0 AS (
      SELECT DISTINCT new_id FROM (
        SELECT cand.new_id,
               size(filter(sequence(0, 11), k -> element_at(sa.mh, k+1) = element_at(sb.mh, k+1))) / cast(12 AS double) AS ej
        FROM cand JOIN sig sa ON cand.new_id = sa.doc_id JOIN sig sb ON cand.old_id = sb.doc_id)
      WHERE ej >= 0.5),"""
    s"""
    WITH sig AS (
      SELECT doc_id, minhash_sig(text) AS mh
      FROM documents WHERE size(split(lower(text), '\\\\s+')) >= 3),
    bands AS (
      SELECT doc_id$mhCol, b,
             md5(concat_ws(',', cast(element_at(mh, b*3+1) AS string), cast(element_at(mh, b*3+2) AS string), cast(element_at(mh, b*3+3) AS string))) AS bh
      FROM sig LATERAL VIEW explode(sequence(0, 3)) bt AS b),
    bandsc AS (
      SELECT doc_id$mhCol, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),$candNear
    hashes AS (SELECT doc_id, source, md5(lower(text)) AS h FROM documents),
    exact0 AS (
      SELECT DISTINCT n.doc_id AS new_id
      FROM hashes n JOIN (SELECT DISTINCT h FROM hashes WHERE doc_id % 3 != 0) o ON n.h = o.h
      WHERE n.doc_id % 3 = 0),
    newdocs AS (SELECT doc_id, source FROM documents WHERE doc_id % 3 = 0)
    SELECT source,
           count(1) AS n_new,
           sum(CASE WHEN e.new_id IS NOT NULL THEN 1 ELSE 0 END) AS n_exact,
           sum(CASE WHEN e.new_id IS NULL AND nr.new_id IS NOT NULL THEN 1 ELSE 0 END) AS n_near,
           sum(CASE WHEN e.new_id IS NULL AND nr.new_id IS NULL THEN 1 ELSE 0 END) AS n_kept
    FROM newdocs d
    LEFT JOIN exact0 e ON e.new_id = d.doc_id
    LEFT JOIN near0 nr ON nr.new_id = d.doc_id
    GROUP BY source ORDER BY source"""
  }

  private[queries] def incrementalDedupOracle: String = s"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents),
    shingles AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t)-2), i -> array_to_string(t[i+1:i+3], ' '))) AS sh
      FROM toks WHERE len(t) >= 3),
    shingle_rows AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $MinhashP AS hx
      FROM (SELECT doc_id, unnest(sh) AS shingle FROM shingles)),
    sig AS (
      SELECT doc_id,
             [${minhashLanes(e => s"min($e)")}] AS mh
      FROM shingle_rows GROUP BY doc_id),
    bands AS (
      SELECT doc_id, b, md5(concat_ws(',', mh[b*3+1]::VARCHAR, mh[b*3+2]::VARCHAR, mh[b*3+3]::VARCHAR)) AS bh
      FROM sig, unnest(range(4)) AS bt(b)),
    bandsc AS (
      SELECT doc_id, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM bandsc n JOIN bandsc o ON n.b = o.b AND n.bh = o.bh
      WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 <> 0 AND n.bsz <= $BandCap),
    near0 AS (
      SELECT DISTINCT new_id FROM (
        SELECT cand.new_id,
               len(list_filter(range(12), k -> sa.mh[k+1] = sb.mh[k+1])) / 12.0 AS ej
        FROM cand JOIN sig sa ON cand.new_id = sa.doc_id JOIN sig sb ON cand.old_id = sb.doc_id)
      WHERE ej >= 0.5),
    hashes AS (SELECT doc_id, source, md5(lower(text)) AS h FROM documents),
    exact0 AS (
      SELECT DISTINCT n.doc_id AS new_id
      FROM hashes n JOIN (SELECT DISTINCT h FROM hashes WHERE doc_id % 3 <> 0) o ON n.h = o.h
      WHERE n.doc_id % 3 = 0),
    newdocs AS (SELECT doc_id, source FROM documents WHERE doc_id % 3 = 0)
    SELECT source,
           CAST(count(1) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN e.new_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN e.new_id IS NULL AND nr.new_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           CAST(sum(CASE WHEN e.new_id IS NULL AND nr.new_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM newdocs d
    LEFT JOIN exact0 e ON e.new_id = d.doc_id
    LEFT JOIN near0 nr ON nr.new_id = d.doc_id
    GROUP BY source ORDER BY source"""

  // ------------------------------------------- exact-substring dedup

  /** q130 — exact-substring duplicate-span detection (the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better" class:
    * verbatim ≥k-token spans repeated anywhere in the corpus, within or
    * across documents). Lee et al. build a suffix array; the Spark-native
    * shape is stride-1 overlapping k-token window hashes (the q68 chunker
    * at stride 1), a repetition flag per window, and per-document interval
    * merge of the flagged windows into maximal spans.
    *
    * Scale shape at 100 TB: window generation is map-only (≈ one row per
    * corpus token); the repetition flag is ONE count-over-window pass
    * hash-shuffled on the window fingerprint (q113's df trick — no
    * groupBy + re-join); the span merge is one shuffle on doc_id with two
    * window functions. Crucially there is NO pair join anywhere — a
    * boilerplate window repeated in a million documents costs O(df) rows
    * through one shuffle key, never O(df²) candidate pairs, so this needs
    * no posting-list cap at all (a stronger guarantee than q22/q24's
    * capped buckets; ExactSubstringSpec pins it on an all-identical
    * corpus). Spans merge when flagged windows overlap OR touch
    * (pos gap ≤ k), so a duplicated run of any length reports as one
    * span of its full token length. k = 8 here (synthetic docs are
    * short; Lee et al. used 50 BPE tokens on web text) — the plan shape
    * is identical at any k. */
  def exactSubstringSql(k: Int = 8): String = s"""
    WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents_rp),
    wins AS (
      SELECT doc_id, CAST(w0.pos AS BIGINT) AS pos, w0.fp AS fp FROM (
        SELECT doc_id, explode(transform(sequence(0, size(ws) - $k), i ->
          struct(i AS pos, md5(concat_ws(' ', slice(ws, i + 1, $k))) AS fp))) AS w0
        FROM w WHERE size(ws) >= $k) g),
    occ AS (SELECT doc_id, pos, count(1) OVER (PARTITION BY fp) AS n FROM wins),
    flagged AS (SELECT doc_id, pos FROM occ WHERE n >= 2),
    isl AS (SELECT doc_id, pos,
              CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
                   THEN 0 ELSE 1 END AS brk
            FROM flagged),
    isl2 AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl),
    spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + $k AS e
              FROM isl2 GROUP BY 1, 2)
    SELECT doc_id, count(1) AS n_spans, sum(e - s) AS dup_tokens, min(s) AS first_pos
    FROM spans GROUP BY doc_id ORDER BY doc_id"""

  private[queries] def exactSubstringOracle(k: Int = 8): String = s"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    wins AS (SELECT doc_id, i AS pos, md5(array_to_string(ws[i+1:i+$k], ' ')) AS fp
             FROM w, unnest(range(len(ws) - $k + 1)) AS t(i) WHERE len(ws) >= $k),
    occ AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY fp) AS n FROM wins),
    flagged AS (SELECT doc_id, pos FROM occ WHERE n >= 2),
    isl AS (SELECT doc_id, pos,
              CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
                   THEN 0 ELSE 1 END AS brk
            FROM flagged),
    isl2 AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl),
    spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + $k AS e
              FROM isl2 GROUP BY 1, 2)
    SELECT doc_id, count(*) AS n_spans, CAST(sum(e - s) AS BIGINT) AS dup_tokens,
           min(s) AS first_pos
    FROM spans GROUP BY doc_id ORDER BY doc_id"""

  // -------------------------------------------------------- SemDeDup

  /** q112 — semantic deduplication (SemDeDup, Abbas et al. 2023): assign
    * every embedding to its nearest q60-style centroid cell, then find
    * near-duplicate pairs ONLY within a cell (cosine ≥ 0.35 on rounded
    * values) and drop every vector that has a lower-id near-duplicate —
    * the min-id representative of each similarity group survives (greedy
    * one-pass rule, documented and mirrored exactly by the oracle).
    * Output is the per-cell audit: vectors seen, vectors dropped.
    *
    * Scale shape at 100 TB: the codebook is k×dim values — broadcast
    * cross-score + min_by argmin exactly as q61; the pair search is an
    * equi-join on the CELL key (never corpus×corpus). k ∝ √N keeps the
    * AVERAGE cell small, but nothing in the assignment bounds a hot cell
    * (a boilerplate embedding cluster), so pair generation additionally
    * applies the q22 BandCap guard: a cell-size window shares the cell
    * shuffle, and cells above [[CellCap]] are excluded from pairing —
    * those are dense near-dup clusters that production routes to a
    * connected-components pass (q41) rather than s² scoring. The cap is
    * applied IDENTICALLY in the oracle, and the audit output still
    * reports the over-cap cell's size (n_dropped = 0 documents the
    * not-pairwise-scored state honestly).
    * Determinism: centroids rounded to 6dp before distances, fixed-order
    * zip_with folds, (d2, label) argmin tie-break, cosine rounded to 6dp
    * before the threshold compare. */
  private[graft] def semdedupSql(cellCap: Int = CellCap) = s"""
    WITH cent_rows AS (
      SELECT label AS c_label, pos, round(avg(cast(v AS double)), 6) AS mean_v
      FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
      GROUP BY label, pos),
    cents AS (
      SELECT c_label,
             transform(sort_array(collect_list(struct(pos, mean_v))), s -> s.mean_v) AS cvec
      FROM cent_rows GROUP BY c_label),
    dists AS (
      SELECT e.vec_id, c.c_label,
             l2sq_d(transform(e.embedding, x -> cast(x AS double)), c.cvec) AS d2
      FROM embeddings e CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, min_by(c_label, struct(d2, c_label)) AS cell
      FROM dists GROUP BY vec_id),
    v AS (
      SELECT a.cell, e.vec_id,
             transform(e.embedding, x -> cast(x AS double)) AS ve
      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
    vn AS (SELECT cell, vec_id, ve, sqrt(dot_d(ve, ve)) AS nrm,
                  count(1) OVER (PARTITION BY cell) AS csz FROM v),
    drops AS (
      SELECT DISTINCT b.vec_id
      FROM vn a JOIN vn b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE a.csz <= $cellCap
        AND round(dot_d(a.ve, b.ve) / (a.nrm * b.nrm), 6) >= 0.35)
    SELECT v.cell, count(1) AS n_vecs,
           sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS n_dropped
    FROM v LEFT JOIN drops d ON v.vec_id = d.vec_id
    GROUP BY v.cell ORDER BY v.cell"""

  private[graft] def semdedupOracle(cellCap: Int = CellCap) = s"""
    WITH cent_rows AS (
      SELECT label AS c_label, i AS pos, round(avg(embedding[i+1]::DOUBLE), 6) AS mean_v
      FROM embeddings, unnest(range(len(embedding))) AS t(i)
      GROUP BY label, i),
    cents AS (
      SELECT c_label, list(mean_v ORDER BY pos) AS cvec
      FROM cent_rows GROUP BY c_label),
    dists AS (
      SELECT e.vec_id, c.c_label,
             list_reduce(list_transform(range(len(c.cvec)),
                 i -> (e.embedding[i+1]::DOUBLE - c.cvec[i+1]) * (e.embedding[i+1]::DOUBLE - c.cvec[i+1])),
               (s, x) -> s + x) AS d2
      FROM embeddings e CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, c_label AS cell
      FROM (SELECT vec_id, c_label,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
            FROM dists)
      WHERE rn = 1),
    v AS (
      SELECT a.cell, e.vec_id, list_transform(e.embedding, x -> x::DOUBLE) AS ve
      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
    vn AS (
      SELECT cell, vec_id, ve,
             sqrt(list_reduce(list_transform(ve, x -> x * x), (s, x) -> s + x)) AS nrm,
             count(1) OVER (PARTITION BY cell) AS csz
      FROM v),
    drops AS (
      SELECT DISTINCT b.vec_id
      FROM vn a JOIN vn b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE a.csz <= $cellCap
        AND round(list_reduce(list_transform(range(64), i -> a.ve[i+1] * b.ve[i+1]),
                              (s, x) -> s + x) / (a.nrm * b.nrm), 6) >= 0.35)
    SELECT v.cell, count(1)::BIGINT AS n_vecs,
           sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped
    FROM v LEFT JOIN drops d ON v.vec_id = d.vec_id
    GROUP BY v.cell ORDER BY v.cell"""
}
