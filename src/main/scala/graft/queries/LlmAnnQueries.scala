package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search family: brute-force / LSH / IVF / PQ / int8 /
  * Matryoshka ANN, sparse TF-IDF cosine, JL projection, embedding
  * outliers, recall + ranking-quality audits.
  *
  * Pure code motion from the original single-file LlmQueries (round-14
  * maintainability split); wiring + oracle maps stay in [[LlmQueries]].
  */
private[queries] trait LlmAnnQueries extends LlmShared {

  // ------------------------------------------------- similarity search

  /** Brute-force cosine top-10 for a fixed query subset (vec_id % 100 = 0)
    * — the correctness baseline every ANN variant is judged against.
    * Scale shape: the query side is tiny and broadcast; similarities are
    * computed map-side; top-k is TWO-PHASE (per-partition row_number,
    * then global) so the shuffle carries ≤ k rows per (query, partition)
    * instead of the full N·Q similarity matrix. */
  private[queries] lazy val knnSql = """
    WITH v AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    vn AS (SELECT vec_id, e,
                  sqrt(dot_d(e, e)) AS nrm FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      -- dot_d is a native codegen'd Expression: the 64-wide dot product
      -- is one JVM loop (same sequential IEEE fold as the oracle), not 64
      -- interpreted lambda calls per pair.
      SELECT /*+ BROADCAST(q) */ q.qid, vn.vec_id,
             dot_d(qe, e) / (qnrm * nrm) AS sim,
             spark_partition_id() AS pid
      FROM q JOIN vn ON vn.vec_id <> q.qid),
    local_top AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid, pid ORDER BY sim DESC, vec_id) AS lrn
      FROM sims),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM local_top WHERE lrn <= 10)
    SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 10 ORDER BY qid, rank"""

  private[queries] lazy val knnOracle = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    vn AS (SELECT vec_id, e,
                  sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT q.qid, vn.vec_id,
             list_reduce(list_transform(range(64), i -> qe[i+1] * e[i+1]), (s, x) -> s + x) / (qnrm * nrm) AS sim
      FROM q CROSS JOIN vn WHERE vn.vec_id <> q.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 10 ORDER BY qid, rank"""

  /** Hyperplane weights as a SQL literal array. The planes derive
    * deterministically from md5(plane:dim) — CONSTANTS — so instead of
    * materializing them as rows and re-aggregating a broadcast CROSS
    * JOIN (a full shuffle keyed on (vec_id, e)), each signature is a
    * single map-side projection over literal arrays. Bit-identical to
    * the oracle's SQL-built planes: same md5, same `(x % 2001 - 1000) /
    * 1000.0` arithmetic, same IEEE division. */
  private[queries] def planeLiteral(h: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 64).map { d =>
      val hex = md.digest(s"$h:$d".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
    }.mkString("array(", "D, ", "D)")
  }

  private[queries] def planeSignature(nPlanes: Int): String =
    (0 until nPlanes).map(h =>
      s"(CASE WHEN dot_d(e, ${planeLiteral(h)}) > 0 THEN ${1L << h}L ELSE 0L END)")
      .mkString(" + ")

  /** Random-hyperplane LSH (6 planes → 64 buckets), then cosine top-3
    * WITHIN the query's bucket — the scale path: candidate size drops by
    * ~bucket-count× and the bucket id is a plain shuffle key. Hyperplane
    * components derive deterministically from md5(plane:dim), so engine
    * and oracle build identical planes with no RNG; the engine embeds
    * them as literals (see planeLiteral) so bucketing is map-only. */
  private[queries] lazy val lshKnnSql = s"""
    WITH v AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    vb AS (
      SELECT vec_id, e, ${planeSignature(6)} AS bucket
      FROM v),
    vn AS (SELECT vec_id, e, bucket,
                  sqrt(dot_d(e, e)) AS nrm FROM vb),
    q AS (SELECT vec_id AS qid, e AS qe, bucket AS qb, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT /*+ BROADCAST(q) */ q.qid, vn.vec_id,
             dot_d(qe, e) / (qnrm * nrm) AS sim
      FROM q JOIN vn ON vn.bucket = q.qb AND vn.vec_id <> q.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""

  private[queries] lazy val lshKnnOracle = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    hp AS (
      SELECT h, list_transform(range(64), d ->
               ((('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)) AS w
      FROM unnest(range(6)) AS ht(h)),
    vb AS (
      SELECT vec_id, e,
             sum(CASE WHEN list_reduce(list_transform(range(64), i -> e[i+1] * w[i+1]), (s, x) -> s + x) > 0
                      THEN (1 << h) ELSE 0 END) AS bucket
      FROM v CROSS JOIN hp GROUP BY vec_id, e),
    vn AS (SELECT vec_id, e, bucket,
                  sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm FROM vb),
    q AS (SELECT vec_id AS qid, e AS qe, bucket AS qb, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT q.qid, vn.vec_id,
             list_reduce(list_transform(range(64), i -> qe[i+1] * e[i+1]), (s, x) -> s + x) / (qnrm * nrm) AS sim
      FROM q JOIN vn ON vn.bucket = q.qb AND vn.vec_id <> q.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""

  /** Embedding-cosine near-duplicate detection — the dedup-family variant
    * of ANN: find PAIRS above a cosine threshold, not top-k per query.
    * Candidates come from OR-amplified random-hyperplane LSH (24 planes →
    * 4 bands × 6 bits): a pair collides when ANY band's 6 sign-bits all
    * match, so for true near-dups (production threshold ≥0.9, where
    * per-plane agreement p ≈ 0.86) recall is 1-(1-p^6)^4 ≈ 0.87 while
    * random pairs are pruned ~16×. The synthetic corpus has no real
    * near-dups, so the demo threshold is 0.35 (top of its cosine range) —
    * the PLAN is the production plan; only the constant differs. Band
    * buckets get the q22-style size cap: at scale, band width (bits per
    * band) is the knob that keeps buckets O(1), and the cap is the
    * backstop against a degenerate key. Exact cosine is verified on
    * candidates only — never all-pairs. */
  private[graft] def embedNeardupSql(bandCap: Int = BandCap) = s"""
    WITH v AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    bits AS (
      SELECT vec_id, e, ${planeSignature(24)} AS sig
      FROM v),
    bands AS (
      SELECT vec_id, b, (shiftright(sig, b * 6) & 63) AS bh
      FROM bits LATERAL VIEW explode(sequence(0, 3)) bt AS b),
    bandsc AS (
      SELECT vec_id, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.vec_id < b.vec_id
      WHERE a.bsz <= $bandCap),
    vn AS (SELECT vec_id, e, sqrt(dot_d(e, e)) AS nrm FROM v),
    pairs AS (
      SELECT id_a, id_b, dot_d(va.e, vb.e) / (va.nrm * vb.nrm) AS cosine
      FROM cand JOIN vn va ON id_a = va.vec_id JOIN vn vb ON id_b = vb.vec_id)
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.35 ORDER BY id_a, id_b"""

  private[graft] def embedNeardupOracle(bandCap: Int = BandCap) = s"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    hp AS (
      SELECT h, list_transform(range(64), d ->
               ((('0x' || substr(md5(h::VARCHAR || ':' || d::VARCHAR), 1, 8))::BIGINT % 2001 - 1000) / 1000.0)) AS w
      FROM unnest(range(24)) AS ht(h)),
    bits AS (
      SELECT vec_id, e,
             sum(CASE WHEN list_reduce(list_transform(range(64), i -> e[i+1] * w[i+1]), (s, x) -> s + x) > 0
                      THEN (1::BIGINT << h) ELSE 0::BIGINT END) AS sig
      FROM v CROSS JOIN hp GROUP BY vec_id, e),
    bands AS (
      SELECT vec_id, b, (sig >> (b * 6)::INTEGER) & 63 AS bh
      FROM bits, unnest(range(4)) AS bt(b)),
    bandsc AS (
      SELECT vec_id, b, bh, count(1) OVER (PARTITION BY b, bh) AS bsz FROM bands),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bandsc a JOIN bandsc b ON a.b = b.b AND a.bh = b.bh AND a.vec_id < b.vec_id
      WHERE a.bsz <= $bandCap),
    vn AS (SELECT vec_id, e, sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm FROM v),
    pairs AS (
      SELECT id_a, id_b,
             list_reduce(list_transform(range(64), i -> va.e[i+1] * vb.e[i+1]), (s, x) -> s + x) / (va.nrm * vb.nrm) AS cosine
      FROM cand JOIN vn va ON id_a = va.vec_id JOIN vn vb ON id_b = vb.vec_id)
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.35 ORDER BY id_a, id_b"""

  /** IVF-style ANN — the second scale path beside hyperplane LSH (q26):
    * a deterministic coarse quantizer (every 50th vector is a centroid ≈
    * an IVF codebook without k-means, keeping engine and oracle
    * RNG-free), each vector assigned to its nearest centroid cell, and
    * each query probing only its nprobe=2 nearest cells. Physical shape:
    * centroids BROADCAST into a map-side cross score; the big-side cell
    * assignment is a max_by HASH AGGREGATE (partial+final: each vector's
    * C scored rows combine map-side to one row — a sort-based window
    * here would shuffle the whole |V|×|C| score relation); the nprobe
    * window runs only on the tiny query subset. The search join touches
    * |cells probed| ≈ 2N/C vectors per query instead of N. At 100 TB: C
    * grows as √N, cells stay O(√N), and the cell id is a plain shuffle
    * key — the standard IVF partition story. */
  private[queries] lazy val ivfKnnSql = """
    WITH v AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    vn AS (SELECT vec_id, e, sqrt(dot_d(e, e)) AS nrm FROM v),
    cent AS (SELECT vec_id AS c_id, e AS ce, nrm AS cnrm FROM vn WHERE vec_id % 50 = 0),
    scored AS (
      SELECT /*+ BROADCAST(cent) */ vn.vec_id, vn.e, vn.nrm, cent.c_id,
             dot_d(vn.e, cent.ce) / (vn.nrm * cent.cnrm) AS csim
      FROM vn CROSS JOIN cent),
    -- argmax with (csim DESC, c_id ASC) tie-break via lexicographic struct
    cells AS (
      SELECT vec_id, w.e AS e, w.nrm AS nrm, w.cell AS cell FROM (
        SELECT vec_id,
               max_by(named_struct('e', e, 'nrm', nrm, 'cell', c_id),
                      named_struct('s', csim, 'nc', -c_id)) AS w
        FROM scored GROUP BY vec_id)),
    qprobe AS (
      SELECT vec_id AS qid, c_id AS cell FROM (
        SELECT vec_id, c_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS rk
        FROM scored WHERE vec_id % 100 = 0)
      WHERE rk <= 2),
    qv AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT /*+ BROADCAST(qp, qv) */ qp.qid, c.vec_id,
             dot_d(qv.qe, c.e) / (qv.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN qv ON qv.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""

  private[queries] lazy val ivfKnnOracle = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    vn AS (SELECT vec_id, e, sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm FROM v),
    cent AS (SELECT vec_id AS c_id, e AS ce, nrm AS cnrm FROM vn WHERE vec_id % 50 = 0),
    scored AS (
      SELECT vn.vec_id, vn.e, vn.nrm, cent.c_id,
             list_reduce(list_transform(range(64), i -> vn.e[i+1] * cent.ce[i+1]), (s, x) -> s + x) / (vn.nrm * cent.cnrm) AS csim
      FROM vn CROSS JOIN cent),
    assign AS (
      SELECT vec_id, e, nrm, c_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS rk
      FROM scored),
    cells AS (SELECT vec_id, e, nrm, c_id AS cell FROM assign WHERE rk = 1),
    qprobe AS (SELECT vec_id AS qid, c_id AS cell FROM assign WHERE vec_id % 100 = 0 AND rk <= 2),
    qv AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT qp.qid, c.vec_id,
             list_reduce(list_transform(range(64), i -> qv.qe[i+1] * c.e[i+1]), (s, x) -> s + x) / (qv.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN qv ON qv.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""

  /** q192 — hard-negative mining for contrastive/embedding training
    * (the triplet-mining pass every retrieval/embedding fine-tune
    * runs): for each sampled anchor, the hardest POSITIVE (top same-
    * label candidate) and the 3 hardest NEGATIVES (top different-label
    * candidates by cosine) from the anchor's nprobe=2 IVF cells — high-
    * similarity wrong-label neighbors are exactly the informative
    * training pairs. Candidates come from the q38 deterministic-IVF
    * machinery (RNG-free codebook), so the search is cell-bounded —
    * never all-pairs — and the oracle replicates candidate generation
    * exactly. Sequential-fold dot products are bit-identical across
    * engines (the q38 stance), so raw sims hash-match. */
  private[queries] lazy val hardNegSql = """
    WITH v AS (SELECT vec_id, label, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    vn AS (SELECT vec_id, label, e, sqrt(dot_d(e, e)) AS nrm FROM v),
    cent AS (SELECT vec_id AS c_id, e AS ce, nrm AS cnrm FROM vn WHERE vec_id % 50 = 0),
    scored AS (
      SELECT /*+ BROADCAST(cent) */ vn.vec_id, vn.label, vn.e, vn.nrm, cent.c_id,
             dot_d(vn.e, cent.ce) / (vn.nrm * cent.cnrm) AS csim
      FROM vn CROSS JOIN cent),
    cells AS (
      SELECT vec_id, w.label AS label, w.e AS e, w.nrm AS nrm, w.cell AS cell FROM (
        SELECT vec_id,
               max_by(named_struct('label', label, 'e', e, 'nrm', nrm, 'cell', c_id),
                      named_struct('s', csim, 'nc', -c_id)) AS w
        FROM scored GROUP BY vec_id)),
    qprobe AS (
      SELECT vec_id AS qid, c_id AS cell FROM (
        SELECT vec_id, c_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS rk
        FROM scored WHERE vec_id % 100 = 0)
      WHERE rk <= 2),
    qv AS (SELECT vec_id AS qid, label AS qlabel, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT /*+ BROADCAST(qp, qv) */ qp.qid, qv.qlabel, c.vec_id, c.label,
             dot_d(qv.qe, c.e) / (qv.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN qv ON qv.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             CASE WHEN label = qlabel THEN 'pos' ELSE 'neg' END AS kind,
             row_number() OVER (PARTITION BY qid, label = qlabel
               ORDER BY sim DESC, vec_id) AS rk
      FROM sims)
    SELECT qid, kind, rk, vec_id, sim FROM ranked
    WHERE (kind = 'neg' AND rk <= 3) OR (kind = 'pos' AND rk = 1)
    ORDER BY qid, kind, rk"""

  private[queries] lazy val hardNegOracle = """
    WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    vn AS (SELECT vec_id, label, e, sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm FROM v),
    cent AS (SELECT vec_id AS c_id, e AS ce, nrm AS cnrm FROM vn WHERE vec_id % 50 = 0),
    scored AS (
      SELECT vn.vec_id, vn.label, vn.e, vn.nrm, cent.c_id,
             list_reduce(list_transform(range(64), i -> vn.e[i+1] * cent.ce[i+1]), (s, x) -> s + x) / (vn.nrm * cent.cnrm) AS csim
      FROM vn CROSS JOIN cent),
    assign AS (
      SELECT vec_id, label, e, nrm, c_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS rk
      FROM scored),
    cells AS (SELECT vec_id, label, e, nrm, c_id AS cell FROM assign WHERE rk = 1),
    qprobe AS (SELECT vec_id AS qid, c_id AS cell FROM assign WHERE vec_id % 100 = 0 AND rk <= 2),
    qv AS (SELECT vec_id AS qid, label AS qlabel, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT qp.qid, qv.qlabel, c.vec_id, c.label,
             list_reduce(list_transform(range(64), i -> qv.qe[i+1] * c.e[i+1]), (s, x) -> s + x) / (qv.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN qv ON qv.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ranked AS (
      SELECT qid, vec_id, sim,
             CASE WHEN label = qlabel THEN 'pos' ELSE 'neg' END AS kind,
             row_number() OVER (PARTITION BY qid, (label = qlabel)
               ORDER BY sim DESC, vec_id) AS rk
      FROM sims)
    SELECT qid, kind, CAST(rk AS BIGINT) AS rk, vec_id, sim FROM ranked
    WHERE (kind = 'neg' AND rk <= 3) OR (kind = 'pos' AND rk = 1)
    ORDER BY qid, kind, rk"""

  /** q185 — sparse TF-IDF cosine top-k document similarity through an
    * INVERTED-INDEX join: the sparse-vector complement of the dense ANN
    * family (q25/q26/q38/q76/q90/q159 all search `embeddings`; real
    * retrieval stacks also run lexical/sparse search over the text
    * itself — this is that operator, the self-search form of BM25-class
    * retrieval). Weights are tf·idf with the q155 smoothed idf, L2-
    * normalized per doc so the posting-join dot product IS cosine.
    *
    * Scale shape at 100 TB: no document ever meets another except
    * through a shared term — the similarity join is posting-list keyed
    * (term), and terms above the document-frequency cap (df > 1000 here — sized to
    * the synthetic corpus's ~30-term vocabulary; production uses a
    * much smaller relative cap since high-df terms carry near-zero
    * idf weight anyway) are dropped BEFORE the join, so posting lists are bounded
    * and the candidate set per query is O(Σ|posting|), never corpus².
    * Norms use the FULL vector (cap applies to the join only — the
    * dropped mass is the near-zero idf tail, documented approximation).
    * Ranking is by the ROUNDED score then doc id (the q155/DSIR
    * ulp-drift-proof cut). */
  private[queries] lazy val sparseCosineSql = """
    WITH tok AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
    tf AS (SELECT doc_id, x AS term, count(1) AS tf
           FROM tok LATERAL VIEW explode(t) AS x GROUP BY doc_id, x),
    dfreq AS (SELECT term, count(1) AS df FROM tf GROUP BY term),
    n AS (SELECT count(1) AS n FROM documents),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS wt,
                 dfreq.df
          FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
    nrm AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nv FROM w GROUP BY doc_id),
    posting AS (SELECT w.doc_id, w.term, w.wt / nrm.nv AS uw
                FROM w JOIN nrm ON w.doc_id = nrm.doc_id WHERE w.df <= 1000),
    q AS (SELECT doc_id AS qid, term, uw AS qw FROM posting WHERE doc_id % 97 = 0),
    sims AS (SELECT q.qid, p.doc_id AS did, sum(q.qw * p.uw) AS sim
             FROM q JOIN posting p ON q.term = p.term AND p.doc_id != q.qid
             GROUP BY q.qid, p.doc_id),
    ranked AS (SELECT qid, did, sim,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY round(sim, 6) DESC, did) AS rk
               FROM sims)
    SELECT qid, rk, did, round(sim, 6) AS sim
    FROM ranked WHERE rk <= 3 ORDER BY qid, rk"""

  private[queries] lazy val sparseCosineOracle = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tf AS (SELECT doc_id, u.term AS term, CAST(count(1) AS BIGINT) AS tf
           FROM tok, unnest(t) AS u(term) GROUP BY doc_id, u.term),
    dfreq AS (SELECT term, CAST(count(1) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(count(1) AS BIGINT) AS n FROM documents),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS wt,
                 dfreq.df
          FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
    nrm AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nv FROM w GROUP BY doc_id),
    posting AS (SELECT w.doc_id, w.term, w.wt / nrm.nv AS uw
                FROM w JOIN nrm ON w.doc_id = nrm.doc_id WHERE w.df <= 1000),
    q AS (SELECT doc_id AS qid, term, uw AS qw FROM posting WHERE doc_id % 97 = 0),
    sims AS (SELECT q.qid, p.doc_id AS did, sum(q.qw * p.uw) AS sim
             FROM q JOIN posting p ON q.term = p.term AND p.doc_id <> q.qid
             GROUP BY q.qid, p.doc_id),
    ranked AS (SELECT qid, did, sim,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY round(sim, 6) DESC, did) AS rk
               FROM sims)
    SELECT qid, CAST(rk AS BIGINT) AS rk, did, round(sim, 6) AS sim
    FROM ranked WHERE rk <= 3 ORDER BY qid, rk"""

  /** q186 — Johnson-Lindenstrauss random projection (64 → 16 dims) with
    * a distance-preservation audit: the dimensionality-reduction
    * operator a 100-TB embedding pipeline runs before expensive
    * downstream passes (clustering, dedup, ANN candidate generation).
    * The projection matrix is DETERMINISTIC — sign(i,j) = ±1 from the
    * first md5 hex digit of "i_j" (the content-stable no-rand-state
    * stance of q55/q89: any executor, any run, any engine derives the
    * same matrix — nothing is broadcast, nothing is seeded), scaled by
    * 1/√k. The audit reports per-sampled-pair squared-distance ratios
    * ‖ya−yb‖²/‖xa−xb‖² — the JL lemma's preserved quantity.
    *
    * Scale shape: the projection is MAP-ONLY array lambdas (sequential
    * folds — no explode, no shuffle, no matrix join); the audit joins
    * only the O(N/25) sampled pairs on vec_id. */
  // the projection runs in the native jl_project kernel (TextExprs.
  // JlProject): the ±1 matrix is a pure function of (i, j) — the SQL
  // form recomputed 1024 interpreted md5 calls per ROW; the kernel
  // derives it once per JVM and keeps the same fold order and /4 scale
  // the oracle restates, so values are bit-identical.
  private[queries] lazy val randomProjSql = """
    WITH e AS (SELECT vec_id, transform(embedding, v -> CAST(v AS DOUBLE)) AS x
               FROM embeddings),
    y AS (SELECT vec_id, x, jl_project(x) AS yv FROM e),
    pairs AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                     a.x AS ax, b.x AS bx, a.yv AS ay, b.yv AS byv
              FROM y a JOIN y b ON b.vec_id = a.vec_id + 7
              WHERE a.vec_id % 25 = 0)
    SELECT aid, bid,
           round(aggregate(sequence(0, 63), CAST(0 AS DOUBLE),
             (acc, i) -> acc + (element_at(ax, i + 1) - element_at(bx, i + 1))
                             * (element_at(ax, i + 1) - element_at(bx, i + 1))), 6) AS d2x,
           round(aggregate(sequence(0, 15), CAST(0 AS DOUBLE),
             (acc, j) -> acc + (element_at(ay, j + 1) - element_at(byv, j + 1))
                             * (element_at(ay, j + 1) - element_at(byv, j + 1))), 6) AS d2y,
           round(aggregate(sequence(0, 15), CAST(0 AS DOUBLE),
             (acc, j) -> acc + (element_at(ay, j + 1) - element_at(byv, j + 1))
                             * (element_at(ay, j + 1) - element_at(byv, j + 1)))
             / aggregate(sequence(0, 63), CAST(0 AS DOUBLE),
             (acc, i) -> acc + (element_at(ax, i + 1) - element_at(bx, i + 1))
                             * (element_at(ax, i + 1) - element_at(bx, i + 1))), 6) AS ratio
    FROM pairs ORDER BY aid"""

  private[queries] lazy val randomProjOracle = """
    WITH e AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
               FROM embeddings),
    y AS (SELECT vec_id, x, list_transform(range(16), j ->
            list_aggregate(list_transform(range(64), i ->
              x[i + 1] *
                (CASE WHEN substring(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 1)
                      IN ('0','1','2','3','4','5','6','7')
                 THEN 1.0 ELSE -1.0 END)), 'sum') / 4.0) AS yv
          FROM e),
    pairs AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                     a.x AS ax, b.x AS bx, a.yv AS ay, b.yv AS byv
              FROM y a JOIN y b ON b.vec_id = a.vec_id + 7
              WHERE a.vec_id % 25 = 0)
    SELECT aid, bid,
           round(list_aggregate(list_transform(range(64),
             i -> (ax[i + 1] - bx[i + 1]) * (ax[i + 1] - bx[i + 1])), 'sum'), 6) AS d2x,
           round(list_aggregate(list_transform(range(16),
             j -> (ay[j + 1] - byv[j + 1]) * (ay[j + 1] - byv[j + 1])), 'sum'), 6) AS d2y,
           round(list_aggregate(list_transform(range(16),
             j -> (ay[j + 1] - byv[j + 1]) * (ay[j + 1] - byv[j + 1])), 'sum')
             / list_aggregate(list_transform(range(64),
             i -> (ax[i + 1] - bx[i + 1]) * (ax[i + 1] - bx[i + 1])), 'sum'), 6) AS ratio
    FROM pairs ORDER BY aid"""

  /** Product-quantization ANN (q159) — the Jégou et al. 2011 memory-
    * compressed ANN that completes the family (q25 brute / q26 LSH /
    * q38+q62+q65 IVF / q76 int8 / q90 Matryoshka): the 64-dim space is
    * cut into m=4 subspaces of 16 dims; each subspace trains an 8-entry
    * codebook (deterministic vec_id<8 seeds + ONE Lloyd E/M round, the
    * q64 pinning — seeds and means 6dp-rounded so both engines see
    * identical codebooks); every vector encodes to 4 one-byte codes
    * (16× compression); search is asymmetric-distance (ADC): per query,
    * a 4×8 lookup table of exact subspace distances, then adc(v) =
    * Σ_s LUT[s, code_v[s]]. Determinism: subspace folds are sequential
    * IEEE left folds (q25 technique), argmins tie-break on (d2, cid),
    * the 4-term ADC sum is four single-valued conditional sums added in
    * FIXED order (never a float sum over an unordered group), ranking
    * cuts on the 6dp-rounded distance then vec_id. Physical shape at
    * 100 TB: codebook = 32 tiny rows (broadcast everywhere), encode =
    * one broadcast-join pass over the vectors, the LUT is |Q|×32
    * (broadcast), and the ADC join is (subspace, code)-keyed with a
    * 4-rows-per-vector fan — the scan reads CODES (4 bytes/vec), never
    * re-reads float vectors; nothing is ever all-pairs in the full
    * 64-dim space. */
  private[queries] lazy val pqAnnSql = """
    WITH emb AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e
                 FROM embeddings),
    seeds AS (
      SELECT sp, c.vec_id AS cid,
             transform(sequence(0, 15), i -> round(element_at(c.e, sp * 16 + i + 1), 6)) AS svec
      FROM emb c LATERAL VIEW explode(sequence(0, 3)) s AS sp
      WHERE c.vec_id < 8),
    ed AS (
      SELECT v.vec_id AS vid, sd.sp, sd.cid,
             l2sq_d(slice(v.e, sd.sp * 16 + 1, 16), sd.svec) AS d2
      FROM emb v CROSS JOIN seeds sd),
    assign AS (SELECT vid, sp, min_by(cid, struct(d2, cid)) AS cid FROM ed GROUP BY vid, sp),
    cb_rows AS (
      SELECT a.sp, a.cid, p.pos, round(avg(element_at(v.e, a.sp * 16 + p.pos + 1)), 6) AS cv
      FROM assign a JOIN emb v ON a.vid = v.vec_id
      LATERAL VIEW explode(sequence(0, 15)) p AS pos
      GROUP BY a.sp, a.cid, p.pos),
    cb AS (SELECT sp, cid,
                  transform(sort_array(collect_list(struct(pos, cv))), s -> s.cv) AS cvec
           FROM cb_rows GROUP BY sp, cid),
    enc_d AS (
      SELECT v.vec_id AS vid, cb.sp, cb.cid,
             l2sq_d(slice(v.e, cb.sp * 16 + 1, 16), cb.cvec) AS d2
      FROM emb v CROSS JOIN cb),
    codes AS (SELECT vid, sp, min_by(cid, struct(d2, cid)) AS code FROM enc_d GROUP BY vid, sp),
    lut AS (SELECT vid AS qid, sp, cid, d2 FROM enc_d WHERE vid % 100 = 0),
    adc AS (
      SELECT l.qid, c.vid,
             sum(CASE WHEN c.sp = 0 THEN l.d2 END) + sum(CASE WHEN c.sp = 1 THEN l.d2 END) +
             sum(CASE WHEN c.sp = 2 THEN l.d2 END) + sum(CASE WHEN c.sp = 3 THEN l.d2 END) AS adc
      FROM codes c JOIN lut l ON c.sp = l.sp AND c.code = l.cid
      WHERE c.vid != l.qid
      GROUP BY l.qid, c.vid),
    ranked AS (
      SELECT qid, vid, adc,
             row_number() OVER (PARTITION BY qid ORDER BY round(adc, 6), vid) AS rk
      FROM adc)
    SELECT qid, rk, vid AS vec_id, round(adc, 6) AS adc
    FROM ranked WHERE rk <= 5 ORDER BY qid, rk"""

  private[queries] lazy val pqAnnOracle = """
    WITH emb AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
                 FROM embeddings),
    seeds AS (
      SELECT s.sp AS sp, c.vec_id AS cid,
             list_transform(range(0, 16), i -> round(c.e[s.sp * 16 + i + 1], 6)) AS svec
      FROM emb c, unnest(range(0, 4)) AS s(sp)
      WHERE c.vec_id < 8),
    ed AS (
      SELECT v.vec_id AS vid, sd.sp, sd.cid,
             list_reduce(list_transform(range(0, 16),
                 i -> (v.e[sd.sp * 16 + i + 1] - sd.svec[i + 1])
                    * (v.e[sd.sp * 16 + i + 1] - sd.svec[i + 1])),
               (s, x) -> s + x) AS d2
      FROM emb v CROSS JOIN seeds sd),
    assign AS (
      SELECT vid, sp, cid FROM (
        SELECT vid, sp, cid, row_number() OVER (PARTITION BY vid, sp ORDER BY d2, cid) AS rn
        FROM ed) WHERE rn = 1),
    cb_rows AS (
      SELECT a.sp, a.cid, p.pos AS pos, round(avg(v.e[a.sp * 16 + p.pos + 1]), 6) AS cv
      FROM assign a JOIN emb v ON a.vid = v.vec_id, unnest(range(0, 16)) AS p(pos)
      GROUP BY a.sp, a.cid, p.pos),
    cb AS (SELECT sp, cid, list(cv ORDER BY pos) AS cvec FROM cb_rows GROUP BY sp, cid),
    enc_d AS (
      SELECT v.vec_id AS vid, cb.sp, cb.cid,
             list_reduce(list_transform(range(0, 16),
                 i -> (v.e[cb.sp * 16 + i + 1] - cb.cvec[i + 1])
                    * (v.e[cb.sp * 16 + i + 1] - cb.cvec[i + 1])),
               (s, x) -> s + x) AS d2
      FROM emb v CROSS JOIN cb),
    codes AS (
      SELECT vid, sp, cid AS code FROM (
        SELECT vid, sp, cid, row_number() OVER (PARTITION BY vid, sp ORDER BY d2, cid) AS rn
        FROM enc_d) WHERE rn = 1),
    lut AS (SELECT vid AS qid, sp, cid, d2 FROM enc_d WHERE vid % 100 = 0),
    adc AS (
      SELECT l.qid, c.vid,
             sum(CASE WHEN c.sp = 0 THEN l.d2 END) + sum(CASE WHEN c.sp = 1 THEN l.d2 END) +
             sum(CASE WHEN c.sp = 2 THEN l.d2 END) + sum(CASE WHEN c.sp = 3 THEN l.d2 END) AS adc
      FROM codes c JOIN lut l ON c.sp = l.sp AND c.code = l.cid
      WHERE c.vid != l.qid
      GROUP BY l.qid, c.vid),
    ranked AS (
      SELECT qid, vid, adc,
             row_number() OVER (PARTITION BY qid ORDER BY round(adc, 6), vid) AS rk
      FROM adc)
    SELECT qid, CAST(rk AS BIGINT) AS rk, vid AS vec_id, round(adc, 6) AS adc
    FROM ranked WHERE rk <= 5 ORDER BY qid, rk"""

  /** Embedding outlier detection (q169) — the mislabel/out-of-
    * distribution audit: distance of every vector to its OWN label's
    * centroid, z-scored within the label, flag z ≥ 2. Determinism: the
    * centroid is 6dp-rounded (the q61 pinning), the distance is a
    * sequential IEEE fold, the per-label mean/stddev are 9dp-rounded
    * before the z (group-agg float-order guard), the flag compares the
    * 6dp-rounded z. Physical shape at 100 TB: ONE (label, pos) hash agg
    * for centroids (k×dim rows, broadcast back), one map-side distance
    * pass, ONE label-keyed stats agg (k rows, broadcast back) — no
    * sort, no pair join, nothing driver-side. */
  private[queries] lazy val embOutlierSql = """
    WITH emb AS (SELECT vec_id, label, transform(embedding, x -> cast(x AS double)) AS e
                 FROM embeddings),
    cent_rows AS (
      SELECT label AS cl, pos, round(avg(cast(v AS double)), 6) AS m
      FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
      GROUP BY label, pos),
    cents AS (SELECT cl, transform(sort_array(collect_list(struct(pos, m))), s -> s.m) AS cvec
              FROM cent_rows GROUP BY cl),
    dist AS (
      SELECT e.vec_id, e.label,
             sqrt(l2sq_d(e.e, c.cvec)) AS d
      FROM emb e JOIN cents c ON e.label = c.cl),
    stats AS (SELECT label, round(avg(d), 9) AS mu, round(stddev_samp(d), 9) AS sd
              FROM dist GROUP BY label),
    z AS (SELECT vec_id, dist.label, round((d - mu) / sd, 6) AS z
          FROM dist JOIN stats ON dist.label = stats.label)
    SELECT vec_id, label, z FROM z WHERE z >= 2.0
    ORDER BY label, z DESC, vec_id"""

  private[queries] lazy val embOutlierOracle = """
    WITH emb AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e
                 FROM embeddings),
    cent_rows AS (
      SELECT label AS cl, i AS pos, round(avg(embedding[i+1]::DOUBLE), 6) AS m
      FROM embeddings, unnest(range(len(embedding))) AS t(i)
      GROUP BY label, i),
    cents AS (SELECT cl, list(m ORDER BY pos) AS cvec FROM cent_rows GROUP BY cl),
    dist AS (
      SELECT e.vec_id, e.label,
             sqrt(list_reduce(list_prepend(0.0,
                  list_transform(range(len(e.e)), i ->
                    (e.e[i+1] - c.cvec[i+1]) * (e.e[i+1] - c.cvec[i+1]))),
                  (s, x) -> s + x)) AS d
      FROM emb e JOIN cents c ON e.label = c.cl),
    stats AS (SELECT label, round(avg(d), 9) AS mu, round(stddev_samp(d), 9) AS sd
              FROM dist GROUP BY label),
    z AS (SELECT vec_id, dist.label AS label, round((d - mu) / sd, 6) AS z
          FROM dist JOIN stats ON dist.label = stats.label)
    SELECT vec_id, label, z FROM z WHERE z >= 2.0
    ORDER BY label, z DESC, vec_id"""

  /** Int8-quantized ANN (q76): symmetric per-vector int8 quantization
    * (scale = max|x|/127, q_i = floor(x_i·127/max + 0.5) — exact integer
    * outputs, so Spark and DuckDB agree bit-wise), candidate generation
    * on the QUANTIZED dot product, exact cosine re-rank on the top-10
    * candidates only. At 100 TB this is the memory-bandwidth lever:
    * int8 vectors scan 4× less data than float32, the candidate pass is
    * integer arithmetic, and full-precision vectors are touched only for
    * the short re-rank list. Determinism: quantized dots are exact
    * integers in doubles (≤64·127² ≪ 2⁵³); the tie-break is (score desc,
    * vec_id), and the scale product is written `dot * (sa * sb)` with
    * fixed parenthesization so both engines round identically. */
  private[queries] lazy val quantizedAnnSql = """
    WITH v AS (
      SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    mx AS (
      SELECT vec_id, e,
             greatest(aggregate(e, cast(0.0 AS double), (s, x) -> greatest(s, abs(x))), cast(1e-30 AS double)) AS m
      FROM v),
    qv AS (
      SELECT vec_id, e, m / 127.0D AS scale,
             transform(e, x -> cast(floor(x * 127.0D / m + 0.5D) AS tinyint)) AS q
      FROM mx),
    qq AS (SELECT vec_id AS qid, e AS qe, scale AS qscale, q AS qq FROM qv WHERE vec_id % 100 = 0),
    sims AS (
      SELECT /*+ BROADCAST(qq) */ qq.qid, d.vec_id,
             dot_d(transform(qq.qq, x -> cast(x AS double)),
                   transform(d.q, x -> cast(x AS double))) * (qq.qscale * d.scale) AS qsim,
             qq.qe AS qe, d.e AS de
      FROM qv d JOIN qq ON d.vec_id <> qq.qid),
    cand AS (
      SELECT qid, vec_id, qe, de FROM (
        SELECT qid, vec_id, qe, de,
               row_number() OVER (PARTITION BY qid ORDER BY qsim DESC, vec_id) AS crk
        FROM sims) WHERE crk <= 10),
    exact AS (
      SELECT qid, vec_id,
             dot_d(qe, de) / (sqrt(dot_d(qe, qe)) * sqrt(dot_d(de, de))) AS sim
      FROM cand),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM exact)
    SELECT qid, vec_id, round(sim, 6) AS sim, rank
    FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""

  private[queries] lazy val quantizedAnnOracle = """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    mx AS (
      SELECT vec_id, e,
             greatest(list_reduce(list_transform(e, x -> abs(x)), (s, x) -> greatest(s, x)), 1e-30) AS m
      FROM v),
    qv AS (
      SELECT vec_id, e, m / 127.0 AS scale,
             list_transform(e, x -> floor(x * 127.0 / m + 0.5)::TINYINT) AS q
      FROM mx),
    qq AS (SELECT vec_id AS qid, e AS qe, scale AS qscale, q AS qq FROM qv WHERE vec_id % 100 = 0),
    sims AS (
      SELECT qq.qid, d.vec_id,
             list_reduce(list_transform(range(len(d.q)),
                 i -> qq.qq[i+1]::DOUBLE * d.q[i+1]::DOUBLE), (s, x) -> s + x)
               * (qq.qscale * d.scale) AS qsim,
             qq.qe AS qe, d.e AS de
      FROM qv d JOIN qq ON d.vec_id <> qq.qid),
    cand AS (
      SELECT qid, vec_id, qe, de FROM (
        SELECT qid, vec_id, qe, de,
               row_number() OVER (PARTITION BY qid ORDER BY qsim DESC, vec_id) AS crk
        FROM sims) WHERE crk <= 10),
    exact AS (
      SELECT qid, vec_id,
             list_reduce(list_transform(range(len(de)), i -> qe[i+1] * de[i+1]), (s, x) -> s + x)
               / (sqrt(list_reduce(list_transform(qe, x -> x * x), (s, x) -> s + x))
                  * sqrt(list_reduce(list_transform(de, x -> x * x), (s, x) -> s + x))) AS sim
      FROM cand),
    ranked AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM exact)
    SELECT qid, vec_id, round(sim, 6) AS sim, rank
    FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""

  // ------------------------------------------------- ANN recall audit

  /** q85 — ANN recall audit: recall@10 of the IVF candidate search
    * (label codebook, nprobe=2 — the q62 index shape) against exact
    * brute-force ground truth, per sampled query vector. This is the
    * eval harness every production ANN deployment runs: ground truth is
    * computed only for a SAMPLE of queries (vec_id % 100 here), so the
    * exact pass costs |sample|×N, not N² — the standard way recall is
    * audited at 100 TB. Join on (qid, neighbor id) only — set overlap,
    * no float comparisons cross-engine. */
  private[queries] lazy val annRecallSql = """
    WITH v AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    vn AS (SELECT vec_id, e, sqrt(dot_d(e, e)) AS nrm FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT /*+ BROADCAST(q) */ q.qid, vn.vec_id,
             dot_d(qe, e) / (qnrm * nrm) AS sim,
             spark_partition_id() AS pid
      FROM q JOIN vn ON vn.vec_id <> q.qid),
    local_top AS (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid, pid ORDER BY sim DESC, vec_id) AS lrn
      FROM sims),
    bf AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM local_top WHERE lrn <= 10) WHERE rank <= 10),
    cent_rows AS (
      SELECT label AS c_label, pos, round(avg(cast(v AS double)), 6) AS mean_v
      FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
      GROUP BY label, pos),
    cents AS (
      SELECT c_label,
             transform(sort_array(collect_list(struct(pos, mean_v))), s -> s.mean_v) AS cvec
      FROM cent_rows GROUP BY c_label),
    cdist AS (
      SELECT /*+ BROADCAST(c) */ vn.vec_id, vn.e, vn.nrm, c.c_label,
             l2sq_d(vn.e, c.cvec) AS d2
      FROM vn CROSS JOIN cents c),
    cells AS (
      SELECT vec_id, w.e AS e, w.nrm AS nrm, w.cell AS cell FROM (
        SELECT vec_id,
               min_by(named_struct('e', e, 'nrm', nrm, 'cell', c_label),
                      named_struct('d', d2, 'c', c_label)) AS w
        FROM cdist GROUP BY vec_id)),
    qprobe AS (
      SELECT vec_id AS qid, c_label AS cell FROM (
        SELECT vec_id, c_label,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
        FROM cdist WHERE vec_id % 100 = 0) WHERE rk <= 2),
    isims AS (
      SELECT qp.qid, c.vec_id, dot_d(q.qe, c.e) / (q.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN q ON q.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ivf AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM isims) WHERE rank <= 10)
    SELECT b.qid, CAST(count(i.vec_id) AS DOUBLE) / 10.0 AS recall_at_10
    FROM bf b LEFT JOIN ivf i ON b.qid = i.qid AND b.vec_id = i.vec_id
    GROUP BY b.qid ORDER BY b.qid"""

  private[queries] lazy val annRecallOracle = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    vn AS (SELECT vec_id, e,
                  sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT q.qid, vn.vec_id,
             list_reduce(list_transform(range(64), i -> qe[i+1] * e[i+1]), (s, x) -> s + x) / (qnrm * nrm) AS sim
      FROM q CROSS JOIN vn WHERE vn.vec_id <> q.qid),
    bf AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM sims) WHERE rank <= 10),
    cent_rows AS (
      SELECT label AS c_label, i AS pos, round(avg(embedding[i+1]::DOUBLE), 6) AS mean_v
      FROM embeddings, unnest(range(len(embedding))) AS t(i)
      GROUP BY label, i),
    cents AS (
      SELECT c_label, list(mean_v ORDER BY pos) AS cvec
      FROM cent_rows GROUP BY c_label),
    cdist AS (
      SELECT vn.vec_id, vn.e, vn.nrm, c.c_label,
             list_reduce(list_transform(range(len(c.cvec)),
                 i -> (vn.e[i+1] - c.cvec[i+1]) * (vn.e[i+1] - c.cvec[i+1])),
               (s, x) -> s + x) AS d2
      FROM vn CROSS JOIN cents c),
    cells AS (
      SELECT vec_id, e, nrm, c_label AS cell FROM (
        SELECT vec_id, e, nrm, c_label,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
        FROM cdist) WHERE rk = 1),
    qprobe AS (
      SELECT vec_id AS qid, c_label AS cell FROM (
        SELECT vec_id, c_label,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
        FROM cdist WHERE vec_id % 100 = 0)
      WHERE rk <= 2),
    isims AS (
      SELECT qp.qid, c.vec_id,
             list_reduce(list_transform(range(len(c.e)), i -> q.qe[i+1] * c.e[i+1]),
               (s, x) -> s + x) / (q.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN q ON q.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ivf AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM isims) WHERE rank <= 10)
    SELECT b.qid, count(i.vec_id)::DOUBLE / 10.0 AS recall_at_10
    FROM bf b LEFT JOIN ivf i ON b.qid = i.qid AND b.vec_id = i.vec_id
    GROUP BY b.qid ORDER BY b.qid"""

  /** q198 — ANN ranking-quality metrics (MRR + binary NDCG@10 + hit
    * count) of the q85 IVF candidate search against the brute-force
    * ground truth: the other half of the eval harness every production
    * ANN deployment runs (q85 answers "how much of the truth did we
    * find", this answers "how well ORDERED is what we found").
    * Relevance is binary membership in the truth top-10; IDCG is the
    * |truth| = 10 constant, computed — not hardcoded — in both engines.
    * Same candidate machinery and scale shape as q85 (sampled queries
    * only for the exact pass; probed cells only for the IVF pass). */
  private[queries] lazy val rankMetricsSql = """
    WITH v AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    vn AS (SELECT vec_id, e, sqrt(dot_d(e, e)) AS nrm FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT /*+ BROADCAST(q) */ q.qid, vn.vec_id,
             dot_d(qe, e) / (qnrm * nrm) AS sim
      FROM q JOIN vn ON vn.vec_id <> q.qid),
    bf AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM sims) WHERE rank <= 10),
    cent_rows AS (
      SELECT label AS c_label, pos, round(avg(cast(v AS double)), 6) AS mean_v
      FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
      GROUP BY label, pos),
    cents AS (
      SELECT c_label,
             transform(sort_array(collect_list(struct(pos, mean_v))), s -> s.mean_v) AS cvec
      FROM cent_rows GROUP BY c_label),
    cdist AS (
      SELECT /*+ BROADCAST(c) */ vn.vec_id, vn.e, vn.nrm, c.c_label,
             l2sq_d(vn.e, c.cvec) AS d2
      FROM vn CROSS JOIN cents c),
    cells AS (
      SELECT vec_id, w.e AS e, w.nrm AS nrm, w.cell AS cell FROM (
        SELECT vec_id,
               min_by(named_struct('e', e, 'nrm', nrm, 'cell', c_label),
                      named_struct('d', d2, 'c', c_label)) AS w
        FROM cdist GROUP BY vec_id)),
    qprobe AS (
      SELECT vec_id AS qid, c_label AS cell FROM (
        SELECT vec_id, c_label,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
        FROM cdist WHERE vec_id % 100 = 0) WHERE rk <= 2),
    isims AS (
      SELECT qp.qid, c.vec_id, dot_d(q.qe, c.e) / (q.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN q ON q.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ivf AS (
      SELECT qid, vec_id, rank FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM isims) WHERE rank <= 10),
    matched AS (
      SELECT i.qid, i.rank FROM ivf i JOIN bf b ON b.qid = i.qid AND b.vec_id = i.vec_id),
    idcg AS (SELECT sum(cast(1 AS double) / log2(r + 1)) AS v
             FROM (SELECT explode(sequence(1, 10)) AS r))
    SELECT q.qid,
           coalesce(round(cast(1 AS double) / min(m.rank), 6), cast(0 AS double)) AS mrr,
           round(coalesce(sum(cast(1 AS double) / log2(m.rank + 1)), cast(0 AS double))
             / (SELECT v FROM idcg), 6) AS ndcg,
           CAST(count(m.rank) AS BIGINT) AS hits
    FROM (SELECT DISTINCT qid FROM bf) q LEFT JOIN matched m ON m.qid = q.qid
    GROUP BY q.qid ORDER BY q.qid"""

  private[queries] lazy val rankMetricsOracle = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    vn AS (SELECT vec_id, e,
                  sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 100 = 0),
    sims AS (
      SELECT q.qid, vn.vec_id,
             list_reduce(list_transform(range(64), i -> qe[i+1] * e[i+1]), (s, x) -> s + x) / (qnrm * nrm) AS sim
      FROM q CROSS JOIN vn WHERE vn.vec_id <> q.qid),
    bf AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM sims) WHERE rank <= 10),
    cent_rows AS (
      SELECT label AS c_label, i AS pos, round(avg(embedding[i+1]::DOUBLE), 6) AS mean_v
      FROM embeddings, unnest(range(len(embedding))) AS t(i)
      GROUP BY label, i),
    cents AS (
      SELECT c_label, list(mean_v ORDER BY pos) AS cvec
      FROM cent_rows GROUP BY c_label),
    cdist AS (
      SELECT vn.vec_id, vn.e, vn.nrm, c.c_label,
             list_reduce(list_transform(range(len(c.cvec)),
                 i -> (vn.e[i+1] - c.cvec[i+1]) * (vn.e[i+1] - c.cvec[i+1])),
               (s, x) -> s + x) AS d2
      FROM vn CROSS JOIN cents c),
    cells AS (
      SELECT vec_id, e, nrm, c_label AS cell FROM (
        SELECT vec_id, e, nrm, c_label,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
        FROM cdist) WHERE rk = 1),
    qprobe AS (
      SELECT vec_id AS qid, c_label AS cell FROM (
        SELECT vec_id, c_label,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
        FROM cdist WHERE vec_id % 100 = 0)
      WHERE rk <= 2),
    isims AS (
      SELECT qp.qid, c.vec_id,
             list_reduce(list_transform(range(len(c.e)), i -> q.qe[i+1] * c.e[i+1]),
               (s, x) -> s + x) / (q.qnrm * c.nrm) AS sim
      FROM qprobe qp JOIN cells c ON c.cell = qp.cell JOIN q ON q.qid = qp.qid
      WHERE c.vec_id <> qp.qid),
    ivf AS (
      SELECT qid, vec_id, rank FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        FROM isims) WHERE rank <= 10),
    matched AS (
      SELECT i.qid, i.rank FROM ivf i JOIN bf b ON b.qid = i.qid AND b.vec_id = i.vec_id),
    idcg AS (SELECT sum(1.0 / log2(r + 1)) AS v FROM (SELECT unnest(range(1, 11)) AS r))
    SELECT q.qid,
           coalesce(round(1.0 / min(m.rank), 6), 0.0) AS mrr,
           round(coalesce(sum(1.0 / log2(m.rank + 1)), 0.0) / (SELECT v FROM idcg), 6) AS ndcg,
           CAST(count(m.rank) AS BIGINT) AS hits
    FROM (SELECT DISTINCT qid FROM bf) q LEFT JOIN matched m ON m.qid = q.qid
    GROUP BY q.qid ORDER BY q.qid"""

  // --------------------------------------------- Matryoshka-prefix ANN

  /** q90 — two-pass ANN over nested ("Matryoshka") embedding prefixes:
    * a coarse pass scores only the FIRST 16 of 64 dimensions (4× less
    * data through the hot loop — with MRL-trained embeddings the prefix
    * is itself a valid low-dim embedding), keeps top-50 candidates per
    * query, then re-ranks exactly on all 64 dims. Same scale story as
    * the int8 pass (q76) on the orthogonal axis: q76 shrinks precision,
    * this shrinks dimensionality; production stacks compose both. The
    * query set is broadcast; the coarse pass is the only corpus-wide
    * scan, and full-precision vectors are touched only for the ≤50-row
    * candidate short list per query. */
  private[queries] lazy val matryoshkaAnnSql = """
    WITH v AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e FROM embeddings),
    vc AS (
      SELECT vec_id, e, sqrt(dot_d(e, e)) AS nrm,
             slice(e, 1, 16) AS e16
      FROM v),
    vn AS (SELECT vec_id, e, nrm, e16, sqrt(dot_d(e16, e16)) AS nrm16 FROM vc),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm, e16 AS q16, nrm16 AS qnrm16
          FROM vn WHERE vec_id % 100 = 0),
    coarse AS (
      SELECT /*+ BROADCAST(q) */ q.qid, vn.vec_id, vn.e, vn.nrm, q.qe, q.qnrm,
             dot_d(q.q16, vn.e16) / (q.qnrm16 * vn.nrm16) AS csim
      FROM q JOIN vn ON vn.vec_id <> q.qid),
    cand AS (
      SELECT qid, vec_id, e, nrm, qe, qnrm FROM (
        SELECT qid, vec_id, e, nrm, qe, qnrm,
               row_number() OVER (PARTITION BY qid ORDER BY csim DESC, vec_id) AS crk
        FROM coarse) WHERE crk <= 50),
    exact AS (
      SELECT qid, vec_id, dot_d(qe, e) / (qnrm * nrm) AS sim FROM cand)
    SELECT qid, vec_id, round(sim, 6) AS sim, rank FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM exact) WHERE rank <= 15 ORDER BY qid, rank"""

  private[queries] lazy val matryoshkaAnnOracle = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    vn AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm,
             e[1:16] AS e16,
             sqrt(list_reduce(list_transform(e[1:16], x -> x * x), (s, x) -> s + x)) AS nrm16
      FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm, e16 AS q16, nrm16 AS qnrm16
          FROM vn WHERE vec_id % 100 = 0),
    coarse AS (
      SELECT q.qid, vn.vec_id, vn.e, vn.nrm, q.qe, q.qnrm,
             list_reduce(list_transform(range(16), i -> q.q16[i+1] * vn.e16[i+1]), (s, x) -> s + x)
               / (q.qnrm16 * vn.nrm16) AS csim
      FROM q CROSS JOIN vn WHERE vn.vec_id <> q.qid),
    cand AS (
      SELECT qid, vec_id, e, nrm, qe, qnrm FROM (
        SELECT qid, vec_id, e, nrm, qe, qnrm,
               row_number() OVER (PARTITION BY qid ORDER BY csim DESC, vec_id) AS crk
        FROM coarse) WHERE crk <= 50),
    exact AS (
      SELECT qid, vec_id,
             list_reduce(list_transform(range(64), i -> qe[i+1] * e[i+1]), (s, x) -> s + x)
               / (qnrm * nrm) AS sim
      FROM cand)
    SELECT qid, vec_id, round(sim, 6) AS sim, rank FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM exact) WHERE rank <= 15 ORDER BY qid, rank"""
}
