package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text quality + corpus-statistics family: token stats, quality
  * scores and rule filters, lang-ID, fingerprinting, contamination,
  * PII, drift, BM25, chunking, packing, splits, HTML extraction, URL
  * canonicalization, pipeline funnel capstone.
  *
  * Pure code motion from the original single-file LlmQueries (round-14
  * maintainability split); wiring + oracle maps stay in [[LlmQueries]].
  */
private[queries] trait LlmTextQueries extends LlmShared {

  // ------------------------------------------------------ text analysis

  /** Whitespace token stats + BPE-ish subtoken count — per-document
    * map-only work (scales embarrassingly). */
  private[queries] lazy val tokenStatsSql = """
    WITH toks AS (SELECT doc_id, text, split(lower(text), '\\s+') AS t FROM documents)
    SELECT doc_id, size(t) AS n_tokens, size(array_distinct(t)) AS n_distinct,
           cast(size(array_distinct(t)) AS double) / size(t) AS ttr,
           aggregate(t, 0, (s, x) -> s + length(x)) AS total_token_chars,
           cast(aggregate(t, 0, (s, x) -> s + length(x)) AS double) / size(t) AS avg_token_len,
           size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS n_subtokens
    FROM toks ORDER BY doc_id"""

  private[queries] lazy val tokenStatsOracle = """
    WITH toks AS (SELECT doc_id, text, regexp_split_to_array(lower(text), '\s+') AS t FROM documents)
    SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
           len(list_distinct(t))::DOUBLE / len(t) AS ttr,
           list_reduce(list_transform(t, x -> len(x)), (s, x) -> s + x) AS total_token_chars,
           list_reduce(list_transform(t, x -> len(x)), (s, x) -> s + x)::DOUBLE / len(t) AS avg_token_len,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_subtokens
    FROM toks ORDER BY doc_id"""

  private[queries] lazy val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Heuristic quality score: stopword ratio + alpha ratio + type-token
    * ratio + length saturation, combined with fixed weights. Map-only. */
  private[queries] lazy val qualitySql = s"""
    WITH toks AS (SELECT doc_id, text, n_chars, split(lower(text), '\\\\s+') AS t FROM documents)
    SELECT doc_id, n_chars, size(t) AS n_tokens,
           cast(size(filter(t, x -> array_contains(array(${StopEn.map("'" + _ + "'").mkString(",")}), x))) AS double) / size(t) AS stopword_ratio,
           cast(length(regexp_replace(lower(text), '[^a-z ]', '')) AS double) / length(text) AS alpha_ratio,
           0.4 * least(cast(1.0 AS double), size(t) / cast(100 AS double))
             + 0.3 * (cast(size(filter(t, x -> array_contains(array(${StopEn.map("'" + _ + "'").mkString(",")}), x))) AS double) / size(t))
             + 0.3 * (cast(size(array_distinct(t)) AS double) / size(t)) AS quality
    FROM toks ORDER BY doc_id"""

  private[queries] lazy val qualityOracle = s"""
    WITH toks AS (SELECT doc_id, text, n_chars, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents)
    SELECT doc_id, n_chars, len(t) AS n_tokens,
           len(list_filter(t, x -> list_contains([${StopEn.map("'" + _ + "'").mkString(",")}], x)))::DOUBLE / len(t) AS stopword_ratio,
           len(regexp_replace(lower(text), '[^a-z ]', '', 'g'))::DOUBLE / len(text) AS alpha_ratio,
           0.4 * least(1.0, len(t) / 100.0)
             + 0.3 * (len(list_filter(t, x -> list_contains([${StopEn.map("'" + _ + "'").mkString(",")}], x)))::DOUBLE / len(t))
             + 0.3 * (len(list_distinct(t))::DOUBLE / len(t)) AS quality
    FROM toks ORDER BY doc_id"""

  private[queries] lazy val Lex: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "des", "un", "une", "est", "dans"))

  private[queries] def lexArr(l: String, spark: Boolean): String = {
    val items = Lex(l).map("'" + _ + "'").mkString(",")
    if (spark) s"array($items)" else s"[$items]"
  }

  /** N-gram/stopword language-ID heuristic with a deterministic argmax
    * tie-break (en > es > de > fr > unknown). Map-only; the `lang` column
    * is ground truth for an accuracy readout downstream. */
  private[queries] def langidSql(spark: Boolean): String = {
    def score(l: String) =
      if (spark) s"size(filter(t, x -> array_contains(${lexArr(l, spark = true)}, x)))"
      else s"len(list_filter(t, x -> list_contains(${lexArr(l, spark = false)}, x)))"
    val split = if (spark) "split(lower(text), '\\\\s+')" else "regexp_split_to_array(lower(text), '\\s+')"
    s"""
    WITH toks AS (SELECT doc_id, lang, $split AS t FROM documents),
    scores AS (
      SELECT doc_id, lang, ${score("en")} AS s_en, ${score("es")} AS s_es,
             ${score("de")} AS s_de, ${score("fr")} AS s_fr
      FROM toks)
    SELECT doc_id, lang, s_en, s_es, s_de, s_fr,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
                WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
                WHEN s_fr > 0 THEN 'fr'
                ELSE 'unknown' END AS predicted_lang
    FROM scores ORDER BY doc_id"""
  }

  /** Winnowing-style fingerprint: md5 over char 8-grams, lexicographic
    * min per 4-gram window, distinct mins = the document's fingerprint
    * set. Physical shape: entirely MAP-SIDE — the gram array, sliding
    * window minima, distinct set, and summary stats are all array
    * expressions evaluated per row, so there is no explode, no shuffle,
    * and no per-position row blowup (the previous explode+window variant
    * shuffled length(text) rows per document and was 50× slower).
    * Per-row memory is O(length(text)) — bounded by the document, so the
    * shape scales embarrassingly with corpus size. */
  private[queries] lazy val fingerprintSql = """
    WITH w AS (
      -- winnow_fps (native Expression): md5 char-8-grams + monotonic-deque
      -- sliding-window minima + distinct, one O(n) loop per document in
      -- whole-stage codegen — replaces two interpreted HOF transforms that
      -- were 50x slower. length(text) >= 11 ≡ the old size(grams) >= 4.
      SELECT doc_id, winnow_fps(text, 8, 4) AS fps
      FROM documents WHERE length(text) >= 11)
    SELECT doc_id, cast(size(fps) AS bigint) AS n_fingerprints,
           array_min(fps) AS min_fp, array_max(fps) AS max_fp
    FROM w ORDER BY doc_id"""

  private[queries] lazy val fingerprintOracle = """
    WITH g AS (
      SELECT doc_id, list_transform(range(len(text)-7), i -> md5(substr(text, i+1, 8))) AS grams
      FROM documents WHERE len(text) >= 8),
    w AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(grams)-3), wi -> list_min(grams[wi+1:wi+4]))) AS fps
      FROM g WHERE len(grams) >= 4)
    SELECT doc_id, len(fps) AS n_fingerprints, list_min(fps) AS min_fp, list_max(fps) AS max_fp
    FROM w ORDER BY doc_id"""

  /** Train/test CONTAMINATION check — the decontamination primitive of a
    * training pipeline: which corpus documents share winnowing
    * fingerprints with a benchmark set (here: doc_id % 97 = 0 plays the
    * held-out benchmark). Physical shape at 100 TB: fingerprints are
    * map-side (native winnow_fps), the fingerprint-frequency cap (df <=
    * [[ContamFpCap]]) removes boilerplate n-grams BEFORE the join — the
    * same stop-phrase guard as q24's inverted index, and standard
    * decontamination practice (ubiquitous fingerprints carry no overlap
    * signal, only skew) — then the corpus×bench equi-join runs on capped
    * posting lists, never all-pairs. The >= 2 shared-fps floor drops
    * single-gram coincidences. Cap and floor are mirrored in the oracle. */
  private[queries] lazy val ContamFpCap = 200
  private[queries] lazy val contaminationSql = s"""
    WITH fps AS (
      SELECT doc_id, explode(winnow_fps(text, 8, 4)) AS fp
      FROM documents_rp WHERE length(text) >= 11),
    -- (doc_id, fp) is unique after winnowing's in-row distinct, so the
    -- frequency cap is a count-over-window: ONE pass over fps and one fp
    -- shuffle, instead of a groupBy + self-join that would compute the
    -- winnow explode twice (same trick as q22's band-size cap)
    kept AS (SELECT doc_id, fp FROM (
               SELECT doc_id, fp, count(1) OVER (PARTITION BY fp) AS fdf FROM fps)
             WHERE fdf <= $ContamFpCap),
    bench AS (SELECT doc_id AS bench_id, fp FROM kept WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, fp FROM kept WHERE doc_id % 97 != 0)
    SELECT c.doc_id, count(DISTINCT c.fp) AS shared_fps,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.fp = b.fp
    GROUP BY c.doc_id
    HAVING count(DISTINCT c.fp) >= 2
    ORDER BY doc_id"""

  private[queries] lazy val contaminationOracle = s"""
    WITH g AS (
      SELECT doc_id, list_transform(range(len(text)-7), i -> md5(substr(text, i+1, 8))) AS grams
      FROM documents WHERE len(text) >= 8),
    w AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(grams)-3), wi -> list_min(grams[wi+1:wi+4]))) AS fpl
      FROM g WHERE len(grams) >= 4),
    fps AS (SELECT doc_id, unnest(fpl) AS fp FROM w),
    freq AS (SELECT fp, count(DISTINCT doc_id) AS fdf FROM fps GROUP BY fp),
    kept AS (SELECT fps.doc_id, fps.fp FROM fps JOIN freq ON fps.fp = freq.fp
             WHERE freq.fdf <= $ContamFpCap),
    bench AS (SELECT doc_id AS bench_id, fp FROM kept WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, fp FROM kept WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, count(DISTINCT c.fp) AS shared_fps,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.fp = b.fp
    GROUP BY c.doc_id
    HAVING count(DISTINCT c.fp) >= 2
    ORDER BY doc_id"""

  /** Vocabulary statistics — the tokenizer/BPE-prep primitive: term
    * frequency and document frequency per token, top-100 by tf. Physical
    * shape at 100 TB: explode + partial/final hash aggregate (map-side
    * combine absorbs the Zipf head — 'the' pre-aggregates to one row per
    * map task, so token skew never reaches the shuffle), df via
    * array_distinct BEFORE exploding (dedup inside the row, not a
    * count(DISTINCT) shuffle), then top-k. */
  private[queries] lazy val vocabSql = """
    WITH tf AS (
      SELECT tok, count(1) AS term_freq
      FROM (SELECT explode(split(lower(text), '\\s+')) AS tok FROM documents)
      GROUP BY tok),
    df AS (
      SELECT tok, count(1) AS doc_freq
      FROM (SELECT doc_id, explode(array_distinct(split(lower(text), '\\s+'))) AS tok
            FROM documents)
      GROUP BY tok)
    SELECT tf.tok, term_freq, doc_freq
    FROM tf JOIN df ON tf.tok = df.tok
    ORDER BY term_freq DESC, tf.tok
    LIMIT 100"""

  private[queries] lazy val vocabOracle = """
    WITH tf AS (
      SELECT tok, count(1) AS term_freq
      FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok FROM documents)
      GROUP BY tok),
    df AS (
      SELECT tok, count(1) AS doc_freq
      FROM (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS tok
            FROM documents)
      GROUP BY tok)
    SELECT tf.tok, term_freq, doc_freq
    FROM tf JOIN df ON tf.tok = df.tok
    ORDER BY term_freq DESC, tf.tok
    LIMIT 100"""

  /** Deterministic data-mixture sampling — the corpus-mixing primitive
    * of a training pipeline: each source gets a sampling rate (here
    * derived from the source digit: src3 → 40%), membership is decided
    * by a content-stable hash of the doc id (md5 → 32-bit bucket % 100),
    * and the query audits the realized mixture per source. Physical
    * shape at any scale: the sample predicate is a map-side expression —
    * a re-run, a different cluster, or an incremental ingest selects the
    * SAME documents (no rand(), no seed state to ship); the audit is one
    * partial/final aggregate over ~|sources| rows. */
  private[queries] lazy val mixtureSql = """
    WITH rated AS (
      SELECT doc_id, source,
             (cast(substr(source, 4, 1) AS int) + 1) * 10 AS rate_pct,
             cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 100 AS bucket
      FROM documents)
    SELECT source, rate_pct, count(1) AS n_docs,
           count(CASE WHEN bucket < rate_pct THEN 1 END) AS n_sampled
    FROM rated GROUP BY source, rate_pct ORDER BY source"""

  private[queries] lazy val mixtureOracle = """
    WITH rated AS (
      SELECT doc_id, source,
             (substr(source, 4, 1)::INT + 1) * 10 AS rate_pct,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
      FROM documents)
    SELECT source, rate_pct, count(1) AS n_docs,
           count(CASE WHEN bucket < rate_pct THEN 1 END) AS n_sampled
    FROM rated GROUP BY source, rate_pct ORDER BY source"""

  /** Repetition detection — the duplicate-3-gram-ratio quality filter
    * (the Gopher-rules corpus-filter signal: boilerplate and degenerate
    * generations repeat n-grams). Total 3-grams come from the token
    * count; distinct ones from the native word_shingle_count, which
    * interns tokens and counts packed id-tuples in one per-row loop —
    * no shingle-string arrays are ever materialized (VERDICT r5 item 2:
    * word_shingles built full distinct string arrays where only the
    * count is consumed). Map-only: zero shuffles except the
    * oracle-determinism sort. */
  private[queries] lazy val repetitionSql = """
    WITH s AS (
      SELECT doc_id, size(split(lower(text), '\\s+')) AS nt,
             word_shingle_count(text, 3) AS nsh3
      FROM documents)
    SELECT doc_id,
           cast(nt - 2 AS bigint) AS n_3grams,
           cast(nsh3 AS bigint) AS n_distinct_3grams,
           cast(1.0 AS double) - cast(nsh3 AS double) / cast(nt - 2 AS double) AS dup_ratio
    FROM s WHERE nt >= 3 ORDER BY doc_id"""

  private[queries] lazy val repetitionOracle = """
    WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
    s AS (
      SELECT doc_id, t,
             list_distinct(list_transform(range(len(t)-2),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS sh3
      FROM toks)
    SELECT doc_id,
           (len(t) - 2)::BIGINT AS n_3grams,
           len(sh3)::BIGINT AS n_distinct_3grams,
           1.0::DOUBLE - len(sh3)::DOUBLE / (len(t) - 2)::DOUBLE AS dup_ratio
    FROM s WHERE len(t) >= 3 ORDER BY doc_id"""

  /** Per-source length profile — the corpus-audit query run before/after
    * filtering: exact interpolated percentiles of document length per
    * source. percentile() is a single-pass typed aggregate (sorted
    * per-group buffers merge map-side), one partial/final agg over
    * |sources| groups. */
  private[queries] lazy val lengthProfileSql = """
    SELECT source,
           count(1) AS n_docs,
           round(percentile(n_chars, 0.5), 6) AS p50_chars,
           round(percentile(n_chars, 0.9), 6) AS p90_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents GROUP BY source ORDER BY source"""

  /** The 100 TB variant of q58: exact percentile() buffers every value
    * per group — fine for bounded metrics like n_chars, wrong for
    * unbounded ones (per-group memory is O(distinct values)).
    * approx_percentile is a t-digest-style mergeable sketch: O(accuracy)
    * memory per group regardless of cardinality, partials combine
    * map-side like any hash aggregate. Rank error ≤ 1/accuracy — at
    * 10000, the p50/p90 of any column land within 0.01% rank of exact.
    * Not oracle-gated (DuckDB's sketch differs); spec-compared to the
    * exact q58 within rank tolerance instead. */
  private[graft] def lengthProfileApprox(s: SparkSession, dir: String): DataFrame = {
    val s2 = docs(s, dir)
    s2.sql("""
      SELECT source,
             count(1) AS n_docs,
             cast(approx_percentile(n_chars, 0.5, 10000) AS double) AS p50_chars,
             cast(approx_percentile(n_chars, 0.9, 10000) AS double) AS p90_chars,
             min(n_chars) AS min_chars,
             max(n_chars) AS max_chars
      FROM documents GROUP BY source ORDER BY source""")
  }

  /** The exact q58, callable for the approx-vs-exact comparison spec. */
  private[graft] def lengthProfileExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).sql(lengthProfileSql)

  private[queries] lazy val lengthProfileOracle = """
    SELECT source,
           count(1) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
           round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents GROUP BY source ORDER BY source"""

  /** Document chunking (q68): fixed-size token windows (32 tokens,
    * stride 24 → 8-token overlap) — the context-window prep step of
    * every training/RAG pipeline. Physical shape at any scale: split in
    * the scan projection, one generator (explode of the stride sequence)
    * per document, chunk text sliced from the SAME in-memory token array
    * — map-only, zero shuffle except the oracle's ORDER BY; output rows
    * ≈ tokens/stride, never tokens². chunk_id = start/stride keeps ids
    * stable under any parallelism. */
  private[queries] lazy val chunkingSql = """
    WITH tok AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
    starts AS (
      SELECT doc_id, t, start
      FROM tok LATERAL VIEW explode(sequence(0, greatest(size(t) - 1, 0), 24)) AS start)
    SELECT doc_id, start div 24 AS chunk_id,
           array_join(slice(t, start + 1, 32), ' ') AS chunk_text,
           CAST(least(size(t) - start, 32) AS BIGINT) AS n_tokens
    FROM starts ORDER BY doc_id, chunk_id"""

  private[queries] lazy val chunkingOracle = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    starts AS (
      SELECT doc_id, t, s.s AS start
      FROM tok, unnest(range(0, greatest(len(t) - 1, 0) + 1, 24)) AS s(s))
    SELECT doc_id, start // 24 AS chunk_id,
           array_to_string(t[start + 1 : start + 32], ' ') AS chunk_text,
           least(len(t) - start, 32) AS n_tokens
    FROM starts ORDER BY doc_id, chunk_id"""

  /** Tf-idf keyword extraction (q155): top-3 terms per sampled document
    * by tf·idf with the smoothed idf ln((N+1)/(df+1))+1 (the
    * scikit-learn pinning — no zero idf, no div-by-zero). Ranking is by
    * the ROUNDED score (9 digits) then term — the ulp-drift-proof cut
    * from the DSIR playbook, since Spark and the oracle disagree in the
    * last ulp of ln(). Physical shape: the doc×term tf agg absorbs the
    * Zipf head map-side; df is vocab-sized; the score join is term-keyed
    * (broadcastable); the doc sample predicate lands BEFORE the join and
    * window, so the expensive top-3 ranking only touches sampled docs
    * while idf still sees the whole corpus. */
  private[queries] lazy val tfidfSql = """
    WITH tok AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
    tf AS (SELECT doc_id, x AS term, count(1) AS tf
           FROM tok LATERAL VIEW explode(t) AS x GROUP BY doc_id, x),
    dfreq AS (SELECT term, count(1) AS df FROM tf GROUP BY term),
    n AS (SELECT count(1) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
      WHERE tf.doc_id % 20 = 0),
    ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY round(score, 9) DESC, term) AS rk
      FROM scored)
    SELECT doc_id, rk, term, round(score, 6) AS score
    FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""

  private[queries] lazy val tfidfOracle = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tf AS (SELECT doc_id, u.term AS term, CAST(count(1) AS BIGINT) AS tf
           FROM tok, unnest(t) AS u(term) GROUP BY doc_id, u.term),
    dfreq AS (SELECT term, CAST(count(1) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(count(1) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
      WHERE tf.doc_id % 20 = 0),
    ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY round(score, 9) DESC, term) AS rk
      FROM scored)
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, round(score, 6) AS score
    FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""

  /** CCNet perplexity-bucket mixture audit (q161) — Wenzek et al.
    * 2020's head/middle/tail split: score every document by its
    * cross-entropy under a corpus unigram LM (add-one smoothing — the
    * in-corpus stand-in for CCNet's external KenLM), cut the corpus at
    * the exact cross-entropy terciles, report per-(source, bucket) doc
    * counts and mean score. Determinism: per-doc cross-entropy is
    * ROUNDED to 9dp before the tercile cut and bucket compare (the
    * group-avg float-order guard), thresholds are the same exact
    * interpolated percentile both engines pin. Physical shape at
    * 100 TB: the token explode feeds ONE vocab-sized hash agg
    * (Zipf head absorbs map-side) and ONE doc-keyed avg; the LM join is
    * vocab-keyed; the tercile thresholds are ONE aggregated row
    * broadcast back (the q51 corpus-stats trick) — no sort of the
    * corpus, no driver loop. */
  private[queries] lazy val ppxBucketSql = """
    WITH tok AS (SELECT doc_id, source, split(text, ' ') AS t FROM documents),
    words AS (SELECT doc_id, source, x AS w FROM tok LATERAL VIEW explode(t) AS x),
    vocab AS (SELECT w, count(1) AS c FROM words GROUP BY w),
    tot AS (SELECT sum(c) AS n, count(1) AS v FROM vocab),
    scored AS (
      SELECT doc_id, source,
             round(-avg(ln((c + 1.0) / (n + v))), 9) AS h
      FROM words JOIN vocab USING (w) CROSS JOIN tot
      GROUP BY doc_id, source),
    th AS (SELECT percentile(h, 1.0/3) AS t1, percentile(h, 2.0/3) AS t2 FROM scored),
    bucketed AS (
      SELECT source,
             CASE WHEN h <= t1 THEN 'head' WHEN h <= t2 THEN 'middle' ELSE 'tail' END AS bucket, h
      FROM scored CROSS JOIN th)
    SELECT source, bucket, count(1) AS n_docs, round(avg(h), 6) AS mean_h
    FROM bucketed GROUP BY source, bucket ORDER BY source, bucket"""

  private[queries] lazy val ppxBucketOracle = """
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    words AS (SELECT doc_id, source, u.w AS w FROM tok, unnest(t) AS u(w)),
    vocab AS (SELECT w, CAST(count(1) AS BIGINT) AS c FROM words GROUP BY w),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(1) AS BIGINT) AS v FROM vocab),
    scored AS (
      SELECT doc_id, source,
             round(-avg(ln((c + 1.0) / (n + v))), 9) AS h
      FROM words JOIN vocab USING (w) CROSS JOIN tot
      GROUP BY doc_id, source),
    th AS (SELECT quantile_cont(h, 1.0/3) AS t1, quantile_cont(h, 2.0/3) AS t2 FROM scored),
    bucketed AS (
      SELECT source,
             CASE WHEN h <= t1 THEN 'head' WHEN h <= t2 THEN 'middle' ELSE 'tail' END AS bucket, h
      FROM scored CROSS JOIN th)
    SELECT source, bucket, CAST(count(1) AS BIGINT) AS n_docs, round(avg(h), 6) AS mean_h
    FROM bucketed GROUP BY source, bucket ORDER BY source, bucket"""

  /** Stratified eval-set sampler (q168) — the held-out-set builder:
    * exactly k=3 documents per (lang, source) cell, chosen by
    * content-stable md5 order (re-runs, backfills and cluster-size
    * changes select IDENTICAL docs — the q55/q89 no-rand stance), with
    * the cell population alongside for coverage review. ONE window over
    * the (lang, source) key; the rank and the cell count share the same
    * shuffle. */
  private[queries] lazy val evalSamplerSql = """
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source ORDER BY md5(text), doc_id) AS rk,
             count(1) OVER (PARTITION BY lang, source) AS cell_n
      FROM documents)
    SELECT lang, source, rk, doc_id, cell_n
    FROM ranked WHERE rk <= 3 ORDER BY lang, source, rk"""

  private[queries] lazy val evalSamplerOracle = """
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source ORDER BY md5(text), doc_id) AS rk,
             count(1) OVER (PARTITION BY lang, source) AS cell_n
      FROM documents)
    SELECT lang, source, CAST(rk AS BIGINT) AS rk, doc_id, CAST(cell_n AS BIGINT) AS cell_n
    FROM ranked WHERE rk <= 3 ORDER BY lang, source, rk"""

  /** Corpus-derived stopword filtering (q69): the top-20
    * document-frequency terms become the stoplist, and every document
    * reports how much of it survives their removal — the
    * vocabulary-driven cousin of the q28 quality score. Physical shape:
    * the stoplist is ONE aggregated row (the q51 corpus-stats trick)
    * cross-joined back — a broadcast at any scale — and the per-document
    * filter is a single lambda over the token array in the projection,
    * map-side. The df aggregate absorbs the Zipf head map-side
    * (partial count-distinct on (token, doc_id)); ties at the cut break
    * on (ndocs DESC, token) so the stoplist is deterministic. */
  private[queries] lazy val stopwordSql = """
    WITH tok AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
    dfreq AS (SELECT x AS token, count(DISTINCT doc_id) AS ndocs
              FROM tok LATERAL VIEW explode(t) AS x GROUP BY x),
    stop AS (SELECT collect_list(token) AS sl FROM (
        SELECT token FROM dfreq ORDER BY ndocs DESC, token LIMIT 20) z)
    SELECT /*+ BROADCAST(stop) */ doc_id,
           CAST(size(t) AS BIGINT) AS n_tokens,
           CAST(size(filter(t, x -> NOT array_contains(sl, x))) AS BIGINT) AS n_kept,
           round(size(filter(t, x -> NOT array_contains(sl, x))) / cast(size(t) AS double), 6) AS kept_ratio
    FROM tok CROSS JOIN stop ORDER BY doc_id"""

  private[queries] lazy val stopwordOracle = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    dfreq AS (SELECT x AS token, count(DISTINCT doc_id) AS ndocs
              FROM tok, unnest(t) AS u(x) GROUP BY x),
    stop AS (SELECT list(token) AS sl FROM (
        SELECT token FROM dfreq ORDER BY ndocs DESC, token LIMIT 20) z)
    SELECT doc_id, len(t) AS n_tokens,
           len(list_filter(t, x -> NOT list_contains(sl, x))) AS n_kept,
           round(len(list_filter(t, x -> NOT list_contains(sl, x))) / len(t), 6) AS kept_ratio
    FROM tok CROSS JOIN stop ORDER BY doc_id"""

  /** Sequence packing (q78): assign documents to fixed-token-budget
    * packs (2048 tokens) by cumulative offset within each source stream —
    * the context-window packing step of training prep. Offset-based
    * packing (pack = floor(preceding-tokens / budget)) is deterministic
    * and one-pass; a pack may overflow by at most one document, which is
    * the standard trade for avoiding a sequential bin-packer. Scale
    * shape: ONE hash shuffle on source + an in-partition ordered window —
    * packing is inherently sequential per stream but embarrassingly
    * parallel across streams, which is exactly what the partitioning
    * expresses. */
  private[queries] lazy val packingSql = """
    WITH tok AS (
      SELECT doc_id, source, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    w AS (
      SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM tok)
    SELECT doc_id, source, n_tokens, off div 2048 AS pack_id,
           off - (off div 2048) * 2048 AS pack_offset
    FROM w ORDER BY doc_id"""

  private[queries] lazy val packingOracle = """
    WITH tok AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    w AS (
      SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM tok)
    SELECT doc_id, source, n_tokens, (off // 2048)::BIGINT AS pack_id,
           (off - (off // 2048) * 2048)::BIGINT AS pack_offset
    FROM w ORDER BY doc_id"""

  // ------------------------------------------ compression-ratio filter

  /** q91 — deflate-compression-ratio quality filter (the Gopher /
    * RefinedWeb repetitiveness signal): highly repetitive documents
    * compress far below ~0.4 while diverse text stays high. Map-only —
    * the deflate runs inside whole-stage codegen via the native
    * [[graft.functions.DeflateRatio]] expression with per-thread
    * Deflater reuse; exact byte semantics are spec-pinned against
    * java.util.zip directly.
    *
    * DuckDB ships no deflate scalar, so the gate rides CONSTRUCTED
    * compressibility invariants the oracle can state (the q203/q225
    * playbook): per document, repeating its 512-char prefix k times
    * multiplies the uncompressed length by k while deflate encodes the
    * repeats as a few match tokens (repeat distance ≤ 2 KiB, far
    * inside the 32 KiB window), so the ratio ORDER z16 ≪ z8 < z2 < z1
    * holds for every ≥256-char document; z16 sits under 0.2 (one copy
    * + headers over 16× the length) and trips the 0.35 repetitiveness
    * flag; the unrepeated ratio stays inside deflate's hard band
    * (zlib header+payload ≥ ~12 bytes over ≤512 chars ⇒ > 0.01;
    * stored-block worst case ⇒ ≤ 1.05). Every output column is a
    * boolean the oracle pins to TRUE — a wrong window size, a broken
    * Deflater reuse, or a swapped numerator all flip one of them. */
  private[queries] lazy val compressionSql = """
    WITH s AS (
      SELECT doc_id, substr(text, 1, 512) AS base
      FROM documents WHERE length(text) >= 256),
    r AS (
      SELECT doc_id,
             deflate_ratio(base) AS z1,
             deflate_ratio(repeat(base, 2)) AS z2,
             deflate_ratio(repeat(base, 8)) AS z8,
             deflate_ratio(repeat(base, 16)) AS z16
      FROM s)
    SELECT doc_id,
           (z16 < z8 AND z8 < z2 AND z2 < z1) AS ord_ok,
           (z16 < 0.2) AS band_repetitive,
           (z1 > 0.01 AND z1 <= 1.05) AS band_natural,
           (z16 < 0.35) AS flag_repetitive
    FROM r ORDER BY doc_id"""

  private[queries] lazy val compressionOracle = """
    SELECT doc_id, TRUE AS ord_ok, TRUE AS band_repetitive,
           TRUE AS band_natural, TRUE AS flag_repetitive
    FROM documents WHERE strlen(text) >= 256 ORDER BY doc_id"""

  // -------------------------------------------- stratified split audit

  /** q89 — deterministic stratified train/val/test split (90/5/5 by a
    * content-stable hash bucket, stratified per source): every training
    * pipeline's first materialization step. The split is a pure
    * projection of the row (md5 of the content), so re-runs, backfills,
    * and different cluster sizes all assign the SAME documents to the
    * same split — no rand()/seed state anywhere. Audit output: per
    * (source, split) counts + observed rate. Map-only + one hash agg. */
  private[queries] lazy val splitSql = """
    WITH b AS (
      SELECT doc_id, source,
             cast(conv(substr(md5(text), 1, 8), 16, 10) AS bigint) % 100 AS bucket
      FROM documents),
    a AS (
      SELECT doc_id, source,
             CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
      FROM b)
    SELECT source, split, count(1) AS n, min(doc_id) AS first_doc,
           round(count(1) / cast(sum(count(1)) OVER (PARTITION BY source) AS double), 6) AS rate
    FROM a GROUP BY source, split ORDER BY source, split"""

  private[queries] lazy val splitOracle = """
    WITH b AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket
      FROM documents),
    a AS (
      SELECT doc_id, source,
             CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
      FROM b)
    SELECT source, split, count(1)::BIGINT AS n, min(doc_id) AS first_doc,
           round(count(1) / sum(count(1)) OVER (PARTITION BY source), 6) AS rate
    FROM a GROUP BY source, split ORDER BY source, split"""

  /** q200 — the corpus-pipeline funnel: one query composing the
    * pinned pipeline stages end to end and reporting per-source
    * survival at each — the "training manifest" every corpus release
    * ships. Stages (each reusing an already-gated rule):
    *   raw → exact-dedup keepers (q21's min-doc_id-per-content-hash)
    *       → quality pass (≥ 5 words AND distinct-word fraction ≥ 0.2,
    *         the q28/q121 class)
    *       → decontaminated (no shared df-capped 3-gram with the
    *         q113 benchmark slice)
    *       → split train/val/test (q89's content-stable md5 bucket).
    * Everything is one pass over documents plus the bounded q113 gram
    * join — no stage materializes an intermediate corpus; the funnel
    * is a set of boolean columns aggregated per source. */
  private[queries] lazy val pipelineFunnelSql = """
    WITH base AS (
      SELECT doc_id, source, text, lower(text) AS lt, split(text, ' ') AS ws
      FROM documents),
    dedup AS (
      SELECT doc_id, source, text, lt, ws,
             (doc_id = min(doc_id) OVER (PARTITION BY md5(lt))) AS keep_dedup
      FROM base),
    quality AS (
      SELECT *,
             (size(ws) >= 5 AND
              size(array_distinct(ws)) * 5 >= size(ws)) AS keep_quality
      FROM dedup),
    g AS (
      SELECT doc_id, array_distinct(transform(sequence(0, size(ws) - 3),
               i -> md5(concat_ws(' ', slice(ws, i + 1, 3))))) AS gl
      FROM base WHERE size(ws) >= 3),
    fps AS (SELECT doc_id, explode(gl) AS fp FROM g),
    kept AS (SELECT doc_id, fp FROM (
               SELECT doc_id, fp, count(1) OVER (PARTITION BY fp) AS df FROM fps)
             WHERE df <= 50),
    contaminated AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT doc_id, fp FROM kept WHERE doc_id % 97 != 0) c
      JOIN (SELECT fp FROM kept WHERE doc_id % 97 = 0) b ON c.fp = b.fp),
    flags AS (
      SELECT q.doc_id, q.source,
             (q.doc_id % 97 != 0) AS in_corpus,
             q.keep_dedup,
             q.keep_quality,
             (ct.doc_id IS NULL) AS keep_clean,
             CASE WHEN cast(conv(substr(md5(q.lt), 1, 8), 16, 10) AS bigint) % 100 < 90 THEN 'train'
                  WHEN cast(conv(substr(md5(q.lt), 1, 8), 16, 10) AS bigint) % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM quality q LEFT JOIN contaminated ct ON ct.doc_id = q.doc_id)
    SELECT source,
           count(1) AS n_raw,
           sum(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS n_corpus,
           sum(CASE WHEN in_corpus AND keep_dedup THEN 1 ELSE 0 END) AS n_dedup,
           sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality THEN 1 ELSE 0 END) AS n_quality,
           sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean THEN 1 ELSE 0 END) AS n_clean,
           sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean AND split = 'train' THEN 1 ELSE 0 END) AS n_train,
           sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean AND split = 'val' THEN 1 ELSE 0 END) AS n_val,
           sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean AND split = 'test' THEN 1 ELSE 0 END) AS n_test
    FROM flags GROUP BY source ORDER BY source"""

  private[queries] lazy val pipelineFunnelOracle = """
    WITH base AS (
      SELECT doc_id, source, text, lower(text) AS lt, string_split(text, ' ') AS ws
      FROM documents),
    dedup AS (
      SELECT doc_id, source, lt, ws,
             (doc_id = min(doc_id) OVER (PARTITION BY md5(lt))) AS keep_dedup
      FROM base),
    quality AS (
      SELECT *,
             (len(ws) >= 5 AND
              len(list_distinct(ws)) * 5 >= len(ws)) AS keep_quality
      FROM dedup),
    g AS (
      SELECT doc_id, list_distinct(list_transform(range(len(ws) - 2),
               i -> md5(array_to_string(ws[i+1:i+3], ' ')))) AS gl
      FROM base WHERE len(ws) >= 3),
    fps AS (SELECT doc_id, unnest(gl) AS fp FROM g),
    freq AS (SELECT fp, count(1) AS df FROM fps GROUP BY fp),
    kept AS (SELECT fps.doc_id, fps.fp FROM fps JOIN freq ON fps.fp = freq.fp
             WHERE freq.df <= 50),
    contaminated AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT doc_id, fp FROM kept WHERE doc_id % 97 <> 0) c
      JOIN (SELECT fp FROM kept WHERE doc_id % 97 = 0) b ON c.fp = b.fp),
    flags AS (
      SELECT q.doc_id, q.source,
             (q.doc_id % 97 <> 0) AS in_corpus,
             q.keep_dedup, q.keep_quality,
             (ct.doc_id IS NULL) AS keep_clean,
             CASE WHEN ('0x' || substring(md5(q.lt), 1, 8))::BIGINT % 100 < 90 THEN 'train'
                  WHEN ('0x' || substring(md5(q.lt), 1, 8))::BIGINT % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM quality q LEFT JOIN contaminated ct ON ct.doc_id = q.doc_id)
    SELECT source,
           CAST(count(1) AS BIGINT) AS n_raw,
           CAST(sum(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus,
           CAST(sum(CASE WHEN in_corpus AND keep_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
           CAST(sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean AND split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean AND split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
           CAST(sum(CASE WHEN in_corpus AND keep_dedup AND keep_quality AND keep_clean AND split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
    FROM flags GROUP BY source ORDER BY source"""

  /** q205 — HTML boilerplate extraction (the trafilatura/jusText class):
    * the FIRST stage of every real web-corpus pipeline — strip markup,
    * drop chrome (nav/footer/ads), keep main-content blocks. Pinned
    * deterministic ring (documented, engine-stable):
    *  1. remove script/style elements and their content
    *     (`(?is)<(script|style)[^>]*>.*?</(script|style)>`);
    *  2. split on block-level tags (p, div, h1-h6, li, ul, ol, table,
    *     tr, td, br, nav, header, footer, section, article, aside,
    *     blockquote);
    *  3. per block: text = inline tags → space, whitespace collapsed,
    *     trimmed, basic entities (&amp; &lt; &gt;) decoded; link text =
    *     concatenated <a>…</a> contents;
    *  4. keep a block iff text length ≥ 25 AND link density ≤ 1/3
    *     (integer form 3·linklen ≤ textlen — the jusText-style
    *     short/link-heavy heuristic that kills nav bars, ad strips and
    *     footers);
    *  5. main text = kept blocks joined by newline, in document order.
    *
    * All array-lambda + regex column functions — per-row map-only work,
    * zero UDFs, zero shuffles beyond the final order: the 100 TB shape
    * (extraction cost scales with bytes scanned, embarrassingly
    * parallel). The HTML is DERIVED from documents.text (the fixture
    * carries no markup): each doc wraps into a page with nav/ads/footer
    * chrome and per-doc link-density variation, so the oracle can build
    * the identical page and the gate checks the full ring — tag
    * stripping, block split, density decisions, reassembly order. */
  private[queries] lazy val htmlExtractSql = """
    WITH h AS (
      SELECT doc_id, source,
             concat(
               '<html><head><title>d</title><style>p{margin:0}</style>',
               '<script>var t=1;</script></head><body>',
               '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Blog</a></nav>',
               '<h1>', substr(text, 1, 40), '</h1>',
               '<p>', substr(text, 41, 300), '</p>',
               '<p>', substr(text, 341, 300),
               CASE WHEN doc_id % 3 = 0
                    THEN ' <a href="/x">read more</a> <a href="/y">related</a>'
                    ELSE '' END, '</p>',
               '<div><a href="/buy">Buy now</a> <a href="/c">cheap deals</a> go</div>',
               '<footer>(c) 2024 <a href="/p">Privacy</a></footer></body></html>') AS html
      FROM documents WHERE doc_id % 7 = 0),
    c AS (
      SELECT doc_id, source,
             regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ') AS ch
      FROM h),
    b AS (
      SELECT doc_id, source,
             filter(
               split(ch, '(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|td|br|nav|header|footer|section|article|aside|blockquote)[^>]*>'),
               x -> length(trim(x)) > 0) AS cand
      FROM c),
    k AS (
      SELECT doc_id, source, size(cand) AS n_blocks,
             filter(cand, x ->
               length(replace(replace(replace(trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' '), '\\s+', ' ')), '&amp;', '&'), '&lt;', '<'), '&gt;', '>')) >= 25
               AND 3 * length(array_join(regexp_extract_all(x, '<a[^>]*>(.*?)</a>', 1), ''))
                   <= length(replace(replace(replace(trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' '), '\\s+', ' ')), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'))) AS kept
      FROM b),
    m AS (
      SELECT doc_id, source, n_blocks, size(kept) AS n_kept,
             array_join(transform(kept, x ->
               replace(replace(replace(trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' '), '\\s+', ' ')), '&amp;', '&'), '&lt;', '<'), '&gt;', '>')), '\n') AS main
      FROM k)
    SELECT doc_id, source, CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(n_kept AS BIGINT) AS n_kept,
           CAST(length(main) AS BIGINT) AS main_len,
           substr(main, 1, 60) AS prefix
    FROM m ORDER BY doc_id"""

  private[queries] lazy val htmlExtractOracle = """
    WITH h AS (
      SELECT doc_id, source,
             concat(
               '<html><head><title>d</title><style>p{margin:0}</style>',
               '<script>var t=1;</script></head><body>',
               '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Blog</a></nav>',
               '<h1>', substr(text, 1, 40), '</h1>',
               '<p>', substr(text, 41, 300), '</p>',
               '<p>', substr(text, 341, 300),
               CASE WHEN doc_id % 3 = 0
                    THEN ' <a href="/x">read more</a> <a href="/y">related</a>'
                    ELSE '' END, '</p>',
               '<div><a href="/buy">Buy now</a> <a href="/c">cheap deals</a> go</div>',
               '<footer>(c) 2024 <a href="/p">Privacy</a></footer></body></html>') AS html
      FROM documents WHERE doc_id % 7 = 0),
    c AS (
      SELECT doc_id, source,
             regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS ch
      FROM h),
    b AS (
      SELECT doc_id, source,
             list_filter(
               regexp_split_to_array(ch, '(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|td|br|nav|header|footer|section|article|aside|blockquote)[^>]*>'),
               x -> length(trim(x)) > 0) AS cand
      FROM c),
    k AS (
      SELECT doc_id, source, len(cand) AS n_blocks,
             list_filter(cand, x ->
               length(replace(replace(replace(trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')), '&amp;', '&'), '&lt;', '<'), '&gt;', '>')) >= 25
               AND 3 * coalesce(length(array_to_string(regexp_extract_all(x, '<a[^>]*>(.*?)</a>', 1), '')), 0)
                   <= length(replace(replace(replace(trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'))) AS kept
      FROM b),
    m AS (
      SELECT doc_id, source, n_blocks, len(kept) AS n_kept,
             coalesce(array_to_string(list_transform(kept, x ->
               replace(replace(replace(trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')), '&amp;', '&'), '&lt;', '<'), '&gt;', '>')), chr(10)), '') AS main
      FROM k)
    SELECT doc_id, source, CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(n_kept AS BIGINT) AS n_kept,
           CAST(length(main) AS BIGINT) AS main_len,
           substr(main, 1, 60) AS prefix
    FROM m ORDER BY doc_id"""

  /** q211 — URL canonicalization + URL-level dedup accounting: the web
    * pipeline stage BEFORE content dedup (crawls carry the same page
    * under scheme-case/default-port/tracking-param/fragment variants;
    * canonicalizing first collapses them for free). Pinned rules:
    *  1. scheme and host lowercase; leading `www.` stripped;
    *  2. default ports dropped (`:80` http, `:443` https), others kept;
    *  3. fragment dropped;
    *  4. tracking params dropped (`utm_*`, `gclid`, `fbclid`),
    *     remaining params SORTED (byte order) and rejoined;
    *  5. trailing path slash stripped (root stays `/`; empty → `/`).
    * URLs are DERIVED from doc columns (several variants of the same
    * logical page per doc_id class), so the oracle re-derives and
    * re-canonicalizes identically, and the dedup accounting (raw vs
    * canonical distinct per source) has constructible truth. All
    * split/regexp/array-lambda column work — map-only; the only
    * shuffle is the final per-source aggregate. */
  private[queries] lazy val urlCanonSql = """
    WITH raw AS (
      SELECT doc_id, source,
             concat(
               CASE WHEN (doc_id div 20) % 4 = 0 THEN 'HTTP://WWW.' ELSE 'http://' END,
               source, '.Example.com',
               CASE WHEN (doc_id div 20) % 4 = 1 THEN ':80' WHEN (doc_id div 20) % 4 = 2 THEN ':8080' ELSE '' END,
               '/Pages/p', CAST((doc_id div 20) % 5 AS STRING),
               CASE WHEN (doc_id div 20) % 3 = 0 THEN '/' ELSE '' END,
               CASE WHEN (doc_id div 20) % 2 = 0 THEN '?utm_source=feed&b=2&a=1&gclid=9' ELSE '?a=1&b=2' END,
               CASE WHEN (doc_id div 20) % 7 = 0 THEN '#frag' ELSE '' END) AS url
      FROM documents),
    parts AS (
      SELECT doc_id, source, url,
             lower(split_part(url, '://', 1)) AS scheme,
             split_part(split_part(url, '://', 2), '#', 1) AS rest
      FROM raw),
    hp AS (
      SELECT *, split_part(rest, '/', 1) AS hostport,
             substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
      FROM parts),
    comps AS (
      SELECT doc_id, source, url, scheme,
             CASE WHEN lower(split_part(hostport, ':', 1)) LIKE 'www.%'
                  THEN substr(lower(split_part(hostport, ':', 1)), 5)
                  ELSE lower(split_part(hostport, ':', 1)) END AS host,
             split_part(hostport, ':', 2) AS port,
             split_part(pathq, '?', 1) AS path,
             split_part(pathq, '?', 2) AS qs
      FROM hp),
    canon AS (
      SELECT doc_id, source, url,
             concat(
               scheme, '://', host,
               CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                    THEN '' ELSE concat(':', port) END,
               CASE WHEN path = '' OR path = '/' THEN '/'
                    ELSE regexp_replace(path, '/+$', '') END,
               CASE WHEN size(filter(split(qs, '&'), p -> p != '' AND NOT p LIKE 'utm_%'
                                       AND NOT p LIKE 'gclid=%' AND NOT p LIKE 'fbclid=%')) > 0
                    THEN concat('?', array_join(array_sort(
                           filter(split(qs, '&'), p -> p != '' AND NOT p LIKE 'utm_%'
                             AND NOT p LIKE 'gclid=%' AND NOT p LIKE 'fbclid=%')), '&'))
                    ELSE '' END) AS curl
      FROM comps)
    SELECT source,
           CAST(count(1) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT curl) AS BIGINT) AS n_canon,
           CAST(count(DISTINCT url) - count(DISTINCT curl) AS BIGINT) AS n_collapsed,
           min(curl) AS sample
    FROM canon GROUP BY source ORDER BY source"""

  private[queries] lazy val urlCanonOracle = """
    WITH raw AS (
      SELECT doc_id, source,
             concat(
               CASE WHEN (doc_id // 20) % 4 = 0 THEN 'HTTP://WWW.' ELSE 'http://' END,
               source, '.Example.com',
               CASE WHEN (doc_id // 20) % 4 = 1 THEN ':80' WHEN (doc_id // 20) % 4 = 2 THEN ':8080' ELSE '' END,
               '/Pages/p', CAST((doc_id // 20) % 5 AS VARCHAR),
               CASE WHEN (doc_id // 20) % 3 = 0 THEN '/' ELSE '' END,
               CASE WHEN (doc_id // 20) % 2 = 0 THEN '?utm_source=feed&b=2&a=1&gclid=9' ELSE '?a=1&b=2' END,
               CASE WHEN (doc_id // 20) % 7 = 0 THEN '#frag' ELSE '' END) AS url
      FROM documents),
    parts AS (
      SELECT doc_id, source, url,
             lower(split_part(url, '://', 1)) AS scheme,
             split_part(split_part(url, '://', 2), '#', 1) AS rest
      FROM raw),
    hp AS (
      SELECT *, split_part(rest, '/', 1) AS hostport,
             substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
      FROM parts),
    comps AS (
      SELECT doc_id, source, url, scheme,
             CASE WHEN lower(split_part(hostport, ':', 1)) LIKE 'www.%'
                  THEN substr(lower(split_part(hostport, ':', 1)), 5)
                  ELSE lower(split_part(hostport, ':', 1)) END AS host,
             split_part(hostport, ':', 2) AS port,
             split_part(pathq, '?', 1) AS path,
             split_part(pathq, '?', 2) AS qs
      FROM hp),
    canon AS (
      SELECT doc_id, source, url,
             concat(
               scheme, '://', host,
               CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                    THEN '' ELSE concat(':', port) END,
               CASE WHEN path = '' OR path = '/' THEN '/'
                    ELSE regexp_replace(path, '/+$', '', 'g') END,
               CASE WHEN len(list_filter(string_split(qs, '&'), p -> p != '' AND NOT p LIKE 'utm_%'
                              AND NOT p LIKE 'gclid=%' AND NOT p LIKE 'fbclid=%')) > 0
                    THEN concat('?', array_to_string(list_sort(
                           list_filter(string_split(qs, '&'), p -> p != '' AND NOT p LIKE 'utm_%'
                             AND NOT p LIKE 'gclid=%' AND NOT p LIKE 'fbclid=%')), '&'))
                    ELSE '' END) AS curl
      FROM comps)
    SELECT source,
           CAST(count(1) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT curl) AS BIGINT) AS n_canon,
           CAST(count(DISTINCT url) - count(DISTINCT curl) AS BIGINT) AS n_collapsed,
           min(curl) AS sample
    FROM canon GROUP BY source ORDER BY source"""

  // -------------------------------------------------------- multimodal

  /** Opaque-binary metadata plumbing: payload byte length, content hash,
    * fixed-size frame count, header prefix — the schema/partitioning
    * shape a real image/audio decode stage plugs into (the decode itself
    * lives in graft.ops.Multimodal as a deterministic stub; this query
    * checks the metadata layer against the oracle). */
  private[queries] lazy val multimodalSql = """
    SELECT doc_id,
           octet_length(text) AS payload_bytes,
           sha2(text, 256) AS content_sha,
           substr(sha2(text, 256), 1, 16) AS header,
           cast(ceil(octet_length(text) / 64.0) AS bigint) AS n_frames
    FROM documents ORDER BY doc_id"""

  private[queries] lazy val multimodalOracle = """
    SELECT doc_id,
           octet_length(text::BLOB) AS payload_bytes,
           sha256(text) AS content_sha,
           substr(sha256(text), 1, 16) AS header,
           ceil(octet_length(text::BLOB) / 64.0)::BIGINT AS n_frames
    FROM documents ORDER BY doc_id"""

  /** BM25 keyword scoring (k1=1.2, b=0.75) for a FIXED query term set —
    * the retrieval/quality-filter primitive of a training-data pipeline
    * ("pull the top docs about X from the corpus"). Physical shape at
    * any scale: per-doc term frequencies are computed in the SCAN
    * projection (map-only `filter` over the token array — no explode, no
    * shuffle), corpus statistics (N, avgdl, per-term document
    * frequencies) are ONE global aggregate row cross-joined back
    * (broadcast), and the result is a top-k (TakeOrderedAndProject,
    * never a global sort). An inverted index only pays off for ad-hoc
    * query workloads; for a fixed term set this one-pass scan is the
    * minimal-shuffle plan. Term contributions are summed in fixed
    * written order and rounded to 6dp so Spark and DuckDB agree bit-wise
    * after rounding. */
  private[queries] lazy val Bm25Terms = Seq("query", "stream", "vector")
  private[queries] def bm25TfCols(filterFn: String, sizeFn: String): String =
    Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"$sizeFn($filterFn(t, x -> x = '$t')) AS tf${i + 1}"
    }.mkString(",\n           ")
  private[queries] def bm25Score(castD: String => String): String =
    Bm25Terms.indices.map { i =>
      val (tf, df) = (s"tf${i + 1}", s"df${i + 1}")
      s"ln(1.0 + (n - $df + 0.5) / ($df + 0.5)) * (${castD(tf)} * 2.2) / " +
        s"(${castD(tf)} + 1.2 * (0.25 + 0.75 * ${castD("dl")} / avgdl))"
    }.mkString("\n         + ")

  private[queries] lazy val bm25Sql = s"""
    WITH toks AS (SELECT doc_id, split(lower(text), '\\\\s+') AS t FROM documents),
    stats AS (
      SELECT doc_id, size(t) AS dl,
           ${bm25TfCols("filter", "size")}
      FROM toks),
    corpus AS (
      SELECT cast(count(1) AS double) AS n, avg(cast(dl AS double)) AS avgdl,
             ${Bm25Terms.indices.map(i =>
               s"cast(sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS double) AS df${i + 1}")
               .mkString(",\n             ")}
      FROM stats)
    SELECT doc_id,
       round(${bm25Score(c => s"cast($c AS double)")}, 6) AS bm25
    FROM stats CROSS JOIN corpus
    WHERE tf1 + tf2 + tf3 > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT 20"""

  private[queries] lazy val bm25Oracle = s"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents),
    stats AS (
      SELECT doc_id, len(t) AS dl,
           ${bm25TfCols("list_filter", "len")}
      FROM toks),
    corpus AS (
      SELECT count(1)::DOUBLE AS n, avg(dl::DOUBLE) AS avgdl,
             ${Bm25Terms.indices.map(i =>
               s"sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df${i + 1}")
               .mkString(",\n             ")}
      FROM stats)
    SELECT doc_id,
       round(${bm25Score(c => s"$c::DOUBLE")}, 6) AS bm25
    FROM stats CROSS JOIN corpus
    WHERE tf1 + tf2 + tf3 > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT 20"""

  // -------------------------------------------------- Zipf-law audit

  /** q109 — rank-frequency Zipf audit: the slope of log(freq) vs
    * log(rank) over the top-200 terms should sit near −1 for natural
    * language; a corpus that drifts far off is template/boilerplate
    * heavy (or synthetically generated) — a standard pretraining-corpus
    * health check. One term-freq hash agg (Zipf head absorbs map-side),
    * a top-k, a rank window over ≤200 rows, one regr_slope aggregate —
    * nothing scales with corpus size past the first agg. Tokenizer is a
    * literal single-space split on BOTH sides (as q113/q114): a regex
    * \s+ here against string_split(' ') in DuckDB would diverge on any
    * tab/newline in the corpus. */
  private[queries] lazy val zipfSql = """
    WITH tf AS (
      SELECT tok, count(1) AS f
      FROM (SELECT explode(split(lower(text), ' ')) AS tok FROM documents)
      WHERE tok != ''
      GROUP BY tok
      ORDER BY f DESC, tok ASC
      LIMIT 200),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok ASC) AS r FROM tf)
    SELECT round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
           round(regr_r2(ln(f), ln(r)), 6) AS fit_r2,
           count(1) AS n_terms,
           CASE WHEN regr_slope(ln(f), ln(r)) BETWEEN -2.0 AND -0.3
                THEN 1 ELSE 0 END AS looks_natural
    FROM ranked"""

  private[queries] lazy val zipfOracle = """
    WITH tf AS (
      SELECT tok, count(*) AS f
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
      WHERE tok != ''
      GROUP BY tok
      ORDER BY f DESC, tok ASC
      LIMIT 200),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok ASC) AS r FROM tf)
    SELECT round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
           round(regr_r2(ln(f), ln(r)), 6) AS fit_r2,
           count(*) AS n_terms,
           (CASE WHEN regr_slope(ln(f), ln(r)) BETWEEN -2.0 AND -0.3
                 THEN 1 ELSE 0 END)::BIGINT AS looks_natural
    FROM ranked"""

  // ----------------------------------------- exact n-gram decontamination

  /** q113 — exact word-n-gram benchmark decontamination (the GPT-3
    * appendix-C method, distinct from q53's winnowing-FINGERPRINT
    * screen): a corpus document is contaminated when it shares ANY exact
    * word n-gram with a benchmark document. GPT-3 used 13-grams on web
    * text; n is a parameter and is 3 here because the synthetic docs are
    * short — the plan shape is identical at any n. Grams above the
    * document-frequency cap (boilerplate) are dropped first, exactly the
    * posting-list bound q24/q53 use: the gram join is over bounded
    * posting lists, never corpus×corpus. (doc_id, gram) is unique after
    * the per-doc array_distinct, so the df cap is one count-over-window
    * pass — no groupBy + re-join, q53's trick. Output: each contaminated
    * corpus doc with its distinct shared-gram count and how many bench
    * docs it collides with. */
  private[queries] lazy val decontamSql = """
    WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents_rp),
    g AS (
      SELECT doc_id, array_distinct(transform(sequence(0, size(ws) - 3),
               i -> md5(concat_ws(' ', slice(ws, i + 1, 3))))) AS gl
      FROM w WHERE size(ws) >= 3),
    fps AS (SELECT doc_id, explode(gl) AS fp FROM g),
    kept AS (SELECT doc_id, fp FROM (
               SELECT doc_id, fp, count(1) OVER (PARTITION BY fp) AS df FROM fps)
             WHERE df <= 50),
    bench AS (SELECT doc_id AS bench_id, fp FROM kept WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, fp FROM kept WHERE doc_id % 97 != 0)
    SELECT c.doc_id, count(DISTINCT c.fp) AS shared_grams,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.fp = b.fp
    GROUP BY c.doc_id ORDER BY c.doc_id"""

  private[queries] lazy val decontamOracle = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, list_distinct(list_transform(range(len(ws) - 2),
               i -> md5(array_to_string(ws[i+1:i+3], ' ')))) AS gl
      FROM w WHERE len(ws) >= 3),
    fps AS (SELECT doc_id, unnest(gl) AS fp FROM g),
    freq AS (SELECT fp, count(DISTINCT doc_id) AS df FROM fps GROUP BY fp),
    kept AS (SELECT fps.doc_id, fps.fp FROM fps JOIN freq ON fps.fp = freq.fp
             WHERE freq.df <= 50),
    bench AS (SELECT doc_id AS bench_id, fp FROM kept WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, fp FROM kept WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, count(DISTINCT c.fp) AS shared_grams,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.fp = b.fp
    GROUP BY c.doc_id ORDER BY c.doc_id"""

  // ------------------------------------------- memorization audit

  /** q184 — per-eval-doc n-gram novelty / memorization-risk audit (the
    * Carlini-et-al-class leakage check, and the per-document complement
    * of q113's decontamination verdicts): for every EVAL-split document,
    * the fraction of its distinct word n-grams that appear verbatim
    * anywhere in the TRAIN split. Low novelty = the eval doc is largely
    * reconstructable from training text — exactly what an eval-set audit
    * must catch before metrics are trusted. Split is the deterministic
    * doc_id stance (eval = doc_id %% 10 == 0); production would use the
    * q89 content-stable md5 bucket — downstream shape is identical.
    *
    * Scale shape at 100 TB: gram explode is map-only; the train side
    * reduces to a DISTINCT gram-hash set (partial dedup map-side, one
    * shuffle on the hash); the audit is ONE hash equi-join eval-grams ⋈
    * train-set — after distinct the train side has ≤1 row per key, so
    * join fan-out is 1 and boilerplate grams cost O(1) per eval gram
    * (no df cap needed, the q130 no-pair-join guarantee); one doc_id
    * agg finishes. Nothing is all-pairs, nothing collects. */
  private[queries] lazy val memorizationSql = """
    WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, array_distinct(transform(sequence(0, size(ws) - 3),
               i -> md5(concat_ws(' ', slice(ws, i + 1, 3))))) AS gl
      FROM w WHERE size(ws) >= 3),
    fps AS (SELECT doc_id, explode(gl) AS fp FROM g),
    train AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 != 0),
    ev AS (SELECT doc_id, fp FROM fps WHERE doc_id % 10 = 0)
    SELECT ev.doc_id,
           count(1) AS total_grams,
           count(train.fp) AS seen_grams,
           round(CAST(1 AS DOUBLE) - count(train.fp) / count(1), 6) AS novelty,
           CAST(CASE WHEN count(train.fp) * 2 >= count(1) THEN 1 ELSE 0 END AS BIGINT) AS memorization_risk
    FROM ev LEFT JOIN train ON ev.fp = train.fp
    GROUP BY ev.doc_id ORDER BY ev.doc_id"""

  private[queries] lazy val memorizationOracle = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, list_distinct(list_transform(range(len(ws) - 2),
               i -> md5(array_to_string(ws[i+1:i+3], ' ')))) AS gl
      FROM w WHERE len(ws) >= 3),
    fps AS (SELECT doc_id, unnest(gl) AS fp FROM g),
    train AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 <> 0),
    ev AS (SELECT doc_id, fp FROM fps WHERE doc_id % 10 = 0)
    SELECT ev.doc_id,
           count(1) AS total_grams,
           count(train.fp) AS seen_grams,
           round(1.0 - count(train.fp) * 1.0 / count(1), 6) AS novelty,
           CAST(CASE WHEN count(train.fp) * 2 >= count(1) THEN 1 ELSE 0 END AS BIGINT) AS memorization_risk
    FROM ev LEFT JOIN train ON ev.fp = train.fp
    GROUP BY ev.doc_id ORDER BY ev.doc_id"""

  // --------------------------------------------- token-distribution drift

  /** q114 — token-distribution drift between two corpus slices (the
    * mixture-health check run before changing a pretraining data recipe):
    * unigram distributions of src0 vs src1 with add-one smoothing over
    * the union vocabulary, reporting KL(P‖Q), KL(Q‖P) and the symmetric
    * Jensen–Shannon divergence. Physical shape at 100 TB: ONE
    * partial+final hash aggregate over (word) with both slice counts as
    * conditional sums (the Zipf head combines map-side), then a
    * vocabulary-sized relation (≪ corpus) crossed with a single totals
    * row — the corpus is scanned exactly once and nothing vocabulary×
    * vocabulary ever forms. Doubles are summed once and rounded to 6dp
    * on both engines. */
  private[queries] lazy val tokenDriftSql = """
    WITH tok AS (
      SELECT source, explode(split(text, ' ')) AS w
      FROM documents WHERE source IN ('src0', 'src1')),
    cnt AS (
      SELECT w, sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS cp,
             sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cq
      FROM tok GROUP BY w),
    tot AS (SELECT cast(sum(cp) AS double) AS np, cast(sum(cq) AS double) AS nq,
                   cast(count(1) AS double) AS v FROM cnt),
    probs AS (
      SELECT (cast(cp AS double) + 1.0) / (np + v) AS p,
             (cast(cq AS double) + 1.0) / (nq + v) AS q
      FROM cnt CROSS JOIN tot)
    SELECT cast(v AS bigint) AS vocab_size, cast(np AS bigint) AS n_tokens_p,
           cast(nq AS bigint) AS n_tokens_q,
           round(sum(p * ln(p / q)), 6) AS kl_pq,
           round(sum(q * ln(q / p)), 6) AS kl_qp,
           round(0.5 * sum(p * ln(2.0 * p / (p + q)))
               + 0.5 * sum(q * ln(2.0 * q / (p + q))), 6) AS js
    FROM probs CROSS JOIN tot
    GROUP BY v, np, nq"""

  private[queries] lazy val tokenDriftOracle = """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE source IN ('src0', 'src1')),
    cnt AS (
      SELECT w, sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::DOUBLE AS cp,
             sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::DOUBLE AS cq
      FROM tok GROUP BY w),
    tot AS (SELECT sum(cp)::DOUBLE AS np, sum(cq)::DOUBLE AS nq,
                   count(1)::DOUBLE AS v FROM cnt),
    probs AS (
      SELECT (cp + 1.0) / (np + v) AS p, (cq + 1.0) / (nq + v) AS q
      FROM cnt CROSS JOIN tot)
    SELECT v::BIGINT AS vocab_size, np::BIGINT AS n_tokens_p, nq::BIGINT AS n_tokens_q,
           round(sum(p * ln(p / q)), 6) AS kl_pq,
           round(sum(q * ln(q / p)), 6) AS kl_qp,
           round(0.5 * sum(p * ln(2.0 * p / (p + q)))
               + 0.5 * sum(q * ln(2.0 * q / (p + q))), 6) AS js
    FROM probs CROSS JOIN tot
    GROUP BY v, np, nq"""

  // --------------------------------------------------- PII scrubbing

  /** q110 — PII scrub (email / IPv4 / phone redaction): the mandatory
    * pre-release pass on any training corpus. Map-only regexp_replace
    * chain (codegen'd), counts via regexp_extract_all so the audit and
    * the scrub share one scan; patterns restricted to RE2-compatible
    * syntax so the DuckDB oracle matches byte-for-byte. The synthetic
    * corpus contains no PII — the gate then proves the scrubber is
    * exactly IDENTITY on clean text (zero counts, hash-equal output),
    * while PiiScrubSpec pins the redaction behavior on seeded fixtures. */
  private[queries] lazy val piiEmail = "[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z]{2,}"
  private[queries] lazy val piiIp = "\\\\b\\\\d{1,3}\\\\.\\\\d{1,3}\\\\.\\\\d{1,3}\\\\.\\\\d{1,3}\\\\b"
  private[queries] lazy val piiPhone = "\\\\b\\\\d{3}[-.]\\\\d{3}[-.]\\\\d{4}\\\\b"

  private[queries] lazy val piiSql = s"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(lower(text),
               '$piiEmail', '<EMAIL>'),
               '$piiIp', '<IP>'),
               '$piiPhone', '<PHONE>')) AS scrub_hash,
           CAST(size(regexp_extract_all(lower(text), '$piiEmail', 0)) AS BIGINT) AS n_emails,
           CAST(size(regexp_extract_all(lower(text), '$piiIp', 0)) AS BIGINT) AS n_ips,
           CAST(size(regexp_extract_all(lower(text), '$piiPhone', 0)) AS BIGINT) AS n_phones
    FROM documents ORDER BY doc_id"""

  private[queries] lazy val piiOracle = s"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(lower(text),
               '${piiEmail.replace("\\\\", "\\")}', '<EMAIL>', 'g'),
               '${piiIp.replace("\\\\", "\\")}', '<IP>', 'g'),
               '${piiPhone.replace("\\\\", "\\")}', '<PHONE>', 'g')) AS scrub_hash,
           len(regexp_extract_all(lower(text), '${piiEmail.replace("\\\\", "\\")}'))::BIGINT AS n_emails,
           len(regexp_extract_all(lower(text), '${piiIp.replace("\\\\", "\\")}'))::BIGINT AS n_ips,
           len(regexp_extract_all(lower(text), '${piiPhone.replace("\\\\", "\\")}'))::BIGINT AS n_phones
    FROM documents ORDER BY doc_id"""

  // ----------------------------- C4/Gopher rule-filter audit (q121)

  /** q121 — classic rule-filter audit (C4, Raffel et al. 2020; Gopher,
    * Rae et al. 2021): per-document pass/fail for the standard quality
    * rules, aggregated to per-rule pass counts + composite retention —
    * the first report any corpus-curation run produces. Rules: word
    * count in [50, 100k] and mean word length in [3, 10] (Gopher),
    * distinct-word fraction ≥ 0.3 and top-word dominance ≤ 20% (the
    * Gopher repetition family), no curly braces and no 'lorem ipsum'
    * (C4).
    *
    * Scale shape: ONE word explode feeding two chained hash aggs
    * (doc×word histogram → per-doc metrics; the histogram is where
    * map-side combine absorbs the Zipf head), one join back to the
    * map-only per-doc text flags, one global agg → a single row. */
  private[queries] lazy val qualityRulesSql = """
    WITH wcnt AS (
      SELECT doc_id, tok, count(1) AS c
      FROM (SELECT doc_id, explode(split(lower(text), ' ')) AS tok FROM documents)
      WHERE tok != ''
      GROUP BY doc_id, tok),
    docm AS (
      SELECT doc_id, sum(c) AS wc, count(1) AS dw, max(c) AS topc,
             sum(length(tok) * c) AS chars
      FROM wcnt GROUP BY doc_id),
    flags AS (
      SELECT m.doc_id,
             CASE WHEN m.wc >= 50 AND m.wc <= 100000 THEN 1 ELSE 0 END AS r_wc,
             CASE WHEN m.chars / cast(m.wc AS double) >= 3
                   AND m.chars / cast(m.wc AS double) <= 10 THEN 1 ELSE 0 END AS r_wlen,
             CASE WHEN m.dw / cast(m.wc AS double) >= 0.3 THEN 1 ELSE 0 END AS r_distinct,
             CASE WHEN m.topc / cast(m.wc AS double) <= 0.2 THEN 1 ELSE 0 END AS r_topword,
             CASE WHEN instr(d.text, '{') = 0 THEN 1 ELSE 0 END AS r_brace,
             CASE WHEN instr(lower(d.text), 'lorem ipsum') = 0 THEN 1 ELSE 0 END AS r_lorem
      FROM docm m JOIN documents d ON m.doc_id = d.doc_id)
    SELECT count(1) AS n_docs,
           sum(r_wc) AS n_wc, sum(r_wlen) AS n_wlen,
           sum(r_distinct) AS n_distinct, sum(r_topword) AS n_topword,
           sum(r_brace) AS n_brace, sum(r_lorem) AS n_lorem,
           sum(r_wc * r_wlen * r_distinct * r_topword * r_brace * r_lorem) AS n_keep,
           round(sum(r_wc * r_wlen * r_distinct * r_topword * r_brace * r_lorem)
                 / cast(count(1) AS double), 6) AS retention
    FROM flags"""

  private[queries] lazy val qualityRulesOracle = """
    WITH wcnt AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
      WHERE tok != ''
      GROUP BY doc_id, tok),
    docm AS (
      SELECT doc_id, sum(c) AS wc, count(*) AS dw, max(c) AS topc,
             sum(length(tok) * c) AS chars
      FROM wcnt GROUP BY doc_id),
    flags AS (
      SELECT m.doc_id,
             CASE WHEN m.wc >= 50 AND m.wc <= 100000 THEN 1 ELSE 0 END AS r_wc,
             CASE WHEN m.chars / m.wc::DOUBLE >= 3
                   AND m.chars / m.wc::DOUBLE <= 10 THEN 1 ELSE 0 END AS r_wlen,
             CASE WHEN m.dw / m.wc::DOUBLE >= 0.3 THEN 1 ELSE 0 END AS r_distinct,
             CASE WHEN m.topc / m.wc::DOUBLE <= 0.2 THEN 1 ELSE 0 END AS r_topword,
             CASE WHEN instr(d.text, '{') = 0 THEN 1 ELSE 0 END AS r_brace,
             CASE WHEN instr(lower(d.text), 'lorem ipsum') = 0 THEN 1 ELSE 0 END AS r_lorem
      FROM docm m JOIN documents d ON m.doc_id = d.doc_id)
    SELECT count(*)::BIGINT AS n_docs,
           sum(r_wc)::BIGINT AS n_wc, sum(r_wlen)::BIGINT AS n_wlen,
           sum(r_distinct)::BIGINT AS n_distinct, sum(r_topword)::BIGINT AS n_topword,
           sum(r_brace)::BIGINT AS n_brace, sum(r_lorem)::BIGINT AS n_lorem,
           sum(r_wc * r_wlen * r_distinct * r_topword * r_brace * r_lorem)::BIGINT AS n_keep,
           round(sum(r_wc * r_wlen * r_distinct * r_topword * r_brace * r_lorem)
                 / count(*)::DOUBLE, 6) AS retention
    FROM flags"""

  // ------------------------------- DSIR importance weighting (q118)

  /** q118 — hashed-feature importance weighting for data selection
    * (DSIR, Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): fit bag-of-hashed-unigram models on a
    * TARGET slice (here `source = 'src0'`, the benchmark-like
    * distribution) and on the RAW pool, then score every raw document by
    * its log importance weight Σ_f n_f·(ln p̂_target(f) − ln p̂_raw(f))
    * with add-one smoothing over [[DsirBuckets]] hash buckets; the top
    * slice is what importance resampling would keep.
    *
    * Scale shape at 100 TB: a token explode + hash agg produces the
    * bucket-count table (exactly [[DsirBuckets]] rows — broadcast); the
    * per-doc score re-derives the exploded relation in a SECOND scan
    * (Spark inlines the CTE) rather than materializing a corpus-sized
    * token intermediate — two cheap columnar scans beat caching the
    * explode at 100 TB. Selection is TakeOrdered top-k — nothing
    * driver-side, nothing quadratic, the ratio table never exceeds a
    * few KB. Tokenizer is
    * the literal single-space split shared with q113/q114; the hash is
    * the md5-prefix bucket idiom shared with q89 so DuckDB reproduces
    * it bit-for-bit. Floats: scores round to 6dp and the top-k orders
    * by the ROUNDED value (doc_id tie-break) so cross-engine ulp drift
    * cannot reorder the cut. */
  private[queries] lazy val DsirBuckets = 256

  private[queries] lazy val dsirSql = s"""
    WITH tok AS (
      SELECT doc_id, source,
             cast(conv(substr(md5(tok), 1, 8), 16, 10) AS bigint) % $DsirBuckets AS b
      FROM (SELECT doc_id, source, explode(split(lower(text), ' ')) AS tok FROM documents)
      WHERE tok != ''),
    cnt AS (
      SELECT b,
             sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS t_cnt,
             sum(CASE WHEN source != 'src0' THEN 1 ELSE 0 END) AS r_cnt
      FROM tok GROUP BY b),
    tot AS (SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot FROM cnt),
    lr AS (
      SELECT b, ln((t_cnt + 1) / (t_tot + $DsirBuckets.0))
                - ln((r_cnt + 1) / (r_tot + $DsirBuckets.0)) AS lw
      FROM cnt CROSS JOIN tot),
    score AS (
      SELECT t.doc_id, sum(l.lw) AS logw, count(1) AS n_toks
      FROM tok t JOIN lr l ON t.b = l.b
      WHERE t.source != 'src0'
      GROUP BY t.doc_id)
    SELECT doc_id, round(logw, 6) AS logw, n_toks
    FROM score
    ORDER BY round(logw, 6) DESC, doc_id ASC
    LIMIT 50"""

  private[queries] lazy val dsirOracle = s"""
    WITH tok AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % $DsirBuckets AS b
      FROM (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
      WHERE tok != ''),
    cnt AS (
      SELECT b,
             sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS t_cnt,
             sum(CASE WHEN source != 'src0' THEN 1 ELSE 0 END)::BIGINT AS r_cnt
      FROM tok GROUP BY b),
    tot AS (SELECT sum(t_cnt)::DOUBLE AS t_tot, sum(r_cnt)::DOUBLE AS r_tot FROM cnt),
    lr AS (
      SELECT b, ln((t_cnt + 1) / (t_tot + $DsirBuckets.0))
                - ln((r_cnt + 1) / (r_tot + $DsirBuckets.0)) AS lw
      FROM cnt CROSS JOIN tot),
    score AS (
      SELECT t.doc_id, sum(l.lw) AS logw, count(*)::BIGINT AS n_toks
      FROM tok t JOIN lr l ON t.b = l.b
      WHERE t.source != 'src0'
      GROUP BY t.doc_id)
    SELECT doc_id, round(logw, 6) AS logw, n_toks
    FROM score
    ORDER BY round(logw, 6) DESC, doc_id ASC
    LIMIT 50"""

  // ------------------------------------ temperature mixture audit (q148)

  /** α-temperature source re-weighting (the GPT-3/multilingual mixture
    * rule): target sampling mass ∝ n_s^α (α=0.7), realized as per-source
    * inclusion rates against a total budget of half the corpus, capped
    * at 1; selection is the q55/q89 content-stable md5-bucket predicate
    * (no rand()/seed state — re-runs and backfills select identical
    * docs). Output: per-source corpus count, target keep rate, selected
    * count. Shape: two tiny aggregates (sources ≈ dozens) + ONE corpus
    * scan with the rate table broadcast — map-side selection, one
    * partial/final count agg. */
  private[queries] lazy val mixtureAlpha = 0.7
  private[queries] lazy val temperatureMixtureSql = s"""
    WITH src AS (SELECT source, cast(count(1) AS double) AS n FROM documents GROUP BY source),
    tot AS (SELECT sum(pow(n, $mixtureAlpha)) AS z, sum(n) AS nn FROM src),
    rates AS (SELECT source, n,
                     least(1.0, 0.5 * tot.nn * pow(n, $mixtureAlpha) / tot.z / n) AS keep
              FROM src CROSS JOIN tot),
    sel AS (SELECT d.source,
                   count(1) AS n_docs,
                   count(1) FILTER (WHERE
                     cast(conv(substr(md5(d.text), 1, 8), 16, 10) AS bigint) % 1000000
                       / 1000000.0 < r.keep) AS n_sel
            FROM documents d JOIN rates r ON d.source = r.source
            GROUP BY d.source)
    SELECT s.source, s.n_docs, round(r.keep, 6) AS keep_rate, s.n_sel
    FROM sel s JOIN rates r ON s.source = r.source
    ORDER BY s.source"""

  private[queries] lazy val temperatureMixtureOracle = s"""
    WITH src AS (SELECT source, count(1)::DOUBLE AS n FROM documents GROUP BY source),
    tot AS (SELECT sum(pow(n, $mixtureAlpha)) AS z, sum(n) AS nn FROM src),
    rates AS (SELECT source, n,
                     least(1.0, 0.5 * tot.nn * pow(n, $mixtureAlpha) / tot.z / n) AS keep
              FROM src CROSS JOIN tot),
    sel AS (SELECT d.source,
                   count(1) AS n_docs,
                   count(1) FILTER (
                     ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 1000000
                       / 1000000.0 < r.keep) AS n_sel
            FROM documents d JOIN rates r ON d.source = r.source
            GROUP BY d.source)
    SELECT s.source, s.n_docs, round(r.keep, 6) AS keep_rate, s.n_sel
    FROM sel s JOIN rates r ON s.source = r.source
    ORDER BY s.source"""
}
