package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer family: BPE (word + byte level) train/encode +
  * fertility audits, WordPiece, bigram language-model scoring.
  *
  * Pure code motion from the original single-file LlmQueries (round-14
  * maintainability split); wiring + oracle maps stay in [[LlmQueries]].
  */
private[queries] trait LlmTokenizerQueries extends LlmShared {

  /** q189 — WordPiece tokenizer (frequency vocab + greedy longest-match
    * inference): see [[graft.ops.WordPiece]] for the pinned spec and the
    * determinism rationale (greedy inference is integer-exact, which is
    * what lets a cross-engine oracle pin SEGMENTATIONS — the unigram-LM
    * EM alternative compares float log-prob sums mid-algorithm). The
    * oracle replicates vocab selection with the same integer ordering
    * and the greedy walk with a recursive CTE. */
  private[queries] def wordpieceQuery(s0: SparkSession, dir: String): DataFrame = {
    val s = docs(s0, dir)
    val words = s.sql(
      """SELECT x AS word, count(1) AS wf
         FROM (SELECT explode(split(text, ' ')) AS x FROM documents)
         GROUP BY x""")
    graft.ops.WordPiece.segmentWords(s, words, 24).orderBy("word")
  }

  private[queries] lazy val wordpieceOracle = """
    WITH RECURSIVE words AS (
      SELECT u.w AS word, CAST(count(1) AS BIGINT) AS wf
      FROM (SELECT string_split(text, ' ') AS t FROM documents), unnest(t) AS u(w)
      GROUP BY u.w),
    cand AS (
      SELECT (pp.p = 0) AS is_initial, substr(word, pp.p + 1, ll.l) AS piece,
             sum(wf) AS score
      FROM words,
           LATERAL (SELECT unnest(range(length(word))) AS p) pp,
           LATERAL (SELECT unnest(range(1, 1 + least(4, length(word) - pp.p))) AS l) ll
      GROUP BY 1, 2),
    vocab AS (
      SELECT is_initial, piece, length(piece) AS l FROM cand WHERE length(piece) = 1
      UNION ALL
      SELECT is_initial, piece, length(piece) FROM (
        SELECT is_initial, piece FROM cand WHERE length(piece) > 1
        ORDER BY score DESC, is_initial DESC, piece ASC LIMIT 24)),
    seg AS (
      SELECT word, wf, 0 AS pos, CAST('' AS VARCHAR) AS seg, CAST(0 AS BIGINT) AS np
      FROM words
      UNION ALL
      SELECT st.word, st.wf, st.pos + st.l,
             st.seg || CASE WHEN st.pos = 0 THEN '' ELSE ' ' END ||
               CASE WHEN st.pos = 0 THEN st.piece ELSE '##' || st.piece END,
             st.np + 1
      FROM (
        SELECT s.word, s.wf, s.pos, s.seg, s.np, max(v.l) AS l,
               substr(s.word, s.pos + 1, max(v.l)) AS piece
        FROM seg s JOIN vocab v
          ON v.is_initial = (s.pos = 0)
         AND v.piece = substr(s.word, s.pos + 1, v.l)
        WHERE s.pos < length(s.word)
        GROUP BY s.word, s.wf, s.pos, s.seg, s.np) st)
    SELECT word, wf, seg, np FROM seg WHERE pos = length(word) ORDER BY word"""

  // -------------------------------------------------- bigram LM scoring

  /** q79 — bigram-LM perplexity scoring, the classic corpus-quality
    * filter (CCNet/KenLM style: score each document under a language
    * model TRAINED ON THE CORPUS ITSELF; high perplexity = noise/outlier,
    * low = boilerplate). Model: add-one-smoothed bigram LM,
    * P(w2|w1) = (C(w1,w2)+1) / (C(w1·)+V), with a document-frequency
    * floor on the bigram table (count >= 2) — the standard pruning that
    * keeps the LM table O(head-of-Zipf) instead of O(corpus): singleton
    * bigrams back off to pure smoothing, exactly as a pruned KenLM does.
    *
    * Scale shape: the token-stream explode is inherent to LM scoring
    * (one row per bigram position); both model tables aggregate with
    * map-side combine (Zipf head absorbs there), and the scoring joins
    * are equi-joins on the context/bigram keys — the unigram table is
    * vocabulary-sized (broadcastable), the pruned bigram table shuffles
    * on its key at worst. Nothing is all-pairs, nothing driver-side. */
  private[queries] lazy val bigramLmSql = """
    WITH tok AS (
      SELECT doc_id, split(text, ' ') AS ws FROM documents),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM tok LATERAL VIEW explode(sequence(0, size(ws) - 2)) t AS i
      WHERE size(ws) >= 2),
    uni AS (SELECT w1 AS w, count(*) AS cu FROM big GROUP BY w1),
    bg AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2 HAVING count(*) >= 2),
    v AS (SELECT count(*) AS vs FROM uni),
    sc AS (
      SELECT b.doc_id,
             avg(-ln((coalesce(g.cb, 0) + 1) / (u.cu + v.vs))) AS nll
      FROM big b
      JOIN uni u ON b.w1 = u.w
      LEFT JOIN bg g ON b.w1 = g.w1 AND b.w2 = g.w2
      CROSS JOIN v
      GROUP BY b.doc_id)
    SELECT doc_id, round(nll, 6) AS nll, round(exp(nll), 6) AS ppl
    FROM sc ORDER BY doc_id"""

  private[queries] lazy val bigramLmOracle = """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM tok, unnest(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2),
    uni AS (SELECT w1 AS w, count(*) AS cu FROM big GROUP BY w1),
    bg AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2 HAVING count(*) >= 2),
    v AS (SELECT count(*) AS vs FROM uni),
    sc AS (
      SELECT b.doc_id,
             avg(-ln((coalesce(g.cb, 0) + 1) / (u.cu + v.vs))) AS nll
      FROM big b
      JOIN uni u ON b.w1 = u.w
      LEFT JOIN bg g ON b.w1 = g.w1 AND b.w2 = g.w2
      CROSS JOIN v
      GROUP BY b.doc_id)
    SELECT doc_id, round(nll, 6) AS nll, round(exp(nll), 6) AS ppl
    FROM sc ORDER BY doc_id"""

  // ------------------------------------------------------- BPE tokenizer

  /** q97/q98/q99 — distributed BPE tokenizer over `documents`
    * ([[graft.ops.Bpe]]). q97 (round-1 pair counts) is SQL-expressible
    * directly; q98 (the trained merge list) and q99 (tokenized output)
    * are iterative-training results — their oracles unroll the
    * [[BpeMerges]] merge rounds as chained DuckDB CTEs (exactly the way
    * the q111 pagerank oracle unrolls its power iterations), so the full
    * train + encode path is cross-engine hash-gated; BpeSpec additionally
    * pins the merge sequence on a hand-computed fixture. */
  private[queries] lazy val BpeMerges = 12

  private[queries] def bpePairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.round1PairCounts(Tables.documents(s, dir), "text")
      .orderBy(col("cnt").desc, col("pair").asc).limit(20)

  private[queries] def bpeVocab(s: SparkSession, dir: String): DataFrame = {
    val merges = graft.ops.Bpe.train(Tables.documents(s, dir), "text", BpeMerges)
    import s.implicits._
    merges.toDF().orderBy(col("rank").asc)
  }

  private[queries] def bpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val merges = graft.ops.Bpe.train(d, "text", BpeMerges)
    graft.ops.Bpe.tokenize(d, "doc_id", "text", merges)
      .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"),
        to_json(slice(col("tokens"), 1, 8)).as("head_tokens"))
      .orderBy(col("doc_id").asc)
  }

  /** The q98/q99 oracle core: one CTE chain per BPE merge round.
    *
    * Representation: each word's symbol sequence is a string of
    * individually-bracketed symbols (`hello` → `<h><e><l><l><o>`).
    * Brackets cannot occur inside a symbol (symbols are `[a-z]+`
    * fragments), so (a) adjacent-pair extraction is an exact split on
    * `><`, and (b) applying a merge is a plain non-overlapping
    * left-to-right `replace('<l><r>', '<lr>')` — which is precisely
    * [[graft.ops.Bpe.mergeOnce]]'s leftmost-first rule (a shared
    * delimiter scheme like space-joining would double-consume the
    * separator between back-to-back occurrences and diverge).
    *
    * `MATERIALIZED` is load-bearing: each round references the previous
    * one twice (argmax + rewrite), so inlined CTEs would re-evaluate the
    * chain 2^k times.
    *
    * The trainer stops early when no pair occurs twice; the unrolled
    * oracle cannot, so [[BpeMerges]] must complete on the gate corpus —
    * it does at every driver sf (the distinct-word table is far past 12
    * productive merges even at sf0.001). */
  private[queries] def bpeRounds(k: Int): Seq[String] = (1 to k).map { n =>
    val p = n - 1
    s"""b$n AS MATERIALIZED (SELECT string_split(trim(s, '<>'), '><') AS ss, f FROM r$p),
    p$n AS (SELECT ss, f, unnest(range(1, len(ss))) AS i FROM b$n WHERE len(ss) >= 2),
    c$n AS (SELECT ss[i] AS l, ss[i+1] AS r, sum(f)::BIGINT AS cnt FROM p$n GROUP BY 1, 2),
    m$n AS MATERIALIZED (SELECT l, r FROM c$n ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    r$n AS MATERIALIZED (
      SELECT w, replace(s, '<'||m.l||'><'||m.r||'>', '<'||m.l||m.r||'>') AS s, f FROM r$p, m$n m)"""
  }

  private[queries] def bpeMergeCtes(k: Int): String = {
    val header = s"""words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents),
    wf AS (SELECT w, count(*)::BIGINT AS f FROM words GROUP BY w),
    r0 AS MATERIALIZED (
      SELECT w, '<' || array_to_string(string_split(w, ''), '><') || '>' AS s, f FROM wf)"""
    (header +: bpeRounds(k)).mkString(",\n    ")
  }

  /** Byte-level variant of [[bpeMergeCtes]]: GPT-2-style pretokens (the
    * SAME RE2 pattern the engine uses — lookahead-free by design), space
    * byte mapped to 'Ġ' exactly as [[graft.ops.Bpe.ByteToChar]] maps byte
    * 0x20. Valid for this ASCII single-space corpus, where byte == char
    * and 'Ġ' is the only remapped symbol; the general byte fallback
    * (multi-byte UTF-8) is pinned in BpeSpec's golden tests instead. The
    * bracket scheme carries over unchanged — the mapped alphabet (a-z,
    * digits, punctuation-minus-angle-brackets, 'Ġ') never contains '<'
    * or '>'. */
  private[queries] def byteBpeMergeCtes(k: Int): String = {
    val pat = graft.ops.Bpe.BytePretokenPattern.replace("'", "''")
    val header = s"""words AS (
      SELECT unnest(regexp_extract_all(lower(text), '$pat')) AS w FROM documents),
    wf AS (SELECT w, count(*)::BIGINT AS f FROM words GROUP BY w),
    r0 AS MATERIALIZED (
      SELECT w, '<' || array_to_string(string_split(replace(w, ' ', 'Ġ'), ''), '><') || '>' AS s, f FROM wf)"""
    (header +: bpeRounds(k)).mkString(",\n    ")
  }

  private[queries] def bpeVocabOracle: String = {
    val k = BpeMerges
    val rows = (1 to k).map(n =>
      s"""SELECT $n::INTEGER AS "rank", l AS "left", r AS "right", l||r AS merged FROM m$n""")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeMergeCtes(k)}
    SELECT * FROM ($rows) ORDER BY "rank" """
  }

  /** q119 — tokenizer fertility audit: per-language tokens-per-word and
    * chars-per-token of the trained BPE. Fertility is THE health metric
    * for a subword vocabulary on multilingual corpora (a language
    * averaging ≫1.5 tokens/word is under-served by the merge table and
    * will train/infer proportionally slower). Same scale shape as q99:
    * training on the Zipf-compressed word table, encoding map-only with
    * broadcast merges, then ONE per-language agg; docs with no [a-z]
    * words are excluded on both sides. */
  private[queries] def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val merges = graft.ops.Bpe.train(d, "text", BpeMerges)
    val tk = graft.ops.Bpe.tokenize(d, "doc_id", "text", merges)
    d.select(col("doc_id"), col("lang"),
        expr(s"regexp_extract_all(lower(text), '${graft.ops.Bpe.WordPattern}', 0)").as("ws"))
      .where(size(col("ws")) > 0)
      .join(tk, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("tokens")).cast("long")).as("toks"),
        sum(size(col("ws")).cast("long")).as("words"),
        sum(expr("aggregate(ws, 0L, (a, x) -> a + length(x))")).as("chars"))
      .select(col("lang"), col("n_docs"),
        round(col("toks") / col("words"), 6).as("tok_per_word"),
        round(col("chars") / col("toks"), 6).as("chars_per_tok"))
      .orderBy(col("lang"))
  }

  private[queries] def bpeFertilityOracle: String = {
    val k = BpeMerges
    s"""WITH ${bpeMergeCtes(k)},
    enc AS MATERIALIZED (
      SELECT w, len(string_split(trim(s, '<>'), '><'))::BIGINT AS nt FROM r$k),
    dw AS (
      SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents),
    j AS (SELECT dw.doc_id, dw.lang, enc.nt, length(dw.w)::BIGINT AS wc
          FROM dw JOIN enc USING (w)),
    agg AS (
      SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs,
             sum(nt)::BIGINT AS toks, count(*)::BIGINT AS words,
             sum(wc)::BIGINT AS chars
      FROM j GROUP BY lang)
    SELECT lang, n_docs,
           round(toks / words::DOUBLE, 6) AS tok_per_word,
           round(chars / toks::DOUBLE, 6) AS chars_per_tok
    FROM agg ORDER BY lang"""
  }

  /** q134 — byte-level BPE fertility: the q119 audit re-run over the
    * GPT-2-style byte-level tokenizer ([[graft.ops.Bpe.trainByteLevel]]):
    * pretokens keep their leading space (so ' the' and 'the' learn
    * separate merges — the GPT-2 word-boundary trick), base symbols are
    * mapped BYTES, and fertility is tokens-per-pretoken / chars-per-token
    * per language. Same scale shape as q119: train on the distinct-
    * pretoken table, broadcast merges, mapPartitions encode, ONE agg. */
  private[queries] def byteBpeFertility(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val merges = graft.ops.Bpe.trainByteLevel(d, "text", BpeMerges)
    val tk = graft.ops.Bpe.tokenizeByteLevel(d, "doc_id", "text", merges)
    val sqlPat = graft.ops.Bpe.BytePretokenPattern
      .replace("\\", "\\\\").replace("'", "\\'")
    d.select(col("doc_id"), col("lang"),
        expr(s"regexp_extract_all(lower(text), '$sqlPat', 0)").as("ws"))
      .where(size(col("ws")) > 0)
      .join(tk, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("tokens")).cast("long")).as("toks"),
        sum(size(col("ws")).cast("long")).as("pretoks"),
        sum(expr("aggregate(ws, 0L, (a, x) -> a + length(x))")).as("chars"))
      .select(col("lang"), col("n_docs"),
        round(col("toks") / col("pretoks"), 6).as("tok_per_pretok"),
        round(col("chars") / col("toks"), 6).as("chars_per_tok"))
      .orderBy(col("lang"))
  }

  /** q240: the byte-level round trip — decode(tokenize(text)) must equal
    * the pretoken concatenation EXACTLY for every document (the BPE
    * layer is a total inverse; Bpe.decodeByteLevel Scaladoc has the
    * argument). cover_ok additionally reports whether the pretokenizer
    * covered the whole text (the pinned pattern drops non-contraction
    * apostrophes, so coverage is data, not an invariant) — the oracle
    * recomputes it with the same regex in DuckDB. */
  private[queries] def byteBpeRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).where(col("doc_id") % 3 === 0)
    val merges = graft.ops.Bpe.trainByteLevel(d, "text", BpeMerges)
    val tk = graft.ops.Bpe.tokenizeByteLevel(d, "doc_id", "text", merges)
    val dec = graft.ops.Bpe.detokenizeByteLevel(tk, "doc_id", "tokens")
    val sqlPat = graft.ops.Bpe.BytePretokenPattern
      .replace("\\", "\\\\").replace("'", "\\'")
    d.select(col("doc_id"), lower(col("text")).as("lt"),
        expr(s"regexp_extract_all(lower(text), '$sqlPat', 0)").as("ws"))
      .join(dec, "doc_id")
      .select(col("doc_id"),
        length(col("lt")).cast("long").as("n_chars"),
        (col("decoded") === array_join(col("ws"), "")).as("rt_ok"),
        (array_join(col("ws"), "") === col("lt")).as("cover_ok"))
      .orderBy(col("doc_id"))
  }

  private[queries] def byteBpeRoundTripOracle: String = {
    val pat = graft.ops.Bpe.BytePretokenPattern.replace("'", "''")
    s"""SELECT doc_id, length(lower(text))::BIGINT AS n_chars,
              true AS rt_ok,
              array_to_string(regexp_extract_all(lower(text), '$pat'), '') = lower(text) AS cover_ok
       FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id"""
  }

  private[queries] def byteBpeFertilityOracle: String = {
    val k = BpeMerges
    val pat = graft.ops.Bpe.BytePretokenPattern.replace("'", "''")
    s"""WITH ${byteBpeMergeCtes(k)},
    enc AS MATERIALIZED (
      SELECT w, len(string_split(trim(s, '<>'), '><'))::BIGINT AS nt FROM r$k),
    dw AS (
      SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '$pat')) AS w
      FROM documents),
    j AS (SELECT dw.doc_id, dw.lang, enc.nt, length(dw.w)::BIGINT AS wc
          FROM dw JOIN enc USING (w)),
    agg AS (
      SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs,
             sum(nt)::BIGINT AS toks, count(*)::BIGINT AS pretoks,
             sum(wc)::BIGINT AS chars
      FROM j GROUP BY lang)
    SELECT lang, n_docs,
           round(toks / pretoks::DOUBLE, 6) AS tok_per_pretok,
           round(chars / toks::DOUBLE, 6) AS chars_per_tok
    FROM agg ORDER BY lang"""
  }

  /** q99 oracle: r<k> already holds every distinct training word's final
    * symbolization (encoding a training word with the merge list
    * reproduces exactly that — the trainer's own rewrite), so the encode
    * table is just a split of r<k>; per-document output re-assembles the
    * word sequence in order and flattens. */
  private[queries] def bpeTokenizeOracle: String = {
    val k = BpeMerges
    s"""WITH ${bpeMergeCtes(k)},
    enc AS MATERIALIZED (SELECT w, string_split(trim(s, '<>'), '><') AS toks FROM r$k),
    dwb AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
    dwp AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM dwb WHERE len(ws) >= 1),
    dw AS (SELECT doc_id, i, ws[i] AS w FROM dwp),
    dt AS (SELECT dw.doc_id, dw.i, enc.toks FROM dw JOIN enc USING (w)),
    ag AS (SELECT doc_id, flatten(list(toks ORDER BY i)) AS all_toks FROM dt GROUP BY doc_id)
    SELECT d.doc_id, coalesce(len(a.all_toks), 0)::BIGINT AS n_tokens,
           to_json(coalesce(a.all_toks[1:8], []::VARCHAR[])) AS head_tokens
    FROM documents d LEFT JOIN ag a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id"""
  }

  // ---------------- unigram LM (SentencePiece-style) ----------------

  /** q247 — unigram-LM vocabulary: the trained top-30 pieces with their
    * published 6dp log-probs (graft.ops.UnigramLm pins the full spec:
    * top-4000 word stats, 512-piece seed, 2 EM iterations, prune to 256
    * on 6dp-rounded expected counts, one final iteration). The oracle
    * replicates the ENTIRE training — seed selection on exact integer
    * weights, three unrolled forward/backward EM passes, the rounded
    * prune cut — in generated DuckDB SQL. */
  private[queries] def unigramVocabQuery(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val vocab = graft.ops.UnigramLm.train(d, "text")
    val top = vocab.sortBy(p => (-p.logp, p.piece)).take(30).zipWithIndex
      .map { case (p, i) => (i + 1L, p.piece, p.logp) }
    import s.implicits._
    top.toDF("rnk", "piece", "lp").orderBy("rnk")
  }

  /** q248 — unigram-LM Viterbi segmentation of EVERY training word
    * (the gate corpus's Zipf vocabulary is small, so full coverage is
    * cheap): pieces joined with '|', plus the piece count. Decisions
    * ride the published 6dp log-probs with the pinned longer-piece
    * tie-break, so the oracle's unrolled DP reproduces segmentations
    * exactly. */
  private[queries] def unigramSegmentQuery(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val vocab = graft.ops.UnigramLm.train(d, "text")
    val sample = graft.ops.UnigramLm.wordCounts(d, "text")
      .orderBy(col("f").desc, col("w").asc).limit(graft.ops.UnigramLm.TrainWords)
      .select("w")
    graft.ops.UnigramLm.segment(sample, "w", vocab)
      .select(col("w"), concat_ws("|", col("pieces")).as("seg"),
        size(col("pieces")).cast("long").as("np"))
      .orderBy("w")
  }

  /** One forward/backward EM pass under vocabulary CTE `v$it` →
    * expected counts `e$it`. Positions are unrolled (word length ≤ 24,
    * pieces ≤ 4 chars); float sum order differs from the engine but
    * every downstream DECISION is on 6dp-rounded quantities. */
  private def unigramEmPass(it: Int): String = {
    val maxLen = graft.ops.UnigramLm.MaxWordLen
    val fwd = (1 to maxLen).map { i =>
      val branches = (1 to 4).filter(_ <= i).map { k =>
        s"""SELECT p.w, p.f, p.a * v.p AS ap
            FROM f${it}_${i - k} p JOIN v$it v ON v.piece = substr(p.w, ${i - k + 1}, $k)
            WHERE length(p.w) >= $i"""
      }.mkString(" UNION ALL ")
      s"""f${it}_$i AS MATERIALIZED (
            SELECT w, f, sum(ap) AS a FROM ($branches) GROUP BY w, f)"""
    }
    val bwd = (maxLen - 1) to 0 by -1 map { j =>
      val branches = (1 to 4).filter(_ + j <= maxLen).map { k =>
        s"""SELECT q.w, q.f, v.p * q.b AS pb
            FROM b${it}_${j + k} q JOIN v$it v ON v.piece = substr(q.w, ${j + 1}, $k)
            WHERE length(q.w) > $j"""
      }.mkString(" UNION ALL ")
      s"""b${it}_$j AS MATERIALIZED (
            SELECT w, f, sum(pb) AS b FROM ($branches) GROUP BY w, f
            UNION ALL SELECT w, f, 1.0 AS b FROM tw WHERE length(w) = $j)"""
    }
    val fAll = (0 to maxLen).map(i => s"SELECT w, f, $i AS pos, a FROM f${it}_$i")
      .mkString(" UNION ALL ")
    val bAll = (0 to maxLen).map(i => s"SELECT w, $i AS pos, b FROM b${it}_$i")
      .mkString(" UNION ALL ")
    s"""f${it}_0 AS (SELECT w, f, 1.0 AS a FROM tw),
    b${it}_$maxLen AS (SELECT w, f, 1.0 AS b FROM tw WHERE length(w) = $maxLen),
    ${fwd.mkString(",\n    ")},
    ${bwd.mkString(",\n    ")},
    fall$it AS MATERIALIZED ($fAll),
    ball$it AS MATERIALIZED ($bAll),
    z$it AS (SELECT w, a AS z FROM fall$it WHERE pos = length(w)),
    occ$it AS (
      SELECT fa.w, fa.f, fa.pos, kk.k, substr(fa.w, fa.pos + 1, kk.k) AS piece, fa.a
      FROM fall$it fa, (VALUES (1), (2), (3), (4)) kk(k)
      WHERE fa.pos + kk.k <= length(fa.w)),
    e$it AS MATERIALIZED (
      SELECT o.piece, sum(o.f * o.a * v.p * bb.b / z.z) AS e
      FROM occ$it o
      JOIN v$it v ON v.piece = o.piece
      JOIN ball$it bb ON bb.w = o.w AND bb.pos = o.pos + o.k
      JOIN z$it z ON z.w = o.w
      GROUP BY o.piece)"""
  }

  /** The full training CTE chain: tw → seed (v1) → EM ×2 → prune →
    * v2 → EM → v3 (published 6dp log-probs). */
  private[queries] def unigramTrainCtes: String = {
    val U = graft.ops.UnigramLm
    s"""words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents),
    wcnt AS (SELECT w, count(*)::BIGINT AS f FROM words WHERE length(w) <= ${U.MaxWordLen}
             GROUP BY w),
    tw AS MATERIALIZED (
      SELECT w, f FROM wcnt ORDER BY f DESC, w ASC LIMIT ${U.TrainWords}),
    subs AS (
      SELECT substr(w, pp.p + 1, ll.l) AS piece, sum(f)::BIGINT AS wt
      FROM tw,
           LATERAL (SELECT unnest(range(length(w))) AS p) pp,
           LATERAL (SELECT unnest(range(1, 1 + least(${U.MaxPieceLen}, length(w) - pp.p))) AS l) ll
      GROUP BY 1),
    seed AS MATERIALIZED (
      SELECT piece, wt FROM subs WHERE length(piece) = 1
      UNION ALL
      SELECT piece, wt FROM (
        SELECT piece, wt, row_number() OVER (ORDER BY wt DESC, piece ASC) AS rn
        FROM subs WHERE length(piece) > 1)
      WHERE rn <= ${U.SeedSize} - (SELECT count(*) FROM subs WHERE length(piece) = 1)),
    v1 AS MATERIALIZED (
      SELECT piece, wt / (SELECT sum(wt)::DOUBLE FROM seed) AS p FROM seed),
    ${unigramEmPass(1)},
    v2 AS MATERIALIZED (
      SELECT piece, e / (SELECT sum(e) FROM e1) AS p FROM e1),
    ${unigramEmPass(2)},
    kept AS MATERIALIZED (
      SELECT piece, e FROM e2 WHERE length(piece) = 1
      UNION ALL
      SELECT piece, e FROM (
        SELECT piece, e, row_number() OVER (ORDER BY round(e, 6) DESC, piece ASC) AS rn
        FROM e2 WHERE length(piece) > 1)
      WHERE rn <= ${U.VocabSize} - (SELECT count(*) FROM e2 WHERE length(piece) = 1)),
    v3 AS MATERIALIZED (
      SELECT piece, e / (SELECT sum(e) FROM kept) AS p FROM kept),
    ${unigramEmPass(3)},
    vf AS MATERIALIZED (
      SELECT piece, round(ln(e / (SELECT sum(e) FROM e3)), 6) AS lp FROM e3)"""
  }

  private[queries] def unigramVocabOracle: String =
    s"""WITH ${unigramTrainCtes}
    SELECT row_number() OVER (ORDER BY lp DESC, piece ASC)::BIGINT AS rnk, piece, lp
    FROM (SELECT piece, lp FROM vf ORDER BY lp DESC, piece ASC LIMIT 30)
    ORDER BY rnk"""

  private[queries] def unigramSegmentOracle: String = {
    val U = graft.ops.UnigramLm
    val maxLen = U.MaxWordLen
    val stages = (1 to maxLen).map { i =>
      val branches = (1 to 4).filter(_ <= i).map { k =>
        s"""SELECT p.w, p.score + v.lp AS score, $k AS k,
                   p.seg || '|' || v.piece AS seg, p.np + 1 AS np
            FROM s${i - k} p JOIN vf v ON v.piece = substr(p.w, ${i - k + 1}, $k)
            WHERE length(p.w) >= $i"""
      }.mkString(" UNION ALL ")
      s"""s$i AS MATERIALIZED (
            SELECT w, score, seg, np FROM (
              SELECT c.*, row_number() OVER (PARTITION BY w ORDER BY score DESC, k DESC) AS rn
              FROM ($branches) c) WHERE rn = 1)"""
    }
    val finals = (1 to maxLen).map(i =>
      s"SELECT w, seg, np FROM s$i WHERE length(w) = $i").mkString(" UNION ALL ")
    s"""WITH ${unigramTrainCtes},
    s0 AS (SELECT w, 0.0::DOUBLE AS score, '' AS seg, 0::BIGINT AS np
           FROM tw),
    ${stages.mkString(",\n    ")}
    SELECT w, substr(seg, 2) AS seg, np FROM ($finals) ORDER BY w"""
  }

  private[queries] lazy val bpePairsOracle = """
    WITH words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents),
    wf AS (SELECT w, count(*) AS f FROM words GROUP BY w),
    pairs AS (
      SELECT substring(w, i, 2) AS pair, f
      FROM wf, unnest(range(1, length(w))) AS t(i)
      WHERE length(w) >= 2)
    SELECT pair, sum(f)::BIGINT AS cnt FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair ASC LIMIT 20"""
}
