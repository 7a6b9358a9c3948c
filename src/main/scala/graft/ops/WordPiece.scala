package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenizer: frequency-scored subword vocabulary +
  * greedy longest-match-first inference (the BERT tokenizer's inference
  * rule, Schuster & Nakajima 2012 / Devlin 2019) — the DETERMINISTIC
  * member of the tokenizer family next to the BPE trainers (`Bpe`):
  * greedy longest-match needs no float scores at inference time, so
  * segmentation is integer-exact and engine-independent (the unigram-LM
  * EM alternative compares float log-prob sums mid-algorithm, which no
  * cross-engine gate can pin — documented trade-off).
  *
  * Pinned spec (the DuckDB oracle replicates it with a recursive CTE):
  *  - trains on the DISTINCT-WORD frequency table (Zipf compression —
  *    the q97/Bpe stance: corpus size never enters the training join);
  *  - candidate pieces: every substring of length 1..MaxPieceLen, in
  *    two WordPiece position classes — word-initial (pos 0) vs
  *    continuation (pos > 0, rendered `##piece`); score = Σ word-freq
  *    per (class, piece) over all (overlapping) occurrences;
  *  - vocabulary: ALL single characters of both classes (guarantees
  *    greedy always matches) + the top-K multi-char pieces by
  *    (score DESC, initial-class first, piece ASC) — integer ordering,
  *    no ties possible;
  *  - inference: longest vocab piece of the position's class matching
  *    at the cursor; advance; repeat.
  *
  * Scale shape: candidate scoring is one explode + one hash agg over
  * the WORD table (vocab-sized, not corpus-sized); the vocabulary is
  * K+chars rows — a driver collect of the same class as Bpe's merge
  * list or KMeans' codebook — broadcast into a mapPartitions pass.
  * Nothing corpus-sized ever reaches the driver. */
object WordPiece {

  val MaxPieceLen = 4

  /** Greedy longest-match segmentation; both vocab sets contain every
    * single char observed in their class, so matching never fails on
    * words drawn from the training corpus. */
  def greedy(word: String, initial: Set[String], continuation: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val vocab = if (pos == 0) initial else continuation
      var l = math.min(MaxPieceLen, word.length - pos)
      while (l > 1 && !vocab.contains(word.substring(pos, pos + l))) l -= 1
      val p = word.substring(pos, pos + l)
      out += (if (pos == 0) p else "##" + p)
      pos += l
    }
    out.result()
  }

  /** (class, piece) scores over the word-frequency table:
    * one explode + one hash agg. Columns: is_initial, piece, score. */
  def pieceScores(words: DataFrame): DataFrame = {
    // words: (word, wf)
    words
      .select(col("word"), col("wf"),
        posexplode(expr(
          s"""flatten(transform(sequence(0, length(word) - 1), p ->
              transform(sequence(1, least($MaxPieceLen, length(word) - p)), l ->
                struct(p = 0 AS is_initial, substring(word, p + 1, l) AS piece))))""")))
      .select(col("word"), col("wf"),
        col("col.is_initial").as("is_initial"), col("col.piece").as("piece"))
      .groupBy("is_initial", "piece")
      .agg(sum("wf").as("score"))
  }

  /** Train vocabulary + segment every distinct word.
    * Output: (word, wf, seg, np) — seg is the space-joined piece list
    * with `##` continuation prefixes. */
  def segmentWords(spark: SparkSession, words: DataFrame, topK: Int): DataFrame = {
    import spark.implicits._
    val scores = pieceScores(words).persist()
    val singles = scores.where(length(col("piece")) === 1)
      .select("is_initial", "piece")
    val multis = scores.where(length(col("piece")) > 1)
      .orderBy(col("score").desc, col("is_initial").desc, col("piece").asc)
      .limit(topK)
      .select("is_initial", "piece")
    // vocab is K + observed-chars rows: the Bpe-merge-list-class driver
    // fetch, broadcast back for the map-only inference pass
    val vocab = singles.union(multis).as[(Boolean, String)].collect()
    scores.unpersist()
    val initial = vocab.collect { case (true, p) => p }.toSet
    val continuation = vocab.collect { case (false, p) => p }.toSet
    val bc = spark.sparkContext.broadcast((initial, continuation))
    words.select(col("word"), col("wf").cast("long")).as[(String, Long)]
      .mapPartitions { it =>
        val (ini, cont) = bc.value
        it.map { case (w, wf) =>
          val seg = greedy(w, ini, cont)
          (w, wf, seg.mkString(" "), seg.length.toLong)
        }
      }
      .toDF("word", "wf", "seg", "np")
  }
}
