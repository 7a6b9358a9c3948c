package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer — the tokenizer
  * family's third member beside BPE and WordPiece (Kudo 2018,
  * "Subword Regularization": EM over a substring vocabulary, Viterbi
  * segmentation at serving).
  *
  * PINNED TRAINING SPEC (every choice fixed so a SQL oracle can
  * replicate decisions exactly; float drift between engines is absorbed
  * by making all DECISIONS on 6dp-rounded quantities — the q118/q155
  * rounded-cut playbook):
  *
  *  1. words: `[a-z]+` runs of lowered text, length ≤ 24; the TOP 4000
  *     by (count desc, word asc). The stats aggregate distributes; only
  *     the capped (word, count) table reaches the driver — the k-means
  *     codebook pattern, fixed bytes regardless of corpus size.
  *  2. seed vocabulary: every substring of length 1..4 of every
  *     training word, weighted by Σ word-count per occurrence position
  *     (exact longs); ALL single characters plus the top
  *     (512 − #chars) multi-character substrings by (weight desc,
  *     piece asc). p⁰(u) = w(u)/Σw.
  *  3. EM on the seed (probability-domain forward/backward per word,
  *     k ascending 1..4): iteration 1 → p₁ = E₁/ΣE₁; iteration 2 under
  *     p₁ → expected counts E₂.
  *  4. prune: keep ALL single characters plus the top (256 − #chars)
  *     multi-character pieces by (round(E₂, 6) desc, piece asc);
  *     p₂ = E₂ restricted to the kept set, renormalized.
  *  5. one final EM iteration under p₂ over the pruned vocabulary →
  *     p₃ = E₃/ΣE₃; published log-probability = round(ln p₃, 6).
  *
  * VITERBI (serving): best[i] = max over k = 1..4 of
  * best[i−k] + logp(w[i−k..i]) on the PUBLISHED 6dp log-probs; strictly
  * greater wins, an exact tie prefers the LONGER last piece. Training
  * words always segment (their characters are in the vocabulary);
  * segmenting a word with an out-of-vocabulary character returns null
  * (loud, never a silent wrong tokenization).
  *
  * Scale shape: stats and serving distribute (serving is a broadcast
  * vocab + per-row DP, the Bpe/WordPiece mapPartitions class); the EM
  * itself runs on the driver over the CAPPED 4000-word table — bounded
  * work and bytes, like every codebook loop in this repo. North-star
  * scope: the reference connector has no tokenizer surface.
  */
object UnigramLm {
  val MaxPieceLen = 4
  val MaxWordLen = 24
  val TrainWords = 4000
  val SeedSize = 512
  val VocabSize = 256

  final case class Piece(piece: String, logp: Double)

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** Distributed word stats: [a-z]+ runs of lowered text, ≤ 24 chars. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .where(length(col("w")) <= MaxWordLen)
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Train on the capped top-words table (collected: the codebook-class
    * bounded fetch). */
  def train(docs: DataFrame, textCol: String): Seq[Piece] = {
    val words = wordCounts(docs, textCol)
      .orderBy(col("f").desc, col("w").asc).limit(TrainWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainLocal(words)
  }

  /** The pinned EM: deterministic given the (word, count) list. */
  def trainLocal(words: Seq[(String, Long)]): Seq[Piece] = {
    // ---- seed weights (exact longs) ----
    val weight = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length;
         k <- 1 to math.min(MaxPieceLen, w.length - i)) {
      val p = w.substring(i, i + k)
      weight(p) = weight.getOrElse(p, 0L) + f
    }
    val chars = weight.keysIterator.filter(_.length == 1).toVector.sorted
    val multi = weight.keysIterator.filter(_.length > 1).toVector
      .sortBy(p => (-weight(p), p)).take(math.max(0, SeedSize - chars.size))
    val seed = (chars ++ multi)
    val wSum = seed.iterator.map(weight(_).toDouble).sum
    var probs: Map[String, Double] = seed.iterator.map(p => p -> weight(p) / wSum).toMap

    // ---- one E-step: expected piece counts under `v` ----
    def eStep(v: Map[String, Double]): scala.collection.mutable.LinkedHashMap[String, Double] = {
      val e = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      for ((w, f) <- words) {
        val n = w.length
        val alpha = new Array[Double](n + 1)
        alpha(0) = 1.0
        var i = 1
        while (i <= n) {
          var k = 1
          while (k <= math.min(MaxPieceLen, i)) {
            v.get(w.substring(i - k, i)) match {
              case Some(p) => alpha(i) += alpha(i - k) * p
              case None =>
            }
            k += 1
          }
          i += 1
        }
        val beta = new Array[Double](n + 1)
        beta(n) = 1.0
        i = n - 1
        while (i >= 0) {
          var k = 1
          while (k <= math.min(MaxPieceLen, n - i)) {
            v.get(w.substring(i, i + k)) match {
              case Some(p) => beta(i) += p * beta(i + k)
              case None =>
            }
            k += 1
          }
          i -= 1
        }
        val z = alpha(n)
        if (z > 0) {
          i = 0
          while (i < n) {
            var k = 1
            while (k <= math.min(MaxPieceLen, n - i)) {
              val piece = w.substring(i, i + k)
              v.get(piece) match {
                case Some(p) =>
                  e(piece) = e.getOrElse(piece, 0.0) + f * alpha(i) * p * beta(i + k) / z
                case None =>
              }
              k += 1
            }
            i += 1
          }
        }
      }
      e
    }
    def mStep(e: scala.collection.Map[String, Double]): Map[String, Double] = {
      val s = e.valuesIterator.sum
      e.iterator.map { case (p, c) => p -> c / s }.toMap
    }

    probs = mStep(eStep(probs)) // EM iteration 1
    val e2 = eStep(probs) // EM iteration 2 counts
    // ---- prune on 6dp-rounded expected counts ----
    val keepChars = probs.keysIterator.filter(_.length == 1).toVector.sorted
    val keepMulti = probs.keysIterator.filter(_.length > 1).toVector
      .sortBy(p => (-round6(e2.getOrElse(p, 0.0)), p))
      .take(math.max(0, VocabSize - keepChars.size))
    val kept = (keepChars ++ keepMulti).toSet
    probs = mStep(e2.filter { case (p, _) => kept(p) })
    // ---- final EM iteration on the pruned vocabulary ----
    val e3 = eStep(probs)
    val p3 = mStep(e3)
    p3.toSeq.map { case (p, pr) => Piece(p, round6(math.log(pr))) }
      .sortBy(x => (-x.logp, x.piece))
  }

  /** Pinned Viterbi on the published 6dp log-probs; null on an
    * out-of-vocabulary character (unsegmentable). */
  def segmentWord(w: String, vocab: Map[String, Double]): Option[Seq[String]] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val from = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var k = 1
      while (k <= math.min(MaxPieceLen, i)) {
        vocab.get(w.substring(i - k, i)) match {
          case Some(lp) if best(i - k) > Double.NegativeInfinity =>
            val sc = best(i - k) + lp
            if (sc > best(i) || (sc == best(i) && k > from(i))) {
              best(i) = sc; from(i) = k
            }
          case _ =>
        }
        k += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) None
    else {
      val out = List.newBuilder[String]
      val rev = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n
      while (pos > 0) { rev += w.substring(pos - from(pos), pos); pos -= from(pos) }
      out ++= rev.reverse
      Some(out.result())
    }
  }

  /** Distributed serving: segment a word column under a broadcast
    * vocabulary (the Bpe/WordPiece mapPartitions class — the DP is a
    * genuine per-row imperative loop). */
  def segment(wordsDf: DataFrame, wordCol: String, vocab: Seq[Piece]): DataFrame = {
    val spark = wordsDf.sparkSession
    val bc = spark.sparkContext.broadcast(vocab.map(p => p.piece -> p.logp).toMap)
    val outSchema = org.apache.spark.sql.types.StructType(
      wordsDf.schema.fields :+
        org.apache.spark.sql.types.StructField("pieces",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType), nullable = true))
    val idx = wordsDf.schema.fieldIndex(wordCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    wordsDf.mapPartitions { rows =>
      val v = bc.value
      rows.map { r =>
        // null word → null pieces row (the function's loudly-null OOV
        // contract), not an NPE that fails the whole job
        val w = if (r.isNullAt(idx)) null else r.getString(idx)
        val seg = if (w == null) null
                  else segmentWord(w, v).map(_.toArray).orNull
        Row.fromSeq(r.toSeq :+ seg)
      }
    }(enc)
  }
}
