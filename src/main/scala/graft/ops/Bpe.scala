package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer: trainer + encoder — the
  * missing piece between the corpus-analytics queries (vocab, token
  * stats) and an actual training-data pipeline, which tokenizes with a
  * LEARNED subword vocabulary rather than whitespace.
  *
  * Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"): start from characters, repeatedly merge
  * the most frequent adjacent symbol pair; the ordered merge list IS the
  * tokenizer.
  *
  * Scale design (100 TB corpus):
  *  - Training never touches the corpus after round 0: it operates on
  *    the DISTINCT-WORD frequency table (`wordFreq` — one explode + one
  *    hash agg over the corpus, then a Zipf-compressed working set of
  *    |vocab| rows, millions at web scale, not billions).
  *  - Each round is one distributed pair-count aggregate over that small
  *    table + an O(1) driver fetch of the argmax pair (the same bounded
  *    driver-traffic pattern as [[KMeans]]' convergence checksum); the
  *    merge application is a narrow map. localCheckpoint per round
  *    truncates lineage so round N doesn't replay rounds 1..N-1.
  *  - Encoding broadcasts the merge list and runs mapPartitions — map
  *    only, zero shuffle, no per-row UDF in a Catalyst plan.
  *
  * Determinism: pair ties break (count desc, left asc, right asc), and
  * the encoder applies merges in rank order with leftmost-first
  * occurrence scanning — exactly the trainer's own replacement rule, so
  * encoding a training word reproduces its trained symbolization.
  */
object Bpe {

  /** Lowercase word extraction — the pre-tokenizer (kept SQL-expressible
    * so the round-1 oracle can reproduce it in DuckDB). */
  val WordPattern = "[a-z]+"

  /** (w, f): distinct-word frequencies — the working set every BPE round
    * operates on. One explode + one partial+final hash agg. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(s"regexp_extract_all(lower($textCol), '$WordPattern', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Round-1 adjacent-pair counts: with character symbols the pairs are
    * just 2-char substrings, which keeps this form SQL-expressible (the
    * q97 oracle mirrors it with range+substring in DuckDB). */
  def round1PairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val wf = wordFreq(docs, textCol).filter(length(col("w")) >= 2)
    wf.select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("f"))
      .groupBy("pair").agg(sum("f").as("cnt"))
  }

  final case class WordSyms(syms: Seq[String], f: Long)
  final case class Merge(rank: Int, left: String, right: String, merged: String)

  /** One left-to-right merge pass over a symbol sequence (overlapping
    * occurrences resolve leftmost-first — the canonical BPE rule). */
  def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val arr = syms.toIndexedSeq
    val n = arr.length
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      if (i + 1 < n && arr(i) == l && arr(i + 1) == r) { b += (l + r); i += 2 }
      else { b += arr(i); i += 1 }
    }
    b.result()
  }

  /** Train up to `k` merges; stops early when no pair occurs twice. */
  def train(docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words: Dataset[WordSyms] =
      wordFreq(docs, textCol).as[(String, Long)]
        .map { case (w, f) => WordSyms(w.map(_.toString), f) }
        .localCheckpoint()
    val merges = List.newBuilder[Merge]
    var round = 0
    var done = false
    while (round < k && !done) {
      val top = words
        .flatMap(ws => ws.syms.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1), ws.f)))
        .toDF("l", "r", "f")
        .groupBy("l", "r").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .head(1) // O(1) driver traffic: the argmax pair only
      if (top.isEmpty || top.head.getAs[Long]("cnt") < 2) done = true
      else {
        val l = top.head.getString(0)
        val r = top.head.getString(1)
        merges += Merge(round + 1, l, r, l + r)
        words = words.map(ws => WordSyms(mergeOnce(ws.syms, l, r), ws.f)).localCheckpoint()
      }
      round += 1
    }
    merges.result()
  }

  /** Encode one word by applying the trained merges in rank order —
    * provably the trainer's own symbolization for in-vocab words. */
  def encodeWord(w: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString)
    var i = 0
    while (i < merges.length && syms.length > 1) {
      val m = merges(i)
      syms = mergeOnce(syms, m.left, m.right)
      i += 1
    }
    syms
  }

  /** Tokenize: (doc_id, tokens) with the merge list broadcast —
    * mapPartitions, zero shuffle. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.sortBy(_.rank).toIndexedSeq)
    val re = WordPattern.r
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (id, text) =>
          val toks =
            if (text == null) Seq.empty[String]
            else re.findAllIn(text.toLowerCase).flatMap(w => encodeWord(w, ms)).toSeq
          (id, toks)
        }
      }
      .toDF(idCol, "tokens")
  }
}
