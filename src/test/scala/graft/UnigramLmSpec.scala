package graft

import graft.ops.UnigramLm
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer: pinned-spec invariants on a hand fixture
  * (the cross-engine EM/Viterbi values themselves are hash-gated by
  * q247/q248's full DuckDB replication — here we pin the structural
  * contract and the serving path). */
class UnigramLmSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val words = Seq(
    ("banana", 20L), ("bandana", 10L), ("ana", 8L), ("band", 6L), ("nab", 2L))

  test("trainLocal: deterministic, chars always kept, probabilities normalize") {
    val v1 = UnigramLm.trainLocal(words)
    val v2 = UnigramLm.trainLocal(words)
    assert(v1 == v2, "training must be bit-deterministic")
    val pieces = v1.map(_.piece).toSet
    for (c <- "bandn".map(_.toString)) assert(pieces(c), s"single char '$c' must survive")
    assert(v1.forall(_.logp < 0.0))
    val mass = v1.map(p => math.exp(p.logp)).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"probabilities must normalize, got $mass")
    // the dominant substring of the corpus must out-score a rare one
    val lp = v1.map(p => p.piece -> p.logp).toMap
    assert(lp("ana") > lp("nab"), "frequency order must survive EM")
  }

  test("segmentWord: pieces rebuild the word; OOV char is loudly None") {
    val vocab = UnigramLm.trainLocal(words).map(p => p.piece -> p.logp).toMap
    for ((w, _) <- words) {
      val seg = UnigramLm.segmentWord(w, vocab)
      assert(seg.isDefined, s"training word '$w' must segment")
      assert(seg.get.mkString("") == w, s"pieces must concatenate to '$w'")
      assert(seg.get.forall(vocab.contains))
    }
    assert(UnigramLm.segmentWord("xyz", vocab).isEmpty, "OOV char segments to None")
  }

  test("distributed segment() agrees with the local Viterbi per word") {
    import spark.implicits._
    val vocab = UnigramLm.trainLocal(words)
    val vmap = vocab.map(p => p.piece -> p.logp).toMap
    val df = words.map(_._1).toDF("w")
    val got = UnigramLm.segment(df, "w", vocab)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for ((w, _) <- words)
      assert(got(w) == UnigramLm.segmentWord(w, vmap).get, s"mismatch on '$w'")
  }

  test("segment(): a null word yields a null pieces row, not a job-failing NPE") {
    import spark.implicits._
    val vocab = UnigramLm.trainLocal(words)
    val df = Seq(Option(words.head._1), None).toDF("w")
    val rows = UnigramLm.segment(df, "w", vocab).collect()
    assert(rows.length == 2)
    val byWord = rows.map(r => Option(r.getString(0)) -> r).toMap
    assert(byWord(Some(words.head._1)).getSeq[String](1).nonEmpty)
    assert(byWord(None).isNullAt(1), "null word must map to null pieces")
  }
}
