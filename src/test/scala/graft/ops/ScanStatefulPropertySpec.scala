package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property cross-check for the scan machines: randomly assembled
  * single- and two-step scans (predicates/assignments drawn from pools
  * that exercise live state references, captures, additive and
  * non-additive accumulators, output=none, with_match_id) run through
  * the FULL KQL path and are compared row-for-row against an
  * independent in-Scala reference interpreter of the pinned semantics
  * (promote > extend > new; predicates see the pre-consumption
  * snapshot, empty state ⇒ NULL; assignments see the post-move state
  * with pre-commit declared values; completion retires).
  *
  * Because the compiler routes the bare additive form to the windowed
  * scanRunning lowering and state-referencing forms to scanStateful,
  * the same simulator also proves the TWO LOWERINGS agree wherever
  * their domains overlap (e.g. `a = a + e` vs `a = s1.a + e`).
  * All arithmetic in the pools is IEEE-exact per-op with identical
  * operation order on both sides, so comparisons are bitwise. */
class ScanStatefulPropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val rnd = new scala.util.Random(0x5ca17e5L)
  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  // ---------------------------------------------------------- fixture
  private case class RowV(id: Long, grp: Long, v: Option[Double])
  private def genRows(n: Int): Seq[RowV] =
    (1 to n).map { i =>
      val v = if (rnd.nextDouble() < 0.15) None
              else Some(math.rint(rnd.nextDouble() * 100.0) / 10.0)
      RowV(i.toLong, rnd.nextInt(4).toLong, v)
    }
  private def toDf(rows: Seq[RowV]) = {
    import spark.implicits._
    rows.map(r => (r.id, r.grp, r.v)).toDF("id", "grp", "v")
  }

  // ------------------------------------------------ reference machine
  private case class StView(decl: Map[String, Option[Double]], cap: RowV)
  private case class SimStep(
      pred: (RowV, Int => Option[StView]) => Option[Boolean],
      assigns: Seq[(String, (RowV, Int => Option[StView]) => Option[Double])],
      emit: Boolean)

  private def simulate(rows: Seq[RowV], defaults: Map[String, Option[Double]],
                       steps: Seq[SimStep]): Seq[(Long, Map[String, Option[Double]], Long)] = {
    val n = steps.length
    val states = Array.fill[Option[(scala.collection.mutable.Map[String, Option[Double]], Long)]](n)(None)
    val caps = Array.fill[Option[RowV]](n)(None)
    var nextId = 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, Option[Double]], Long)]
    for (r <- rows) {
      def view(j: Int): Option[StView] =
        if (j < 0 || j >= n) None
        else states(j).map { case (d, _) => StView(d.toMap, caps(j).get) }
      var consumed = -1
      var completing = false
      var seq: (scala.collection.mutable.Map[String, Option[Double]], Long) = null
      var k = n - 1
      while (k >= 0 && consumed < 0) {
        if (steps(k).pred(r, view).contains(true)) {
          if (k > 0 && states(k - 1).isDefined) {
            seq = states(k - 1).get; states(k - 1) = None; caps(k - 1) = None
            states(k) = Some(seq); caps(k) = Some(r)
            consumed = k; completing = k == n - 1
          } else if (states(k).isDefined) {
            seq = states(k).get; caps(k) = Some(r); consumed = k
          } else if (k == 0) {
            seq = (scala.collection.mutable.Map(defaults.toSeq: _*), nextId)
            nextId += 1
            states(0) = Some(seq); caps(0) = Some(r); consumed = 0
          }
        }
        if (consumed < 0) k -= 1
      }
      if (consumed >= 0) {
        // post-move snapshot, pre-commit declared values; atomic commit
        val staged = steps(consumed).assigns.map { case (nm, f) => nm -> f(r, view) }
        staged.foreach { case (nm, value) => seq._1(nm) = value }
        if (steps(consumed).emit) out += ((r.id, seq._1.toMap, seq._2))
        if (completing && n > 1) { states(consumed) = None; caps(consumed) = None }
      }
    }
    out.toSeq
  }

  // ------------------------------------------------ expression pools
  // each pool entry carries the KQL fragment AND its simulator meaning
  private type Pred = (String, (RowV, Int => Option[StView]) => Option[Boolean])
  private type Assign = (String, (RowV, Int => Option[StView]) => Option[Double])

  private val singlePreds: Seq[Pred] = Seq(
    ("true", (_, _) => Some(true)),
    ("v > 5.0", (r, _) => r.v.map(_ > 5.0)),
    ("id % 2 == 1", (r, _) => Some(r.id % 2 == 1)),
    ("grp == 2", (r, _) => Some(r.grp == 2)))

  // declared `a` defaults to 1.5 and never goes null in these pools, so
  // the bare-additive (scanRunning) and qualified (scanStateful) forms
  // must agree exactly
  private def declA(st: Int => Option[StView]): Option[Double] =
    st(0).flatMap(_.decl("a"))
  private val singleAssigns: Seq[Assign] = Seq(
    ("a = coalesce(v, -1.0)", (r, _) => Some(r.v.getOrElse(-1.0))),
    ("a = a + todouble(id)", (r, st) => declA(st).map(_ + r.id.toDouble)),
    ("a = s1.a + todouble(id)", (r, st) => declA(st).map(_ + r.id.toDouble)),
    ("a = iff(todouble(id) > s1.a, todouble(id), s1.a)",
      (r, st) => declA(st).map(a => if (r.id.toDouble > a) r.id.toDouble else a)))

  private val s1Preds: Seq[Pred] = Seq(
    ("id % 2 == 1", (r, _) => Some(r.id % 2 == 1)),
    ("v > 3.0", (r, _) => r.v.map(_ > 3.0)),
    ("true", (_, _) => Some(true)))
  private val s1Assigns: Seq[Assign] = Seq(
    ("t = todouble(id)", (r, _) => Some(r.id.toDouble)),
    ("t = coalesce(v, 0.0)", (r, _) => Some(r.v.getOrElse(0.0))))
  private val s2Preds: Seq[Pred] = Seq(
    ("id % 2 == 0", (r, _) => Some(r.id % 2 == 0)),
    ("v > s1.v", (r, st) => for { sv <- st(0); cv <- sv.cap.v; rv <- r.v } yield rv > cv),
    ("grp == s1.grp", (r, st) => st(0).map(sv => r.grp == sv.cap.grp)),
    ("true", (_, _) => Some(true)))
  private val s2Assigns: Seq[Assign] = Seq(
    ("g = todouble(id) - s2.t",
      (r, st) => st(1).flatMap(_.decl("t")).map(r.id.toDouble - _)))

  // ------------------------------------------------------ the drives
  private def runKql(kql: String, rows: Seq[RowV]) =
    graft.kql.KqlCompiler.compile(kql, _ => toDf(rows))

  test("single-step scans agree with the reference machine (both lowerings)") {
    for (_ <- 0 until 24) {
      val rows = genRows(30 + rnd.nextInt(20))
      val (pk, pf) = pick(singlePreds)
      val (ak, af) = pick(singleAssigns)
      val withId = rnd.nextBoolean()
      val kql =
        s"""t
           | | order by id asc
           | | scan ${if (withId) "with_match_id=m " else ""}declare (a: real = 1.5) with (
           |     step s1: $pk => $ak;
           |   )
           | | project id, a${if (withId) ", m" else ""}""".stripMargin
      val got = runKql(kql, rows).collect().map { r =>
        (r.getLong(0),
         if (r.isNullAt(1)) None else Some(r.getDouble(1)),
         if (withId) r.getLong(2) else 1L)
      }.sortBy(_._1).toSeq
      val want = simulate(rows, Map("a" -> Some(1.5)),
          Seq(SimStep(pf, Seq("a" -> af), emit = true)))
        .map { case (id, d, m) => (id, d("a"), if (withId) m else 1L) }
        .sortBy(_._1)
      assert(got == want, s"mismatch for:\n$kql")
    }
  }

  test("two-step scans with state references agree with the reference machine") {
    for (_ <- 0 until 24) {
      val rows = genRows(30 + rnd.nextInt(20))
      val (p1k, p1f) = pick(s1Preds)
      val (a1k, a1f) = pick(s1Assigns)
      val (p2k, p2f) = pick(s2Preds)
      val useG = rnd.nextBoolean()
      val (g2k, g2f) = pick(s2Assigns)
      val s1None = rnd.nextInt(4) == 0
      val withId = rnd.nextBoolean()
      val kql =
        s"""t
           | | order by id asc
           | | scan ${if (withId) "with_match_id=m " else ""}declare (t: real = 0.0, g: real = -1.0) with (
           |     step s1${if (s1None) " output=none" else ""}: $p1k => $a1k;
           |     step s2: $p2k${if (useG) s" => $g2k" else ""};
           |   )
           | | project id, t, g${if (withId) ", m" else ""}""".stripMargin
      val got = runKql(kql, rows).collect().map { r =>
        (r.getLong(0),
         if (r.isNullAt(1)) None else Some(r.getDouble(1)),
         if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         if (withId) r.getLong(3) else 0L)
      }.sortBy(_._1).toSeq
      val steps = Seq(
        SimStep(p1f, Seq("t" -> a1f), emit = !s1None),
        SimStep(p2f, if (useG) Seq("g" -> g2f) else Nil, emit = true))
      val want = simulate(rows, Map("t" -> Some(0.0), "g" -> Some(-1.0)), steps)
        .map { case (id, d, m) => (id, d("t"), d("g"), if (withId) m else 0L) }
        .sortBy(_._1)
      assert(got == want, s"mismatch for:\n$kql")
    }
  }
}
