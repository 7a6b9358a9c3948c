package graft.kql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Parser fuzz: random KQL pipelines, each op carrying BOTH its text form
  * and the DataFrame transform it must equal. Catches precedence,
  * associativity, and aliasing bugs a hand-picked example suite misses. */
class KqlCompilerPropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  // now() is injected (Kusto fixes it per query) so datetime arms are
  // deterministic; tstamp walks hourly from June 1 00:00, 36h before now
  private val fixedNow = java.time.Instant.parse("2024-06-02T12:00:00Z")
  private val epoch = java.time.Instant.parse("2024-06-01T00:00:00Z")
  private lazy val base = {
    import spark.implicits._
    (0L until 40L).map(i =>
        (i, Seq("alpha", "beta", "gamma")(i.toInt % 3), (i * 7 % 100).toDouble,
          if (i % 4 == 0) s"err-$i" else "ok", s"""{"k": ${i % 9}}""",
          java.sql.Timestamp.from(epoch.plusSeconds(i * 3600))))
      .toDF("id", "name", "value", "status", "props", "tstamp")
  }
  private lazy val dims = {
    import spark.implicits._
    (0L until 40L by 3).toDF("id")
  }
  private val resolve: String => DataFrame =
    { case "t" => base; case "dims" => dims }

  /** One op = (KQL text, equivalent DataFrame transform). All ops preserve
    * the column set, so they compose in any order. */
  private type Op = (String, DataFrame => DataFrame)
  private val wheres: Seq[Op] = Seq(
    ("where value >= 30", _.filter(col("value") >= 30)),
    ("where name == 'alpha' or value < 20", df => df.filter(col("name") === "alpha" || col("value") < 20)),
    ("where status startswith 'err' and value > 10", df => df.filter(col("status").startsWith("err") && col("value") > 10)),
    ("where value between (10 .. 60)", df => df.filter(col("value") >= 10 && col("value") <= 60)),
    ("where name in ('beta', 'gamma')", _.filter(col("name").isin("beta", "gamma"))),
    ("where not(name == 'beta') and value * 2 < 150", df => df.filter(!(col("name") === "beta") && col("value") * 2 < 150)),
    ("where value % 10 + 1 > 5", df => df.filter(col("value") % 10 + 1 > 5)),
    ("where status has_any ('err', 'retry') or value >= 60",
      df => df.filter(regexp_like(col("status"), lit("(?i)\\berr\\b")) ||
        regexp_like(col("status"), lit("(?i)\\bretry\\b")) || col("value") >= 60)),
    ("where substring(status, 0, 2) =~ 'OK' or name endswith 'MA'",
      df => df.filter(lower(col("status").substr(lit(1), lit(2))) === "ok" ||
        lower(col("name")).endsWith("ma"))))
  // datetime surface arms: ago/now/datetime literals, between, start-of-
  // period truncation, and the timespan algebra (datetime ± timespan,
  // datetime − datetime → micros) — all column-set-preserving filters
  private def tsLit(s: String) = lit(java.sql.Timestamp.from(java.time.Instant.parse(s)))
  private val dtWheres: Seq[Op] = Seq(
    ("where tstamp >= ago(12h)",
      df => df.filter(col("tstamp") >= lit(java.sql.Timestamp.from(fixedNow.minusSeconds(12 * 3600))))),
    ("where tstamp between (datetime(2024-06-01T05:00:00Z) .. datetime(2024-06-01T20:00:00Z))",
      df => df.filter(col("tstamp") >= tsLit("2024-06-01T05:00:00Z") &&
        col("tstamp") <= tsLit("2024-06-01T20:00:00Z"))),
    ("where startofday(tstamp) == datetime(2024-06-01)",
      df => df.filter(date_trunc("day", col("tstamp")) === tsLit("2024-06-01T00:00:00Z"))),
    ("where tstamp + 2h < now()",
      df => df.filter(timestamp_micros(unix_micros(col("tstamp")) + 7200000000L) <
        lit(java.sql.Timestamp.from(fixedNow)))),
    ("where now() - tstamp >= 18h",
      df => df.filter(lit(fixedNow.toEpochMilli * 1000L) - unix_micros(col("tstamp")) >=
        18L * 3600000000L)))
  // scalar-ring arms: indexof / min_of / extract, column-set-preserving
  private val scalarWheres: Seq[Op] = Seq(
    ("where indexof(status, 'err') == 0",
      df => df.filter((instr(col("status"), "err") - 1).cast("long") === 0)),
    ("where min_of(value, 50.0) < 40",
      df => df.filter(least(col("value"), lit(50.0)) < 40)),
    ("where strlen(extract('err-(\\\\d+)', 1, status)) > 0",
      df => df.filter(length(regexp_extract(col("status"), "err-(\\d+)", 1)) > 0)),
    ("where name !in ('beta', 'gamma')",
      df => df.filter(!col("name").isin("beta", "gamma"))),
    // operator-spelled string literals must parse as literals (regression
    // for the peekIs text-only bug)
    ("where status contains '-' or strcat(name, '+') endswith 'a+'",
      df => df.filter(lower(col("status")).contains("-") ||
        lower(concat(col("name"), lit("+"))).endsWith("a+"))),
    // tostring over a complex type lowers to to_json; over a scalar it is
    // a plain cast — both column-set-preserving via extend/project-away
    ("extend j0 = tostring(split(status, '-')) | where strlen(j0) > 2 | project-away j0",
      df => df.withColumn("j0",
          to_json(split(col("status"), java.util.regex.Pattern.quote("-"))))
        .filter(length(col("j0")) > 2).drop("j0")),
    ("extend s0 = tostring(value) | where strlen(s0) > 0 | project-away s0",
      df => df.withColumn("s0", col("value").cast("string"))
        .filter(length(col("s0")) > 0).drop("s0")),
    ("where strcmp(name, 'beta') != 0",
      df => df.filter(when(col("name") < "beta", lit(-1L))
        .when(col("name") > "beta", lit(1L)).otherwise(lit(0L)) =!= 0)),
    ("where strlen(trim_start('e', status)) >= 2",
      df => df.filter(length(regexp_replace(col("status"), "^(e)+", "")) >= 2)),
    ("where translate('aeiou', 'AEIOU', name) contains 'A' or value >= 50",
      df => df.filter(lower(translate(col("name"), "aeiou", "AEIOU")).contains("a") ||
        col("value") >= 50)),
    // ring-5 invariants: each filter is an identity/round-trip law that
    // must hold on EVERY row, so the op is column-set- and row-preserving
    ("where strlen(base64_decode_tostring(base64_encode_tostring(status))) == strlen(status)",
      df => df),
    ("where tostring(array_rotate_left(array_rotate_right(split(status, '-'), 1), 1)) == tostring(split(status, '-'))",
      df => df),
    ("where array_length(array_slice(pack_array(1, 2, 3, 4), 1, 2)) == 2",
      df => df),
    ("where jaccard_index(pack_array(id % 3), pack_array(id % 3)) == 1.0",
      df => df),
    ("where tostring(set_union(pack_array(id % 3), pack_array(id % 3))) == tostring(pack_array(id % 3))",
      df => df),
    ("where hash_sha256(name) != hash_md5(name)",
      df => df),
    // ring-6 invariants
    ("where binary_xor(id, 0) == id and binary_and(id, -1) == id",
      df => df),
    ("where binary_shift_right(binary_shift_left(id, 3), 3) == id",
      df => df),
    ("sample 999",
      df => df), // N ≥ rows: the full frame survives (order-insensitive compare)
    ("where bitset_count_ones(binary_or(id, id)) == bitset_count_ones(id)",
      df => df),
    ("where strcat_delim('-', name, status) == strcat(name, '-', status)",
      df => df),
    ("mv-apply c = split(status, '-') on ( where strlen(c) >= 3 | summarize zz = count() ) | where zz >= 1 | project-away zz",
      df => df.withColumn("zz",
          size(filter(split(col("status"), java.util.regex.Pattern.quote("-")),
            x => length(x).cast("long") >= 3)).cast("long"))
        .filter(col("zz") >= 1).drop("zz")))
  private def extendOp(k: Int): Op = (
    s"extend x$k = value * 2 - 1 | project-away x$k",
    df => df.withColumn(s"x$k", col("value") * 2 - 1).drop(s"x$k"))
  private val takes: Seq[Op] = Seq(
    ("order by id asc | take 7", _.orderBy(col("id").asc).limit(7)),
    ("top 5 by value, id asc", df => df.orderBy(col("value").desc, col("id").asc).limit(5)),
    ("order by value, id asc | take 11", df => df.orderBy(col("value").desc, col("id").asc).limit(11)))
  private val distincts: Seq[Op] = Seq(("distinct", _.distinct()))
  // column-set-preserving joins (semi/anti) and dynamic access, so they
  // compose anywhere in the pipeline like the other ops
  private lazy val joins: Seq[Op] = Seq(
    ("join kind=leftsemi (dims) on id", df => df.join(dims, Seq("id"), "left_semi")),
    ("join kind=leftanti (dims) on id", df => df.join(dims, Seq("id"), "left_anti")))
  private def dynOp(k: Int): Op = (
    s"extend d$k = tolong(parse_json(props).k) | where isnotnull(d$k) | project-away d$k",
    df => df.withColumn(s"d$k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col(s"d$k").isNotNull).drop(s"d$k"))

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.oneOf(wheres),
    3 -> Gen.oneOf(dtWheres),
    2 -> Gen.oneOf(scalarWheres),
    2 -> Gen.choose(0, 9).map(extendOp),
    2 -> Gen.oneOf(joins),
    1 -> Gen.choose(0, 9).map(dynOp),
    1 -> Gen.oneOf(distincts))

  test("random pipelines: compiled text ≡ direct DataFrame plan (120 cases)") {
    val pipelines = Gen.listOfN(120, for {
      ops <- Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, opGen))
      tail <- Gen.option(Gen.oneOf(takes)) // ordered limit last, if present
    } yield ops ++ tail.toList).pureApply(Gen.Parameters.default, Seed(2026L))

    pipelines.zipWithIndex.foreach { case (ops, i) =>
      val kql = ("t" +: ops.map(_._1)).mkString(" | ")
      val expected = ops.map(_._2).foldLeft(base)((d, f) => f(d))
      val got = KqlCompiler.compile(kql, resolve, fixedNow)
      val (e, g) = (expected.collect().map(_.toString).sorted.toSeq,
        got.collect().map(_.toString).sorted.toSeq)
      assert(g == e, s"pipeline #$i diverged: $kql")
    }
  }
}
