package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Cep.{Pattern, SkipTo, Step}

/**
 * Variable-targeted after-match skip (SKIP TO FIRST/LAST), mirroring the
 * reference's expectations in
 * flink-cep/src/test/java/.../nfa/AfterMatchSkipITCase.java
 * (testSkipToFirst, testSkipToLast, testSkipToFirstAtStartPosition,
 * testSkipToFirst/LastNonExistentPosition[WithoutException]), plus the
 * SQL clause and greedy-vs-reluctant quantifier preference.
 */
class AfterMatchSkipSpec extends AnyFunSuite {
  lazy val spark = graft.TestSession.spark
  import spark.implicits._

  private def ids(ms: Seq[Seq[CEv]]): Seq[Seq[Long]] = ms.map(_.map(_.id))

  // reference testSkipToFirst: start{a}{2} next end{b}{2} over six rows
  // matching both — skip to FIRST end ⇒ [1,2,3,4], [3,4,5,6]
  test("skip to first: reference testSkipToFirst expectations") {
    val p = Pattern[CEv](Seq(
      Step[CEv]("start", _.kind.contains("a"), minTimes = 2, maxTimes = 2),
      Step[CEv]("end", _.kind.contains("b"), strict = true,
                minTimes = 2, maxTimes = 2)),
      withinMs = None, skipTo = Some(SkipTo("end", first = true)))
    val evs = (1 to 6).map(i => CEv(i, i * 10L, "ab")).toIndexedSeq
    assert(ids(Cep.matchAll(p, evs, (_: CEv).t))
      == Seq(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)))
  }

  // reference testSkipToLast: same pattern over seven rows — skip to
  // LAST end ⇒ [1,2,3,4], [4,5,6,7]
  test("skip to last: reference testSkipToLast expectations") {
    val p = Pattern[CEv](Seq(
      Step[CEv]("start", _.kind.contains("a"), minTimes = 2, maxTimes = 2),
      Step[CEv]("end", _.kind.contains("b"), strict = true,
                minTimes = 2, maxTimes = 2)),
      withinMs = None, skipTo = Some(SkipTo("end", first = false)))
    val evs = (1 to 7).map(i => CEv(i, i * 10L, "ab")).toIndexedSeq
    assert(ids(Cep.matchAll(p, evs, (_: CEv).t))
      == Seq(Seq(1L, 2L, 3L, 4L), Seq(4L, 5L, 6L, 7L)))
  }

  // reference testSkipToFirstAtStartPosition: skip target == the match's
  // own first row ⇒ no-skip fallback, both matches survive
  test("skip target at start position falls back to no skip") {
    val p = Pattern[CEv](Seq(
      Step[CEv]("b", _.kind.contains("b")),
      Step[CEv]("c", _.kind.contains("c"), strict = true)),
      withinMs = None, skipTo = Some(SkipTo("b", first = true)))
    val evs = IndexedSeq(
      CEv(1, 10, "ab1"), CEv(2, 20, "c1"), CEv(3, 30, "ab2"), CEv(4, 40, "c2"))
    assert(ids(Cep.matchAll(p, evs, (_: CEv).t)) == Seq(Seq(1L, 2L), Seq(3L, 4L)))
  }

  // reference MissedSkipTo: pattern a b*(strict) c, input [a, c] — the
  // skip variable binds no rows: default keeps the match and skips
  // nothing; throwOnMiss raises (testSkipToFirstNonExistentPosition[
  // WithoutException])
  test("skip variable matching no rows: no-skip default, throwOnMiss raises") {
    def p(thr: Boolean) = Pattern[CEv](Seq(
      Step[CEv]("a", _.kind.contains("a")),
      Step[CEv]("b", _.kind.contains("b"), strict = true,
                minTimes = 0, maxTimes = Cep.Unbounded),
      Step[CEv]("c", _.kind.contains("c"), strict = true)),
      withinMs = None,
      skipTo = Some(SkipTo("b", first = true, throwOnMiss = thr)))
    val evs = IndexedSeq(CEv(1, 10, "a"), CEv(4, 40, "c"))
    assert(ids(Cep.matchAll(p(thr = false), evs, (_: CEv).t)) == Seq(Seq(1L, 4L)))
    assertThrows[IllegalStateException] {
      Cep.matchAll(p(thr = true), evs, (_: CEv).t)
    }
  }

  // the same testSkipToFirst/testSkipToLast shapes through the Pike VM
  // (MATCH_RECOGNIZE engine) and its SQL front-end
  test("MATCH_RECOGNIZE SKIP TO FIRST/LAST: batch VM + SQL clause") {
    val df = (1 to 6).map(i => (1L, i.toLong, "ab")).toDF("k", "id", "s")
    def run(skip: MatchRecognize.Skip): Seq[(Long, Long)] =
      MatchRecognize.annotate(df, Seq("k"), Seq("id"),
          "S{2} E{2}",
          Seq("S" -> lit(true), "E" -> lit(true)), skip)
        .select(col("mr_match"), col("id"))
        .as[(Long, Long)].collect().toSeq.sorted
    assert(run(MatchRecognize.SkipToFirst("E"))
      == Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
             (2L, 3L), (2L, 4L), (2L, 5L), (2L, 6L)))
    val df7 = (1 to 7).map(i => (1L, i.toLong, "ab")).toDF("k", "id", "s")
    val gotLast = MatchRecognize.annotate(df7, Seq("k"), Seq("id"),
        "S{2} E{2}", Seq("S" -> lit(true), "E" -> lit(true)),
        MatchRecognize.SkipToLast("E"))
      .select(col("mr_match"), col("id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(gotLast == Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
                          (2L, 4L), (2L, 5L), (2L, 6L), (2L, 7L)))

    df.createOrReplaceTempView("skip_v")
    val sql = MatchRecognizeSql.sql(spark, """
      SELECT * FROM skip_v MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY id
        ALL ROWS PER MATCH
        AFTER MATCH SKIP TO FIRST E
        PATTERN (S{2} E{2})
        DEFINE S AS s = 'ab', E AS s = 'ab'
      )""")
      .select(col("mr_match"), col("id")).as[(Long, Long)]
      .collect().toSeq.sorted
    assert(sql == Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
                      (2L, 3L), (2L, 4L), (2L, 5L), (2L, 6L)))
  }

  // SQL mode is the reference's throwing mode: skipping to the match's
  // first row must raise instead of looping
  test("MATCH_RECOGNIZE SKIP TO FIRST of the start variable raises") {
    val df = (1 to 3).map(i => (1L, i.toLong)).toDF("k", "id")
    val ex = intercept[Exception] {
      MatchRecognize.annotate(df, Seq("k"), Seq("id"), "A B",
        Seq("A" -> lit(true), "B" -> lit(true)),
        MatchRecognize.SkipToFirst("A")).collect()
    }
    def rootChain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(rootChain(ex).exists(_.isInstanceOf[IllegalStateException]))
  }

  // reluctant quantifiers: A+? takes the minimal run where greedy A+
  // takes the maximal one (reference Quantifier greedy/reluctant,
  // MatchCodeGenerator) — same rows, different matches
  test("greedy vs reluctant quantifier produce different matches") {
    val df = (1 to 3).map(i => (1L, i.toLong)).toDF("k", "id")
    def vars(pattern: String): Seq[(Long, String)] =
      MatchRecognize.annotate(df, Seq("k"), Seq("id"), pattern,
          Seq("A" -> lit(true), "B" -> lit(true)),
          MatchRecognize.SkipPastLastRow)
        .select(col("id"), col("mr_var")).as[(Long, String)]
        .collect().toSeq.sorted
    // greedy: A A B over the three rows (B needs the last row)
    assert(vars("A+ B") == Seq((1L, "A"), (2L, "A"), (3L, "B")))
    // reluctant: minimal A — [A B] on rows 1-2, then no second match
    // (row 3 alone cannot satisfy A B)
    assert(vars("A+? B") == Seq((1L, "A"), (2L, "B")))
  }
}
