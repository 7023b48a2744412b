package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MatchRecognize
import graft.streaming.MatchRecognize.{SkipPastLastRow, SkipToNextRow}

class MatchRecognizeSpec extends AnyFunSuite {
  lazy val spark = graft.TestSession.spark
  import spark.implicits._

  private def rows(vals: (Int, Int, Double)*) =
    vals.toDF("k", "seq", "v")

  private def matched(df: org.apache.spark.sql.DataFrame) =
    df.select("seq", "mr_match", "mr_var").as[(Int, Long, String)]
      .collect().sortBy(_._1).toSeq

  test("A B+ matches greedy runs with skip-past-last") {
    val df = rows((1, 1, 9.0), (1, 2, 1.0), (1, 3, 1.0), (1, 4, 9.0),
                  (1, 5, 1.0), (1, 6, 9.0))
    val out = MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "A B+",
      Seq("A" -> (col("v") > 5), "B" -> (col("v") <= 5)))
    // match 1 = rows 1-3 (A + greedy B B); match 2 = rows 4-5; row 6 has
    // no following B so it never starts a match.
    assert(matched(out) == Seq((1, 1L, "A"), (2, 1L, "B"), (3, 1L, "B"),
                               (4, 2L, "A"), (5, 2L, "B")))
  }

  test("alternation and bounded quantifier") {
    val df = rows((1, 1, 9.0), (1, 2, 1.0), (1, 3, 2.0), (1, 4, 3.0))
    val out = MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "A B{2}",
      Seq("A" -> (col("v") > 5), "B" -> (col("v") <= 5)))
    // B{2} consumes exactly two rows; row 4 is left unmatched.
    assert(matched(out) == Seq((1, 1L, "A"), (2, 1L, "B"), (3, 1L, "B")))
  }

  test("skip-to-next-row allows overlapping starts") {
    val df = rows((1, 1, 1.0), (1, 2, 1.0), (1, 3, 1.0))
    val past = MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "C C",
      Seq("C" -> (col("v") <= 5)), skip = SkipPastLastRow)
    val next = MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "C C",
      Seq("C" -> (col("v") <= 5)), skip = SkipToNextRow)
    // past-last: rows 1-2 matched, row 3 has no partner -> 1 match;
    // to-next: matches start at rows 1 AND 2 -> 2 (overlapping) matches.
    assert(past.count() == 2 && next.count() == 4)
  }

  test("nullable body of unbounded quantifier terminates (epsilon cycle)") {
    val df = rows((1, 1, 1.0), (1, 2, 1.0), (1, 3, 9.0))
    // '(A?)+' and '(A*)*' form epsilon cycles in the NFA; the closure must
    // dedup Split/Jmp pcs instead of recursing forever.
    val out = MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "(A?)+",
      Seq("A" -> (col("v") <= 5)))
    // greedy: one match consuming the whole run of A rows
    assert(matched(out) == Seq((1, 1L, "A"), (2, 1L, "A")))
    val out2 = MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "(A*)* B",
      Seq("A" -> (col("v") <= 5), "B" -> (col("v") > 5)))
    assert(out2.count() == 3)
  }

  test("quantifier with max < min is rejected") {
    val df = rows((1, 1, 1.0))
    val ex = intercept[IllegalArgumentException] {
      MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "A{3,2}",
        Seq("A" -> (col("v") <= 5)))
    }
    assert(ex.getMessage.contains("max"))
  }

  test("oneRowPerMatch computes MEASURES per match") {
    val df = rows((1, 1, 9.0), (1, 2, 1.0), (1, 3, 2.0), (1, 4, 9.0),
                  (1, 5, 3.0))
    val out = MatchRecognize.oneRowPerMatch(
      df, Seq("k"), Seq("seq"), "A B+",
      define = Seq("A" -> (col("v") > 5), "B" -> (col("v") <= 5)),
      measures = Seq(
        "a_seq" -> MatchRecognize.Measures.firstOf("A", col("seq")),
        "last_b_seq" -> MatchRecognize.Measures.lastOf("B", col("seq")),
        "n_b" -> MatchRecognize.Measures.countOf("B"),
        "cls" -> MatchRecognize.Measures.classifier,
        "total_v" -> sum(col("v"))))
    val got = out.select("mr_match", "a_seq", "last_b_seq", "n_b", "cls", "total_v")
      .as[(Long, Int, Int, Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1, 3, 2L, "B", 12.0), (2L, 4, 5, 1L, "B", 12.0)))
  }

  test("partitions are independent and match ids restart per key") {
    val df = rows((1, 1, 9.0), (1, 2, 1.0), (2, 1, 9.0), (2, 2, 1.0))
    val out = MatchRecognize.annotate(df, Seq("k"), Seq("seq"), "A B",
      Seq("A" -> (col("v") > 5), "B" -> (col("v") <= 5)))
    val byKey = out.select("k", "mr_match").as[(Int, Long)].collect().toSet
    assert(byKey == Set((1, 1L), (2, 1L)))
  }
}
