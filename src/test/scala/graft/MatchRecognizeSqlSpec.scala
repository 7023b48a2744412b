package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{MatchRecognize, MatchRecognizeSql}

/** The SQL-string front-end must reproduce the Scala-API results for the
  * oracled q84 (ALL ROWS PER MATCH) and q87 (ONE ROW PER MATCH +
  * MEASURES) shapes, plus variable-scoped generic aggregates and
  * AFTER MATCH SKIP TO NEXT ROW. */
class MatchRecognizeSqlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private lazy val orders = {
    val o = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
              col("o_totalprice"))
    o.createOrReplaceTempView("orders_v")
    o
  }

  test("ALL ROWS PER MATCH evaluates MEASURES per row: RUNNING default, FINAL on request") {
    orders
    val got = MatchRecognizeSql.sql(spark, """
      SELECT * FROM orders_v MATCH_RECOGNIZE (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        MEASURES COUNT(*) AS k,
                 RUNNING SUM(o_totalprice) AS run_total,
                 FINAL COUNT(B.*) AS n_b,
                 CLASSIFIER() AS cls,
                 LAST(B.o_orderkey) AS last_b_so_far
        ALL ROWS PER MATCH
        PATTERN (A B+)
        DEFINE A AS A.o_totalprice > 100000,
               B AS B.o_totalprice <= 100000
      )""")
    // expectation: the annotate API + explicit running/final windows
    import org.apache.spark.sql.expressions.Window
    val ann = MatchRecognize.annotate(
      orders, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"), "A B+",
      Seq("A" -> (col("o_totalprice") > 100000),
          "B" -> (col("o_totalprice") <= 100000)))
    val wr = Window.partitionBy(col("o_custkey"), col("mr_match"))
      .orderBy(col("mr_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("o_custkey"), col("mr_match"))
      .orderBy(col("mr_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val exp = ann
      .withColumn("k", count(lit(1)).over(wr))
      .withColumn("run_total", sum(col("o_totalprice")).over(wr))
      .withColumn("n_b",
        count(when(col("mr_var") === "B", lit(1))).over(wf))
      .withColumn("cls", col("mr_var"))
      .withColumn("last_b_so_far",
        max_by(when(col("mr_var") === "B", col("o_orderkey")),
               when(col("mr_var") === "B", col("mr_seq"))).over(wr))
    val cols = Seq("o_custkey", "o_orderkey", "mr_match", "mr_seq",
                   "k", "run_total", "n_b", "cls", "last_b_so_far")
    val g = got.select(cols.map(col): _*)
    val e = exp.select(cols.map(col): _*)
    assert(g.count() > 0 && g.count() == e.count())
    assert(g.except(e).isEmpty && e.except(g).isEmpty)
    // RUNNING k at the first row of every match is 1; FINAL n_b constant
    // per match and ≥ 1
    assert(got.filter(col("mr_seq") === 0 && col("k") =!= 1).isEmpty)
    assert(got.filter(col("n_b") < 1).isEmpty)
  }

  test("duplicate ALL ROWS measure aliases reject instead of silently overwriting") {
    orders
    val e = intercept[IllegalArgumentException] {
      MatchRecognizeSql.sql(spark, """
        SELECT * FROM orders_v MATCH_RECOGNIZE (
          PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          MEASURES COUNT(*) AS k, FINAL SUM(o_totalprice) AS k
          ALL ROWS PER MATCH
          PATTERN (A B+)
          DEFINE A AS A.o_totalprice > 100000,
                 B AS B.o_totalprice <= 100000
        )""")
    }
    assert(e.getMessage.contains("collides"))
  }

  test("SQL ALL ROWS PER MATCH equals annotate API (q84 shape)") {
    orders
    val got = MatchRecognizeSql.sql(spark, """
      SELECT * FROM orders_v MATCH_RECOGNIZE (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ALL ROWS PER MATCH
        PATTERN (A B+)
        DEFINE A AS A.o_totalprice > 100000,
               B AS B.o_totalprice <= 100000
      )""")
      .select(col("o_custkey"), col("o_orderkey"), col("mr_match"), col("mr_var"))
    val exp = MatchRecognize.annotate(
        orders,
        partitionBy = Seq("o_custkey"),
        orderBy = Seq("o_orderdate", "o_orderkey"),
        pattern = "A B+",
        define = Seq(
          "A" -> (col("o_totalprice") > 100000),
          "B" -> (col("o_totalprice") <= 100000)))
      .select(col("o_custkey"), col("o_orderkey"), col("mr_match"), col("mr_var"))
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    assert(got.count() == exp.count())
  }

  test("SQL ONE ROW PER MATCH + MEASURES equals oneRowPerMatch API (q87 shape)") {
    orders
    val got = MatchRecognizeSql.sql(spark, """
      SELECT * FROM orders_v MATCH_RECOGNIZE (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        MEASURES FIRST(A.o_orderkey) AS a_key,
                 LAST(B.o_orderkey) AS last_b_key,
                 COUNT(B.*) AS n_b,
                 CLASSIFIER() AS cls,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS match_total
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+)
        DEFINE A AS A.o_totalprice > 100000,
               B AS B.o_totalprice <= 100000
      )""")
    val exp = MatchRecognize.oneRowPerMatch(
        orders,
        partitionBy = Seq("o_custkey"),
        orderBy = Seq("o_orderdate", "o_orderkey"),
        pattern = "A B+",
        define = Seq(
          "A" -> (col("o_totalprice") > 100000),
          "B" -> (col("o_totalprice") <= 100000)),
        measures = Seq(
          "a_key" -> MatchRecognize.Measures.firstOf("A", col("o_orderkey")),
          "last_b_key" -> MatchRecognize.Measures.lastOf("B", col("o_orderkey")),
          "n_b" -> MatchRecognize.Measures.countOf("B"),
          "cls" -> MatchRecognize.Measures.classifier,
          "match_total" -> sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")))
    assert(got.count() > 0)
    assert(got.columns.toSeq == exp.columns.toSeq)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("WITHIN bounds the match span inside the matcher (greedy truncation)") {
    import spark.implicits._
    val df = Seq(
      (1L, "2020-01-01 00:00:00", "a"),
      (1L, "2020-01-01 00:00:10", "b"),
      (1L, "2020-01-01 00:00:20", "b"),
      (1L, "2020-01-01 00:10:00", "b") // outside the 50s window
    ).toDF("k", "t", "kind").withColumn("t", col("t").cast("timestamp"))
    df.createOrReplaceTempView("mr_within_v")
    val got = MatchRecognizeSql.sql(spark, """
      SELECT * FROM mr_within_v MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY t
        ALL ROWS PER MATCH
        PATTERN (A B+) WITHIN INTERVAL '50' SECOND
        DEFINE A AS kind = 'a', B AS kind = 'b'
      )""").select(col("t").cast("string"), col("mr_var"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // greedy B+ truncates at the window boundary: the 00:10 row is out
    assert(got == Set(
      ("2020-01-01 00:00:00", "A"),
      ("2020-01-01 00:00:10", "B"),
      ("2020-01-01 00:00:20", "B")))
    // without WITHIN the same pattern absorbs the far row
    val unbounded = MatchRecognizeSql.sql(spark, """
      SELECT * FROM mr_within_v MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY t
        ALL ROWS PER MATCH
        PATTERN (A B+)
        DEFINE A AS kind = 'a', B AS kind = 'b'
      )""")
    assert(unbounded.count() == 4)
  }

  test("PREV/NEXT navigation in DEFINE: the canonical V-shape pattern") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 8.0), (1L, 3L, 6.0),
      (1L, 4L, 7.0), (1L, 5L, 9.0), (1L, 6L, 9.0)
    ).toDF("k", "seq", "price")
    df.createOrReplaceTempView("mr_v_shape")
    val got = MatchRecognizeSql.sql(spark, """
      SELECT * FROM mr_v_shape MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY seq
        MEASURES FIRST(STRT.seq) AS start_seq,
                 LAST(DOWN.seq) AS bottom_seq,
                 LAST(UP.seq) AS end_seq,
                 COUNT(*) AS n_rows
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (STRT DOWN+ UP+)
        DEFINE STRT AS TRUE,
               DOWN AS price < PREV(price),
               UP AS price > PREV(price)
      )""").select("start_seq", "bottom_seq", "end_seq", "n_rows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 10 > 8 > 6 < 7 < 9 = 9: one V from seq 1 to 5 (row 6 is flat, not UP)
    assert(got.toSeq == Seq((1L, 3L, 5L, 5L)))
  }

  test("FIRST/LAST offsets and RUNNING aggregates") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 200000.0), (1L, 2L, 10.0), (1L, 3L, 20.0), (1L, 4L, 30.0)
    ).toDF("k", "seq", "price")
    df.createOrReplaceTempView("mr_off_v")
    val got = MatchRecognizeSql.sql(spark, """
      SELECT * FROM mr_off_v MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY seq
        MEASURES FIRST(B.seq, 1) AS second_b,
                 LAST(B.seq, 1) AS second_last_b,
                 FIRST(B.seq, 5) AS past_end
        ONE ROW PER MATCH
        PATTERN (A B+)
        DEFINE A AS price > 100000, B AS price <= 100000
      )""").select("second_b", "second_last_b", "past_end").collect().head
    assert(got.getLong(0) == 3L)  // B rows are seq 2,3,4: FIRST(+1) = 3
    assert(got.getLong(1) == 3L)  // LAST(+1) = 3
    assert(got.isNullAt(2))       // offset past the match: null, no throw

    // RUNNING over ALL ROWS PER MATCH output
    val ann = graft.streaming.MatchRecognize.annotate(
      df, Seq("k"), Seq("seq"), "A B+",
      Seq("A" -> (col("price") > 100000), "B" -> (col("price") <= 100000)))
    val run = ann.withColumn("run_sum",
        graft.streaming.MatchRecognize.Measures.running(Seq("k"))(sum(col("price"))))
      .orderBy("seq").select("run_sum").as[Double].collect().toSeq
    assert(run == Seq(200000.0, 200010.0, 200030.0, 200060.0))
  }

  test("variable-scoped aggregate and SKIP TO NEXT ROW") {
    orders
    val got = MatchRecognizeSql.sql(spark, """
      SELECT * FROM orders_v MATCH_RECOGNIZE (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        MEASURES CAST(sum(CAST(B.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS b_total,
                 COUNT(*) AS n_rows
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B)
        DEFINE A AS A.o_totalprice > 100000,
               B AS B.o_totalprice <= 100000
      )""")
    val exp = MatchRecognize.oneRowPerMatch(
        orders,
        partitionBy = Seq("o_custkey"),
        orderBy = Seq("o_orderdate", "o_orderkey"),
        pattern = "A B",
        define = Seq(
          "A" -> (col("o_totalprice") > 100000),
          "B" -> (col("o_totalprice") <= 100000)),
        measures = Seq(
          "b_total" -> sum(when(col("mr_var") === "B", col("o_totalprice"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double"),
          "n_rows" -> count(lit(1))),
        skip = MatchRecognize.SkipToNextRow)
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }
}
