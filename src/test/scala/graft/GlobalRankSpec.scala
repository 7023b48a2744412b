package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank

class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("range-partitioned global row_number equals single-partition window") {
    val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
    val got = GlobalRank.withRowNumber(orders,
        Seq(col("o_totalprice"), col("o_orderkey")), "rn")
      .select(col("o_orderkey"), col("rn"))
    val exp = orders.withColumn("rn",
        row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
          .cast("long"))
      .select(col("o_orderkey"), col("rn"))
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    assert(got.count() == orders.count())
  }

  test("global row_number is parallel: no single-partition window in plan") {
    val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
    val plan = GlobalRank.withRowNumber(orders,
      Seq(col("o_totalprice"), col("o_orderkey"))).queryExecution
      .executedPlan.toString
    // the window partitions by __pid — never an empty PARTITION BY
    assert(!plan.contains("Window [row_number()") ||
      plan.contains("windowspecdefinition(__pid"))
  }

  test("works on empty input") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(GlobalRank.withRowNumber(empty, Seq(col("v"), col("k"))).count() == 0)
  }

  test("range-partitioned global cumsum equals single-partition window") {
    val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("v", (col("o_orderkey") % 97).cast("long"))
    val got = GlobalRank.withCumSum(orders,
        Seq(col("o_totalprice").desc, col("o_orderkey")), col("v"), "cum")
      .select(col("o_orderkey"), col("cum"))
    val exp = orders.withColumn("cum",
        sum(col("v")).over(
          Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("o_orderkey"), col("cum"))
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    assert(got.count() == orders.count())
  }

  test("global cumsum on empty input") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(GlobalRank.withCumSum(empty, Seq(col("k")), col("v")).count() == 0)
  }
}
