package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("clustered write: bounded file sizes and pairwise non-overlapping " +
    "key envelopes (min/max pruning actually works)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-layout").toString + "/orders"
    val orders = Tables.table(spark, dir, "orders")
    val n = orders.count()
    val target = 200L
    LayoutOps.writeClustered(orders, out, Seq(col("o_orderkey")), target)

    val env = LayoutOps.envelopes(spark, out, "o_orderkey")
      .orderBy(col("lo")).collect()
    // file count near ceil(n/target); every file within the record cap
    assert(env.length >= (n / target).toInt)
    assert(env.forall(_.getAs[Long]("rows") <= target))
    // round-trip completeness
    assert(spark.read.parquet(out).count() == n)
    // disjoint envelopes: each file's hi below the next file's lo
    env.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
          s"overlap: ${a.getAs[String]("file")} and ${b.getAs[String]("file")}")
      case _ =>
    }
  }

  test("writeClustered on a computed pipeline executes the pipeline " +
    "exactly once (persisted around count+write), envelopes still disjoint") {
    val acc = spark.sparkContext.longAccumulator("layout-row-evals")
    val touch = udf { (x: Long) => acc.add(1L); x }
    val orders = Tables.table(spark, dir, "orders")
    val n = orders.count()
    val piped = orders.select(touch(col("o_orderkey")).as("k"))
    val out = java.nio.file.Files
      .createTempDirectory("graft-layout-once").toString + "/once"
    LayoutOps.writeClustered(piped, out, Seq(col("k")), 500L)
    assert(acc.value == n,
      s"pipeline evaluated ${acc.value} rows for $n inputs — " +
        "the count+write double pass must not recompute the source")
    val env = LayoutOps.envelopes(spark, out, "k")
      .orderBy(col("lo")).collect()
    env.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
      case _ =>
    }
    assert(spark.read.parquet(out).count() == n)
  }

  test("compact: many small files collapse to the target layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
    val frag = tmp.toString + "/frag"
    val packed = tmp.toString + "/packed"
    val orders = Tables.table(spark, dir, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    assert(LayoutOps.envelopes(spark, frag, "o_orderkey").count() >= 32)
    LayoutOps.compact(spark, frag, packed, Seq(col("o_orderkey")), 500L)
    val env = LayoutOps.envelopes(spark, packed, "o_orderkey").collect()
    // range-boundary sampling may split a partition into one extra file;
    // the invariants are the record cap, a real collapse, completeness
    assert(env.forall(_.getAs[Long]("rows") <= 500L))
    assert(env.length <= 2 * (orders.count() / 500 + 1).toInt)
    assert(env.length < 32)
    assert(spark.read.parquet(packed).count() == orders.count())
  }
}
