package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LookupJoin, Skew}

/** Scale-mechanics proofs: bucketed co-located joins skip the shuffle,
  * salted joins produce identical results to plain joins, async lookup
  * preserves completeness. These are the 100 TB design claims made in
  * the operator scaladocs, asserted on real plans. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("bucketed tables co-locate: join plan has no shuffle exchange") {
    // orphaned locations survive the per-JVM derby metastore — clear them
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }
    val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ==
        orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE skew-join splits a skewed partition at runtime (OptimizeSkewedJoin fires)") {
    // Spark's built-in answer to the reference's skew handling
    // (SplitAggregateRule / key-group spreading): the manual salted
    // rewrite (q278 and the cases below) covers planned skew; this
    // proves the RUNTIME re-plan also fires, so unplanned skew at
    // 100 TB is split without any query change.
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key 7 carries 80% of the rows (~6 MB of padded payload)
      val pad = "x" * 400
      val left = spark.range(0, 20000)
        .select(when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id") % 100)
                  .as("k"),
                concat(lit(pad), col("id")).as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 10).as("v"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's query so its adaptive plan finalizes
      // (count() would plan a separate query execution)
      assert(joined.collect().length == 20000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of probe rows share key 1
    val probe = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 1L, i))
      .toDF("k", "payload")
    val build = (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("bk", "name")
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "payload", "name")
    val salted = Skew.saltedJoin(probe, build, "k", "bk", salts = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("two-phase salted aggregation equals direct aggregation") {
    val df = (1 to 5000).map(i => (if (i % 100 == 0) i.toLong else 7L, i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
    val twoPhase = Skew.twoPhaseAgg(df, "k", salts = 16,
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
    assert(twoPhase.except(direct).isEmpty && direct.except(twoPhase).isEmpty)
  }

  test("async lookup returns all results (unordered within partition)") {
    val probes = (1 to 500).toDS()
    val got = LookupJoin.async(probes, maxInFlight = 16) { i =>
      (i, s"svc-$i") // stand-in for an external service call
    }.collect().toSet
    assert(got == (1 to 500).map(i => (i, s"svc-$i")).toSet)
  }

  test("async lookup: one slow request stalls neither the window nor emission") {
    // single partition so within-partition concurrency is what's measured
    val probes = (1 to 20).toDS().repartition(1)
    val t0 = System.nanoTime()
    val got = LookupJoin.async(probes, maxInFlight = 8) { i =>
      if (i == 1) Thread.sleep(1500) // slow head
      i
    }.collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(got.toSet == (1 to 20).toSet)
    // unordered mode: the slow head's result emits AFTER fast ones that
    // were issued concurrently (lock-step batching would emit it first)
    assert(got.head != 1)
    // 19 fast lookups + one 1.5s sleep, 8-wide window: far under the
    // 19 × 1.5s a serial or head-blocked pipeline would take
    assert(elapsedMs < 10000, s"took $elapsedMs ms")
  }

  test("async lookup ordered mode preserves probe order under concurrency") {
    val probes = (1 to 50).toDS().repartition(1)
    val got = LookupJoin.async(probes, maxInFlight = 8, ordered = true) { i =>
      if (i % 7 == 0) Thread.sleep(50)
      i * 2
    }.collect()
    assert(got.toSeq == (1 to 50).map(_ * 2))
  }

  test("flatMapGroups table-aggregate emits top-2 per group (UDTAF)") {
    val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
    val got = orders.groupByKey(_._1).flatMapGroups { (k, it) =>
      it.toSeq.sortBy(t => (-t._3, t._2)).take(2)
        .map(t => (k, t._2))
    }.toDF("custkey", "orderkey")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val exp = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"))
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }
}
