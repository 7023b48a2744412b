package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite


/**
 * Property-based stream == batch parity for the stateful operators whose
 * fixture gates exercise one data shape each: random event sequences,
 * random micro-batch boundaries (chunks time-ordered, arrival order
 * within a chunk arbitrary — the watermark contract), fixed seeds. The
 * reference semantic is the PURE batch implementation (`Cep.matchAll` /
 * a plain-Scala fold), so divergence pins the streaming state machine,
 * not Spark.
 *
 * Case count is small (streaming queries cost ~1 s each); seeds are
 * fixed so CI failures reproduce exactly.
 */
class StreamParityPropertySpec extends AnyFunSuite {
  lazy val spark = graft.TestSession.spark
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .flatten.take(n).toSeq

  /** ts-ordered events split into chunks of the given pseudo-random
    * sizes; within each chunk the arrival order is shuffled. */
  private def chunked[A](evs: Seq[A], rnd: scala.util.Random): Seq[Seq[A]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[A]]
    var rest = evs
    while (rest.nonEmpty) {
      val k = 1 + rnd.nextInt(9)
      val (c, r) = rest.splitAt(k)
      out += rnd.shuffle(c)
      rest = r
    }
    out.toSeq
  }

  private val evGen: Gen[List[CEv]] = for {
    n <- Gen.choose(20, 50)
    raw <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 120000L)
      k <- Gen.frequency(3 -> Gen.const("a"), 3 -> Gen.const("b"),
                         3 -> Gen.const("c"), 2 -> Gen.const("x"))
    } yield (t, k))
  } yield raw.zipWithIndex.map { case ((t, k), i) => CEv(i + 1, t, k) }

  test("streaming CEP == matchAll on random sequences and random batch splits") {
    val withinMs = 30000L
    val streamPat = Cep.Pattern[WEv](Seq(
      Cep.Step[WEv]("a", _.kind == "a"),
      Cep.Step[WEv]("b", _.kind == "b"),
      Cep.Step[WEv]("c", _.kind == "c")), withinMs = Some(withinMs))
    val batchPat = Cep.Pattern[CEv](Seq(
      Cep.Step[CEv]("a", _.kind == "a"),
      Cep.Step[CEv]("b", _.kind == "b"),
      Cep.Step[CEv]("c", _.kind == "c")), withinMs = Some(withinMs))
    cases(evGen, 6, seed = 7001L).zipWithIndex.foreach { case (evs, ci) =>
      val sorted = evs.sortBy(e => (e.t, e.id))
      val expect = Cep.matchAll(batchPat, sorted.toIndexedSeq, (_: CEv).t)
        .map(_.map(_.id)).toSet

      implicit val sc = spark.sqlContext
      val mem = MemoryStream[CEv]
      val ds = mem.toDS()
        .withColumn("ets", ($"t" / 1000).cast("timestamp"))
        .withWatermark("ets", "1 second")
        .as[WEv]
      val out = Cep.matchStream[Long, WEv](
        ds.groupByKey(_ => 0L), streamPat, _.t, _.id)
      val name = s"s_cep_prop_$ci"
      val q = out.map(m => m.events.map(_.id).mkString("-"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      val rnd = new scala.util.Random(9000L + ci)
      try {
        chunked(sorted, rnd).foreach { c =>
          mem.addData(c: _*); q.processAllAvailable()
        }
        val maxT = sorted.map(_.t).max
        mem.addData(CEv(9001, maxT + 60000, "x")); q.processAllAvailable()
        mem.addData(CEv(9002, maxT + 120000, "x")); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).as[String].collect()
        .map(_.split("-").map(_.toLong).toSeq).toSet
      assert(got == expect, s"case $ci: stream=$got batch=$expect")
    }
  }

  test("streaming over-window running fold == plain-Scala reference on random data") {
    // ROWS BETWEEN 2 PRECEDING AND CURRENT ROW, min(v), one key; distinct
    // event times so (t) alone orders deterministically on both sides.
    val gen: Gen[List[(Long, Double)]] = for {
      n <- Gen.choose(15, 40)
      ts <- Gen.pick(n, (1 to 500).map(_ * 250L))
      vs <- Gen.listOfN(n, Gen.choose(-100, 100).map(_.toDouble))
    } yield ts.toList.sorted.zip(vs)
    cases(gen, 5, seed = 8101L).zipWithIndex.foreach { case (rows, ci) =>
      val expect = rows.zipWithIndex.map { case ((t, _), i) =>
        val frame = rows.slice(math.max(0, i - 2), i + 1).map(_._2)
        (t, frame.min)
      }.toSet

      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, Double)]
      val ds = mem.toDS()
        .withColumn("ets", ($"_1" / 1000).cast("timestamp"))
        .select(lit(0L).as("k"), $"_1".as("t"), $"_2".as("v"), $"ets")
        .withWatermark("ets", "1 second")
        .as[graft.OEv]
      val out = OverWindow.overAgg[Long, graft.OEv, Double](
        ds.groupByKey(_.k), _.t, _.t, _.v,
        OverWindow.minAgg[graft.OEv](_.v), OverWindow.RowsPreceding(2))
      val name = s"s_ow_prop_$ci"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      val rnd = new scala.util.Random(9100L + ci)
      try {
        chunked(rows, rnd).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
        val maxT = rows.map(_._1).max
        mem.addData((maxT + 60000, 0.0)); q.processAllAvailable()
        mem.addData((maxT + 120000, 0.0)); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name)
        .as[(Long, Long, Long, Double)].collect()
        .filter(r => r._2 <= rows.map(_._1).max)
        .map(r => (r._2, r._4)).toSet
      assert(got == expect, s"case $ci: stream=$got ref=$expect")
    }
  }

  test("SQL SELECT DISTINCT + ORDER BY LIMIT == final live set on random changelogs") {
    // Random VALID changelogs (inserts of unique ids, deletes of live
    // ids — the per-key ordered-delivery contract every changelog
    // operator assumes), random micro-batch boundaries. The reference
    // semantic is the final live map: distinct = its value set,
    // sort-limit = its top-3 rows by (value desc, id asc).
    implicit val sc = spark.sqlContext
    (1 to 4).foreach { ci =>
      val rnd = new scala.util.Random(9400L + ci)
      var live = Map.empty[Long, Double]
      var nextId = 1L
      val values = Vector(1.0, 2.0, 3.0, 4.0, 5.0)
      val ops = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
      (1 to (30 + rnd.nextInt(40))).foreach { _ =>
        if (live.isEmpty || rnd.nextDouble() < 0.6) {
          val v = values(rnd.nextInt(values.size))
          ops += ((nextId, "+I", v)); live += nextId -> v; nextId += 1
        } else {
          val id = live.keys.toSeq(rnd.nextInt(live.size))
          ops += ((id, "-D", live(id))); live -= id
        }
      }
      val vn = s"pp_sd_$ci"
      val mem = MemoryStream[(Long, String, Double)]
      StreamSql.registerChangelog(vn, mem.toDS().toDF("id", "kind", "value"),
        kindCol = "kind", rowId = Some("id"))
      val d = graft.operators.SqlFrontend.sql(spark,
        s"SELECT DISTINCT value AS v FROM $vn")
      val t = graft.operators.SqlFrontend.sql(spark,
        s"SELECT id AS i, value AS v FROM $vn ORDER BY value DESC, id LIMIT 3")
      val (s1, s2) = (s"pp_sd_sink_$ci", s"pp_sl_sink_$ci")
      val q1 = d.writeStream.format("memory").queryName(s1)
        .outputMode(OutputMode.Append).start()
      val q2 = t.writeStream.format("memory").queryName(s2)
        .outputMode(OutputMode.Append).start()
      try {
        var rest = ops.toList
        while (rest.nonEmpty) {
          val (c, r) = rest.splitAt(1 + rnd.nextInt(7))
          mem.addData(c: _*)
          q1.processAllAvailable(); q2.processAllAvailable()
          rest = r
        }
      } finally { q1.stop(); q2.stop() }
      val gotD = Changelog.materialize(spark.table(s1),
          "v", "row_kind", "row_ord")
        .select($"v").as[Double].collect().toSet
      assert(gotD == live.values.toSet, s"case $ci distinct: " +
        s"stream=$gotD ref=${live.values.toSet}")
      val gotT = Changelog.materialize(spark.table(s2),
          "i", "row_kind", "row_ord")
        .select($"i", $"v").as[(Long, Double)].collect().toSet
      val expT = live.toSeq.sortBy { case (id, v) => (-v, id) }.take(3).toSet
      assert(gotT == expT, s"case $ci sortlimit: stream=$gotT ref=$expT")
      StreamSql.dropChangelog(vn)
    }
  }
}
