package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Changelog

case class CRow(key: Long, kind: String, value: Double, ord: Long)
/** String-keyed sibling of [[CRow]] for the generic-key cases. */
case class SRow(skey: String, kind: String, value: Double, ord: Long)

class ChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("materialize applies +I/+U/-D in order, last state wins") {
    val log = Seq(
      CRow(1, "+I", 10.0, 1), CRow(1, "+U", 11.0, 2), CRow(1, "+U", 12.0, 3),
      CRow(2, "+I", 20.0, 1), CRow(2, "-D", 20.0, 2),
      CRow(3, "+I", 30.0, 1), CRow(3, "-U", 30.0, 2) // -U alone: no effect
    ).toDF()
    val got = Changelog.materialize(log, "key", "kind", "ord")
      .select("key", "value").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 12.0), (3L, 30.0))) // key 2 deleted
  }

  test("streaming changelog aggregate emits -U/+U retraction pairs") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val q = out.writeStream.format("memory").queryName("cl_agg")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 7.0, 2))
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 5.0, 3)) // retract the 5.0
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 7.0, 4)) // group count → 0: full delete
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_agg")
      .select("key", "kind", "sum", "count")
      .as[(Long, String, Double, Long)].collect().toList
    assert(got == List(
      (1L, "+U", 12.0, 2L),              // batch 1: new aggregate
      (1L, "-U", 12.0, 2L), (1L, "+U", 7.0, 1L), // batch 2: retract + update
      (1L, "-U", 7.0, 1L), (1L, "-D", 7.0, 1L))) // batch 3: retire group
  }

  test("retract-aware max: deleting the current max re-emits the runner-up") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogMinMax[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value, _.ord)
    val q = out.writeStream.format("memory").queryName("cl_minmax")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 9.0, 2), CRow(1, "+I", 7.0, 3))
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 9.0, 2)) // delete the row holding the max
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 5.0, 1)) // delete the row holding min+first
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 7.0, 3)) // group retires
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_minmax")
      .select("kind", "min", "max", "first", "last", "count")
      .as[(String, Double, Double, Double, Double, Long)].collect().toList
    assert(got == List(
      ("+U", 5.0, 9.0, 5.0, 7.0, 3L),                      // batch 1
      ("-U", 5.0, 9.0, 5.0, 7.0, 3L), ("+U", 5.0, 7.0, 5.0, 7.0, 2L), // max→7
      ("-U", 5.0, 7.0, 5.0, 7.0, 2L), ("+U", 7.0, 7.0, 7.0, 7.0, 1L), // min/first move
      ("-U", 7.0, 7.0, 7.0, 7.0, 1L), ("-D", 7.0, 7.0, 7.0, 7.0, 1L))) // retire
  }

  test("changelog aggregate emits nothing for no-op batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val q = out.writeStream.format("memory").queryName("cl_noop")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(9, "+I", 1.0, 1)); q.processAllAvailable()
      mem.addData(CRow(9, "+I", 2.0, 2), CRow(9, "-D", 2.0, 3)) // net zero
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("cl_noop").count()
    assert(rows == 1) // only the first batch's +U
  }

  test("changelog join: retractions, updates, duplicates, group retirement") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelog(left, right)
    val q = out.writeStream.format("memory").queryName("cl_join")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: both sides arrive in ONE batch — exactly one +I, no
      // transient pair; duplicate left rows count twice
      lMem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 5.0, 2))
      rMem.addData(CRow(1, "+I", 100.0, 1))
      q.processAllAvailable()
      // batch 2: right-side update → each left instance retracts+reinserts
      rMem.addData(CRow(1, "-U", 100.0, 2), CRow(1, "+U", 200.0, 3))
      q.processAllAvailable()
      // batch 3: one left duplicate retracts → one -U, no +
      lMem.addData(CRow(1, "-D", 5.0, 3))
      q.processAllAvailable()
      // batch 4: last left row dies → join result empties with -D
      lMem.addData(CRow(1, "-D", 5.0, 4))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_join")
      .selectExpr("kind", "left.v", "right.v", "ord")
      .as[(String, Double, Double, Long)].collect().toList.sortBy(_._4)
    assert(got == List(
      ("+I", 5.0, 100.0, 1L), ("+I", 5.0, 100.0, 2L),          // batch 1
      ("-U", 5.0, 100.0, 3L), ("-U", 5.0, 100.0, 4L),          // batch 2
      ("+U", 5.0, 200.0, 5L), ("+U", 5.0, 200.0, 6L),
      ("-U", 5.0, 200.0, 7L),                                   // batch 3
      ("-D", 5.0, 200.0, 8L)))                                  // batch 4
  }

  test("left-outer changelog join: pad, retract pad on first match, re-pad") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogOuter(left, right, Changelog.LeftOuter)
    val q = out.writeStream.format("memory").queryName("cl_louter")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: left row alone → padded +I (l, null)
      lMem.addData(CRow(1, "+I", 5.0, 1))
      q.processAllAvailable()
      // batch 2: first right match → retract the pad, insert the pair
      // (the reference's numOfAssociations 0→1 transition)
      rMem.addData(CRow(1, "+I", 100.0, 1))
      q.processAllAvailable()
      // batch 3: the match dies → retract the pair, re-pad (1→0)
      rMem.addData(CRow(1, "-D", 100.0, 2))
      q.processAllAvailable()
      // batch 4: right-only key on a LEFT outer join → no output
      rMem.addData(CRow(2, "+I", 7.0, 3))
      q.processAllAvailable()
      // batch 5: left dies → the padded row deletes, key retires
      lMem.addData(CRow(1, "-D", 5.0, 2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_louter")
      .selectExpr("key", "kind", "left.v", "right.v", "ord")
      .as[(Long, String, Option[Double], Option[Double], Long)]
      .collect().toList.sortBy(_._5)
    assert(got == List(
      (1L, "+I", Some(5.0), None, 1L),                          // batch 1
      (1L, "-U", Some(5.0), None, 2L),                          // batch 2
      (1L, "+U", Some(5.0), Some(100.0), 3L),
      (1L, "-U", Some(5.0), Some(100.0), 4L),                   // batch 3
      (1L, "+U", Some(5.0), None, 5L),
      (1L, "-D", Some(5.0), None, 6L)))                         // batch 5
  }

  test("right-outer changelog join pads the right side only") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogOuter(left, right, Changelog.RightOuter)
    val q = out.writeStream.format("memory").queryName("cl_router")
      .outputMode(OutputMode.Append).start()
    try {
      // left-only key: silent on a RIGHT outer join
      lMem.addData(CRow(1, "+I", 5.0, 1))
      q.processAllAvailable()
      // right-only key: padded
      rMem.addData(CRow(2, "+I", 7.0, 1))
      q.processAllAvailable()
      // key 1 right arrives: plain insert (no pad existed to retract)
      rMem.addData(CRow(1, "+I", 100.0, 2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_router")
      .selectExpr("key", "kind", "left.v", "right.v", "ord")
      .as[(Long, String, Option[Double], Option[Double], Long)]
      .collect().toList.sortBy(t => (t._1, t._5))
    assert(got == List(
      (1L, "+I", Some(5.0), Some(100.0), 1L),
      (2L, "+I", None, Some(7.0), 1L)))
  }

  test("non-equi residual condition: per-row association padding") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    // residual condition beyond the key: l.v < r.v
    val out = Changelog.joinChangelogOuter(left, right, Changelog.LeftOuter,
      (l: LSide, r: RSide) => l.v < r.v)
    val q = out.writeStream.format("memory").queryName("cl_nonequi")
      .outputMode(OutputMode.Append).start()
    try {
      // left row alone → padded
      lMem.addData(CRow(1, "+I", 5.0, 1))
      q.processAllAvailable()
      // right row FAILING the condition (3 < 5): key's right side is
      // non-empty but the left row has zero passing associations —
      // stays padded, NO emission
      rMem.addData(CRow(1, "+I", 3.0, 1))
      q.processAllAvailable()
      // passing right row → un-pad (0→1 associations)
      rMem.addData(CRow(1, "+I", 100.0, 2))
      q.processAllAvailable()
      // the passing row retracts → re-pad (1→0), the failing 3.0 is
      // still live and still doesn't count
      rMem.addData(CRow(1, "-D", 100.0, 3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_nonequi")
      .selectExpr("kind", "left.v", "right.v", "ord")
      .as[(String, Option[Double], Option[Double], Long)]
      .collect().toList.sortBy(_._4)
    assert(got == List(
      ("+I", Some(5.0), None, 1L),                              // batch 1
      ("-U", Some(5.0), None, 2L),                              // batch 3
      ("+U", Some(5.0), Some(100.0), 3L),
      ("-U", Some(5.0), Some(100.0), 4L),                       // batch 4
      ("+U", Some(5.0), None, 5L)))
  }

  test("full-outer changelog join ▸ materialize equals the batch full join") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    // updating upsert views on both sides (≤1 live row per key)
    val lAgg = Changelog.aggregateChangelog[Long, CRow](
        lMem.toDS().groupByKey(_.key), _.kind, _.value)
      .map(a => (a.key, a.kind, LAgg(a.sum, a.count)))
    val rAgg = Changelog.aggregateChangelog[Long, CRow](
        rMem.toDS().groupByKey(_.key), _.kind, _.value)
      .map(a => (a.key, a.kind, RAgg(a.sum, a.count)))
    val out = Changelog.joinChangelogOuter(lAgg, rAgg, Changelog.FullOuter)
    val q = out.writeStream.format("memory").queryName("cl_fouter")
      .outputMode(OutputMode.Append).start()
    val lRaw = scala.collection.mutable.ArrayBuffer.empty[CRow]
    val rRaw = scala.collection.mutable.ArrayBuffer.empty[CRow]
    def feed(ls: Seq[CRow], rs: Seq[CRow]): Unit = {
      lRaw ++= ls; rRaw ++= rs
      if (ls.nonEmpty) lMem.addData(ls: _*)
      if (rs.nonEmpty) rMem.addData(rs: _*)
      q.processAllAvailable()
    }
    try {
      // key 1 both sides, key 2 left-only, key 3 right-only
      feed(Seq(CRow(1, "+I", 5.0, 1), CRow(2, "+I", 20.0, 2)),
           Seq(CRow(1, "+I", 100.0, 1), CRow(3, "+I", 9.0, 2)))
      // key 2 gains a right match (un-pads), key 3's right side retires
      // (key vanishes entirely on a full outer with no left rows)
      feed(Seq.empty,
           Seq(CRow(2, "+I", 40.0, 3), CRow(3, "-D", 9.0, 4)))
      // out-of-order update on key 1's left view
      feed(Seq(CRow(1, "-D", 5.0, 3), CRow(1, "+I", 8.0, 4)), Seq.empty)
    } finally q.stop()
    val mat = Changelog.materialize(
        spark.table("cl_fouter"), "key", "kind", "ord")
      .selectExpr("key", "left.sum", "left.count", "right.sum", "right.count")
      .as[(Long, Option[Double], Option[Long], Option[Double], Option[Long])]
      .collect().toSet
    def view(rows: Seq[CRow]): Map[Long, (Double, Long)] = rows
      .groupBy(_.key).flatMap { case (k, rs) =>
        val live = rs.foldLeft((0.0, 0L)) { (acc, r) =>
          if (r.kind == "+I" || r.kind == "+U") (acc._1 + r.value, acc._2 + 1)
          else (acc._1 - r.value, acc._2 - 1)
        }
        if (live._2 > 0) Some(k -> live) else None
      }
    val lv = view(lRaw.toSeq)
    val rv = view(rRaw.toSeq)
    val expected = (lv.keySet | rv.keySet).map { k =>
      (k, lv.get(k).map(_._1), lv.get(k).map(_._2),
          rv.get(k).map(_._1), rv.get(k).map(_._2))
    }
    assert(mat == expected)
    assert(mat == Set(
      (1L, Some(8.0), Some(1L), Some(100.0), Some(1L)),
      (2L, Some(20.0), Some(1L), Some(40.0), Some(1L))))
  }

  test("agg ▸ joinChangelog ▸ materialize equals the batch join of the views") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    // two updating views: per-key SUM/COUNT over each raw changelog
    val lAgg = Changelog.aggregateChangelog[Long, CRow](
        lMem.toDS().groupByKey(_.key), _.kind, _.value)
      .map(a => (a.key, a.kind, LAgg(a.sum, a.count)))
    val rAgg = Changelog.aggregateChangelog[Long, CRow](
        rMem.toDS().groupByKey(_.key), _.kind, _.value)
      .map(a => (a.key, a.kind, RAgg(a.sum, a.count)))
    val out = Changelog.joinChangelog(lAgg, rAgg)
    val q = out.writeStream.format("memory").queryName("cl_compose")
      .outputMode(OutputMode.Append).start()
    val lRaw = scala.collection.mutable.ArrayBuffer.empty[CRow]
    val rRaw = scala.collection.mutable.ArrayBuffer.empty[CRow]
    def feed(ls: Seq[CRow], rs: Seq[CRow]): Unit = {
      lRaw ++= ls; rRaw ++= rs
      if (ls.nonEmpty) lMem.addData(ls: _*)
      if (rs.nonEmpty) rMem.addData(rs: _*)
      q.processAllAvailable()
    }
    try {
      feed(Seq(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 7.0, 2),
               CRow(2, "+I", 20.0, 3)),
           Seq(CRow(1, "+I", 100.0, 1), CRow(2, "+I", 30.0, 2),
               CRow(3, "+I", 9.0, 3)))
      // out-of-order update: key 1 left loses the 5.0 while right updates
      feed(Seq(CRow(1, "-D", 5.0, 4)),
           Seq(CRow(1, "-D", 100.0, 4), CRow(1, "+I", 150.0, 5)))
      // key 2's left group retires entirely → join pair must vanish
      feed(Seq(CRow(2, "-D", 20.0, 5)), Seq.empty)
    } finally q.stop()
    val mat = Changelog.materialize(
        spark.table("cl_compose"), "key", "kind", "ord")
      .selectExpr("key", "left.sum", "left.count", "right.sum", "right.count")
      .as[(Long, Double, Long, Double, Long)].collect().toSet
    // batch reference: aggregate each side's final live rows, inner join
    def view(rows: Seq[CRow]): Map[Long, (Double, Long)] = rows
      .groupBy(_.key).flatMap { case (k, rs) =>
        val live = rs.foldLeft((0.0, 0L)) { (acc, r) =>
          if (r.kind == "+I" || r.kind == "+U") (acc._1 + r.value, acc._2 + 1)
          else (acc._1 - r.value, acc._2 - 1)
        }
        if (live._2 > 0) Some(k -> live) else None
      }
    val lv = view(lRaw.toSeq)
    val rv = view(rRaw.toSeq)
    val expected = (lv.keySet & rv.keySet).map { k =>
      (k, lv(k)._1, lv(k)._2, rv(k)._1, rv(k)._2)
    }
    assert(mat == expected)
    assert(mat == Set((1L, 7.0, 1L, 150.0, 1L))) // keys 2,3 must be gone
  }

  test("randomized changelog join: folded output equals the live cross product (seeded)") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(20260813L)
    // random inserts/deletes over 3 keys; deletes always target a live
    // row (value-carrying retraction, as the protocol requires)
    def genOps(n: Int): Seq[CRow] = {
      val live = scala.collection.mutable.Map.empty[(Long, Double), Int]
        .withDefaultValue(0)
      (1 to n).map { i =>
        val key = rnd.nextInt(3).toLong
        val liveVals = live.collect {
          case ((k, v), c) if k == key && c > 0 => v
        }.toSeq.sorted
        if (liveVals.nonEmpty && rnd.nextInt(100) < 40) {
          val v = liveVals(rnd.nextInt(liveVals.size))
          live((key, v)) -= 1
          CRow(key, "-D", v, i.toLong)
        } else {
          val v = (rnd.nextInt(4) + 1).toDouble
          live((key, v)) += 1
          CRow(key, "+I", v, i.toLong)
        }
      }
    }
    def liveMultiset(ops: Seq[CRow]): Map[(Long, Double), Int] =
      ops.foldLeft(Map.empty[(Long, Double), Int].withDefaultValue(0)) {
        (m, op) =>
          m.updated((op.key, op.value),
            m((op.key, op.value)) + (if (op.kind == "+I") 1 else -1))
      }.filter(_._2 > 0)
    val lOps = genOps(40)
    val rOps = genOps(40)

    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val out = Changelog.joinChangelog(
      lMem.toDS().map(c => (c.key, c.kind, LSide(c.value))),
      rMem.toDS().map(c => (c.key, c.kind, RSide(c.value))))
    val q = out.writeStream.format("memory").queryName("cl_prop")
      .outputMode(OutputMode.Append).start()
    try {
      lOps.grouped(7).toSeq.zipAll(rOps.grouped(7).toSeq, Seq.empty[CRow],
          Seq.empty[CRow]).foreach { case (ls, rs) =>
        if (ls.nonEmpty) lMem.addData(ls: _*)
        if (rs.nonEmpty) rMem.addData(rs: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // fold the emitted changelog into a pair multiset; it must stay
    // non-negative at every prefix and land on lLive × rLive per key
    val events = spark.table("cl_prop")
      .selectExpr("key", "kind", "left.v", "right.v", "ord")
      .as[(Long, String, Double, Double, Long)].collect().sortBy(_._5)
    val mult = scala.collection.mutable.Map
      .empty[(Long, Double, Double), Int].withDefaultValue(0)
    events.foreach { case (k, kind, lv, rv, _) =>
      val delta = if (kind == "+I" || kind == "+U") 1 else -1
      mult((k, lv, rv)) += delta
      assert(mult((k, lv, rv)) >= 0, s"negative pair count at ($k,$lv,$rv)")
    }
    val lLive = liveMultiset(lOps)
    val rLive = liveMultiset(rOps)
    val expected = (for {
      ((lk, lv), lc) <- lLive.toSeq
      ((rk, rv), rc) <- rLive.toSeq if rk == lk
    } yield (lk, lv, rv) -> lc * rc).toMap
    assert(mult.filter(_._2 != 0).toMap == expected)
  }

  test("hot key: per-batch join work is proportional to the update, not |L|x|R|") {
    implicit val sc = spark.sqlContext
    // cond evaluations == pairs the operator actually examined; the old
    // before/after cross-diff would evaluate ~2·|L|·|R| per touched key
    // per batch, the per-record algorithm O(messages · other side).
    val evals = spark.sparkContext.longAccumulator("condEvals")
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val out = Changelog.joinChangelog(
      lMem.toDS().map(c => (c.key, c.kind, LSide(c.value))),
      rMem.toDS().map(c => (c.key, c.kind, RSide(c.value))),
      (l: LSide, r: RSide) => { evals.add(1L); l.v == r.v })
    val q = out.writeStream.format("memory").queryName("cl_hot")
      .outputMode(OutputMode.Append).start()
    val n = 1000
    try {
      // build a hot key: 1000 live rows per side, each left matching
      // exactly one right
      lMem.addData((1 to n).map(i => CRow(1, "+I", i.toDouble, i.toLong)): _*)
      rMem.addData((1 to n).map(i => CRow(1, "+I", i.toDouble, i.toLong)): _*)
      q.processAllAvailable()
      val buildEvals = evals.value
      val buildRows = spark.table("cl_hot").count()
      assert(buildRows == n) // selective cond: n matched pairs
      // single-row update against the hot key
      lMem.addData(CRow(1, "+I", 7.0, 9999))
      q.processAllAvailable()
      val updateEvals = evals.value - buildEvals
      val updateRows = spark.table("cl_hot").count() - buildRows
      assert(updateRows == 1) // the one new pair (7.0, 7.0)
      // O(other side) = n evals, NOT O(|L|·|R|) = 2·(n+1)·n ≈ 2e6
      assert(updateEvals <= 2L * n,
        s"update examined $updateEvals pairs; expected ≤ ${2 * n}")
    } finally q.stop()
  }

  test("hot key OUTER: per-batch join work is proportional to the update, not |L|x|R|") {
    implicit val sc = spark.sqlContext
    // same accumulator harness as the inner-join hot-key spec: the
    // outer join's scaladoc claims the identical per-record profile,
    // so it gets the identical assertion.
    val evals = spark.sparkContext.longAccumulator("condEvalsOuter")
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val out = Changelog.joinChangelogOuter(
      lMem.toDS().map(c => (c.key, c.kind, LSide(c.value))),
      rMem.toDS().map(c => (c.key, c.kind, RSide(c.value))),
      Changelog.LeftOuter,
      (l: LSide, r: RSide) => { evals.add(1L); l.v == r.v })
    val q = out.writeStream.format("memory").queryName("cl_hot_outer")
      .outputMode(OutputMode.Append).start()
    val n = 1000
    // fold the emitted changelog to the live pair multiset (the two
    // memory sources may land in separate micro-batches, so transient
    // pads legitimately appear and are retracted ACROSS batches —
    // netting is per-batch; the live state is what must be right)
    def live(): Map[(Option[Double], Option[Double]), Long] =
      spark.table("cl_hot_outer")
        .selectExpr("kind", "left.v AS lv", "right.v AS rv").collect()
        .foldLeft(Map.empty[(Option[Double], Option[Double]), Long]) {
          (m, r) =>
            val p = (Option(r.get(1)).map(_.asInstanceOf[Double]),
                     Option(r.get(2)).map(_.asInstanceOf[Double]))
            val d = if (r.getString(0) == "+I" || r.getString(0) == "+U") 1L else -1L
            val c = m.getOrElse(p, 0L) + d
            if (c == 0L) m - p else m.updated(p, c)
        }
    try {
      // hot key: 1000 live rows per side, each left matching exactly one right
      lMem.addData((1 to n).map(i => CRow(1, "+I", i.toDouble, i.toLong)): _*)
      rMem.addData((1 to n).map(i => CRow(1, "+I", i.toDouble, i.toLong)): _*)
      q.processAllAvailable()
      val buildEvals = evals.value
      val built = live()
      assert(built.size == n && built.forall { case ((l, r), c) =>
        c == 1L && l.isDefined && l == r }) // n matched pairs, no live pads
      // single-row update against the hot key: duplicates the (7,7) pair
      lMem.addData(CRow(1, "+I", 7.0, 9999))
      q.processAllAvailable()
      val updateEvals = evals.value - buildEvals
      assert(live()((Some(7.0), Some(7.0))) == 2L)
      assert(updateEvals <= 2L * n,
        s"update examined $updateEvals pairs; expected ≤ ${2 * n}")
    } finally q.stop()
  }

  test("sharded hot-key join: pair multiset equals the unsharded join (insert+retract)") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(88L)
    // 10%-hot-key distribution: key 1 takes ~90% of traffic
    def gen(n: Int): Seq[CRow] = (1 to n).map { i =>
      val key = if (rnd.nextInt(10) < 9) 1L else (2 + rnd.nextInt(3)).toLong
      CRow(key, "+I", (rnd.nextInt(5) + 1).toDouble, i.toLong)
    }
    val lOps = gen(60) ++ Seq(CRow(1, "-D", 1.0, 100), CRow(1, "-D", 2.0, 101))
    val rOps = gen(60)
    def run(sharded: Boolean, name: String): Map[(Long, Double, Double), Int] = {
      val lMem = MemoryStream[CRow]
      val rMem = MemoryStream[CRow]
      val l = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
      val r = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
      val out = if (sharded) Changelog.joinChangelogSharded(l, r, 4)
                else Changelog.joinChangelog(l, r)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        lOps.grouped(20).toSeq.zipAll(rOps.grouped(20).toSeq,
            Seq.empty[CRow], Seq.empty[CRow]).foreach { case (ls, rs) =>
          if (ls.nonEmpty) lMem.addData(ls: _*)
          if (rs.nonEmpty) rMem.addData(rs: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val m = scala.collection.mutable.Map
        .empty[(Long, Double, Double), Int].withDefaultValue(0)
      spark.table(name).selectExpr("key", "kind", "left.v", "right.v")
        .as[(Long, String, Double, Double)].collect().foreach {
          case (k, kind, lv, rv) =>
            m((k, lv, rv)) += (if (kind == "+I" || kind == "+U") 1 else -1)
        }
      m.filter(_._2 != 0).toMap
    }
    val plain = run(sharded = false, "cl_shard_plain")
    val shard = run(sharded = true, "cl_shard_4")
    assert(shard == plain)
    assert(plain.nonEmpty)
  }

  test("randomized FULL OUTER changelog join: folded output equals outer-join semantics (seeded)") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(813L)
    def genOps(n: Int): Seq[CRow] = {
      val live = scala.collection.mutable.Map.empty[(Long, Double), Int]
        .withDefaultValue(0)
      (1 to n).map { i =>
        val key = rnd.nextInt(3).toLong
        val liveVals = live.collect {
          case ((k, v), c) if k == key && c > 0 => v
        }.toSeq.sorted
        if (liveVals.nonEmpty && rnd.nextInt(100) < 40) {
          val v = liveVals(rnd.nextInt(liveVals.size))
          live((key, v)) -= 1
          CRow(key, "-D", v, i.toLong)
        } else {
          val v = (rnd.nextInt(3) + 1).toDouble
          live((key, v)) += 1
          CRow(key, "+I", v, i.toLong)
        }
      }
    }
    def liveMs(ops: Seq[CRow]): Map[(Long, Double), Int] =
      ops.foldLeft(Map.empty[(Long, Double), Int].withDefaultValue(0)) {
        (m, op) =>
          m.updated((op.key, op.value),
            m((op.key, op.value)) + (if (op.kind == "+I") 1 else -1))
      }.filter(_._2 > 0)
    val lOps = genOps(35)
    val rOps = genOps(35)

    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val out = Changelog.joinChangelogOuter(
      lMem.toDS().map(c => (c.key, c.kind, LSide(c.value))),
      rMem.toDS().map(c => (c.key, c.kind, RSide(c.value))),
      Changelog.FullOuter)
    val q = out.writeStream.format("memory").queryName("cl_fprop")
      .outputMode(OutputMode.Append).start()
    try {
      lOps.grouped(6).toSeq.zipAll(rOps.grouped(6).toSeq, Seq.empty[CRow],
          Seq.empty[CRow]).foreach { case (ls, rs) =>
        if (ls.nonEmpty) lMem.addData(ls: _*)
        if (rs.nonEmpty) rMem.addData(rs: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val events = spark.table("cl_fprop")
      .selectExpr("key", "kind", "left.v", "right.v", "ord")
      .as[(Long, String, Option[Double], Option[Double], Long)]
      .collect().sortBy(_._5)
    val mult = scala.collection.mutable.Map
      .empty[(Long, Option[Double], Option[Double]), Int].withDefaultValue(0)
    events.foreach { case (k, kind, lv, rv, _) =>
      val delta = if (kind == "+I" || kind == "+U") 1 else -1
      mult((k, lv, rv)) += delta
      assert(mult((k, lv, rv)) >= 0, s"negative pair count at ($k,$lv,$rv)")
    }
    val lLive = liveMs(lOps)
    val rLive = liveMs(rOps)
    val keys = (lLive.keySet.map(_._1) ++ rLive.keySet.map(_._1))
    val expected = keys.flatMap { k =>
      val ls = lLive.collect { case ((kk, v), c) if kk == k => (v, c) }.toSeq
      val rs = rLive.collect { case ((kk, v), c) if kk == k => (v, c) }.toSeq
      if (ls.nonEmpty && rs.nonEmpty)
        for ((lv, lc) <- ls; (rv, rc) <- rs)
          yield (k, Some(lv): Option[Double], Some(rv): Option[Double]) -> lc * rc
      else if (ls.nonEmpty)
        ls.map { case (lv, lc) => (k, Some(lv): Option[Double], None: Option[Double]) -> lc }
      else
        rs.map { case (rv, rc) => (k, None: Option[Double], Some(rv): Option[Double]) -> rc }
    }.toMap
    assert(mult.filter(_._2 != 0).toMap == expected)
  }

  // ---------------------------------------------------------------- TTL

  import graft.streaming.Changelog.IdleStateTtl

  test("TTL aggregate: a key re-arriving within the retention continues its state") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    // generous TTL — the two batches run back-to-back, far under 1h
    val out = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value,
      ttl = Some(IdleStateTtl(3600L * 1000)))
    val q = out.writeStream.format("memory").queryName("cl_ttl_cont")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1)); q.processAllAvailable()
      mem.addData(CRow(1, "+I", 7.0, 2)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_ttl_cont")
      .select("key", "kind", "sum", "count")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "+U", 5.0, 1L),
      (1L, "-U", 5.0, 1L), (1L, "+U", 12.0, 2L))) // retraction pair: state lived
  }

  test("TTL aggregate: an expired key's re-arrival behaves as a fresh insert") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value,
      ttl = Some(IdleStateTtl(500L)))
    val q = out.writeStream.format("memory").queryName("cl_ttl_fresh")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1)); q.processAllAvailable()
      Thread.sleep(1200L) // idle past the 500 ms retention — state expires
      mem.addData(CRow(1, "+I", 7.0, 2)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_ttl_fresh")
      .select("key", "kind", "sum", "count")
      .as[(Long, String, Double, Long)].collect().toSeq
    // second arrival folds from FRESH state: +U 7 with count 1, and no
    // -U retraction of the expired aggregate (silent expiry)
    assert(got == Seq((1L, "+U", 5.0, 1L), (1L, "+U", 7.0, 1L)))
  }

  test("TTL reclaim timers physically remove state of keys that never return") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value,
      ttl = Some(IdleStateTtl(500L, reclaimTimers = true)))
    // reclaimTimers mode: the engine self-schedules timeout batches, so
    // never processAllAvailable — pace the trigger and poll the metrics
    val q = out.writeStream.format("memory").queryName("cl_ttl_reclaim")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(2, "+I", 9.0, 2))
      def stateRows: Option[Long] = q.recentProgress
        .filter(_.stateOperators.nonEmpty).lastOption
        .map(_.stateOperators.head.numRowsTotal)
      val seeded = (1 to 150).exists { _ =>
        Thread.sleep(200L); stateRows.contains(2L)
      }
      assert(seeded, s"state never reached 2 rows (saw $stateRows)")
      // then go idle: timeout callbacks must reclaim both keys' state
      val reclaimed = (1 to 150).exists { _ =>
        Thread.sleep(200L); stateRows.contains(0L)
      }
      assert(reclaimed, s"idle state not reclaimed (saw $stateRows)")
    } finally q.stop()
  }

  test("TTL via conf: spark.graft.state.ttl.ms drives retention like table.exec.state.ttl") {
    implicit val sc = spark.sqlContext
    assert(Changelog.ttlFromConf(spark).isEmpty)
    spark.conf.set("spark.graft.state.ttl.ms", "0")
    assert(Changelog.ttlFromConf(spark).isEmpty, "non-positive = disabled")
    spark.conf.set("spark.graft.state.ttl.ms", "500")
    try {
      assert(Changelog.ttlFromConf(spark).contains(IdleStateTtl(500L)))
      spark.conf.set("spark.graft.state.ttl.reclaimTimers", "true")
      assert(Changelog.ttlFromConf(spark)
        .contains(IdleStateTtl(500L, reclaimTimers = true)))
      spark.conf.unset("spark.graft.state.ttl.reclaimTimers")
      // the conf-driven TTL behaves like the explicit one: expiry
      val mem = MemoryStream[CRow]
      val out = Changelog.aggregateChangelog[Long, CRow](
        mem.toDS().groupByKey(_.key), _.kind, _.value,
        ttl = Changelog.ttlFromConf(spark))
      val q = out.writeStream.format("memory").queryName("cl_ttl_conf")
        .outputMode(OutputMode.Append).start()
      try {
        mem.addData(CRow(1, "+I", 5.0, 1)); q.processAllAvailable()
        Thread.sleep(1200L)
        mem.addData(CRow(1, "+I", 7.0, 2)); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("cl_ttl_conf")
        .select("kind", "sum", "count")
        .as[(String, Double, Long)].collect().toSeq
      assert(got == Seq(("+U", 5.0, 1L), ("+U", 7.0, 1L)))
    } finally {
      spark.conf.unset("spark.graft.state.ttl.ms")
      spark.conf.unset("spark.graft.state.ttl.reclaimTimers")
    }
  }

  test("TTL aggregate: a late retraction of an expired row is stale — ignored") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value,
      ttl = Some(IdleStateTtl(500L)))
    val q = out.writeStream.format("memory").queryName("cl_ttl_stale")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1)); q.processAllAvailable()
      Thread.sleep(1200L) // the 5.0 row's state expires
      // late retraction of the expired row: must NOT fold into fresh
      // state (negative count) — the reference ignores retracts when
      // the accumulator is absent
      mem.addData(CRow(1, "-D", 5.0, 2)); q.processAllAvailable()
      mem.addData(CRow(1, "+I", 7.0, 3)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_ttl_stale")
      .select("key", "kind", "sum", "count")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(got == Seq((1L, "+U", 5.0, 1L), (1L, "+U", 7.0, 1L)))
  }

  test("TTL minmax: an expired key's extremes restart from the re-arrival") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogMinMax[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value, _.ord,
      ttl = Some(IdleStateTtl(500L)))
    val q = out.writeStream.format("memory").queryName("cl_ttl_minmax")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 9.0, 2))
      q.processAllAvailable()
      Thread.sleep(1200L) // past the retention: the live set expires
      mem.addData(CRow(1, "+I", 7.0, 3)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_ttl_minmax")
      .select("kind", "min", "max", "count")
      .as[(String, Double, Double, Long)].collect().toSeq
    // after expiry the extremes restart at 7 with count 1 — and no -U
    // of the expired (5, 9) snapshot is emitted (silent expiry)
    assert(got == Seq(("+U", 5.0, 9.0, 2L), ("+U", 7.0, 7.0, 1L)))
  }

  test("TTL join: an expired key's live sets are gone — re-arrival joins fresh") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    // Each phase lands in ONE micro-batch (all its messages fold under a
    // single processing time), so the test never races batch latency
    // against the TTL — only the deliberate sleep crosses it. A cold
    // first batch can take seconds on a loaded host, so phases split
    // across batches would flake.
    val out = Changelog.joinChangelog(
      lMem.toDS().map(c => (c.key, c.kind, LSide(c.value))),
      rMem.toDS().map(c => (c.key, c.kind, RSide(c.value))),
      ttl = Some(IdleStateTtl(2000L)))
    val q = out.writeStream.format("memory").queryName("cl_ttl_join")
      .outputMode(OutputMode.Append).start()
    try {
      lMem.addData(CRow(1, "+I", 5.0, 1))
      rMem.addData(CRow(1, "+I", 100.0, 1))
      q.processAllAvailable() // pair (5, 100) joins and emits
      Thread.sleep(4500L)     // both sides' state for key 1 expires
      lMem.addData(CRow(1, "+I", 6.0, 2))
      rMem.addData(CRow(1, "+I", 200.0, 2))
      // one batch: 6 and 200 fold from FRESH state and join each other;
      // had the expired 5 survived, (5, 200) would also have emitted
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("cl_ttl_join")
      .selectExpr("kind", "left.v", "right.v")
      .as[(String, Double, Double)].collect().toSeq.sortBy(_._2)
    assert(pairs == Seq(("+I", 5.0, 100.0), ("+I", 6.0, 200.0)))
  }

  test("sharded TTL join: touches keep all shards of a key on one clock (sharded == unsharded)") {
    implicit val sc = spark.sqlContext
    val shards = 4
    def home(v: Double): Long = math.floorMod(LSide(v).hashCode.toLong, shards.toLong)
    // two left payloads that route to DIFFERENT shards of the key
    val vA = 5.0
    val vB = (1 to 100).map(_.toDouble).find(home(_) != home(vA)).get
    val ttl = Some(IdleStateTtl(5000L))
    def run(sharded: Boolean, name: String): Map[(Long, Double, Double), Int] = {
      val lMem = MemoryStream[CRow]
      val rMem = MemoryStream[CRow]
      val l = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
      val r = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
      val out = if (sharded) Changelog.joinChangelogSharded(l, r, shards, ttl = ttl)
                else Changelog.joinChangelog(l, r, ttl = ttl)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        // key 1: right lands once, then ONLY vA-shard left traffic keeps
        // the key alive (back-to-back batches, far under the 5 s TTL);
        // key 2 goes silent past the TTL and then returns.
        rMem.addData(CRow(1, "+I", 100.0, 1), CRow(2, "+I", 50.0, 1))
        lMem.addData(CRow(1, "+I", vA, 1), CRow(2, "+I", 1.0, 2))
        q.processAllAvailable()
        (2 to 4).foreach { i =>
          lMem.addData(CRow(1, "+I", vA, i.toLong + 10)); q.processAllAvailable()
        }
        // probe: vB homes to a shard that saw NO left traffic — without
        // touches its replicated right copy would have idled out
        lMem.addData(CRow(1, "+I", vB, 20)); q.processAllAvailable()
        Thread.sleep(7000L) // key 2 (and key 1) idle past the TTL
        lMem.addData(CRow(2, "+I", 2.0, 30)); q.processAllAvailable()
      } finally q.stop()
      val m = scala.collection.mutable.Map
        .empty[(Long, Double, Double), Int].withDefaultValue(0)
      spark.table(name).selectExpr("key", "kind", "left.v", "right.v")
        .as[(Long, String, Double, Double)].collect().foreach {
          case (k, kind, lv, rv) =>
            m((k, lv, rv)) += (if (kind == "+I" || kind == "+U") 1 else -1)
        }
      m.filter(_._2 != 0).toMap
    }
    val plain = run(sharded = false, "cl_ttlshard_plain")
    val shard = run(sharded = true, "cl_ttlshard_4")
    assert(shard == plain)
    // the cross-shard probe joined (all shards shared the key's clock)...
    assert(shard.getOrElse((1L, vB, 100.0), 0) > 0)
    // ...and key 2's return found expired state on both variants
    assert(shard.getOrElse((2L, 2.0, 50.0), 0) == 0)
  }

  // ---- retract-capable COUNT(DISTINCT) (distinct-agg MapView) ----

  test("distinct aggregate: distinct count moves only on 0↔1 value-instance transitions") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogDistinct[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val q = out.writeStream.format("memory").queryName("cl_distinct")
      .outputMode(OutputMode.Append).start()
    try {
      // two instances of 5.0, one of 7.0 → distinct 2, count 3
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 5.0, 2),
                  CRow(1, "+I", 7.0, 3))
      q.processAllAvailable()
      // retract ONE 5.0 → count drops, distinct does NOT (2→1 instances)
      mem.addData(CRow(1, "-D", 5.0, 4)); q.processAllAvailable()
      // retract the LAST 5.0 → distinct drops (1→0 instances)
      mem.addData(CRow(1, "-D", 5.0, 5)); q.processAllAvailable()
      // stale retraction of a value that is not live → ignored, no emit
      mem.addData(CRow(1, "-D", 9.0, 6)); q.processAllAvailable()
      // last value retracts → key retires with -D
      mem.addData(CRow(1, "-D", 7.0, 7)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_distinct")
      .select("kind", "distinct", "count")
      .as[(String, Long, Long)].collect().toList
    assert(got == List(
      ("+U", 2L, 3L),                    // batch 1
      ("-U", 2L, 3L), ("+U", 2L, 2L),    // batch 2: count only
      ("-U", 2L, 2L), ("+U", 1L, 1L),    // batch 3: distinct drops
                                          // batch 4: stale — silent
      ("-U", 1L, 1L), ("-D", 1L, 1L)))   // batch 5: retire
  }

  test("distinct aggregate over an updating view == batch COUNT(DISTINCT) dual (seeded)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    // per-user sum view; DISTINCT over the users' current sum BUCKETS
    // (sum div 30) per constant group — bucket flips arrive as -U/+U
    val agg = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val out = Changelog.aggregateChangelogDistinct[Long, Changelog.AggChange[Long]](
      agg.groupByKey(_ => 0L), _.kind, a => math.floor(a.sum / 30.0))
    val q = out.writeStream.format("memory").queryName("cl_distinct_agg")
      .outputMode(OutputMode.Append).start()
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      CRow(rnd.nextInt(6).toLong, "+I", (rnd.nextInt(20) + 1).toDouble, i) }
    try {
      rows.grouped(11).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable() }
    } finally q.stop()
    val last = spark.table("cl_distinct_agg")
      .select("kind", "distinct", "count")
      .as[(String, Long, Long)].collect().toList.last
    val finalSums = rows.groupBy(_.key).view.mapValues(_.map(_.value).sum)
    val want = finalSums.values.map(s => math.floor(s / 30.0)).toSet.size.toLong
    assert(last._1 == "+U")
    assert(last._2 == want)
    assert(last._3 == finalSums.size.toLong)
  }

  // ---- retract-consuming Top-N (RetractableTopNFunction) ----

  test("retract Top-N: retraction of a top row admits the runner-up; " +
    "in-slice updates pair; below-slice churn is silent") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    // rowId = the CRow's ord field; rank by (value desc, rowId asc); n = 2
    val out = Changelog.topNChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), n = 2,
      kind = _.kind, score = _.value, rowId = _.ord)
    val q = out.writeStream.format("memory").queryName("cl_topn")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: ids 10(5.0) 11(9.0) 12(7.0) → slice {11, 12}; 10 below
      mem.addData(CRow(1, "+I", 5.0, 10), CRow(1, "+I", 9.0, 11),
                  CRow(1, "+I", 7.0, 12))
      q.processAllAvailable()
      // batch 2: retract the TOP row → runner-up 10 re-admitted
      mem.addData(CRow(1, "-D", 9.0, 11)); q.processAllAvailable()
      // batch 3: id 12 updates 7.0→4.0 but STAYS ranked → -U/+U pair
      mem.addData(CRow(1, "-U", 7.0, 12), CRow(1, "+U", 4.0, 12))
      q.processAllAvailable()
      // batch 4: new id 13(6.0) demotes 12 out of the slice
      mem.addData(CRow(1, "+I", 6.0, 13)); q.processAllAvailable()
      // batch 5: below-slice retraction (12) emits NOTHING
      mem.addData(CRow(1, "-D", 4.0, 12)); q.processAllAvailable()
      // batch 6: everything retracts → the slice drains
      mem.addData(CRow(1, "-D", 5.0, 10), CRow(1, "-D", 6.0, 13))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_topn")
      .select("kind", "rowId", "score", "ord")
      .as[(String, Long, Double, Long)].collect().toList.sortBy(_._4)
    assert(got == List(
      ("+I", 11L, 9.0, 1L), ("+I", 12L, 7.0, 2L),   // batch 1 (rank order)
      ("-D", 11L, 9.0, 3L), ("+I", 10L, 5.0, 4L),   // batch 2: runner-up in
      ("-U", 12L, 7.0, 5L), ("+U", 12L, 4.0, 6L),   // batch 3: in-slice update
      ("-D", 12L, 4.0, 7L), ("+I", 13L, 6.0, 8L),   // batch 4: demotion
                                                     // batch 5: silent
      ("-D", 13L, 6.0, 9L), ("-D", 10L, 5.0, 10L))) // batch 6: drain
  }

  test("retract Top-N: drain-then-rearrive stays materialize-safe (ord never restarts)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.topNChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), n = 2,
      kind = _.kind, score = _.value, rowId = _.ord)
    val q = out.writeStream.format("memory").queryName("cl_topn_drain")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 10)); q.processAllAvailable()
      mem.addData(CRow(1, "-D", 5.0, 10)); q.processAllAvailable() // drain
      mem.addData(CRow(1, "+I", 6.0, 10)); q.processAllAvailable() // return
    } finally q.stop()
    // the drain batch's -D must NOT outrank the post-drain +I: the ord
    // counter survives the drain in a tombstone, so materialize on
    // (key,rowId) yields the live row
    val fin = Changelog.materialize(
      spark.table("cl_topn_drain")
        .withColumn("mk", col("key") * 1000000L + col("rowId")),
      "mk", "kind", "ord")
      .select("rowId", "score").as[(Long, Double)].collect().toList
    assert(fin == List((10L, 6.0)))
  }

  test("semi join: drain-then-rearrive stays materialize-safe (ord never restarts)") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogSemi(left, right)
    val q = out.writeStream.format("memory").queryName("cl_semi_drain")
      .outputMode(OutputMode.Append).start()
    try {
      lMem.addData(CRow(1, "+I", 5.0, 1))
      rMem.addData(CRow(1, "+I", 100.0, 1))
      q.processAllAvailable()                                   // member
      lMem.addData(CRow(1, "-D", 5.0, 2))
      rMem.addData(CRow(1, "-D", 100.0, 2))
      q.processAllAvailable()                                   // drain
      lMem.addData(CRow(1, "+I", 7.0, 3))
      rMem.addData(CRow(1, "+I", 200.0, 3))
      q.processAllAvailable()                                   // return
    } finally q.stop()
    val fin = Changelog.materialize(
      spark.table("cl_semi_drain"), "key", "kind", "ord")
      .selectExpr("left.v").as[Double].collect().toList
    assert(fin == List(7.0))
  }

  test("updatable Top-N mode: +U with a unique rowId upserts in place, no -U needed") {
    // the reference's UpdatableTopNFunction case (input has a unique key
    // per rank row and sends updates WITHOUT retraction messages):
    // topNChangelog's insert arm REPLACES the rowId's score, so the
    // upsert-only protocol is the same operator with no -U traffic
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.topNChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), n = 2,
      kind = _.kind, score = _.value, rowId = _.ord)
    val q = out.writeStream.format("memory").queryName("cl_topn_upd")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 10), CRow(1, "+I", 9.0, 11))
      q.processAllAvailable()
      // bare +U (no -U): id 10's score jumps to 12 → overtakes 11
      mem.addData(CRow(1, "+U", 12.0, 10)); q.processAllAvailable()
      // bare +U dropping id 10 below id 11 but still in the slice
      mem.addData(CRow(1, "+U", 7.0, 10)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_topn_upd")
      .select("kind", "rowId", "score", "ord")
      .as[(String, Long, Double, Long)].collect().toList.sortBy(_._4)
    assert(got == List(
      ("+I", 11L, 9.0, 1L), ("+I", 10L, 5.0, 2L),   // batch 1, rank order
      ("-U", 10L, 5.0, 3L), ("+U", 10L, 12.0, 4L),  // in-place upsert
      ("-U", 10L, 12.0, 5L), ("+U", 10L, 7.0, 6L))) // still ranked
  }

  test("retract Top-N over an updating aggregate == batch row_number dual") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    // CRow(key=user, value=amount): aggregate per user, then global top-3
    // users by live sum — agg retraction pairs feed the rank operator
    val agg = Changelog.aggregateChangelog[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val out = Changelog.topNChangelog[Long, Changelog.AggChange[Long]](
      agg.groupByKey(_ => 0L), n = 3,
      kind = _.kind, score = _.sum, rowId = _.key)
    val q = out.writeStream.format("memory").queryName("cl_topn_agg")
      .outputMode(OutputMode.Append).start()
    val rnd = new scala.util.Random(42)
    val rows = (1 to 60).map { i =>
      CRow(key = rnd.nextInt(7).toLong, "+I", (rnd.nextInt(100) + 1).toDouble, i) }
    try {
      rows.grouped(13).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable() }
    } finally q.stop()
    // fold the emitted changelog per rowId → final top-3 set
    val fin = scala.collection.mutable.Map.empty[Long, Double]
    spark.table("cl_topn_agg").select("kind", "rowId", "score", "ord")
      .as[(String, Long, Double, Long)].collect().sortBy(_._4).foreach {
        case (k, id, sc, _) =>
          if (k == "+I" || k == "+U") fin(id) = sc
          else if (k == "-D") fin -= id
      }
    val want = rows.groupBy(_.key).view.mapValues(_.map(_.value).sum)
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(3).toMap
    assert(fin.toMap == want)
  }

  // ---- SEMI / ANTI changelog joins (StreamingSemiAntiJoinOperator) ----

  test("semi changelog join: membership flips only on 0↔1 association transitions") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogSemi(left, right)
    val q = out.writeStream.format("memory").queryName("cl_semi")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: left alone — no right association yet, nothing emitted
      lMem.addData(CRow(1, "+I", 5.0, 1)); q.processAllAvailable()
      // batch 2: first right arrival → 0→1, left row enters (+I)
      rMem.addData(CRow(1, "+I", 100.0, 1)); q.processAllAvailable()
      // batch 3: second right association → 1→2, NO emission
      rMem.addData(CRow(1, "+I", 200.0, 2)); q.processAllAvailable()
      // batch 4: one right retracts → 2→1, still a member, NO emission
      rMem.addData(CRow(1, "-D", 100.0, 3)); q.processAllAvailable()
      // batch 5: last right retracts → 1→0, left row leaves (-D)
      rMem.addData(CRow(1, "-D", 200.0, 4)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_semi")
      .selectExpr("kind", "left.v", "ord")
      .as[(String, Double, Long)].collect().toList.sortBy(_._3)
    assert(got == List(("+I", 5.0, 1L), ("-D", 5.0, 2L)))
  }

  test("anti changelog join: first match retracts, last unmatch re-admits; duplicates counted") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogAnti(left, right)
    val q = out.writeStream.format("memory").queryName("cl_anti")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two duplicate left rows, no right → both in output
      lMem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 5.0, 2))
      q.processAllAvailable()
      // batch 2: right arrives → 0→1: BOTH copies retract (join empties)
      rMem.addData(CRow(1, "+I", 100.0, 1)); q.processAllAvailable()
      // batch 3: right retracts → 1→0: both copies re-admitted
      rMem.addData(CRow(1, "-D", 100.0, 2)); q.processAllAvailable()
      // batch 4: one left copy retracts → one -U
      lMem.addData(CRow(1, "-D", 5.0, 3)); q.processAllAvailable()
      // batch 5: last left copy retracts → output empties with -D
      lMem.addData(CRow(1, "-D", 5.0, 4)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_anti")
      .selectExpr("kind", "left.v", "ord")
      .as[(String, Double, Long)].collect().toList.sortBy(_._3)
    assert(got == List(
      ("+I", 5.0, 1L), ("+I", 5.0, 2L),   // batch 1: both copies out
      // batch 2 empties the key's output → every removed row carries -D
      // (the convention shared with joinChangelog/joinChangelogOuter)
      ("-D", 5.0, 3L), ("-D", 5.0, 4L),
      ("+I", 5.0, 5L), ("+I", 5.0, 6L),   // batch 3: re-admission
      ("-U", 5.0, 7L),                     // batch 4: one copy leaves
      ("-D", 5.0, 8L)))                    // batch 5: retire
  }

  test("semi join residual cond: membership requires a PASSING association") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogSemi[Long, LSide, RSide](left, right,
      cond = (_, r) => r.v >= 150.0)
    val q = out.writeStream.format("memory").queryName("cl_semi_cond")
      .outputMode(OutputMode.Append).start()
    try {
      // right row failing the cond: key non-empty but NOT a passing match
      lMem.addData(CRow(1, "+I", 5.0, 1))
      rMem.addData(CRow(1, "+I", 100.0, 1))
      q.processAllAvailable()
      // the right view UPDATES above the threshold → retract+insert pair
      // crosses the cond boundary: association 0→1, left row enters
      rMem.addData(CRow(1, "-U", 100.0, 2), CRow(1, "+U", 200.0, 3))
      q.processAllAvailable()
      // updates back below → 1→0, left row leaves
      rMem.addData(CRow(1, "-U", 200.0, 4), CRow(1, "+U", 120.0, 5))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_semi_cond")
      .selectExpr("kind", "left.v", "ord")
      .as[(String, Double, Long)].collect().toList.sortBy(_._3)
    assert(got == List(("+I", 5.0, 1L), ("-D", 5.0, 2L)))
  }

  test("semi/anti same-batch netting: transient membership flips cancel") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogSemi(left, right)
    val q = out.writeStream.format("memory").queryName("cl_semi_net")
      .outputMode(OutputMode.Append).start()
    try {
      lMem.addData(CRow(1, "+I", 5.0, 1)); q.processAllAvailable()
      // right insert AND retract in ONE batch: 0→1→0 nets to nothing
      rMem.addData(CRow(1, "+I", 100.0, 1), CRow(1, "-D", 100.0, 2))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("cl_semi_net").count() == 0L)
  }

  test("TTL semi join: an expired key re-arrives with fresh association state") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelogSemi[Long, LSide, RSide](left, right,
      ttl = Some(IdleStateTtl(2000L)))
    val q = out.writeStream.format("memory").queryName("cl_semi_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      lMem.addData(CRow(1, "+I", 5.0, 1))
      rMem.addData(CRow(1, "+I", 100.0, 1))
      q.processAllAvailable() // member: +I emitted
      Thread.sleep(4500L)     // idle past retention — BOTH sides expire
      // a new right arrival finds no live left rows: nothing to admit
      rMem.addData(CRow(1, "+I", 300.0, 2)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_semi_ttl")
      .selectExpr("kind", "left.v")
      .as[(String, Double)].collect().toList
    assert(got == List(("+I", 5.0))) // and no further emission post-expiry
  }

  test("retract FIRST_VALUE: retracting the current first re-admits the successor") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogListAgg[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value, _.ord)
    val q = out.writeStream.format("memory").queryName("cl_first")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 9.0, 2))
      q.processAllAvailable() // first=5 (ord 1), last=9 (ord 2)
      mem.addData(CRow(1, "-D", 5.0, 1)) // the FIRST row retracts
      q.processAllAvailable() // successor (ord 2) becomes first
    } finally q.stop()
    val got = spark.table("cl_first")
      .select("kind", "first", "last", "listagg")
      .as[(String, Double, Double, String)].collect().toList
    assert(got == List(
      ("+U", 5.0, 9.0, "5,9"),
      ("-U", 5.0, 9.0, "5,9"), ("+U", 9.0, 9.0, "9")))
  }

  test("retract COLLECT: deleting one of two equal values keeps the element") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogListAgg[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value, _.ord)
    val q = out.writeStream.format("memory").queryName("cl_collect")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 7.0, 1), CRow(1, "+I", 7.0, 2),
                  CRow(1, "+I", 3.0, 3))
      q.processAllAvailable() // multiset {7×2, 3×1}
      mem.addData(CRow(1, "-D", 7.0, 1)) // one 7 retracts — BY ORD
      q.processAllAvailable() // the other 7 stays in the multiset
      mem.addData(CRow(1, "-D", 7.0, 2), CRow(1, "-D", 3.0, 3))
      q.processAllAvailable() // live set empties: -U then -D
    } finally q.stop()
    val got = spark.table("cl_collect")
      .select("kind", "collect", "count")
      .as[(String, String, Long)].collect().toList
    assert(got == List(
      ("+U", "3,7,7", 3L),
      ("-U", "3,7,7", 3L), ("+U", "3,7", 2L),
      ("-U", "3,7", 2L), ("-D", "3,7", 2L)))
  }

  test("retract LISTAGG: an upstream -U/+U pair updates the element in place") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogListAgg[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value, _.ord)
    val q = out.writeStream.format("memory").queryName("cl_listagg")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 10.0, 1), CRow(1, "+I", 20.0, 2))
      q.processAllAvailable() // listagg "10,20" in ord order
      // the ord-1 element updates 10 → 15 (retraction pair on one ord)
      mem.addData(CRow(1, "-U", 10.0, 1), CRow(1, "+U", 15.0, 1))
      q.processAllAvailable() // position kept: "15,20", not appended
    } finally q.stop()
    val got = spark.table("cl_listagg")
      .select("kind", "listagg", "count")
      .as[(String, String, Long)].collect().toList
    assert(got == List(
      ("+U", "10,20", 2L),
      ("-U", "10,20", 2L), ("+U", "15,20", 2L)))
  }

  test("retract agg staleness guard: a -U whose value no longer matches its ord is ignored") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogListAgg[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value, _.ord)
    val q = out.writeStream.format("memory").queryName("cl_stale")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 10.0, 1)); q.processAllAvailable()
      // the +U half of an in-place update lands first (its -U strayed)
      mem.addData(CRow(1, "+U", 15.0, 1)); q.processAllAvailable()
      // the late -U carries the PRE-update value: stale → ignored, no
      // emission — without the value-equality guard it would delete
      // the freshly updated row (the round-11 topNChangelog invariant,
      // which also makes same-batch -U/+U pairs order-insensitive)
      mem.addData(CRow(1, "-U", 10.0, 1)); q.processAllAvailable()
      // ord 1 must still be live: the next insert sees count 2
      mem.addData(CRow(1, "+I", 20.0, 2)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_stale").select("kind", "listagg", "count")
      .as[(String, String, Long)].collect().toList
    assert(got == List(
      ("+U", "10", 1L),
      ("-U", "10", 1L), ("+U", "15", 1L),
      ("-U", "15", 1L), ("+U", "15,20", 2L)))
  }

  test("retract stats: both moments reverse exactly and the group retires at count 0") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogStats[Long, CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val q = out.writeStream.format("memory").queryName("cl_stats")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 10.0, 1), CRow(1, "+I", 20.0, 2))
      q.processAllAvailable() // Σ=30, Σ²=500, n=2
      mem.addData(CRow(1, "-D", 20.0, 2))
      q.processAllAvailable() // retraction reverses BOTH moments exactly
      mem.addData(CRow(1, "-D", 10.0, 1))
      q.processAllAvailable() // count→0: -U then -D, state retired
      // stale retract on the retired group: ignored, no emission
      mem.addData(CRow(1, "-D", 7.0, 3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_stats")
      .select("kind", "sum", "sumsq", "count")
      .as[(String, Double, Double, Long)].collect().toList
    assert(got == List(
      ("+U", 30.0, 500.0, 2L),
      ("-U", 30.0, 500.0, 2L), ("+U", 10.0, 100.0, 1L),
      ("-U", 10.0, 100.0, 1L), ("-D", 10.0, 100.0, 1L)))
  }

  test("filterChangelog: leave drains the key's cell; never-passing keys allocate none") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.filterChangelog(
      mem.toDS().toDF(), "key", "kind", col("value") > 5)
    val ck = java.nio.file.Files.createTempDirectory("fc_drain_ck").toString
    val q = out.writeStream.format("memory").queryName("cl_filter")
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).start()
    try {
      // key 1 passes (cell allocated), key 2 fails (no cell ever)
      mem.addData(CRow(1, "+U", 10.0, 1), CRow(2, "+U", 3.0, 1))
      q.processAllAvailable()
      // key 1's new value fails → explicit -D, cell REMOVED; key 3
      // enters and stays live (the state read below is not vacuous)
      mem.addData(CRow(1, "-U", 10.0, 1), CRow(1, "+U", 4.0, 1),
                  CRow(3, "+U", 8.0, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_filter").select("key", "value", "kind")
      .as[(Long, Double, String)].collect().toList
    // batch 1 emits only key 1's entry; batch 2's two rows come from
    // DIFFERENT group keys, whose relative order Spark doesn't
    // contract — compare that tail order-insensitively
    assert(got.head == ((1L, 10.0, "+U")))
    assert(got.tail.toSet == Set((1L, 10.0, "-D"), (3L, 8.0, "+U")))
    assert(got.size == 3)
    // filterChangelog keys state on the key's canonical STRING form
    // (generic-key support, round 13)
    val keys = spark.read.format("statestore").load(ck)
      .selectExpr("key.value AS k").as[String].collect().toSet
    assert(keys == Set("3"), s"expected only the live key's cell: $keys")
  }

  test("filterChangelog TTL: an idle key's cell expires, so its next value re-enters fresh") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.filterChangelog(
      mem.toDS().toDF(), "key", "kind", col("value") > 5,
      ttl = Some(Changelog.IdleStateTtl(2000)))
    val q = out.writeStream.format("memory").queryName("cl_filter_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      // phase 1 in ONE batch (cold-batch wall time must not cross TTL)
      mem.addData(CRow(1, "+U", 10.0, 1))
      q.processAllAvailable()
      Thread.sleep(4500) // the deliberate idle period crosses the TTL
      // phase 2: the expired cell folds fresh — a live cell would emit
      // the -U(10)/+U(12) pair; expiry makes it a bare re-entry +U(12)
      mem.addData(CRow(1, "-U", 10.0, 1), CRow(1, "+U", 12.0, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_filter_ttl").select("value", "kind")
      .as[(Double, String)].collect().toList
    assert(got == List((10.0, "+U"), (12.0, "+U")))
  }

  test("filterChangelog TTL: an expired cell whose key next FAILS the filter is physically dropped") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.filterChangelog(
      mem.toDS().toDF(), "key", "kind", col("value") > 5,
      ttl = Some(Changelog.IdleStateTtl(2000)))
    val ck = java.nio.file.Files.createTempDirectory("fc_ttl_drop_ck").toString
    val q = out.writeStream.format("memory").queryName("cl_filter_ttl_drop")
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+U", 10.0, 1)) // passes → cell allocated
      q.processAllAvailable()
      Thread.sleep(4500) // idle past the TTL: the cell is dead
      // the next value FAILS the filter: expiry already removed the
      // row from the view (silently, per the TTL contract — no -D),
      // and the dead cell must be physically dropped, not parked
      mem.addData(CRow(1, "-U", 10.0, 1), CRow(1, "+U", 3.0, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_filter_ttl_drop").select("value", "kind")
      .as[(Double, String)].collect().toList
    assert(got == List((10.0, "+U"))) // no -D, no re-entry
    val keys = spark.read.format("statestore").load(ck)
      .selectExpr("key.value AS k").as[String].collect().toSet
    assert(keys.isEmpty, s"dead cell lingers after expiry+fail: $keys")
  }

  test("changelog aggregate keys on arbitrary types: string keys, no user hashing") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SRow]
    val out = Changelog.aggregateChangelog[String, SRow](
      mem.toDS().groupByKey(_.skey), _.kind, _.value)
    val q = out.writeStream.format("memory").queryName("cl_agg_str")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(SRow("web/en", "+I", 5.0, 1), SRow("web/en", "+I", 7.0, 2),
                  SRow("books", "+I", 2.0, 3))
      q.processAllAvailable()
      mem.addData(SRow("web/en", "-D", 5.0, 4)) // retraction on a string key
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_agg_str")
      .select("key", "kind", "sum", "count")
      .as[(String, String, Double, Long)].collect().toList
    assert(got.filter(_._1 == "books") == List(("books", "+U", 2.0, 1L)))
    assert(got.filter(_._1 == "web/en") == List(
      ("web/en", "+U", 12.0, 2L),
      ("web/en", "-U", 12.0, 2L), ("web/en", "+U", 7.0, 1L)))
  }

  test("changelog join keys on string keys end to end") {
    implicit val sc = spark.sqlContext
    val lmem = MemoryStream[SRow]; val rmem = MemoryStream[SRow]
    val left = lmem.toDS().map(r => (r.skey, r.kind, r.value))
    val right = rmem.toDS().map(r => (r.skey, r.kind, r.value))
    val out = Changelog.joinChangelog[String, Double, Double](left, right)
    val q = out.writeStream.format("memory").queryName("cl_join_str")
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(SRow("src-a", "+I", 1.0, 1))
      rmem.addData(SRow("src-a", "+I", 2.0, 1), SRow("src-b", "+I", 9.0, 2))
      q.processAllAvailable()
      rmem.addData(SRow("src-a", "-D", 2.0, 3)) // pair retracts
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_join_str")
      .select("key", "kind", "left", "right")
      .as[(String, String, Double, Double)].collect().toList
    assert(got == List(
      ("src-a", "+I", 1.0, 2.0),
      ("src-a", "-D", 1.0, 2.0)))
  }
}

case class LSide(v: Double)
case class RSide(v: Double)
case class LAgg(sum: Double, count: Long)
case class RAgg(sum: Double, count: Long)
