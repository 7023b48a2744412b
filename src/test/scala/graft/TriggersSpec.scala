package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Triggers

case class TEv(k: Long, t: Long, v: Double, ets: Timestamp)

class TriggersSpec extends AnyFunSuite {
  lazy val spark = graft.TestSession.spark
  import spark.implicits._

  private val base = 1700000000000L

  private def stream(evs: Seq[(Long, Long, Double)], name: String)(
      mk: org.apache.spark.sql.KeyValueGroupedDataset[Long, TEv] =>
          org.apache.spark.sql.Dataset[(Long, Double, Long)]) = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val ds = mem.toDS()
      .withColumn("ets", (($"_2" + base) / 1000).cast("timestamp"))
      .select($"_1".as("k"), ($"_2" + base).as("t"), $"_3".as("v"), $"ets")
      .as[TEv]
    val q = mk(ds.groupByKey(_.k))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      evs.grouped(4).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[(Long, Double, Long)].collect().toSeq
  }

  test("count trigger with purge fires fixed-size windows") {
    val evs = (1 to 7).map(i => (1L, i * 1000L, i.toDouble))
    val got = stream(evs, "tr_count") { g =>
      Triggers.window[Long, TEv, (Long, Double, Long)](
        g, Triggers.CountTrigger(3), Triggers.KeepAll[TEv](),
        purge = true, orderBy = _.t) {
        (k, w) => (k, w.map(_.v).sum, w.size.toLong)
      }
    }
    // windows [1,2,3] and [4,5,6]; 7 still buffered
    assert(got.toSet == Set((1L, 6.0, 3L), (1L, 15.0, 3L)))
  }

  test("count evictor trims the fired window without purging") {
    val evs = (1 to 6).map(i => (1L, i * 1000L, i.toDouble))
    val got = stream(evs, "tr_evict") { g =>
      Triggers.window[Long, TEv, (Long, Double, Long)](
        g, Triggers.CountTrigger(3), Triggers.CountEvictor[TEv](2),
        purge = false, orderBy = _.t) {
        (k, w) => (k, w.map(_.v).sum, w.size.toLong)
      }
    }
    // GlobalWindow grows 3,4,5,6 — evictor keeps last 2 at each fire
    assert(got.toSet == Set((1L, 5.0, 2L), (1L, 7.0, 2L), (1L, 9.0, 2L),
                            (1L, 11.0, 2L)))
  }

  test("delta evictor removes elements too far from the newest at fire time") {
    val evs = Seq((1L, 1000L, 1.0), (1L, 2000L, 8.0), (1L, 3000L, 9.0),
                  (1L, 4000L, 10.0), (1L, 5000L, 2.0), (1L, 6000L, 3.0))
    val got = stream(evs, "tr_delta_evict") { g =>
      Triggers.window[Long, TEv, (Long, Double, Long)](
        g, Triggers.CountTrigger(3),
        Triggers.DeltaEvictor[TEv](3.0, (a, b) => math.abs(b.v - a.v)),
        purge = true, orderBy = _.t) {
        (k, w) => (k, w.map(_.v).sum, w.size.toLong)
      }
    }
    // window [1,8,9]: newest 9, |9-1|=8 >= 3 evicts the 1 → sum 17, n 2
    // window [10,2,3]: newest 3, |3-10|=7 >= 3 evicts the 10 → sum 5, n 2
    assert(got.toSet == Set((1L, 17.0, 2L), (1L, 5.0, 2L)))
  }

  test("delta trigger fires on value jumps past the threshold") {
    val evs = Seq((1L, 1000L, 1.0), (1L, 2000L, 2.0), (1L, 3000L, 9.0),
                  (1L, 4000L, 9.5), (1L, 5000L, 20.0))
    val got = stream(evs, "tr_delta") { g =>
      Triggers.window[Long, TEv, (Long, Double, Long)](
        g, Triggers.DeltaTrigger[TEv](5.0, (a, b) => b.v - a.v),
        Triggers.KeepAll[TEv](), purge = true, orderBy = _.t) {
        (k, w) => (k, w.last.v, w.size.toLong)
      }
    }
    // fires at 9.0 (9-1>5) then at 20.0 (20-9>5)
    assert(got.toSet == Set((1L, 9.0, 3L), (1L, 20.0, 2L)))
  }

  test("continuous event-time trigger fires at interval boundaries") {
    val evs = Seq((1L, 1000L, 1.0), (1L, 2000L, 2.0), (1L, 6000L, 3.0),
                  (1L, 7000L, 4.0), (1L, 12000L, 5.0))
    val got = stream(evs, "tr_cont") { g =>
      Triggers.window[Long, TEv, (Long, Double, Long)](
        g, Triggers.ContinuousEventTimeTrigger[TEv](5000L, _.t),
        Triggers.KeepAll[TEv](), purge = false, orderBy = _.t) {
        (k, w) => (k, w.map(_.v).sum, w.size.toLong)
      }
    }
    // anchored at t=1000: fires at 6000 (window 1,2,3) and 12000 (all 5)
    assert(got.toSet == Set((1L, 6.0, 3L), (1L, 15.0, 5L)))
  }

  test("time evictor keeps only the recent span at fire time") {
    val evs = Seq((1L, 1000L, 1.0), (1L, 2000L, 2.0), (1L, 10000L, 3.0))
    val got = stream(evs, "tr_time") { g =>
      Triggers.window[Long, TEv, (Long, Double, Long)](
        g, Triggers.CountTrigger(3), Triggers.TimeEvictor[TEv](3000L, _.t),
        purge = true, orderBy = _.t) {
        (k, w) => (k, w.map(_.v).sum, w.size.toLong)
      }
    }
    // at fire, only t=10000 is within 3s of the newest
    assert(got.toSet == Set((1L, 3.0, 1L)))
  }
}
