package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Changelog, TemporalJoin}

/** Temporary isolation spec for the Bin transport through the temporal
  * join state (multiple ready probes in one sweep). */
class BinReproSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder, StringToColumn}

  private val base = 1700000000000L

  test("temporal join emits distinct Bin payloads per sweep") {
    implicit val sc = spark.sqlContext
    implicit val keyE: Encoder[Long] = ExpressionEncoder()
    implicit val pe: Encoder[(Long, Timestamp, Changelog.Bin)] = ExpressionEncoder()
    implicit val ve: Encoder[(Long, Timestamp, Long, Changelog.Bin)] = ExpressionEncoder()
    implicit val tagE: Encoder[TemporalJoin.TaggedK[
      Long, (Long, Timestamp, Changelog.Bin), (Long, Timestamp, Long, Changelog.Bin)]] = ExpressionEncoder()
    implicit val stE: Encoder[TemporalJoin.TJState[
      (Long, Timestamp, Changelog.Bin), (Long, Timestamp, Long, Changelog.Bin)]] = ExpressionEncoder()
    implicit val outE: Encoder[((Long, Timestamp, Changelog.Bin),
      Option[(Long, Timestamp, Long, Changelog.Bin)])] = ExpressionEncoder()

    val pmem = MemoryStream[(Long, Long, Long)]
    val vmem = MemoryStream[(Long, Long, Double, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
      timestamp_millis($"_3" + base).as("pts"))
    val vdf = vmem.toDS().select($"_1".as("vk"), $"_2".as("vid"),
      $"_3".as("vval"), timestamp_millis($"_4" + base).as("vts"))

    val probes = pdf.select(col("pk").cast("long"), col("pts"),
      Changelog.packPayload(Seq("pk", "pid", "pts"))).as[(Long, Timestamp, Changelog.Bin)]
    val vers = vdf.select(col("vk").cast("long"), col("vts"),
      col("vid").cast("long"),
      Changelog.packPayload(Seq("vk", "vid", "vval", "vts")))
      .as[(Long, Timestamp, Long, Changelog.Bin)]

    val j = TemporalJoin.streamAsOfKeyed[Long, (Long, Timestamp, Changelog.Bin),
        (Long, Timestamp, Long, Changelog.Bin)](
      probes, vers, _._1, _._1, _._2, _._2, _._3, "1 second").toDF()

    val pSchema = pdf.schema
    val decoded = j.select(
      Changelog.unpackPayload(col("_1._3.bytes"), pSchema).as("__l"),
      col("_1._2").cast("long").as("tsl"),
      col("_1._3.bytes").as("raw"))
      .select(col("__l.pid").as("pid"), col("tsl"), hex(col("raw")).as("rawhex"))

    val sink = "bin_repro_sink"
    val q = decoded.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      vmem.addData((1L, 100L, 10.0, 1000L), (1L, 101L, 20.0, 5000L))
      pmem.addData((1L, 1L, 500L), (1L, 2L, 3000L), (1L, 3L, 5000L),
                   (1L, 4L, 9000L), (2L, 5L, 4000L))
      q.processAllAvailable()
      pmem.addData((9L, 90L, 10000000L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sink).collect()
    rows.foreach(r => info(r.toString))
    val got = rows.map(_.getLong(0)).filter(_ < 90L).toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L), s"got $got")
  }
}
