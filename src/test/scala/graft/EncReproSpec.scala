package graft

import java.sql.Timestamp
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Changelog, TemporalJoin}

class EncReproSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("TJState encoder round-trips lists of Bin payloads") {
    type L = (Long, Timestamp, Changelog.Bin)
    type R = (Long, Timestamp, Long, Changelog.Bin)
    implicit val stE: Encoder[TemporalJoin.TJState[L, R]] = ExpressionEncoder[TemporalJoin.TJState[(Long, Timestamp, Changelog.Bin), (Long, Timestamp, Long, Changelog.Bin)]]()
    def bin(b: Byte*) = Changelog.Bin(b.toArray)
    val st = TemporalJoin.TJState[L, R](
      List((5000L, (1L, new Timestamp(5000L), bin(3, 3))),
           (3000L, (1L, new Timestamp(3000L), bin(2, 2))),
           (500L, (1L, new Timestamp(500L), bin(1, 1)))),
      List((5000L, 101L, (1L, new Timestamp(5000L), 101L, bin(9))),
           (1000L, 100L, (1L, new Timestamp(1000L), 100L, bin(8)))))
    val ds = spark.createDataset(Seq(st))(stE)
    val back = ds.collect().head
    info(back.toString)
    assert(back.probes.length == 3, s"probes: ${back.probes}")
    assert(back.versions.length == 2)
    assert(back == st)
  }
}
