package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StateBackends

/**
 * State-backend parity (SURVEY §2.9, RocksDBStateBackend analogue):
 * the same streaming queries must produce identical results under the
 * in-heap HDFS-backed provider and the spill-to-disk RocksDB provider —
 * backend choice is an ops decision (state size vs heap), never a
 * semantics decision, exactly as in the reference.
 */
class StateBackendSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Replay `documents` as a 2-batch stream dedup under `provider`,
    * returning the emitted digest set. */
  private def streamDedup(provider: String): Set[String] = {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
    val root = Files.createTempDirectory("graft_backend").toString
    docs.repartition(4).write.mode("overwrite").parquet(s"$root/in")
    StateBackends.withProvider(spark, provider) {
      val dd = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2).parquet(s"$root/in")
        .select(md5(col("text")).as("digest"))
        .dropDuplicates("digest")
      val q = dd.writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ck")
        .start()
      q.processAllAvailable(); q.stop()
    }
    spark.read.parquet(s"$root/out").as[String].collect().toSet
  }

  test("RocksDB and HDFS-backed providers produce identical streaming dedup state") {
    val rocks = streamDedup(StateBackends.RocksDb)
    val heap = streamDedup(StateBackends.HdfsBacked)
    assert(rocks.nonEmpty)
    assert(rocks == heap)
  }

  test("flatMapGroupsWithState (changelog aggregate chain) runs under RocksDB") {
    // the q245 pipeline: three chained stateful operators; RocksDB must
    // carry the keyed state across micro-batches bit-identically.
    val viaRocks = StateBackends.withProvider(spark, StateBackends.RocksDb) {
      graft.streaming.ReplayQueries.changelogJoinReplay(
          spark, "/root/testdata/sf0.001", nFiles = 4, filesPerTrigger = 2)
        .collect().map(_.toSeq).toSet
    }
    val viaHeap =
      graft.streaming.ReplayQueries.changelogJoinReplay(
          spark, "/root/testdata/sf0.001", nFiles = 4, filesPerTrigger = 2)
        .collect().map(_.toSeq).toSet
    assert(viaRocks.nonEmpty)
    assert(viaRocks == viaHeap)
  }
}
