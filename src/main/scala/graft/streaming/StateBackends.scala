package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Streaming state-backend selection (SURVEY §2.9) — the analogue of the
 * reference's pluggable state backends (heap `MemoryStateBackend` vs
 * `flink-state-backends/flink-statebackend-rocksdb/.../RocksDBStateBackend.java`):
 * Spark's equivalent axis is the state-store provider. The default
 * HDFS-backed provider keeps each partition's state as an in-heap map
 * (fine while keyed state fits executor memory); the RocksDB provider
 * spills state to local disk with incremental checkpointing, which is
 * the 100 TB answer for unbounded keyed state — a dedup/session/join
 * state that grows past the heap keeps running instead of OOMing.
 *
 * Provider choice is fixed at a query's FIRST checkpoint, so switching
 * requires a fresh checkpoint dir; `withProvider` scopes the conf with
 * set-and-restore, consistent with ReplayQueries.withStatePartitions.
 */
object StateBackends {

  /** Spill-to-disk state store (RocksDB, bundled with Spark 4). */
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Default in-heap provider (snapshot files on the checkpoint fs). */
  val HdfsBacked =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  private val key = "spark.sql.streaming.stateStore.providerClass"

  /** Run `body` with the given state-store provider, restoring the
    * previous setting afterwards even on failure. */
  def withProvider[T](s: SparkSession, provider: String)(body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, provider)
    try body finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
  }
}
