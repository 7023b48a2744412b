package graft

import org.apache.spark.sql.SparkSession

/**
 * Session bootstrap for the engine: the analogue of the reference's
 * `TableEnvironment.create(EnvironmentSettings)` entry point
 * (flink-table/flink-table-api-java/.../TableEnvironmentImpl.java:626 via
 * SURVEY §3.1). Creating a session here installs:
 *
 *  - engine configuration tuned for the deployment (shuffle parallelism,
 *    AQE with skew-join handling, broadcast threshold),
 *  - the function-parity registry (graft.functions — the scalar/agg
 *    functions Flink has and Spark lacks).
 *
 * Scale notes: AQE is the Spark-native replacement for the reference's
 * cost-based exchange selection (BatchExecExchange + broadcast threshold,
 * SURVEY §4.2): it re-plans shuffles at runtime, coalesces small
 * partitions and splits skewed ones — exactly what you want on a
 * 1000-executor cluster where static planning guesses wrong.
 */
object GraftSession {

  /** Apply engine defaults onto an existing builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", shufflePartitions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // events.ts is parquet TIMESTAMP(NANOS): read as LongType (ns since
    // epoch) and normalize to µs in Tables (SURVEY §7.4.7).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // App-level checkpoint checksums off (measured, ProfileReplay r17:
    // every checkpoint/WAL/state-delta file write paid a sibling
    // checksum write — ~2x the small-file count per micro-batch).
    // Production checkpoint stores (HDFS/S3) already checksum at the
    // storage layer, and the reference writes its checkpoint streams
    // without app-level checksums (org.apache.flink.runtime.state.
    // filesystem.FsCheckpointStreamFactory — plain FSDataOutputStream).
    // Kill switch: set it back to true.
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // Checkpoint file manager: the default FileContext-based manager's
    // rename path (AbstractFileSystem.renameInternal) calls
    // getFileLinkStatus, which without libhadoop native FORKS a
    // `readlink` subprocess per checkpoint file (Shell.execCommand via
    // FileUtil.readLink) — measured 20–40 ms per WAL/state-delta/sink-
    // metadata write, the dominant share of the streaming micro-batch
    // floor (jstack histogram, FloorProbe r18: stateful floor 2.04 s →
    // 1.21 s with the FileSystem-based manager). The FileSystem-based
    // manager renames through java.io.File.renameTo — atomic on POSIX
    // filesystems, no subprocess. On HDFS both managers are atomic; on
    // object stores neither is (their committers apply either way).
    // Kill switch: unset or set back to the FileContext manager.
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing." +
        "FileSystemBasedCheckpointFileManager")
    // (fs.file.impl=RawLocalFileSystem was measured here too — ~8% more
    // off the floor by skipping .crc siblings — but REVERTED: Hadoop's
    // FileSystem.getLocal hard-casts the "file" scheme to
    // LocalFileSystem, which the RocksDB state backend's
    // copyFromLocalFile path exercises; the cast fails. Kept out.)
    .config("spark.ui.enabled", "false")

  /** Local session for tests/benchmarks. Warehouse (for saveAsTable /
    * bucketed tables) under java.io.tmpdir — static conf, builder-only. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft-warehouse"
    val spark = tune(SparkSession.builder().master(s"local[$cores]"), cores)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    init(spark)
    spark
  }

  /** Install engine pieces on any already-built session. Idempotent.
    * Also applies the runtime-settable SQL confs so a consumer attaching
    * to a pre-existing session (spark-shell, notebook) still reads the
    * ns-precision fixtures and gets UTC semantics. */
  def init(spark: SparkSession): SparkSession = {
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    functions.GraftFunctions.registerAll(spark)
    // partial-aggregation pushdown through Expand (rollup/cube/grouping
    // sets) — idempotent add; kill switch spark.graft.preaggExpand=false
    if (!spark.experimental.extraOptimizations
          .contains(plans.PreAggregateBeforeExpand)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.PreAggregateBeforeExpand
    }
    spark
  }
}
