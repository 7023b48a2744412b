package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout writer — the piece that decides what the NEXT job's scan
 * costs. Two failure modes dominate 100 TB tables: too many small files
 * (driver-side listing + per-file open overhead swamps the read) and
 * unclustered data (min/max row-group stats prune nothing). This writer
 * fixes both in one pass:
 *
 *  - one range exchange on the cluster key (`repartitionByRange`) +
 *    `sortWithinPartitions` gives every output file a tight, pairwise
 *    non-overlapping key envelope — parquet row-group stats then prune
 *    file-count-proportional work for any range/point predicate on the
 *    key (use a `ZOrder16` column as the key to cover two dimensions,
 *    see plans/zorder.scala);
 *  - file count = ⌈rows / targetRowsPerFile⌉ computed from a count()
 *    (a parquet-metadata-only aggregate on file sources — no data
 *    scan), with `maxRecordsPerFile` as the hard backstop, so file
 *    sizes land near the target regardless of skew in the key.
 *
 * The reference's filesystem sink rolls files by size/time
 * (`flink-connector-files` StreamingFileSink rolling policies); batch
 * layout-for-pruning is the lakehouse-era counterpart (OPTIMIZE /
 * CLUSTER BY in public Delta/Iceberg practice), re-expressed here as
 * plain Spark.
 */
object LayoutOps {

  /** Rows-per-file to aim for; tune to land files near the row-group /
    * HDFS-block sweet spot for the row width at hand.
    *
    * The sizing count() and the write are two actions. On a bare file
    * scan the count is a parquet-metadata-only aggregate (no data
    * read), so running the scan "twice" is free; for any computed
    * pipeline the input is persisted around the two passes — the
    * pipeline executes ONCE, the write reads the materialized blocks,
    * and a nondeterministic input cannot diverge between count and
    * write (both see identical rows). */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[Column],
                     targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0)
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.{
      DataSourceV2Relation, DataSourceV2ScanRelation}
    val bareScan = df.queryExecution.optimizedPlan match {
      case _: LogicalRelation | _: DataSourceV2Relation |
           _: DataSourceV2ScanRelation => true
      case _ => false
    }
    val src = if (bareScan) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = src.count()
      val nFiles = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
        .min(Int.MaxValue.toLong).toInt
      src.repartitionByRange(nFiles, clusterCols: _*)
        .sortWithinPartitions(clusterCols: _*)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", targetRowsPerFile)
        .parquet(path)
    } finally if (!bareScan) src.unpersist()
  }

  /** Compact an existing parquet directory in place-adjacent fashion:
    * read, re-cluster, write to `outPath` (never overwrite the source
    * you are still reading — the caller swaps directories atomically). */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, clusterCols: Seq[Column],
              targetRowsPerFile: Long): Unit =
    writeClustered(spark.read.parquet(inPath), outPath, clusterCols,
      targetRowsPerFile)

  /** Per-file (min, max, rows) envelope audit of a parquet directory for
    * one key column — the verification that clustering actually bought
    * pruning power: sorted by min, envelopes must not overlap. */
  def envelopes(spark: org.apache.spark.sql.SparkSession, path: String,
                keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
           count(lit(1)).as("rows"))
}
