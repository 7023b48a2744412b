package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Global ranking at scale. A plain `Window.orderBy(...)` with no
 * PARTITION BY (SURVEY §2.6 — global ROW_NUMBER/RANK) collapses the
 * whole dataset into ONE window partition: a single-task sort that dies
 * at 100 TB (Spark even warns "No Partition Defined for Window").
 *
 * This operator computes the same global row_number in three fully
 * parallel steps (the classic range-partitioned rank):
 *   1. repartitionByRange on the sort key (range exchange — sampled
 *      bounds, same mechanism as orderBy);
 *   2. row_number within each range partition (window PARTITIONed by the
 *      range-partition id — parallel per partition);
 *   3. add per-partition offsets (prefix sums of partition sizes — a
 *      P-row collect, P = shuffle partitions).
 *
 * Only the P partition sizes ever touch the driver.
 */
object GlobalRank {

  /**
   * @param sortCols sort key (must make the order deterministic —
   *                 include a unique tiebreak column)
   * @param outCol   name of the produced global row-number column
   */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
                    outCol: String = "row_num"): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    // cache: the size scan and the ranked output read the same exchange
    val mat = ranged.localCheckpoint()
    val sizes = mat.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sizes.toSeq.map { case (pid, n) =>
      val o = (pid, acc); acc += n; o
    }
    if (offsets.isEmpty)
      return df.withColumn(outCol, lit(0L)).limit(0)
    val offsetDf = df.sparkSession
      .createDataFrame(offsets).toDF("__pid2", "__offset")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    mat.join(broadcast(offsetDf), col("__pid") === col("__pid2"))
      .withColumn(outCol, row_number().over(w).cast("long") + col("__offset"))
      .drop("__pid", "__pid2", "__offset")
  }
}
