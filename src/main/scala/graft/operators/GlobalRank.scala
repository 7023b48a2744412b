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
    val mat = ranged.transform(Materialize.frame)
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

  /**
   * Global ordered cumulative SUM at scale — the same three-step
   * range-partitioned pattern as [[withRowNumber]], with per-partition
   * SUM prefix totals as the offsets instead of row counts. Equals
   * `sum(value) OVER (ORDER BY sortCols ROWS UNBOUNDED PRECEDING)`
   * without the single-task global window. Exact for integral values
   * (long arithmetic end to end); only the P partition totals touch the
   * driver.
   *
   * @param sortCols deterministic total order (include a unique tiebreak)
   * @param valueCol integral column to accumulate
   */
  def withCumSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                 outCol: String = "cum_sum"): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val mat = ranged.transform(Materialize.frame)
    val totals = mat.groupBy("__pid")
      .agg(sum(valueCol.cast("long")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.toSeq.map { case (pid, t) =>
      val o = (pid, acc); acc += t; o
    }
    if (offsets.isEmpty)
      return df.withColumn(outCol, lit(0L)).limit(0)
    val offsetDf = df.sparkSession
      .createDataFrame(offsets).toDF("__pid2", "__offset")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mat.join(broadcast(offsetDf), col("__pid") === col("__pid2"))
      .withColumn(outCol,
        sum(valueCol.cast("long")).over(w) + col("__offset"))
      .drop("__pid", "__pid2", "__offset")
  }
}
