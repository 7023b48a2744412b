package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Keyed UPSERT sink on plain parquet — the reference's upsert-sink
 * family (upsert-kafka, JDBC upsert: `T-COMMON/connector/sink/
 * DynamicTableSink` with UPDATE_AFTER semantics) re-expressed as a
 * `foreachBatch` merge, no table-format dependency.
 *
 * Mechanics per micro-batch:
 *  - rows are hashed into a FIXED bucket count on the upsert key; the
 *    sink directory is partitioned by that bucket;
 *  - only the buckets TOUCHED by the batch are read back, merged
 *    (keep the highest `seqCol` per key — a deterministic total order,
 *    ties broken by nothing: supply a unique seq), and rewritten via
 *    dynamic partition overwrite. Untouched buckets are never read or
 *    written, so per-batch cost follows the batch's key spread, not
 *    table size.
 *  - idempotent across retries/restarts by construction: re-merging an
 *    already-applied batch reproduces the identical bucket contents
 *    (merge is a deterministic function of {existing ∪ batch}).
 *
 * 100 TB: bucket count bounds the per-batch collect (ints, ≤ buckets)
 * and sizes rewrite granularity — the knob trades write amplification
 * (few huge buckets) against small files (many tiny ones). A table
 * format (Delta/Iceberg MERGE) replaces this mechanically when
 * available; the operator's contract is the same.
 */
object StreamSinks {

  def upsertParquet(updates: DataFrame, path: String, checkpoint: String,
                    keyCols: Seq[String], seqCol: String,
                    buckets: Int = 64): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, path, keyCols, seqCol, buckets)
      }
      .start()

  /** The merge itself — public as the batch upsert/SCD1 operator
    * (`MERGE INTO … WHEN MATCHED UPDATE` over plain parquet): apply a
    * batch of keyed updates to the table at `path`, keeping the highest
    * `seqCol` per key. Deterministic and idempotent (re-applying a
    * batch is a no-op). */
  def applyBatch(batch: DataFrame, path: String,
                 keyCols: Seq[String], seqCol: String,
                 buckets: Int): Unit = {
    val s = batch.sparkSession
    // Cache the bucketed batch for the duration of the merge: inside
    // foreachBatch every action on the batch frame RE-EXECUTES the
    // micro-batch plan (source re-read, stateful-operator re-run) — the
    // affected-buckets collect and the merge union would each pay it.
    // With the cache the plan runs once (populated by the collect, read
    // back by the merge), which both halves the per-batch cost and
    // removes a re-execution of state-bearing operators.
    val cache = s.conf.getOption("spark.graft.upsert.cacheBatch")
      .forall(_.toBoolean) // kill switch; default on
    val withB0 = batch.withColumn("__bucket",
      pmod(hash(keyCols.map(col): _*), lit(buckets)))
    val withB = if (cache) withB0.persist() else withB0
    try {
      // One action doubles as the empty-batch check (empty ⇒ no affected
      // buckets) — a separate batch.isEmpty would run the batch plan a
      // second time on every non-empty micro-batch.
      val affected = withB.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSeq // bounded by `buckets`
      if (affected.isEmpty) return
      val existing =
        try s.read.parquet(path).filter(col("__bucket").isin(affected: _*))
        catch { case _: org.apache.spark.sql.AnalysisException =>
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            withB.schema) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col(seqCol).desc)
      val merged = existing.unionByName(withB)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        // break the read-path/write-path cycle before overwriting
        .localCheckpoint()
      // writer-scoped dynamic overwrite: only the touched __bucket
      // partitions are replaced, without mutating the session-wide
      // partitionOverwriteMode (which would silently change the semantics
      // of unrelated overwrite writes in the same session)
      merged.write.partitionBy("__bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(path)
    } finally { if (cache) withB.unpersist(blocking = false) }
  }

  /** Read the upsert table back (drops the bucketing column). */
  def readUpsertTable(s: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame =
    s.read.parquet(path).drop("__bucket")
}
