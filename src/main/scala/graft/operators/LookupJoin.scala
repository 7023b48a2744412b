package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions.broadcast

/**
 * Lookup join (SURVEY §2.3: LookupJoinRunner / AsyncLookupJoinRunner +
 * AsyncWaitOperator — per-row point lookups into an external table,
 * `FOR SYSTEM_TIME AS OF proctime`).
 *
 * Spark-first mapping:
 *  - `snapshot`: when the lookup table is scannable, the right answer is
 *    a broadcast hash join against a point-in-time snapshot — no network
 *    round-trips at all, and at 100 TB the probe side never shuffles.
 *  - `async`: when the "table" is truly an external service, probe
 *    per-partition with a bounded pool of in-flight Futures
 *    (mapPartitions — one client per partition, like the reference's
 *    per-subtask AsyncWaitOperator queue). Unordered completion within
 *    the partition ≈ Flink's unordered mode.
 */
object LookupJoin {

  /** Broadcast-snapshot lookup join (left outer: unmatched probes keep
    * null lookup columns, like Flink's left lookup join). */
  def snapshot(probe: DataFrame, lookupTable: DataFrame,
               probeKey: String, lookupKey: String): DataFrame =
    probe.join(broadcast(lookupTable),
      probe(probeKey) === lookupTable(lookupKey), "left")

  /**
   * Async lookup against an arbitrary (serializable) service function,
   * `maxInFlight` concurrent requests per partition.
   */
  def async[V, R: Encoder](probe: Dataset[V], maxInFlight: Int)(
      service: V => R): Dataset[R] =
    probe.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      it.grouped(maxInFlight).flatMap { batch =>
        Await.result(
          Future.sequence(batch.map(v => Future(service(v)))),
          5.minutes)
      }
    }
}
