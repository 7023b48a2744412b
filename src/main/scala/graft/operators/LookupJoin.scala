package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.{FiniteDuration, DurationInt}

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
   * Async lookup against an arbitrary (serializable) service function
   * with a SLIDING window of up to `maxInFlight` concurrent requests per
   * partition (AsyncWaitOperator.java:78's ordered/unordered stream
   * element queues): a new request is issued the moment a slot frees, so
   * one slow call delays only its own result, never a whole batch.
   *
   *  - `ordered = false` (Flink unordered mode): results emit in
   *    COMPLETION order — minimum latency.
   *  - `ordered = true` (Flink ordered mode): results emit in probe
   *    order — a slow head blocks emission but not the other in-flight
   *    requests.
   *
   * `timeout` bounds each individual wait (AsyncWaitOperator's per
   * request timeout).
   */
  def async[V, R: Encoder](probe: Dataset[V], maxInFlight: Int,
                           ordered: Boolean = false,
                           timeout: FiniteDuration = 5.minutes)(
      service: V => R): Dataset[R] = {
    require(maxInFlight > 0)
    probe.mapPartitions { it =>
      // dedicated pool sized to maxInFlight: the global pool is bounded by
      // CPU count, which would silently cap the in-flight window below the
      // requested value for I/O-bound services (lookups are waits, not
      // compute). Daemon threads; idle threads retire after 10s so a
      // finished partition leaks nothing.
      val pool = new java.util.concurrent.ThreadPoolExecutor(
        maxInFlight, maxInFlight, 10L, java.util.concurrent.TimeUnit.SECONDS,
        new java.util.concurrent.LinkedBlockingQueue[Runnable](),
        (r: Runnable) => {
          val t = new Thread(r, "graft-async-lookup")
          t.setDaemon(true)
          t
        })
      pool.allowCoreThreadTimeOut(true)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      if (ordered) new Iterator[R] {
        private val inFlight = scala.collection.mutable.Queue.empty[Future[R]]
        private def fill(): Unit =
          while (inFlight.size < maxInFlight && it.hasNext) {
            // draw from the source iterator on THIS thread — Future's
            // by-name body runs on a pool thread and would race on `it`
            val v = it.next()
            inFlight += Future(service(v))
          }
        def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        def next(): R = {
          fill()
          val r = Await.result(inFlight.dequeue(), timeout)
          fill()
          r
        }
      } else new Iterator[R] {
        private val done =
          new java.util.concurrent.LinkedBlockingQueue[scala.util.Try[R]]()
        private var inFlight = 0
        private def fill(): Unit =
          while (inFlight < maxInFlight && it.hasNext) {
            val v = it.next()
            inFlight += 1
            Future(service(v)).onComplete(done.put)
          }
        def hasNext: Boolean = { fill(); inFlight > 0 }
        def next(): R = {
          fill()
          val t = done.poll(timeout.toMillis,
                            java.util.concurrent.TimeUnit.MILLISECONDS)
          if (t == null)
            throw new java.util.concurrent.TimeoutException(
              s"async lookup did not complete within $timeout")
          inFlight -= 1
          fill()
          t.get
        }
      }
    }
  }
}
