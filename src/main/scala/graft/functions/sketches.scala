package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Mergeable sketches as typed Aggregators (SURVEY §2.11 AggregateFunction
 * surface; the streaming/merge-tree dual of operators/SketchOps.scala's
 * SQL-composed forms). An Aggregator's (zero, reduce, merge, finish) IS
 * the mergeable-summary contract: Spark applies reduce map-side per
 * partition and merge at the exchange — and in Structured Streaming the
 * buffer is the keyed state carried across micro-batches, so
 * `groupBy(...).agg(hll_sketch(...))` in update mode maintains a
 * per-group distinct-count sketch incrementally, the same way the
 * reference keeps accumulator state in its AggregateFunction runtime
 * (SURVEY §2.4; RUNTIME/runtime/operators/aggregate/).
 *
 * Hashing matches SketchOps bit-for-bit (md5-derived 60-bit values), so
 * the Aggregator path and the SQL-composed path produce IDENTICAL
 * estimates on identical input — spec-asserted, and the property a user
 * needs when a batch backfill must agree with the streaming view.
 */
object Sketches {

  /** 60-bit portable hash: first 15 hex chars of md5("seed:" + s). */
  private[graft] def h60(seed: String, s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest((seed + ":" + s).getBytes("UTF-8"))
    // 15 hex chars = first 7.5 bytes — take 8 bytes, drop the low nibble
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  val HllM = 64 // registers (p=6), matches SketchOps

  /** HLL register update for one value: (register index, rank). */
  private[graft] def hllEntry(s: String): (Int, Int) = {
    val h = h60("hll", s)
    val reg = (h % HllM).toInt
    val rem = h / HllM
    val rank =
      if (rem == 0L) 55
      else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    (reg, rank)
  }

  /** Estimate from a full register array (identical arithmetic to the
    * SketchOps q151 SQL: integer-scaled power-of-two sum, raw harmonic
    * estimate, Flajolet linear-counting small-range correction). */
  private[graft] def hllEstimate(regs: Array[Int]): Double = {
    var ssum = 0L
    var v = 0
    var i = 0
    while (i < HllM) {
      ssum += (1L << (55 - regs(i)))
      if (regs(i) == 0) v += 1
      i += 1
    }
    val eRaw = 0.709 * math.pow(2, 67) / ssum
    if (eRaw <= 2.5 * HllM && v > 0) HllM.toDouble * math.log(HllM.toDouble / v)
    else eRaw
  }

  /**
   * `HllDistinct`: mergeable distinct-count estimate. Buffer = the 64
   * max-rank registers; merge = element-wise max (associative,
   * commutative, idempotent — re-adding a value never changes the
   * sketch, so at-least-once replay is safe).
   */
  class HllDistinct extends Aggregator[String, Array[Int], Double] {
    def zero: Array[Int] = new Array[Int](HllM)
    def reduce(b: Array[Int], s: String): Array[Int] = {
      val (reg, rank) = hllEntry(s)
      if (rank > b(reg)) b(reg) = rank
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < HllM) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(r: Array[Int]): Double = hllEstimate(r)
    def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val CmsDepth = 3
  val CmsWidth = 256 // matches SketchOps q150

  /**
   * `CmsSketch`: mergeable CountMin sketch over a token stream. Buffer =
   * the flattened 3×256 cell counts; merge = element-wise sum. `finish`
   * returns the cells (query-side estimation = min over a token's 3
   * cells, see SketchOps.q150); estimation is separate because the
   * sketch, not any one estimate, is the group state a pipeline stores.
   */
  class CmsSketch extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](CmsDepth * CmsWidth)
    def reduce(b: Array[Long], tok: String): Array[Long] = {
      var d = 0
      while (d < CmsDepth) {
        val slot = (h60("cms", s"${d}_$tok") % CmsWidth).toInt
        b(d * CmsWidth + slot) += 1L
        d += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate from a CMS cell array (min over the token's cells). */
  def cmsEstimate(cells: Array[Long], tok: String): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < CmsDepth) {
      val slot = (h60("cms", s"${d}_$tok") % CmsWidth).toInt
      val c = cells(d * CmsWidth + slot)
      if (c < est) est = c
      d += 1
    }
    est
  }
}
