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

  val KmvK = 32 // matches SketchOps q154

  /**
   * `KmvDistinct`: mergeable bottom-k (KMV) distinct-count estimate —
   * the Aggregator dual of SketchOps q154. Buffer = the ≤k smallest
   * DISTINCT 60-bit hashes, kept sorted ascending; merge = sorted-merge
   * + truncate (associative, commutative, idempotent). `finish` is the
   * classic KMV estimator (k−1)·2^60 / h_k, exact (= buffer size) while
   * fewer than k distinct values have been seen. Same "kmv" hash seed as
   * q154, so the SQL-composed and Aggregator paths agree bit-for-bit.
   */
  class KmvDistinct extends Aggregator[String, Array[Long], Double] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], s: String): Array[Long] = {
      val h = h60("kmv", s)
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) b // already present
      else {
        val ins = -pos - 1
        if (ins >= KmvK) b // larger than the kept k smallest
        else {
          val n = math.min(b.length + 1, KmvK)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, KmvK))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (i < a.length && a(i) == v) i += 1 // dedup across sides
        if (j < b.length && b(j) == v) j += 1
        out(n) = v; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    def finish(r: Array[Long]): Double =
      if (r.length < KmvK) r.length.toDouble
      else (KmvK - 1).toDouble * math.pow(2, 60) / r(KmvK - 1)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val HistScale = 16 // matches SketchOps q163

  /**
   * `HistQuantile`: mergeable power-of-two-histogram quantile estimate —
   * the Aggregator dual of SketchOps q163. Input = (value, q) with q the
   * integer percentile (e.g. 50, 90, 99; constant within a group).
   * Buffer = 64 bucket counters (bucket = bit-length of the 2^4-scaled
   * integer value, identical bucketing to q163) + the q slot; merge =
   * element-wise sum. `finish` reads the smallest bucket whose
   * cumulative count reaches ⌈q% · total⌉ and returns its value upper
   * bound (2^bucket − 1) / 16 — the same integer-threshold arithmetic as
   * the SQL form, so both paths agree bit-for-bit.
   */
  class HistQuantile extends Aggregator[(Double, Int), Array[Long], Double] {
    private val B = 64
    def zero: Array[Long] = new Array[Long](B + 1)
    def reduce(b: Array[Long], in: (Double, Int)): Array[Long] = {
      val n = math.floor(in._1 * HistScale).toLong + 1L
      val bucket =
        if (n == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n)
      b(bucket - 1) += 1L
      b(B) = in._2.toLong
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < B) { a(i) += b(i); i += 1 }
      a(B) = math.max(a(B), b(B)) // zero-buffer side carries q = 0
      a
    }
    def finish(r: Array[Long]): Double = {
      val q = r(B)
      var total = 0L
      var i = 0
      while (i < B) { total += r(i); i += 1 }
      if (total == 0L) return Double.NaN
      var cum = 0L
      i = 0
      while (i < B) {
        cum += r(i)
        if (cum * 100L >= total * q)
          return (math.pow(2.0, (i + 1).toDouble) - 1.0) / HistScale
        i += 1
      }
      (math.pow(2.0, B.toDouble) - 1.0) / HistScale
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
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
