package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `winnow_fp(text)` — whole-document winnowing fingerprint (the MOSS
 * rolling-hash scheme): hash every k-char gram, take the minimum hash of
 * each w-gram window, report the selected set's size and its min/max as
 * a compact signature. Semantics are IDENTICAL to the composed
 * higher-order-function form (and the DuckDB oracle):
 * `substring(md5(substring(text,i,k)),1,8)` per position, window frame
 * `ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING` capped at the tail —
 * the first 8 hex chars of an md5 are the first 4 digest bytes, so the
 * loop compares unsigned 32-bit ints and renders hex only for the two
 * reported extremes.
 *
 * Why an expression and not the array pipeline: transform/least evaluate
 * their lambdas interpreted, per element, with a boxed string per gram —
 * at ~1 position per character that is the dominant cost of
 * fingerprinting a corpus. This is one eval per DOCUMENT: a single md5
 * per gram (4 bytes retained), an O(n) monotonic-deque sliding minimum
 * (instead of O(n*w) comparisons), no per-element boxing. Per-row
 * interpreted dispatch (CodegenFallback) is amortized over the whole
 * document loop.
 */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fp"

  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_min", StringType, nullable = false),
    StructField("fp_max", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires string, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val sel = Winnow.selectedSorted(input.asInstanceOf[UTF8String], k, w)
    if (sel == null) return null
    new GenericInternalRow(Array[Any](
      sel.length.toLong,
      UTF8String.fromString(f"${sel(0)}%08x"),
      UTF8String.fromString(f"${sel(sel.length - 1)}%08x")))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

/**
 * `winnow_fp_set(text)` — same selection loop as [[WinnowFp]] but
 * returning the full DISTINCT selected-fingerprint set as a sorted
 * `array<string>` of 8-hex-char values, for fingerprint-level joins
 * (shared-substring / MOSS pair scoring). Explode the array to get the
 * (doc, fingerprint) posting list without ever materializing per-gram
 * rows: one eval per document, same cost profile as `winnow_fp`.
 */
case class WinnowFpSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fp_set"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp_set requires string, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val sel = Winnow.selectedSorted(input.asInstanceOf[UTF8String], k, w)
    if (sel == null) return null
    val out = new Array[AnyRef](sel.length)
    var i = 0
    while (i < sel.length) {
      out(i) = UTF8String.fromString(f"${sel(i)}%08x")
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFpSet = copy(child = newChild)
}

private[plans] object Winnow {

  /** Distinct selected winnowing fingerprints of `u` (uint32 of the
    * first 4 md5 bytes per k-gram, min per w-window), sorted ascending;
    * null when the text is shorter than one gram. */
  def selectedSorted(u: UTF8String, k: Int, w: Int): Array[Long] = {
    val nc = u.numChars()
    val n = nc - k + 1
    if (n <= 0) return null
    val md = MessageDigest.getInstance("MD5")
    val ascii = u.numBytes() == nc // 1 byte per char → zero-copy slicing
    val bytes = if (ascii) u.getBytes else null
    // uint32 of the first 4 digest bytes == lexicographic order of the
    // first 8 lowercase-hex chars
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      if (ascii) md.update(bytes, i, k)
      else md.update(u.substringSQL(i + 1, k).getBytes) // codepoint-exact
      val d = md.digest()
      hashes(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // sliding-window minimum, window = positions [j, min(j+w-1, n-1)]
    val deque = new Array[Int](n) // indices, values strictly increasing
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[Long]()
    var filled = -1 // last index pushed into the deque
    var j = 0
    while (j < n) {
      val e = math.min(j + w - 1, n - 1)
      while (filled < e) {
        filled += 1
        val v = hashes(filled)
        while (tail > head && hashes(deque(tail - 1)) >= v) tail -= 1
        deque(tail) = filled
        tail += 1
      }
      while (deque(head) < j) head += 1
      seen.add(hashes(deque(head)))
      j += 1
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    java.util.Arrays.sort(arr)
    arr
  }
}
