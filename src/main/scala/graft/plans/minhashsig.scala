package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `minhash_sig(text)` — whole-document MinHash signature in ONE
 * expression eval: whitespace-tokenize, build word trigram shingles,
 * md5 each once ("0:"+shingle → 60-bit prefix → 31-bit truncation, the
 * same portable hash as DedupOps.h60/the DuckDB oracle), then fold the
 * `perms` affine permutations to their minima. Returns array<bigint> of
 * length perms.a.length; NULL for documents under 3 tokens (no trigram).
 *
 * Replaces two slower formulations with identical bits:
 *  - the batch explode(shingles) → groupBy(doc).agg(min…×16) pair of
 *    exchanges (signature becomes a pure scan projection), and
 *  - the streaming nested-transform array expression (interpreted
 *    per-element lambda + boxed string per shingle).
 * Per-row interpreted dispatch (CodegenFallback) is amortized over the
 * whole document loop, as with WinnowFp.
 */
case class MinHashSig(child: Expression,
                      permA: Array[Long], permB: Array[Long], mod: Long)
    extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires string, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    // exact split(trim(text), '\s+') parity: SQL trim strips ONLY
    // spaces (not tabs/newlines, unlike String.trim), and SQL split
    // keeps trailing empty fields (Java default drops them → limit -1)
    val s0 = input.asInstanceOf[UTF8String].toString
    var st = 0
    var en = s0.length
    while (st < en && s0.charAt(st) == ' ') st += 1
    while (en > st && s0.charAt(en - 1) == ' ') en -= 1
    val toks = s0.substring(st, en).split("\\s+", -1)
    val n = toks.length - 2
    if (n <= 0 || toks.length < 3) return null
    val md = MessageDigest.getInstance("MD5")
    val nPerm = permA.length
    val mins = Array.fill(nPerm)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append("0:").append(toks(i)).append(' ')
        .append(toks(i + 1)).append(' ').append(toks(i + 2))
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >> 4)
      val h31 = v & 0x7fffffffL
      var p = 0
      while (p < nPerm) {
        val m = (h31 * permA(p) + permB(p)) % mod
        if (m < mins(p)) mins(p) = m
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
