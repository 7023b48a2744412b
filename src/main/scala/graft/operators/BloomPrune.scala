package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Bloom-filter semi-join reduction — the runtime-filter pattern a
 * 100 TB fact⋈dim join needs when the dim's qualifying key set is
 * selective but the fact side would otherwise be shuffled (or even
 * scanned) in full. The reference's two-phase shuffle machinery has no
 * runtime filter in this lineage (SURVEY §2.3 hash joins,
 * `RUNTIME/runtime/hashtable/BinaryHashTable.java`); modern engines
 * (and Spark's own `spark.sql.optimizer.runtime.bloomFilter.*` rewrite)
 * inject exactly this: build a compact bit-set over the dim keys, probe
 * it on the fact side BEFORE the join's exchange, drop the
 * guaranteed-non-matching rows early.
 *
 * This implementation keeps everything deterministic and
 * codegen-friendly:
 *  - the filter is m = 2^16 bits (1 KiB·8 = 8 KiB as 1024 longs) with
 *    k = 4 xxhash64-derived hash slots per key — deterministic across
 *    runs, independent of corpus size;
 *  - the BUILD collects only DISTINCT SLOT indexes (≤ min(4·|keys|, m)
 *    ints — bounded by m = 65536 regardless of corpus), never the keys;
 *  - the PROBE is a pure built-in-function Column (element_at on the
 *    8 KiB array literal + shift/mask), so it runs inside whole-stage
 *    codegen in the fact scan's projection, upstream of any exchange.
 *
 * No false negatives (every true key sets its own bits), so
 * `prunedJoin == plain join` — which is exactly what the oracle checks;
 * false positives only cost work, never correctness. At 100 TB the knob
 * is m: 2^16 suits dim-key sets up to ~10^4 (the selective-dim regime
 * where a runtime filter pays); larger sets want m scaled up (the array
 * literal grows linearly, stays driver-tiny) or Spark's own
 * bloomFilter rewrite, which this operator intentionally mirrors.
 */
object BloomPrune {

  /** Bits in the filter (power of two) and words backing them. */
  val M: Int = 1 << 16
  private val Words = M / 64
  /** Hash functions per key. */
  val K: Int = 4

  /** Slot of `key` under hash i: xxhash64 with the index as a leading
    * mix-in field. Unlike the sketch family there is no cross-engine
    * portability requirement here (the oracle is the PLAIN join, the
    * filter never changes results), so the hash can be the fast native
    * one — 4 xxhash64 calls per probe row instead of 4 md5s.
    *
    * The key is cast to STRING first: xxhash64's output depends on the
    * input's Catalyst type, and build() hashes the dim key while
    * mightContain() hashes the fact key — without a canonical
    * representation an int-vs-bigint key pair would miss on every probe
    * and silently break the no-false-negatives contract. The string
    * form is identical for equal integral values of any width. */
  private def slot(i: Int, key: Column): Column =
    pmod(xxhash64(lit(i), key.cast("string")), lit(M.toLong))

  /** BUILD: distinct slot indexes of the dim keys, folded into the
    * bit-set on the driver. The collect is bounded by M ints. */
  def build(keys: DataFrame, keyCol: String): Array[Long] = {
    val slots = keys.select(col(keyCol).as("k")).distinct()
      .select(explode(array((0 until K).map(i => slot(i, col("k"))): _*))
        .as("s"))
      .distinct()
      .collect().map(_.getLong(0))
    val bits = new Array[Long](Words)
    slots.foreach(s => bits(s.toInt >> 6) |= 1L << (s.toInt & 63))
    bits
  }

  /** PROBE: true iff all k slots of `key` are set — built-in functions
    * only (codegen'd; no UDF, no custom expression needed). */
  def mightContain(bits: Array[Long], key: Column): Column = {
    val arr = typedLit(bits)
    (0 until K).map { i =>
      val s = slot(i, key)
      (call_function("shiftright",
        element_at(arr, (s / 64).cast("int") + 1),
        (s % 64).cast("int")).bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)
  }

  /** Fact⋈dim join with the fact side pre-pruned by a Bloom filter
    * over the dim's join keys. Result is identical to the plain join. */
  def prunedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String): DataFrame = {
    // The string canonicalization in slot() aligns integral widths, but
    // types whose string forms of equal values differ (decimal "5.00"
    // vs bigint "5") would still probe-miss — reject those up front.
    import org.apache.spark.sql.types._
    def rep(t: DataType): String = t match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case other => other.sql
    }
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    require(rep(ft) == rep(dt),
      s"BloomPrune key types must share a string representation: " +
        s"$factKey is ${ft.sql}, $dimKey is ${dt.sql}")
    val bits = build(dim, dimKey)
    fact.filter(mightContain(bits, col(factKey)))
      .join(broadcast(dim), col(factKey) === col(dimKey))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Revenue per supplier restricted to one nation's suppliers: the
    // qualifying supplier keys build the Bloom filter; lineitem is
    // pruned in its scan projection before the (broadcast) join. The
    // oracle is the PLAIN join — no-false-negatives makes them equal.
    "q162_bloom_join" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
      val supp = Tables.table(s, dir, "supplier")
      val nat = Tables.table(s, dir, "nation")
      val dim = supp.join(broadcast(nat),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_3")
        .select(col("s_suppkey"), col("s_name"))
      prunedJoin(li, dim, "l_suppkey", "s_suppkey")
        .groupBy(col("s_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
               .as("revenue"),
             count(lit(1)).as("n_items"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q162_bloom_join" -> """
      SELECT s.s_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue,
             count(*) AS n_items
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY s.s_name"""
  )
}
