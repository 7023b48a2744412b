package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomPrune

class JoinPruneSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def dim = {
    val supp = Tables.table(spark, dir, "supplier")
    val nat = Tables.table(spark, dir, "nation")
    supp.join(nat, col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
      .select(col("s_suppkey"), col("s_name"))
  }

  test("bloom-pruned join equals the plain join") {
    val li = Tables.table(spark, dir, "lineitem")
    val got = BloomPrune.prunedJoin(li, dim, "l_suppkey", "s_suppkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    val exp = li.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    assert(got.count() == exp.count())
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("no false negatives and real pruning on the probe side") {
    val li = Tables.table(spark, dir, "lineitem")
    val bits = BloomPrune.build(dim, "s_suppkey")
    val pruned = li.filter(BloomPrune.mightContain(bits, col("l_suppkey")))
    val trueMatches = li.join(dim, col("l_suppkey") === col("s_suppkey"))
    // every truly-matching row survives the filter (no false negatives)
    assert(pruned.count() >= trueMatches.count())
    val missed = trueMatches
      .filter(!BloomPrune.mightContain(bits, col("l_suppkey")))
    assert(missed.count() == 0)
    // and the filter genuinely drops non-matching rows: with 4 keys of
    // 100 suppliers set, a saturated (useless) filter would pass all
    assert(pruned.count() < li.count())
  }

  test("build collects only slot indexes, bounded by M") {
    val bits = BloomPrune.build(dim, "s_suppkey")
    assert(bits.length == BloomPrune.M / 64)
    val setBits = bits.map(java.lang.Long.bitCount).sum
    // ≤ k bits per distinct key, > 0 for a non-empty dim
    assert(setBits > 0 && setBits <= BloomPrune.K * dim.count())
  }
}
