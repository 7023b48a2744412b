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

  test("mixed integral key widths probe correctly (canonical string " +
    "hash); representation-incompatible types are rejected up front") {
    import spark.implicits._
    val fact = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")   // int
    val d = Seq((1L, "x"), (3L, "y")).toDF("dk", "dv")            // bigint
    val got = BloomPrune.prunedJoin(fact, d, "k", "dk")
      .select(col("k"), col("dv")).as[(Int, String)].collect().toSet
    assert(got == Set((1, "x"), (3, "y")),
      "int fact key vs bigint dim key must not produce false negatives")
    val dec = d.select(col("dk").cast("decimal(10,2)").as("dk"), col("dv"))
    intercept[IllegalArgumentException] {
      BloomPrune.prunedJoin(fact, dec, "k", "dk")
    }
  }

  test("build collects only slot indexes, bounded by M") {
    val bits = BloomPrune.build(dim, "s_suppkey")
    assert(bits.length == BloomPrune.M / 64)
    val setBits = bits.map(java.lang.Long.bitCount).sum
    // ≤ k bits per distinct key, > 0 for a non-empty dim
    assert(setBits > 0 && setBits <= BloomPrune.K * dim.count())
  }
}
