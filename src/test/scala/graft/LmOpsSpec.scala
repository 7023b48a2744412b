package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.LmOps

/**
 * Structural invariants of the LM-pipeline operators (`operators.LmOps`)
 * that the value-exact oracle gate can't express: chunk coverage /
 * overlap geometry and tercile balance.
 */
class LmOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q267 chunks tile every document: full coverage, fixed stride, " +
    "W-token bodies except a possibly-short tail") {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("len"))
    val ch = graft.SparkEntry.queries("q267_chunk_overlap")(spark, dir)
    val agg = ch.groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        max(col("start_tok") + col("n_chunk_toks")).as("covered"),
        max(col("chunk_idx")).as("max_idx"),
        sum(when(col("n_chunk_toks") =!= LmOps.ChunkW, 1).otherwise(0))
          .as("short_chunks"))
      .join(docs, "doc_id")
    val bad = agg.filter(
      col("covered") =!= col("len") ||                  // every token covered,
      col("max_idx") =!= col("n_chunks") - 1 ||         // contiguous indexes,
      col("short_chunks") > 1)                          // ≤1 short (tail) chunk
    assert(bad.isEmpty, "chunk tiling invariant violated:\n" +
      bad.limit(5).collect().mkString("\n"))
    // stride: consecutive chunks start exactly ChunkS apart
    val strideBad = ch
      .withColumn("prev_start", lag(col("start_tok"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_idx")))
      .filter(col("prev_start").isNotNull &&
        col("start_tok") - col("prev_start") =!= LmOps.ChunkS)
    assert(strideBad.isEmpty)
  }

  test("q266 terciles are balanced and ordered by perplexity") {
    val ppl = graft.SparkEntry.queries("q266_bigram_ppl")(spark, dir)
      .select("avg_mlb", "ppl_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byBucket = ppl.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.keySet == Set(1, 2, 3))
    val sizes = byBucket.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced terciles: $sizes")
    // ordering: bucket boundaries are monotone (a straddling tie makes
    // the adjacent max/min equal, which still satisfies <=)
    assert(byBucket(1).max <= byBucket(2).min)
    assert(byBucket(2).max <= byBucket(3).min)
  }
}
