package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Embedding similarity search over `embeddings` (builder north star:
 * ANN over Array[Float] columns at 100 TB).
 *
 * Brute-force top-k is the exactness baseline: broadcast the (small)
 * query set against the candidate corpus — a broadcast nested-loop with
 * NO shuffle of the big side; every executor streams its candidate
 * partition once. The dot product runs as higher-order array expressions
 * (zip_with + aggregate) inside whole-stage codegen — no UDF boxing.
 *
 * Determinism: elements are folded in index order in DOUBLE, matching the
 * oracle's list_dot_product on a DOUBLE[] cast, so cosine values are
 * bit-identical across engines (rounded to 6 for defense anyway).
 */
object VectorOps {

  /** Sequential-fold double dot product of two float vectors. */
  private def dotD(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 neighbors for each of the first 10 vectors.
    "q38_cosine_topk" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val queries = broadcast(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
      val cands = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("cand_id"))
      queries.crossJoin(cands)
        // fused codegen'd expression — bit-equal to the composed
        // dotD/sqrt form (see graft.plans.CosineSimilarity)
        .withColumn("cos",
          graft.functions.GraftFunctions.cosineSim(col("q_emb"), col("c_emb")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("cand_id"), col("rnk"),
                round(col("cos"), 6).as("sim"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q38_cosine_topk" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
                 FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS ce
            FROM embeddings WHERE vec_id >= 10),
      scored AS (
        SELECT q_id, cand_id,
               list_dot_product(qe, ce)
                 / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))
                 AS cos
        FROM q CROSS JOIN c),
      ranked AS (
        SELECT q_id, cand_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rnk,
               cos
        FROM scored)
      SELECT q_id, cand_id, CAST(rnk AS INT) AS rnk, round(cos, 6) AS sim
      FROM ranked WHERE rnk <= 5"""
  )
}
