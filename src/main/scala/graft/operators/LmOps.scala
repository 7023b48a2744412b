package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Language-model-driven corpus operators (builder north star, beyond the
 * reference's own surface): the CCNet-style perplexity quality filter
 * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
 * Datasets from Web Crawl Data" — there a KenLM 5-gram; here an
 * interpolated add-one bigram LM, the same train-on-clean /
 * score-everything shape) and retrieval-style overlapping document
 * chunking (the standard RAG ingestion step: fixed token windows with
 * stride overlap).
 *
 * Scale notes (100 TB):
 *  - q266: the LM tables are built from the TRAIN SLICE only (lang='en'
 *    here; in production a tiny curated sample), so `uni` is vocab-sized
 *    and `bi` is train-bigram-sized — both products of partial-aggregated
 *    counts, both orders of magnitude smaller than the corpus being
 *    scored. Scoring joins the corpus's bigram stream against them on
 *    the (w1,w2)/(w) keys — plain shuffle hash joins whose build sides
 *    are the SMALL model tables (Spark broadcasts them when they fit,
 *    which at production train-slice sizes they do). Per-token negative
 *    log-probs are quantized to integer millinats BEFORE the per-doc sum
 *    (the q159/q249 trick), so document scores are exact integer sums —
 *    bit-reproducible under any partitioning.
 *  - q267: pure per-document row expansion (one `posexplode` over
 *    arithmetic on the token array) — embarrassingly parallel, no
 *    shuffle at all until a downstream consumer groups chunks; the
 *    chunk count per doc is ceil-bounded by len/stride so output volume
 *    is a fixed multiple (~W/S) of input volume.
 */
object LmOps {

  /** q266 smoothing/interpolation constants. The interpolation weights
   *  are exact binary fractions (0.75 = 3/4, 0.25 = 1/4) so the mixed
   *  probability has no decimal-literal representation drift between
   *  the JVM and DuckDB. */
  private val Lam = 0.75           // bigram weight (1-Lam on the unigram)

  /** q267 chunking constants: window of 32 tokens, stride 24 (25% overlap). */
  private[graft] val ChunkW = 32
  private[graft] val ChunkS = 24

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Interpolated bigram-LM perplexity filter: train add-one-smoothed
    // unigram + bigram tables on the lang='en' slice, score EVERY doc's
    // adjacent-token pairs under p = Lam·p_bi + (1-Lam)·p_uni with an
    // OOV class (V+1 smoothing denominator). Unseen words/bigrams fall
    // back to the smoothed floor via left joins + coalesce(0). Documents
    // are then split into CCNet's head/middle/tail perplexity TERCILES
    // (Wenzek et al. §4.3 — corpus-relative percentiles, not a fixed
    // threshold) via the range-partitioned global rank (GlobalRank, not
    // a single-task Window.orderBy).
    "q266_bigram_ppl" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
        .filter(size(col("toks")) >= 2)
      // materialized once: the unigram aggregate, the bigram aggregate
      // and the scoring join all read this frame (3 tokenize+explode
      // passes otherwise)
      val pairs = toks.select(col("doc_id"), col("lang"), posexplode(expr(
          "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"))
          .as(Seq("i", "p")))
        .select(col("doc_id"), col("lang"),
                col("p.w1").as("w1"), col("p.w2").as("w2"))
        .transform(Materialize.frame)
      val train = pairs.filter(col("lang") === "en")
      // Unigram counts over train token POSITIONS (w1 of every pair plus
      // the final w2 per doc would double-count; the standard conditional
      // denominator is the count of w1 contexts — use w1 occurrences).
      val uni = train.groupBy(col("w1").as("w")).agg(count(lit(1)).as("cu"))
      val bi = train.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val consts = uni.agg(sum(col("cu")).as("n_train"),
                           (count(lit(1)) + 1).as("v1"))
      val scored = pairs
        .join(bi, Seq("w1", "w2"), "left").na.fill(0L, Seq("cb"))
        .join(uni.withColumnRenamed("w", "w1")
                 .withColumnRenamed("cu", "cu1"), Seq("w1"), "left")
        .na.fill(0L, Seq("cu1"))
        .join(uni.withColumnRenamed("w", "w2")
                 .withColumnRenamed("cu", "cu2"), Seq("w2"), "left")
        .na.fill(0L, Seq("cu2"))
        .crossJoin(broadcast(consts))
        .withColumn("p_bi", (col("cb") + lit(1)).cast("double")
          / (col("cu1") + col("v1")))
        .withColumn("p_uni", (col("cu2") + lit(1)).cast("double")
          / (col("n_train") + col("v1")))
        .withColumn("tok_mlb",
          round(-log(lit(Lam) * col("p_bi") + lit(1 - Lam) * col("p_uni"))
            * lit(1000)).cast("long"))
      // one row per doc; read by the count action AND the global rank —
      // without this the scoring join re-executes for each
      val perDoc = scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"), sum(col("tok_mlb")).as("total_mlb"))
        .withColumn("avg_mlb", expr("total_mlb div n_pairs"))
        .transform(Materialize.frame)
      val n = perDoc.count()
      GlobalRank.withRowNumber(perDoc,
          Seq(col("avg_mlb"), col("doc_id")), "rn")
        .withColumn("ppl_bucket",
          (lit(1) + expr(s"(rn - 1) * 3 div $n")).cast("int"))
        .drop("rn")
    }),

    // Overlapping RAG chunking: windows of ChunkW tokens at stride
    // ChunkS; the last chunk may be short but every token is covered.
    // n_chunks = 1 + max(0, ceil((len - W) / S)); chunk i covers token
    // positions [i·S, i·S + W). Emits one row per chunk with its token
    // count and content digest (the downstream embed/index key).
    "q267_chunk_overlap" -> ((s, dir) => {
      val (w0, s0) = (ChunkW, ChunkS)
      Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("len", size(col("toks")))
        .withColumn("n_chunks",
          lit(1) + greatest(lit(0),
            expr(s"(len - $w0 + ${s0 - 1}) div $s0")))
        .select(col("doc_id"), col("len"), posexplode(expr(
            s"transform(sequence(0, n_chunks - 1), " +
            s"i -> struct(i * $s0 AS start, " +
            s"slice(toks, i * $s0 + 1, $w0) AS c))"))
            .as(Seq("chunk_idx", "ch")))
        .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
                col("ch.start").cast("long").as("start_tok"),
                size(col("ch.c")).as("n_chunk_toks"),
                md5(concat_ws(" ", col("ch.c"))).as("digest"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q266_bigram_ppl" -> s"""
      WITH t AS (
        SELECT doc_id, lang,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        FROM documents WHERE len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 2),
      pairs AS (
        SELECT doc_id, lang, toks[i-1] AS w1, toks[i] AS w2
        FROM t, UNNEST(generate_series(2, len(toks))) AS u(i)),
      train AS (SELECT * FROM pairs WHERE lang = 'en'),
      uni AS (SELECT w1 AS w, count(*) AS cu FROM train GROUP BY w1),
      bi AS (SELECT w1, w2, count(*) AS cb FROM train GROUP BY w1, w2),
      consts AS (SELECT CAST(sum(cu) AS BIGINT) AS n_train,
                        CAST(count(*) + 1 AS BIGINT) AS v1 FROM uni),
      scored AS (
        SELECT p.doc_id,
               CAST(round(-ln(
                 $Lam * (CAST(coalesce(b.cb, 0) + 1 AS DOUBLE)
                         / (coalesce(u1.cu, 0) + c.v1))
                 + ${1 - Lam} * (CAST(coalesce(u2.cu, 0) + 1 AS DOUBLE)
                         / (c.n_train + c.v1))) * 1000) AS BIGINT) AS tok_mlb
        FROM pairs p
        LEFT JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
        LEFT JOIN uni u1 ON p.w1 = u1.w
        LEFT JOIN uni u2 ON p.w2 = u2.w, consts c),
      per_doc AS (
        SELECT doc_id, count(*) AS n_pairs,
               CAST(sum(tok_mlb) AS BIGINT) AS total_mlb,
               CAST(sum(tok_mlb) AS BIGINT) // count(*) AS avg_mlb
        FROM scored GROUP BY doc_id),
      ranked AS (
        SELECT *, row_number() OVER (ORDER BY avg_mlb, doc_id) AS rn,
               count(*) OVER () AS n FROM per_doc)
      SELECT doc_id, n_pairs, total_mlb, avg_mlb,
             CAST(1 + ((rn - 1) * 3) // n AS INT) AS ppl_bucket
      FROM ranked""",

    "q267_chunk_overlap" -> s"""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
               len(regexp_split_to_array(trim(text), '\\s+')) AS len
        FROM documents),
      n AS (
        SELECT doc_id, toks, len,
               1 + greatest(0, (len - $ChunkW + ${ChunkS - 1}) // $ChunkS)
                 AS n_chunks
        FROM t),
      c AS (
        SELECT doc_id, len, i - 1 AS chunk_idx,
               (i - 1) * $ChunkS AS start_tok,
               toks[(i - 1) * $ChunkS + 1 : (i - 1) * $ChunkS + $ChunkW]
                 AS chunk
        FROM n, UNNEST(generate_series(1, n_chunks)) AS u(i))
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             CAST(start_tok AS BIGINT) AS start_tok,
             CAST(len(chunk) AS INT) AS n_chunk_toks,
             md5(array_to_string(chunk, ' ')) AS digest
      FROM c"""
  )
}
