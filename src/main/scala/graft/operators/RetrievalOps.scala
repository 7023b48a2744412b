package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Retrieval & data-selection operators for the training-data pipeline
 * family (builder north star): exact substring-level dedup coverage
 * (the suffix-array dedup of Lee et al. 2022, "Deduplicating Training
 * Data Makes Language Models Better", re-expressed as a k-gram
 * position join — the pipeline op that q35/q39/q166 document-/segment-
 * level dedup does NOT cover: a duplicated PARAGRAPH inside an
 * otherwise unique doc), BM25 keyword retrieval (the classic sparse
 * retriever used to mine/inspect corpora), and DSIR-style hashed
 * n-gram importance weighting (Xie et al. 2023, "Data Selection for
 * Language Models via Importance Resampling") for domain-targeted
 * data selection.
 *
 * Scale notes (100 TB):
 *  - q247: positions travel as (doc_id, pos, md5-digest) — the text
 *    itself never shuffles (the q166 discipline). The duplicated-digest
 *    reduction is one partial-aggregated count per digest; span
 *    coverage is a per-doc window (one narrow exchange on doc_id,
 *    partition-local sort). No O(n²) anywhere: a gram shared by D
 *    positions costs D rows, not D² — unlike pair-style dedup, span
 *    coverage never forms pairs.
 *  - q248: the per-term document-frequency / corpus stats frames are
 *    |terms| and 1 rows — broadcast scalar-join pattern; tf explode is
 *    pre-filtered to the query terms inside the scan projection so the
 *    exploded row count is bounded by term hits, not corpus tokens.
 *    Final top-k is orderBy+limit = TakeOrderedAndProject (per-
 *    partition heaps + driver merge of k rows, never a global sort).
 *  - q249: the bucketed LM ratio table is ≤ B=1024 rows regardless of
 *    corpus size — train-tiny/score-everywhere: built with two
 *    partial-aggregated counts, broadcast back over the feature
 *    stream. Per-bucket log-ratios are quantized to integer millinats
 *    BEFORE the per-doc sum (the q159 trick), so document weights are
 *    exact integer sums — bit-reproducible under any partitioning.
 */
object RetrievalOps {

  /** 60-bit portable hash (same construction as DedupOps/SketchOps). */
  private def h60(seed: String, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10)
      .cast("long")

  private def h60Sql(seed: String, s: String): String =
    s"CAST(('0x' || substr(md5('$seed:' || $s), 1, 15)) AS BIGINT)"

  /** q247 span gram width (tokens). Real pipelines use ~50-token spans;
   *  the fixture docs are ~60 tokens, so k=5 exercises the same
   *  machinery at fixture scale. */
  private[operators] val SpanK = 5

  /** q248 query terms + Robertson/Lucene BM25 constants. */
  private val Bm25Terms = Seq("spark", "window", "vector")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** q249 hashed-feature bucket count. */
  private val DsirB = 1024

  /** The BM25 scorer shared by q248 (ranked retrieval) and q298 (the
    * lexical leg of hybrid fusion): per-doc integer micro-point scores,
    * pre-limit. One corpus pass; stats/df frames broadcast. */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(s, dir, "documents")
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val hits = docs.select(col("doc_id"), col("dl"),
        explode(expr(
          "filter(toks, t -> t IN " +
            Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")") + ")"))
          .as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      // term-hit rows only (bounded by query-term matches): read by the
      // df aggregate and the scoring join — one corpus pass, not two
      .transform(Materialize.frame)
    val dfreq = hits.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    hits.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("contrib_u",
        round(col("idf") * (col("tf") * lit(Bm25K1 + 1.0))
          / (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B)
            + lit(Bm25B) * col("dl") / col("avgdl"))) * lit(1e6))
          .cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib_u")).as("score_u"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact substring-level dedup coverage (Lee et al. 2022): mark every
    // token position whose k-gram occurs more than once in the corpus
    // (including intra-document repeats, as in the paper), merge the
    // overlapping [pos, pos+k) intervals per document, and report the
    // duplicated-token count and fraction. The interval union is the
    // lead()-window identity: a position covers min(k, next_pos - pos)
    // tokens (k for the last), so one window + one sum computes the
    // union length without materializing intervals.
    "q247_substring_dedup" -> ((s, dir) => {
      val k = SpanK
      val docs = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .filter(size(col("toks")) >= k)
      // (doc, pos, digest) materialized once: the duplicate-digest
      // aggregate and the coverage join both reuse it — unchecked, the
      // tokenize + per-position md5 explode would run twice.
      val pos = docs.select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(toks) - $k), " +
          s"i -> md5(concat_ws(' ', slice(toks, i + 1, $k))))"))
          .as(Seq("pos", "dig")))
        .transform(Materialize.frame)
      val dup = pos.groupBy("dig").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select("dig")
      val dupPos = pos.join(dup, "dig").select("doc_id", "pos")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val cov = dupPos
        .withColumn("nxt", lead(col("pos"), 1).over(w))
        .withColumn("contrib",
          when(col("nxt").isNull, lit(k))
            .otherwise(least(lit(k), col("nxt") - col("pos"))))
        .groupBy("doc_id")
        .agg(sum(col("contrib")).cast("long").as("dup_tokens"))
      docs.select(col("doc_id"), size(col("toks")).as("n_tokens"))
        .join(cov, "doc_id")
        .withColumn("dup_frac",
          round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
    }),

    // BM25 ranked keyword retrieval (Robertson; Lucene's idf variant):
    // score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    // idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). Each term's
    // contribution is quantized to integer micro-points so the per-doc
    // sum is order-independent; top 50 via TakeOrderedAndProject.
    "q248_bm25" -> ((s, dir) =>
      bm25Scored(s, dir)
        .orderBy(col("score_u").desc, col("doc_id").asc)
        .limit(50)),

    // Reciprocal-rank fusion of the two retrieval legs every hybrid
    // search stack runs (Cormack et al. 2009): BM25 lexical top-50
    // (q248's scorer) fused with dense cosine top-50 against a fixed
    // query embedding, rrf = Σ 1e6 div (60 + rank). All-integer fusion
    // arithmetic; the cosine inputs are milli-quantized BIGINTs so both
    // engines rank on bit-identical doubles. Each leg is a ≤50-row
    // frame (TakeOrderedAndProject), so the fusion join and the final
    // rank windows never touch more than 50 rows — corpus-size work is
    // exactly one BM25 pass plus one embedding scan.
    "q298_rrf_fusion" -> ((s, dir) => {
      val lex = bm25Scored(s, dir)
        .orderBy(col("score_u").desc, col("doc_id").asc).limit(50)
        .withColumn("lex_rnk", row_number().over(
          Window.orderBy(col("score_u").desc, col("doc_id").asc))
          .cast("long"))
        .select(col("doc_id"), col("lex_rnk"))
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as("ev"))
      // O(1) driver collect: the single query vector (vec_id 0)
      val qv = emb.filter(col("vec_id") === 0)
        .head().getSeq[Long](1)
      val qvSql = qv.mkString("array(", "L, ", "L)")
      val nq = qv.map(v => v * v).sum
      val den = emb
        .withColumn("num", expr(
          s"aggregate(zip_with(ev, $qvSql, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        .withColumn("nv", expr(
          "aggregate(ev, 0L, (acc, x) -> acc + x * x)"))
        .withColumn("cos", col("num").cast("double")
          / (sqrt(col("nv").cast("double")) * lit(math.sqrt(nq.toDouble))))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(50)
        .withColumn("dense_rnk", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
        .select(col("vec_id").as("doc_id"), col("dense_rnk"))
      lex.join(den, Seq("doc_id"), "full")
        .withColumn("rrf_u",
          coalesce(expr("1000000 div (60 + lex_rnk)"), lit(0L))
            + coalesce(expr("1000000 div (60 + dense_rnk)"), lit(0L)))
        .orderBy(col("rrf_u").desc, col("doc_id").asc).limit(20)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("rrf_u").desc, col("doc_id").asc)).cast("long"))
        .select(col("doc_id"), col("lex_rnk"), col("dense_rnk"),
                col("rrf_u"), col("rnk"))
    }),

    // DSIR-style importance weights: hashed word-bigram features
    // (B=1024 buckets), a +1-smoothed bucket LM for the target domain
    // (lang = 'en') vs the whole corpus, per-bucket log-ratio in
    // integer millinats, per-doc weight = Σ feature log-ratios.
    // selected = weight > 0 (doc looks more target-like than
    // corpus-like under the hashed-bigram model).
    "q249_dsir_weights" -> ((s, dir) => {
      val bg = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("lang"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
          "i -> concat_ws(' ', toks[i-1], toks[i]))")).as("bg"))
        .withColumn("bkt", pmod(h60("dsir", col("bg")), lit(DsirB)))
        // four consumers (bucket counts, target counts, totals, the
        // scoring join) — one materialization instead of four
        // tokenize+explode passes
        .transform(Materialize.frame)
      val cc = bg.groupBy("bkt").agg(count(lit(1)).as("cc"))
      val ct = bg.filter(col("lang") === "en")
        .groupBy("bkt").agg(count(lit(1)).as("ct"))
      val totals = bg.agg(
        sum(lit(1)).as("tot_c"),
        sum(when(col("lang") === "en", 1).otherwise(0)).as("tot_t"))
      val lr = cc.join(ct, Seq("bkt"), "left")
        .na.fill(0L, Seq("ct"))
        .crossJoin(broadcast(totals))
        .select(col("bkt"),
          round((log((col("ct") + lit(1)).cast("double")
              / (col("tot_t") + lit(DsirB)))
            - log((col("cc") + lit(1)).cast("double")
              / (col("tot_c") + lit(DsirB)))) * lit(1000))
            .cast("long").as("lr_mlb"))
      bg.join(broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"),
             sum(col("lr_mlb")).as("weight_mlb"))
        .withColumn("selected", col("weight_mlb") > 0)
    })
  )

  /** DuckDB dual of [[bm25Scored]] — shared by the q248 and q298
    * oracles; ends at the per-doc `bm` aggregate (pre-limit). */
  private val bm25CteSql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""d AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,
               len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS dl
        FROM documents),
      stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      hits AS (
        SELECT doc_id, dl, tok AS term, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM d)
        WHERE tok IN $terms
        GROUP BY doc_id, dl, tok),
      dfreq AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM hits GROUP BY term),
      scored AS (
        SELECT h.doc_id,
               CAST(round(
                 ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                 * (h.tf * ${Bm25K1 + 1.0})
                 / (h.tf + $Bm25K1 * (${1.0 - Bm25B}
                     + $Bm25B * h.dl / s.avgdl)) * 1e6) AS BIGINT)
                 AS contrib_u
        FROM hits h JOIN dfreq f ON h.term = f.term, stats s),
      bm AS (
        SELECT doc_id, count(*) AS n_terms,
               CAST(sum(contrib_u) AS BIGINT) AS score_u
        FROM scored GROUP BY doc_id)"""
  }

  val oracle: Map[String, String] = Map(
    "q247_substring_dedup" -> s"""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(toks[i:i+${SpanK - 1}], ' ')) AS dig
        FROM t, UNNEST(generate_series(1, len(toks) - ${SpanK - 1})) AS u(i)
        WHERE len(toks) >= $SpanK),
      dup AS (SELECT dig FROM g GROUP BY dig HAVING count(*) > 1),
      dp AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (dig)),
      cov AS (
        SELECT doc_id,
               sum(CASE WHEN nxt IS NULL THEN $SpanK
                        ELSE least($SpanK, nxt - pos) END) AS dup_tokens
        FROM (SELECT doc_id, pos,
                     lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
              FROM dp)
        GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
             CAST(cov.dup_tokens AS BIGINT) AS dup_tokens,
             round(CAST(cov.dup_tokens AS DOUBLE) / len(t.toks), 6)
               AS dup_frac
      FROM t JOIN cov ON t.doc_id = cov.doc_id""",

    "q248_bm25" -> s"""
      WITH $bm25CteSql
      SELECT doc_id, n_terms, score_u FROM bm
      ORDER BY score_u DESC, doc_id ASC
      LIMIT 50""",

    "q298_rrf_fusion" -> s"""
      WITH $bm25CteSql,
      lex AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score_u DESC, doc_id) AS lex_rnk
        FROM (SELECT doc_id, score_u FROM bm
              ORDER BY score_u DESC, doc_id LIMIT 50)),
      qv AS (
        SELECT list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        FROM embeddings WHERE vec_id = 0),
      ev AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
        FROM embeddings),
      den0 AS (
        SELECT ev.vec_id,
               list_dot_product(ev.e, qv.q)
                 / (sqrt(list_dot_product(ev.e, ev.e))
                    * sqrt(list_dot_product(qv.q, qv.q))) AS cos
        FROM ev, qv),
      den AS (
        SELECT vec_id AS doc_id,
               row_number() OVER (ORDER BY cos DESC, vec_id) AS dense_rnk
        FROM (SELECT vec_id, cos FROM den0
              ORDER BY cos DESC, vec_id LIMIT 50)),
      f AS (
        SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rnk, d.dense_rnk,
               coalesce(1000000 // (60 + l.lex_rnk), 0)
                 + coalesce(1000000 // (60 + d.dense_rnk), 0) AS rrf_u
        FROM lex l FULL JOIN den d ON l.doc_id = d.doc_id)
      SELECT doc_id, CAST(lex_rnk AS BIGINT) AS lex_rnk,
             CAST(dense_rnk AS BIGINT) AS dense_rnk,
             CAST(rrf_u AS BIGINT) AS rrf_u, CAST(rnk AS BIGINT) AS rnk
      FROM (SELECT f.*, row_number() OVER (ORDER BY rrf_u DESC, doc_id)
                     AS rnk FROM f) x
      WHERE rnk <= 20""",

    "q249_dsir_weights" -> s"""
      WITH t AS (
        SELECT doc_id, lang,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        FROM documents),
      bg AS (
        SELECT doc_id, lang,
               ${h60Sql("dsir", "(toks[i-1] || ' ' || toks[i])")} % $DsirB
                 AS bkt
        FROM t, UNNEST(generate_series(2, len(toks))) AS u(i)
        WHERE len(toks) >= 2),
      cc AS (SELECT bkt, count(*) AS cc FROM bg GROUP BY bkt),
      ct AS (SELECT bkt, count(*) AS ct FROM bg WHERE lang = 'en'
             GROUP BY bkt),
      tot AS (SELECT count(*) AS tot_c,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tot_t
              FROM bg),
      lr AS (
        SELECT cc.bkt,
               CAST(round((ln(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE)
                               / (tot.tot_t + $DsirB))
                         - ln(CAST(cc.cc + 1 AS DOUBLE)
                               / (tot.tot_c + $DsirB))) * 1000) AS BIGINT)
                 AS lr_mlb
        FROM cc LEFT JOIN ct ON cc.bkt = ct.bkt, tot)
      SELECT bg.doc_id, count(*) AS n_feats,
             CAST(sum(lr.lr_mlb) AS BIGINT) AS weight_mlb,
             CAST(sum(lr.lr_mlb) AS BIGINT) > 0 AS selected
      FROM bg JOIN lr ON bg.bkt = lr.bkt
      GROUP BY bg.doc_id"""
  )
}
