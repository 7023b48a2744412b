package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Near-duplicate detection at scale (builder north star): MinHash+LSH and
 * SimHash over `documents`. The 100 TB design: signatures are computed in
 * one explode + one hash-exchange per doc; candidate generation is an
 * equi-join on band/chunk keys (shuffle keyed on small buckets, never the
 * O(n²) pair space); only candidates pay the verification cost.
 *
 * Portability: every hash is derived from md5 (`h(seed,s) = first 15 hex
 * digits of md5("seed:"+s) as a 60-bit BIGINT`), so the DuckDB oracles
 * replicate signatures bit-for-bit — the whole pipeline is verified
 * value-exactly, not just "rows > 0".
 */
object DedupOps {

  /** 60-bit portable hash as a Column expression (md5-derived). */
  private def h60(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10).cast("long")

  /** Same hash in DuckDB SQL. */
  private def h60Sql(seed: Int, s: String): String =
    s"CAST(('0x' || substr(md5('$seed:' || $s), 1, 15)) AS BIGINT)"

  val NumPerm = 16 // minhash permutations
  val Bands = 4    // LSH bands (4 rows per band)
  val SimBits = 60 // simhash width
  val SimChunks = 4 // banding chunks for hamming candidates (15 bits each)

  /** doc_id + distinct word-trigram shingles (shared with TextOps.q37). */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> " +
        "concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("sh"))

  // Universal-hash permutation constants: perm_i(h) = (a_i*h + b_i) mod p
  // over the 31-bit truncation of the base hash. One md5 per shingle
  // instead of NumPerm of them — at 100 TB the signature stage is
  // hash-bound, so this is a 16x cut in its CPU. a_i*h < 2^62 stays in
  // BIGINT for both engines; constants are fixed so oracles reproduce.
  val MersenneP = 2147483647L // 2^31 - 1
  private def permA(i: Int): Long = 2L * i + 3
  private def permB(i: Int): Long = 1000003L * (i + 1)

  /** MinHash signature per doc: one md5 per shingle + NumPerm affine
    * permutations, computed per ROW by the custom `MinHashSig`
    * expression — a pure scan projection, NO explode/groupBy exchanges
    * (they were the signature stage's whole cost; the aggregate dual
    * lives on in DedupOpsSpec as the independent parity reference). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), minhashSigExpr("text").as("sig"))
      .filter(col("sig").isNotNull) // <3 tokens: no trigram shingles
      .select(col("doc_id") +:
        (0 until NumPerm).map(i => col("sig")(i).as(s"m$i")): _*)

  /** The explode+groupBy formulation of the signature — retained as the
    * independent dual the spec checks `MinHashSig` against bit-for-bit. */
  def minhashSignaturesAggDual(s: SparkSession, dir: String): DataFrame = {
    val base = shingles(s, dir)
      .withColumn("h31", h60(0, col("sh")).bitwiseAND(lit(0x7FFFFFFFL)))
    base.groupBy("doc_id")
      .agg(
        min((col("h31") * permA(0) + permB(0)) % MersenneP).as("m0"),
        (1 until NumPerm).map(i =>
          min((col("h31") * permA(i) + permB(i)) % MersenneP).as(s"m$i")): _*)
  }

  /**
   * Expression-only MinHash signature of a text column: the same
   * NumPerm affine permutations as `minhashSignatures`, but computed
   * per ROW with higher-order array functions (one md5 per shingle,
   * then NumPerm array_min folds) — no explode, no groupBy. This is the
   * form a STREAMING pipeline needs (no blocking aggregation) and is
   * bit-identical to the batch signature (asserted in StreamingSpec).
   * Docs with fewer than 3 tokens have no trigram shingles → NULL.
   */
  def minhashSigExpr(textCol: String): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.MinHashSig(
        org.apache.spark.sql.graftbridge.Bridge.expression(col(textCol)),
        (0 until NumPerm).map(permA).toArray,
        (0 until NumPerm).map(permB).toArray,
        MersenneP))

  /** Near-dup dedup key: md5 over the signature; exact-text fallback for
    * sub-shingle docs (NULL signature). */
  def minhashSigKey(textCol: String): Column =
    coalesce(
      md5(concat_ws("_", minhashSigExpr(textCol).cast("array<string>"))),
      md5(col(textCol)))

  /** Distinct LSH candidate pairs (da < db): band-key equi-join over the
    * banded signature — the shuffle is keyed on small band buckets, the
    * O(n²) pair space never materializes. */
  private def bandCandidates(sig: DataFrame): DataFrame = {
    val rowsPerBand = NumPerm / Bands
    // band key = md5 of the band's signature slice
    val banded = sig.select(col("doc_id") +: (0 until Bands).map { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"m$i").cast("string"))
      md5(concat_ws("_", slice: _*)).as(s"b$b")
    }: _*)
    val bandKv = banded.select(col("doc_id"), explode(array(
      (0 until Bands).map(b => struct(lit(b).as("band"), col(s"b$b").as("key"))): _*
    )).as("bk")).select(col("doc_id"), col("bk.band"), col("bk.key"))
    bandKv.as("x").join(bandKv.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Candidate pairs from LSH banding + signature-agreement estimate.
    "q39_minhash_dedup" -> ((s, dir) => {
      val sig = minhashSignatures(s, dir).cache()
      val cand = bandCandidates(sig)
      val agree = (0 until NumPerm)
        .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
        .reduce(_ + _)
      cand
        .join(sig.as("a"), col("da") === col("a.doc_id"))
        .join(sig.as("b"), col("db") === col("b.doc_id"))
        .select(col("da"), col("db"), agree.as("n_agree"),
                round(agree.cast("double") / NumPerm, 6).as("est_jac"))
        .filter(col("n_agree") >= 4)
    }),

    // 60-bit SimHash per document over distinct tokens — ONE fused
    // aggregate (graft.plans.SimHashAgg: a 60-int vote buffer with
    // map-side partial merge) instead of 60 independent sum(CASE)
    // columns; identical bit semantics, several-fold cheaper update.
    "q40_simhash" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))
        .withColumn("h", h60(99, col("tok")))
      val simAgg = org.apache.spark.sql.graftbridge.Bridge.column(
        graft.plans.SimHashAgg(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("h")),
          SimBits).toAggregateExpression())
      toks.groupBy("doc_id").agg(simAgg.as("simhash"))
    }),

    // SimHash near-dup pairs: chunk-banding candidates, hamming <= 8.
    "q41_simhash_pairs" -> ((s, dir) => {
      val sh = queries("q40_simhash")(s, dir).cache()
      val chunkBits = SimBits / SimChunks
      val mask = (1L << chunkBits) - 1
      val kv = sh.select(col("doc_id"), col("simhash"), explode(array(
        (0 until SimChunks).map(cI => struct(lit(cI).as("c"),
          shiftright(col("simhash"), cI * chunkBits).bitwiseAND(lit(mask))
            .as("key"))): _*)).as("ck"))
        .select(col("doc_id"), col("simhash"), col("ck.c"), col("ck.key"))
      kv.as("x").join(kv.as("y"),
          col("x.c") === col("y.c") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
                bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
                  .as("hamming"))
        .distinct()
        .filter(col("hamming") <= 8)
    }),

    // Scale-true transitive dup-cluster resolution: the 100 TB pipeline
    // shape. LSH banding proposes candidates (equi-join on band keys,
    // never O(n²)); exact trigram-Jaccard verifies ONLY the candidates
    // (array_intersect over the two shingle sets — per-pair linear
    // work); verified edges feed min-label connected components.
    // Contrast with q129, which generates edges from the exact all-pairs
    // shingle join — the verification baseline this path is measured
    // against. Recall is the banding parameter (Bands/NumPerm), the
    // documented knob.
    "q137_dup_clusters_lsh" -> ((s, dir) => {
      val sig = minhashSignatures(s, dir).cache()
      val cand = bandCandidates(sig)
      val docSh = shingles(s, dir).groupBy("doc_id")
        .agg(collect_set(col("sh")).as("shs"))
      val verified = cand
        .join(docSh.as("a"), col("da") === col("a.doc_id"))
        .join(docSh.as("b"), col("db") === col("b.doc_id"))
        .withColumn("inter",
          size(array_intersect(col("a.shs"), col("b.shs"))))
        .withColumn("jac", col("inter").cast("double") /
          (size(col("a.shs")) + size(col("b.shs")) - col("inter")))
        .filter(col("jac") >= 0.5)
        .select(col("da").as("src"), col("db").as("dst"))
      val comp = graft.graph.GraphOps.connectedComponents(verified)
        .select(col("node").as("doc_id"), col("component").as("cluster"))
      val wC = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster"))
      comp.withColumn("csize", count(lit(1)).over(wC))
    }),

    // LSH banding PRECISION swept over τ — the complement of q143's
    // recall: of the candidate pairs the band join surfaces, what
    // fraction are true near-dups (exact trigram Jaccard ≥ τ)? Paid
    // only on the candidate set (the thing precision bounds is exactly
    // the wasted verify work), thresholds compared in cross-multiplied
    // INTEGERS so the oracle agrees at the boundary. Precision + recall
    // together budget the Bands/NumPerm knob analytically.
    "q170_band_precision" -> ((s, dir) => {
      val sig = minhashSignatures(s, dir)
      val cand = bandCandidates(sig)
      val docSh = shingles(s, dir).groupBy("doc_id")
        .agg(collect_set(col("sh")).as("shs"))
      val j = cand
        .join(docSh.as("a"), col("da") === col("a.doc_id"))
        .join(docSh.as("b"), col("db") === col("b.doc_id"))
        .withColumn("inter",
          size(array_intersect(col("a.shs"), col("b.shs"))).cast("long"))
        .withColumn("na", size(col("a.shs")).cast("long"))
        .withColumn("nb", size(col("b.shs")).cast("long"))
      val taus = Seq(2, 3, 4, 5) // τ = t/10
      val tSums: Seq[Column] = taus.map(tt => sum(when(
        col("inter") * 10 >= lit(tt) * (col("na") + col("nb") - col("inter")),
        1L).otherwise(0L)).as(s"t$tt"))
      val aggCols = count(lit(1)).as("n_cand") +: tSums
      val agg = j.agg(aggCols.head, aggCols.tail: _*)
      agg.select(col("n_cand"), expr("stack(4, " +
          "CAST(0.2 AS DOUBLE), t2, CAST(0.3 AS DOUBLE), t3, " +
          "CAST(0.4 AS DOUBLE), t4, CAST(0.5 AS DOUBLE), t5) " +
          "as (tau, n_true)"))
        .withColumn("precision",
          round(col("n_true").cast("double") / col("n_cand"), 6))
    }),

    // Segment-level exact dedup (the C4/RefinedWeb "remove duplicated
    // lines" pass, adapted to the delimiter-free fixture): each doc is
    // chunked into fixed 10-token segments, a segment is a duplicate
    // when its text occurs in ≥2 DISTINCT documents, and each doc
    // reports its duplicated-segment fraction (the drop/keep signal).
    // Scale: segments travel as md5 digests — the shuffle key is 16
    // bytes regardless of segment length — and the frequency table is
    // a hash-exchange groupBy, never any pairwise comparison.
    "q166_segment_dedup" -> ((s, dir) => {
      val segs = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, (size(toks) - 1) div 10), " +
          "i -> md5(concat_ws(' ', slice(toks, i * 10 + 1, 10))))"))
          .as("h"))
      val freq = segs.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("ndocs"))
      segs.join(freq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
             sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup_segs"))
        .withColumn("dup_frac",
          round(col("n_dup_segs").cast("double") / col("n_segs"), 6))
    })
  )

  // ---------------------------------------------------------------- oracles

  private def shinglesSql = """
      toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3)"""

  private val simhashSql: String = {
    val sums = (0 until SimBits).map(b =>
      s"sum(CASE WHEN (h & ${1L << b}) != 0 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n               ")
    val assemble = (0 until SimBits)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""
      WITH toks AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
              FROM documents) u),
      hashed AS (
        SELECT doc_id, ${h60Sql(99, "tok")} AS h FROM toks),
      sums AS (
        SELECT doc_id, $sums
        FROM hashed GROUP BY doc_id)
      SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM sums"""
  }

  val oracle: Map[String, String] = Map(
    "q39_minhash_dedup" -> {
      val minCols = (0 until NumPerm)
        .map(i => s"min((h31 * ${permA(i)} + ${permB(i)}) % $MersenneP) AS m$i")
        .mkString(",\n               ")
      val rowsPerBand = NumPerm / Bands
      val bandCols = (0 until Bands).map { b =>
        val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || '_' || ")
        s"md5($slice) AS b$b"
      }.mkString(",\n               ")
      val bandUnion = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
        .mkString("\n        UNION ALL\n        ")
      val agreeExpr = (0 until NumPerm)
        .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH $shinglesSql,
      hashed AS (
        SELECT doc_id, ${h60Sql(0, "s")} & 2147483647 AS h31 FROM sh),
      sig AS (
        SELECT doc_id, $minCols
        FROM hashed GROUP BY doc_id),
      banded AS (
        SELECT doc_id, $bandCols
        FROM sig),
      bandkv AS (
        $bandUnion),
      cand AS (
        SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        FROM bandkv x JOIN bandkv y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
      SELECT da, db,
             ($agreeExpr) AS n_agree,
             round(CAST(($agreeExpr) AS DOUBLE) / $NumPerm, 6) AS est_jac
      FROM cand
      JOIN sig a ON da = a.doc_id
      JOIN sig b ON db = b.doc_id
      WHERE ($agreeExpr) >= 4"""
    },

    "q137_dup_clusters_lsh" -> {
      val minCols = (0 until NumPerm)
        .map(i => s"min((h31 * ${permA(i)} + ${permB(i)}) % $MersenneP) AS m$i")
        .mkString(",\n               ")
      val rowsPerBand = NumPerm / Bands
      val bandCols = (0 until Bands).map { b =>
        val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || '_' || ")
        s"md5($slice) AS b$b"
      }.mkString(",\n               ")
      val bandUnion = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
        .mkString("\n        UNION ALL\n        ")
      // intersection via the shingle join restricted to candidate pairs
      // (equals Spark's array_intersect size — shingles are distinct);
      // zero-intersection candidates drop out, harmless below jac 0.5
      s"""
      WITH RECURSIVE $shinglesSql,
      hashed AS (
        SELECT doc_id, ${h60Sql(0, "s")} & 2147483647 AS h31 FROM sh),
      sig AS (
        SELECT doc_id, $minCols
        FROM hashed GROUP BY doc_id),
      banded AS (
        SELECT doc_id, $bandCols
        FROM sig),
      bandkv AS (
        $bandUnion),
      cand AS (
        SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        FROM bandkv x JOIN bandkv y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.da, c.db, count(*) AS i
        FROM cand c
        JOIN sh a ON c.da = a.doc_id
        JOIN sh b ON c.db = b.doc_id AND a.s = b.s
        GROUP BY c.da, c.db),
      edges AS (
        SELECT i.da AS src, i.db AS dst
        FROM inter i
        JOIN cnt ca ON i.da = ca.doc_id
        JOIN cnt cb ON i.db = cb.doc_id
        WHERE CAST(i.i AS DOUBLE) / (ca.n + cb.n - i.i) >= 0.5),
      sym AS (SELECT src, dst FROM edges
              UNION SELECT dst, src FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s2.dst FROM reach r JOIN sym s2 ON r.dst = s2.src),
      comp AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster
        FROM reach GROUP BY src)
      SELECT doc_id, cluster,
             count(*) OVER (PARTITION BY cluster) AS csize
      FROM comp"""
    },

    "q40_simhash" -> simhashSql,

    "q41_simhash_pairs" -> {
      val chunkBits = SimBits / SimChunks
      val mask = (1L << chunkBits) - 1
      val chunkUnion = (0 until SimChunks).map(cI =>
        s"SELECT doc_id, simhash, $cI AS c, (simhash >> ${cI * chunkBits}) & $mask AS key FROM sh")
        .mkString("\n        UNION ALL\n        ")
      s"""
      WITH sh0 AS ($simhashSql),
      sh AS (SELECT * FROM sh0),
      kv AS (
        $chunkUnion)
      SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
             CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
      FROM kv x JOIN kv y
        ON x.c = y.c AND x.key = y.key AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 8"""
    },

    "q170_band_precision" -> {
      val minCols = (0 until NumPerm)
        .map(i => s"min((h31 * ${permA(i)} + ${permB(i)}) % $MersenneP) AS m$i")
        .mkString(",\n               ")
      val rowsPerBand = NumPerm / Bands
      val bandCols = (0 until Bands).map { b =>
        val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || '_' || ")
        s"md5($slice) AS b$b"
      }.mkString(",\n               ")
      val bandUnion = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS band, b$b AS key FROM banded")
        .mkString("\n        UNION ALL\n        ")
      val tSums = Seq(2, 3, 4, 5).map(tt =>
        s"CAST(sum(CASE WHEN inter * 10 >= $tt * (na + nb - inter) " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS t$tt").mkString(",\n               ")
      val rows = Seq(2, 3, 4, 5).map(tt =>
        s"SELECT n_cand, CAST(0.$tt AS DOUBLE) AS tau, t$tt AS n_true, " +
          s"round(CAST(t$tt AS DOUBLE) / n_cand, 6) AS precision FROM a")
        .mkString("\n      UNION ALL\n      ")
      s"""
      WITH $shinglesSql,
      hashed AS (
        SELECT doc_id, ${h60Sql(0, "s")} & 2147483647 AS h31 FROM sh),
      sig AS (
        SELECT doc_id, $minCols
        FROM hashed GROUP BY doc_id),
      banded AS (
        SELECT doc_id, $bandCols
        FROM sig),
      bandkv AS (
        $bandUnion),
      cand AS (
        SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        FROM bandkv x JOIN bandkv y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
      i0 AS (
        SELECT c.da, c.db, count(*) AS inter
        FROM cand c
        JOIN sh a ON a.doc_id = c.da
        JOIN sh b ON b.doc_id = c.db AND a.s = b.s
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      jj AS (
        SELECT c.da, c.db, coalesce(i0.inter, 0) AS inter,
               ca.n AS na, cb.n AS nb
        FROM cand c
        LEFT JOIN i0 ON c.da = i0.da AND c.db = i0.db
        JOIN cnt ca ON c.da = ca.doc_id
        JOIN cnt cb ON c.db = cb.doc_id),
      a AS (
        SELECT count(*) AS n_cand,
               $tSums
        FROM jj)
      $rows"""
    },

    "q166_segment_dedup" -> """
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        FROM documents),
      segs AS (
        SELECT doc_id,
               md5(array_to_string(a[(i*10+1):(i*10+10)], ' ')) AS h
        FROM t, UNNEST(generate_series(0, (len(a) - 1) // 10)) AS g(i)
        WHERE len(a) >= 1),
      freq AS (SELECT h, count(DISTINCT doc_id) AS ndocs
               FROM segs GROUP BY h)
      SELECT doc_id, count(*) AS n_segs,
             CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_segs,
             round(CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS dup_frac
      FROM segs JOIN freq USING (h)
      GROUP BY doc_id"""
  )
}
