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

  /** Fixed IVF centroid count — independent of corpus size, so the
   *  K-row driver collect and the plan literal stay O(K) at any scale. */
  private val ivfK = 40

  /** Deterministic fixed-K coarse quantizer shared by q85 (ANN) and
    * q161 (semantic dedup): centroids are the K rows with the smallest
    * md5(vec_id) — reproducible, corpus-size-independent — and each
    * `corpus` row is assigned its nearest centroid as a SHUFFLE-FREE
    * argmax projection (the centroid table folded into one array
    * literal; array_max over struct(cos, -cid) = max cos, ties to the
    * smaller cid). Returns (corpus + cid, broadcastable centroid DF). */
  private def ivfAssign(emb: DataFrame, corpus: DataFrame)
      : (DataFrame, DataFrame) = {
    val centSel = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(ivfK)
    val centRows = centSel
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getSeq[Float](1)))
      .sortBy(_._1).toSeq
    // one Literal node holding the whole K-row centroid table (NOT a
    // per-element expression tree) — constant-folded into codegen
    val centsArr = typedLit(centRows)
      .cast("array<struct<cid:bigint,cent:array<float>>>")
    val cents = broadcast(centSel
      .select(col("vec_id").as("cid"), col("embedding").as("cent")))
    val assigned = corpus
      .withColumn("cents", centsArr)
      .withColumn("best", expr(
        "array_max(transform(cents, c -> struct(cosine_sim(embedding, c.cent) AS cos, -c.cid AS ncid)))"))
      .drop("cents")
      .withColumn("cid", -col("best.ncid"))
      .drop("best")
    (assigned, cents)
  }

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
    }),

    // IVF (inverted-file) ANN — the scale path beside AnnOps' LSH:
    // a coarse quantizer of FIXED size K (deterministic sample: the K
    // rows with the smallest md5(vec_id) — a TakeOrderedAndProject scan,
    // no full sort, reproducible by the oracle) partitions the corpus
    // into one inverted list per centroid; queries probe only their
    // nprobe=2 nearest lists, then re-rank exactly inside them.
    // 100 TB: K is INDEPENDENT of corpus size, so the K-row collect()
    // and the centroid literal are O(K) forever — corpus→centroid
    // assignment stays a SHUFFLE-FREE argmax PROJECTION (centroids
    // folded into one array literal, transform + array_max picks the
    // nearest); the corpus is only ever shuffled ONCE, by the candidate
    // equi-join on cid; the O(q × corpus) pair space never materializes,
    // and list sizes are corpus/K, tunable via K to fit executor memory.
    // (If K were ever raised past literal-friendly size, swap the
    // projection for the broadcast-join on `cents` below — same result.)
    "q85_ann_ivf" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val cos = graft.functions.GraftFunctions.cosineSim _
      val (assigned0, cents) = ivfAssign(emb,
        emb.filter(col("vec_id") >= 10)
          .select(col("vec_id"), col("embedding")))
      val assigned = assigned0
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
                col("cid"))
      // each query probes its nprobe nearest centroids
      val wProbe = Window.partitionBy("q_id")
        .orderBy(col("p_cos").desc, col("cid"))
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .crossJoin(cents)
        .withColumn("p_cos", cos(col("q_emb"), col("cent")))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= 2)
        .select(col("q_id"), col("q_emb"), col("cid"))
      val wTop = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("cand_id"))
      broadcast(probes).join(assigned, "cid")
        .withColumn("cos", cos(col("q_emb"), col("c_emb")))
        .withColumn("rnk", row_number().over(wTop))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("cand_id"), col("rnk"),
                round(col("cos"), 6).as("sim"))
    }),

    // Semantic dedup (SemDeDup, Abbas et al. 2023): candidates = same
    // IVF cell (the coarse quantizer doubles as the blocking key), exact
    // cosine inside the cell, min-id representative kept — the
    // embedding-space dual of the LSH-bucketed q114. 100 TB: the corpus
    // shuffles ONCE (by cid); per-cell pair work is (corpus/K)² per
    // cell, tuned by K; output shape matches q114 so the two blocking
    // strategies are directly comparable.
    "q165_semantic_dedup" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val (assigned, _) = ivfAssign(emb,
        emb.select(col("vec_id"), col("embedding")))
      val a = assigned.select(col("cid"), col("vec_id").as("a"),
                              col("embedding").as("ea"))
      val b = assigned.select(col("cid").as("cid_b"), col("vec_id").as("b"),
                              col("embedding").as("eb"))
      a.join(b, col("cid") === col("cid_b") && col("a") < col("b"))
        .withColumn("cos",
          graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb")))
        .filter(col("cos") >= 0.3)
        .groupBy(col("b").as("vec_id"))
        .agg(min(col("a")).as("dup_of"),
             count(lit(1)).as("n_dups"),
             round(max(col("cos")), 6).as("sim"))
    }),

    // IVF recall@5 — the q143 measurement for the OTHER index: per
    // query, how many of the brute-force top-5 the nprobe=2 IVF probe
    // returned. Every ANN path in the engine ships with its measured
    // recall (LSH: q143/q144, IVF: here); at 100 TB the ground-truth
    // side runs on a fixed probe sample exactly as q143 documents.
    // Recall of the COMPRESSED ANN paths (q310 SQ8 scan, q311 IVF-SQ8)
    // against the exact float top-5 ground truth (q38) — the q168
    // measurement discipline applied to the quantized indexes: the
    // compression claim ("4× smaller codes, integer kernels") is only
    // honest next to its measured accuracy cost. Per query:
    // hits-in-top-5 and recall@5 for each path. SQ8's loss comes from
    // quantization alone; IVF-SQ8 additionally pays the nprobe/K
    // pruning, so recall_ivf ≤ recall_sq8 row-wise in expectation.
    "q312_sq8_recall" -> ((s, dir) => {
      val gt = queries("q38_cosine_topk")(s, dir)
        .select(col("q_id"), col("cand_id"))
      def hits(df: DataFrame, n: String) = gt.join(
          df.select(col("q_id").as("iq"), col("cand_id").as("ic")),
          col("q_id") === col("iq") && col("cand_id") === col("ic"))
        .groupBy("q_id").agg(count(lit(1)).as(n))
      val sq = hits(AnnOps.queries("q310_sq8_ann")(s, dir), "nh_sq8")
      val iv = hits(AnnOps.queries("q311_ivf_sq8")(s, dir), "nh_ivf")
      gt.select("q_id").distinct()
        .join(sq, Seq("q_id"), "left")
        .join(iv, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("nh_sq8"), lit(0L)).cast("int").as("n_hit_sq8"),
          (coalesce(col("nh_sq8"), lit(0L)).cast("double") / lit(5.0))
            .as("recall_sq8"),
          coalesce(col("nh_ivf"), lit(0L)).cast("int").as("n_hit_ivf"),
          (coalesce(col("nh_ivf"), lit(0L)).cast("double") / lit(5.0))
            .as("recall_ivf"))
    }),

    // PQ's accuracy cost measured next to ITS claim (q312's discipline
    // for the third compression path): recall@5 of the q326 ADC scan
    // vs the exact float top-5. PQ loses more than SQ8 by construction
    // — each subspace snaps to one of 16 codewords instead of a
    // per-component grid — which is exactly the capacity trade (32x
    // smaller codes) this gate prices.
    "q327_pq_recall" -> ((s, dir) => {
      val gt = queries("q38_cosine_topk")(s, dir)
        .select(col("q_id"), col("cand_id"))
      def hits(df: DataFrame, n: String) = gt.join(
          df.select(col("q_id").as("iq"), col("cand_id").as("ic")),
          col("q_id") === col("iq") && col("cand_id") === col("ic"))
        .groupBy("q_id").agg(count(lit(1)).as(n))
      val pq = hits(AnnOps.queries("q326_pq_ann")(s, dir), "nh_pq")
      val ip = hits(AnnOps.queries("q328_ivf_pq")(s, dir), "nh_ivfpq")
      gt.select("q_id").distinct()
        .join(pq, Seq("q_id"), "left")
        .join(ip, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("nh_pq"), lit(0L)).cast("int").as("n_hit_pq"),
          (coalesce(col("nh_pq"), lit(0L)).cast("double") / lit(5.0))
            .as("recall_pq"),
          coalesce(col("nh_ivfpq"), lit(0L)).cast("int").as("n_hit_ivfpq"),
          (coalesce(col("nh_ivfpq"), lit(0L)).cast("double") / lit(5.0))
            .as("recall_ivfpq"))
    }),

    // The nprobe/recall CURVE for IVF-SQ8 (q312 reports the single
    // nprobe=2 point — one number can't separate a mis-built index
    // from a hostile fixture): recall@5 vs the exact float top-5 at
    // nprobe ∈ {1, 2, 4, 8}. Monotone by construction (more probed
    // lists ⊇ fewer), and nprobe = K probes EVERY list — the candidate
    // set degenerates to q310's full SQ8 scan, so the curve must end
    // at the SQ8 ceiling: the knob provably buys back everything the
    // pruning cost, which is the operational answer a capacity planner
    // needs (the same analytic-budget discipline as q143/q144's
    // theory floors for LSH).
    "q317_ivf_nprobe_sweep" -> ((s, dir) => {
      val nps = Seq(1, 2, 4, 8)
      val gt = queries("q38_cosine_topk")(s, dir)
        .select(col("q_id"), col("cand_id"))
      val tot = gt.groupBy().agg(count(lit(1)).as("n_rel"))
      // ONE shared index pipeline serves all four points (ivfSq8Sweep:
      // one scan/checkpoint, one centroid pick, one assignment — not
      // |nps| rebuilds); missing-np rows surface as 0 hits via the
      // left join, mirroring the oracle's `nps LEFT JOIN hits`
      val hits = AnnOps.ivfSq8Sweep(s, dir, nps)
        .select(col("np"), col("q_id"), col("cand_id"))
        .join(gt, Seq("q_id", "cand_id"))
        .groupBy("np").agg(count(lit(1)).as("n_hit"))
      s.range(1).select(explode(typedLit(nps)).as("np"))
        .join(hits, Seq("np"), "left")
        .crossJoin(tot)
        .select(col("np").cast("int").as("nprobe"),
                coalesce(col("n_hit"), lit(0L)).cast("bigint").as("n_hit"),
                round(coalesce(col("n_hit"), lit(0L)).cast("double") /
                      col("n_rel"), 6).as("recall_at_5"))
    }),

    "q168_ivf_recall" -> ((s, dir) => {
      val gt = queries("q38_cosine_topk")(s, dir)
        .select(col("q_id"), col("cand_id"))
      val iv = queries("q85_ann_ivf")(s, dir)
        .select(col("q_id").as("iq"), col("cand_id").as("ic"))
      val hit = gt.join(iv,
          col("q_id") === col("iq") && col("cand_id") === col("ic"))
        .groupBy("q_id").agg(count(lit(1)).as("nh"))
      gt.select("q_id").distinct()
        .join(hit, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("nh"), lit(0L)).cast("int").as("n_hit"),
          (coalesce(col("nh"), lit(0L)).cast("double") / lit(5.0))
            .as("recall_at_5"))
    }),

    // Deterministic Lloyd k-means (document/topic clustering for
    // curation mixtures): K=8, two (assign, update) rounds + final
    // assignment. Seeding reuses the IVF md5(vec_id) deterministic
    // sample. Every cross-engine-sensitive reduction is either a
    // per-pair in-array-order fold (the q85-proven score idiom, query
    // norm dropped — it cannot change an argmax) or exact integer math
    // (centroid sums in int-micros, mean as floor of one double
    // division), so the fully unrolled DuckDB dual hash-matches.
    // 100 TB: per round, assignment is a SHUFFLE-FREE projection against
    // an O(K) broadcast literal and the update is one partial-agg
    // shuffle on (cid, pos) — K-row driver collects, like IVF; rounds
    // are a fixed constant. (Reference has no clustering op; this is a
    // pipeline-extra like DSIR/SemDeDup, which both consume it.)
    "q254_kmeans" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val kk = 8
      val quant = "CAST(floor(CAST(x AS DOUBLE) * 1000000D) AS BIGINT)"
      var cents: Seq[(Long, Seq[Long])] = emb
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(kk)
        .select(col("vec_id"),
          expr(s"transform(embedding, x -> $quant)").as("cent"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
        .sortBy(_._1).toSeq
      def assigned(): DataFrame = {
        val centsArr = typedLit(cents)
          .cast("array<struct<cid:bigint,cent:array<bigint>>>")
        emb.withColumn("cents", centsArr)
          .withColumn("best", expr(
            """array_max(transform(cents, c -> struct(
              |  aggregate(zip_with(embedding, c.cent,
              |      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              |    0D, (a, v) -> a + v)
              |  / sqrt(aggregate(transform(c.cent,
              |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
              |      0D, (a, v) -> a + v)) AS score,
              |  -c.cid AS ncid)))""".stripMargin))
          .withColumn("cid", -col("best.ncid"))
          .drop("cents", "best")
      }
      for (_ <- 1 to 2) {
        val upd = assigned()
          .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(expr(quant)).as("sx"), count(lit(1)).as("n"))
          .withColumn("cj", expr(
            "CAST(floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)"))
          .groupBy("cid")
          .agg(expr(
            "transform(array_sort(collect_list(struct(pos, cj))), p -> p.cj)")
            .as("cent"))
        val updMap = upd.collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
        // a cluster that captured no rows keeps its previous centroid
        cents = cents.map { case (cid, old) => (cid, updMap.getOrElse(cid, old)) }
      }
      assigned().select(col("vec_id"), col("cid"))
    }),

    // Cluster-balanced subset selection (the curation step after
    // clustering — SemDeDup/DoReMi-style mixtures take a bounded quota
    // per semantic bucket instead of a global head that one dominant
    // cluster would fill): q254's assignment → deterministic md5 order
    // per cluster → top-20 quota. The rank filter compiles to
    // WindowGroupLimit (Spark ≥3.5 rank pushdown), so each cluster's
    // partition computes only its top-k — no global sort at scale.
    "q264_cluster_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("cid"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      queries("q254_kmeans")(s, dir)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 20)
        .select(col("vec_id"), col("cid"), col("rnk").cast("int").as("rnk"))
    }),

    // Gram/covariance matrix of the embedding corpus (the one-pass
    // second-moment aggregate under PCA / whitening / Mahalanobis
    // pipelines). Values quantize to integer milli-units FIRST, then
    // each row explodes only its upper-triangle index pairs through ONE
    // generator — no self-join, no dense matrix object — and partial
    // (map-side) aggregation collapses every partition to ≤ d(d+1)/2 =
    // 2080 cells before the shuffle: the per-partition Gram
    // accumulation a 100 TB pass needs, written declaratively. Final
    // covariance = (Σxy − ΣxΣy/n)/n on exact BIGINTs.
    "q286_embedding_gram" -> ((s, dir) => {
      // quantized corpus, materialized once: the count action, the
      // first-moment pass and the pair-cell pass all read the
      // checkpoint — the raw corpus is scanned exactly ONCE
      val q = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
            .as("q"))
        .transform(Materialize.frame)
      val n = q.count()
      val gram = q.select(expr(
          "explode(flatten(transform(sequence(0, 63), i -> " +
          "transform(sequence(i, 63), j -> " +
          "struct(i AS i, j AS j, q[i] * q[j] AS p)))))").as("c"))
        .groupBy(col("c.i").as("i0"), col("c.j").as("j0"))
        .agg(sum(col("c.p")).as("gram"))
      // 64-row first-moment table, materialized once (it feeds both the
      // si and sj broadcast legs — unchecked, the corpus would be
      // scanned a third time for the second leg)
      val sums = q.select(expr(
          "explode(transform(sequence(0, 63), i -> " +
          "struct(i AS i, q[i] AS v)))").as("c"))
        .groupBy(col("c.i").as("i0")).agg(sum(col("c.v")).as("s"))
        .transform(Materialize.frame)
      gram
        .join(broadcast(sums.select(col("i0"), col("s").as("si"))), "i0")
        .join(broadcast(sums.select(col("i0").as("j0"), col("s").as("sj"))),
          "j0")
        .select((col("i0") + 1).as("i"), (col("j0") + 1).as("j"),
          col("gram"),
          round((col("gram").cast("double")
            - col("si").cast("double") * col("sj").cast("double")
              / lit(n.toDouble)) / lit(n.toDouble), 6).as("cov"))
    }),

    // Per-label centroid table (the supervised sibling of q254's
    // k-means): per (label, dimension) count, integer milli-sum and
    // mean. One generator + one partial-aggregated groupBy — the
    // class-profile pass of classifier-quality and Mahalanobis-distance
    // pipelines, 640 output cells regardless of corpus size.
    "q287_label_centroids" -> ((s, dir) => {
      Tables.table(s, dir, "embeddings")
        .select(col("label"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
            .as("q"))
        .select(col("label"), expr(
          "explode(transform(sequence(0, 63), i -> " +
          "struct(i AS i, q[i] AS v)))").as("c"))
        .groupBy(col("label"), (col("c.i") + 1).as("i"))
        .agg(count(lit(1)).as("n"), sum(col("c.v")).as("s"))
        .withColumn("mean_milli",
          round(col("s").cast("double") / col("n"), 6))
    }),

    // Diagonal-Mahalanobis embedding outlier score (the embedding-space
    // quality gate: distribution-level anomalies that cosine near-dup
    // checks can't see). Per-dimension corpus mean/variance come from
    // the same integer milli-sums as q286; each vector's score is the
    // sum of 64 per-dimension squared z-scores, each quantized to an
    // integer micro-unit BEFORE summing so the total is order-free and
    // engine-exact. Two-pass profile at 100 TB: a 64-row broadcast
    // moment table, then one embarrassingly parallel scoring scan.
    "q288_embedding_outliers" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val n = emb.count()
      val q = emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as("q"))
      val moments = q.select(expr(
          "explode(transform(sequence(0, 63), i -> " +
          "struct(i AS i, q[i] AS v)))").as("c"))
        .groupBy(col("c.i").as("i"))
        .agg(sum(col("c.v")).as("s"), sum(col("c.v") * col("c.v")).as("s2"))
        .select(col("i"), col("s"),
          ((col("s2").cast("double") - col("s").cast("double")
            * col("s").cast("double") / lit(n.toDouble)) / lit(n.toDouble))
            .as("variance"))
        // A constant (zero-variance) dimension would divide by zero
        // below; ANSI Spark throws while DuckDB errors differently —
        // drop such dimensions in the same subtree (mirrored in the
        // oracle's WHERE m.variance > 0), like adamicAdar's deg >= 2.
        .filter(col("variance") > lit(0.0d))
      val scored = q
        .select(col("vec_id"), expr(
          "explode(transform(sequence(0, 63), i -> " +
          "struct(i AS i, q[i] AS v)))").as("c"))
        .join(broadcast(moments), col("c.i") === moments("i"))
        .select(col("vec_id"),
          expr(s"CAST(round(1000000 * " +
            s"(c.v - CAST(s AS DOUBLE) / ${n.toDouble}) * " +
            s"(c.v - CAST(s AS DOUBLE) / ${n.toDouble}) " +
            s"/ variance) AS BIGINT)").as("z_micro"))
        .groupBy("vec_id")
        .agg(sum(col("z_micro")).as("score_micro"))
      // top-20 via orderBy+limit = TakeOrderedAndProject (distributed
      // partial top-k), NOT a global row_number window (single-task
      // sort of the whole corpus at scale); the rank window then runs
      // on 20 rows only.
      val top = scored.orderBy(col("score_micro").desc, col("vec_id"))
        .limit(20)
      val w = Window.orderBy(col("score_micro").desc, col("vec_id"))
      top.withColumn("rnk", row_number().over(w))
        .select(col("vec_id"), col("score_micro"),
                col("rnk").cast("int").as("rnk"))
    }),

    // PCA projection (the dimensionality-reduction pass under SemDeDup
    // / clustering / visualization pipelines): covariance from the SAME
    // exact integer moment sums as q286 (one corpus scan, partial-agg
    // to ≤2080 cells), eigendecomposed ON THE DRIVER by cyclic Jacobi
    // (a 64×64 symmetric solve — O(d³) driver work, the same O(K)
    // driver-bound argument as IVF's centroid collect), top-8
    // components broadcast back as literals, projections computed in
    // one embarrassingly parallel scan via dot(x, v_j) − ⟨mean, v_j⟩
    // (the mean-centering folds into a per-component constant).
    // Deterministic: integer moment sums are partition-order-free, the
    // Jacobi sweep order is fixed, and each eigenvector's sign is
    // normalized (largest-|coordinate| positive). No SQL oracle — an
    // eigensolve is not expressible in DuckDB SQL; the driver records
    // the weaker rows-only check and PcaSpec verifies the algebra
    // (orthonormality, eigen residual, explained-variance order)
    // against local recomputation.
    "q299_pca_project" -> ((s, dir) => {
      val k = 8
      // ONE corpus scan: the checkpointed quantized frame feeds the
      // moment sums inside pcaModel AND the projection pass below
      val q = quantizedEmbeddings(s, dir).transform(Materialize.frame)
      val (means, _, comps) = pcaModel(q, k)
      val consts = comps.map(v => v.zip(means).map { case (a, b) => a * b }.sum)
      val projCols = (0 until k).map { j =>
        val vSql = comps(j).mkString("array(", "D, ", "D)")
        expr(s"CAST(round(aggregate(zip_with(q, $vSql, " +
          s"(a, b) -> CAST(a AS DOUBLE) * b), 0D, (acc, x) -> acc + x) " +
          s"- ${consts(j)}D) AS BIGINT)").as(s"p${j + 1}")
      }
      q.select(col("vec_id") +: projCols: _*)
    }),

    // Fixed-basis projection — the at-scale HALF of q299 under the hash
    // gate: the same quantized corpus scan and zip_with/aggregate
    // projection kernel, but onto a deterministic md5-seeded
    // Gram-Schmidt basis ([[fixedBasis]], integer 1e-4 units) whose
    // literals both engines share, and with mean-centering done in
    // EXACT integers by scaling through n:
    //   p_j = n·⟨q, b_j⟩ − ⟨S, b_j⟩   (S = per-dimension corpus sums)
    // — algebraically n times the mean-centered projection, with no
    // float division anywhere, so the result hash-matches DuckDB
    // bit-for-bit. The data-dependent eigenbasis stays under q299
    // (rows-only + PcaSpec). Two narrow passes over the checkpointed
    // quantized frame: a 64-sum aggregate (driver gets 65 numbers) and
    // the embarrassingly parallel projection scan. Long-safe for
    // n·|q|·|b|·d up to ~6e17, i.e. corpora to ~1e9 vectors at these
    // quantizations (documented key-range bound).
    "q309_basis_project" -> ((s, dir) => {
      val q = quantizedEmbeddings(s, dir).transform(Materialize.frame)
      val b = fixedBasis
      val srow = q.select(
        (0 until 64).map(i => sum(expr(s"q[$i]")).as(s"s$i")) :+
          count(lit(1)).as("n"): _*).head()
      val n = srow.getLong(64)
      // empty corpus: sum() is null — degrade to the (empty) projection
      // instead of an NPE at plan-build time
      val sums = Array.tabulate(64)(i => if (n == 0L) 0L else srow.getLong(i))
      val projCols = b.zipWithIndex.map { case (bj, j) =>
        val arr = bj.mkString("array(", "L, ", "L)")
        val dotS = bj.zip(sums).map { case (x, y) => x * y }.sum
        expr(s"aggregate(zip_with(q, $arr, (a, b) -> a * b), 0L, " +
          s"(acc, x) -> acc + x) * ${n}L - ${dotS}L").as(s"p${j + 1}")
      }
      q.select(col("vec_id") +: projCols.toSeq: _*)
    })
  )

  /** Deterministic projection basis for q309: 8 pseudo-random 64-dim
    * vectors seeded from md5("graft-basis-j-i"), modified-Gram-Schmidt
    * orthonormalized in double precision, then quantized to integer
    * 1e-4 units. A pure function of nothing — the Spark plan and the
    * DuckDB oracle both consume the SAME integer literals, which is
    * what lets an "orthonormal-basis projection" sit under the exact
    * hash gate at all. */
  private[graft] lazy val fixedBasis: Array[Array[Long]] = {
    val (k, d) = (8, 64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = Array.tabulate(k, d) { (j, i) =>
      val h = md.digest(s"graft-basis-$j-$i".getBytes("UTF-8"))
      (java.nio.ByteBuffer.wrap(h).getLong % 1000L).toDouble
    }
    val vs = raw.map(_.clone)
    for (j <- 0 until k) {
      for (p <- 0 until j) {
        val dot = (0 until d).map(i => vs(j)(i) * vs(p)(i)).sum
        for (i <- 0 until d) vs(j)(i) -= dot * vs(p)(i)
      }
      val nrm = math.sqrt(vs(j).map(x => x * x).sum)
      for (i <- 0 until d) vs(j)(i) /= nrm
    }
    vs.map(_.map(x => math.round(x * 10000.0)))
  }

  /** q309's oracle, generated from the same [[fixedBasis]] literals.
    * DuckDB lists are 1-based; sums and projections are cast back to
    * BIGINT (DuckDB promotes sum(BIGINT) to HUGEINT, which the driver
    * hash cannot represent). */
  private def q309OracleSql: String = {
    val b = fixedBasis
    val sCols = (0 until 64)
      .map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s$i").mkString(", ")
    val pCols = b.zipWithIndex.map { case (bj, j) =>
      val dotQ = bj.zipWithIndex.map { case (x, i) =>
        s"q[${i + 1}]*(${x})" }.mkString(" + ")
      val dotS = bj.zipWithIndex.map { case (x, i) =>
        s"s.s${i}*(${x})" }.mkString(" + ")
      s"CAST(($dotQ) * s.n - ($dotS) AS BIGINT) AS p${j + 1}"
    }.mkString(",\n             ")
    s"""
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        FROM embeddings),
      s AS (SELECT $sCols, count(*) AS n FROM q)
      SELECT vec_id,
             $pCols
      FROM q, s"""
  }

  /** The milli-quantized embedding corpus (vec_id, q) — caller decides
    * whether to checkpoint (q299 does, once, for all downstream reads). */
  private[graft] def quantizedEmbeddings(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as("q"))

  /** Exact integer moment sums → covariance → top-`k` eigenpairs by
    * cyclic Jacobi on the driver, over an already-materialized
    * quantized frame (column `q`) so the corpus is scanned once.
    * Returns (means, eigenvalues desc, components), all in milli-units.
    * Shared by q299 and PcaSpec (which checks the algebra
    * independently). */
  private[graft] def pcaModel(q: DataFrame, k: Int)
      : (Array[Double], Array[Double], Array[Array[Double]]) = {
    val d = 64
    val n = q.count().toDouble
    val cells = q.select(expr(
        "explode(flatten(transform(sequence(0, 63), i -> " +
        "transform(sequence(i, 63), j -> " +
        "struct(i AS i, j AS j, q[i] * q[j] AS p)))))").as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).as("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val sums = q.select(expr(
        "explode(transform(sequence(0, 63), i -> struct(i AS i, q[i] AS v)))")
        .as("c"))
      .groupBy(col("c.i").as("i")).agg(sum(col("c.v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val means = Array.tabulate(d)(i => sums(i) / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val g = cells((math.min(i, j), math.max(i, j)))
      g / n - means(i) * means(j)
    }
    // cyclic Jacobi: fixed sweep order → deterministic rotations
    val a = cov.map(_.clone)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s0 = 0.0
      for (p <- 0 until d; r <- p + 1 until d) s0 += a(p)(r) * a(p)(r)
      math.sqrt(s0)
    }
    var sweep = 0
    while (sweep < 100 && offNorm > 1e-12) {
      for (p <- 0 until d; r <- p + 1 until d if math.abs(a(p)(r)) > 1e-18) {
        val theta = (a(r)(r) - a(p)(p)) / (2.0 * a(p)(r))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s0 = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val air = a(i)(r)
          a(i)(p) = c * aip - s0 * air
          a(i)(r) = s0 * aip + c * air
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val ari = a(r)(i)
          a(p)(i) = c * api - s0 * ari
          a(r)(i) = s0 * api + c * ari
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val vir = v(i)(r)
          v(i)(p) = c * vip - s0 * vir
          v(i)(r) = s0 * vip + c * vir
        }
      }
      sweep += 1
    }
    val pairs = (0 until d).map(j => (a(j)(j), j))
      .sortBy { case (ev, j) => (-ev, j) }.take(k)
    val comps = pairs.map { case (_, j) =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      // deterministic sign: largest-|coordinate| (first on tie) positive
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(m) < 0) vec.map(-_) else vec
    }.toArray
    (means, pairs.map(_._1).toArray, comps)
  }

  private val q38OracleSql: String = """
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

  private val q85OracleSql: String = s"""
      WITH cents AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cent
        FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT $ivfK),
      assigned AS (
        SELECT cand_id, ce, cid FROM (
          SELECT e.vec_id AS cand_id, e.embedding::DOUBLE[] AS ce, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.embedding::DOUBLE[], c.cent)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(c.cent, c.cent))) DESC,
                   c.cid) AS arn
          FROM embeddings e CROSS JOIN cents c
          WHERE e.vec_id >= 10) x
        WHERE arn = 1),
      probes AS (
        SELECT q_id, qe, cid FROM (
          SELECT e.vec_id AS q_id, e.embedding::DOUBLE[] AS qe, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.embedding::DOUBLE[], c.cent)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(c.cent, c.cent))) DESC,
                   c.cid) AS prn
          FROM embeddings e CROSS JOIN cents c
          WHERE e.vec_id < 10) x
        WHERE prn <= 2),
      ranked AS (
        SELECT q_id, cand_id,
               list_dot_product(qe, ce)
                 / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))
                 AS cos,
               row_number() OVER (PARTITION BY q_id ORDER BY
                 list_dot_product(qe, ce)
                   / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))
                 DESC, cand_id) AS rnk
        FROM probes JOIN assigned USING (cid))
      SELECT q_id, cand_id, CAST(rnk AS INT) AS rnk, round(cos, 6) AS sim
      FROM ranked WHERE rnk <= 5"""

  /** One k-means assignment round in DuckDB: nearest centroid by the
    * norm-free score (dot / ||cent||), ties to the smaller cid. */
  private def kmAssignSql(centsCte: String): String = s"""
        SELECT vec_id, cid FROM (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.embedding::DOUBLE[], c.cent::DOUBLE[])
                     / sqrt(list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]))
                   DESC, c.cid) AS rn
          FROM embeddings e CROSS JOIN $centsCte c) x WHERE rn = 1"""

  /** One centroid update round in DuckDB: int-micro quantized mean. */
  private def kmUpdateSql(assignCte: String): String = s"""
        SELECT cid, list(cj ORDER BY i) AS cent FROM (
          SELECT a.cid, g.i,
                 CAST(floor(CAST(sum(CAST(floor(CAST(e.embedding[i] AS DOUBLE)
                                                * 1000000) AS BIGINT)) AS DOUBLE)
                            / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cj
          FROM $assignCte a JOIN embeddings e USING (vec_id),
               UNNEST(generate_series(1, len(e.embedding))) AS g(i)
          GROUP BY a.cid, g.i) z
        GROUP BY cid"""

  private val q254OracleSql: String = s"""
      WITH c0 AS (
        SELECT vec_id AS cid,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS cent
        FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      a1 AS (${kmAssignSql("c0")}),
      u1 AS (${kmUpdateSql("a1")}),
      c1 AS (SELECT c0.cid, COALESCE(u1.cent, c0.cent) AS cent
             FROM c0 LEFT JOIN u1 USING (cid)),
      a2 AS (${kmAssignSql("c1")}),
      u2 AS (${kmUpdateSql("a2")}),
      c2 AS (SELECT c1.cid, COALESCE(u2.cent, c1.cent) AS cent
             FROM c1 LEFT JOIN u2 USING (cid)),
      a3 AS (${kmAssignSql("c2")})
      SELECT vec_id, cid FROM a3"""

  val oracle: Map[String, String] = Map(
    "q254_kmeans" -> q254OracleSql,

    "q309_basis_project" -> q309OracleSql,

    "q286_embedding_gram" -> """
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                 AS q
        FROM embeddings),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
      cells AS (
        SELECT a.i, b.j, CAST(sum(q.q[a.i] * q.q[b.j]) AS BIGINT) AS gram
        FROM q,
             UNNEST(generate_series(1, 64)) AS a(i),
             UNNEST(generate_series(1, 64)) AS b(j)
        WHERE b.j >= a.i
        GROUP BY 1, 2),
      sums AS (
        SELECT g.i, CAST(sum(q.q[g.i]) AS BIGINT) AS s
        FROM q, UNNEST(generate_series(1, 64)) AS g(i)
        GROUP BY 1)
      SELECT c.i, c.j, c.gram,
             round((CAST(c.gram AS DOUBLE)
               - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE) / n.n) / n.n,
               6) AS cov
      FROM cells c
      JOIN sums si ON c.i = si.i
      JOIN sums sj ON c.j = sj.i, n""",

    "q287_label_centroids" -> """
      WITH q AS (
        SELECT label,
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                 AS q
        FROM embeddings)
      SELECT label, g.i, count(*) AS n,
             CAST(sum(q.q[g.i]) AS BIGINT) AS s,
             round(CAST(sum(q.q[g.i]) AS DOUBLE) / count(*), 6)
               AS mean_milli
      FROM q, UNNEST(generate_series(1, 64)) AS g(i)
      GROUP BY 1, 2""",

    "q288_embedding_outliers" -> """
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                 AS q
        FROM embeddings),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
      m AS (
        SELECT g.i, CAST(sum(q.q[g.i]) AS BIGINT) AS s,
               (CAST(sum(q.q[g.i] * q.q[g.i]) AS DOUBLE)
                 - CAST(sum(q.q[g.i]) AS DOUBLE)
                   * CAST(sum(q.q[g.i]) AS DOUBLE) / nn.n) / nn.n
                 AS variance
        FROM q, UNNEST(generate_series(1, 64)) AS g(i), nn
        GROUP BY g.i, nn.n),
      z AS (
        SELECT q.vec_id,
               CAST(sum(CAST(round(1000000
                 * (q.q[m.i] - CAST(m.s AS DOUBLE) / nn.n)
                 * (q.q[m.i] - CAST(m.s AS DOUBLE) / nn.n)
                 / m.variance) AS BIGINT)) AS BIGINT) AS score_micro
        FROM q, m, nn
        WHERE m.variance > 0
        GROUP BY q.vec_id)
      SELECT vec_id, score_micro, CAST(rnk AS INT) AS rnk FROM (
        SELECT vec_id, score_micro,
               row_number() OVER (ORDER BY score_micro DESC, vec_id) AS rnk
        FROM z) x
      WHERE rnk <= 20""",

    "q264_cluster_sample" -> s"""
      WITH asg AS ($q254OracleSql)
      SELECT vec_id, cid, CAST(rnk AS INT) AS rnk FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY cid
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rnk
        FROM asg) x
      WHERE rnk <= 20""",
    "q38_cosine_topk" -> q38OracleSql,

    "q85_ann_ivf" -> q85OracleSql,

    "q165_semantic_dedup" -> s"""
      WITH cents AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cent
        FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT $ivfK),
      assigned AS (
        SELECT vec_id, ve, cid FROM (
          SELECT e.vec_id, e.embedding::DOUBLE[] AS ve, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_dot_product(e.embedding::DOUBLE[], c.cent)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(c.cent, c.cent))) DESC,
                   c.cid) AS arn
          FROM embeddings e CROSS JOIN cents c) x
        WHERE arn = 1),
      pairs AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               list_dot_product(a.ve, b.ve)
                 / (sqrt(list_dot_product(a.ve, a.ve))
                    * sqrt(list_dot_product(b.ve, b.ve))) AS cos
        FROM assigned a JOIN assigned b
          ON a.cid = b.cid AND a.vec_id < b.vec_id)
      SELECT b AS vec_id, min(a) AS dup_of, count(*) AS n_dups,
             round(max(cos), 6) AS sim
      FROM pairs WHERE cos >= 0.3 GROUP BY b""",

    "q312_sq8_recall" -> s"""
      WITH gt AS (SELECT q_id, cand_id FROM ($q38OracleSql)),
      sq AS (SELECT q_id, cand_id FROM (${AnnOps.oracle("q310_sq8_ann")})),
      iv AS (SELECT q_id, cand_id FROM (${AnnOps.oracle("q311_ivf_sq8")})),
      h1 AS (
        SELECT gt.q_id, count(*) AS nh
        FROM gt JOIN sq ON gt.q_id = sq.q_id AND gt.cand_id = sq.cand_id
        GROUP BY 1),
      h2 AS (
        SELECT gt.q_id, count(*) AS nh
        FROM gt JOIN iv ON gt.q_id = iv.q_id AND gt.cand_id = iv.cand_id
        GROUP BY 1)
      SELECT q.q_id,
             CAST(coalesce(h1.nh, 0) AS INT) AS n_hit_sq8,
             CAST(coalesce(h1.nh, 0) AS DOUBLE) / 5.0 AS recall_sq8,
             CAST(coalesce(h2.nh, 0) AS INT) AS n_hit_ivf,
             CAST(coalesce(h2.nh, 0) AS DOUBLE) / 5.0 AS recall_ivf
      FROM (SELECT DISTINCT q_id FROM gt) q
      LEFT JOIN h1 ON q.q_id = h1.q_id
      LEFT JOIN h2 ON q.q_id = h2.q_id""",

    "q327_pq_recall" -> s"""
      WITH gt AS (SELECT q_id, cand_id FROM ($q38OracleSql)),
      pq AS (SELECT q_id, cand_id FROM (${AnnOps.oracle("q326_pq_ann")})),
      ip AS (SELECT q_id, cand_id FROM (${AnnOps.oracle("q328_ivf_pq")})),
      h1 AS (
        SELECT gt.q_id, count(*) AS nh
        FROM gt JOIN pq ON gt.q_id = pq.q_id AND gt.cand_id = pq.cand_id
        GROUP BY 1),
      h2 AS (
        SELECT gt.q_id, count(*) AS nh
        FROM gt JOIN ip ON gt.q_id = ip.q_id AND gt.cand_id = ip.cand_id
        GROUP BY 1)
      SELECT q.q_id,
             CAST(coalesce(h1.nh, 0) AS INT) AS n_hit_pq,
             CAST(coalesce(h1.nh, 0) AS DOUBLE) / 5.0 AS recall_pq,
             CAST(coalesce(h2.nh, 0) AS INT) AS n_hit_ivfpq,
             CAST(coalesce(h2.nh, 0) AS DOUBLE) / 5.0 AS recall_ivfpq
      FROM (SELECT DISTINCT q_id FROM gt) q
      LEFT JOIN h1 ON q.q_id = h1.q_id
      LEFT JOIN h2 ON q.q_id = h2.q_id""",

    "q168_ivf_recall" -> s"""
      WITH gt AS (SELECT q_id, cand_id FROM ($q38OracleSql)),
      iv AS (SELECT q_id, cand_id FROM ($q85OracleSql)),
      hit AS (
        SELECT gt.q_id, count(*) AS nh
        FROM gt JOIN iv ON gt.q_id = iv.q_id AND gt.cand_id = iv.cand_id
        GROUP BY 1)
      SELECT q.q_id, CAST(coalesce(nh, 0) AS INT) AS n_hit,
             CAST(coalesce(nh, 0) AS DOUBLE) / 5.0 AS recall_at_5
      FROM (SELECT DISTINCT q_id FROM gt) q
      LEFT JOIN hit ON q.q_id = hit.q_id""",

    "q317_ivf_nprobe_sweep" -> s"""
      WITH ${AnnOps.q8Cte},
      cents AS (
        SELECT vec_id AS cid, q8 AS cent FROM q8
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      assigned AS (
        SELECT vec_id AS cand_id, q8 AS qb, cid FROM (
          SELECT v.vec_id, v.q8, c.cid,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY (${AnnOps.idotSql("v.q8", "c.cent")}) DESC, c.cid)
                   AS arn
          FROM q8 v CROSS JOIN cents c WHERE v.vec_id >= 10) x
        WHERE arn = 1),
      probes AS (
        SELECT vec_id AS q_id, q8 AS qa, cid, prn FROM (
          SELECT v.vec_id, v.q8, c.cid,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY (${AnnOps.idotSql("v.q8", "c.cent")}) DESC, c.cid)
                   AS prn
          FROM q8 v CROSS JOIN cents c WHERE v.vec_id < 10) x
        WHERE prn <= 8),
      nps AS (SELECT * FROM (VALUES (1), (2), (4), (8)) t(np)),
      scored AS (
        SELECT n.np, p.q_id, a.cand_id,
               row_number() OVER (PARTITION BY n.np, p.q_id
                 ORDER BY (${AnnOps.idotSql("p.qa", "a.qb")}) DESC, a.cand_id)
                 AS rnk
        FROM nps n
        JOIN probes p ON p.prn <= n.np
        JOIN assigned a USING (cid)),
      ivf AS (SELECT np, q_id, cand_id FROM scored WHERE rnk <= 5),
      gt AS (SELECT q_id, cand_id FROM ($q38OracleSql)),
      tot AS (SELECT count(*) AS n_rel FROM gt),
      hits AS (
        SELECT np, count(*) AS n_hit
        FROM ivf JOIN gt USING (q_id, cand_id)
        GROUP BY np)
      SELECT CAST(n.np AS INT) AS nprobe,
             CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
             round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_rel, 6)
               AS recall_at_5
      FROM nps n LEFT JOIN hits h ON h.np = n.np CROSS JOIN tot t"""
  )
}
