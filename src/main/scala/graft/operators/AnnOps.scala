package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Approximate nearest neighbor via random-hyperplane LSH (SURVEY north
 * star: the scale path beside VectorOps' brute-force baseline).
 *
 * 100 TB design: each vector is mapped to a `Planes`-bit bucket by the
 * sign pattern of `Planes` fixed hyperplanes — a pure projection (no
 * shuffle); the candidate join is an equi-join on the bucket key, so the
 * corpus never materializes the O(queries × corpus) pair space. Exact
 * cosine runs only inside buckets. Recall is tuned by bits/tables; this
 * module uses one table × Planes (= 6) bits = 64 buckets, sized to the
 * test fixtures; at 100 TB raise Planes (and add tables) so per-bucket
 * candidate sets stay executor-memory sized.
 *
 * Determinism/portability: plane components derive from md5 ("p:d" →
 * 60-bit int → [-1000,1000]/1000), computed identically in Scala (plan
 * constants) and in the DuckDB oracle (SQL md5), so bucket assignments
 * match bit-for-bit.
 */
object AnnOps {

  // 6 planes → 64 buckets: sized so the 500-vector fixtures land ~8 per
  // bucket and the operator's recall is actually observable. At corpus
  // scale you'd raise bits (and add multi-probe / more tables) so bucket
  // cardinality stays near the target candidate-list length.
  val Planes = 6
  val Dims = 64

  /** Int8 scalar quantization of the embedding column (q310/q311):
    * fixed symmetric [-1, 1] range, clamped — one proven round() per
    * component, identical in the DuckDB oracles. */
  private val Sq8Expr =
    "transform(embedding, x -> greatest(-127L, least(127L, " +
    "CAST(round(CAST(x AS DOUBLE) * 127) AS BIGINT))))"

  /** The SQ8-quantized corpus, checkpointed — shared prep of every
    * compressed-index gate (q310/q311/q317/q326): one scan serves
    * codebook/centroid pick, encoding and the query side. */
  private def sq8Corpus(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), expr(Sq8Expr).as("q8"))
      .transform(Materialize.frame)

  /** The deterministic "training" convention every index here uses:
    * the first `k` corpus vectors in md5(vec_id) order become the
    * centroids/codewords — one definition to keep in lockstep with the
    * DuckDB mirrors (`ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
    * LIMIT k`). */
  private def mdCentroids(emb: DataFrame, k: Int): DataFrame =
    emb.withColumn("mk", md5(col("vec_id").cast("string")))
      .orderBy(col("mk"), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("q8").as("cent"))

  /** 60-bit md5 hash of a string — must equal the SQL h60 in DedupOps. */
  private def h60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Plane component p,d in [-1, 1] with 3 decimals (portable). */
  def planeComponent(p: Int, d: Int): Double = (h60(s"$p:$d") % 2001 - 1000) / 1000.0

  /** Sequential-fold dot product of the embedding with a literal plane —
    * a codegen'd custom expression (plans/planeproj.scala); the earlier
    * aggregate(zip_with(...)) form evaluated its lambdas interpreted and
    * built a product array per row per plane. Fold order (and therefore
    * every bucket bit) is unchanged. */
  private def dotPlane(embCol: String, p: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.DotConst(
        org.apache.spark.sql.graftbridge.Bridge.expression(col(embCol)),
        (0 until Dims).map(d => planeComponent(p, d)).toArray))

  /** Integer dot product of two BIGINT code arrays — the SQ8 serving
    * kernel as a codegen'd expression (plans.DotCodes; the composed
    * aggregate(zip_with(...)) form ran its lambdas interpreted and
    * built a product array per candidate pair — the q136 lesson
    * applied to the one hot loop that still had it). Bit-identical
    * results, same oracle. */
  def dotCodes(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.DotCodes(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Bucket id: `Planes` sign bits of the plane projections. */
  def bucketCol(embCol: String): Column =
    (0 until Planes)
      .map(p => when(dotPlane(embCol, p) > 0, lit(1L << p)).otherwise(0L))
      .reduce(_ + _)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LSH-bucketed ANN: same-bucket candidates, exact cosine, top-3.
    "q42_ann_lsh" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
        .withColumn("bucket", bucketCol("embedding"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
                col("bucket"))
      val c = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
                col("bucket"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
      q.join(c, "bucket")
        .withColumn("cos",
          graft.functions.GraftFunctions.cosineSim(col("qe"), col("ce")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("cand_id"), col("rnk"),
                round(col("cos"), 6).as("sim"), col("bucket"))
    }),

    // Int8 scalar-quantized ANN (the FAISS IndexScalarQuantizer QT_8bit
    // shape — the other classic compression path beside LSH/IVF): each
    // embedding compresses 4x to 64 int8 codes under a FIXED symmetric
    // [-1, 1] range (the trained-range contract of SQ8; these
    // embeddings are unit-scale, and the clamp enforces the contract on
    // outliers), and candidate ranking runs ENTIRELY on integer code
    // dot products — the in-RAM distance scan an IVF list serves at
    // 100 TB (compose with q85's IVF buckets; this gate measures the SQ
    // kernel: 10 broadcast queries × a single candidate scan, top-5 via
    // the rank window's group limit). All-integer after one proven
    // round() per component → bit-exact oracle.
    "q310_sq8_ann" -> ((s, dir) => {
      val emb = sq8Corpus(s, dir)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("q8").as("qa"))
      val c = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("q8").as("qb"))
      val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("cand_id"))
      c.crossJoin(broadcast(q))
        .withColumn("dot", dotCodes(col("qa"), col("qb")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("cand_id"), col("rnk").cast("int").as("rnk"),
                col("dot"))
    }),

    // IVF-SQ8 — the standard composed ANN index (FAISS "IVF<K>,SQ8"):
    // q85's coarse quantizer shape (md5-seeded K centroids, candidates
    // assigned to their best list, queries probe nprobe lists) with
    // q310's int8 codes as BOTH the residual-free storage format AND
    // the distance kernel — coarse assignment, probing, and final
    // ranking all run on integer code dot products, so the whole index
    // path is bit-exact under the oracle. Scale: the candidate side is
    // ONE scan + a K-row broadcast (assignment) and the serving join
    // touches only probed lists (nprobe/K of the corpus), with 4×
    // compressed codes — the composition q310's scaladoc promises.
    // Body in [[ivfSq8]] (parameterized on nprobe: q317 sweeps the
    // recall knob over the same pipeline).
    "q311_ivf_sq8" -> ((s, dir) => ivfSq8(s, dir, nprobe = 2)),

    // Product quantization (the FAISS IndexPQ shape — the third classic
    // compression path beside SQ8's uniform grid and IVF's coarse
    // partitioning): the 64-dim int8 vector splits into M=8 subspaces
    // of 8 dims; each subspace has a 16-entry codebook (md5-seeded
    // corpus picks, the IVF centroid convention — deterministic
    // "training", so the whole index is oracle-expressible) and a
    // vector stores only its per-subspace nearest-codeword ids: 8 small
    // codes per vector, a 32x cut vs the raw floats. Serving is the
    // textbook ADC scan: the query precomputes one 8x16 lookup table of
    // integer sub-dots against every codeword, and a candidate's
    // approximate dot is the SUM of 8 table entries selected by its
    // codes — no per-candidate vector math at all, which is what makes
    // PQ the memory-bound serving format at 100 TB (the corpus scan
    // reads M bytes per vector, not the embedding). Encoding ranks by
    // integer sub-dot (the inner-product PQ variant, consistent with
    // the suite's dot ranking); everything stays integer end-to-end →
    // bit-exact oracle.
    "q326_pq_ann" -> ((s, dir) =>
      pqAdcRanked(s, dir)
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("cand_id"),
                col("rnk").cast("int").as("rnk"), col("adot"))),

    // IVF-PQ — the production-default composed index (FAISS
    // "IVF<K>,PQ<M>"): q311's coarse quantizer (md5-seeded K=8 lists,
    // queries probe nprobe=2) pruning the corpus, q326's PQ codes
    // serving the distance INSIDE the probed lists via the ADC table.
    // Per candidate the index stores one list id + 8 codes; serving
    // touches nprobe/K of the corpus and reads no embeddings at all —
    // the combination that holds both the memory AND the compute side
    // at 100 TB. All-integer end-to-end → bit-exact oracle.
    "q328_ivf_pq" -> ((s, dir) => ivfPq(s, dir)),

    // Two-stage PQ serving with an EXACT re-rank (FAISS's
    // IndexRefineFlat over IndexPQ — the standard production answer to
    // PQ's recall cost): stage 1 is q326's ADC scan reading 8 codes
    // per corpus vector, kept to its top-R candidates per query;
    // stage 2 re-ranks ONLY those R with the full-precision float
    // cosine and emits the refined top-5. The gate reports, per
    // R ∈ {20, 50, 400}, the refined recall@5 against the exact float
    // ground truth (q38). Two properties priced here:
    //  - REFINE-EXACTNESS: any true-top-5 member inside the candidate
    //    set outranks every non-member under the exact kernel, so the
    //    refined recall EQUALS the candidate ceiling (recall@R of the
    //    ADC scan) — the refine stage loses nothing (spec'd in
    //    AnnRefineSpec);
    //  - the CEILING ITSELF: on this near-random fixture PQ's
    //    16-codeword snap scatters the true neighbors deep into the
    //    ADC order (0.44 @ R=20, 0.60 @ R=50, 1.00 @ R=400 — the q327
    //    0.26-recall story continued), so the sweep includes the R
    //    where the two-stage path provably recovers exact recall. On
    //    real clustered embeddings R = 2-10× k recovers ≥ 0.95+; the
    //    fixture's R=400 point is the honest version of that claim.
    // Scan-cost shape at 100 TB: stage 1 reads M=8 codes/vector (the
    // PQ memory story, unchanged); the float column is touched only
    // for the ≤ R×|queries| winner set — here via a join against the
    // corpus (batch shape), in online serving via R point reads from
    // the vector store.
    "q334_pq_refine" -> ((s, dir) => {
      val rs = Seq(20, 50, 400)
      val cos = graft.functions.GraftFunctions.cosineSim _
      val pq = pqAdcRanked(s, dir)
      val cand = pq.crossJoin(broadcast(
          s.range(1).select(explode(typedLit(rs)).as("refine_r"))))
        .filter(col("rnk") <= col("refine_r"))
        .select(col("refine_r"), col("q_id"), col("cand_id"))
      val emb = Tables.table(s, dir, "embeddings")
      val qe = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val ce = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
      val wRef = Window.partitionBy("refine_r", "q_id")
        .orderBy(col("cos").desc, col("cand_id"))
      val refined = cand
        .join(broadcast(qe), "q_id")
        .join(ce, "cand_id")
        .withColumn("cos", cos(col("q_emb"), col("c_emb")))
        .withColumn("rr", row_number().over(wRef))
        .filter(col("rr") <= 5)
        .select(col("refine_r"), col("q_id"), col("cand_id"))
      val gt = graft.operators.VectorOps.queries("q38_cosine_topk")(s, dir)
        .select(col("q_id"), col("cand_id"))
      val tot = gt.groupBy().agg(count(lit(1)).as("n_rel"))
      val hits = refined.join(gt, Seq("q_id", "cand_id"))
        .groupBy("refine_r").agg(count(lit(1)).as("n_hit"))
      s.range(1).select(explode(typedLit(rs)).as("refine_r"))
        .join(hits, Seq("refine_r"), "left")
        .crossJoin(tot)
        .select(col("refine_r").cast("int").as("refine_r"),
                coalesce(col("n_hit"), lit(0L)).cast("bigint").as("n_hit"),
                round(coalesce(col("n_hit"), lit(0L)).cast("double") /
                      col("n_rel"), 6).as("recall_at_5"))
    }),

    // Bucket histogram: distribution diagnostics for the LSH table.
    "q43_ann_buckets" -> ((s, dir) => {
      Tables.table(s, dir, "embeddings")
        .withColumn("bucket", bucketCol("embedding"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_id"))
    }),

    // Embedding-cosine near-dup DEDUP (the brief's dedup family, scale
    // path): LSH-bucket candidates (equi-join, never O(n²)), exact cosine
    // only inside buckets, then the dedup decision — drop any vector with
    // a SMALLER-id near-duplicate, keeping the min-id representative.
    // Output = the decision table (dropped id, its witness, stats).
    // τ = 0.3 is fixture-tuned: the synthetic embeddings are near-random
    // (max pairwise cosine ≈ 0.47); on a real corpus τ ≈ 0.95+.
    "q114_embed_dedup" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
        .withColumn("bucket", bucketCol("embedding"))
        .select(col("vec_id"), col("embedding"), col("bucket"))
      val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"),
                         col("bucket"))
      val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"),
                         col("bucket").as("bucket_b"))
      a.join(b, col("bucket") === col("bucket_b") && col("a") < col("b"))
        .withColumn("cos",
          graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb")))
        .filter(col("cos") >= 0.3)
        .groupBy(col("b").as("vec_id"))
        .agg(min(col("a")).as("dup_of"),
             count(lit(1)).as("n_dups"),
             round(max(col("cos")), 6).as("sim"))
    }),

    // LSH recall evaluation (the measurement every production ANN/dedup
    // deployment runs before trusting its index): over an exact all-pairs
    // sample, the fraction of true near-dup pairs (cos >= τ) that the
    // bucket join catches, swept across τ, against the THEORY floor for
    // random-hyperplane LSH — P(collision) = (1 - acos(τ)/π)^Planes.
    // Observed ≈ theory on the fixture (5.5% vs 4.6% at τ=0.3, 6 bits),
    // i.e. the index behaves to spec and the recall knob (Planes/tables/
    // multi-probe) can be budgeted analytically. The exact side runs on
    // a DETERMINISTIC 1-in-5 anchor sample (vec_id % 5 — reproducible,
    // auditable), which is exactly how the measurement is paid for at
    // 100 TB: all-pairs over a probe sample, never over the corpus; the
    // serving path stays the equi-join.
    "q143_ann_recall" -> ((s, dir) => {
      val taus = Seq(0.25, 0.30, 0.35, 0.40)
      val emb = Tables.table(s, dir, "embeddings")
        .withColumn("bucket", bucketCol("embedding"))
      val a = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("a"), col("embedding").as("ea"),
                col("bucket").as("ba"))
      val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"),
                         col("bucket").as("bb"))
      a.join(b, col("a") < col("b"))
        .select(
          graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb"))
            .as("cos"),
          (col("ba") === col("bb")).as("caught"))
        .withColumn("tau", explode(typedLit(taus)))
        .filter(col("cos") >= col("tau"))
        .groupBy("tau")
        .agg(count(lit(1)).cast("bigint").as("n_true"),
             sum(when(col("caught"), 1L).otherwise(0L))
               .cast("bigint").as("n_caught"))
        .withColumn("recall",
          round(col("n_caught").cast("double") / col("n_true"), 6))
        .withColumn("theory_floor",
          round(pow(lit(1.0) - acos(col("tau")) / math.Pi, Planes), 6))
    }),

    // Multi-probe LSH: the recall knob q143 motivates. Probing the query
    // bucket plus the `Planes` buckets at Hamming distance 1 multiplies
    // candidates by ≤ P+1 and lifts pair recall to
    // p^P + P·p^(P-1)·(1-p) (p = 1 - acos(τ)/π) — measured here beside
    // the single-probe recall over the same exact-pair baseline, both
    // against their analytic floors. A pair is multi-probe-caught iff
    // bit_count(bucket_a XOR bucket_b) <= 1; the SERVING path is the
    // same equi-join as q42 with the probe side exploded into the P+1
    // flip keys (bucket, bucket XOR 1<<p) — still never O(n²).
    "q144_ann_multiprobe" -> ((s, dir) => {
      val taus = Seq(0.25, 0.30, 0.35, 0.40)
      val emb = Tables.table(s, dir, "embeddings")
        .withColumn("bucket", bucketCol("embedding"))
      // same deterministic 1-in-5 anchor sample as q143
      val a = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("a"), col("embedding").as("ea"),
                col("bucket").as("ba"))
      val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"),
                         col("bucket").as("bb"))
      val p = lit(1.0) - acos(col("tau")) / math.Pi
      a.join(b, col("a") < col("b"))
        .select(
          graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb"))
            .as("cos"),
          (col("ba") === col("bb")).as("c1"),
          (expr("bit_count(ba ^ bb)") <= 1).as("cmp"))
        .withColumn("tau", explode(typedLit(taus)))
        .filter(col("cos") >= col("tau"))
        .groupBy("tau")
        .agg(count(lit(1)).cast("bigint").as("n_true"),
             sum(when(col("c1"), 1L).otherwise(0L)).cast("bigint").as("n_1"),
             sum(when(col("cmp"), 1L).otherwise(0L)).cast("bigint").as("n_mp"))
        .withColumn("recall_1",
          round(col("n_1").cast("double") / col("n_true"), 6))
        .withColumn("recall_mp",
          round(col("n_mp").cast("double") / col("n_true"), 6))
        .withColumn("theory_1", round(pow(p, Planes), 6))
        .withColumn("theory_mp", round(
          pow(p, Planes) +
            lit(Planes.toDouble) * pow(p, Planes - 1) * (lit(1.0) - p), 6))
    })
  )

  /** The q326 PQ/ADC pipeline, UNfiltered: every (query, candidate)
    * pair with its ADC dot and per-query rank. q326 takes the top-5
    * slice; q334's refine stage takes top-R candidate sets from the
    * same single pipeline (one codebook pick, one encoding, one LUT —
    * a sweep must not cost |R| index builds, the ivfSq8Sweep rule). */
  private[graft] def pqAdcRanked(s: SparkSession, dir: String): DataFrame = {
    val M = 8
    val Sub = Dims / M
    val ms = (0 until M).toList
    val emb = sq8Corpus(s, dir) // feeds codebook pick, encoding AND queries
    val cents = mdCentroids(emb, 16)
    val centSub = cents
      .select(col("cid"), col("cent"), explode(typedLit(ms)).as("m"))
      .select(col("cid"), col("m"),
              expr(s"slice(cent, m*$Sub + 1, $Sub)").as("cs"))
    // encode: per (candidate, subspace), the argmax-dot codeword
    val wEnc = Window.partitionBy("cand_id", "m")
      .orderBy(col("d").desc, col("cid"))
    val codes = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("q8"),
              explode(typedLit(ms)).as("m"))
      .select(col("cand_id"), col("m"),
              expr(s"slice(q8, m*$Sub + 1, $Sub)").as("xs"))
      .join(broadcast(centSub), "m")
      .withColumn("d", dotCodes(col("xs"), col("cs")))
      .withColumn("ern", row_number().over(wEnc))
      .filter(col("ern") === 1)
      .select(col("cand_id"), col("m"), col("cid"))
    // ADC table: every query's integer sub-dot against every codeword
    val lut = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("q8"),
              explode(typedLit(ms)).as("m"))
      .select(col("q_id"), col("m"),
              expr(s"slice(q8, m*$Sub + 1, $Sub)").as("qs"))
      .join(broadcast(centSub), "m")
      .withColumn("lv", dotCodes(col("qs"), col("cs")))
      .select(col("q_id"), col("m"), col("cid"), col("lv"))
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("adot").desc, col("cand_id"))
    codes.join(broadcast(lut), Seq("m", "cid"))
      .groupBy("q_id", "cand_id")
      .agg(sum("lv").as("adot"))
      .withColumn("rnk", row_number().over(wTop))
  }

  /** The q328 IVF-PQ pipeline (coarse quantizer pruning + ADC serving
    * inside the probed lists) — body factored out of the queries map
    * when q326 gained its [[pqAdcRanked]] sibling. */
  private def ivfPq(s: SparkSession, dir: String): DataFrame = {
    val M = 8
    val Sub = Dims / M
    val nprobe = 2
    val ms = (0 until M).toList
    val emb = sq8Corpus(s, dir)
    val coarse = mdCentroids(emb, 8)
      .select(col("cid").as("ccid"), col("cent").as("ccent"))
    val centSub = mdCentroids(emb, 16)
      .select(col("cid"), col("cent"), explode(typedLit(ms)).as("m"))
      .select(col("cid"), col("m"),
              expr(s"slice(cent, m*$Sub + 1, $Sub)").as("cs"))
    // coarse assignment: every candidate to its best list (q311)
    val wCoarse = Window.partitionBy("vec_id")
      .orderBy(col("d").desc, col("ccid"))
    val assigned = emb.filter(col("vec_id") >= 10)
      .crossJoin(broadcast(coarse))
      .withColumn("d", dotCodes(col("q8"), col("ccent")))
      .withColumn("arn", row_number().over(wCoarse))
      .filter(col("arn") === 1)
      .select(col("vec_id").as("cand_id"), col("q8"), col("ccid"))
    // PQ encoding of the assigned candidates (q326)
    val wEnc = Window.partitionBy("cand_id", "m")
      .orderBy(col("d").desc, col("cid"))
    val codes = assigned
      .select(col("cand_id"), col("ccid"), col("q8"),
              explode(typedLit(ms)).as("m"))
      .select(col("cand_id"), col("ccid"), col("m"),
              expr(s"slice(q8, m*$Sub + 1, $Sub)").as("xs"))
      .join(broadcast(centSub), "m")
      .withColumn("d", dotCodes(col("xs"), col("cs")))
      .withColumn("ern", row_number().over(wEnc))
      .filter(col("ern") === 1)
      .select(col("cand_id"), col("ccid"), col("m"), col("cid"))
    // queries: probe the top-nprobe coarse lists + build the ADC LUT
    val queriesQ8 = emb.filter(col("vec_id") < 10)
    val probes = queriesQ8
      .crossJoin(broadcast(coarse))
      .withColumn("d", dotCodes(col("q8"), col("ccent")))
      .withColumn("prn", row_number().over(wCoarse))
      .filter(col("prn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("ccid"))
    val lut = queriesQ8
      .select(col("vec_id").as("q_id"), col("q8"),
              explode(typedLit(ms)).as("m"))
      .select(col("q_id"), col("m"),
              expr(s"slice(q8, m*$Sub + 1, $Sub)").as("qs"))
      .join(broadcast(centSub), "m")
      .withColumn("lv", dotCodes(col("qs"), col("cs")))
      .select(col("q_id"), col("m"), col("cid"), col("lv"))
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("adot").desc, col("cand_id"))
    codes.join(broadcast(probes), "ccid")
      .join(broadcast(lut), Seq("q_id", "m", "cid"))
      .groupBy("q_id", "cand_id")
      .agg(sum("lv").as("adot"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("cand_id"),
              col("rnk").cast("int").as("rnk"), col("adot"))
  }

  /** The q311 pipeline with the probe width exposed: nprobe of the `k`
    * inverted lists are scanned per query. nprobe = k probes every
    * list — the candidate set degenerates to the full SQ8 scan (q310),
    * so the recall curve q317 measures ends at the SQ8 ceiling by
    * construction. */
  def ivfSq8(s: SparkSession, dir: String, nprobe: Int, k: Int = 8): DataFrame =
    ivfSq8Sweep(s, dir, Seq(nprobe), k).drop("np")

  /** [[ivfSq8]] generalized to a SET of probe widths served by ONE
    * pipeline — one corpus scan/checkpoint, one centroid pick, one
    * assignment window, one probe ranking; each swept width is just the
    * `probe_rank <= np` filter over the shared probe side (exactly the
    * q317 oracle's formulation). The measurement sweep must not cost
    * |nprobes| index builds: at 100 TB rebuilding the quantized corpus
    * and its assignment per knob setting would quadruple the dominant
    * scan for a diagnostic the shared pipeline gives for the price of
    * the widest point. Output = ivfSq8's columns plus `np`, ranked per
    * (np, q_id). */
  def ivfSq8Sweep(s: SparkSession, dir: String, nprobes: Seq[Int],
                  k: Int = 8): DataFrame = {
    def idot(a: String, b: String) = dotCodes(col(a), col(b))
    // one scan feeds THREE subtrees (centroid pick, candidate
    // assignment, probe side) — see sq8Corpus
    val emb = sq8Corpus(s, dir)
    val cents = mdCentroids(emb, k)
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("d").desc, col("cid"))
    val assigned = emb.filter(col("vec_id") >= 10)
      .crossJoin(broadcast(cents))
      .withColumn("d", idot("q8", "cent"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id").as("cand_id"), col("q8").as("qb"), col("cid"))
    val probes = emb.filter(col("vec_id") < 10)
      .crossJoin(broadcast(cents))
      .withColumn("d", idot("q8", "cent"))
      .withColumn("prn", row_number().over(wAssign))
      .filter(col("prn") <= nprobes.max)
      .select(col("vec_id").as("q_id"), col("q8").as("qa"), col("cid"),
              col("prn"))
    val wTop = Window.partitionBy("np", "q_id")
      .orderBy(col("dot").desc, col("cand_id"))
    broadcast(probes.withColumn("np", explode(typedLit(nprobes)))
        .filter(col("prn") <= col("np"))
        .drop("prn"))
      .join(assigned, "cid")
      .withColumn("dot", idot("qa", "qb"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 5)
      .select(col("np"), col("q_id"), col("cand_id"),
              col("rnk").cast("int").as("rnk"), col("dot"), col("cid"))
  }

  /** Integer-dot SQL terms — the DuckDB mirror of [[dotCodes]] over
    * 1-indexed lists (shared by the SQ8 oracles here and q317's sweep
    * oracle in VectorOps). */
  private[operators] def idotSql(a: String, b: String): String =
    idotSqlN(a, b, Dims)

  /** n-dim variant for the PQ sub-vectors. */
  private[operators] def idotSqlN(a: String, b: String, n: Int): String =
    (1 to n).map(i => s"$a[$i]*$b[$i]").mkString(" + ")

  /** Shared quantization CTE for the SQ8 oracles — the Scala side is
    * the single Sq8Expr; these two must stay in lockstep. */
  private[operators] val q8Cte = """q8 AS (
        SELECT vec_id,
               list_transform(embedding, x -> greatest(-127, least(127,
                 CAST(round(CAST(x AS DOUBLE) * 127) AS BIGINT)))) AS q8
        FROM embeddings)"""

  val oracle: Map[String, String] = {
    // plane table as an inline VALUES list: (p, d, v)
    val planeRows = (for (p <- 0 until Planes; d <- 0 until Dims)
      yield s"($p,$d,${planeComponent(p, d)})").mkString(",")
    val bucketCte = s"""
      planes(p, d, v) AS (SELECT * FROM (VALUES $planeRows) t(p, d, v)),
      vecs AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      proj AS (
        SELECT vec_id, p,
               sum(e[d + 1] * v) AS dp
        FROM vecs JOIN planes ON TRUE
        GROUP BY vec_id, p),
      bucketed AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dp > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT)
                 AS bucket
        FROM proj GROUP BY vec_id)"""

    val sq8DotTerms = idotSql("qa", "qb")
    Map(
      "q311_ivf_sq8" -> s"""
      WITH $q8Cte,
      cents AS (
        SELECT vec_id AS cid, q8 AS cent FROM q8
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      assigned AS (
        SELECT vec_id AS cand_id, q8 AS qb, cid FROM (
          SELECT v.vec_id, v.q8, c.cid,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY (${idotSql("v.q8", "c.cent")}) DESC, c.cid)
                   AS arn
          FROM q8 v CROSS JOIN cents c WHERE v.vec_id >= 10) x
        WHERE arn = 1),
      probes AS (
        SELECT vec_id AS q_id, q8 AS qa, cid FROM (
          SELECT v.vec_id, v.q8, c.cid,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY (${idotSql("v.q8", "c.cent")}) DESC, c.cid)
                   AS prn
          FROM q8 v CROSS JOIN cents c WHERE v.vec_id < 10) x
        WHERE prn <= 2),
      scored AS (
        SELECT p.q_id, a.cand_id, a.cid,
               CAST(${idotSql("p.qa", "a.qb")} AS BIGINT) AS dot
        FROM probes p JOIN assigned a USING (cid)),
      ranked AS (
        SELECT q_id, cand_id, cid, dot,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY dot DESC, cand_id) AS rnk
        FROM scored)
      SELECT q_id, cand_id, CAST(rnk AS INT) AS rnk, dot, cid
      FROM ranked WHERE rnk <= 5""",
      "q310_sq8_ann" -> s"""
      WITH $q8Cte,
      q AS (SELECT vec_id AS q_id, q8 AS qa FROM q8 WHERE vec_id < 10),
      c AS (SELECT vec_id AS cand_id, q8 AS qb FROM q8 WHERE vec_id >= 10),
      scored AS (
        SELECT q_id, cand_id,
               CAST($sq8DotTerms AS BIGINT) AS dot
        FROM c, q),
      ranked AS (
        SELECT q_id, cand_id, dot,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY dot DESC, cand_id) AS rnk
        FROM scored)
      SELECT q_id, cand_id, CAST(rnk AS INT) AS rnk, dot
      FROM ranked WHERE rnk <= 5""",

      // q326's ADC pipeline kept to top-R, float re-rank of the R only,
      // recall@5 vs the exact float top-5 (q38's dual)
      "q334_pq_refine" -> s"""
      WITH $q8Cte,
      cents AS (
        SELECT vec_id AS cid, q8 AS cent FROM q8
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      ms AS (SELECT range AS m FROM range(8)),
      centsub AS (
        SELECT cid, m, list_slice(cent, m*8 + 1, m*8 + 8) AS cs
        FROM cents, ms),
      enc AS (
        SELECT cand_id, m, cid,
               row_number() OVER (PARTITION BY cand_id, m
                                  ORDER BY d DESC, cid) AS ern
        FROM (
          SELECT x.vec_id AS cand_id, x.m, s.cid,
                 CAST(${idotSqlN("x.xs", "s.cs", 8)} AS BIGINT) AS d
          FROM (SELECT vec_id, m, list_slice(q8, m*8 + 1, m*8 + 8) AS xs
                FROM q8, ms WHERE vec_id >= 10) x
          JOIN centsub s ON x.m = s.m)),
      codes AS (SELECT cand_id, m, cid FROM enc WHERE ern = 1),
      lut AS (
        SELECT qd.vec_id AS q_id, qd.m, s.cid,
               CAST(${idotSqlN("qd.qs", "s.cs", 8)} AS BIGINT) AS lv
        FROM (SELECT vec_id, m, list_slice(q8, m*8 + 1, m*8 + 8) AS qs
              FROM q8, ms WHERE vec_id < 10) qd
        JOIN centsub s ON qd.m = s.m),
      adc AS (
        SELECT l.q_id, c.cand_id, CAST(sum(l.lv) AS BIGINT) AS adot
        FROM codes c JOIN lut l ON c.m = l.m AND c.cid = l.cid
        GROUP BY 1, 2),
      pq_ranked AS (
        SELECT q_id, cand_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adot DESC, cand_id) AS rnk
        FROM adc),
      rs AS (SELECT UNNEST([20, 50, 400]) AS refine_r),
      cand AS (
        SELECT refine_r, q_id, cand_id
        FROM pq_ranked, rs WHERE rnk <= refine_r),
      ref AS (
        SELECT refine_r, q_id, cand_id,
               row_number() OVER (PARTITION BY refine_r, q_id
                                  ORDER BY cos DESC, cand_id) AS rr
        FROM (
          SELECT cand.refine_r, cand.q_id, cand.cand_id,
                 list_dot_product(qe.embedding::DOUBLE[], ce.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(qe.embedding::DOUBLE[], qe.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(ce.embedding::DOUBLE[], ce.embedding::DOUBLE[])))
                   AS cos
          FROM cand JOIN embeddings qe ON qe.vec_id = cand.q_id
                    JOIN embeddings ce ON ce.vec_id = cand.cand_id)),
      gt AS (
        SELECT q_id, cand_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) DESC,
                   c.vec_id) AS rnk
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 10 AND c.vec_id >= 10) x WHERE rnk <= 5),
      tot AS (SELECT count(*) AS n_rel FROM gt),
      hits AS (
        SELECT refine_r, count(*) AS n_hit
        FROM ref JOIN gt ON ref.q_id = gt.q_id AND ref.cand_id = gt.cand_id
        WHERE ref.rr <= 5 GROUP BY refine_r)
      SELECT CAST(rs.refine_r AS INT) AS refine_r,
             CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
             round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / tot.n_rel, 6)
               AS recall_at_5
      FROM rs LEFT JOIN hits h ON rs.refine_r = h.refine_r, tot""",

      "q326_pq_ann" -> s"""
      WITH $q8Cte,
      cents AS (
        SELECT vec_id AS cid, q8 AS cent FROM q8
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      ms AS (SELECT range AS m FROM range(8)),
      centsub AS (
        SELECT cid, m, list_slice(cent, m*8 + 1, m*8 + 8) AS cs
        FROM cents, ms),
      enc AS (
        SELECT cand_id, m, cid,
               row_number() OVER (PARTITION BY cand_id, m
                                  ORDER BY d DESC, cid) AS ern
        FROM (
          SELECT x.vec_id AS cand_id, x.m, s.cid,
                 CAST(${idotSqlN("x.xs", "s.cs", 8)} AS BIGINT) AS d
          FROM (SELECT vec_id, m, list_slice(q8, m*8 + 1, m*8 + 8) AS xs
                FROM q8, ms WHERE vec_id >= 10) x
          JOIN centsub s ON x.m = s.m)),
      codes AS (SELECT cand_id, m, cid FROM enc WHERE ern = 1),
      lut AS (
        SELECT qd.vec_id AS q_id, qd.m, s.cid,
               CAST(${idotSqlN("qd.qs", "s.cs", 8)} AS BIGINT) AS lv
        FROM (SELECT vec_id, m, list_slice(q8, m*8 + 1, m*8 + 8) AS qs
              FROM q8, ms WHERE vec_id < 10) qd
        JOIN centsub s ON qd.m = s.m),
      adc AS (
        SELECT l.q_id, c.cand_id, CAST(sum(l.lv) AS BIGINT) AS adot
        FROM codes c JOIN lut l ON c.m = l.m AND c.cid = l.cid
        GROUP BY 1, 2),
      ranked AS (
        SELECT q_id, cand_id, adot,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adot DESC, cand_id) AS rnk
        FROM adc)
      SELECT q_id, cand_id, CAST(rnk AS INT) AS rnk, adot
      FROM ranked WHERE rnk <= 5""",

      "q328_ivf_pq" -> s"""
      WITH $q8Cte,
      coarse AS (
        SELECT vec_id AS ccid, q8 AS ccent FROM q8
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      cents AS (
        SELECT vec_id AS cid, q8 AS cent FROM q8
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      ms AS (SELECT range AS m FROM range(8)),
      centsub AS (
        SELECT cid, m, list_slice(cent, m*8 + 1, m*8 + 8) AS cs
        FROM cents, ms),
      assigned AS (
        SELECT cand_id, q8, ccid FROM (
          SELECT v.vec_id AS cand_id, v.q8, c.ccid,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY (${idotSql("v.q8", "c.ccent")}) DESC, c.ccid)
                   AS arn
          FROM q8 v CROSS JOIN coarse c WHERE v.vec_id >= 10) x
        WHERE arn = 1),
      enc AS (
        SELECT cand_id, ccid, m, cid,
               row_number() OVER (PARTITION BY cand_id, m
                                  ORDER BY d DESC, cid) AS ern
        FROM (
          SELECT a.cand_id, a.ccid, x.m, s.cid,
                 CAST(${idotSqlN("x.xs", "s.cs", 8)} AS BIGINT) AS d
          FROM assigned a,
               LATERAL (SELECT m, list_slice(a.q8, m*8 + 1, m*8 + 8) AS xs
                        FROM ms) x
          JOIN centsub s ON x.m = s.m)),
      codes AS (SELECT cand_id, ccid, m, cid FROM enc WHERE ern = 1),
      probes AS (
        SELECT q_id, ccid FROM (
          SELECT v.vec_id AS q_id, c.ccid,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY (${idotSql("v.q8", "c.ccent")}) DESC, c.ccid)
                   AS prn
          FROM q8 v CROSS JOIN coarse c WHERE v.vec_id < 10) x
        WHERE prn <= 2),
      lut AS (
        SELECT qd.vec_id AS q_id, qd.m, s.cid,
               CAST(${idotSqlN("qd.qs", "s.cs", 8)} AS BIGINT) AS lv
        FROM (SELECT vec_id, m, list_slice(q8, m*8 + 1, m*8 + 8) AS qs
              FROM q8, ms WHERE vec_id < 10) qd
        JOIN centsub s ON qd.m = s.m),
      adc AS (
        SELECT l.q_id, c.cand_id, CAST(sum(l.lv) AS BIGINT) AS adot
        FROM codes c
        JOIN probes p ON c.ccid = p.ccid
        JOIN lut l ON l.q_id = p.q_id AND c.m = l.m AND c.cid = l.cid
        GROUP BY 1, 2),
      ranked AS (
        SELECT q_id, cand_id, adot,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adot DESC, cand_id) AS rnk
        FROM adc)
      SELECT q_id, cand_id, CAST(rnk AS INT) AS rnk, adot
      FROM ranked WHERE rnk <= 5""",

      "q42_ann_lsh" -> s"""
      WITH $bucketCte,
      q AS (SELECT b.vec_id AS q_id, v.e AS qe, b.bucket
            FROM bucketed b JOIN vecs v USING (vec_id) WHERE vec_id < 10),
      c AS (SELECT b.vec_id AS cand_id, v.e AS ce, b.bucket
            FROM bucketed b JOIN vecs v USING (vec_id) WHERE vec_id >= 10),
      scored AS (
        SELECT q_id, cand_id, q.bucket,
               list_dot_product(qe, ce)
                 / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))
                 AS cos
        FROM q JOIN c ON q.bucket = c.bucket),
      ranked AS (
        SELECT q_id, cand_id, bucket,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rnk,
               cos
        FROM scored)
      SELECT q_id, cand_id, CAST(rnk AS INT) AS rnk, round(cos, 6) AS sim, bucket
      FROM ranked WHERE rnk <= 3""",

      "q43_ann_buckets" -> s"""
      WITH $bucketCte
      SELECT bucket, count(*) AS n, min(vec_id) AS min_id
      FROM bucketed GROUP BY bucket""",

      "q114_embed_dedup" -> s"""
      WITH $bucketCte,
      pairs AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               list_dot_product(va.e, vb.e)
                 / (sqrt(list_dot_product(va.e, va.e))
                    * sqrt(list_dot_product(vb.e, vb.e))) AS cos
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        JOIN vecs va ON va.vec_id = a.vec_id
        JOIN vecs vb ON vb.vec_id = b.vec_id)
      SELECT b AS vec_id, min(a) AS dup_of,
             count(*) AS n_dups, round(max(cos), 6) AS sim
      FROM pairs WHERE cos >= 0.3 GROUP BY b""",

      "q143_ann_recall" -> s"""
      WITH $bucketCte,
      pairs AS (
        SELECT a.bucket = b.bucket AS caught,
               list_dot_product(va.e, vb.e)
                 / (sqrt(list_dot_product(va.e, va.e))
                    * sqrt(list_dot_product(vb.e, vb.e))) AS cos
        FROM bucketed a JOIN bucketed b
          ON a.vec_id % 5 = 0 AND a.vec_id < b.vec_id
        JOIN vecs va ON va.vec_id = a.vec_id
        JOIN vecs vb ON vb.vec_id = b.vec_id)
      SELECT tau,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT)
               AS n_caught,
             round(CAST(sum(CASE WHEN caught THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*), 6) AS recall,
             round(power(1.0 - acos(tau) / pi(), $Planes), 6)
               AS theory_floor
      FROM pairs, UNNEST(CAST([0.25, 0.30, 0.35, 0.40] AS DOUBLE[])) t(tau)
      WHERE cos >= tau
      GROUP BY tau""",

      "q144_ann_multiprobe" -> s"""
      WITH $bucketCte,
      pairs AS (
        SELECT a.bucket = b.bucket AS c1,
               bit_count(xor(a.bucket, b.bucket)) <= 1 AS cmp,
               list_dot_product(va.e, vb.e)
                 / (sqrt(list_dot_product(va.e, va.e))
                    * sqrt(list_dot_product(vb.e, vb.e))) AS cos
        FROM bucketed a JOIN bucketed b
          ON a.vec_id % 5 = 0 AND a.vec_id < b.vec_id
        JOIN vecs va ON va.vec_id = a.vec_id
        JOIN vecs vb ON vb.vec_id = b.vec_id)
      SELECT tau,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
             CAST(sum(CASE WHEN cmp THEN 1 ELSE 0 END) AS BIGINT) AS n_mp,
             round(CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*), 6) AS recall_1,
             round(CAST(sum(CASE WHEN cmp THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*), 6) AS recall_mp,
             round(power(1.0 - acos(tau) / pi(), $Planes), 6) AS theory_1,
             round(power(1.0 - acos(tau) / pi(), $Planes)
               + $Planes * power(1.0 - acos(tau) / pi(), ${Planes - 1})
                 * (1.0 - (1.0 - acos(tau) / pi())), 6) AS theory_mp
      FROM pairs, UNNEST(CAST([0.25, 0.30, 0.35, 0.40] AS DOUBLE[])) t(tau)
      WHERE cos >= tau
      GROUP BY tau"""
    )
  }
}
