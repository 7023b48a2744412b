package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Graph algorithms (SURVEY §2.10 — Gelly library parity:
 * flink-libraries/flink-gelly/.../library/ConnectedComponents.java,
 * PageRank.java, LabelPropagation.java) re-expressed as iterative
 * DataFrame programs: one shuffle join + aggregate per superstep, driver
 * loop for iteration control — the Pregel pattern without an RDD in
 * sight.
 *
 * Scale notes: each superstep is `messages = edges ⋈ state → groupBy(dst)`
 * — a hash exchange on node id; state is localCheckpointed every few
 * iterations so the lineage (and its re-execution cost on failure) stays
 * bounded. Convergence detection is a count() of changed rows, which AQE
 * executes as a cheap partial aggregate.
 */
object GraphOps {

  /** Symmetrize a directed edge list (undirected neighborhood). */
  private def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /**
   * Connected components by min-label propagation: component(n) starts as
   * n, each superstep takes the min over the neighborhood, stops when no
   * label changes (or maxIter). Returns (node, component = min node id
   * reachable).
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint()
    var state = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
    var iter = 0
    var converged = false
    // labels only ever decrease, so an unchanged sum(component) ⟺ no
    // label changed — convergence costs one tiny aggregate, not a join.
    // Decimal sum: no overflow at any node-count × id-range scale.
    // Checked every 2nd superstep only: one extra (idempotent) superstep
    // after the fixpoint is cheaper than doubling the driver-side action
    // count — wall-clock here is job-scheduling latency, not data volume.
    var prevSum: java.math.BigDecimal = null
    while (iter < maxIter && !converged) {
      val msgs = sym
        .join(state, sym("src") === state("node"))
        .groupBy(col("dst").as("node2"))
        .agg(min(col("component")).as("nbr_min"))
      val next = state.join(msgs, col("node") === col("node2"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint()
      state = next
      if (iter % 2 == 1 || iter == maxIter - 1) {
        val curSum = next
          .agg(sum(col("component").cast("decimal(38,0)"))).collect()(0)
          .getDecimal(0)
        converged = curSum == prevSum
        prevSum = curSum
      }
      iter += 1
    }
    state
  }

  /**
   * Connected components by alternating large-star/small-star contraction
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC '14) — the scale-insurance variant of `connectedComponents`:
   * round count is O(log² n) in the worst case and ~log n in practice,
   * independent of graph DIAMETER, where min-label propagation needs one
   * superstep per hop. On a 100 TB web/link graph with long chains the
   * min-label loop is unusable; star contraction converges in a handful
   * of shuffles. Each round is two (join + groupBy) exchanges on node id
   * — the same shuffle shape Spark already optimizes.
   *
   * Semantics identical to `connectedComponents` (component = min node
   * id reachable); `connectedComponentsStarWithStats` also returns the
   * number of rounds for measurement.
   */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponentsStarWithStats(edges, maxIter)._1

  def connectedComponentsStarWithStats(edges: DataFrame, maxIter: Int = 25)
      : (DataFrame, Int) = {
    val nodes = symmetrize(edges).select(col("src").as("node")).distinct()
      .localCheckpoint()
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var iter = 0
    var converged = false
    // edge-multiset signature: (count, sum of per-edge hashes). Stable
    // signature ⟺ the star forest stopped changing (hash-collision odds
    // are negligible and the structure is monotone-contracting anyway).
    var prev: (Long, java.math.BigDecimal) = null
    while (iter < maxIter && !converged) {
      // LARGE-STAR: for each u, m = min({u} ∪ N(u)); link every strictly
      // LARGER neighbor to m. Keeps every component connected while
      // halving long tails (the proof is Kiveris et al. Lemma 1).
      val nbrs = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val lmin = nbrs.groupBy("src")
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("u"), least(col("src"), col("mn")).as("m"))
      val large = nbrs.join(lmin, nbrs("src") === lmin("u"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      // SMALL-STAR: orient u > v; for each u, m = min neighbor; link u
      // and all its smaller neighbors to m.
      val o = large.select(greatest(col("src"), col("dst")).as("u"),
                           least(col("src"), col("dst")).as("v"))
      val smin = o.groupBy("u").agg(min(col("v")).as("m"))
      val small = o.join(smin, "u")
        .select(col("v").as("src"), col("m").as("dst"))
        .union(smin.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint()
      val row = small
        .agg(count(lit(1)).as("n"),
             sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")).as("h"))
        .collect()(0)
      val sig = (row.getLong(0), row.getDecimal(1))
      converged = prev != null && sig == prev
      prev = sig
      e = small
      iter += 1
    }
    // after convergence e is a star forest: non-root → component min.
    // (min-agg is a no-op at a true fixpoint; it keeps the projection a
    // function if the loop was cut by maxIter mid-contraction)
    val parents = e.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("comp"))
    val out = nodes
      .join(parents, Seq("node"), "left")
      .select(col("node"),
              coalesce(col("comp"), col("node")).as("component"))
    (out, iter)
  }

  /**
   * PageRank, fixed iteration count, damping d: rank = (1-d)/N + d·Σ
   * rank(in-neighbor)/outdeg. Dangling mass is NOT redistributed (same
   * simplification as Gelly's basic PageRank) — documented, and mirrored
   * exactly by the SQL oracle.
   */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    // One-time setup, materialized once: dedup edges and pre-join the
    // outdegree onto them so every superstep is a single join + aggregate
    // (the per-iteration outdeg join the first version paid is gone).
    // localCheckpoint (not cache) → nothing stays registered in the
    // CacheManager after the query returns.
    val e0 = edges.select(col("src"), col("dst")).distinct()
    val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val eo = e0.join(outdeg, Seq("src")).localCheckpoint()
    val nodes = eo.select(col("src").as("node"))
      .union(eo.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    var rank = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contribs = eo
        .join(rank, eo("src") === rank("node"))
        .select(col("dst").as("node2"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node2").agg(sum(col("c")).as("in_sum"))
      val next = nodes.join(contribs, col("node") === col("node2"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
      // Checkpoint every 2nd superstep (and the last): halves the blocking
      // materializations while keeping lineage depth ≤ 2 supersteps.
      rank = if (i % 2 == 0 || i == iters) next.localCheckpoint() else next
    }
    rank
  }

  /**
   * Single-source shortest paths (Gelly SingleSourceShortestPaths.java
   * analogue) by distributed Bellman-Ford relaxation: dist(source)=0,
   * each superstep every settled node offers dist+w to its neighbors,
   * nodes keep the minimum. Distances only decrease, so an unchanged
   * sum(dist) ⟺ fixpoint — convergence costs one small aggregate.
   * `edges` must carry (src, dst, w); treated as undirected. Returns
   * (node, dist) for REACHABLE nodes only.
   *
   * Scale: each superstep is one hash exchange on node id (join + min
   * aggregate), state localCheckpointed to bound lineage — identical
   * shuffle shape to connectedComponents; supersteps ≈ shortest-path hop
   * diameter, not |V|.
   */
  def sssp(edges: DataFrame, source: Long, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst"),
                               col("w"))).distinct().localCheckpoint()
    var state = sym.select(col("src").as("node")).distinct()
      .withColumn("dist",
        when(col("node") === source, lit(0L)).otherwise(lit(null).cast("long")))
    var iter = 0
    var converged = false
    var prevSig: String = null
    while (iter < maxIter && !converged) {
      val msgs = sym
        .join(state.filter(col("dist").isNotNull), sym("src") === state("node"))
        .groupBy(col("dst").as("node2"))
        .agg(min(col("dist") + col("w")).as("cand"))
      val next = state.join(msgs, col("node") === col("node2"), "left")
        .select(col("node"), least(col("dist"), col("cand")).as("dist"))
        .localCheckpoint()
      // least() ignores nulls, so unreached nodes stay null until offered.
      // (sum of settled dists, settled count) is monotone → fixpoint test.
      val row = next
        .agg(sum(col("dist").cast("decimal(38,0)")), count(col("dist")))
        .collect()(0)
      val sig = s"${row.getDecimal(0)}|${row.getLong(1)}"
      state = next
      converged = sig == prevSig
      prevSig = sig
      iter += 1
    }
    state.filter(col("dist").isNotNull)
  }

  /**
   * Per-node triangle counts (Gelly TriangleEnumerator/TriangleCount
   * analogue). `edges` must be canonical (u < v, deduplicated).
   *
   * Scale: DEGREE-ORIENTED wedge join (Cohen / Schank-Wagner): each edge
   * is re-oriented from its (degree, id)-smaller endpoint to the larger,
   * so the wedge join's fanout per node is its OUT-degree in that
   * orientation, which is ≤ O(√m) — on a power-law graph the id-ordered
   * variant blows up as Σ deg² at the hubs, the oriented one does not
   * (a star graph produces ZERO wedges: every spoke points at the hub).
   * The (degree, id) order is total and acyclic, so each triangle has
   * exactly one vertex with two outgoing edges and is enumerated exactly
   * once. Cost: one degree aggregate + two hash joins on node ids.
   */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u"), col("v")).distinct()
    val deg = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e0
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val e = withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("a"),
        when(uFirst, col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint()
    e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_tri"))
  }

  /**
   * HITS hubs & authorities (Gelly linkanalysis/HITS.java analogue) on a
   * directed graph, fixed iteration count, all-ones start. With unit
   * initial weights every intermediate score is an integer-valued sum —
   * the float accumulation order can never drift — so results are
   * deterministic across engines; final scores are max-normalized.
   * Returns (node, role ∈ {hub, auth}, score).
   */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    var hub = e.select(col("src").as("node")).distinct()
      .withColumn("score", lit(1.0))
    var auth = e.select(col("dst").as("node")).distinct()
      .withColumn("score", lit(1.0))
    for (_ <- 1 to iters) {
      auth = e.join(hub, e("src") === hub("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("score")).as("score"))
        .localCheckpoint()
      hub = e.join(auth, e("dst") === auth("node"))
        .groupBy(col("src").as("node")).agg(sum(col("score")).as("score"))
        .localCheckpoint()
    }
    def normalized(df: DataFrame, role: String) = {
      val mx = broadcast(df.agg(max(col("score")).as("mx")))
      df.join(mx)
        .select(col("node"), lit(role).as("role"),
                round(col("score") / col("mx"), 6).as("score"))
    }
    normalized(hub, "hub").unionAll(normalized(auth, "auth"))
  }

  /**
   * Graph summarization (Gelly library/Summarization.java analogue):
   * contract vertices by a grouping label; the summary graph has one
   * vertex per label (with its member count) and one edge per ordered
   * label pair (with the number of original edges it represents).
   * Returns the summary EDGES (src_label, dst_label, n_edges) —
   * vertex counts are a groupBy away.
   *
   * Scale: two hash joins to translate endpoints + one aggregate —
   * no iteration, embarrassingly parallel.
   */
  def summarize(edges: DataFrame, vertexLabel: DataFrame): DataFrame = {
    // vertexLabel: (node, label)
    val l = vertexLabel.select(col("node"), col("label"))
    edges
      .join(l.select(col("node").as("sn"), col("label").as("src_label")),
        col("src") === col("sn"))
      .join(l.select(col("node").as("dn"), col("label").as("dst_label")),
        col("dst") === col("dn"))
      .groupBy("src_label", "dst_label")
      .agg(count(lit(1)).as("n_edges"))
  }

  /**
   * Local clustering coefficient (Gelly clustering metrics analogue):
   * coefficient(n) = triangles(n) / C(deg(n), 2) on an undirected
   * canonical (u < v) edge set; nodes of degree < 2 get 0.
   */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val tri = triangleCounts(edges)
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(coalesce(col("n_tri"), lit(0L)) * 2.0 /
                           (col("deg") * (col("deg") - 1)), 6))
          .as("coeff"))
  }

  /**
   * Community detection (Gelly library/CommunityDetection.java analogue):
   * label propagation with attenuated scores — labels carry a score,
   * each superstep a node adopts the label with the highest aggregate
   * incoming score (tie → smallest label), and the adopted label's score
   * decays by `delta` per hop. Deterministic synchronous variant.
   */
  def communityDetection(edges: DataFrame, iters: Int,
                         delta: Double = 0.5): DataFrame = {
    val sym = symmetrize(edges).cache()
    var state = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .withColumn("score", lit(1.0))
    for (_ <- 1 to iters) {
      val incoming = sym
        .join(state, sym("src") === state("node"))
        .groupBy(col("dst").as("node2"), col("label"))
        .agg(sum(col("score")).as("total"), max(col("score")).as("best"))
      val adopted = incoming.groupBy(col("node2"))
        .agg(min_by(struct(col("label"), col("best")),
                    struct((-col("total")).as("neg"), col("label")))
          .as("pick"))
        .select(col("node2"), col("pick.label").as("new_label"),
                (col("pick.best") - delta).as("new_score"))
      state = state.join(adopted, col("node") === col("node2"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"),
          coalesce(col("new_score"), col("score")).as("score"))
        .localCheckpoint()
    }
    state.select(col("node"), col("label"))
  }

  /**
   * Jaccard-index vertex similarity (Gelly library/similarity/
   * JaccardIndex.java analogue) on an undirected canonical (u < v) edge
   * set: for every vertex pair sharing ≥1 neighbor, |N(u)∩N(v)| /
   * |N(u)∪N(v)|. Pair generation is PER COMMON NEIGHBOR (the grouped
   * neighbor-pair emission of the reference), never all-pairs — the
   * same hub-bounded profile as triangleCounts; a df-style degree cap
   * on the pivot vertex is the production guard at web scale (the
   * reference's MaximumNumPairs knob).
   * Returns (u, v, shared, union_deg, jaccard rounded to 6).
   */
  def jaccardIndex(edges: DataFrame): DataFrame = {
    val sym = symmetrize(
      edges.select(col("u").as("src"), col("v").as("dst")))
      .localCheckpoint()
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val shared = sym.as("a").join(sym.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .groupBy(col("a.dst").as("u"), col("b.dst").as("v"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("shared"),
        (col("du") + col("dv") - col("shared")).as("union_deg"),
        round(col("shared").cast("double")
          / (col("du") + col("dv") - col("shared")), 6).as("jaccard"))
  }

  /**
   * Adamic–Adar vertex similarity (Gelly library/similarity/
   * AdamicAdar.java analogue): for every pair sharing ≥1 neighbor,
   * Σ over common neighbors w of 1/ln(deg(w)) — rarer shared neighbors
   * count more. Per-neighbor contributions are quantized to integer
   * milli-units immediately after the log (repo float discipline), so
   * the pair sums are BIGINT and engine-exact. A common neighbor always
   * has deg ≥ 2, so ln(deg) > 0. Returns (u, v, n_common, aa_milli).
   */
  def adamicAdar(edges: DataFrame): DataFrame = {
    val sym = symmetrize(
      edges.select(col("u").as("src"), col("v").as("dst")))
      .localCheckpoint()
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // contrib only for deg ≥ 2: a common neighbor always has degree ≥ 2,
    // and degree-1 rows would hit 1/ln(1) = 1/0 under ANSI evaluation
    // even though the join can never select them.
    val wContrib = deg.filter(col("deg") >= 2).select(col("node"),
      round(lit(1000.0) / log(col("deg").cast("double"))).cast("long")
        .as("contrib"))
    sym.as("a").join(sym.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .join(wContrib, col("a.src") === wContrib("node"))
      .groupBy(col("a.dst").as("u"), col("b.dst").as("v"))
      .agg(count(lit(1)).as("n_common"), sum(col("contrib")).as("aa_milli"))
  }

  /**
   * Whole-graph vertex metrics (Gelly library/metric/undirected/
   * VertexMetrics.java analogue) on an undirected canonical (u < v)
   * edge set: vertex/edge counts, average and maximum degree, and the
   * triplet count Σ C(deg, 2) (the denominator of the global clustering
   * coefficient). One aggregate over the degree table.
   */
  def vertexMetrics(edges: DataFrame): DataFrame = {
    // explode both endpoints in ONE pass over the edge plan (a
    // union-of-two-selects would execute the upstream edge join twice)
    val deg = edges
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // n_edges = Σdeg / 2 (every undirected edge contributes 2 to the
    // degree table) — derived inside the one aggregate, so the edge
    // plan (an expensive join for q285's co-purchase graph) executes
    // ONCE; a separate edges.count() would run it a second time.
    deg.agg(
        count(lit(1)).as("n_vertices"),
        expr("CAST(sum(deg) div 2 AS BIGINT)").as("n_edges"),
        round(avg(col("deg")), 6).as("avg_degree"),
        max(col("deg")).as("max_degree"),
        sum(expr("(deg * (deg - 1)) div 2")).cast("long")
          .as("n_triplets"))
  }

  /**
   * Label propagation: labels start as node ids; each superstep every
   * node adopts the most frequent label among neighbors (tie → smallest
   * label). Fixed iteration count (sync variant, like Gelly's).
   */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val sym = symmetrize(edges).cache()
    var state = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val counted = sym
        .join(state, sym("src") === state("node"))
        .groupBy(col("dst").as("node2"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // most frequent label, ties to smallest: min_by over (-cnt, label)
      val best = counted.groupBy(col("node2"))
        .agg(min_by(col("label"), struct((-col("cnt")).as("neg"), col("label")))
          .as("new_label"))
      state = state.join(best, col("node") === col("node2"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint()
    }
    state
  }
}
