package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Training-data-pipeline compositions over `documents` (builder north
 * star: the operations a 100 TB pretraining-data pipeline runs beyond
 * single-operator dedup/scoring — cluster resolution, sampling,
 * scrubbing, selection).
 *
 * Everything here is expression-only or reuses an existing distributed
 * operator (connected components); no UDFs, no driver-side data.
 *
 * Scale notes per operator:
 *  - dup_clusters: candidate edges come from bounded equi-joins
 *    (DF-capped shingle join + exact-hash star edges), then min-label
 *    connected components — per superstep one hash exchange on node id;
 *    never O(n²) in documents.
 *  - stratified_sample: pure projection + filter on a multiplicative
 *    hash of the key — deterministic (re-runnable, auditable) unlike
 *    `sampleBy`'s RNG, no shuffle, trivially parallel.
 *  - pii_redact: per-row regex scrub, embarrassingly parallel scan;
 *    codegen'd `regexp_replace`/`regexp_count`.
 *  - token_histogram: projection + one partial-aggregated groupBy.
 *  - train_select: greedy budget fill by quality rank. The cumulative
 *    sum is range-partitioned (GlobalRank.withCumSum — per-partition
 *    prefix totals broadcast as offsets), so the global order costs a
 *    sampled range exchange, not a single-task window.
 */
object PipelineOps {

  /** Same document-frequency cap as TextOps.q37 — bounds the hot-key
    * quadratic blowup of the shingle equi-join at scale. */
  private val shingleDfCap = 500

  /** Near-dup edge threshold for cluster resolution (the fixture's real
    * near-dup pairs sit at jac ≥ 0.9; 0.5 keeps headroom without
    * admitting topical-overlap noise). */
  private val clusterJac = 0.5

  /** Word-trigram Jaccard pairs (da < db, jac >= clusterJac) — the q37
    * machinery re-scoped as an edge generator. */
  private def jaccardEdges(docs: DataFrame): DataFrame = {
    val toks = docs
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
    // Materialized once (same reuse pattern as q37): the DF-cap
    // aggregate, the cap join, the per-doc counts and both self-join
    // legs otherwise re-run the tokenize+explode subtree four times.
    val rawShingles = toks.select(col("doc_id"),
      explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> " +
        "concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("sh"))
      .transform(Materialize.frame)
    val keepSh = rawShingles.groupBy("sh")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= shingleDfCap)
      .select("sh")
    val shingles = rawShingles.join(keepSh, "sh").transform(Materialize.frame)
    val counts = shingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    shingles.as("a")
      .join(shingles.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.as("ca"), col("src") === col("ca.doc_id"))
      .join(counts.as("cb"), col("dst") === col("cb.doc_id"))
      .filter(col("inter").cast("double")
        / (col("ca.n_sh") + col("cb.n_sh") - col("inter")) >= clusterJac)
      .select(col("src"), col("dst"))
  }

  /** Near-dup cluster membership shared by q129/q271 (the Scala dual of
    * the shared oracle CTE `clusterCteSql`): exact-hash star edges ∪
    * trigram-Jaccard pairs → min-label connected components →
    * (doc_id, cluster). Only edge-touched docs appear. */
  private def dupClusterComp(docs: DataFrame): DataFrame = {
    // star edges inside each exact-duplicate hash group (min id ← doc)
    val wH = Window.partitionBy(md5(col("text")))
    val exactEdges = docs
      .withColumn("src", min(col("doc_id")).over(wH))
      .filter(col("src") =!= col("doc_id"))
      .select(col("src"), col("doc_id").as("dst"))
    val edges = jaccardEdges(docs).union(exactEdges)
    graft.graph.GraphOps.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("component").as("cluster"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Transitive near-duplicate CLUSTER resolution: pairwise candidates
    // (exact-hash groups ∪ trigram-Jaccard pairs) are only half the
    // dedup story — A~B, B~C must collapse into ONE cluster even when
    // A~C was never scored. Edges → min-label connected components →
    // (doc, cluster representative, cluster size).
    "q129_dup_clusters" -> ((s, dir) => {
      val comp = dupClusterComp(Tables.table(s, dir, "documents"))
      val wC = Window.partitionBy(col("cluster"))
      comp.withColumn("csize", count(lit(1)).over(wC))
    }),

    // Leakage-safe train/eval split: the split unit is the near-dup
    // CLUSTER, not the document — a doc-level random split leaks
    // near-duplicates of training docs into eval (the contamination
    // mode q140/q167 detect after the fact; this op prevents it by
    // construction, since split is a function of the cluster label).
    // Deterministic multiplicative-hash bucketing on the cluster (the
    // q59 auditable-sampling discipline): bucket < 100 → eval (10%).
    // Scale: q129's cluster machinery + one hash — no extra shuffle
    // beyond the membership join.
    "q302_leakage_safe_split" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val comp = dupClusterComp(docs)
      docs.select(col("doc_id"), col("n_chars"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
        // multiply widened through DECIMAL(38,0): cluster ids are doc_ids
        // (unbounded Long), and BIGINT cluster*2654435761 overflows for
        // ids >= ~3.47e9 (ANSI mode throws); the widened form is exact for
        // the full Long domain and identical in the DuckDB oracle (HUGEINT)
        .withColumn("split",
          when(expr("CAST((CAST(cluster AS DECIMAL(38,0)) * 2654435761)" +
                    " % 1000 AS BIGINT)") < 100, "eval")
            .otherwise("train"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("cluster")).as("n_clusters"),
             sum(col("n_chars")).as("total_chars"))
    }),

    // Deterministic stratified sampling: per-language keep rates applied
    // via a multiplicative hash of the key (Knuth 2654435761) — the
    // sample is reproducible run-over-run and auditable row-by-row,
    // which RNG-based sampleBy is not. Pure filter: no shuffle.
    "q59_stratified_sample" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        // same DECIMAL(38,0) widening as q302: overflow-safe multiplicative
        // hash over the full Long key domain, identical in the oracle
        .withColumn("bucket", expr(
          "CAST((CAST(doc_id AS DECIMAL(38,0)) * 2654435761) % 1000 AS BIGINT)"))
        .withColumn("rate", expr(
          "CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 300 ELSE 100 END"))
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("lang"), col("bucket"))
    }),

    // PII scrubbing: inject deterministic synthetic PII (the fixture
    // corpus has none; the injection is identical in the oracle), then
    // redact emails / phone numbers / IPv4s and report match counts and
    // the scrubbed text's fingerprint. Patterns stay inside the
    // RE2 ∩ java.util.regex common subset so both engines agree.
    "q130_pii_redact" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      val ip = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      Tables.table(s, dir, "documents")
        .withColumn("synth", concat(
          col("text"), lit(" Contact user"),
          col("doc_id").cast("string"), lit("@example.com or +1-555-"),
          lpad(expr("CAST(doc_id % 10000 AS STRING)"), 4, "0"),
          lit(" from 10.0."), expr("CAST(doc_id % 256 AS STRING)"),
          lit(".7")))
        .withColumn("red", regexp_replace(
          regexp_replace(
            regexp_replace(col("synth"), email, "<EMAIL>"),
            phone, "<PHONE>"),
          ip, "<IP>"))
        .select(
          col("doc_id"),
          regexp_count(col("synth"), lit(email)).cast("int").as("n_email"),
          regexp_count(col("synth"), lit(phone)).cast("int").as("n_phone"),
          regexp_count(col("synth"), lit(ip)).cast("int").as("n_ip"),
          md5(col("red")).as("red_md5"),
          length(col("red")).as("red_len"))
    }),

    // Token-count histogram: log2 length buckets per language — the
    // standard corpus-shape diagnostic before sequence packing.
    "q131_token_histogram" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
        .filter(col("n_tokens") >= 1)
        .withColumn("bucket", floor(log2(col("n_tokens"))).cast("int"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens")).cast("bigint").as("sum_tokens"),
             min(col("n_tokens")).as("min_tokens"),
             max(col("n_tokens")).as("max_tokens"))
    }),

    // End-to-end training-set selection: quality gate (stopword ratio,
    // length) → rank by quality → greedy fill of a token budget. The
    // cumulative sum runs range-partitioned (GlobalRank.withCumSum:
    // per-partition prefix totals as broadcast offsets) — NOT a global
    // single-task window — ordered by (score desc, doc_id) so the
    // selection is a deterministic function of the corpus.
    "q132_train_select" -> ((s, dir) => {
      val scored = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("score", round(
          expr("size(filter(toks, t -> t IN ('the','a','of','and','to')))")
            .cast("double") / col("n_tokens"), 6))
        .filter(col("lang") === "en" && col("n_tokens") >= 40 &&
                col("score") >= 0.02)
        .select(col("doc_id"), col("n_tokens"), col("score"))
      GlobalRank.withCumSum(scored,
          Seq(col("score").desc, col("doc_id")), col("n_tokens"),
          outCol = "cum_tokens")
        .filter(col("cum_tokens") <= 8000)
        .select(col("doc_id"), col("n_tokens"), col("score"),
                col("cum_tokens"))
    }),

    // Benchmark decontamination: flag training docs sharing any word
    // 13-gram with a held-out eval set (the GPT-3 n; eval set here = the
    // deterministic doc_id%20==7 slice standing in for a benchmark
    // suite). Scale shape: eval benchmarks are fixed-size regardless of
    // corpus size, so the distinct benchmark-gram set is BROADCAST and
    // the probe is a map-side hash join over the training-gram scan —
    // the only exchange is the per-doc hit count.
    "q140_decontaminate" -> ((s, dir) => {
      val n = 13
      val docs = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      // grams travel as md5 DIGESTS from the moment they exist (the
      // q167 transport discipline, guide §2.3): the broadcast set and
      // the distinct-count carry 32-hex keys, never 13-word strings —
      // identical hit counts, a fraction of the broadcast bytes. The
      // frame is materialized once for its two consumers (eval set +
      // probe side) instead of re-running the explode per leg.
      val grams = docs.filter(size(col("toks")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> md5(array_join(slice(toks, i, $n), ' ')))")).as("gram"))
        .transform(Materialize.frame)
      val bench = broadcast(grams.filter(col("doc_id") % 20 === 7)
        .select(col("gram")).distinct())
      val hits = grams.filter(col("doc_id") % 20 =!= 7)
        .join(bench, "gram")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("gram")).as("h"))
      docs.filter(col("doc_id") % 20 =!= 7)
        .select(col("doc_id"),
          greatest(size(col("toks")) - (n - 1), lit(0))
            .cast("int").as("n_grams"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("h"), lit(0L)).cast("int").as("n_hits"),
          (coalesce(col("h"), lit(0L)) > 0).cast("int").as("contaminated"))
    }),

    // Bloom-filter decontamination — the scale path beside q140's exact
    // broadcast join: the eval slice's 13-grams fold into a fixed
    // 2^20-slot Bloom set (4 md5-derived slots per gram — portable, so
    // the oracle rebuilds the IDENTICAL filter and the comparison is
    // bit-exact, false positives included); corpus grams probe the slot
    // set, a gram is bloom-positive iff all 4 slots hit. No false
    // negatives by construction — every doc carries both counts and
    // exact ≤ bloom per row. At 100 TB the filter follows the EVAL
    // corpus size (fixed), not the training corpus: the probe is a
    // broadcast semi-join on an integer slot, where q140 must broadcast
    // the gram STRINGS.
    "q167_bloom_decontam" -> ((s, dir) => {
      val n = 13
      val bfM = 1 << 20
      val docs = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      // grams travel as md5 DIGESTS from the moment they exist: every
      // downstream distinct/join/broadcast exchanges 32-hex keys, never
      // 13-word strings, and the Bloom hash is a substring of the same
      // digest — one md5 per gram occurrence total, computed in the
      // scan projection.
      val grams = docs.filter(size(col("toks")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> md5(array_join(slice(toks, i, $n), ' ')))")).as("gh"))
      // 4 slots by Kirsch–Mitzenmacher double hashing of the 60-bit
      // digest prefix (slot_i = x + i·y mod m, y forced odd) — k-hash
      // Bloom FP asymptotics, decided once per DISTINCT gram.
      val ii = array((0 until 4).map(lit): _*)
      def slotted(df: DataFrame): DataFrame = df
        .withColumn("h",
          conv(substring(col("gh"), 1, 15), 16, 10).cast("long"))
        .withColumn("x", pmod(col("h"), lit(bfM.toLong)))
        .withColumn("y",
          pmod(expr(s"h div $bfM"), lit(bfM.toLong))
            .bitwiseOR(lit(1L)))
        .select(col("*"), explode(ii).as("i"))
        .withColumn("slot",
          pmod(col("x") + col("i") * col("y"), lit(bfM.toLong)))
      // the explode pass runs ONCE: all four legs (eval slot set, corpus
      // vocabulary, per-doc hits, exact bench) derive from the shared
      // distinct (doc, digest) frame — at 100 TB this is the bounded
      // doc×gram association, 48 bytes a row, the natural reuse point.
      // localCheckpoint (not cache): the blocks are released when the
      // plan is garbage-collected, so repeated invocations (bench reps,
      // spec + oracle dump) don't accumulate session-lifetime cached
      // partitions the way an un-unpersisted cache() would.
      val allD = grams.distinct().transform(Materialize.frame)
      val evalD = allD.filter(col("doc_id") % 20 === 7)
        .select(col("gh")).distinct()
      val slotSet = broadcast(
        slotted(evalD).select(col("slot")).distinct())
      val uniq = allD.filter(col("doc_id") % 20 =!= 7)
        .select(col("gh")).distinct()
      val bloomPosGrams = slotted(uniq)
        .join(slotSet, "slot")
        .groupBy(col("gh"))
        .agg(countDistinct(col("i")).as("k_hit"))
        .filter(col("k_hit") === 4)
        .select(col("gh"))
      val gramsD = allD.filter(col("doc_id") % 20 =!= 7)
      val bloomPos = gramsD
        .join(bloomPosGrams, "gh", "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("bh"))
      val bench = broadcast(evalD)
      val exactHits = gramsD
        .join(bench, "gh", "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("eh"))
      docs.filter(col("doc_id") % 20 =!= 7)
        .select(col("doc_id"),
          greatest(size(col("toks")) - (n - 1), lit(0))
            .cast("int").as("n_grams"))
        .join(bloomPos, Seq("doc_id"), "left")
        .join(exactHits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("bh"), lit(0L)).cast("int").as("n_bloom_hits"),
          coalesce(col("eh"), lit(0L)).cast("int").as("n_exact_hits"),
          (coalesce(col("bh"), lit(0L)) > 0).cast("int").as("bloom_flag"),
          (coalesce(col("eh"), lit(0L)) > 0).cast("int").as("exact_flag"))
    }),

    // Quality-gate funnel — the ablation table every filtering pipeline
    // publishes: gates applied in order, each row reporting docs in,
    // dropped here, surviving. One scan computes all per-doc flags
    // (no shuffle), one aggregate folds them into the funnel; every
    // threshold is INTEGER arithmetic (cross-multiplied ratios), so the
    // oracle agrees exactly with no float comparisons at the boundary.
    "q169_filter_funnel" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("nt", size(col("toks")).cast("long"))
        .withColumn("nd", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("nc",
          length(regexp_replace(col("text"), "\\s", "")).cast("long"))
        .select(
          (col("n_chars") >= 100).as("g1"),
          (col("nt") >= 20).as("g2"),
          // duplicate-token fraction ≤ 0.6 ⇔ (nt − nd)·10 ≤ nt·6
          ((col("nt") - col("nd")) * 10 <= col("nt") * 6).as("g3"),
          // mean token length in [3, 7] chars
          (col("nc") >= col("nt") * 3 && col("nc") <= col("nt") * 7)
            .as("g4"))
      d.agg(
          count(lit(1)).as("n0"),
          sum(when(col("g1"), 1L).otherwise(0L)).as("o1"),
          sum(when(col("g1") && col("g2"), 1L).otherwise(0L)).as("o2"),
          sum(when(col("g1") && col("g2") && col("g3"), 1L).otherwise(0L))
            .as("o3"),
          sum(when(col("g1") && col("g2") && col("g3") && col("g4"), 1L)
            .otherwise(0L)).as("o4"))
        .selectExpr("stack(4, " +
          "'1_len_chars', n0, n0 - o1, o1, " +
          "'2_min_tokens', o1, o1 - o2, o2, " +
          "'3_repetition', o2, o2 - o3, o3, " +
          "'4_token_shape', o3, o3 - o4, o4) " +
          "as (stage, n_in, n_fail, n_out)")
    }),

    // Repetition signals (the Gopher quality-filter family): fraction of
    // tokens that are repeats, and the document share of its most
    // frequent word bigram. ZERO-shuffle: the top-bigram count is the
    // longest equal-run in the SORTED bigram array — a single
    // higher-order fold per row, no explode/groupBy.
    "q141_repetition" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
        .filter(size(col("toks")) >= 2)
        .withColumn("bgs", expr(
          "array_sort(transform(sequence(0, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i], toks[i+1])))"))
        .withColumn("top2", expr(
          "aggregate(bgs, named_struct('prev', '', 'run', 0, 'best', 0), " +
          "(acc, x) -> named_struct(" +
          "  'prev', x, " +
          "  'run', IF(x = acc.prev, acc.run + 1, 1), " +
          "  'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1, 1))), " +
          "acc -> acc.best)"))
        .select(col("doc_id"),
          size(col("toks")).cast("int").as("n_tokens"),
          col("top2").cast("int").as("top2_cnt"),
          round(col("top2").cast("double") / size(col("bgs")), 6)
            .as("top2_frac"),
          round(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
            / size(col("toks")), 6).as("dup_word_frac"))
    }),

    // Domain-mixture reweighting (the data-mixing step of a pretraining
    // pipeline): given target per-source weights, derive per-source KEEP
    // RATES that reshape the token distribution toward the target
    // without upsampling (global scale pins the max rate at 1.0 —
    // DoReMi-style renormalization). The per-source table is tiny at any
    // corpus size, so the three global scalars travel as broadcast
    // cross joins — no single-partition window anywhere.
    "q147_domain_mix" -> ((s, dir) => {
      val tok = Tables.table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(split(trim(col("text")), "\\s+")).cast("bigint"))
               .as("n_tokens"))
        .withColumn("w",
          (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("double"))
      val tot = tok.agg(sum(col("n_tokens")).cast("double").as("tot_tokens"),
                        sum(col("w")).as("tot_w"))
      val shared = tok.crossJoin(broadcast(tot))
        .withColumn("cur_share", col("n_tokens") / col("tot_tokens"))
        .withColumn("tgt_share", col("w") / col("tot_w"))
        .withColumn("raw", col("tgt_share") / col("cur_share"))
      val mx = shared.agg(max(col("raw")).as("mx"))
      shared.crossJoin(broadcast(mx))
        .select(col("source"), col("n_tokens"),
          round(col("cur_share"), 6).as("cur_share"),
          round(col("tgt_share"), 6).as("tgt_share"),
          round(col("raw") / col("mx"), 6).as("keep_rate"),
          round(col("n_tokens") * col("raw") / col("mx"), 2).as("est_tokens"))
    }),

    // Sequence packing (concat-and-chunk): documents are laid end-to-end
    // in doc_id order and cut into fixed 2048-token training sequences;
    // each doc reports its global token offset, its sequence id, and
    // whether it straddles a cut. The global offset is the
    // range-partitioned cumulative sum (GlobalRank.withCumSum) — a
    // sampled range exchange plus per-partition prefix offsets, never a
    // single-task window.
    "q142_seq_pack" -> ((s, dir) => {
      val seqLen = 2048
      val sized = Tables.table(s, dir, "documents")
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("bigint"))
        .select(col("doc_id"), col("n_tokens"))
      GlobalRank.withCumSum(sized, Seq(col("doc_id")), col("n_tokens"),
          outCol = "cum_end")
        .withColumn("offset", col("cum_end") - col("n_tokens"))
        // integer division (not floor(double)): token offsets at 100 TB
        // exceed the 2^53 double mantissa
        .select(col("doc_id"), col("n_tokens"), col("offset"),
          expr(s"offset DIV $seqLen").as("seq_id"),
          (expr(s"offset DIV $seqLen") =!=
            expr(s"(cum_end - 1) DIV $seqLen")).cast("int").as("straddles"))
    }),

    // Z-order data layout audit: cluster the fact by the Morton
    // interleave of two join/filter dimensions, cut the sorted stream
    // into fixed-size "files", and report each file's per-dimension
    // min/max envelope — the statistics min/max file skipping would use.
    // Sorting by ONE key bounds one dimension's envelopes; the Z-value
    // bounds BOTH at once, which is the entire point of Z-order layout
    // for multi-predicate scans at 100 TB. The global order costs a
    // range exchange; file ids come from the range-partitioned
    // cumulative count (no single-task window); the Z-key itself is a
    // codegen'd expression (plans/zorder.scala) evaluated in the scan
    // projection.
    "q161_zorder_layout" -> ((s, dir) => {
      val bridge = org.apache.spark.sql.graftbridge.Bridge
      val base = Tables.table(s, dir, "lineitem")
        .select(pmod(col("l_partkey"), lit(65536)).cast("long").as("x"),
                pmod(col("l_suppkey"), lit(65536)).cast("long").as("y"))
      val z = base.withColumn("z", bridge.column(graft.plans.ZOrder16(
        bridge.expression(col("x")), bridge.expression(col("y")))))
      GlobalRank.withCumSum(z, Seq(col("z")), lit(1L), outCol = "rn")
        .withColumn("file_id", expr("(rn - 1) DIV 4096"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n"),
             min(col("x")).as("x_min"), max(col("x")).as("x_max"),
             min(col("y")).as("y_min"), max(col("y")).as("y_max"))
    }),

    // The canonical Gopher quality rules (Rae et al. 2021 §A1.1) as a
    // per-document verdict — q169 publishes the funnel aggregate; this
    // is the classifier itself, every rule a codegen'd projection in ONE
    // scan with no shuffle and all thresholds in cross-multiplied
    // INTEGER arithmetic (no float boundary in the oracle compare).
    // Rules: word count 50..100k; mean word length 3..10; symbol
    // (#/ellipsis) to word ratio <= 0.1; <= 90% bullet lines; <= 30%
    // ellipsis-ending lines; >= 80% words with an alphabetic char;
    // >= 1 distinct Gopher stopword (the paper uses >= 2; the fixture's
    // synthetic vocabulary carries at most one of the eight, so the
    // threshold is scaled to keep the rule discriminating — 382/500
    // docs pass it at sf0.01 vs 0/500 at the paper value).
    "q262_gopher_rules" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("nt", size(col("toks")).cast("long"))
        .withColumn("nc",
          length(regexp_replace(col("text"), "\\s", "")).cast("long"))
        .withColumn("nsym",
          size(expr("regexp_extract_all(text, '#|\\\\.\\\\.\\\\.|…', 0)"))
            .cast("long"))
        .withColumn("lines", split(col("text"), "\n"))
        .withColumn("nl", size(col("lines")).cast("long"))
        .withColumn("nbul",
          size(expr("filter(lines, l -> l rlike '^\\\\s*[-*•]')")).cast("long"))
        .withColumn("nell",
          size(expr("filter(lines, l -> l rlike '(\\\\.\\\\.\\\\.|…)\\\\s*$')"))
            .cast("long"))
        .withColumn("nalpha",
          size(expr("filter(toks, t -> t rlike '[A-Za-z]')")).cast("long"))
        .withColumn("nstop", size(expr(
          "filter(array('the','be','to','of','and','that','have','with'), " +
          "w -> array_contains(transform(toks, t -> lower(t)), w))"))
          .cast("long"))
        .select(
          col("doc_id"),
          (col("nt") >= 50 && col("nt") <= 100000).cast("int").as("r_words"),
          (col("nc") >= col("nt") * 3 && col("nc") <= col("nt") * 10)
            .cast("int").as("r_wordlen"),
          (col("nsym") * 10 <= col("nt")).cast("int").as("r_symbol"),
          (col("nbul") * 10 <= col("nl") * 9).cast("int").as("r_bullet"),
          (col("nell") * 10 <= col("nl") * 3).cast("int").as("r_ellipsis"),
          (col("nalpha") * 5 >= col("nt") * 4).cast("int").as("r_alpha"),
          (col("nstop") >= 1).cast("int").as("r_stop"))
        .withColumn("pass",
          (col("r_words") * col("r_wordlen") * col("r_symbol")
            * col("r_bullet") * col("r_ellipsis") * col("r_alpha")
            * col("r_stop")).cast("int"))
    }),

    // Canonical-document selection — the KEEP decision that turns q129's
    // near-dup clusters into a deduplicated corpus: per cluster keep the
    // highest-quality member (quality = n_chars, tie-break doc_id asc)
    // and account for the chars dropped. Docs outside every edge are
    // their own singleton cluster (LEFT join + coalesce), so the output
    // partitions the corpus exactly. Scale: same profile as q129 (the
    // cluster resolution dominates); the canonical pick is one window
    // rank inside each cluster partition.
    "q271_canonical_docs" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val comp = dupClusterComp(docs)
      val clustered = docs.select(col("doc_id"), col("n_chars"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      val wC = Window.partitionBy(col("cluster"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      clustered.withColumn("rnk", row_number().over(wC))
        .groupBy("cluster")
        .agg(count(lit(1)).as("csize"),
             min(when(col("rnk") === 1, col("doc_id"))).as("keeper"),
             min(when(col("rnk") === 1, col("n_chars"))).as("keeper_chars"),
             sum(when(col("rnk") > 1, col("n_chars")).otherwise(0L))
               .as("dropped_chars"))
    })
  )

  /** DuckDB rendering of ZOrder16: Σᵢ ((x div 2^i) mod 2)·2^(2i) +
    * ((y div 2^i) mod 2)·2^(2i+1) — div/mod arithmetic (not shifts) so
    * the same text is valid in both engines' SQL dialects; operands are
    * non-negative so floor-div (//) and truncating div agree. */
  private def zorderSql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Shared CTE prefix for q129/q271: near-dup edges → recursive
    * transitive closure → min-label components (the SQL dual of
    * jaccardEdges + GraphOps.connectedComponents). */
  private def clusterCteSql: String = s"""
      WITH RECURSIVE toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
      sh0 AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3),
      keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $shingleDfCap),
      sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      jpairs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      jedges AS (
        SELECT src, dst FROM jpairs
        JOIN cnt ca ON src = ca.doc_id
        JOIN cnt cb ON dst = cb.doc_id
        WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= $clusterJac),
      eedges AS (
        SELECT src, dst FROM (
          SELECT min(doc_id) OVER (PARTITION BY md5(text)) AS src,
                 doc_id AS dst
          FROM documents) WHERE src <> dst),
      edges AS (SELECT * FROM jedges UNION SELECT * FROM eedges),
      sym AS (SELECT src, dst FROM edges
              UNION SELECT dst, src FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      comp AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster
        FROM reach GROUP BY src)"""

  val oracle: Map[String, String] = Map(
    "q129_dup_clusters" -> s"""$clusterCteSql
      SELECT doc_id, cluster,
             count(*) OVER (PARTITION BY cluster) AS csize
      FROM comp""",

    "q302_leakage_safe_split" -> s"""$clusterCteSql,
      clustered AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c USING (doc_id)),
      sp AS (
        SELECT doc_id, n_chars, cluster,
               CASE WHEN (CAST(cluster AS HUGEINT) * 2654435761) % 1000 < 100
                    THEN 'eval' ELSE 'train' END AS split
        FROM clustered)
      SELECT split, count(*) AS n_docs,
             count(DISTINCT cluster) AS n_clusters,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM sp GROUP BY split""",

    "q271_canonical_docs" -> s"""$clusterCteSql,
      clustered AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c USING (doc_id)),
      r AS (
        SELECT cluster, doc_id, n_chars,
               row_number() OVER (PARTITION BY cluster
                                  ORDER BY n_chars DESC, doc_id) AS rnk
        FROM clustered)
      SELECT cluster, count(*) AS csize,
             min(CASE WHEN rnk = 1 THEN doc_id END) AS keeper,
             min(CASE WHEN rnk = 1 THEN n_chars END) AS keeper_chars,
             CAST(sum(CASE WHEN rnk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
               AS dropped_chars
      FROM r GROUP BY cluster""",

    "q59_stratified_sample" -> """
      SELECT doc_id, lang,
             CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000 AS BIGINT)
               AS bucket
      FROM documents
      WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 1000 <
            CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 300 ELSE 100 END""",

    "q130_pii_redact" -> """
      WITH synth AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.7' AS s
        FROM documents),
      red AS (
        SELECT doc_id, s,
          regexp_replace(
            regexp_replace(
              regexp_replace(s,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
            '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS r
        FROM synth)
      SELECT doc_id,
        CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        CAST(len(regexp_extract_all(s, '\+1-555-[0-9]{4}')) AS INT) AS n_phone,
        CAST(len(regexp_extract_all(s, '10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INT) AS n_ip,
        md5(r) AS red_md5,
        CAST(length(r) AS INT) AS red_len
      FROM red""",

    "q131_token_histogram" -> """
      WITH t AS (
        SELECT lang,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents)
      SELECT lang, CAST(floor(log2(n_tokens)) AS INT) AS bucket,
             count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(min(n_tokens) AS INT) AS min_tokens,
             CAST(max(n_tokens) AS INT) AS max_tokens
      FROM t WHERE n_tokens >= 1
      GROUP BY lang, CAST(floor(log2(n_tokens)) AS INT)""",

    "q140_decontaminate" -> """
      WITH d AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, array_to_string(toks[i:i+12], ' ') AS gram
        FROM d, UNNEST(generate_series(1, len(toks) - 12)) AS t(i)
        WHERE len(toks) >= 13),
      bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 7),
      hits AS (
        SELECT g.doc_id, count(DISTINCT g.gram) AS h
        FROM g JOIN bench USING (gram)
        WHERE g.doc_id % 20 <> 7
        GROUP BY 1)
      SELECT d.doc_id,
             CAST(greatest(len(toks) - 12, 0) AS INT) AS n_grams,
             CAST(coalesce(h, 0) AS INT) AS n_hits,
             CAST(coalesce(h, 0) > 0 AS INT) AS contaminated
      FROM d LEFT JOIN hits ON d.doc_id = hits.doc_id
      WHERE d.doc_id % 20 <> 7""",

    "q167_bloom_decontam" -> """
      WITH d AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, md5(array_to_string(toks[i:i+12], ' ')) AS gh
        FROM d, UNNEST(generate_series(1, len(toks) - 12)) AS t(i)
        WHERE len(toks) >= 13),
      corp AS (SELECT doc_id, gh FROM g WHERE doc_id % 20 <> 7),
      ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 20 = 7),
      evh AS (
        SELECT CAST(('0x' || substr(gh, 1, 15)) AS BIGINT) AS h
        FROM ev),
      evslots AS (
        SELECT DISTINCT (x + ii.i * y) % 1048576 AS slot
        FROM (SELECT h % 1048576 AS x,
                     ((h // 1048576) % 1048576) | 1 AS y
              FROM evh), UNNEST([0, 1, 2, 3]) AS ii(i)),
      uniq AS (SELECT DISTINCT gh FROM corp),
      us AS (
        SELECT gh, ii.i, (x + ii.i * y) % 1048576 AS slot
        FROM (SELECT gh,
                     h % 1048576 AS x,
                     ((h // 1048576) % 1048576) | 1 AS y
              FROM (SELECT gh,
                           CAST(('0x' || substr(gh, 1, 15)) AS BIGINT) AS h
                    FROM uniq)), UNNEST([0, 1, 2, 3]) AS ii(i)),
      bpg AS (
        SELECT gh
        FROM us JOIN evslots USING (slot)
        GROUP BY gh
        HAVING count(DISTINCT i) = 4),
      corpd AS (SELECT DISTINCT doc_id, gh FROM corp),
      bh AS (SELECT doc_id, count(*) AS bh
             FROM corpd JOIN bpg USING (gh) GROUP BY 1),
      eh AS (SELECT c.doc_id, count(*) AS eh
             FROM corpd c JOIN ev USING (gh) GROUP BY 1)
      SELECT d.doc_id,
             CAST(greatest(len(toks) - 12, 0) AS INT) AS n_grams,
             CAST(coalesce(bh, 0) AS INT) AS n_bloom_hits,
             CAST(coalesce(eh, 0) AS INT) AS n_exact_hits,
             CAST(coalesce(bh, 0) > 0 AS INT) AS bloom_flag,
             CAST(coalesce(eh, 0) > 0 AS INT) AS exact_flag
      FROM d LEFT JOIN bh ON d.doc_id = bh.doc_id
           LEFT JOIN eh ON d.doc_id = eh.doc_id
      WHERE d.doc_id % 20 <> 7""",

    "q169_filter_funnel" -> """
      WITH f AS (
        SELECT n_chars >= 100 AS g1,
               len(t) >= 20 AS g2,
               (len(t) - len(list_distinct(t))) * 10 <= len(t) * 6 AS g3,
               length(regexp_replace(text, '\s', '', 'g')) >= len(t) * 3
                 AND length(regexp_replace(text, '\s', '', 'g'))
                       <= len(t) * 7 AS g4
        FROM (SELECT n_chars, text,
                     regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents)),
      a AS (
        SELECT count(*) AS n0,
               CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
               CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS o2,
               CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)
                 AS BIGINT) AS o3,
               CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
                 AS BIGINT) AS o4
        FROM f)
      SELECT '1_len_chars' AS stage, n0 AS n_in, n0 - o1 AS n_fail,
             o1 AS n_out FROM a
      UNION ALL
      SELECT '2_min_tokens', o1, o1 - o2, o2 FROM a
      UNION ALL
      SELECT '3_repetition', o2, o2 - o3, o3 FROM a
      UNION ALL
      SELECT '4_token_shape', o3, o3 - o4, o4 FROM a""",

    "q141_repetition" -> """
      WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents),
      b AS (
        SELECT doc_id, toks, toks[i] || ' ' || toks[i+1] AS bg
        FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
        WHERE len(toks) >= 2),
      cnt AS (
        SELECT doc_id,
               CAST(max(len(toks)) AS INT) AS n_tokens,
               CAST(max(len(list_distinct(toks))) AS INT) AS n_distinct,
               CAST(count(*) AS INT) AS n_bigrams,
               CAST(max(c) AS INT) AS top2_cnt
        FROM (SELECT doc_id, toks, bg, count(*) OVER
                (PARTITION BY doc_id, bg) AS c FROM b)
        GROUP BY doc_id)
      SELECT doc_id, n_tokens, top2_cnt,
             round(CAST(top2_cnt AS DOUBLE) / n_bigrams, 6) AS top2_frac,
             round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6)
               AS dup_word_frac
      FROM cnt""",

    "q147_domain_mix" -> """
      WITH tok AS (
        SELECT source,
               CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
                 AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      x AS (
        SELECT source, n_tokens,
               CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS DOUBLE) AS w
        FROM tok),
      y AS (
        SELECT source, n_tokens,
               n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE) AS cur_share,
               w / sum(w) OVER () AS tgt_share
        FROM x),
      z AS (SELECT *, tgt_share / cur_share AS raw FROM y)
      SELECT source, n_tokens,
             round(cur_share, 6) AS cur_share,
             round(tgt_share, 6) AS tgt_share,
             round(raw / max(raw) OVER (), 6) AS keep_rate,
             round(n_tokens * raw / max(raw) OVER (), 2) AS est_tokens
      FROM z""",

    "q142_seq_pack" -> """
      WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_end
        FROM t)
      SELECT doc_id, n_tokens,
             CAST(cum_end - n_tokens AS BIGINT) AS "offset",
             CAST((cum_end - n_tokens) // 2048 AS BIGINT) AS seq_id,
             CAST((cum_end - n_tokens) // 2048
               <> (cum_end - 1) // 2048 AS INT) AS straddles
      FROM c""",

    "q161_zorder_layout" -> s"""
      WITH b AS (
        SELECT l_partkey % 65536 AS x, l_suppkey % 65536 AS y
        FROM lineitem),
      zt AS (SELECT x, y, ${zorderSql("x", "y")} AS z FROM b),
      f AS (
        SELECT x, y,
               (row_number() OVER (ORDER BY z) - 1) // 4096 AS file_id
        FROM zt)
      SELECT file_id, count(*) AS n,
             min(x) AS x_min, max(x) AS x_max,
             min(y) AS y_min, max(y) AS y_max
      FROM f GROUP BY file_id""",

    "q132_train_select" -> """
      WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS toks, lang
        FROM documents),
      scored AS (
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               round(CAST(len(list_filter(toks,
                 x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
                 / len(toks), 6) AS score
        FROM t WHERE lang = 'en' AND len(toks) >= 40),
      gated AS (SELECT * FROM scored WHERE score >= 0.02),
      ranked AS (
        SELECT doc_id, n_tokens, score,
               sum(n_tokens) OVER (
                 ORDER BY score DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_tokens
        FROM gated)
      SELECT doc_id, n_tokens, score, CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM ranked WHERE cum_tokens <= 8000""",

    "q262_gopher_rules" -> """
      WITH d AS (
        SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\s+') AS toks,
               string_split(text, chr(10)) AS lines
        FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS nt,
               CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nc,
               CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS BIGINT) AS nsym,
               CAST(len(lines) AS BIGINT) AS nl,
               CAST(len(list_filter(lines,
                 l -> regexp_matches(l, '^\s*[-*•]'))) AS BIGINT) AS nbul,
               CAST(len(list_filter(lines,
                 l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS BIGINT) AS nell,
               CAST(len(list_filter(toks,
                 t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS nalpha,
               CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                 w -> list_contains(list_transform(toks, t -> lower(t)), w)))
                 AS BIGINT) AS nstop
        FROM d),
      r AS (
        SELECT doc_id,
               CAST(nt >= 50 AND nt <= 100000 AS INT) AS r_words,
               CAST(nc >= nt * 3 AND nc <= nt * 10 AS INT) AS r_wordlen,
               CAST(nsym * 10 <= nt AS INT) AS r_symbol,
               CAST(nbul * 10 <= nl * 9 AS INT) AS r_bullet,
               CAST(nell * 10 <= nl * 3 AS INT) AS r_ellipsis,
               CAST(nalpha * 5 >= nt * 4 AS INT) AS r_alpha,
               CAST(nstop >= 1 AS INT) AS r_stop
        FROM m)
      SELECT doc_id, r_words, r_wordlen, r_symbol, r_bullet, r_ellipsis,
             r_alpha, r_stop,
             r_words * r_wordlen * r_symbol * r_bullet * r_ellipsis
               * r_alpha * r_stop AS pass
      FROM r"""
  )
}
