package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Corpus-curation operators over `documents` (round 9): sparse TF-IDF
 * pair similarity, per-source frequency capping, and character-entropy
 * quality signals. These are the standard web-corpus curation steps
 * that sit beside dedup (TextOps/DedupOps) and quality gating
 * (PipelineOps q169/q262) in a 100 TB training-data pipeline.
 *
 * The reference has no TF-IDF operator; the capability mapping is the
 * same as its batch relational stack (aggregate + join on the Blink
 * planner, PLANNER/plan/nodes/physical/batch/BatchExecHashAggregate
 * .scala + BatchExecHashJoin.scala) — everything below is plain
 * groupBy/join so Catalyst plans it with partial aggregation and a
 * single shuffle per key change.
 *
 * Float discipline (repo rule, cf. TextOps q159): log-weights are
 * quantized to integer milli-units IMMEDIATELY after the transcendental
 * call, all sums run on BIGINT, and only the final scalar division is
 * floating point — so the DuckDB oracle hash-matches bit-for-bit.
 */
object CurationOps {

  /** Terms appearing in more documents than this are pruned from the
    * PAIR join (not from the norms): a stop-word term key would create
    * a quadratic hot key at scale (same rationale as TextOps q37's
    * shingle-DF cap). Terms with df = 1 are also pruned from the join —
    * they cannot contribute to any pair — which at web scale removes
    * the long tail (typically >50% of the vocabulary). Default for
    * `spark.graft.termDfCap`; the oracle gate runs at this default (the
    * oracle SQL interpolates it statically) — override the conf only
    * when probing the cap (ScaleProbe). */
  private val termDfCap = 500

  /** Runtime cap: `spark.graft.termDfCap` if set, else the default. */
  private def termCap(s: SparkSession): Int =
    s.conf.getOption("spark.graft.termDfCap")
      .map(_.toInt).getOrElse(termDfCap)

  /** Cosine threshold for reported pairs. The fixture corpus is
    * topically homogeneous (median all-pairs TF-IDF cosine ≈ 0.62), so
    * the threshold sits where the distribution's near-dup tail starts —
    * ~0.5% of the pair space survives at every fixture scale. */
  private val minCos = 0.85

  /** Per-source document budget for q272 (frequency capping). */
  private val sourceCap = 1000

  /** Effective q272 cap: the SAME conf lookup the query performs, read at
    * oracle-BUILD time (oracle is a `def`, re-evaluated when Verify dumps
    * it), so a session that sets `spark.graft.sourceCap` gets an oracle
    * baked with the same value the Spark plan used — they cannot diverge. */
  private def sourceCapEff: Int =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption("spark.graft.sourceCap"))
      .map(_.toInt).getOrElse(sourceCap)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sparse TF-IDF cosine similarity pairs via an inverted-index join:
    // never materializes dense vectors and never does all-pairs — the
    // pair space is generated per TERM (df-capped), which is how a
    // 100 TB corpus is actually paired. Weights are integer milli-nats
    // (tf × round(ln(N/df)·1000)), numerators and norms sum as BIGINT,
    // and the only float op is the final num / (√norm_a · √norm_b).
    "q270_tfidf_pairs" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val nDocs = docs.count()
      // tf and w are each read by two+ downstream subtrees (df + the
      // join; norms + both self-join sides) — localCheckpoint them so
      // the corpus is scanned and tokenized ONCE (unchecked, the plan
      // re-derives the token aggregation eight times; at 100 TB that is
      // 8x the scan+shuffle bill).
      val tf = docs
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        .transform(Materialize.frame)
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = tf.join(df, "tok")
        .select(col("doc_id"), col("tok"), col("df"),
          (col("tf") * round(log(lit(nDocs.toDouble) / col("df")) * 1000)
            .cast("long")).as("w"))
        .transform(Materialize.frame)
      val norms = w.groupBy("doc_id")
        .agg(sum(col("w") * col("w")).as("norm2"))
      val joinable = w.filter(col("df").between(2, termCap(s)))
      val pairs = joinable.as("a")
        .join(joinable.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(sum(col("a.w") * col("b.w")).as("num"))
      pairs
        .join(norms.as("na"), col("da") === col("na.doc_id"))
        .join(norms.as("nb"), col("db") === col("nb.doc_id"))
        .withColumn("cos", col("num").cast("double")
          / (sqrt(col("na.norm2").cast("double"))
             * sqrt(col("nb.norm2").cast("double"))))
        .filter(col("cos") >= minCos)
        .select(col("da"), col("db"), col("num"),
                round(col("cos"), 6).as("cos"))
    }),

    // Per-source frequency capping (the CommonCrawl-style "no domain
    // may dominate the corpus" rule): keep the cap highest-quality docs
    // per source (quality = n_chars, tie-break doc_id asc) and report
    // the per-source keep/drop budget. NO per-doc rank: the report's
    // columns are all functionals of the per-(source, n_chars)
    // HISTOGRAM (the q291 bounded-domain move) — one narrow hash agg,
    // then a window over HISTOGRAM rows (≤ distinct char-lengths per
    // source, never the docs), so a single dominant source at 100 TB
    // costs a domain-bounded sort, not a per-row partition sort. The
    // doc_id tie-break only decides WHICH boundary docs are kept —
    // boundary docs all share n_chars = cutoff, so every reported
    // column is tie-invariant and the rank-based oracle matches
    // exactly. The cap is a conf so a spec can force the drop branch.
    "q272_source_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cap = s.conf.get("spark.graft.sourceCap", sourceCap.toString).toInt
      val hist = Tables.table(s, dir, "documents")
        .select(col("source"), col("n_chars"))
        .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
      // cum = # docs of the source with n_chars >= this row's value
      val cum = hist.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc)))
      cum.groupBy("source")
        .agg(sum(col("cnt")).as("n_docs"),
             sum(col("n_chars").cast("long") * col("cnt")).as("all_chars"),
             min(col("n_chars")).as("min_chars"),
             // cutoff = n_chars of the rank-`cap` doc (null: under cap)
             max(when(col("cum") >= cap, col("n_chars"))).as("cutoff"),
             sum(when(col("cum") < cap,
                      col("n_chars").cast("long") * col("cnt"))
               .otherwise(lit(0L))).as("above_chars"),
             sum(when(col("cum") < cap, col("cnt"))
               .otherwise(lit(0L))).as("above_cnt"))
        .select(col("source"), col("n_docs"),
          least(col("n_docs"), lit(cap.toLong)).as("n_kept"),
          (col("n_docs") - least(col("n_docs"), lit(cap.toLong)))
            .as("n_dropped"),
          when(col("cutoff").isNull, col("all_chars"))
            .otherwise(col("above_chars")
              + (lit(cap.toLong) - col("above_cnt"))
                * col("cutoff").cast("long")).as("kept_chars"),
          coalesce(col("cutoff"), col("min_chars")).as("min_kept_chars"))
    }),

    // Temperature-scaled mixture allocation (the multinomial-sampling
    // weight scheme of multilingual/multi-source training runs: weight
    // source i by count^α, α = 0.5, so small sources are up-sampled):
    // per-source token counts → sqrt-damped integer milli-weights →
    // each source's share of a fixed 1M-token budget by integer
    // arithmetic. The whole computation after one narrow aggregate runs
    // on a SOURCES-sized table — at 100 TB this is a driver-trivial
    // broadcast decision table, exactly how mixture weights ship.
    "q280_mixture_temperature" -> ((s, dir) => {
      // sources-sized table, materialized once: the totalW action below
      // and the returned frame would otherwise each re-run the full
      // corpus scan+tokenize (the q270 discipline)
      val bySource = Tables.table(s, dir, "documents")
        .select(col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_toks"))
        .withColumn("w_milli",
          round(sqrt(col("n_toks").cast("double")) * 1000).cast("long"))
        .transform(Materialize.frame)
      val totalW = bySource.agg(sum(col("w_milli"))).head().getLong(0)
      bySource
        .withColumn("alloc_toks",
          expr(s"(1000000 * w_milli) div ${totalW}"))
        .select(col("source"), col("n_docs"), col("n_toks"),
                col("w_milli"), col("alloc_toks"))
    }),

    // Normalization-fingerprint dedup: case/punctuation/whitespace-
    // insensitive exact dedup (the cheap formatting-near-dup catch that
    // runs BEFORE MinHash in a curation funnel). Normal form = lowercase
    // → strip non-alphanumeric/space → collapse runs of spaces → trim;
    // groups keyed by the md5 of that form. Pure scan + one hash
    // exchange, same scale profile as q35's exact dedup.
    "q281_normalized_dedup" -> ((s, dir) => {
      val norm = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")
      Tables.table(s, dir, "documents")
        .groupBy(md5(trim(norm)).as("h"))
        .agg(min(col("doc_id")).as("keeper"),
             count(lit(1)).as("n"),
             sum(col("n_chars")).as("total_chars"))
    }),

    // Paragraph-level global keep-first dedup WITH document rewrite —
    // the C4-style step that actually REMOVES duplicated paragraphs
    // (q166 detects segment dups; this emits the deduplicated corpus):
    // explode paragraphs, keep each paragraph digest's globally first
    // occurrence (min (doc_id, idx) — a partial-aggregated min(struct),
    // NOT a per-digest window sort, so the universal boilerplate
    // paragraphs that appear in millions of docs never force a skewed
    // sort), reassemble each doc's surviving paragraphs in original
    // order and fingerprint the rewrite. Scale: two digest exchanges +
    // one per-doc collect of its own (bounded-size) paragraph list.
    "q293_paragraph_rewrite" -> ((s, dir) => {
      val paras = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), "\n")).as(Seq("idx", "para")))
        .withColumn("d", md5(col("para")))
        .transform(Materialize.frame)
      val firsts = paras.groupBy("d")
        .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
      val kept = paras.join(firsts, "d")
        .filter(col("doc_id") === col("f.doc_id") &&
                col("idx") === col("f.idx"))
      val rebuilt = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          md5(concat_ws("\n", expr(
            "transform(array_sort(collect_list(struct(idx, para))), " +
            "x -> x.para)"))).as("new_digest"))
      paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_paras"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          col("new_digest"))
    }),

    // Cross-source contamination matrix: exact word-trigram shingle
    // overlap between every pair of corpus sources (the corpus-level
    // view of the q167 doc-level decontamination — "how much does
    // source A leak into source B"). Only 16-byte DIGESTS travel
    // through the exchange and the self-join (the shingle text never
    // shuffles, the q166 discipline); per-digest pair fan-out is
    // bounded by #sources², not corpus size. Jaccard from the
    // per-source distinct-shingle counts.
    "q290_source_overlap" -> ((s, dir) => {
      val sh = Tables.table(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .filter(size(col("toks")) >= 3)
        .select(col("source"), explode(array_distinct(expr(
          "transform(sequence(0, size(toks) - 3), i -> " +
          "md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")))
          .as("d"))
        .distinct()
        .transform(Materialize.frame)
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a").join(sh.as("b"),
          col("a.d") === col("b.d") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("common"))
      pairs
        .join(broadcast(sizes.select(col("source").as("sa"),
          col("n").as("n_a"))), "sa")
        .join(broadcast(sizes.select(col("source").as("sb"),
          col("n").as("n_b"))), "sb")
        .withColumn("jaccard", round(col("common").cast("double")
          / (col("n_a") + col("n_b") - col("common")), 6))
    }),

    // Character-entropy quality signal: gibberish and boilerplate both
    // sit at entropy extremes. Letter distribution per doc → per-letter
    // milli-nat surprisal round(-ln(c/n)·1000) → length-weighted BIGINT
    // sum → integer-divided mean. One scan + one narrow groupBy; at
    // 100 TB this is an embarrassingly parallel profile pass.
    "q273_char_entropy" -> ((s, dir) => {
      val chars = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]', 0)"))
            .as("ch"))
      val counts = chars.groupBy("doc_id", "ch")
        .agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("doc_id").agg(sum(col("c")).as("n"))
      counts.join(totals, "doc_id")
        .withColumn("mnat",
          round(-log(col("c").cast("double") / col("n")) * 1000)
            .cast("long"))
        .groupBy("doc_id")
        .agg(max(col("n")).as("n_letters"),
             count(lit(1)).as("n_distinct"),
             sum(col("c") * col("mnat")).as("total_mnat"))
        .withColumn("h_mnat", expr("total_mnat div n_letters"))
    }),

    // Vocabulary coverage curve (the tokenizer-budget question every
    // training run asks: how many vocabulary types cover X‰ of the
    // corpus token mass?). Token counts → GLOBAL frequency-ordered
    // cumulative mass via GlobalRank.withCumSum (range-partitioned — no
    // single-task global window even over a 100 TB-derived vocabulary)
    // → one scan answers all five thresholds. vocab_size at threshold t
    // = #types with cum·1000 < t·total, plus one — rank itself is never
    // materialized. Integer arithmetic end to end (cum ≤ total ≤ 1e13
    // tokens at 100 TB; ×1000 stays far under Long.Max).
    "q295_vocab_coverage" -> ((s, dir) => {
      val vocab = Tables.table(s, dir, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val cum = GlobalRank.withCumSum(vocab,
          Seq(col("cnt").desc, col("tok")), col("cnt"), "cum")
        .transform(Materialize.frame) // one action below + the threshold pass
      val total = cum.agg(max(col("cum"))).head().getLong(0)
      val th = s.createDataFrame(
          Seq(500L, 800L, 900L, 950L, 990L).map(Tuple1(_)))
        .toDF("threshold_pm")
      cum.crossJoin(broadcast(th)) // 5-row broadcast: BNLJ, no cartesian
        .groupBy("threshold_pm")
        .agg((sum(when(col("cum") * 1000 < col("threshold_pm") * total, 1L)
                .otherwise(0L)) + 1L).cast("long").as("vocab_size"),
             min(when(col("cum") * 1000 >= col("threshold_pm") * total,
                 col("cum"))).as("covered"))
        .withColumn("total_toks", lit(total))
    }),

    // Population-stability-index drift detection (the data-quality gate
    // between ingestion snapshots: has the VALUE DISTRIBUTION moved?):
    // events split at the event-time midpoint; 10 equal-width cent
    // bins anchored on the FIRST half's per-type range (the reference
    // period defines the bins, the standard PSI protocol); +1-smoothed
    // proportions; per-bin contribution (pB − pA)·ln(pB/pA) quantized
    // to integer micro-nats BEFORE the sum. Absent bins materialize via
    // a sequence explode so smoothing terms are complete. Two narrow
    // aggregates + a types-sized broadcast — a 100 TB drift check costs
    // one scan.
    "q300_psi_drift" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"),
                floor(col("value") * 100).cast("long").as("cents"),
                Tables.tsMicros(col("ts")).as("tus"))
      val (minUs, maxUs) = {
        val r = ev.agg(min(col("tus")), max(col("tus"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val splitUs = (minUs + maxUs) / 2
      val halved = ev.withColumn("in_a", col("tus") <= splitUs)
      // bins anchor on the REFERENCE half's range; a type with no
      // reference rows (a brand-new event type — the loudest drift
      // signal) falls back to its full range so it still gets a row
      // (uniform smoothed pa vs its actual pb) instead of being
      // silently dropped by the bounds join
      val bounds = halved.groupBy("event_type")
        .agg(coalesce(min(when(col("in_a"), col("cents"))),
               min(col("cents"))).as("lo"),
             coalesce(max(when(col("in_a"), col("cents"))),
               max(col("cents"))).as("hi"))
      val binned = halved.join(broadcast(bounds), "event_type")
        .withColumn("c2", least(col("hi"), greatest(col("lo"), col("cents"))))
        .withColumn("bin", least(lit(9L),
          expr("((c2 - lo) * 10) div (hi - lo + 1)")))
        .groupBy("event_type", "bin")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
             sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
      val allBins = bounds.select(col("event_type"),
          explode(expr("sequence(0L, 9L)")).as("bin"))
        .join(binned, Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("ca", "cb"))
      val totals = allBins.groupBy("event_type")
        .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      allBins.join(broadcast(totals), "event_type")
        .withColumn("pa", (col("ca") + 1).cast("double")
          / (col("na") + 10).cast("double"))
        .withColumn("pb", (col("cb") + 1).cast("double")
          / (col("nb") + 10).cast("double"))
        .withColumn("contrib_unat",
          round((col("pb") - col("pa")) * log(col("pb") / col("pa"))
            * lit(1e6)).cast("long"))
        .groupBy("event_type")
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
             sum(col("contrib_unat")).as("psi_unat"))
    }),

    // Per-source unigram KL divergence vs the corpus (the "how unlike
    // the rest is this domain" matrix mixture design reads): +1-smoothed
    // source and corpus unigram models, KL clipped to the source's
    // OBSERVED support (the standard report shape — the full-vocabulary
    // tail has no closed form and at web scale would cross-join
    // |vocab| × |sources|); per-token contribution p_s·ln(p_s/p_c)
    // quantized to integer micro-nats before the per-source sum. One
    // token scan; the corpus model joins back by token (digest-narrow).
    "q301_source_divergence" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      val st = toks.groupBy("source", "tok").agg(count(lit(1)).as("c_st"))
        .transform(Materialize.frame) // feeds corpus model, totals AND the join
      val ct = st.groupBy("tok").agg(sum(col("c_st")).as("c_t"))
      val totals = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
      val v = ct.count()
      val n = totals.agg(sum(col("n_s"))).head().getLong(0)
      st.join(ct, "tok")
        .join(broadcast(totals), "source")
        .withColumn("p_s", (col("c_st") + 1).cast("double")
          / (col("n_s") + lit(v)).cast("double"))
        .withColumn("p_c", (col("c_t") + 1).cast("double")
          / lit((n + v).toDouble))
        .withColumn("contrib_unat",
          round(col("p_s") * log(col("p_s") / col("p_c")) * lit(1e6))
            .cast("long"))
        .groupBy("source")
        .agg(max(col("n_s")).as("n_toks"),
             count(lit(1)).as("n_types"),
             sum(col("contrib_unat")).as("kl_unat"))
    }),

    // Incremental-ingest dedup (the production shape of exact dedup:
    // new crawl snapshots arrive as DELTAS and must dedup against the
    // already-ingested BASE without rereading it beyond its digest
    // index): base = doc_id % 3 != 0, delta = the rest. A delta doc is
    // dropped if its prefix fingerprint (md5 of the first 10
    // normalized tokens — the title/lead-shingle near-exact catch:
    // re-fetched pages share their head; the fixture has no full-text
    // dups, so a full-text digest would leave both drop branches
    // untested) exists in base (digest anti-join —
    // digests only, text never shuffles), else deduped within the
    // delta keeping min doc_id per digest via a partial-aggregated
    // groupBy + join-back (NOT a per-digest window sort: a universal
    // boilerplate digest would make that one partition's sort huge —
    // the q293 discipline). Report = per-source ingest accounting.
    "q297_incremental_dedup" -> ((s, dir) => {
      // narrow digest projection checkpointed ONCE: base digests, the
      // delta mark join and the keeper join all read it — unchecked,
      // the corpus text would be scanned and re-hashed four times
      // (q270 discipline; the plan audit pins this)
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
                md5(concat_ws(" ",
                  slice(split(trim(lower(col("text"))), "\\s+"), 1, 10)))
                  .as("dig"))
        .transform(Materialize.frame)
      val baseDigs = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .select("dig").distinct().withColumn("in_base", lit(1))
      val delta = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      val marked = delta.join(baseDigs, Seq("dig"), "left")
        .transform(Materialize.frame) // read by keepers AND the final accounting
      val keepers = marked.filter(col("in_base").isNull)
        .groupBy("dig").agg(min(col("doc_id")).as("keep_id"))
      marked.join(keepers, Seq("dig"), "left")
        .withColumn("vs_base", col("in_base").isNotNull)
        .withColumn("ingested",
          col("in_base").isNull && col("doc_id") === col("keep_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_delta"),
             sum(when(col("vs_base"), 1L).otherwise(0L)).as("n_vs_base"),
             sum(when(!col("vs_base") && !col("ingested"), 1L)
               .otherwise(0L)).as("n_within"),
             sum(when(col("ingested"), 1L).otherwise(0L)).as("n_ingested"),
             sum(when(col("ingested"), col("n_chars")).otherwise(0L))
               .as("ingested_chars"))
    }),

    // Zipf head report: the 20 most frequent token types with their
    // global rank and parts-per-million corpus share — the "what is the
    // head made of" diagnostic read next to q295's curve. Top-20 via
    // orderBy+limit = TakeOrderedAndProject (distributed partial
    // top-k); the rank window then runs on 20 rows only (q288 pattern).
    "q296_zipf_head" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vocab = Tables.table(s, dir, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .transform(Materialize.frame) // total action + top-k read the same agg
      val total = vocab.agg(sum(col("cnt"))).head().getLong(0)
      val top = vocab.orderBy(col("cnt").desc, col("tok")).limit(20)
      val w = Window.orderBy(col("cnt").desc, col("tok"))
      top.withColumn("rnk", row_number().over(w).cast("long"))
        // ppm through DECIMAL(38,0): cnt * 1e6 would overflow BIGINT for
        // cnt > ~9.2e12 (inside q295's 1e13-token design ceiling); the
        // widened multiply is exact and DIV returns BIGINT in both engines
        .withColumn("freq_ppm", expr(
          s"CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000) div ${total}L AS BIGINT)"))
        .select(col("tok"), col("cnt"), col("rnk"), col("freq_ppm"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q270_tfidf_pairs" -> s"""
      WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      w AS (
        SELECT tf.doc_id, tf.tok, dfx.df,
               tf.tf * CAST(round(ln(nd.n / dfx.df) * 1000) AS BIGINT) AS w
        FROM tf JOIN dfx USING (tok), nd),
      norms AS (SELECT doc_id, sum(w * w) AS norm2 FROM w GROUP BY doc_id),
      j AS (SELECT * FROM w WHERE df BETWEEN 2 AND $termDfCap),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, sum(a.w * b.w) AS num
        FROM j a JOIN j b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT da, db, CAST(num AS BIGINT) AS num,
             round(CAST(num AS DOUBLE)
                   / (sqrt(CAST(na.norm2 AS DOUBLE))
                      * sqrt(CAST(nb.norm2 AS DOUBLE))), 6) AS cos
      FROM pairs
      JOIN norms na ON da = na.doc_id
      JOIN norms nb ON db = nb.doc_id
      WHERE CAST(num AS DOUBLE)
            / (sqrt(CAST(na.norm2 AS DOUBLE))
               * sqrt(CAST(nb.norm2 AS DOUBLE))) >= $minCos""",

    "q272_source_cap" -> s"""
      WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rnk
        FROM documents)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN rnk <= $sourceCapEff THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN rnk <= $sourceCapEff THEN 0 ELSE 1 END)
               AS BIGINT) AS n_dropped,
             CAST(sum(CASE WHEN rnk <= $sourceCapEff THEN n_chars ELSE 0 END)
               AS BIGINT) AS kept_chars,
             min(CASE WHEN rnk <= $sourceCapEff THEN n_chars END)
               AS min_kept_chars
      FROM ranked GROUP BY source""",

    "q280_mixture_temperature" -> """
      WITH bs AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
                 AS BIGINT) AS n_toks
        FROM documents GROUP BY source),
      w AS (
        SELECT source, n_docs,  n_toks,
               CAST(round(sqrt(CAST(n_toks AS DOUBLE)) * 1000) AS BIGINT)
                 AS w_milli
        FROM bs),
      t AS (SELECT CAST(sum(w_milli) AS BIGINT) AS tw FROM w)
      SELECT source, n_docs, n_toks, w_milli,
             (1000000 * w_milli) // tw AS alloc_toks
      FROM w, t""",

    "q281_normalized_dedup" -> """
      SELECT md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g'))) AS h,
             min(doc_id) AS keeper, count(*) AS n,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1""",

    "q293_paragraph_rewrite" -> """
      WITH p AS (
        SELECT doc_id, g.i - 1 AS idx, parts[g.i] AS para
        FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
              FROM documents) t,
             UNNEST(generate_series(1, len(parts))) AS g(i)),
      r AS (
        SELECT doc_id, idx, para,
               row_number() OVER (PARTITION BY md5(para)
                                  ORDER BY doc_id, idx) AS rk
        FROM p),
      k AS (SELECT doc_id, idx, para FROM r WHERE rk = 1),
      reb AS (
        SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(para, chr(10) ORDER BY idx)) AS new_digest
        FROM k GROUP BY doc_id),
      tot AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY doc_id)
      SELECT t.doc_id, t.n_paras,
             COALESCE(reb.n_kept, 0) AS n_kept, reb.new_digest
      FROM tot t LEFT JOIN reb USING (doc_id)""",

    "q290_source_overlap" -> """
      WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT source,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3),
      sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      p AS (
        SELECT a.source AS sa, b.source AS sb, count(*) AS common
        FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2)
      SELECT sa, sb, common, na.n AS n_a, nb.n AS n_b,
             round(CAST(common AS DOUBLE) / (na.n + nb.n - common), 6)
               AS jaccard
      FROM p
      JOIN sizes na ON sa = na.source
      JOIN sizes nb ON sb = nb.source""",

    "q273_char_entropy" -> """
      WITH chars AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]')) AS ch
        FROM documents),
      counts AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
      totals AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
                 FROM counts GROUP BY doc_id),
      m AS (
        SELECT counts.doc_id, counts.c, totals.n,
               CAST(round(-ln(CAST(counts.c AS DOUBLE) / totals.n) * 1000)
                 AS BIGINT) AS mnat
        FROM counts JOIN totals USING (doc_id))
      SELECT doc_id, max(n) AS n_letters, count(*) AS n_distinct,
             CAST(sum(c * mnat) AS BIGINT) AS total_mnat,
             CAST(sum(c * mnat) AS BIGINT) // max(n) AS h_mnat
      FROM m GROUP BY doc_id""",

    "q295_vocab_coverage" -> """
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents),
      v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
      r AS (SELECT tok, cnt,
              CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM v),
      th(threshold_pm) AS (VALUES (500), (800), (900), (950), (990))
      SELECT CAST(th.threshold_pm AS BIGINT) AS threshold_pm,
             CAST(sum(CASE WHEN r.cum * 1000 < th.threshold_pm * t.total
                           THEN 1 ELSE 0 END) + 1 AS BIGINT) AS vocab_size,
             CAST(min(CASE WHEN r.cum * 1000 >= th.threshold_pm * t.total
                           THEN r.cum END) AS BIGINT) AS covered,
             CAST(max(t.total) AS BIGINT) AS total_toks
      FROM th, r, t GROUP BY 1""",

    "q300_psi_drift" -> """
      WITH ev AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        FROM events),
      sp AS (SELECT (min(tus) + max(tus)) // 2 AS s FROM ev),
      h AS (SELECT ev.*, ev.tus <= sp.s AS in_a FROM ev, sp),
      bounds AS (SELECT event_type,
                        coalesce(min(CASE WHEN in_a THEN cents END),
                                 min(cents)) AS lo,
                        coalesce(max(CASE WHEN in_a THEN cents END),
                                 max(cents)) AS hi
                 FROM h GROUP BY 1),
      binned AS (
        SELECT h.event_type,
               least(9, ((least(b.hi, greatest(b.lo, h.cents)) - b.lo) * 10)
                        // (b.hi - b.lo + 1)) AS bin,
               sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS cb
        FROM h JOIN bounds b USING (event_type) GROUP BY 1, 2),
      ab AS (
        SELECT x.event_type, x.bin,
               coalesce(bn.ca, 0) AS ca, coalesce(bn.cb, 0) AS cb
        FROM (SELECT b.event_type, g.bin
              FROM bounds b, UNNEST(generate_series(0, 9)) AS g(bin)) x
        LEFT JOIN binned bn
          ON bn.event_type = x.event_type AND bn.bin = x.bin),
      tot AS (SELECT event_type, CAST(sum(ca) AS BIGINT) AS na,
                     CAST(sum(cb) AS BIGINT) AS nb
              FROM ab GROUP BY 1),
      c AS (
        SELECT ab.event_type, tot.na, tot.nb,
               CAST(round((CAST(ab.cb + 1 AS DOUBLE) / (tot.nb + 10)
                           - CAST(ab.ca + 1 AS DOUBLE) / (tot.na + 10))
                 * ln((CAST(ab.cb + 1 AS DOUBLE) / (tot.nb + 10))
                      / (CAST(ab.ca + 1 AS DOUBLE) / (tot.na + 10)))
                 * 1e6) AS BIGINT) AS contrib
        FROM ab JOIN tot USING (event_type))
      SELECT event_type, max(na) AS n_a, max(nb) AS n_b,
             CAST(sum(contrib) AS BIGINT) AS psi_unat
      FROM c GROUP BY event_type""",

    "q301_source_divergence" -> """
      WITH toks AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents),
      st AS (SELECT source, tok, count(*) AS c_st FROM toks GROUP BY 1, 2),
      ct AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t
             FROM st GROUP BY 1),
      tot AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s
              FROM st GROUP BY 1),
      vv AS (SELECT count(*) AS v FROM ct),
      nn AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM tot),
      c AS (
        SELECT st.source, tot.n_s,
               CAST(round((CAST(st.c_st + 1 AS DOUBLE) / (tot.n_s + vv.v))
                 * ln((CAST(st.c_st + 1 AS DOUBLE) / (tot.n_s + vv.v))
                      / (CAST(ct.c_t + 1 AS DOUBLE) / (nn.n + vv.v)))
                 * 1e6) AS BIGINT) AS contrib
        FROM st JOIN ct USING (tok) JOIN tot USING (source), vv, nn)
      SELECT source, max(n_s) AS n_toks, count(*) AS n_types,
             CAST(sum(contrib) AS BIGINT) AS kl_unat
      FROM c GROUP BY source""",

    "q297_incremental_dedup" -> """
      WITH docs AS (
        SELECT doc_id, source, n_chars,
               md5(array_to_string(
                 (regexp_split_to_array(trim(lower(text)), '\s+'))[1:10],
                 ' ')) AS dig
        FROM documents),
      base AS (SELECT DISTINCT dig FROM docs WHERE doc_id % 3 != 0),
      delta AS (SELECT * FROM docs WHERE doc_id % 3 = 0),
      marked AS (
        SELECT d.*, (b.dig IS NOT NULL) AS vs_base
        FROM delta d LEFT JOIN base b ON d.dig = b.dig),
      keepers AS (
        SELECT dig, min(doc_id) AS keep_id FROM marked
        WHERE NOT vs_base GROUP BY dig)
      SELECT source, count(*) AS n_delta,
             CAST(sum(CASE WHEN vs_base THEN 1 ELSE 0 END) AS BIGINT)
               AS n_vs_base,
             CAST(sum(CASE WHEN NOT vs_base AND m.doc_id != k.keep_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
             CAST(sum(CASE WHEN NOT vs_base AND m.doc_id = k.keep_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_ingested,
             CAST(sum(CASE WHEN NOT vs_base AND m.doc_id = k.keep_id
                           THEN n_chars ELSE 0 END) AS BIGINT)
               AS ingested_chars
      FROM marked m LEFT JOIN keepers k ON m.dig = k.dig
      GROUP BY source""",

    "q296_zipf_head" -> """
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents),
      v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
      x AS (SELECT tok, cnt,
              row_number() OVER (ORDER BY cnt DESC, tok) AS rnk FROM v)
      SELECT tok, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS BIGINT) AS rnk,
             CAST((CAST(cnt AS HUGEINT) * 1000000) // t.total AS BIGINT)
               AS freq_ppm
      FROM x, t WHERE rnk <= 20"""
  )
}
