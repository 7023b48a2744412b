package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Mergeable-sketch operators — the fixed-size summary structures a
 * 100 TB pipeline aggregates INSTEAD of exact global state when the
 * exact answer would not fit (heavy hitters, distinct counts, weighted
 * samples, tiny models). Reference capability: Flink's accumulator /
 * two-phase aggregate machinery (SURVEY §2.4 local-global,
 * `RUNTIME/runtime/operators/aggregate/MiniBatchLocalGroupAggFunction.java`);
 * the sketches themselves are the classic public constructions
 * (Cormode–Muthukrishnan CountMin; Flajolet HyperLogLog; KMV/bottom-k,
 * Bar-Yossef et al.).
 *
 * Everything here is DETERMINISTIC — hashes derive from md5 exactly like
 * DedupOps (`h(seed,s) = first 15 hex chars of md5('seed:'||s) as
 * int64`), so the sketch CONTENTS (not just error bounds) are
 * reproducible and oracle-checkable bit-exactly in DuckDB. Float
 * determinism is engineered, not hoped for: every floating value is
 * produced by a fixed tree of correctly-rounded IEEE ops over exact
 * integers (scaled power-of-two register sums, single multiply/divide),
 * so Spark and DuckDB agree to the last bit.
 *
 * Scale notes:
 *  - cms: the sketch is a d×w (3×256) cell table — a groupBy on 768
 *    keys, partial-aggregated map-side, merged per-cell; the probe side
 *    broadcasts the 768 cells. Heavy-hitter estimation never groups the
 *    raw token stream by token beyond the (bounded) distinct-token
 *    candidate set.
 *  - hll: per (source, register) max-rank — 64 registers per group key,
 *    partial-max map-side; the register table IS the mergeable state a
 *    streaming/multi-day union would keep.
 *  - bottom-k: row_number ≤ k per source on distinct hashes — Spark
 *    rewrites to WindowGroupLimit, so each partition keeps only its own
 *    k smallest before the exchange (bounded state, the heap the
 *    textbook algorithm describes).
 *  - weighted sample: priority = hash/weight, global top-k via
 *    orderBy+limit = TakeOrderedAndProject — per-partition heaps + a
 *    driver merge of k rows, never a global sort.
 *  - linear probe: "train" reduces to ONE partial-aggregated global sum
 *    of integer feature moments (exact, associative); the 2-parameter
 *    model is solved in closed form and broadcast back over the corpus
 *    to score — the smallest instance of the train-tiny/score-everywhere
 *    pattern.
 */
object SketchOps {

  /** 60-bit portable hash (same construction as DedupOps). */
  private def h60(seed: String, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10)
      .cast("long")

  private def h60Sql(seed: String, s: String): String =
    s"CAST(('0x' || substr(md5('$seed:' || $s), 1, 15)) AS BIGINT)"

  // CountMin geometry. w=256 cells/row bounds per-cell relative error at
  // ~2e/w of the stream; d=3 rows drive the over-estimate probability
  // down exponentially. 768 cells total regardless of corpus size.
  private val CmsDepth = 3
  private val CmsWidth = 256

  // HLL: m=64 registers (p=6) → ~13% standard error; the register value
  // is the rank (leading-zero position + 1) of the 54-bit hash suffix.
  private val HllM = 64

  /** Per-(source, register) max-rank table — works identically on a
    * batch OR streaming `documents` frame (q151 / q265). */
  private def hllRegisters(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), h60("hll", col("text")).as("h"))
      .withColumn("reg", pmod(col("h"), lit(HllM)))
      .withColumn("rem", expr(s"h div $HllM"))
      .withColumn("rank",
        when(col("rem") === 0, lit(55))
          .otherwise(lit(55) - length(expr("bin(rem)"))))
      .groupBy("source", "reg").agg(max(col("rank")).as("m"))

  /** Estimate shaping shared by q151/q265: harmonic mean over the
    * register table plus the Flajolet small-range correction (below
    * 2.5m the raw harmonic estimate is biased high — switch to linear
    * counting on the empty-register count, m · ln(m/V)). */
  private def hllEstimate(regs: DataFrame, docs: DataFrame): DataFrame = {
    val agg = regs.groupBy("source").agg(
      count(lit(1)).as("n_reg"),
      sum(expr("CAST(power(2, 55 - m) AS BIGINT)")).as("ssum"))
    val exact = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("exact_cnt"))
    agg.join(exact, "source")
      .withColumn("sum_scaled",
        col("ssum") + (lit(HllM) - col("n_reg"))
          * expr("CAST(power(2, 55) AS BIGINT)"))
      .withColumn("e_raw",
        lit(0.709) * expr("power(2, 67)") / col("sum_scaled"))
      .withColumn("v", lit(HllM) - col("n_reg"))
      .select(col("source"), col("n_reg"),
        round(when(col("e_raw") <= lit(2.5 * HllM) && col("v") > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v")))
          .otherwise(col("e_raw")), 4).as("est"),
        col("exact_cnt"))
  }

  // Bottom-k distinct sketch size.
  private val KmvK = 32

  // Histogram-quantile geometry: values are scaled by 2^4 and bucketed
  // by power of two (bucket = bit-length of the scaled integer), so the
  // whole per-group state is ≤ ~60 counters no matter how many rows
  // flow through — the single-pass, mergeable alternative to exact
  // percentile's full sort at 100 TB.
  private val HistScale = 16

  // Bottom-k size for the set-operation sketch (q164).
  private val KmvSetK = 128

  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CountMin-sketch heavy hitters over the token stream: build the
    // 3×256 cell table, then estimate each candidate token's frequency
    // as min over its 3 cells; report tokens estimated at ≥0.1% of the
    // stream next to their true counts (est ≥ true always — CMS only
    // over-counts; the spec asserts the invariant).
    "q150_cms_heavy" -> ((s, dir) => {
      val toks = tokens(s, dir)
      val depths = array((0 until CmsDepth).map(lit): _*)
      val cnts = toks.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
      // Cell counts from the DISTINCT-token frequency table, not from
      // re-hashing the raw stream ×depth: Σ_{tok→slot} count(tok) is the
      // same number as counting the exploded stream, and at 100 TB
      // |distinct tokens| ≪ |stream| — one partial-aggregated pass over
      // the stream (cnts, needed anyway), then sketch construction is
      // O(|vocab|·depth).
      val cells = cnts
        .select(col("tok"), col("true_cnt"), explode(depths).as("depth"))
        .withColumn("slot",
          pmod(h60("cms", concat(col("depth").cast("string"),
            lit("_"), col("tok"))), lit(CmsWidth)))
        .groupBy("depth", "slot")
        .agg(sum(col("true_cnt")).as("c"))
      val probes = cnts.select(col("tok"))
        .select(col("tok"), explode(depths).as("depth"))
        .withColumn("slot",
          pmod(h60("cms", concat(col("depth").cast("string"),
            lit("_"), col("tok"))), lit(CmsWidth)))
      val est = probes
        .join(broadcast(cells), Seq("depth", "slot"))
        .groupBy("tok").agg(min(col("c")).as("est"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      est.join(cnts, "tok").crossJoin(broadcast(total))
        .filter(col("est") * 1000 >= col("n_total"))
        .select(col("tok").as("token"), col("est"), col("true_cnt"))
    }),

    // HyperLogLog distinct-document estimate per source: register index
    // = hash mod 64, rank = leading-zero position of the 54-bit hash
    // suffix (computed exactly via the binary-string length — identical
    // integer logic in both engines, no float log). The raw-estimate
    // float is exact-by-construction: register sum is kept as the
    // integer Σ 2^(55−rank) (scaled by 2^55 so every term is integral),
    // and the final α·m²·2^55 / sum is a fixed tree of correctly-rounded
    // IEEE ops on exact inputs.
    "q151_hll_distinct" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      hllEstimate(hllRegisters(docs), docs)
    }),

    // The HLL register table maintained as a STREAMING aggregation
    // across micro-batches — the "mergeable state a streaming/multi-day
    // union would keep" (scale note above) made executable under the
    // oracle gate: per-(source, register) MAX-rank in Complete mode is
    // batch-boundary-independent by construction (max is associative
    // and commutative), so the final register table — and the estimate
    // shaped from it — hash-matches q151's batch oracle verbatim.
    "q265_stream_hll" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
        .select(col("source"), col("text"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_hll_replay").toString
      docs.repartition(4).write.mode("overwrite").parquet(s"$root/in")
      graft.streaming.ReplayQueries.withStatePartitions(s, 8) {
        val regs = hllRegisters(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2).parquet(s"$root/in"))
        val q = regs.writeStream.outputMode("complete")
          .option("checkpointLocation", s"$root/ck")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(s"$root/out")
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      hllEstimate(s.read.parquet(s"$root/out"),
                  Tables.table(s, dir, "documents"))
    }),

    // The CMS cell table maintained as a STREAMING aggregation across
    // micro-batches (q150's sketch under unbounded input — the
    // reference's per-key incremental agg state, RUNTIME/runtime/
    // operators/aggregate/): per-(depth, slot) COUNT over the exploded
    // token stream in Complete mode. Cell sums are integer counts —
    // associative, commutative, batch-boundary-independent — so the
    // read-back cell table, probed by the batch vocabulary exactly as
    // q150 does, hash-matches q150's oracle verbatim.
    "q282_stream_cms" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents").select(col("text"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_cms_replay").toString
      docs.repartition(4).write.mode("overwrite").parquet(s"$root/in")
      val depths = array((0 until CmsDepth).map(lit): _*)
      def slotted(toks: DataFrame): DataFrame = toks
        .select(col("tok"), explode(depths).as("depth"))
        .withColumn("slot",
          pmod(h60("cms", concat(col("depth").cast("string"),
            lit("_"), col("tok"))), lit(CmsWidth)))
      graft.streaming.ReplayQueries.withStatePartitions(s, 8) {
        val streamCells = slotted(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2).parquet(s"$root/in")
            .select(explode(split(trim(col("text")), "\\s+")).as("tok")))
          .groupBy("depth", "slot")
          .agg(count(lit(1)).as("c"))
        val q = streamCells.writeStream.outputMode("complete")
          .option("checkpointLocation", s"$root/ck")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(s"$root/out")
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      val cells = s.read.parquet(s"$root/out")
      val toks = tokens(s, dir)
      val cnts = toks.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
      val est = slotted(cnts.select(col("tok")))
        .join(broadcast(cells), Seq("depth", "slot"))
        .groupBy("tok").agg(min(col("c")).as("est"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      est.join(cnts, "tok").crossJoin(broadcast(total))
        .filter(col("est") * 1000 >= col("n_total"))
        .select(col("tok").as("token"), col("est"), col("true_cnt"))
    }),

    // Bottom-k (KMV) distinct sketch per source: the k smallest distinct
    // hashes. Doubles as a uniform sample OF THE DISTINCT population
    // (the classic "distinct sample") and yields the KMV estimate
    // (k−1)·2^60 / h_k. row_number ≤ k becomes WindowGroupLimit: each
    // partition keeps its own k smallest before the exchange.
    "q154_bottomk_distinct" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val dh = docs
        .select(col("source"), h60("kmv", col("text")).as("h"))
        .distinct()
      val w = Window.partitionBy("source").orderBy("h")
      val agg = dh.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= KmvK)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      val exact = docs.groupBy("source")
        .agg(countDistinct(col("text")).as("exact_cnt"))
      agg.join(exact, "source")
        .select(col("source"), col("n_kept"),
          when(col("n_kept") < KmvK, col("exact_cnt").cast("double"))
            .otherwise(round(
              lit((KmvK - 1).toDouble) * expr("power(2, 60)") / col("hk"),
              4)).as("est"),
          col("exact_cnt"))
    }),

    // Deterministic weighted sample: priority = hash(doc_id)/weight with
    // weight = n_chars (long docs proportionally likelier), smallest-50
    // priorities win. Auditable (any row's in/out status is recomputable
    // from its key alone) unlike RNG sampling; the global top-k is
    // TakeOrderedAndProject — no global sort at any scale.
    "q152_weighted_sample" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          (h60("ws", col("doc_id").cast("string")).cast("double")
            / col("n_chars")).as("p"))
        .orderBy(col("p"), col("doc_id"))
        .limit(50)
        // NOT rounded: both engines produce the identical correctly-
        // rounded IEEE quotient, while round(x, 6) at this magnitude
        // (~1e14) goes through a scale/unscale that perturbs the value
        // differently per engine.
        .select(col("doc_id"), col("n_chars"), col("p").as("priority"))
    }),

    // Model-in-the-loop filtering, smallest instance: fit BPE-token
    // count ≈ a·(whitespace-token count) + b by least squares — the
    // moments n, Σx, Σy, Σx², Σxy are EXACT integer aggregates, the
    // closed-form (a, b) is computed once from them, broadcast, and the
    // corpus is re-scored to flag fertility outliers (docs whose BPE
    // blow-up deviates >25% from the linear model — a real
    // tokenizer-QA signal). Train = one partial-aggregated reduce;
    // score = embarrassingly parallel scan.
    "q153_length_model" -> ((s, dir) => {
      val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
      val feats = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("x"),
          size(regexp_extract_all(col("text"), lit(bpe), lit(0)))
            .cast("long").as("y"))
      val m = feats.agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
        .withColumn("a",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double"))
        .withColumn("b",
          (col("sy").cast("double") - col("a") * col("sx").cast("double"))
            / col("n").cast("double"))
        .select(col("a"), col("b"))
      feats.crossJoin(broadcast(m))
        .withColumn("pred", col("a") * col("x").cast("double") + col("b"))
        .withColumn("outlier",
          abs(col("y").cast("double") - col("pred")) > lit(0.25) * col("pred"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("outlier"), 1L).otherwise(0L)).as("n_outliers"),
          round(first(col("a")), 6).as("a"),
          round(first(col("b")), 6).as("b"))
    }),

    // Histogram quantile estimator per event type: one pass builds
    // power-of-two bucket counts (bucket = bit-length of the 2^4-scaled
    // integer value — pure integer logic, identical in both engines),
    // quantiles read off the cumulative histogram as the bucket upper
    // bound. State is ≤ ~60 counters per group — mergeable across
    // partitions, days, or micro-batches — vs exact percentile's full
    // per-group sort; the exact p50/p90/p99 ride along to show the
    // estimate lands within its bucket guarantee (upper bound ≤ 2× the
    // true value at this scale factor of 2).
    "q163_hist_quantile" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      val buck = ev
        .select(col("event_type"),
          (floor(col("value") * HistScale).cast("long") + 1).as("n"))
        .withColumn("bucket", length(expr("bin(n)")).cast("long"))
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wtot = Window.partitionBy("event_type")
      val cum = buck
        .withColumn("cum", sum(col("c")).over(wcum))
        .withColumn("total", sum(col("c")).over(wtot))
      // cum is monotone in bucket, so "smallest bucket with
      // cum ≥ ⌈q·total⌉" is a conditional MIN; cum*100 ≥ total*q keeps
      // the threshold in exact integers.
      def bq(q: Int): Column =
        min(when(col("cum") * 100 >= col("total") * q, col("bucket")))
      def est(b: Column): Column =
        (pow(lit(2.0), b) - lit(1.0)) / lit(HistScale.toDouble)
      val ests = cum.groupBy("event_type").agg(
        count(lit(1)).as("n_buckets"),
        bq(50).as("b50"), bq(90).as("b90"), bq(99).as("b99"))
      val exact = ev.groupBy("event_type").agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      ests.join(exact, "event_type")
        .select(col("event_type"), col("n_buckets"),
          est(col("b50")).as("p50_est"), est(col("b90")).as("p90_est"),
          est(col("b99")).as("p99_est"),
          col("p50"), col("p90"), col("p99"))
    }),

    // Sliding-window distinct users per day (7-day window) — the query
    // shape where mergeable sketches STOP being optional: exact sliding
    // distinct does not decompose (each window must re-see its users),
    // but HLL registers union by per-register max, so each day's
    // register row CONTRIBUTES to the ≤7 windows covering it — the
    // contribute-explode is 7× the (days × 64-register) table,
    // independent of event volume. Exact counts ride along as the
    // verification baseline (they re-expand user×window pairs — the
    // cost the sketch avoids).
    "q174_sliding_distinct" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("dayn"),
          col("user_id"))
      val maxDay = 29L
      val regs = ev
        .select(col("dayn"),
          h60("hllu", col("user_id").cast("string")).as("h"))
        .withColumn("reg", pmod(col("h"), lit(HllM)))
        .withColumn("rem", expr(s"h div $HllM"))
        .withColumn("rank",
          when(col("rem") === 0, lit(55))
            .otherwise(lit(55) - length(expr("bin(rem)"))))
        .groupBy("dayn", "reg").agg(max(col("rank")).as("m"))
      val winRegs = regs
        .select(col("reg"), col("m"),
          explode(expr(s"sequence(dayn, least(dayn + 6, $maxDay))"))
            .as("wd"))
        .groupBy("wd", "reg").agg(max(col("m")).as("m"))
      val agg = winRegs.groupBy("wd").agg(
        count(lit(1)).as("n_reg"),
        sum(expr("CAST(power(2, 55 - m) AS BIGINT)")).as("ssum"))
      val exact = ev.distinct()
        .select(col("user_id"),
          explode(expr(s"sequence(dayn, least(dayn + 6, $maxDay))"))
            .as("wd"))
        .groupBy("wd").agg(countDistinct(col("user_id")).as("exact_cnt"))
      agg.join(exact, "wd")
        .withColumn("sum_scaled",
          col("ssum") + (lit(HllM) - col("n_reg"))
            * expr("CAST(power(2, 55) AS BIGINT)"))
        .withColumn("e_raw",
          lit(0.709) * expr("power(2, 67)") / col("sum_scaled"))
        .withColumn("v", lit(HllM) - col("n_reg"))
        .select(col("wd").as("day_index"), col("n_reg"),
          round(when(col("e_raw") <= lit(2.5 * HllM) && col("v") > 0,
              lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v")))
            .otherwise(col("e_raw")), 4).as("est"),
          col("exact_cnt"))
    }),

    // KMV set-operation estimates (Theta-sketch style) between two
    // sources' trigram-shingle sets: one bottom-k sketch of the UNION's
    // distinct hashes; each retained hash's membership in A/B gives the
    // Jaccard estimate, |A∪B| comes from the k-th smallest hash, and
    // |A∩B| = jaccard · union. Exact counts ride along. At 100 TB each
    // side's sketch is k hashes (WindowGroupLimit-style partial top-k
    // per partition, TakeOrderedAndProject global) — set algebra over
    // corpora without ever joining them.
    "q164_kmv_setops" -> ((s, dir) => {
      val sh = Tables.table(s, dir, "documents")
        .filter(col("source").isin("src0", "src1"))
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .filter(size(col("toks")) >= 3)
        .select(col("source"),
          explode(array_distinct(expr(
            "transform(sequence(0, size(toks) - 3), i -> " +
            "concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("sh"))
        .distinct()
      val ex = sh.groupBy("sh").agg(countDistinct(col("source")).as("ns"))
        .agg(count(lit(1)).as("union_exact"),
             sum(when(col("ns") === 2, 1L).otherwise(0L)).as("inter_exact"))
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("n")).agg(
        max(when(col("source") === "src0", col("n"))).as("n_a"),
        max(when(col("source") === "src1", col("n"))).as("n_b"))
      val hashes = sh.select(col("source"), h60("kmvset", col("sh")).as("h"))
      val kk = hashes.select("h").distinct().orderBy("h").limit(KmvSetK)
      val sk = kk.agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      val both = kk.join(hashes, "h").groupBy("h")
        .agg(countDistinct(col("source")).as("ns"))
        .agg(sum(when(col("ns") === 2, 1L).otherwise(0L)).as("c_both"))
      sizes.crossJoin(broadcast(ex)).crossJoin(broadcast(sk))
        .crossJoin(broadcast(both))
        .withColumn("union_est",
          when(col("n_kept") < KmvSetK, col("union_exact").cast("double"))
            .otherwise(lit((KmvSetK - 1).toDouble) * expr("power(2, 60)")
              / col("hk")))
        .withColumn("jacc_est", col("c_both").cast("double") / col("n_kept"))
        .withColumn("inter_est", col("jacc_est") * col("union_est"))
        .select(col("n_a"), col("n_b"), col("union_exact"),
          col("inter_exact"), col("n_kept"), col("union_est"),
          col("jacc_est"), col("inter_est"))
    })
  )

  private val baseOracle: Map[String, String] = Map(
    "q150_cms_heavy" -> s"""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents),
      slotted AS (
        SELECT tok, dd.depth,
               ${h60Sql("cms", "CAST(dd.depth AS VARCHAR) || '_' || tok")}
                 % $CmsWidth AS slot
        FROM toks, UNNEST([0, 1, 2]) AS dd(depth)),
      cells AS (SELECT depth, slot, count(*) AS c
                FROM slotted GROUP BY 1, 2),
      cnts AS (SELECT tok, count(*) AS true_cnt FROM toks GROUP BY tok),
      probes AS (
        SELECT c2.tok, dd.depth,
               ${h60Sql("cms", "CAST(dd.depth AS VARCHAR) || '_' || c2.tok")}
                 % $CmsWidth AS slot
        FROM cnts c2, UNNEST([0, 1, 2]) AS dd(depth)),
      est AS (
        SELECT p.tok, min(c.c) AS est
        FROM probes p JOIN cells c
          ON p.depth = c.depth AND p.slot = c.slot
        GROUP BY p.tok),
      tot AS (SELECT count(*) AS n_total FROM toks)
      SELECT e.tok AS token, e.est, c.true_cnt
      FROM est e JOIN cnts c ON e.tok = c.tok, tot
      WHERE e.est * 1000 >= tot.n_total""",

    "q151_hll_distinct" -> s"""
      WITH h AS (
        SELECT source, ${h60Sql("hll", "text")} AS h FROM documents),
      r AS (
        SELECT source, h % $HllM AS reg,
               CASE WHEN (h // $HllM) = 0 THEN 55
                    ELSE 55 - length(bin(h // $HllM)) END AS rank
        FROM h),
      regs AS (SELECT source, reg, max(rank) AS m
               FROM r GROUP BY 1, 2),
      agg AS (
        SELECT source, count(*) AS n_reg,
               sum(CAST(power(2, 55 - m) AS BIGINT)) AS ssum
        FROM regs GROUP BY source),
      exact AS (SELECT source, count(DISTINCT text) AS exact_cnt
                FROM documents GROUP BY source),
      raw AS (
        SELECT a.source, a.n_reg,
               0.709 * power(2, 67)
                 / (a.ssum + ($HllM - a.n_reg)
                    * CAST(power(2, 55) AS BIGINT)) AS e_raw,
               $HllM - a.n_reg AS v, e.exact_cnt
        FROM agg a JOIN exact e ON a.source = e.source)
      SELECT source, n_reg,
             round(CASE WHEN e_raw <= ${2.5 * HllM} AND v > 0
                        THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v)
                        ELSE e_raw END, 4) AS est,
             exact_cnt
      FROM raw""",

    "q154_bottomk_distinct" -> s"""
      WITH dh AS (
        SELECT DISTINCT source, ${h60Sql("kmv", "text")} AS h
        FROM documents),
      bk AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM dh QUALIFY rk <= $KmvK),
      agg AS (SELECT source, count(*) AS n_kept, max(h) AS hk
              FROM bk GROUP BY source),
      exact AS (SELECT source, count(DISTINCT text) AS exact_cnt
                FROM documents GROUP BY source)
      SELECT a.source, a.n_kept,
             CASE WHEN a.n_kept < $KmvK THEN CAST(e.exact_cnt AS DOUBLE)
                  ELSE round(${(KmvK - 1).toDouble} * power(2, 60) / a.hk, 4)
             END AS est,
             e.exact_cnt
      FROM agg a JOIN exact e ON a.source = e.source""",

    "q152_weighted_sample" -> s"""
      SELECT doc_id, n_chars,
             ${h60Sql("ws", "CAST(doc_id AS VARCHAR)")}
                   / n_chars AS priority
      FROM documents
      WHERE n_chars > 0
      ORDER BY ${h60Sql("ws", "CAST(doc_id AS VARCHAR)")} / n_chars, doc_id
      LIMIT 50""",

    "q153_length_model" -> """
      WITH feats AS (
        SELECT doc_id, lang,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS x,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS y
        FROM documents),
      m0 AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM feats),
      m AS (
        SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS a,
               n, sx, sy
        FROM m0),
      m2 AS (
        SELECT a,
               (CAST(sy AS DOUBLE) - a * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) AS b
        FROM m),
      scored AS (
        SELECT f.lang,
               CASE WHEN abs(CAST(f.y AS DOUBLE)
                             - (m2.a * CAST(f.x AS DOUBLE) + m2.b))
                         > 0.25 * (m2.a * CAST(f.x AS DOUBLE) + m2.b)
                    THEN 1 ELSE 0 END AS outlier,
               m2.a, m2.b
        FROM feats f, m2)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(outlier) AS BIGINT) AS n_outliers,
             round(any_value(a), 6) AS a, round(any_value(b), 6) AS b
      FROM scored GROUP BY lang""",

    "q174_sliding_distinct" -> s"""
      WITH e AS (
        SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                 - DATE '2024-01-01' AS BIGINT) AS dayn,
               user_id
        FROM events),
      h AS (
        SELECT dayn, ${h60Sql("hllu", "CAST(user_id AS VARCHAR)")} AS h
        FROM e),
      r AS (
        SELECT dayn, h % $HllM AS reg,
               CASE WHEN (h // $HllM) = 0 THEN 55
                    ELSE 55 - length(bin(h // $HllM)) END AS rank
        FROM h),
      regs AS (SELECT dayn, reg, max(rank) AS m FROM r GROUP BY 1, 2),
      winregs AS (
        SELECT g.wd, reg, max(m) AS m
        FROM regs, UNNEST(generate_series(dayn, least(dayn + 6, 29)))
          AS g(wd)
        GROUP BY 1, 2),
      agg AS (
        SELECT wd, count(*) AS n_reg,
               sum(CAST(power(2, 55 - m) AS BIGINT)) AS ssum
        FROM winregs GROUP BY wd),
      exact AS (
        SELECT g.wd, count(DISTINCT user_id) AS exact_cnt
        FROM (SELECT DISTINCT dayn, user_id FROM e) u,
             UNNEST(generate_series(dayn, least(dayn + 6, 29))) AS g(wd)
        GROUP BY 1),
      raw AS (
        SELECT a.wd, a.n_reg,
               0.709 * power(2, 67)
                 / (a.ssum + ($HllM - a.n_reg)
                    * CAST(power(2, 55) AS BIGINT)) AS e_raw,
               $HllM - a.n_reg AS v, x.exact_cnt
        FROM agg a JOIN exact x ON a.wd = x.wd)
      SELECT wd AS day_index, n_reg,
             round(CASE WHEN e_raw <= ${2.5 * HllM} AND v > 0
                        THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v)
                        ELSE e_raw END, 4) AS est,
             exact_cnt
      FROM raw""",

    "q163_hist_quantile" -> s"""
      WITH e AS (
        SELECT event_type, value,
               CAST(floor(value * $HistScale) AS BIGINT) + 1 AS n
        FROM events),
      b AS (
        SELECT event_type, CAST(length(bin(n)) AS BIGINT) AS bucket,
               count(*) AS c
        FROM e GROUP BY 1, 2),
      c AS (
        SELECT event_type, bucket, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
               sum(c) OVER (PARTITION BY event_type) AS total
        FROM b),
      ests AS (
        SELECT event_type, count(*) AS n_buckets,
               min(CASE WHEN cum * 100 >= total * 50 THEN bucket END) AS b50,
               min(CASE WHEN cum * 100 >= total * 90 THEN bucket END) AS b90,
               min(CASE WHEN cum * 100 >= total * 99 THEN bucket END) AS b99
        FROM c GROUP BY 1),
      exact AS (
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY 1)
      SELECT s.event_type, s.n_buckets,
             (power(2, s.b50) - 1.0) / ${HistScale.toDouble} AS p50_est,
             (power(2, s.b90) - 1.0) / ${HistScale.toDouble} AS p90_est,
             (power(2, s.b99) - 1.0) / ${HistScale.toDouble} AS p99_est,
             x.p50, x.p90, x.p99
      FROM ests s JOIN exact x ON s.event_type = x.event_type""",

    "q164_kmv_setops" -> s"""
      WITH toks AS (
        SELECT source, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents WHERE source IN ('src0', 'src1')),
      sh AS (
        SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        WHERE len(t) >= 3),
      ex AS (
        SELECT count(*) AS union_exact,
               CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS inter_exact
        FROM (SELECT sh, count(DISTINCT source) AS ns FROM sh GROUP BY sh)),
      sz AS (
        SELECT max(CASE WHEN source = 'src0' THEN n END) AS n_a,
               max(CASE WHEN source = 'src1' THEN n END) AS n_b
        FROM (SELECT source, count(*) AS n FROM sh GROUP BY source)),
      h AS (SELECT source, ${h60Sql("kmvset", "sh")} AS h FROM sh),
      kk AS (SELECT DISTINCT h FROM h ORDER BY h LIMIT $KmvSetK),
      sk AS (SELECT count(*) AS n_kept, max(h) AS hk FROM kk),
      cb AS (
        SELECT CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS c_both
        FROM (SELECT kk.h, count(DISTINCT source) AS ns
              FROM kk JOIN h ON kk.h = h.h GROUP BY kk.h))
      SELECT sz.n_a, sz.n_b, ex.union_exact, ex.inter_exact, sk.n_kept,
             CASE WHEN sk.n_kept < $KmvSetK
                  THEN CAST(ex.union_exact AS DOUBLE)
                  ELSE ${(KmvSetK - 1).toDouble} * power(2, 60) / sk.hk
             END AS union_est,
             CAST(cb.c_both AS DOUBLE) / sk.n_kept AS jacc_est,
             (CAST(cb.c_both AS DOUBLE) / sk.n_kept)
               * (CASE WHEN sk.n_kept < $KmvSetK
                       THEN CAST(ex.union_exact AS DOUBLE)
                       ELSE ${(KmvSetK - 1).toDouble} * power(2, 60) / sk.hk
                  END) AS inter_est
      FROM sz, ex, sk, cb"""
  )

  /** q265/q282 stream to the identical register/cell tables their batch
    * siblings build, so their oracles are q151's/q150's SQL verbatim. */
  val oracle: Map[String, String] =
    baseOracle +
      ("q265_stream_hll" -> baseOracle("q151_hll_distinct")) +
      ("q282_stream_cms" -> baseOracle("q150_cms_heavy"))
}
