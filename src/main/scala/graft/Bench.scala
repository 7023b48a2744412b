package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Timing includes plan + execute;
  * results are drained with a noop sink so the full pipeline runs.
  *
  * Each query runs REPS (3) times in the same JVM and we report the
  * per-query MEDIAN (plus min). This host shows 3x co-tenant load spikes
  * (BASELINE.md); single-sample timing manufactured phantom 32-56x
  * regressions in round 4. Median-of-3 inside one JVM is robust to a
  * single spike and still measures steady-state (post-codegen) cost.
  *
  * `baseline62` is the subtotal of medians over the round-2 query set that
  * BASELINE.md's 106-138 s band was recorded on, so the 2x regression gate
  * compares like with like as the query count grows.
  */
object Bench {
  /** Query set of the round-2 BASELINE.md measurement (62-query band). */
  private val baselineSet: Set[String] = Set(
    "q01_tpch1", "q02_agg_distinct", "q03_rollup", "q04_cube",
    "q05_grouping_sets", "q06_stats_agg", "q07_join_inner", "q08_join_left",
    "q09_join_full", "q10_semijoin", "q11_antijoin", "q12_nonequi",
    "q13_cross", "q14_asof_join", "q15_topn_group", "q16_running_sum",
    "q17_leadlag", "q18_range_frame", "q19_ntile", "q20_first_last",
    "q21_toplimit", "q22_union", "q23_intersect", "q24_except", "q25_tumble",
    "q26_hop", "q27_session", "q28_interval_join", "q29_dedup_first",
    "q30_json_props", "q31_scalar_string", "q32_scalar_math",
    "q33_scalar_time", "q34_text_stats", "q35_exact_dedup", "q36_langid",
    "q37_ngram_jaccard", "q38_cosine_topk", "q39_minhash_dedup",
    "q40_simhash", "q41_simhash_pairs", "q42_ann_lsh", "q43_ann_buckets",
    "q44_multimodal", "q45_agg_funcs", "q46_unnest", "q47_values",
    "q48_count_window", "q49_cep", "q50_connected_components",
    "q51_pagerank", "q52_label_propagation", "q53_formats",
    "q54_scalar_string2", "q55_single_value", "q56_count_tumble",
    "q57_window_join", "q58_lookup_join", "q60_tpch3", "q61_tpch5",
    "q62_tpch18", "q63_decimal", "q64_intersect_all", "q65_except_all")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.init(spark)
    // Warm the JVM/codegen paths once on the smallest table so per-query
    // numbers measure the engine, not first-call classloading.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Rep budget: repeat fast queries (median-of-3 beats one co-tenant
    // spike), but a query whose first rep already exceeds this is either
    // genuinely slow or spiked — repeating it just multiplies the damage
    // (round 6: one spiked query cost 3 × 85 s of wall clock). One sample
    // is recorded instead; the min/median distinction matters only for
    // queries cheap enough to repeat.
    val repBudgetSec =
      sys.env.getOrElse("SPARK_GRAFT_REP_BUDGET_SEC", "30").toDouble
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var rep = 0
      var failed = false
      var continue = true
      while (continue && rep < reps) {
        rep += 1
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // per-query isolation: cached frames from one query (LSH sigs,
        // graph edges) must not distort or starve the next
        spark.catalog.clearCache()
        if (ok) times += dt else failed = true
        if (dt > repBudgetSec || failed) continue = false
      }
      (name, times.sorted.toSeq)
    }
    // Failed queries (any rep failing drops that rep; all reps failed =
    // failed query) are excluded from timings and reported by name.
    def median(xs: Seq[Double]): Double = xs(xs.size / 2)
    val good = results.collect { case (k, ts) if ts.nonEmpty => (k, ts) }
    val qs = good.map { case (k, ts) => "\"" + k + f"\":${median(ts)}%.3f" }
      .mkString("{", ",", "}")
    val mins = good.map { case (k, ts) => "\"" + k + f"\":${ts.head}%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, ts) if ts.isEmpty => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = good.map { case (_, ts) => median(ts) }.sum
    val base62 = good.collect { case (k, ts) if baselineSet(k) => median(ts) }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$reps,"stat":"median","baseline62":$base62%.3f,"queries":$qs,"queries_min":$mins,"failed":$failed,"sf":"$sfDir"}""")
    // Scaling outliers (stderr, stdout stays one JSON line): compare this
    // run's per-query mins against the band's recorded sf0.01 mins
    // (tools/bench_band.py writes queries_small). 10x data puts linear
    // queries near 10x; >30x flags super-linear growth — the cheap local
    // proxy for the 100 TB question. The 0.05 s floor keeps fixed
    // per-job overhead from faking sub-linearity into the denominator.
    if (sfDir.endsWith("sf0.1")) {
      try {
        val bandPath = java.nio.file.Paths.get("BASELINE_QUERIES.json")
        if (java.nio.file.Files.exists(bandPath)) {
          val txt = java.nio.file.Files.readString(bandPath)
          "\"queries_small\"\\s*:\\s*\\{([^}]*)\\}".r.findFirstMatchIn(txt)
            .foreach { m =>
              val pair = "\"(q[0-9a-z_]+)\"\\s*:\\s*([0-9.]+)".r
              val small = pair.findAllMatchIn(m.group(1))
                .map(p => p.group(1) -> p.group(2).toDouble).toMap
              good.foreach { case (k, ts) =>
                small.get(k).foreach { s =>
                  val ratio = ts.head / math.max(s, 0.05)
                  if (ratio > 30.0) System.err.println(
                    f"BENCH SCALING OUTLIER $k: $ratio%.1fx for 10x data " +
                      f"(sf0.01 min $s%.3f s -> ${ts.head}%.3f s)")
                }
              }
            }
        }
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
