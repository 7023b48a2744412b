package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchOps

/**
 * Invariant checks for the mergeable-sketch family (SketchOps) on the
 * sf0.001 fixture — the value-exact oracle runs at sf0.01 via the
 * driver; these specs assert the STRUCTURAL guarantees each sketch
 * carries by construction (the properties a user relies on at 100 TB
 * where no exact answer exists to compare against).
 */
class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SketchOps.queries.getOrElse(name,
      graft.operators.TextOps.queries(name))(spark, dir)

  test("cms: estimate never under-counts (one-sided error), and reported " +
    "heavy hitters clear the threshold") {
    val rows = run("q150_cms_heavy").collect()
    assert(rows.nonEmpty, "fixture has frequent tokens")
    rows.foreach { r =>
      val est = r.getAs[Long]("est")
      val cnt = r.getAs[Long]("true_cnt")
      assert(est >= cnt,
        s"CMS must only over-count: token=${r.getAs[String]("token")} " +
          s"est=$est true=$cnt")
    }
  }

  test("hll: per-source estimate lands within 3 standard errors " +
    "(1.04/sqrt(64) ~ 13%) of the exact distinct count") {
    val rows = run("q151_hll_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact_cnt").toDouble
      assert(math.abs(est - exact) / exact <= 0.39,
        s"source=${r.getAs[String]("source")} est=$est exact=$exact")
      assert(r.getAs[Long]("n_reg") <= 64)
    }
  }

  test("bottom-k: estimate within 3 standard errors (1/sqrt(30) ~ 18%) " +
    "when the sketch is full; exact when not") {
    val rows = run("q154_bottomk_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact_cnt").toDouble
      if (r.getAs[Long]("n_kept") == 32)
        assert(math.abs(est - exact) / exact <= 0.55,
          s"source=${r.getAs[String]("source")} est=$est exact=$exact")
      else assert(est == exact)
    }
  }

  test("weighted sample: deterministic, bounded, priority-ordered") {
    val a = run("q152_weighted_sample").collect()
    val b = run("q152_weighted_sample").collect()
    assert(a.length == 50 && a.toSeq == b.toSeq)
    val prios = a.map(_.getAs[Double]("priority")).toSeq
    assert(prios == prios.sorted, "ascending priority order")
  }

  test("length model: positive slope, outliers are a strict minority " +
    "in every language") {
    val rows = run("q153_length_model").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("a") > 0, "BPE count grows with token count")
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n_docs"))
    }
  }

  test("winnow_fp_set agrees with winnow_fp on size/min/max per document") {
    import org.apache.spark.sql.graftbridge.Bridge
    val fp = Bridge.column(graft.plans.WinnowFp(
      Bridge.expression(col("text")), k = 8, w = 16))
    val fpSet = Bridge.column(graft.plans.WinnowFpSet(
      Bridge.expression(col("text")), k = 8, w = 16))
    val bad = Tables.table(spark, dir, "documents")
      .filter(length(col("text")) >= 8)
      .select(fp.as("fp"), fpSet.as("set"))
      .filter(!(col("fp.n_fp") === size(col("set")) &&
        col("fp.fp_min") === element_at(col("set"), 1) &&
        col("fp.fp_max") === element_at(col("set"), -1) &&
        col("set") === array_sort(col("set"))))
      .count()
    assert(bad == 0L)
  }

  test("HllDistinct aggregator equals the SQL-composed q151 estimate " +
    "per source (batch == sketch-state path)") {
    import spark.implicits._
    val agg = new graft.functions.Sketches.HllDistinct().toColumn
    val got = Tables.table(spark, dir, "documents")
      .select(col("source"), col("text")).as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("est"))
      .toDF("source", "est")
      .withColumn("est", round(col("est"), 4))
    val exp = run("q151_hll_distinct").select("source", "est")
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("CmsSketch aggregator: estimates match q150 for every reported " +
    "heavy hitter, and merged partial sketches equal the global sketch") {
    import spark.implicits._
    val toks = Tables.table(spark, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .as[String]
    val cells = toks.groupByKey(_ => 0)
      .agg(new graft.functions.Sketches.CmsSketch().toColumn.name("cells"))
      .collect().head._2
    // partition the stream two ways, sketch each half, merge
    val Array(h1, h2) = toks.randomSplit(Array(0.5, 0.5), seed = 7)
    def sk(d: org.apache.spark.sql.Dataset[String]) = d.groupByKey(_ => 0)
      .agg(new graft.functions.Sketches.CmsSketch().toColumn.name("c"))
      .collect().headOption.map(_._2)
      .getOrElse(new Array[Long](graft.functions.Sketches.CmsDepth
        * graft.functions.Sketches.CmsWidth))
    val merged = new graft.functions.Sketches.CmsSketch().merge(sk(h1), sk(h2))
    assert(merged.toSeq == cells.toSeq, "sketch merge is lossless")
    run("q150_cms_heavy").collect().foreach { r =>
      val est = graft.functions.Sketches.cmsEstimate(
        cells, r.getAs[String]("token"))
      assert(est == r.getAs[Long]("est"),
        s"token=${r.getAs[String]("token")}")
    }
  }

  test("streaming HLL: per-source sketch state across micro-batches " +
    "converges to the batch estimate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sc = spark.sqlContext
    val rows = Tables.table(spark, dir, "documents")
      .select(col("source"), col("text")).as[(String, String)]
      .collect().toSeq
    val mem = MemoryStream[(String, String)]
    val q = mem.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.Sketches.HllDistinct().toColumn.name("est"))
      .toDF("source", "est")
      .writeStream.format("memory").queryName("s_hll")
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(200).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s_hll").withColumn("est", round(col("est"), 4))
    val exp = run("q151_hll_distinct").select("source", "est")
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("q149 pairs: containment bounded by 1, keys ordered da < db") {
    val rows = run("q149_winnow_pairs").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.5 && c <= 1.0)
      assert(r.getAs[Long]("shared") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
  }

  test("hist quantile: estimate is the containing bucket's upper bound of " +
    "the ceil-rank order statistic — within [v - 1/16, 2v + 2/16]") {
    // the histogram's rank convention is "smallest bucket with
    // cum ≥ ⌈q·n⌉" — compare against the order statistic at that SAME
    // rank (quantile_cont's (n−1)·q interpolation can sit a row lower,
    // which in a heavy tail is a different value)
    val byType = Tables.table(spark, dir, "events")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted }
    val rows = run("q163_hist_quantile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vals = byType(r.getAs[String]("event_type"))
      Seq(50, 90, 99).foreach { q =>
        val est = r.getAs[Double](s"p${q}_est")
        val rank = math.ceil(q * vals.length / 100.0).toInt max 1
        val v = vals(rank - 1)
        // v lands in the bucket [2^(b-1), 2^b) of n = floor(16v)+1, and
        // est = (2^b − 1)/16 ⇒ est ≥ v − 1/16 and est ≤ 2v + 2/16
        assert(est >= v - 0.0626, s"p$q est=$est below rank-exact=$v")
        assert(est <= 2 * v + 0.126, s"p$q est=$est above 2x rank-exact=$v")
      }
      // constant state: power-of-two buckets over values ≤ ~500 means
      // ≤ 14 counters per group no matter the row count
      assert(r.getAs[Long]("n_buckets") <= 14)
    }
  }

  test("streaming histogram: bucket counts maintained across micro-batches " +
    "equal the batch histogram (the mergeable state the quantile reads)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sc = spark.sqlContext
    val ev = Tables.table(spark, dir, "events")
      .select(col("event_type"), col("value")).as[(String, Double)]
      .collect().toSeq
    def bucketed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("n", floor(col("value") * 16).cast("long") + 1)
      .withColumn("bucket", length(expr("bin(n)")).cast("long"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
    val mem = MemoryStream[(String, Double)]
    val q = bucketed(mem.toDF().toDF("event_type", "value"))
      .writeStream.format("memory").queryName("s_hist")
      .outputMode(OutputMode.Complete).start()
    try {
      ev.grouped(250).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("s_hist")
    val exp = bucketed(Tables.table(spark, dir, "events"))
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("streaming per-day HLL registers equal the batch register table " +
    "(the mergeable state q174's sliding union reads)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sc = spark.sqlContext
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")).cast("long").as("dayn"),
        conv(substring(md5(concat(lit("hllu:"),
          col("user_id").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .withColumn("reg", pmod(col("h"), lit(64)))
      .withColumn("rem", expr("h div 64"))
      .withColumn("rank", when(col("rem") === 0, lit(55))
        .otherwise(lit(55) - length(expr("bin(rem)"))))
      .groupBy("dayn", "reg").agg(max(col("rank")).as("m"))
    val rows = Tables.table(spark, dir, "events")
      .select(col("ts"), col("user_id"))
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = regs(mem.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("s_dayregs")
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(250).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("s_dayregs")
    val exp = regs(Tables.table(spark, dir, "events"))
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("kmv set ops: jaccard and union estimates land within 3 standard " +
    "errors of exact; intersection = jaccard x union by construction") {
    val r = run("q164_kmv_setops").collect().head
    val unionExact = r.getAs[Long]("union_exact").toDouble
    val interExact = r.getAs[Long]("inter_exact").toDouble
    val jaccExact = interExact / unionExact
    val k = r.getAs[Long]("n_kept").toDouble
    assert(k > 0)
    val jaccEst = r.getAs[Double]("jacc_est")
    val unionEst = r.getAs[Double]("union_est")
    // Jaccard: binomial over k retained hashes
    val sigJ = math.sqrt(jaccExact * (1 - jaccExact) / k) max 0.005
    assert(math.abs(jaccEst - jaccExact) <= 3 * sigJ + 1.0 / k,
      s"jacc est=$jaccEst exact=$jaccExact")
    // Union: KMV relative error ~ 1/sqrt(k-1)
    assert(math.abs(unionEst - unionExact) / unionExact
             <= 3.0 / math.sqrt(k - 1),
      s"union est=$unionEst exact=$unionExact")
    assert(math.abs(r.getAs[Double]("inter_est") - jaccEst * unionEst)
             <= 1e-9)
  }
}
