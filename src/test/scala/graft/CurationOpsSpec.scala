package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationOps

/** Round-9 curation operators: TF-IDF pair similarity, per-source
  * capping, character entropy, canonical-doc selection. Each check is an
  * INDEPENDENT recomputation (local Scala on collected raw text) or a
  * structural invariant — not a rerun of the operator's own plan. */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q270 tf-idf: pair cosine matches a local dense recomputation") {
    val got = CurationOps.queries("q270_tfidf_pairs")(spark, dir)
      .select("da", "db", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(c => c > 0.0 && c <= 1.0 + 1e-9))
    assert(got.keys.forall { case (a, b) => a < b })

    // local dense recompute of the integer-milli-nat weighting for the
    // highest-cosine pair
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = docs.size.toDouble
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq
    val tf: Map[Long, Map[String, Long]] =
      docs.map { case (id, t) =>
        id -> toks(t).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      }
    val df: Map[String, Long] = tf.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def w(id: Long): Map[String, Long] =
      tf(id).map { case (t, f) =>
        t -> f * math.round(math.log(n / df(t)) * 1000)
      }
    val (da, db) = got.maxBy(_._2)._1
    val (wa, wb) = (w(da), w(db))
    val joinable = (t: String) => df(t) >= 2 && df(t) <= 500
    val num = wa.keySet.intersect(wb.keySet).filter(joinable)
      .toSeq.map(t => wa(t) * wb(t)).sum
    def norm2(m: Map[String, Long]): Long = m.values.map(v => v * v).sum
    val expect = num.toDouble / (math.sqrt(norm2(wa).toDouble) *
      math.sqrt(norm2(wb).toDouble))
    assert(math.abs(got((da, db)) - expect) < 1e-6)
  }

  test("q273 entropy: one document matches a local recomputation") {
    val rows = CurationOps.queries("q273_char_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    val (docId, counts) = Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect().iterator
      .map { r =>
        r.getLong(0) -> r.getString(1).toLowerCase
          .filter(c => c >= 'a' && c <= 'z')
          .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      }
      .find(_._2.nonEmpty).get
    val nl = counts.values.sum
    val total = counts.values.map { c =>
      c * math.round(-math.log(c.toDouble / nl) * 1000)
    }.sum
    val (gNl, gDistinct, gTotal, gH) = rows(docId)
    assert(gNl == nl && gDistinct == counts.size &&
      gTotal == total && gH == total / nl)
  }

  test("q272 source cap: budgets are consistent and capped") {
    val rows = CurationOps.queries("q272_source_cap")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nKept, nDropped) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
         r.getAs[Long]("n_dropped"))
      assert(nKept <= 1000 && nKept + nDropped == nDocs)
    }
    val direct = Tables.table(spark, dir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("n_docs")).toMap == direct)
  }

  test("q272 with a binding cap: keep/drop accounting matches a local rank") {
    val key = "spark.graft.sourceCap"
    spark.conf.set(key, "5") // ~25 docs/source at this scale: drops bind
    try {
      val rows = CurationOps.queries("q272_source_cap")(spark, dir).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"),
           r.getAs[Long]("kept_chars"), r.getAs[Long]("min_kept_chars"))).toMap
      // independent local recomputation of the rank-based definition
      val docs = Tables.table(spark, dir, "documents")
        .select("source", "doc_id", "n_chars").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val expected = docs.groupBy(_._1).map { case (src, ds) =>
        val kept = ds.sortBy(d => (-d._3, d._2)).take(5)
        src -> (kept.size.toLong, (ds.size - kept.size).toLong,
                kept.map(_._3).sum, kept.map(_._3).min)
      }
      assert(rows == expected)
      assert(rows.values.exists(_._2 > 0), "cap must actually drop docs")
    } finally spark.conf.unset(key)
  }

  test("q295/q296 vocabulary: coverage and head match a local tally") {
    val texts = Tables.table(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val total = counts.values.sum
    val ordered = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val cums = ordered.scanLeft(0L)(_ + _._2).tail

    val cov = CurationOps.queries("q295_vocab_coverage")(spark, dir)
      .collect().map(r => r.getAs[Long]("threshold_pm") ->
        (r.getAs[Long]("vocab_size"), r.getAs[Long]("covered"),
         r.getAs[Long]("total_toks"))).toMap
    Seq(500L, 800L, 900L, 950L, 990L).foreach { t =>
      val vs = cums.count(_ * 1000 < t * total) + 1
      val covered = cums.find(_ * 1000 >= t * total).get
      assert(cov(t) == (vs.toLong, covered, total), s"threshold $t")
    }
    val head = CurationOps.queries("q296_zipf_head")(spark, dir)
      .collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("cnt"),
        r.getAs[Long]("rnk"), r.getAs[Long]("freq_ppm")))
    assert(head.length == 20)
    val expHead = ordered.take(20).zipWithIndex.map { case ((t, c), i) =>
      (t, c, i + 1L, c * 1000000 / total) }
    assert(head.sortBy(_._3).toSeq == expHead)
  }

  test("q297 incremental dedup: accounting matches a local base/delta replay") {
    val got = CurationOps.queries("q297_incremental_dedup")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_delta"), r.getAs[Long]("n_vs_base"),
         r.getAs[Long]("n_within"), r.getAs[Long]("n_ingested"),
         r.getAs[Long]("ingested_chars"))).toMap
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
      .map { r =>
        val dig = r.getString(3).trim.toLowerCase.split("\\s+")
          .take(10).mkString(" ")
        (r.getLong(0), r.getString(1), r.getLong(2), dig)
      }
    val base = docs.filter(_._1 % 3 != 0).map(_._4).toSet
    val delta = docs.filter(_._1 % 3 == 0)
    val keep = delta.filterNot(d => base(d._4))
      .groupBy(_._4).map { case (_, ds) => ds.minBy(_._1) }.toSet
    val expected = delta.groupBy(_._2).map { case (src, ds) =>
      val vsBase = ds.count(d => base(d._4))
      val ingested = ds.filter(keep)
      src -> (ds.size.toLong, vsBase.toLong,
        (ds.size - vsBase - ingested.size).toLong, ingested.size.toLong,
        ingested.map(_._3).sum)
    }
    assert(got == expected)
    assert(got.values.map(_._1).sum > 0)
    // the fixture's shared prefixes make BOTH drop branches bind
    assert(got.values.map(_._2).sum > 0, "vs-base drops must bind")
    assert(got.values.map(_._3).sum > 0, "within-delta drops must bind")
  }

  test("q300 PSI and q301 KL match local recomputations") {
    // PSI: replay one event type's binning locally
    val psi = CurationOps.queries("q300_psi_drift")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
         r.getAs[Long]("psi_unat"))).toMap
    val evs = Tables.table(spark, dir, "events")
      .selectExpr("event_type", "CAST(floor(value * 100) AS LONG) AS cents",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS tus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val split = (evs.map(_._3).min + evs.map(_._3).max) / 2
    val tpe = psi.keys.min
    val rows = evs.filter(_._1 == tpe)
    val a = rows.filter(_._3 <= split).map(_._2)
    val b = rows.filter(_._3 > split).map(_._2)
    val (lo, hi) = (a.min, a.max)
    def bin(c: Long) = math.min(9L, ((math.min(hi, math.max(lo, c)) - lo) * 10)
      / (hi - lo + 1))
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val expPsi = (0L to 9L).map { k =>
      val ca = a.count(bin(_) == k); val cb = b.count(bin(_) == k)
      val pa = (ca + 1).toDouble / (na + 10)
      val pb = (cb + 1).toDouble / (nb + 10)
      math.round((pb - pa) * math.log(pb / pa) * 1e6)
    }.sum
    assert(psi(tpe) == (na, nb, expPsi))
    assert(psi.values.exists(_._3 != 0L), "PSI must detect some drift")

    // KL: replay one source's clipped divergence locally
    val kl = CurationOps.queries("q301_source_divergence")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_types"),
         r.getAs[Long]("kl_unat"))).toMap
    val toks = Tables.table(spark, dir, "documents")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+")
        .map(r.getString(0) -> _))
    val corpus = toks.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val (vCnt, nTot) = (corpus.size.toLong, toks.length.toLong)
    val src = kl.keys.min
    val mine = toks.filter(_._1 == src).groupBy(_._2)
      .map { case (t, v) => t -> v.size.toLong }
    val ns = mine.values.sum
    val expKl = mine.map { case (t, c) =>
      val ps = (c + 1).toDouble / (ns + vCnt)
      val pc = (corpus(t) + 1).toDouble / (nTot + vCnt)
      math.round(ps * math.log(ps / pc) * 1e6)
    }.sum
    assert(kl(src) == (ns, mine.size.toLong, expKl))
  }

  test("q271 canonical docs: clusters partition the corpus exactly") {
    val rows = graft.operators.PipelineOps
      .queries("q271_canonical_docs")(spark, dir).collect()
    val nDocs = Tables.table(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("csize")).sum == nDocs)
    val keepers = rows.map(_.getAs[Long]("keeper"))
    assert(keepers.distinct.length == keepers.length)
    // the keeper really is the arg-max-chars / min-id member: for every
    // singleton cluster the keeper is the cluster label itself
    rows.filter(_.getAs[Long]("csize") == 1L).foreach { r =>
      assert(r.getAs[Long]("keeper") == r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("dropped_chars") == 0L)
    }
  }

  test("q302 split: cluster-level assignment with zero near-dup leakage") {
    val got = graft.operators.PipelineOps
      .queries("q302_leakage_safe_split")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("total_chars"))).toMap
    val clusterOf = graft.operators.PipelineOps
      .queries("q129_dup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def split(c: Long) = if ((c * 2654435761L) % 1000 < 100) "eval" else "train"
    val local = docs.map { case (id, nc) =>
      val c = clusterOf.getOrElse(id, id); (split(c), c, nc)
    }
    val expected = local.groupBy(_._1).map { case (s, rows) =>
      s -> (rows.size.toLong, rows.map(_._2).distinct.size.toLong,
            rows.map(_._3).sum)
    }
    assert(got == expected)
    assert(got.keySet == Set("train", "eval"), "both splits populated")
    // zero leakage: every near-dup cluster lands wholly in one split
    local.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._1).distinct.size == 1,
        s"cluster split across train/eval: $members")
    }
  }

  test("q290 source-overlap matrix is symmetric-consistent and bounded") {
    val rows = CurationOps.queries("q290_source_overlap")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (common, na, nb, j) =
        (r.getAs[Long]("common"), r.getAs[Long]("n_a"),
         r.getAs[Long]("n_b"), r.getAs[Double]("jaccard"))
      assert(r.getAs[String]("sa") < r.getAs[String]("sb"))
      assert(common <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q276 async lookup equals the broadcast-join dual") {
    val got = graft.operators.MoreOps
      .queries("q276_async_lookup")(spark, dir)
    val dual = Tables.table(spark, dir, "events")
      .join(broadcast(Tables.table(spark, dir, "customer")),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_nationkey"))
    assert(got.count() == dual.count())
    assert(got.except(dual).isEmpty && dual.except(got).isEmpty)
  }
}
