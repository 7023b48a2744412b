package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * One-off scaling probe for the queries whose 100x behavior rests on a
 * tuning constant rather than a measured point — currently
 * q37_ngram_jaccard, whose shingle-DF cap (spark.graft.shingleDfCap)
 * bounds the self-join hot keys and which holds the scaling band's
 * worst sf0.01→sf0.1 ratio.
 *
 * Builds a synthetic 10x corpus from the given sf dir by unioning ten
 * copies of `documents` with every token suffixed by the copy index:
 * within-copy shingle structure (and thus DF distribution and true
 * near-dup pairs) is preserved exactly, while cross-copy overlap is
 * zero — so the 10x corpus behaves like ten independent corpora and
 * ideal scaling is linear. (A plain 10x union of identical copies would
 * manufacture 10-clone dup groups and a quadratic pair blowup that says
 * nothing about the algorithm.)
 *
 * Prints one JSON line: base/10x wall seconds, the ratio, and the cap.
 * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleProbe"
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.init(spark)

    // Stage the synthetic 10x documents dir, keeping every column the
    // probed operators read (lang/source/n_chars pass through; only the
    // text is copy-suffixed so cross-copy shingle overlap is zero).
    val root = Files.createTempDirectory("graft_scaleprobe").toString
    val docs = Tables.table(spark, sfDir, "documents")
    val copies = (0 until 10).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
        concat_ws(" ", transform(split(trim(col("text")), "\\s+"),
          t => concat(t, lit(s"_$i")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$root/documents.parquet")
    // 10x embeddings for the vector-moment probes (identical vectors:
    // their operators are single-scan aggregates with no pair space to
    // distort, so the copy only multiplies rows)
    val emb = Tables.table(spark, sfDir, "embeddings")
    (0 until 10).map { i =>
      emb.select((col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$root/embeddings.parquet")

    def time(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Probes: every multi-second batch operator whose scaling-band
    // ratio exceeded 3x, plus the two DF-cap pair operators — the
    // per-copy token suffixing preserves each cap's within-copy DF
    // structure while zeroing cross-copy overlap, so ideal is linear.
    val probes = Seq(
      "q37_ngram_jaccard", "q270_tfidf_pairs",
      "q129_dup_clusters", "q271_canonical_docs",   // trigram edges + CC
      "q247_substring_dedup",                       // winnowing spans
      "q262_gopher_rules",                          // quality battery
      "q286_embedding_gram", "q290_source_overlap", // moments / digests
      "q158_bpe_pairs",                             // char-pair top-20
      "q249_dsir_weights",                          // hashed-bucket imp. wts
      "q149_winnow_pairs")                          // winnow digest pairs
    val parts = probes.map { q =>
      // Warm codegen/classloading on the small base before timing.
      time(q, sfDir)
      val base = time(q, sfDir)
      val x10 = time(q, root)
      f""""$q":{"base_sec":$base%.2f,"x10_sec":$x10%.2f,"ratio":${x10 / base}%.2f}"""
    }
    val shCap = spark.conf.getOption("spark.graft.shingleDfCap").getOrElse("500")
    val tmCap = spark.conf.getOption("spark.graft.termDfCap").getOrElse("500")
    println(s"""{"sf_dir":"$sfDir","shingle_cap":$shCap,"term_cap":$tmCap,${parts.mkString(",")}}""")
    spark.stop()
  }
}
