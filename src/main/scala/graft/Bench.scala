package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Timing includes plan + execute;
  * results are drained with count() so the full pipeline runs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.init(spark)
    // Warm the JVM/codegen paths once on the smallest table so per-query
    // numbers measure the engine, not first-call classloading.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
      (name, dt, ok)
    }
    // Failed queries are excluded from per-query timings and the total and
    // reported by name in "failed" — never encoded as timing data.
    val qs = results.collect { case (k, v, true) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
