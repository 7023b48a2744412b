package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named queries to
  * `plans/<round>/<query>_<suffix>.txt` (guide §7.2) — the audit trail
  * for optimization rounds. Round and suffix come from
  * SPARK_GRAFT_PLAN_DIR / SPARK_GRAFT_PLAN_SUFFIX. Measurement tooling
  * only; not part of the driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r17")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.init(spark)
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries
    args.foreach { name =>
      val df = qs(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"), txt.getBytes)
      println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
