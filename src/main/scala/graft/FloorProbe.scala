package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the replay harness's per-micro-batch floor
  * (measurement tooling only, not part of the driver contract): runs
  * ONE streaming query over `SPARK_GRAFT_FLOOR_FILES` single-file
  * triggers so an external sampler (jstack loop) can histogram where
  * the stream thread spends the ~0.4 s/batch floor. Prints the wall
  * and per-batch mean, plus a SparkListener's sum of job wall time so
  * driver-side gap = batch time − job time is directly visible. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_FLOOR_FILES", "100").toInt
    val stateful = sys.env.getOrElse("SPARK_GRAFT_FLOOR_STATEFUL", "true").toBoolean
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.init(spark)
    sys.env.get("SPARK_GRAFT_PROFILE_CONFS").foreach { cs =>
      cs.split(';').filter(_.nonEmpty).foreach { kv =>
        val parts = kv.split("=", 2)
        require(parts.length == 2 && parts(0).nonEmpty,
          s"bad A/B conf '$kv' (want key=value)")
        spark.conf.set(parts(0), parts(1))
        println(s"PROBE CONF ${parts(0)}=${parts(1)}")
      }
    }
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0)
    val jobStarts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val nJobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(e.jobId, System.nanoTime())
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobStarts.remove(e.jobId).foreach { t0 =>
            jobNanos.addAndGet(System.nanoTime() - t0); nJobs.incrementAndGet()
          }
      })
    val root = java.nio.file.Files.createTempDirectory("graft_floorprobe").toString
    val in = s"$root/in"
    spark.range(1000).select(col("id"), (col("id") % 50).as("k"))
      .repartition(nFiles).write.mode("overwrite").parquet(in)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    println(s"PROBE pid=${ProcessHandle.current().pid()} files=$nFiles stateful=$stateful")
    val t0 = System.nanoTime()
    try {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
        .option("maxFilesPerTrigger", 1).parquet(in)
      val body = if (stateful) src.dropDuplicates("k")
                 else src.select(col("id") + 1 as "id2")
      val q = body.writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ck")
        .start()
      q.processAllAvailable(); q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"PROBE wall=$wall%.2f s over $nFiles batches = ${wall / nFiles * 1000}%.0f ms/batch; " +
      f"job time ${jobNanos.get / 1e9}%.2f s over ${nJobs.get} jobs " +
      f"(${jobNanos.get / 1e6 / math.max(nJobs.get, 1)}%.0f ms/job)")
    spark.stop()
  }
}
