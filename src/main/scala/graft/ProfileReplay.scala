package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Measurement harness for the streaming replay gates (guide §1:
  * measure first). Runs the named queries twice each (rep 1 pays
  * staging; rep 2 is the steady state the bench median reflects) with a
  * StreamingQueryListener that dumps each micro-batch's `durationMs`
  * breakdown (triggerExecution / queryPlanning / getBatch / addBatch /
  * walCommit / commitOffsets / latestOffset) so the per-query wall can
  * be attributed to planning vs state-store vs sink vs harness cost.
  * Not part of the driver contract; analysis tooling only. */
object ProfileReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.init(spark)
    // A/B knobs under test (guide §1: measure before adopting)
    sys.env.get("SPARK_GRAFT_PROFILE_CONFS").foreach { cs =>
      cs.split(';').filter(_.nonEmpty).foreach { kv =>
        // split("=", 2): a conf VALUE may itself contain '=' (URLs,
        // base64) — destructuring on split('=') aborted the run (r17
        // ADVICE item)
        val parts = kv.split("=", 2)
        require(parts.length == 2 && parts(0).nonEmpty,
          s"bad A/B conf '$kv' (want key=value)")
        spark.conf.set(parts(0), parts(1))
        println(s"PROFILE CONF ${parts(0)}=${parts(1)}")
      }
    }
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val batches = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Map[String, Long])]
    var current = "?"
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        import scala.jdk.CollectionConverters._
        batches.synchronized {
          batches += ((current, p.batchId,
            dm.asScala.map { case (k, v) => (k, v.longValue) }.toMap))
        }
      }
    })

    // Floor probes: what does ONE micro-batch cost with (a) no stateful
    // operator, (b) one dropDuplicates, at 8 state partitions? Separates
    // fixed harness cost (start/stop, WAL, sink commit) from the
    // per-operator state-store cost the replay gates pay.
    def floorProbe(tag: String, stateful: Boolean, nFiles: Int): Unit = {
      import org.apache.spark.sql.functions._
      val root = java.nio.file.Files.createTempDirectory("graft_floor").toString
      val in = s"$root/in";
      spark.range(1000).select(col("id"), (col("id") % 50).as("k"))
        .repartition(nFiles).write.mode("overwrite").parquet(in)
      (1 to 2).foreach { rep =>
        val out = s"$root/out$rep"; val ck = s"$root/ck$rep"
        val t0 = System.nanoTime()
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          current = s"floor_$tag"
          val src = spark.readStream
            .schema(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
            .option("maxFilesPerTrigger", 1).parquet(in)
          val body = if (stateful) src.dropDuplicates("k") else src.select(col("id") + 1 as "id2")
          val q = body.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck).start()
          q.processAllAvailable(); q.stop()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE floor_$tag rep$rep wall=$dt%.3f s (nFiles=$nFiles stateful=$stateful)")
      }
    }
    floorProbe("stateless_4f", stateful = false, nFiles = 4)
    floorProbe("stateful_4f", stateful = true, nFiles = 4)
    floorProbe("stateful_2f", stateful = true, nFiles = 2)

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q308_stream_window_join", "q330_stream_sql_interval",
               "q269_stream_lateness", "q294_stream_ttl_agg",
               "q180_stream_interval_join", "q366_cdc_debezium",
               "q346_stream_sql_window_chain", "q245_stream_changelog_join")
    val qs = SparkEntry.queries
    names.foreach { n =>
      current = n
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"PROFILE $n rep$rep wall=$dt%.3f s")
      }
    }
    println("=== per-batch durationMs ===")
    batches.foreach { case (q, bid, dm) =>
      val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
        "latestOffset", "addBatch", "walCommit", "commitOffsets")
      val s = keys.map(k => s"$k=${dm.getOrElse(k, -1L)}").mkString(" ")
      println(s"BATCH $q b$bid $s")
    }
    spark.stop()
  }
}
