package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StatefulOps, StreamOps}

case class SEv(event_id: Long, ts: Timestamp, user_id: Long,
               event_type: String, value: Double)

case class SDoc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming semantics: replay `events` through MemoryStream and check
  * the streaming result equals the batch dual (the unified batch/stream
  * guarantee the reference makes). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private lazy val eventRows: Seq[SEv] =
    Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
      .as[SEv].collect().toSeq.sortBy(_.ts.getTime).take(600)

  /** Run a streaming query over events fed in 3 chunks + flush sentinel;
    * returns the named memory sink table. */
  private def runStream(name: String, sentinel: Boolean = true)(
      build: org.apache.spark.sql.Dataset[SEv] => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val q = build(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append).start()
    try {
      eventRows.grouped(200).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      if (sentinel) {
        // push the watermark far past the data so all windows finalize
        val last = eventRows.last
        mem.addData(SEv(-1L, new Timestamp(last.ts.getTime + 86400000L),
          -1L, "sentinel", 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
  }

  test("streaming tumble agg equals batch tumble agg") {
    val got = runStream("s_tumble") { ds =>
      StreamOps.tumbleAgg(ds.toDF(), "ts", "1 hour", "10 minutes",
        Seq(col("event_type")), Seq(count(lit(1)).as("n")))
        .select(col("event_type"), col("w.start").as("ws"), col("n"))
    }.filter(col("event_type") =!= "sentinel")
    val exp = eventRows.toDF()
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("ws"), col("n"))
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("streaming session agg equals batch session agg") {
    val got = runStream("s_sess") { ds =>
      StreamOps.sessionAgg(ds.toDF(), "ts", "30 minutes", "10 minutes",
        Seq(col("user_id")), Seq(count(lit(1)).as("n")))
        .select(col("user_id"), col("w.start").as("ws"), col("n"))
    }.filter(col("user_id") =!= -1L)
    val exp = eventRows.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ws"), col("n"))
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("streaming dynamic-gap session agg equals batch dynamic-gap session agg") {
    // gap extractor: CalendarIntervalType expression evaluated per row
    // (make_interval — an INTERVAL literal is DayTimeIntervalType, which
    // session_window rejects for dynamic gaps)
    val gap = when(col("event_type") === "purchase",
        expr("make_interval(0,0,0,0,0,45,0)"))
      .otherwise(expr("make_interval(0,0,0,0,0,15,0)"))
    val got = runStream("s_dynsess") { ds =>
      StreamOps.dynamicSessionAgg(ds.toDF(), "ts", gap, "10 minutes",
        Seq(col("user_id")), Seq(count(lit(1)).as("n")))
        .select(col("user_id"), col("w.start").as("ws"), col("n"))
    }.filter(col("user_id") =!= -1L)
    val exp = eventRows.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ws"), col("n"))
    assert(got.count() > 0)
    // the per-element gap must actually vary the windows vs a static gap
    val static = eventRows.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
    assert(exp.count() != static.count())
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("streaming dedup keep-first equals batch distinct-on-first") {
    val got = runStream("s_dedup") { ds =>
      StreamOps.dedupKeepFirst(ds.toDF(), "ts", "10 minutes",
        Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
    }.filter(col("user_id") =!= -1L)
    // keep-first emits exactly one row per (user, type) — which physical
    // row wins is order-dependent, so compare the key sets
    val exp = eventRows.toDF().select("user_id", "event_type").distinct()
    assert(got.count() == exp.count())
    assert(got.distinct().count() == got.count())
  }

  test("streaming interval join matches batch interval join") {
    val got = runStream("s_ij", sentinel = false) { ds =>
      val p = ds.toDF().filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                col("ts").as("p_ts"))
      val c = ds.toDF().filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                col("event_id").as("c_id"))
      StreamOps.intervalJoin(p, c, "p_user", "c_user", "p_ts", "c_ts",
        "-10 MINUTES", "-0 SECONDS", "10 minutes")
        .filter(col("c_ts") < col("p_ts"))
        .select(col("p_id"), col("c_id"))
    }
    val pb = eventRows.toDF().filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
              col("ts").as("p_ts"))
    val cb = eventRows.toDF().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("c_id"))
    val exp = pb.join(cb, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") < col("p_ts"))
      .select(col("p_id"), col("c_id"))
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    assert(got.count() == exp.count())
  }

  test("streaming LEFT OUTER interval join matches batch dual") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val split = (df: org.apache.spark.sql.DataFrame) => (
      df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                col("ts").as("p_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                col("event_id").as("c_id")))
    val (p, c) = split(mem.toDS().toDF())
    val q = StreamOps.intervalJoin(p, c, "p_user", "c_user", "p_ts", "c_ts",
        "-10 MINUTES", "-0 SECONDS", "10 minutes", "leftOuter")
      .select(col("p_id"), col("c_id"))
      .writeStream.format("memory").queryName("s_ij_lo")
      .outputMode(OutputMode.Append).start()
    try {
      eventRows.grouped(200).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      // the null-pads only emit once the watermark passes each row's join
      // horizon — push it with far-future sentinels that SURVIVE the
      // per-side filters (one per side), then drop them from the result
      val far = new Timestamp(eventRows.last.ts.getTime + 86400000L)
      mem.addData(SEv(-1L, far, -1L, "purchase", 0.0),
                  SEv(-2L, far, -1L, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_ij_lo").filter(col("p_id") >= 0 &&
      (col("c_id").isNull || col("c_id") >= 0))
    val (pb, cb) = split(eventRows.toDF())
    val exp = pb.join(cb, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"), "left")
      .select(col("p_id"), col("c_id"))
    assert(got.count() == exp.count())
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    // the outer form really pads: some purchase had no prior click
    assert(got.filter(col("c_id").isNull).count() > 0)
  }

  test("streaming FULL OUTER interval join matches batch dual") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val split = (df: org.apache.spark.sql.DataFrame) => (
      df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                col("ts").as("p_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                col("event_id").as("c_id")))
    val (p, c) = split(mem.toDS().toDF())
    val q = StreamOps.intervalJoin(p, c, "p_user", "c_user", "p_ts", "c_ts",
        "-10 MINUTES", "-0 SECONDS", "10 minutes", "fullOuter")
      .select(col("p_id"), col("c_id"))
      .writeStream.format("memory").queryName("s_ij_fo")
      .outputMode(OutputMode.Append).start()
    try {
      eventRows.grouped(200).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      val far = new Timestamp(eventRows.last.ts.getTime + 86400000L)
      mem.addData(SEv(-1L, far, -1L, "purchase", 0.0),
                  SEv(-2L, far, -1L, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_ij_fo").filter(
      (col("p_id").isNull || col("p_id") >= 0) &&
      (col("c_id").isNull || col("c_id") >= 0))
    val (pb, cb) = split(eventRows.toDF())
    val exp = pb.join(cb, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"), "full")
      .select(col("p_id"), col("c_id"))
    assert(got.count() == exp.count())
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    // pads on BOTH sides: unmatched purchases and unmatched clicks
    assert(got.filter(col("c_id").isNull).count() > 0)
    assert(got.filter(col("p_id").isNull).count() > 0)
  }

  test("streaming top-n per key emits refreshed top lists") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = StatefulOps.topNPerKey[Long, SEv](
      mem.toDS().groupByKey(_.user_id), 3, _.value, _.event_id)
    val q = ds.toDF("user_id", "top").writeStream
      .format("memory").queryName("s_topn").outputMode(OutputMode.Update).start()
    try {
      eventRows.grouped(300).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val emissions = spark.table("s_topn")
    assert(emissions.count() > 0)
    // every change emits a refreshed list, so the batch-final top-3 must
    // appear among the emissions for every key
    val k = eventRows.groupBy(_.user_id).maxBy(_._2.size)._1
    val expTop = eventRows.filter(_.user_id == k)
      .sortBy(e => (-e.value, e.event_id)).take(3).map(_.event_id)
    val gotTops = emissions.filter(col("user_id") === k).collect()
      .map(_.getSeq[org.apache.spark.sql.Row](1)
        .map(_.getAs[Long]("event_id")).toList)
    assert(gotTops.contains(expTop.toList))
  }

  test("streaming dedup keep-last converges to batch last-row-per-key") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = StatefulOps.dedupKeepLast[Long, SEv](
      mem.toDS().groupByKey(_.user_id), _.ts.getTime, _.event_id)
    val q = ds.toDF("user_id", "ev").writeStream
      .format("memory").queryName("s_last").outputMode(OutputMode.Update).start()
    try {
      eventRows.grouped(300).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("s_last").select("user_id", "ev.event_id").collect()
    val emitted = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the final winner per key must have been emitted (each change emits)
    val exp = eventRows.groupBy(_.user_id).map { case (k, es) =>
      (k, es.maxBy(e => (e.ts.getTime, e.event_id)).event_id) }.toSet
    assert(exp.subsetOf(emitted))
    // and every key's emissions monotonically improve to exactly one winner
    assert(emitted.map(_._1) == exp.map(_._1))
  }

  test("socket source round-trip on loopback") {
    // §2.1 row 3: the reference's SocketTextStreamFunction — SS's native
    // socket source, driven end-to-end against a real loopback server
    // (offline-safe: no egress, just 127.0.0.1).
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    val writer = new Thread(() => {
      val s = server.accept()
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      (1 to 50).foreach(i => out.println(s"line$i"))
      out.flush()
      Thread.sleep(60000) // keep the connection open until the test ends
      s.close()
    })
    writer.setDaemon(true)
    writer.start()
    val df = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", port).load()
    val q = df.writeStream.format("memory").queryName("s_socket")
      .outputMode(OutputMode.Append).start()
    try {
      val deadline = System.currentTimeMillis + 60000
      var n = 0L
      while (n < 50 && System.currentTimeMillis < deadline) {
        Thread.sleep(250)
        q.processAllAvailable()
        n = spark.table("s_socket").count()
      }
      assert(n == 50)
      assert(spark.table("s_socket").select("value").as[String]
        .collect().toSet == (1 to 50).map(i => s"line$i").toSet)
    } finally { q.stop(); server.close() }
  }

  test("watermark idleness: max policy lets a busy source finalize despite an idle one") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.multipleWatermarkPolicy")
    StreamOps.withIdleSourceTolerance(spark)
    try {
      val busy = MemoryStream[SEv]
      val idle = MemoryStream[SEv]
      val union = busy.toDS().withWatermark("ts", "10 minutes").toDF()
        .unionByName(idle.toDS().withWatermark("ts", "10 minutes").toDF())
      val agg = union.groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("n"))
      val q = agg.writeStream.format("memory").queryName("s_idle")
        .outputMode(OutputMode.Append).start()
      try {
        val base = 1700000000000L
        def e(id: Long, ms: Long) = SEv(id, new Timestamp(ms), 1L, "x", 0.0)
        // the idle source contributes one early event, then goes silent;
        // the busy source advances far past the first hour
        idle.addData(e(1, base))
        busy.addData(e(2, base + 1000))
        q.processAllAvailable()
        busy.addData(e(3, base + 2 * 3600 * 1000L))
        q.processAllAvailable()
        busy.addData(e(4, base + 4 * 3600 * 1000L))
        q.processAllAvailable()
        // under max policy the busy source's watermark finalized hour 1
        // even though the idle source never advanced past `base`
        assert(spark.table("s_idle").count() > 0)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", v)
        case None => StreamOps.withAllSourcesGating(spark)
      }
    }
  }

  test("output-mode inference: windowed+watermarked → Append, unbounded → Update") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val df = mem.toDF() // streaming frame: watermark survives analysis
    val windowed = StreamOps.tumbleAgg(df, "ts", "1 hour", "10 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("n")))
    assert(StreamOps.inferOutputMode(windowed) == OutputMode.Append())
    val unbounded = df.groupBy("user_id").agg(count(lit(1)))
    assert(StreamOps.inferOutputMode(unbounded) == OutputMode.Update())
    assert(StreamOps.inferOutputMode(df.filter(col("value") > 0)) == OutputMode.Append())
    // structural check: a plain column literally named "window" must NOT
    // read as a windowed aggregation
    val decoy = df.withWatermark("ts", "10 minutes")
      .withColumn("window", col("user_id") % 10)
      .groupBy("window").agg(count(lit(1)).as("n"))
    assert(StreamOps.inferOutputMode(decoy) == OutputMode.Update())
  }

  test("expression-only minhash signature is bit-identical to the batch aggregate") {
    val dir = "/root/testdata/sf0.001"
    // the explode+groupBy dual is the INDEPENDENT formulation the
    // MinHashSig expression must reproduce bit-for-bit
    val batch = graft.operators.DedupOps.minhashSignaturesAggDual(spark, dir)
    val perRow = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.operators.DedupOps.minhashSigExpr("text").as("sig"))
      .filter(col("sig").isNotNull)
    val n = graft.operators.DedupOps.NumPerm
    val joined = batch.join(perRow, "doc_id")
    assert(joined.count() == batch.count()) // same doc coverage (≥3 tokens)
    val mismatch = joined.filter(
      (0 until n).map(i => col(s"m$i") =!= col("sig")(i)).reduce(_ || _))
    assert(mismatch.count() == 0)
  }

  test("pipeline composite: file replay → quality gate → near-dup suppress → exactly-once sink survives restart") {
    import java.nio.file.Files
    val stage = Files.createTempDirectory("graft_pipe_in").toString
    val sink = Files.createTempDirectory("graft_pipe_out").toString
    val ckpt = Files.createTempDirectory("graft_pipe_ck").toString
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("ts", expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"))
      .select("doc_id", "ts", "text", "lang")
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/b=a")
    docs.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$stage/b=b")
    val schema = spark.read.parquet(s"$stage/b=a").schema
    def gate(df: org.apache.spark.sql.DataFrame) =
      df.filter(size(split(trim(col("text")), "\\s+")) >= 5)
    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val q = StreamOps.nearDupSuppressWithinWatermark(
          gate(in), "text", "ts", "10 minutes")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    runOnce() // restart with no new data: exactly-once, no duplicates
    val got = spark.read.parquet(sink)
    val sigKey = graft.operators.DedupOps.minhashSigKey("text")
    val expKeys = gate(docs).select(sigKey.as("k")).distinct()
    // one survivor per distinct signature among gated docs (all doc
    // timestamps sit inside one watermark horizon, so dedup is global)
    assert(got.count() == expKeys.count())
    val gotKeys = got.select(sigKey.as("k"))
    assert(gotKeys.distinct().count() == got.count())
    assert(gotKeys.except(expKeys).isEmpty && expKeys.except(gotKeys).isEmpty)
  }

  test("streaming near-dup suppression drops signature-equal docs within the horizon") {
    implicit val sc = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new Timestamp(base.getTime + m * 60000L)
    val mem = MemoryStream[SDoc]
    val q = StreamOps.nearDupSuppressWithinWatermark(
        mem.toDF(), "text", "ts", "10 minutes")
      .select("doc_id").writeStream
      .format("memory").queryName("s_neardup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        SDoc(1, t(0), "a b c a b c"),
        // different raw text, IDENTICAL trigram-shingle set {abc,bca,cab}
        // → same signature → suppressed as a near-dup of doc 1
        SDoc(2, t(1), "a b c a b c a b c"),
        SDoc(3, t(2), "x y z w v u"),       // distinct → kept
        SDoc(4, t(3), "hi yo"),             // <3 tokens: exact-key path
        SDoc(5, t(4), "hi yo"))             // exact dup of 4 → suppressed
      q.processAllAvailable()
      mem.addData(SDoc(-1, t(24 * 60), "sentinel flush doc"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("s_neardup").filter(col("doc_id") =!= -1L)
      .as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  // ---- idle-state TTL on the remaining stateful operators (the
  // reference's table.exec.state.ttl applies to ALL keyed state, not
  // just joins/aggs: rank buffers, dedup winners, over-windows) ----

  import graft.streaming.Changelog.IdleStateTtl

  test("TTL top-n: an expired key's buffer restarts from the re-arrival") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = StatefulOps.topNPerKey[Long, SEv](
      mem.toDS().groupByKey(_.user_id), 3, _.value, _.event_id,
      ttl = Some(IdleStateTtl(2000L)))
    val q = ds.toDF("user_id", "top").writeStream
      .format("memory").queryName("s_topn_ttl")
      .outputMode(OutputMode.Update).start()
    val t0 = new Timestamp(1700000000000L)
    try {
      mem.addData(SEv(1, t0, 1, "a", 9.0)); q.processAllAvailable()
      Thread.sleep(4500L) // idle past retention: the rank buffer expires
      mem.addData(SEv(2, t0, 1, "a", 5.0)); q.processAllAvailable()
    } finally q.stop()
    val tops = spark.table("s_topn_ttl").collect().map(
      _.getSeq[org.apache.spark.sql.Row](1)
        .map(_.getAs[Long]("event_id")).toList).toList
    // second emission is [2] alone — had state lived it would be [1, 2]
    assert(tops == List(List(1L), List(2L)))
  }

  test("TTL dedup keep-last: an expired key's next row wins even if older by event time") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = StatefulOps.dedupKeepLast[Long, SEv](
      mem.toDS().groupByKey(_.user_id), _.ts.getTime, _.event_id,
      ttl = Some(IdleStateTtl(2000L)))
    val q = ds.toDF("user_id", "ev").writeStream
      .format("memory").queryName("s_last_ttl")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(SEv(1, new Timestamp(10000L), 1, "a", 0.0))
      q.processAllAvailable()
      Thread.sleep(4500L) // winner state expires
      // event-time OLDER than the expired winner — wins from fresh state
      // (the documented staleness trade of dedup under idle-state TTL)
      mem.addData(SEv(2, new Timestamp(5000L), 1, "a", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_last_ttl").select("ev.event_id")
      .as[Long].collect().toList
    assert(got == List(1L, 2L))
  }

  test("TTL over-window: an expired key's running aggregate restarts") {
    implicit val sc = spark.sqlContext
    import graft.streaming.OverWindow
    val mem = MemoryStream[(Long, Long, Double)]
    val base = 1700000000000L
    val ds = mem.toDS()
      .withColumn("ets", (($"_2" + base) / 1000).cast("timestamp"))
      .select($"_1".as("k"), ($"_2" + base).as("t"), $"_3".as("v"), $"ets")
      .withWatermark("ets", "1 second")
      .as[OEv]
    val out = OverWindow.overAgg[Long, OEv, Double](
      ds.groupByKey(_.k), _.t, _.v.toLong, _.v,
      OverWindow.sumAgg[OEv](_.v), OverWindow.UnboundedPreceding,
      ttl = Some(IdleStateTtl(2000L)))
    val q = out.writeStream.format("memory").queryName("s_over_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      // phase 1: two rows then a watermark carrier → running sums 2, 5
      mem.addData((1L, 1000L, 2.0), (1L, 3000L, 3.0), (9L, 10000000L, 0.0))
      q.processAllAvailable()
      Thread.sleep(4500L) // key 1 idle past retention: accumulator expires
      // phase 2: a later row + carrier → sum restarts at 7, not 12
      mem.addData((1L, 15000000L, 7.0), (9L, 30000000L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_over_ttl")
      .as[(Long, Long, Long, Double)].collect()
      .filter(_._1 == 1L).sortBy(_._2).map(_._4).toList
    assert(got == List(2.0, 5.0, 7.0))
  }
}
