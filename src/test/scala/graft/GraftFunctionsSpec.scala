package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs (local[4] keeps test startup fast). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
}

class GraftFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSession.spark

  private def one[T](sql: String): T =
    spark.sql(s"SELECT $sql").collect()(0).getAs[T](0)

  test("split_index splits on literal separator") {
    assert(one[String]("split_index('a.b.c', '.', 1)") == "b")
    assert(one[String]("split_index('a|b|c', '|', 0)") == "a")
    assert(one[String]("split_index('a.b.c', '.', 9)") == null)
  }

  test("is_decimal / is_digit / is_alpha") {
    assert(one[Boolean]("is_decimal('-3.14')"))
    assert(!one[Boolean]("is_decimal('3a')"))
    assert(one[Boolean]("is_digit('0042')"))
    assert(!one[Boolean]("is_digit('4.2')"))
    assert(one[Boolean]("is_alpha('abcXYZ')"))
    assert(!one[Boolean]("is_alpha('ab1')"))
  }

  test("hash_code matches JVM String.hashCode") {
    assert(one[Int]("hash_code('hello')") == "hello".hashCode)
    assert(one[Int]("hash_code('')") == 0)
    assert(one[Int]("hash_code('Ω≈ç√')") == "Ω≈ç√".hashCode)
  }

  test("divide_integer is exact above 2^53") {
    // 2^60 / 1 would lose precision via double division
    assert(one[Long]("divide_integer(1152921504606846976, 1)") == 1152921504606846976L)
    assert(one[Long]("divide_integer(7, 2)") == 3L)
    assert(one[Long]("divide_integer(-7, 2)") == -3L) // truncation, not floor
  }

  test("rand_integer with literal seed is deterministic and bounded") {
    val a = one[Int]("rand_integer(42, 10)")
    val b = one[Int]("rand_integer(42, 10)")
    assert(a == b && a >= 0 && a < 10)
  }

  test("graft_element returns sole element") {
    assert(one[Int]("graft_element(array(7))") == 7)
    assert(one[Any]("graft_element(array())") == null)
  }

  test("convert_tz") {
    assert(one[String]("convert_tz('1970-01-01 00:00:00', 'UTC', 'America/Los_Angeles')")
      == "1969-12-31 16:00:00")
  }

  test("json predicates") {
    assert(one[Boolean]("is_json_object('{\"a\":1}')"))
    assert(one[Boolean]("is_json_array('[1,2]')"))
    assert(one[Boolean]("is_json_scalar('3')"))
    assert(!one[Boolean]("is_json_object('[1]')"))
    assert(!one[Boolean]("is_json_value('{oops')"))
  }

  test("§2.8 leftovers: str_to_map, parse_url, overlay, initcap, sha1, uuid shape") {
    val m = one[Map[String, String]]("str_to_map('a:1,b:2', ',', ':')")
    assert(m == Map("a" -> "1", "b" -> "2"))
    assert(one[String]("parse_url('http://h.example/p?q=7', 'HOST')") == "h.example")
    assert(one[String]("parse_url('http://h.example/p?q=7', 'QUERY', 'q')") == "7")
    assert(one[String]("overlay('hello' PLACING 'XX' FROM 2)") == "hXXlo")
    assert(one[String]("initcap('hello world')") == "Hello World")
    assert(one[String]("sha1('x')") == "11f6ad8ec52a2984abaafd7c3b516503785c2072")
    assert(one[String]("uuid()").matches("[0-9a-f-]{36}"))
    assert(one[Int]("locate('l', 'hello')") == 3)
    assert(one[String]("repeat('ab', 3)") == "ababab")
  }

  test("approximate aggregates are within tolerance of exact") {
    val li = Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
    import org.apache.spark.sql.functions._
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("acd"),
      countDistinct(col("l_partkey")).as("cd"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50"),
      expr("percentile(l_quantity, 0.5)").as("exact_p50")).collect()(0)
    val (acd, cd) = (r.getAs[Long]("acd"), r.getAs[Long]("cd"))
    assert(math.abs(acd - cd).toDouble / cd < 0.05)
    assert(math.abs(r.getAs[Double]("p50") - r.getAs[Double]("exact_p50")) <= 1.0)
  }

  test("cosine_sim: bit-equal to composed HOF form, clean type errors") {
    import org.apache.spark.sql.functions._
    val raw = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val emb = raw.select(col("vec_id"), col("embedding").as("ea"))
    val pairs = emb.crossJoin(raw.select(col("embedding").as("eb"))).limit(2000)
    def dotD(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val both = pairs.select(
      graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb")).as("fused"),
      (dotD("ea", "eb") / (sqrt(dotD("ea", "ea")) * sqrt(dotD("eb", "eb"))))
        .as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1), array(2))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("dot_codes: bit-equal to the composed HOF form incl. null/length edges") {
    import org.apache.spark.sql.functions._
    // the exact SQ8 shape q310 serves: int8 codes of fixture embeddings
    val q8 = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> greatest(-127L, least(127L, " +
        "CAST(round(CAST(x AS DOUBLE) * 127) AS BIGINT))))").as("q8"))
    val pairs = q8.select(col("q8").as("qa"))
      .crossJoin(q8.select(col("q8").as("qb"))).limit(2000)
    val both = pairs.select(
      graft.operators.AnnOps.dotCodes(col("qa"), col("qb")).as("fused"),
      expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, " +
           "(acc, v) -> acc + v)").as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    // edges: length mismatch and a null element both yield NULL (the
    // zip_with padding / null-poisoning semantics), and SQL reachability
    val edges = spark.sql(
      """SELECT dot_codes(array(1L, 2L), array(3L, 4L)) AS ok,
                dot_codes(array(1L, 2L), array(3L)) AS len,
                dot_codes(array(1L, CAST(NULL AS BIGINT)), array(3L, 4L)) AS nul
      """).collect()(0)
    assert(edges.getLong(0) == 11L)
    assert(edges.isNullAt(1) && edges.isNullAt(2))
    val e = intercept[Exception] {
      spark.sql("SELECT dot_codes(array(1), array(2L))").collect()
    }
    assert(e.getMessage.contains("array<bigint>"))
  }

  test("events.ts normalizes ns → µs exactly") {
    val df = Tables.table(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType.typeName == "timestamp")
    val r = df.selectExpr("min(ts)", "max(ts)").collect()(0)
    assert(r.getTimestamp(0) != null && r.getTimestamp(1) != null)
  }

  test("GraftExtensions injects the full SQL surface via the extensions path") {
    // `spark.sql.extensions` is a STATIC conf read from the SparkContext at
    // session build — a new in-process session over the shared test context
    // cannot see it, so apply the injector to the same registry hook the
    // session builder uses. (The live `--conf spark.sql.extensions=...`
    // path is exercised end-to-end in a separate spark-shell JVM by the
    // verify drive.)
    import org.apache.spark.sql.SparkSessionExtensions
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.Bridge
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = Bridge.materializeInjectedFunctions(ext)
    // every table entry is injected
    graft.functions.GraftFunctions.builders.foreach { case (name, _) =>
      assert(reg.functionExists(FunctionIdentifier(name)), name)
    }
    // a direct-Catalyst builder yields an immediately evaluable expression
    val hc = reg.lookupFunction(
      FunctionIdentifier("hash_code"), Seq(Literal("abc")))
    assert(hc.eval(null) == "abc".hashCode)
    // a Column-composed builder yields a tree for the analyzer (resolution
    // is exercised live in the spark-shell drive's --conf run)
    val sx = reg.lookupFunction(
      FunctionIdentifier("split_index"),
      Seq(Literal("a.b.c"), Literal("."), Literal(1)))
    assert(sx != null)
  }

  test("sketch aggregators are SQL-callable: hll_distinct via spark.sql " +
    "equals the typed-Aggregator column path") {
    import org.apache.spark.sql.functions._
    Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("gf_docs")
    val sqlRes = spark.sql(
      "SELECT source, round(hll_distinct(text), 4) AS est " +
      "FROM gf_docs GROUP BY source")
    import spark.implicits._
    val agg = new graft.functions.Sketches.HllDistinct().toColumn
    val colRes = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("text")).as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("est")).toDF("source", "est")
      .withColumn("est", round(col("est"), 4))
    assert(sqlRes.count() > 0)
    assert(sqlRes.except(colRes).isEmpty && colRes.except(sqlRes).isEmpty)
    // cms end-to-end in SQL: build the sketch, probe one token
    val cms = spark.sql(
      "SELECT cms_estimate(cms_sketch(w), 'the') AS est FROM " +
      "(SELECT explode(split(trim(text), '\\\\s+')) AS w FROM gf_docs)")
      .collect().head.getLong(0)
    val trueCnt = spark.sql(
      "SELECT count(*) FROM (SELECT explode(split(trim(text), '\\\\s+')) " +
      "AS w FROM gf_docs) WHERE w = 'the'").collect().head.getLong(0)
    assert(cms >= trueCnt, s"CMS one-sided error violated: $cms < $trueCnt")
  }

  test("kmv_distinct SQL aggregate equals the typed path and the " +
    "SQL-composed bottom-k (q154) arithmetic") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("gf_docs")
    val sqlRes = spark.sql(
      "SELECT source, round(kmv_distinct(text), 4) AS est " +
      "FROM gf_docs GROUP BY source")
    import spark.implicits._
    val agg = new graft.functions.Sketches.KmvDistinct().toColumn
    val colRes = docs.select(col("source"), col("text"))
      .as[(String, String)].groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("est")).toDF("source", "est")
      .withColumn("est", round(col("est"), 4))
    assert(sqlRes.count() > 0)
    assert(sqlRes.except(colRes).isEmpty && colRes.except(sqlRes).isEmpty)
    // composed dual: the q154 bottom-k arithmetic over the same hash
    val k = graft.functions.Sketches.KmvK
    val h = udf((s: String) => graft.functions.Sketches.h60("kmv", s))
    val dh = docs.select(col("source"), h(col("text")).as("h")).distinct()
    val w = Window.partitionBy("source").orderBy("h")
    val composed = dh.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(col("source"),
        round(when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * expr("power(2, 60)") / col("hk")),
          4).as("est"))
    assert(sqlRes.except(composed).isEmpty && composed.except(sqlRes).isEmpty)
  }

  test("hist_quantile SQL aggregate equals the SQL-composed histogram " +
    "(q163) arithmetic") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
    ev.createOrReplaceTempView("gf_ev")
    val sqlRes = spark.sql(
      "SELECT event_type, round(hist_quantile(value, 50), 6) AS p50, " +
      "round(hist_quantile(value, 99), 6) AS p99 " +
      "FROM gf_ev GROUP BY event_type")
    val scale = graft.functions.Sketches.HistScale
    val buck = ev.select(col("event_type"),
        (floor(col("value") * scale).cast("long") + 1).as("n"))
      .withColumn("bucket", length(expr("bin(n)")).cast("long"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy("event_type")
    val cum = buck.withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("total", sum(col("c")).over(wtot))
    def bq(q: Int) = min(when(col("cum") * 100 >= col("total") * q, col("bucket")))
    def est(b: org.apache.spark.sql.Column) =
      round((pow(lit(2.0), b) - lit(1.0)) / lit(scale.toDouble), 6)
    val composed = cum.groupBy("event_type")
      .agg(bq(50).as("b50"), bq(99).as("b99"))
      .select(col("event_type"), est(col("b50")).as("p50"),
        est(col("b99")).as("p99"))
    assert(sqlRes.count() > 0)
    assert(sqlRes.except(composed).isEmpty && composed.except(sqlRes).isEmpty)
  }
}
