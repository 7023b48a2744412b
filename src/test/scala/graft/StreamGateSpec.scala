package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ReplayQueries

/** Round-9 streaming gates vs their Spark-computed batch duals at
  * sf0.001 (the driver gate re-checks both at sf0.01 vs DuckDB). */
class StreamGateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q274 full-outer changelog join equals the batch full-outer dual") {
    val got = ReplayQueries.queries("q274_stream_changelog_outer")(spark, dir)
    def side(kind: String) = Tables.table(spark, dir, "events")
      .filter(col("event_type") === kind && col("value") >= 150)
      .groupBy("user_id")
      .agg((sum(floor(col("value") * 100)) / 100.0).as(s"${kind}_amt"),
           count(lit(1)).as(s"${kind}s"))
    val p = side("purchase")
    val c = side("click").withColumnRenamed("user_id", "c_user")
    val dual = p.join(c, col("user_id") === col("c_user"), "full")
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
              col("purchase_amt"), col("purchases"),
              col("click_amt"), col("clicks"))
    assert(got.count() > 0 && got.count() == dual.count())
    assert(got.except(dual).isEmpty && dual.except(got).isEmpty)
    // both outer sides are actually exercised
    assert(got.filter(col("purchases").isNull).count() > 0)
    assert(got.filter(col("clicks").isNull).count() > 0)
  }

  test("q275 streaming temporal join equals the ms-precision as-of dual") {
    val got = ReplayQueries.queries("q275_stream_temporal_join")(spark, dir)
    Tables.registerAll(spark, dir)
    val dual = spark.sql("""
      WITH v AS (
        SELECT user_id, event_id, value, unix_micros(ts) div 1000 AS tms
        FROM events WHERE event_type = 'view'),
      p AS (
        SELECT user_id, event_id, value, unix_micros(ts) div 1000 AS tms
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT p.user_id, p.event_id AS p_id, p.value AS p_value,
               v.event_id AS v_id, v.value AS v_value,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.tms DESC, v.event_id DESC) AS rn
        FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.tms <= p.tms)
      SELECT user_id AS p_user, p_id, p_value, v_id, v_value
      FROM j WHERE rn = 1""")
    assert(got.count() > 0 && got.count() == dual.count())
    assert(got.except(dual).isEmpty && dual.except(got).isEmpty)
    // both matched and unmatched probes appear (the sf0.001 fixture has
    // 16 purchases with no at-or-before view — verified in DuckDB)
    assert(got.filter(col("v_id").isNull).count() > 0)
    assert(got.filter(col("v_id").isNotNull).count() > 0)
  }

  test("q289 count-trigger/evictor stream equals the complete-window dual") {
    val got = ReplayQueries.queries("q289_stream_count_evictor")(spark, dir)
    Tables.registerAll(spark, dir)
    val dual = spark.sql("""
      WITH o AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY event_type ORDER BY ts)
                 AS rn
        FROM events),
      w AS (
        SELECT event_type, event_id, cents,
               (rn - 1) div 5 AS wid, (rn - 1) % 5 AS p,
               count(*) OVER (PARTITION BY event_type, (rn - 1) div 5)
                 AS wn
        FROM o)
      SELECT event_type, min(event_id) AS lo_id, max(event_id) AS hi_id,
             sum(cents) AS cents, count(*) AS n
      FROM w WHERE wn = 5 AND p >= 2
      GROUP BY event_type, wid""")
    assert(got.count() > 0 && got.count() == dual.count())
    assert(got.except(dual).isEmpty && dual.except(got).isEmpty)
    // every fired window was evictor-trimmed to exactly 3 elements
    assert(got.filter(col("n") =!= 3).count() == 0)
  }
}
