package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes every SparkEntry query at sf0.001 — the correctness gate
  * runs at sf0.01, so data-dependent landmines that only fire on tiny
  * or skewed inputs (e.g. ANSI divide-by-zero when a bucket is empty —
  * caught once in round 6) surface here, in `sbt test`, rather than in
  * the driver's bench. */
class QuerySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
