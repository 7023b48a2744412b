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

  test("events.ts normalizes ns → µs exactly") {
    val df = Tables.table(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType.typeName == "timestamp")
    val r = df.selectExpr("min(ts)", "max(ts)").collect()(0)
    assert(r.getTimestamp(0) != null && r.getTimestamp(1) != null)
  }
}
