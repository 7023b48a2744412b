package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIO

/** Round-trip of the avro-core container-file path (the q53 avro leg in
  * connector-less environments): every supported primitive, nulls, an
  * empty partition, multi-file parallel write/read. */
class AvroIOSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("avro round-trip preserves all primitive types and nulls") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, "x", true, Array[Byte](1, 2, 3)),
      Row(null, null, null, null, null, null, null),
      Row(Long.MaxValue, Int.MinValue, Double.MinPositiveValue, 0.0f,
          "héllo ☃", false, Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema) // one empty-ish split ok
    val dir = Files.createTempDirectory("avroio").toString
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    def key(r: Row): String = (0 until r.length).map { i =>
      r.get(i) match {
        case a: Array[Byte] => a.mkString(",")
        case v => String.valueOf(v)
      }
    }.mkString("|")
    assert(back.collect().map(key).sorted.toSeq ==
      rows.map(key).sorted)
  }

  test("avro round-trip of an orders slice matches the source exactly") {
    val src = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .selectExpr("o_orderkey", "o_orderstatus", "o_totalprice")
      .repartition(4)
    val dir = Files.createTempDirectory("avroio_orders").toString
    AvroIO.write(src, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.rdd.getNumPartitions == 4) // one task per container file
    assert(back.collect().map(_.toString).sorted.toSeq ==
      src.collect().map(_.toString).sorted.toSeq)
  }
}
