package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.StructUnpack
import graft.streaming.{Changelog, TemporalJoin}

/**
 * Property dual of JsonTransportSpec for the LIVE payload transport
 * (plans/structtransport.scala): since round 14 the generic SQL routes
 * carry payloads as [[Changelog.Bin]] — the payload struct's canonical
 * UnsafeRow image via StructPack, wrapped back zero-copy by
 * StructUnpack. The same generator lattice the JSON spec pinned
 * (NaN/±Inf/-0.0/denormals, Long edges, hostile strings, nulls, nested
 * arrays/structs, µs timestamps) must survive pack→unpack bit-exactly;
 * additionally the images must be CANONICAL (equal values ⇒ equal
 * bytes — the changelog operators key staleness guards and state maps
 * on payload equality) and must survive the typed Dataset encoder path
 * (Bin lists inside the temporal join's keyed state).
 */
class StructTransportSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val N = 300

  private def sample[A](g: Gen[A]): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))
      .flatten.take(N).toSeq

  private val specialDouble: Gen[Double] = Gen.frequency(
    (3, Gen.choose(-1e12, 1e12)),
    (1, Gen.const(Double.NaN)),
    (1, Gen.const(Double.PositiveInfinity)),
    (1, Gen.const(Double.NegativeInfinity)),
    (1, Gen.const(0.0)),
    (1, Gen.const(-0.0)),
    (1, Gen.const(Double.MinPositiveValue)),
    (1, Gen.const(Double.MaxValue)),
    (1, Gen.const(Double.MinValue)),
    (1, Gen.choose(-1.0, 1.0)))

  private val hostileString: Gen[String] = Gen.frequency(
    (3, Gen.asciiPrintableStr),
    (1, Gen.const("""he said "hi" \ {"k": [1,2]}""")),
    (1, Gen.const("line1\nline2\ttab")),
    (1, Gen.const("úñïçødé ⊕ 漢字")),
    (1, Gen.const("")))

  private def eqDouble(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)

  private val rowGen = for {
    d <- specialDouble
    od <- Gen.option(specialDouble)
    l <- Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
                   Gen.const(Long.MaxValue), Gen.const(Long.MinValue))
    s <- hostileString
    os <- Gen.option(hostileString)
    b <- Gen.oneOf(true, false)
    arr <- Gen.listOfN(3, specialDouble)
    nested <- Gen.listOfN(2, Gen.listOfN(2, Gen.choose(-1000L, 1000L)))
    stS <- hostileString
    stD <- specialDouble
    tsUs <- Gen.choose(0L, 4102444800000000L) // µs within [1970, 2100)
  } yield (d, od, l, s, os, b, arr, nested, (stS, stD), tsUs)

  test("StructPack→StructUnpack round-trips the full view-schema lattice bit-exactly") {
    val rows = sample(rowGen)
    val df = rows.toDF("d", "od", "l", "s", "os", "b", "arr", "nested",
                       "st", "tsus")
      .withColumn("ts", timestamp_micros(col("tsus"))).drop("tsus")
    val schema = df.schema

    val back = df
      .select(Changelog.packPayload(df.columns.toSeq).as("__p"))
      .select(Changelog.unpackPayload(col("__p.bytes"), schema).as("p"))
      .select(df.columns.map(c => col(s"p.`$c`")): _*)
      .collect()

    rows.zip(back).foreach { case (orig, r) =>
      val (d, od, l, s, os, b, arr, nested, st, tsUs) = orig
      assert(eqDouble(r.getDouble(0), d), s"d: $d vs ${r.getDouble(0)}")
      assert(od.map(x => !r.isNullAt(1) && eqDouble(r.getDouble(1), x))
               .getOrElse(r.isNullAt(1)), s"od: $od")
      assert(r.getLong(2) == l, s"l: $l")
      assert(r.getString(3) == s, s"s: '$s' vs '${r.getString(3)}'")
      assert(os.map(x => r.getString(4) == x).getOrElse(r.isNullAt(4)),
        s"os: $os")
      assert(r.getBoolean(5) == b)
      val arrBack = r.getSeq[Double](6)
      assert(arrBack.length == arr.length &&
             arrBack.zip(arr).forall { case (x, y) => eqDouble(x, y) },
        s"arr: $arr vs $arrBack")
      assert(r.getSeq[scala.collection.Seq[Long]](7).map(_.toList).toList ==
             nested.map(_.toList), "nested")
      val stRow = r.getStruct(8)
      assert(stRow.getString(0) == st._1 && eqDouble(stRow.getDouble(1), st._2),
        s"st: $st")
      // timestamps stay raw µs longs in the image — EXACT by
      // construction, no format round-trip at all
      assert(unixMicros(r.getAs[Timestamp](9)) == tsUs,
        s"ts: $tsUs vs ${r.getAs[Timestamp](9)}")
    }
  }

  test("packed images are canonical: equal values produce equal bytes") {
    // the operators use payload bytes as state-map keys and staleness
    // guards — equality must be a pure function of the VALUES
    val rows = sample(rowGen).take(60)
    val df = (rows ++ rows).toDF("d", "od", "l", "s", "os", "b", "arr",
                                 "nested", "st", "tsus")
      .withColumn("ts", timestamp_micros(col("tsus"))).drop("tsus")
    val hexes = df
      .select(hex(Changelog.packPayload(df.columns.toSeq)("bytes")).as("h"))
      .as[String].collect()
    val (first, second) = hexes.splitAt(rows.length)
    first.zip(second).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i: identical values packed to different images")
    }
  }

  test("Bin payloads survive the typed encoder path (temporal-join state image)") {
    // folded from the round-14 EncRepro isolation spec: TJState carries
    // List[(Long, Bin-bearing tuple)] through Spark's ExpressionEncoder
    // into the state store — lists of distinct Bin payloads must
    // round-trip without aliasing or reordering
    type L = (Long, Timestamp, Changelog.Bin)
    type R = (Long, Timestamp, Long, Changelog.Bin)
    implicit val stE: Encoder[TemporalJoin.TJState[L, R]] =
      ExpressionEncoder[TemporalJoin.TJState[
        (Long, Timestamp, Changelog.Bin),
        (Long, Timestamp, Long, Changelog.Bin)]]()
    def bin(b: Byte*) = Changelog.Bin(b.toArray)
    val st = TemporalJoin.TJState[L, R](
      List((5000L, (1L, new Timestamp(5000L), bin(3, 3))),
           (3000L, (1L, new Timestamp(3000L), bin(2, 2))),
           (500L, (1L, new Timestamp(500L), bin(1, 1)))),
      List((5000L, 101L, (1L, new Timestamp(5000L), 101L, bin(9))),
           (1000L, 100L, (1L, new Timestamp(1000L), 100L, bin(8)))))
    val back = spark.createDataset(Seq(st))(stE).collect().head
    assert(back.probes.length == 3, s"probes: ${back.probes}")
    assert(back.versions.length == 2)
    assert(back == st)
  }

  test("unpack rejects an image too short for the schema") {
    val wide = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", StringType)))
    // 3 fields ⇒ 8 (bitset) + 24 (slots) = 32-byte minimum
    val ex = intercept[IllegalArgumentException] {
      StructUnpack(org.apache.spark.sql.catalyst.expressions.Literal(
        Array[Byte](1, 2, 3, 4), org.apache.spark.sql.types.BinaryType),
        wide).unpack(Array[Byte](1, 2, 3, 4))
    }
    assert(ex.getMessage.contains("too short"))
  }

  test("transport cost: Bin vs JSON per-record (informational)") {
    // the measured delta is recorded in BASELINE.md — this test only
    // verifies both paths agree on cardinality and reports timings
    val M = 200000
    val df = spark.range(M).select(
      col("id").as("k"),
      (col("id") % 97).cast("double").as("v"),
      concat(lit("payload-"), col("id")).as("s"),
      timestamp_millis(col("id") * 1000L).as("ts"))
    val schema = df.schema
    df.count() // warm the range scan

    def time(f: => Long): (Long, Long) = {
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1000000L)
    }
    val opts = Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    val (nj, tj) = time {
      df.select(to_json(struct(df.columns.map(col): _*), opts).as("j"))
        .select(from_json(col("j"), schema, opts).as("p"))
        .select(col("p.k")).filter(col("k") >= 0).count()
    }
    val (nb, tb) = time {
      df.select(Changelog.packPayload(df.columns.toSeq).as("__p"))
        .select(Changelog.unpackPayload(col("__p.bytes"), schema).as("p"))
        .select(col("p.k")).filter(col("k") >= 0).count()
    }
    assert(nj == M && nb == M)
    info(s"JSON pack+unpack: $tj ms for $M rows; Bin: $tb ms " +
         f"(${tj.toDouble / tb.max(1)}%.1fx)")
  }

  private def unixMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
}
