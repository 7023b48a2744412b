package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-trip fidelity of the JSON codec at its REMAINING transport
 * sites. Since round 14 payloads cross the generic changelog/temporal
 * operators as binary struct images (Changelog.Bin via StructPack —
 * see StructTransportSpec, this spec's live-path dual); JSON survives
 * only at STRING-form sites — canonical string keys for non-integral
 * key types, MatchRecognize's composite `__mr_key`, and any external
 * JSON surface using `Changelog.TransportJsonOpts`. Those sites still
 * need the full-lattice guarantee this property pins: doubles
 * INCLUDING NaN/±Inf/-0.0/denormals (Spark writes non-numeric doubles
 * as quoted "NaN"/"Infinity" tokens and its JSON parser reads them
 * back), longs at the 2^63 edges, strings with JSON-hostile characters
 * (quotes, backslashes, newlines, unicode), nulls (dropped by the
 * generator, restored as null by the parser), nested arrays, structs,
 * and µs-precision timestamps (the ms-truncation hazard
 * TransportJsonOpts exists to prevent) — one DataFrame per property
 * (the PropertySpec cost discipline).
 */
class JsonTransportSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val N = 300

  private def sample[A](g: Gen[A]): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(1337L + i)))
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

  test("to_json/from_json round-trips the full view-schema lattice bit-exactly") {
    val rowGen = for {
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
    val rows = sample(rowGen)

    val df = rows.toDF("d", "od", "l", "s", "os", "b", "arr", "nested",
                       "st", "tsus")
      .withColumn("ts", timestamp_micros(col("tsus"))).drop("tsus")
    val schema = df.schema
    // the OPERATORS' transport options — the default generator's
    // ms-truncated timestampFormat was a real fidelity loss this spec
    // caught; TransportJsonOpts pins the µs format at every site
    val opts = graft.streaming.Changelog.TransportJsonOpts
    val back = df
      .select(to_json(struct(df.columns.map(col): _*), opts).as("j"))
      .select(from_json(col("j"), schema, opts).as("p"))
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
      // µs-precision timestamps (the temporal route carries the
      // event-time column through the payload JSON)
      val tsBack = r.getAs[Timestamp](9)
      assert(tsBack.getTime * 1000 + tsBack.getNanos / 1000 % 1000 ==
             tsUs || unixMicros(tsBack) == tsUs, s"ts: $tsUs vs $tsBack")
    }
  }

  private def unixMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
}
