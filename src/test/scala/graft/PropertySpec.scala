package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based parity checks (SURVEY §5.6): random inputs, fixed seed,
 * ONE DataFrame per property — the engine column is compared against a
 * plain-Scala reference implementation of the same semantics
 * (SqlFunctionUtils / Calcite behavior), so each property costs one Spark
 * job instead of one per generated case.
 */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val N = 300

  /** Deterministic sample of a generator (fixed seed → reproducible CI). */
  private def sample[A](g: Gen[A]): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .flatten.take(N).toSeq

  test("split_index matches -1-limit split semantics on random strings") {
    val str = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('.'),
      Gen.const('|'))).map(_.mkString)
    val rows = sample(for {
      s <- str; d <- Gen.oneOf(".", "|", "ab"); i <- Gen.choose(-1, 6)
    } yield (s, d, i))
    val df = rows.toDF("s", "d", "i")
      .withColumn("got", expr("split_index(s, d, i)"))
      .collect()
    rows.zip(df).foreach { case ((s, d, i), r) =>
      val parts = s.split(java.util.regex.Pattern.quote(d), -1)
      val want = if (i >= 0 && i < parts.length) parts(i) else null
      assert(r.getAs[String]("got") == want, s"split_index('$s','$d',$i)")
    }
  }

  test("hash_code equals JVM String.hashCode on random strings") {
    val rows = sample(Gen.asciiPrintableStr)
    val got = rows.toDF("s").withColumn("h", expr("hash_code(s)")).collect()
    rows.zip(got).foreach { case (s, r) =>
      assert(r.getAs[Int]("h") == s.hashCode, s"hash_code('$s')")
    }
  }

  test("is_digit / is_alpha / is_decimal match character-class semantics") {
    val gen = Gen.oneOf(
      Gen.numStr, Gen.alphaStr, Gen.asciiPrintableStr,
      Gen.choose(-1e9, 1e9).map(d => f"$d%.4f"))
    val rows = sample(gen)
    val got = rows.toDF("s").select(col("s"),
      expr("is_digit(s)").as("dig"), expr("is_alpha(s)").as("alp"),
      expr("is_decimal(s)").as("dec")).collect()
    rows.zip(got).foreach { case (s, r) =>
      assert(r.getAs[Boolean]("dig") == (s.nonEmpty && s.forall(c => c >= '0' && c <= '9')), s"is_digit('$s')")
      assert(r.getAs[Boolean]("alp") == (s.nonEmpty && s.forall(c => c.isLetter && c <= 'z')), s"is_alpha('$s')")
      val decWant = s.matches("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$")
      assert(r.getAs[Boolean]("dec") == decWant, s"is_decimal('$s')")
    }
  }

  test("divide_integer is exact above the 2^53 double mantissa") {
    val rows = sample(for {
      a <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      b <- Gen.choose(1L, 1000L)
    } yield (a, b))
    val got = rows.toDF("a", "b")
      .withColumn("q", expr("divide_integer(a, b)")).collect()
    rows.zip(got).foreach { case ((a, b), r) =>
      assert(r.getAs[Long]("q") == a / b, s"divide_integer($a,$b)")
    }
  }

  test("leftAsOf equals the brute-force latest-version-at-probe on random data") {
    val probes = sample(for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 1000L)
    } yield (k, t)).zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    val versions = sample(for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 1000L)
      v <- Gen.choose(0L, 1000000L)
    } yield (k, t, v))
      // unique (key, ts): the as-of winner is deterministic
      .distinctBy(x => (x._1, x._2))
    val probeDf = probes.toDF("pid", "k", "pts")
    val verDf = versions.toDF("k", "vts", "v")
    val got = graft.operators.AsOfJoin.leftAsOf(
        probeDf, verDf, "k", "k", "pts", "vts", Seq("v"), rightOrd = "vts")
      .select("pid", "v").as[(Long, Option[Long])].collect().toMap
    probes.foreach { case (pid, k, pts) =>
      val want = versions.filter(x => x._1 == k && x._2 <= pts)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(pid) == want, s"probe $pid (k=$k, ts=$pts)")
    }
  }

  test("MATCH_RECOGNIZE greedy A B+ C with SKIP PAST LAST equals java.util.regex on random strings") {
    val strGen = Gen.listOfN(30, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val strings = sample(strGen).take(60).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val rows = strings.flatMap { case (pid, s) =>
      s.zipWithIndex.map { case (ch, pos) => (pid, pos.toLong, ch.toString) }
    }
    rows.toDF("pid", "pos", "ch").createOrReplaceTempView("prop_cep")
    val got = graft.streaming.MatchRecognizeSql.sql(spark, """
        SELECT * FROM prop_cep MATCH_RECOGNIZE (
          PARTITION BY pid
          ORDER BY pos
          MEASURES FIRST(A.pos) AS m_start, LAST(C.pos) AS m_end
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+ C)
          DEFINE A AS A.ch = 'a', B AS B.ch = 'b', C AS C.ch = 'c'
        )""")
      .select("pid", "m_start", "m_end")
      .as[(Long, Long, Long)].collect().toSet
    // independent reference: java.util.regex greedy + non-overlapping
    // find() IS "greedy quantifier, skip past last row"
    val want = strings.flatMap { case (pid, s) =>
      val m = java.util.regex.Pattern.compile("ab+c").matcher(s)
      Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => (pid, m.start().toLong, (m.end() - 1).toLong)).toList
    }.toSet
    assert(got == want)
  }

  test("WinnowFp matches a plain-Scala winnowing reference incl. the non-ASCII path") {
    val k = 8; val w = 16
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'λ', '中', 'ß')) // multi-byte UTF-8, BMP
    val texts = sample(Gen.choose(k, 60)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString)))
      .take(80).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    def ref(text: String): (Long, String, String) = {
      val n = text.length - k + 1
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 until n).map { i =>
        md.digest(text.substring(i, i + k).getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
      }
      val wmins = (0 until n).map(j => hs.slice(j, math.min(j + w, n)).min)
      (wmins.distinct.size.toLong, wmins.min, wmins.max)
    }
    val fp = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.WinnowFp(org.apache.spark.sql.graftbridge.Bridge
        .expression(col("text")), k, w))
    val gotM = texts.toDF("id", "text")
      .select(col("id"), fp.as("fp"))
      .select(col("id"), col("fp.n_fp"), col("fp.fp_min"), col("fp.fp_max"))
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    texts.foreach { case (id, s) =>
      assert(gotM(id) == ref(s), s"doc $id '$s'")
    }
  }

  test("withCumSum equals a single-partition running sum on random data") {
    val rows = sample(for {
      k <- Gen.choose(0L, 50L); v <- Gen.choose(1L, 100L)
    } yield (k, v)).zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
    val df = rows.toDF("id", "k", "v").repartition(7)
    val got = graft.operators.GlobalRank
      .withCumSum(df, Seq(col("k"), col("id")), col("v"), outCol = "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val want = rows.sortBy(t => (t._2, t._1))
      .scanLeft((0L, 0L)) { case ((_, acc), (id, _, v)) => (id, acc + v) }
      .drop(1).toMap
    assert(got == want)
  }

  test("Sketches.h60 equals the SQL conv(substring(md5)) portable hash " +
    "on random strings incl. unicode") {
    val str = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '),
      Gen.const('é'), Gen.const('中'))).map(_.mkString)
    val rows = sample(str).distinct
    val df = rows.toDF("s")
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('hll:', s)), 1, 15), 16, 10) AS BIGINT)"))
      .collect()
    df.foreach { r =>
      val s = r.getAs[String]("s")
      assert(r.getAs[Long]("h") == graft.functions.Sketches.h60("hll", s),
        s"h60('$s')")
    }
  }

  test("ZOrder16 (codegen path) equals the reference interleave and is " +
    "monotonic within a quadrant") {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val rows = sample(for {
      x <- Gen.choose(0L, 65535L); y <- Gen.choose(0L, 65535L)
    } yield (x, y))
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val got = rows.toDF("x", "y")
      .withColumn("z", bridge.column(graft.plans.ZOrder16(
        bridge.expression(col("x")), bridge.expression(col("y")))))
      .collect()
    rows.zip(got).foreach { case ((x, y), r) =>
      assert(r.getAs[Long]("z") == ref(x, y), s"zorder16($x,$y)")
    }
    // dominance monotonicity: x1<=x2 ∧ y1<=y2 with same high bytes ⇒ z1<=z2
    rows.combinations(2).take(2000).foreach {
      case Seq((x1, y1), (x2, y2)) =>
        if (x1 <= x2 && y1 <= y2)
          assert(ref(x1, y1) <= ref(x2, y2) ||
            !(x1 <= x2 && y1 <= y2), "dominance order preserved")
      case _ =>
    }
  }

  test("BloomPrune has no false negatives on random key sets, and prunes " +
    "a disjoint probe set hard") {
    import graft.operators.BloomPrune
    val keys = sample(Gen.chooseNum(Long.MinValue, Long.MaxValue)).distinct
    val (ins, outs) = keys.splitAt(keys.length / 2)
    val bits = BloomPrune.build(ins.toDF("k"), "k")
    val got = keys.toDF("k")
      .withColumn("hit", BloomPrune.mightContain(bits, col("k")))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Boolean]("hit"))
      .toMap
    // every inserted key must test positive
    ins.foreach(k => assert(got(k), s"false negative for $k"))
    // FP rate on the disjoint half stays near theory:
    // (1 - e^{-kn/m})^k with n=150, m=2^16, k=4 → ~3e-9; allow slack
    val fps = outs.count(got(_))
    assert(fps <= math.max(1, outs.length / 20),
      s"$fps false positives out of ${outs.length}")
  }
}
