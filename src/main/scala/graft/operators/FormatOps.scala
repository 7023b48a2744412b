package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/**
 * Format coverage (SURVEY §2.1 — flink-formats: csv, json, orc, parquet,
 * avro): write a deterministic slice of `orders` to each format, read it
 * back, aggregate — proving the (de)serialization round-trip preserves
 * values. The oracle computes the same aggregate straight from the
 * source table, so any format-level corruption (quoting, type coercion,
 * null handling) would hash-mismatch.
 *
 * The avro leg always runs: Spark's own avro support lives in the
 * separate spark-avro connector jar, preferred when present (the probe
 * runs once per JVM, so query and oracle stay consistent); when absent
 * the round-trip goes through [[graft.sources.AvroIO]] on avro-core,
 * which IS an unconditional Spark classpath dependency — either way
 * real Avro container files are written and re-read.
 */
object FormatOps {

  /** True when the avro data source is registered. Probed via Spark's
    * own provider lookup — class presence is not enough (Spark 4 ships
    * avro (de)serializer classes inside spark-sql while the data-source
    * registration still lives in the separate spark-avro jar). */
  private[graft] val avroAvailable: Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("avro", org.apache.spark.sql.internal.SQLConf.get)
      true
    } catch { case _: Exception => false }

  /** Round-tripped formats, in output order (parquet is exercised by
    * every source-table scan). The avro leg is ALWAYS on: through the
    * spark-avro connector when its jar is present, else through
    * [[graft.sources.AvroIO]] on avro-core (an unconditional Spark
    * dependency) — so the round-trip executes, not just compiles, in
    * connector-less environments. */
  private[graft] val formats: Seq[String] = Seq("csv", "json", "orc", "avro")

  private val csvSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderpriority", StringType),
    StructField("o_date", StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_formats" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_fmt").toString
      val sample = Tables.table(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
                col("o_orderpriority"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      sample.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      sample.write.mode("overwrite").json(s"$tmp/json")
      sample.write.mode("overwrite").orc(s"$tmp/orc")
      if (avroAvailable)
        sample.write.mode("overwrite").format("avro").save(s"$tmp/avro")
      else graft.sources.AvroIO.write(sample, s"$tmp/avro")
      val back = formats.map {
        case "csv" =>
          "csv" -> s.read.schema(csvSchema).option("header", "true")
            .csv(s"$tmp/csv")
        case "json" => "json" -> s.read.schema(csvSchema).json(s"$tmp/json")
        case "orc" => "orc" -> s.read.orc(s"$tmp/orc")
        case "avro" =>
          "avro" -> (if (avroAvailable) s.read.format("avro").load(s"$tmp/avro")
                     else graft.sources.AvroIO.read(s, s"$tmp/avro"))
      }
      back.map { case (fmt, df) =>
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
               sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
                 .as("total"),
               min(col("o_date")).as("first_date"))
          .withColumn("fmt", lit(fmt))
      }.reduce(_ unionByName _)
    }),

    // Schema evolution across writer generations (the reference's
    // format-evolution concern — Avro reader/writer schema resolution,
    // T-COMMON/formats; Spark's parquet mergeSchema is the analogue):
    // generation 0 files lack the later-added `value` column; a
    // mergeSchema read unifies the dataset, null-filling the old rows,
    // and the aggregate must see exactly the union the oracle computes
    // from the fixture. At 100 TB this is the daily reality of a
    // long-lived dataset dir: schema drift across partitions must not
    // need a rewrite; the unified read costs one footer merge.
    "q292_schema_evolution" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      val root = Files.createTempDirectory("graft_schemaevo").toString
      ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .select(col("event_id"), col("event_type"))
        .write.mode("overwrite").parquet(s"$root/gen0")
      ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .select(col("event_id"), col("event_type"), col("value"))
        .write.mode("overwrite").parquet(s"$root/gen1")
      s.read.option("mergeSchema", "true")
        .parquet(s"$root/gen0", s"$root/gen1")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             count(col("value")).as("n_with_value"),
             sum(floor(col("value") * 100)).cast("long").as("cents"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q292_schema_evolution" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CASE WHEN event_id % 2 = 1 AND value IS NOT NULL
                           THEN 1 ELSE 0 END)
               AS BIGINT) AS n_with_value,
             CAST(sum(CASE WHEN event_id % 2 = 1
                           THEN floor(value * 100) END) AS BIGINT)
               AS cents
      FROM events GROUP BY event_type""",

    "q53_formats" -> s"""
      WITH base AS (
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
               min(strftime(o_orderdate, '%Y-%m-%d')) AS first_date
        FROM orders WHERE o_orderkey < 2000
        GROUP BY o_orderstatus)
      SELECT o_orderstatus, n, total, first_date, fmt
      FROM base CROSS JOIN (VALUES ${formats.map(f => s"('$f')").mkString(", ")}) f(fmt)"""
  )
}
