package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Persistent-catalog check — the reference's HiveCatalog
 * (flink-connectors/flink-connector-hive/.../HiveCatalog.java): tables
 * registered in one session survive into a brand-new process-level
 * session because the metadata lives in a metastore database, not the
 * session.
 *
 * Spark's Hive catalog (`enableHiveSupport`, hive-* + datanucleus jars
 * on the stock classpath, Derby-backed embedded metastore) is the
 * direct analogue. `spark.sql.catalogImplementation` is a STATIC conf —
 * it cannot be flipped inside an already-running test SparkContext —
 * so this check is a standalone main run in its own JVM (HiveSpec forks
 * it; sbt `runMain graft.sources.HiveCatalogCheck` works too).
 *
 * Phase 1: Hive-enabled session writes `orders` as a PARTITIONED
 * managed table and stops the context entirely.
 * Phase 2: a NEW session against the same metastore must (a) still see
 * the table in the catalog, (b) list its partitions, (c) answer a
 * partition-filtered aggregate matching the parquet source, with the
 * scan pruned to the one matching partition.
 *
 * Prints CHECK lines; exits non-zero on any failure.
 */
object HiveCatalogCheck {

  def main(args: Array[String]): Unit = {
    val dataDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft_hive").toString
    val metastore = s"jdbc:derby:;databaseName=$base/metastore_db;create=true"
    val warehouse = s"$base/warehouse"
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")

    def session(): SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("hive-catalog-check")
      .config("spark.sql.catalogImplementation", "hive")
      .config("javax.jdo.option.ConnectionURL", metastore)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .enableHiveSupport()
      .getOrCreate()

    // phase 1: register a partitioned table, then tear the JVM-level
    // session down completely
    val s1 = session()
    val expected =
      try {
        val orders = s1.read.parquet(s"$dataDir/orders.parquet")
          .filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        orders.write.mode("overwrite")
          .partitionBy("o_orderstatus")
          .saveAsTable("orders_cat")
        orders.filter(col("o_orderstatus") === "F").count()
      } finally {
        s1.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }

    // phase 2: fresh session, same metastore — the catalog must persist
    val s2 = session()
    try {
      val tables = s2.sql("SHOW TABLES").select("tableName")
        .collect().map(_.getString(0)).toSet
      check("table survives a new session", tables.contains("orders_cat"))

      val parts = s2.sql("SHOW PARTITIONS orders_cat")
        .collect().map(_.getString(0)).toSet
      check(s"partitions listed ($parts)", parts.size >= 2 &&
        parts.contains("o_orderstatus=F"))

      val q = s2.table("orders_cat").filter(col("o_orderstatus") === "F")
      val plan = q.queryExecution.executedPlan.toString
      check("partition filter prunes the scan",
        plan.contains("o_orderstatus=F") || plan.contains("PartitionFilters"))
      check("partition-filtered count matches the parquet source",
        q.count() == expected)
      println("CHECK HIVE_CATALOG_OK")
    } finally s2.stop()
  }

  private def check(what: String, ok: Boolean): Unit = {
    println(s"CHECK $what: ${if (ok) "pass" else "FAIL"}")
    if (!ok) sys.exit(1)
  }
}
