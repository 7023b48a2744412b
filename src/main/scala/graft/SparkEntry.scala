package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-area operator batteries; every entry in `queries`
  * that is SQL-expressible has a DuckDB oracle in `oracleSql` with
  * identical column names (the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.init(spark)
    RelationalOps.queries("q01_tpch1")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all =
      RelationalOps.queries ++ EventOps.queries ++
      ScalarBattery.queries ++ TextOps.queries ++ VectorOps.queries ++
      DedupOps.queries ++ AnnOps.queries ++ MultimodalOps.queries ++
      AggOps.queries ++ CepOps.queries ++ GraphQueries.queries ++
      FormatOps.queries ++ MoreOps.queries ++ TpchOps.queries ++
      TpchSuite.queries ++ TpcdsSuite.queries ++ PipelineOps.queries ++
      SketchOps.queries ++ BloomPrune.queries ++ RetrievalOps.queries ++
      LmOps.queries ++ CurationOps.queries ++
      sources.JdbcOps.queries ++
      streaming.ReplayQueries.queries
    // Ensure the function registry is installed whichever query runs first.
    all.map { case (k, f) =>
      k -> ((s: SparkSession, dir: String) => { GraftSession.init(s); f(s, dir) })
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracle ++ EventOps.oracle ++
    ScalarBattery.oracle ++ TextOps.oracle ++ VectorOps.oracle ++
    DedupOps.oracle ++ AnnOps.oracle ++ MultimodalOps.oracle ++
    AggOps.oracle ++ CepOps.oracle ++ GraphQueries.oracle ++
    FormatOps.oracle ++ MoreOps.oracle ++ TpchOps.oracle ++
    TpchSuite.oracle ++ TpcdsSuite.oracle ++ PipelineOps.oracle ++
    SketchOps.oracle ++ BloomPrune.oracle ++ RetrievalOps.oracle ++
    LmOps.oracle ++ CurationOps.oracle ++
    sources.JdbcOps.oracle ++
    streaming.ReplayQueries.oracle
}
