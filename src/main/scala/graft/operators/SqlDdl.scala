package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.streaming.StreamSql

/**
 * SQL DDL / statement front door — the text-only entry the reference
 * exposes as `TableEnvironment.executeSql`, where EVERY pipeline starts
 * with `CREATE TABLE … WITH (…)` DDL and ends with `INSERT INTO`
 * (statement dispatch in flink-table/flink-table-planner-blink/src/main/
 * java/org/apache/flink/table/planner/operations/SqlToOperationConverter.java;
 * the WATERMARK / computed-column grammar in
 * flink-table/flink-sql-parser/src/main/codegen/includes/parserImpls.ftl).
 *
 * Statement kinds (the core of the reference's dispatch; everything
 * else rejects loudly by kind):
 *
 *  - `CREATE [TEMPORARY] TABLE [IF NOT EXISTS] name (
 *       col TYPE [NOT NULL] [COMMENT '…'] | col AS <expr>, …
 *       [, WATERMARK FOR ts AS ts [- INTERVAL '<n>' <unit>]]
 *       [, PRIMARY KEY (col [, col …]) NOT ENFORCED]
 *     ) [PARTITIONED BY (col [, col …])]
 *       WITH ('connector'='filesystem', 'path'='…' [, 'format'='parquet'
 *             , 'source.max-files-per-trigger'='k', …reader options])`
 *    → filesystem-connector table. WITH a WATERMARK clause the table is
 *    an UNBOUNDED source: `spark.readStream` over the directory (the
 *    monitoring file source) registered via [[StreamSql.registerStream]]
 *    with the declared event-time column / delay, PRIMARY KEY as the
 *    rowId — the reference's insert-only dynamic table. WITHOUT one it
 *    is a bounded scan registered as a temp view (and a valid INSERT
 *    INTO target even before any data exists). Computed columns
 *    evaluate per-row at read (`withColumn(expr)`), exactly the
 *    reference's generated-column semantics. `'format' =
 *    'debezium-json' | 'canal-json'` makes the table a CDC CHANGELOG
 *    SOURCE: the file stream of CDC envelopes decodes expression-only
 *    into a changelog view ([[graft.sources.CdcFormats]] — the
 *    reference's flink-json changelog formats) consumable by every
 *    changelog SQL route and the PRIMARY KEY upsert sink; read-only
 *    (INSERT INTO rejects), no WATERMARK clause (op kinds, not event
 *    time).
 *  - `CREATE [OR REPLACE] [TEMPORARY] VIEW name AS <query>` → the query
 *    runs through [[SqlFrontend.sql]] (so every routed streaming shape
 *    works as a view body). A batch result registers as a temp view; a
 *    streaming CHANGELOG result (row_kind output contract) registers
 *    via [[StreamSql.registerChangelog]] so later statements can
 *    consume it — the reference's updating-view chaining (`row_ord` is
 *    dropped at registration: it orders SINK materialization, not
 *    downstream operators). An append-only streaming result without
 *    row_kind needs event-time metadata a view body cannot carry —
 *    loud error pointing at registerStream.
 *  - `INSERT INTO name [(col, …)] <query>` → the query's result lands
 *    in the target table's directory in its declared format. An
 *    explicit column list maps the result POSITIONALLY onto the listed
 *    declared columns (unlisted nullable columns fill with NULL — the
 *    reference's partial insert; NOT NULL absentees reject); a bare
 *    `VALUES (…)` query maps positionally onto the declared columns
 *    (it carries no usable names); otherwise matching is BY NAME. A
 *    batch result
 *    appends and refreshes the temp view; a streaming result starts a
 *    `writeStream` (exactly-once per micro-batch via the sink's
 *    _spark_metadata log) and returns the handle in
 *    [[SqlResult.query]] — `await()` drains available input and stops,
 *    the bounded-replay analogue of the reference's
 *    `TableResult.await()`. Result columns are matched BY NAME to the
 *    target's declared columns (cast to the declared types, loud error
 *    on a missing column). Into a sink with a PRIMARY KEY (possibly
 *    COMPOSITE — the reference's SqlTableConstraint column list,
 *    parserImpls.ftl:615) every streaming result is an UPSERT SINK
 *    (the reference's primary-keyed dynamic table sink): each
 *    micro-batch merges by key keeping the highest row_ord
 *    (deterministic, idempotent bucket merge) — a CHANGELOG result's
 *    retracted keys disappear from the readable LIVE view, and an
 *    insert-only result upserts each row as +I. Without a PRIMARY KEY
 *    a CHANGELOG result REJECTS loudly unless the sink declares
 *    row_kind explicitly (the reference's "table sink doesn't support
 *    consuming update changes" — a plain append sink writing
 *    intermediate +I/-U/+U/-D rows as facts would be silent garbage).
 *  - `INSERT OVERWRITE name [PARTITION (k='v', …)] <query>` → batch
 *    backfill (the reference's RichSqlInsert OVERWRITE,
 *    parserImpls.ftl:832-859 / SupportsOverwrite): an unpartitioned
 *    table is replaced whole; a `PARTITIONED BY` table replaces ONLY
 *    the partitions present in the result (dynamic partition
 *    overwrite — Flink filesystem-connector semantics), and a static
 *    `PARTITION (k='v')` spec pins partition values the query must
 *    not also produce. Idempotent by construction: re-running a
 *    backfill reproduces identical table contents. Streaming results
 *    and PRIMARY KEY targets reject loudly.
 *  - `BEGIN STATEMENT SET; INSERT …; INSERT …; END` (script form, or
 *    [[executeStatementSet]] programmatically) → the reference's
 *    `TableEnvironment.createStatementSet()` (StatementSet.java — the
 *    endorsed multi-sink path): all member INSERTs START before any
 *    await, so their micro-batches interleave concurrently, and the
 *    combined [[SqlResult.await]] drains every member then refreshes
 *    every target view. Scan sharing: the reference plans N INSERTs as
 *    ONE job sharing the source scan; this engine delivers exactly
 *    that for the day-two fan-out shape — N STATELESS Calc members
 *    (project/filter) over ONE stream table into plain append sinks
 *    run as ONE query whose foreachBatch persists the shared batch
 *    once and applies each member's Calc to it (one source scan per
 *    micro-batch regardless of member count, idempotent batch-id
 *    partitions). Stateful/keyed/overwriting/multi-source members fall
 *    back to one query per sink (each with its own offset log — N
 *    scans, amortized by the page cache locally and by parallel
 *    readers on a cluster): Spark's source model cannot share a scan
 *    across independent stateful queries, stated honestly.
 *  - `DROP TABLE/VIEW [IF EXISTS] name`, `SHOW TABLES`,
 *    `DESCRIBE/DESC name`, and plain `SELECT …` (returned as a
 *    DataFrame, the `sqlQuery` path).
 *  - `CREATE TABLE t (…) [WITH (…)] LIKE base [(INCLUDING ALL |
 *    EXCLUDING ALL | {INCLUDING|EXCLUDING|OVERWRITING}
 *    {CONSTRAINTS|GENERATED|OPTIONS|PARTITIONS|WATERMARKS} …)]` — the
 *    reference's SqlTableLike (parserImpls.ftl:749-806) with
 *    MergeTableLikeUtil's merge semantics: physical columns always
 *    inherit (redefinition errors), computed columns / watermark
 *    follow GENERATED / WATERMARKS (OVERWRITING lets the derived
 *    definition win), PRIMARY KEY follows CONSTRAINTS and partitions
 *    follow PARTITIONS (both-defined errors point at EXCLUDING),
 *    options merge per-key (INCLUDING + redefinition errors;
 *    OVERWRITING wins — the standard `LIKE base (OVERWRITING OPTIONS)`
 *    + new 'path' idiom clones a table shape onto a new directory).
 *  - `ALTER TABLE t RENAME TO t2` / `ALTER TABLE t SET ('k'='v', …)`
 *    (the reference's SqlAlterTableRename / SqlAlterTableProperties,
 *    parserImpls.ftl:396-436): RENAME moves the catalog entry and all
 *    registered surfaces, files untouched; SET merges properties
 *    (path/format/reader options/trigger knobs) and re-registers —
 *    schema is not a property.
 *  - `EXPLAIN [PLAN FOR] <query>` → the routed statement's plan as a
 *    one-column DataFrame (the reference's `explainSql`); query
 *    statements only — explain an INSERT's SELECT body.
 *  - `SET 'key' = 'value'` / `RESET 'key'` → session conf; the
 *    reference's principal table configs map onto this engine's:
 *    `table.exec.state.ttl` (duration forms: `3600000`, `1 h`,
 *    `10 min`) → `spark.graft.state.ttl.ms` (read by every stateful
 *    operator via `ttlFromConf`), `table.exec.resource.
 *    default-parallelism` → `spark.sql.shuffle.partitions`; unknown
 *    keys pass through to spark.conf verbatim.
 *
 * Multi-statement scripts run via [[executeAll]] (split on top-level
 * `;`, string-literal-opaque).
 *
 * Scale notes: the DDL layer is metadata-only — a CREATE TABLE costs
 * nothing; reads are the same pushdown/pruning parquet scans every
 * other entry point uses, INSERT INTO is a normal distributed write
 * (file count = shuffle partitioning of the SELECT), and the streaming
 * paths land in the operators' usual one-exchange keyed plans. Path
 * probing goes through the Hadoop FileSystem API, so any scheme a real
 * cluster mounts (hdfs://, s3a://) resolves the same way.
 */
object SqlDdl {

  /** A registered filesystem-connector table. `primaryKey` is the
    * (possibly composite) upsert key column list — empty means no key;
    * `partitionedBy` the PARTITIONED BY column list. */
  final case class TableDef(name: String, physical: StructType,
                            computed: Seq[(String, String)],
                            path: String, format: String,
                            readerOptions: Map[String, String],
                            watermark: Option[(String, String)],
                            primaryKey: Seq[String],
                            partitionedBy: Seq[String],
                            maxFilesPerTrigger: Option[String],
                            checkpoint: Option[String])

  /** The result of one statement: `df` for queries/SHOW/DESCRIBE,
    * `query` for a streaming INSERT INTO (await() = drain + stop, then
    * refreshes the target's readable view — the bounded-replay analogue
    * of the reference's `TableResult.await()`). A STATEMENT SET result
    * carries every member's handle in `queries`: await() drains them
    * all (members are independent INSERTs — the reference's
    * StatementSet contract — so one drain pass per member suffices),
    * stops them, then refreshes every target. */
  final case class SqlResult(df: Option[DataFrame],
                             query: Option[StreamingQuery],
                             refresh: () => Unit = () => (),
                             queries: Seq[StreamingQuery] = Nil) {
    private def live: Seq[StreamingQuery] = query.toSeq ++ queries
    def await(): Unit = if (live.nonEmpty) {
      live.foreach(_.processAllAvailable())
      live.foreach(_.stop())
      refresh()
    }
  }
  private val done = SqlResult(None, None)

  // process-wide like the reference's per-process TableEnvironment
  // catalog; names case-insensitive like SQL identifiers
  private val tables = TrieMap.empty[String, TableDef]
  private val changelogViews = TrieMap.empty[String, Boolean]
  // catalogs + databases: NAMESPACING (the reference's
  // SqlCreateCatalog/SqlCreateDatabase families; created catalogs are
  // the GenericInMemoryCatalog shape — 'type'='generic_in_memory').
  // The readable-view namespace underneath is FLAT (Spark temp views
  // are unqualified), so table names are unique across ALL catalogs
  // and databases: creating the same name twice rejects loudly —
  // stated honestly, not silently shadowed. `databases` keys are
  // "catalog/db"; `tableDb` records each table's owning "catalog/db".
  private val catalogs =
    TrieMap[String, Map[String, String]]("default_catalog" -> Map.empty)
  @volatile private var currentCatalog = "default_catalog"
  private val databases = TrieMap[String, Map[String, String]](
    "default_catalog/default_database" -> Map.empty)
  @volatile private var currentDb = "default_database"
  private val tableDb = TrieMap.empty[String, String]

  /** The default database NAME of a catalog (the reference:
    * default_database for the built-in catalog; a created in-memory
    * catalog's 'default-database' property, default "default"). */
  private def defaultDbOf(cat: String): String =
    if (cat == "default_catalog") "default_database"
    else catalogs.get(cat).flatMap(_.get("default-database"))
      .getOrElse("default")

  /** Resolve `db` or `cat.db` to the internal "catalog/db" key. */
  private def resolveDb(name: String): String = {
    val (cat, db) = name.split("\\.").toSeq match {
      case Seq(d) => (currentCatalog, d)
      case Seq(c, d) =>
        require(catalogs.contains(c.toLowerCase),
          s"unknown catalog '$c' (SHOW CATALOGS lists " +
          s"${catalogs.keys.toSeq.sorted.mkString(", ")})")
        (c.toLowerCase, d)
      case _ => throw new IllegalArgumentException(
        s"unparseable database name '$name'")
    }
    s"$cat/${db.toLowerCase}"
  }
  // CREATE FUNCTION registrations (name → class) for DROP bookkeeping
  private val createdFunctions = TrieMap.empty[String, String]
  // view name → body text: ALTER VIEW RENAME/AS re-derives the
  // registration from the recorded body (only DDL-created views are
  // ALTER-able — a temp view registered by library code has no body)
  private val viewBodies = TrieMap.empty[String, String]
  // table name → declared PRIMARY KEY constraint name (CONSTRAINT nm
  // PRIMARY KEY …) — ALTER TABLE DROP CONSTRAINT resolves against it
  private val pkNames = TrieMap.empty[String, String]

  def dropAll(): Unit = {
    tables.clear(); changelogViews.clear(); upsertEpochs.clear()
    tableDb.clear(); createdFunctions.clear()
    viewBodies.clear(); pkNames.clear(); hintRegs.clear()
    catalogs.clear(); catalogs("default_catalog") = Map.empty
    currentCatalog = "default_catalog"
    databases.clear()
    databases("default_catalog/default_database") = Map.empty
    currentDb = "default_database"
  }

  // ---- statement dispatch ------------------------------------------------

  // column list optional (a LIKE clause can carry the whole schema —
  // the reference's SqlCreateTable grammar, parserImpls.ftl:687-746)
  private val createTableRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+" +
    "(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s*(?=\\(|WITH\\b|LIKE\\b|PARTITIONED\\b)")
  private val createViewRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?(?:TEMPORARY\\s+)?VIEW\\s+" +
    "([\\w.]+)\\s+AS\\s+(.+)$")
  // `INSERT INTO|OVERWRITE t [PARTITION (k='v', …)] [(col, …)] <query>`
  // — the reference's RichSqlInsert shape (partition spec + explicit
  // column list, parserImpls.ftl:832-859)
  private val insertRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+([\\w.]+)" +
    "(?:\\s+PARTITION\\s*\\(([^)]*)\\))?" +
    "(?:\\s*\\(\\s*(\\w+(?:\\s*,\\s*\\w+)+|\\w+)\\s*\\)(?=\\s*(?:SELECT|VALUES|WITH|\\()))?" +
    "\\s*(.+)$")
  private val beginSetRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*BEGIN\\s+STATEMENT\\s+SET\\s*$")
  private val endSetRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*END\\s*$")
  private val dropRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*DROP\\s+(TABLE|VIEW)\\s+(IF\\s+EXISTS\\s+)?([\\w.]+)\\s*$")
  private val alterRenameRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+TABLE\\s+([\\w.]+)\\s+RENAME\\s+TO\\s+([\\w.]+)\\s*$")
  private val alterSetRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+TABLE\\s+([\\w.]+)\\s+SET\\s*\\(")
  // ALTER TABLE ADD [CONSTRAINT nm] PRIMARY KEY (…) NOT ENFORCED /
  // DROP CONSTRAINT nm (SqlAlterTableAddConstraint /
  // SqlAlterTableDropConstraint, parserImpls.ftl:437-470)
  private val addConstraintRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+TABLE\\s+([\\w.]+)\\s+ADD\\s+" +
    "(?:CONSTRAINT\\s+(\\w+)\\s+)?PRIMARY\\s+KEY\\s*" +
    "\\(\\s*(\\w+(?:\\s*,\\s*\\w+)*)\\s*\\)\\s+NOT\\s+ENFORCED\\s*$")
  private val dropConstraintRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+TABLE\\s+([\\w.]+)\\s+DROP\\s+CONSTRAINT\\s+" +
    "(\\w+)\\s*$")
  // ALTER VIEW v RENAME TO v2 / ALTER VIEW v AS query (SqlAlterViewRename
  // / SqlAlterViewAs, parserImpls.ftl:471-519)
  private val alterViewRenameRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.]+)\\s+RENAME\\s+TO\\s+([\\w.]+)\\s*$")
  private val alterViewAsRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.]+)\\s+AS\\s+(.+)$")
  // ALTER DATABASE db SET (…) (SqlAlterDatabase, parserImpls.ftl:162-186)
  private val alterDbRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+DATABASE\\s+([\\w.]+)\\s+SET\\s*\\(")
  // ALTER FUNCTION f AS 'class' (SqlAlterFunction, parserImpls.ftl:269-311)
  private val alterFnRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*ALTER\\s+(?:TEMPORARY\\s+)?(?:SYSTEM\\s+)?FUNCTION\\s+" +
    "(IF\\s+EXISTS\\s+)?([\\w.]+)\\s+AS\\s+'([^']+)'" +
    "(?:\\s+LANGUAGE\\s+(\\w+))?\\s*$")
  private val descCatalogRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*DESC(?:RIBE)?\\s+CATALOG\\s+([\\w.]+)\\s*$")
  private val createCatalogRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*CREATE\\s+CATALOG\\s+([\\w]+)" +
    "(?:\\s+WITH\\s*\\((.*)\\))?\\s*$")
  private val dropCatalogRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*DROP\\s+CATALOG\\s+(IF\\s+EXISTS\\s+)?([\\w]+)\\s*$")
  // databases / catalogs / functions (parserImpls.ftl:21-346)
  private val createDbRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*CREATE\\s+DATABASE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)" +
    "(?:\\s+COMMENT\\s+'(?:[^']|'')*')?(?:\\s+WITH\\s*\\((.*)\\))?\\s*$")
  private val dropDbRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*DROP\\s+DATABASE\\s+(IF\\s+EXISTS\\s+)?([\\w.]+)" +
    "(\\s+CASCADE|\\s+RESTRICT)?\\s*$")
  private val useCatalogRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*USE\\s+CATALOG\\s+([\\w.]+)\\s*$")
  private val useDbRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*USE\\s+([\\w.]+)\\s*$")
  private val showDbRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SHOW\\s+DATABASES\\s*$")
  private val showCatalogsRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SHOW\\s+CATALOGS\\s*$")
  private val showViewsRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SHOW\\s+VIEWS\\s*$")
  private val showFunctionsRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SHOW\\s+(?:USER\\s+)?FUNCTIONS\\s*$")
  private val descDbRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*DESC(?:RIBE)?\\s+DATABASE\\s+(?:EXTENDED\\s+)?([\\w.]+)\\s*$")
  private val createFnRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*CREATE\\s+(?:TEMPORARY\\s+)?(?:SYSTEM\\s+)?FUNCTION\\s+" +
    "(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s+AS\\s+'([^']+)'" +
    "(?:\\s+LANGUAGE\\s+(\\w+))?\\s*$")
  private val dropFnRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*DROP\\s+(?:TEMPORARY\\s+)?(?:SYSTEM\\s+)?FUNCTION\\s+" +
    "(IF\\s+EXISTS\\s+)?([\\w.]+)\\s*$")
  private val showRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SHOW\\s+TABLES\\s*$")
  private val descRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*DESC(?:RIBE)?\\s+([\\w.]+)\\s*$")
  private val explainRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*EXPLAIN\\s+(?:PLAN\\s+FOR\\s+)?(.+)$")
  private val setRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SET\\s+'?([\\w.\\-]+)'?\\s*=\\s*(?:'([^']*)'|(\\S+))\\s*$")
  private val resetRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*RESET\\s+'?([\\w.\\-]+)'?\\s*$")
  // statement kinds the reference dispatches that this front door does
  // not implement — named in the error so a user knows it was
  // recognized and rejected, not mis-parsed
  private val unsupportedRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*(CREATE\\s+(?:DATABASE|CATALOG|FUNCTION)|ALTER|USE|" +
    "LOAD|UNLOAD|TRUNCATE|ANALYZE)\\b.*")
  // (ALTER TABLE RENAME TO / SET dispatch above; remaining ALTER forms
  // fall through here and reject loudly by kind)

  /** Execute ONE statement (the `executeSql` contract). Line comments
    * are stripped up front (literal-opaque) so a commented statement
    * dispatches on its real first keyword. */
  def executeSql(spark: SparkSession, text0: String): SqlResult = {
    val text = applyOptionsHints(spark, stripLineComments(text0).trim)
    val ct = createTableRe.matcher(text)
    val cv = createViewRe.matcher(text)
    val ins = insertRe.matcher(text)
    val drp = dropRe.matcher(text)
    val ren = alterRenameRe.matcher(text)
    val ast = alterSetRe.matcher(text)
    if (ct.find()) createTable(spark, text, ct)
    else if (cv.matches()) createView(spark, cv.group(2), cv.group(3),
      orReplace = cv.group(1) != null)
    else if (ins.matches()) insertInto(spark, ins.group(2), ins.group(5),
      overwrite = ins.group(1).equalsIgnoreCase("OVERWRITE"),
      partitionSpec = Option(ins.group(3)),
      columnList = Option(ins.group(4))
        .map(_.split(",").map(_.trim).toSeq))
    else if (beginSetRe.matcher(text).matches())
      throw new IllegalArgumentException(
        "BEGIN STATEMENT SET is a SCRIPT construct — run the whole " +
        "'BEGIN STATEMENT SET; INSERT …; END' block through executeAll, " +
        "or call executeStatementSet(inserts) directly")
    else if (drp.matches()) drop(spark, drp.group(1), drp.group(3),
      ifExists = drp.group(2) != null)
    else if (ren.matches()) alterRename(spark, ren.group(1), ren.group(2))
    else if (ast.find()) alterSet(spark, ast.group(1),
      balanced(text, ast.end() - 1))
    else {
      val addc = addConstraintRe.matcher(text)
      val dropc = dropConstraintRe.matcher(text)
      val vren = alterViewRenameRe.matcher(text)
      val vas = alterViewAsRe.matcher(text)
      val adb = alterDbRe.matcher(text)
      val afn = alterFnRe.matcher(text)
      val dcat = descCatalogRe.matcher(text)
      if (addc.matches())
        return addConstraint(spark, addc.group(1), Option(addc.group(2)),
          addc.group(3).split(",").map(_.trim).toSeq)
      if (dropc.matches())
        return dropConstraint(spark, dropc.group(1), dropc.group(2))
      if (vren.matches())
        return alterViewRename(spark, vren.group(1), vren.group(2))
      if (vas.matches())
        return alterViewAs(spark, vas.group(1), vas.group(2))
      if (adb.find())
        return alterDatabase(adb.group(1), balanced(text, adb.end() - 1))
      if (afn.matches())
        return alterFunction(spark, afn.group(2), afn.group(3),
          ifExists = afn.group(1) != null, language = Option(afn.group(4)))
      if (dcat.matches()) return describeCatalog(spark, dcat.group(1))
      val ccat = createCatalogRe.matcher(text)
      val dpcat = dropCatalogRe.matcher(text)
      if (ccat.matches())
        return createCatalog(ccat.group(1), Option(ccat.group(2)))
      if (dpcat.matches())
        return dropCatalog(dpcat.group(2), ifExists = dpcat.group(1) != null)
      executeTail(spark, text)
    }
  }

  /** Statement arms after the ALTER/catalog family (split keeps each
    * dispatch method under the JVM's comfortable size and the matcher
    * lists readable). `text` arrives already comment-stripped. */
  private def executeTail(spark: SparkSession, text: String): SqlResult = {
    val cdb = createDbRe.matcher(text)
    val ddb = dropDbRe.matcher(text)
    val ucat = useCatalogRe.matcher(text)
    val udb = useDbRe.matcher(text)
    val ddbDesc = descDbRe.matcher(text)
    val cfn = createFnRe.matcher(text)
    val dfn = dropFnRe.matcher(text)
    val dsc = descRe.matcher(text)
    val exp = explainRe.matcher(text)
    val set = setRe.matcher(text)
    val rst = resetRe.matcher(text)
    if (cdb.matches()) createDatabase(cdb.group(2),
      ifNotExists = cdb.group(1) != null, Option(cdb.group(3)))
    else if (ddb.matches()) dropDatabase(spark, ddb.group(2),
      ifExists = ddb.group(1) != null,
      cascade = Option(ddb.group(3)).exists(_.trim.equalsIgnoreCase("CASCADE")))
    else if (ucat.matches()) useCatalog(ucat.group(1))
    else if (udb.matches()) useDatabase(udb.group(1))
    else if (showDbRe.matcher(text).matches()) showDatabases(spark)
    else if (showCatalogsRe.matcher(text).matches()) showCatalogs(spark)
    else if (showViewsRe.matcher(text).matches()) showViews(spark)
    else if (showFunctionsRe.matcher(text).matches()) showFunctions(spark)
    else if (ddbDesc.matches()) describeDatabase(spark, ddbDesc.group(1))
    else if (cfn.matches()) createFunction(spark, cfn.group(2), cfn.group(3),
      ifNotExists = cfn.group(1) != null, language = Option(cfn.group(4)))
    else if (dfn.matches()) dropFunction(spark, dfn.group(2),
      ifExists = dfn.group(1) != null)
    else if (showRe.matcher(text).matches()) showTables(spark)
    else if (dsc.matches()) describe(spark, dsc.group(1))
    else if (exp.matches()) explain(spark, exp.group(1))
    else if (set.matches()) setConf(spark, set.group(1),
      Option(set.group(2)).getOrElse(set.group(3)))
    else if (rst.matches()) { spark.conf.unset(mapConfKey(rst.group(1))); done }
    else if (isQueryText(text))
      SqlResult(Some(SqlFrontend.sql(spark, text)), None)
    else if (unsupportedRe.matcher(text).matches())
      throw new IllegalArgumentException(
        "unsupported statement kind (this front door implements " +
        "CREATE TABLE/VIEW/DATABASE/FUNCTION, INSERT INTO/OVERWRITE, " +
        "DROP, ALTER TABLE/VIEW/DATABASE/FUNCTION, USE [CATALOG], " +
        "SHOW/DESCRIBE, EXPLAIN, SET/RESET and queries — the remaining " +
        s"kinds are connector/module management out of scope here): $text")
    else throw new IllegalArgumentException(
      s"unparseable statement (expected CREATE TABLE/VIEW/DATABASE/" +
      s"FUNCTION, INSERT, DROP, ALTER, USE, SHOW, DESCRIBE, EXPLAIN, " +
      s"SET/RESET or a SELECT/WITH/VALUES query): $text")
  }

  /** QUERY-shaped text: the statements that produce rows with no side
    * effect (SELECT / WITH-CTE / VALUES / parenthesized). */
  private def isQueryText(t: String): Boolean = {
    val u = t.trim.toUpperCase
    u.startsWith("SELECT") || u.startsWith("WITH") ||
      u.startsWith("VALUES") || u.startsWith("(")
  }

  /** `EXPLAIN [PLAN FOR] <query>` — the reference's explain statement
    * (`TableEnvironment.explainSql`, dispatched by
    * SqlToOperationConverter). QUERY statements only, validated BEFORE
    * anything runs — routing arbitrary inner text back through
    * executeSql would EXECUTE a side-effecting statement (DROP/CREATE/
    * SET mutate state and only then fail the rows check); an INSERT
    * would have to plan its sink without starting it — explain its
    * SELECT body instead. Streaming plans fall back from the formatted
    * physical mode to the logical tree (a streaming DataFrame has no
    * executed plan until a sink starts). */
  private def explain(spark: SparkSession, inner: String): SqlResult = {
    val ins = insertRe.matcher(inner)
    if (ins.matches()) {
      // the reference explains DML too (explainSql over RichSqlInsert):
      // plan the body, header the sink — NOTHING starts or writes
      val d = tables.getOrElse(ins.group(2).toLowerCase, throw
        new IllegalArgumentException(
          s"EXPLAIN INSERT: unknown table '${ins.group(2)}'"))
      val sinkKind =
        if (ins.group(1).equalsIgnoreCase("OVERWRITE")) "overwrite"
        else if (d.primaryKey.nonEmpty)
          s"upsert on (${d.primaryKey.mkString(", ")})"
        else "append"
      val body = SqlFrontend.sql(spark, ins.group(5))
      val plan =
        try body.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case scala.util.control.NonFatal(_) =>
          body.queryExecution.logical.treeString }
      val header = s"== Sink: ${d.name} ($sinkKind, " +
        s"format=${d.format}, path=${d.path}) ==\n"
      val schema =
        StructType(Seq(StructField("plan", StringType, nullable = false)))
      return SqlResult(Some(spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(header + plan)),
        schema)), None)
    }
    require(isQueryText(inner),
      s"EXPLAIN takes a query or INSERT statement — other side-effecting " +
      s"statements are not explainable: $inner")
    val df = SqlFrontend.sql(spark, inner)
    val plan =
      try df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      catch { case scala.util.control.NonFatal(_) =>
        df.queryExecution.logical.treeString }
    SqlResult(Some(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(plan)),
      StructType(Seq(StructField("plan", StringType, nullable = false))))),
      None)
  }

  /** The reference's config keys a migrating user will SET first, mapped
    * onto this engine's confs; unknown keys pass through to spark.conf
    * verbatim (Spark rejects unknown static/reserved keys itself). */
  private def mapConfKey(k: String): String = k.toLowerCase match {
    case "table.exec.state.ttl" => "spark.graft.state.ttl.ms"
    case "table.exec.resource.default-parallelism" =>
      "spark.sql.shuffle.partitions"
    case "table.dynamic-table-options.enabled" =>
      "spark.graft.dynamic.table.options.enabled"
    case _ => k
  }

  /** `SET 'key' = 'value'` — `table.exec.state.ttl` accepts the
    * reference's duration forms (`3600000`, `1 h`, `10 min`, `30 s`)
    * and lands in ms on this engine's TTL conf
    * ([[graft.streaming.StreamSql.ttlFromConf]] reads it). */
  private def setConf(spark: SparkSession, k: String, v: String): SqlResult = {
    val key = mapConfKey(k)
    val value =
      if (key == "spark.graft.state.ttl.ms") durationMs(v).toString else v
    spark.conf.set(key, value)
    done
  }

  private val durRe =
    "(?i)^\\s*(\\d+)\\s*(ms|s|sec|second|seconds|min|minute|minutes|h|hour|hours|d|day|days)?\\s*$".r
  private def durationMs(v: String): Long = v match {
    case durRe(n, unit) =>
      val mult = Option(unit).map(_.toLowerCase) match {
        case None | Some("ms") => 1L
        case Some("s" | "sec" | "second" | "seconds") => 1000L
        case Some("min" | "minute" | "minutes") => 60L * 1000
        case Some("h" | "hour" | "hours") => 3600L * 1000
        case _ => 86400L * 1000
      }
      n.toLong * mult
    case other => throw new IllegalArgumentException(
      s"table.exec.state.ttl expects a duration ('3600000', '1 h', " +
      s"'10 min', '30 s'): $other")
  }

  /** Execute a `;`-separated script; returns one result per statement
    * (one COMBINED result per `BEGIN STATEMENT SET; …; END` block). */
  def executeAll(spark: SparkSession, script: String): Seq[SqlResult] = {
    val stmts = splitStatements(script)
    val out = scala.collection.mutable.ArrayBuffer.empty[SqlResult]
    var i = 0
    while (i < stmts.length) {
      if (beginSetRe.matcher(stmts(i)).matches()) {
        val end = stmts.indexWhere(s => endSetRe.matcher(s).matches(), i + 1)
        require(end > i, "BEGIN STATEMENT SET without a closing END")
        out += executeStatementSet(spark, stmts.slice(i + 1, end))
        i = end + 1
      } else { out += executeSql(spark, stmts(i)); i += 1 }
    }
    out.toSeq
  }

  /** The reference's `TableEnvironment.createStatementSet()` —
    * StatementSet.java, the endorsed multi-sink path: N INSERT
    * statements submitted as one unit. Every member STARTS before any
    * await (concurrent micro-batch scheduling across the sinks); the
    * returned result's await() drains all members then refreshes every
    * target view. Members must be INSERT statements (the reference's
    * `addInsertSql` contract). */
  def executeStatementSet(spark: SparkSession,
                          inserts: Seq[String]): SqlResult = {
    require(inserts.nonEmpty, "empty statement set")
    val parsed = inserts.map { st =>
      // OPTIONS hints apply to set members exactly as to single
      // statements (the same text through executeSql rebinds the scan)
      val m = insertRe.matcher(
        applyOptionsHints(spark, stripLineComments(st).trim))
      require(m.matches(),
        s"statement sets take INSERT statements only (the reference's " +
        s"StatementSet.addInsertSql): $st")
      m
    }
    def runMember(m: java.util.regex.Matcher): SqlResult =
      insertInto(spark, m.group(2), m.group(5),
        overwrite = m.group(1).equalsIgnoreCase("OVERWRITE"),
        partitionSpec = Option(m.group(3)),
        columnList = Option(m.group(4))
          .map(_.split(",").map(_.trim).toSeq))
    val targets = parsed.map(_.group(2).toLowerCase)
    if (targets.distinct.size != targets.size) {
      // two members into the SAME sink: Spark's file sink keeps a
      // single-writer metadata log per path, so concurrent streaming
      // appends to one table race on _spark_metadata — run the members
      // SEQUENTIALLY (start → drain each in statement order). The
      // reference's effect (every member's slice lands) holds; only the
      // scheduling differs, stated here honestly.
      val refreshes = parsed.map { m => val r = runMember(m); r.await(); r }
        .map(_.refresh)
      return SqlResult(None, None, () => refreshes.foreach(_.apply()))
    }
    tryMultiplex(spark, parsed).getOrElse {
      val results = parsed.map(runMember)
      val handles = results.flatMap(r => r.query.toSeq ++ r.queries)
      val refreshes = results.map(_.refresh)
      SqlResult(None, None, () => refreshes.foreach(_.apply()), handles)
    }
  }

  /** The reference's StatementSet plans N INSERTs as ONE job with a
    * SHARED source scan. Spark's general answer is one query per sink
    * (each with its own offset log) — but for the day-two fan-out shape
    * (N STATELESS Calc members over ONE stream table, plain append
    * sinks) the single-job plan IS expressible: one readStream, one
    * foreachBatch that persists the shared batch ONCE and applies each
    * member's projection/filter to it — the source is scanned once per
    * micro-batch regardless of member count. Idempotent across retries:
    * each member lands its slice under a `__sb=<batchId>` partition via
    * dynamic partition overwrite (a replayed batch rewrites the same
    * partition identically — the upsert sink's discipline). Falls back
    * to per-member queries (None) for anything stateful, keyed,
    * overwriting, partitioned or multi-source. */
  private def tryMultiplex(spark: SparkSession,
      parsed: Seq[java.util.regex.Matcher]): Option[SqlResult] = {
    if (parsed.exists(m => !m.group(1).equalsIgnoreCase("INTO") ||
        m.group(3) != null || m.group(4) != null)) return None
    val members = parsed.map { m =>
      val d = tables.get(m.group(2).toLowerCase)
      (d, StreamSql.calcBatchPlan(m.group(5)))
    }
    if (members.exists { case (d, p) => d.isEmpty || p.isEmpty ||
        d.get.primaryKey.nonEmpty || d.get.partitionedBy.nonEmpty ||
        d.get.watermark.isDefined || isCdcFormat(d.get.format) ||
        d.get.checkpoint.isDefined }) return None
    // CDC-format sinks fall back (insertInto raises the read-only
    // error at plan time), as does a declared sink.checkpoint (the
    // combined query would resume that table's standalone offset log
    // and silently skip history for the OTHER members). Same-sink
    // member pairs never reach here — executeStatementSet serializes
    // them before trying the multiplex.
    val srcNames = members.map(_._2.get._1.toLowerCase).distinct
    if (srcNames.size != 1) return None
    val src = StreamSql.streamViewDf(srcNames.head).getOrElse(return None)
    val plans = members.map { case (d, p) => (d.get, p.get._2) }
    // align each member's Calc output to its sink's declared columns
    // ONCE against the source schema (loud plan-time errors), then per
    // batch apply the same transformation
    val aligned: Seq[(TableDef, DataFrame => DataFrame)] = plans.map {
      case (d, f) =>
        val probe = f(src) // schema probe on the streaming frame
        val missing = d.physical.fieldNames.filterNot(c =>
          probe.columns.exists(_.equalsIgnoreCase(c)))
        require(missing.isEmpty,
          s"statement set member into ${d.name}: query result lacks " +
          s"declared column(s) ${missing.mkString(", ")}")
        (d, (b: DataFrame) => f(b).select(d.physical.fields.map(fd =>
          col(fd.name).cast(fd.dataType).as(fd.name)).toSeq: _*))
    }
    val ck =
      java.nio.file.Files.createTempDirectory("graft_ddl_set_ck").toString
    // per-SET token: batch ids restart at 0 for every set, so a later
    // set into the same sink would dynamic-overwrite an earlier set's
    // __sb=<bid> partition — the token keeps partitions unique across
    // sets while a RETRIED batch of THIS set still rewrites its own
    // partition identically (same token, same bid → idempotent)
    val setToken = java.util.UUID.randomUUID().toString.take(8)
    val q = src.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: DataFrame, bid: Long) =>
        val shared = b.persist()
        try aligned.foreach { case (d, f) =>
          f(shared).withColumn("__sb", lit(s"${setToken}_$bid"))
            .write.partitionBy("__sb")
            .option("partitionOverwriteMode", "dynamic")
            .options(d.readerOptions)
            .mode("overwrite").format(d.format).save(d.path)
        } finally { shared.unpersist(); () }
      }
      .start()
    val refresh = () => aligned.foreach { case (d, _) =>
      registerMultiplexView(spark, d) }
    Some(SqlResult(None, Some(q), refresh))
  }

  /** Readable view of a multiplexed-set sink: the batch-partitioned
    * layout read back to the declared columns (`__sb` stays internal —
    * same pattern as the upsert sink's `__bucket`). */
  private def registerMultiplexView(spark: SparkSession, d: TableDef): Unit =
    (if (pathHasData(spark, d.path) || hasMultiplexLayout(spark, d.path))
       // declared schema, not inference — a csv/json sink would
       // otherwise infer _c0/string columns and fail the select (the
       // __sb partition column rides along from the directory names
       // and is dropped by the select)
       spark.read.schema(d.physical).options(d.readerOptions)
         .format(d.format).load(d.path)
         .select(d.physical.fieldNames.map(col).toSeq: _*)
     else spark.createDataFrame(
       new java.util.ArrayList[org.apache.spark.sql.Row](), d.physical)
    ).createOrReplaceTempView(d.name)

  /** `__sb=` batch partitions (underscore-prefixed, invisible to
    * [[pathHasData]]) — the multiplexed set's sink layout. */
  private def hasMultiplexLayout(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("__sb="))
  }

  /** Split on top-level `;` — string-literal-opaque, so a `';'` inside
    * a WITH option value never splits. */
  /** Remove `-- …` line comments, literal-opaque (a `--` inside a
    * quoted option value survives) — scripts carry comments; a `;` or
    * statement keyword inside one must not reach the splitter/dispatch. */
  private[graft] def stripLineComments(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          val end = math.min(SqlFrontend.skipLiteral(s, i), s.length)
          out.append(s.substring(i, end)); i = end
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case c => out.append(c); i += 1
      }
    }
    out.toString
  }

  private[graft] def splitStatements(s0: String): Seq[String] = {
    val s = stripLineComments(s0)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = math.min(SqlFrontend.skipLiteral(s, i), s.length)
        case ';' => out += s.substring(start, i); start = i + 1; i += 1
        case _ => i += 1
      }
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  // ---- CREATE TABLE ------------------------------------------------------

  private val watermarkRe = java.util.regex.Pattern.compile(
    "(?is)^WATERMARK\\s+FOR\\s+(\\w+)\\s+AS\\s+(\\w+)" +
    "(?:\\s*-\\s*INTERVAL\\s+'(\\d+)'\\s+(\\w+))?$")
  // possibly-composite column list — the reference's SqlTableConstraint
  // (flink-sql-parser .../ddl/constraint/SqlTableConstraint.java:60,
  // grammar parserImpls.ftl:615) takes a list, not a single column
  private val pkRe = java.util.regex.Pattern.compile(
    "(?is)^(?:CONSTRAINT\\s+(\\w+)\\s+)?" +
    "PRIMARY\\s+KEY\\s*\\(\\s*(\\w+(?:\\s*,\\s*\\w+)*)\\s*\\)" +
    "\\s+NOT\\s+ENFORCED$")
  private val partitionedByRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*PARTITIONED\\s+BY\\s*\\(\\s*(\\w+(?:\\s*,\\s*\\w+)*)\\s*\\)")
  private val computedRe = java.util.regex.Pattern.compile(
    "(?is)^(\\w+)\\s+AS\\s+(.+)$")
  private val physColRe = java.util.regex.Pattern.compile(
    "(?is)^(\\w+)\\s+(.+?)(\\s+NOT\\s+NULL)?(\\s+COMMENT\\s+'(?:[^']|'')*')?$")

  private val likeRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*LIKE\\s+([\\w.]+)\\s*(?:\\(([^)]*)\\))?\\s*$")

  private def createTable(spark: SparkSession, text: String,
                          m: java.util.regex.Matcher): SqlResult = {
    val ifNotExists = m.group(1) != null
    val name = m.group(2)
    if (ifNotExists && tables.contains(name.toLowerCase)) return done
    // duplicate names reject loudly (the reference's TableAlreadyExist /
    // the flat-namespace contract in the catalog fields' note) — only
    // names THIS catalog owns; a plain Spark temp view is session
    // scope, not a catalog entry
    require(!tables.contains(name.toLowerCase),
      s"CREATE TABLE: table '$name' already exists (DROP TABLE first, " +
      "or CREATE TABLE IF NOT EXISTS to keep it)")
    require(!changelogViews.contains(name.toLowerCase) &&
            !viewBodies.contains(name.toLowerCase),
      s"CREATE TABLE: '$name' already exists as a VIEW")
    // clause order (the reference's SqlCreateTable grammar): optional
    // (column list), optional PARTITIONED BY, optional WITH, optional
    // LIKE base [(merging options)]
    var rest = text.substring(m.end())
    val colsBody =
      if (rest.trim.startsWith("(")) {
        val open = rest.indexOf('(')
        val b = balanced(rest, open)
        rest = rest.substring(open + b.length + 2)
        b
      } else ""
    val pbm = partitionedByRe.matcher(rest)
    val declaredPartitions =
      if (pbm.lookingAt()) {
        val p = pbm.group(1).split(",").map(_.trim).toSeq
        rest = rest.substring(pbm.end()); p
      } else Seq.empty[String]
    val wm = java.util.regex.Pattern
      .compile("(?is)^\\s*WITH\\s*\\(").matcher(rest)
    val declaredOpts =
      if (wm.lookingAt()) {
        val b = balanced(rest, wm.end() - 1)
        rest = rest.substring(wm.end() - 1 + b.length + 2)
        parseOptions(b)
      } else Map.empty[String, String]
    val lk = likeRe.matcher(rest)
    val likeBase: Option[(TableDef, Map[String, String])] =
      if (lk.matches())
        Some((resolveLikeBase(spark, lk.group(1)),
              likeStrategies(Option(lk.group(2)).getOrElse(""))))
      else {
        require(rest.trim.isEmpty,
          s"CREATE TABLE: unparseable trailing clause '${rest.trim}' " +
          s"(expected PARTITIONED BY / WITH / LIKE): $text")
        require(declaredOpts.nonEmpty,
          s"CREATE TABLE needs a WITH ('connector'=…) clause: $text")
        None
      }
    val opts = likeBase match {
      case Some((base, strat)) =>
        mergeLikeOptions(base, strat("OPTIONS"), declaredOpts)
      case None => declaredOpts
    }
    val connector = opts.getOrElse("connector", throw
      new IllegalArgumentException("WITH must declare 'connector'"))
    require(connector.equalsIgnoreCase("filesystem"),
      s"unsupported connector '$connector' — this environment provides " +
      "the filesystem connector (kafka/kinesis need their client jars; " +
      "JDBC tables: sources.JdbcOps)")
    val path = opts.getOrElse("path", throw
      new IllegalArgumentException("filesystem connector needs 'path'"))
    val format = opts.getOrElse("format", "parquet").toLowerCase
    validateFormat(format)
    val known = Set("connector", "path", "format",
      "source.max-files-per-trigger", "sink.checkpoint")
    val readerOptions = opts.filterNot { case (k, _) => known(k) }

    // column list: physical columns / computed columns / watermark / pk
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    val computed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var watermark: Option[(String, String)] = None
    var primaryKey: Seq[String] = Nil
    var pkName: Option[String] = None
    SqlFrontend.splitTop(colsBody).foreach { item =>
      val w = watermarkRe.matcher(item)
      val pk = pkRe.matcher(item)
      val cc = computedRe.matcher(item)
      if (w.matches()) {
        require(w.group(1).equalsIgnoreCase(w.group(2)),
          s"WATERMARK FOR <ts> AS <ts> - INTERVAL … must reference the " +
          s"same column on both sides: $item")
        val delay =
          if (w.group(3) == null) "0 seconds"
          else s"${w.group(3)} ${w.group(4).toLowerCase}"
        require(watermark.isEmpty, "one WATERMARK clause per table")
        watermark = Some((w.group(1), delay))
      } else if (pk.matches()) {
        require(primaryKey.isEmpty, "one PRIMARY KEY per table")
        primaryKey = pk.group(2).split(",").map(_.trim).toSeq
        Option(pk.group(1)).foreach(n => pkName = Some(n))
      } else if (cc.matches() && !isTypeKeyword(cc.group(2))) {
        computed += ((cc.group(1), cc.group(2).trim))
      } else {
        val pc = physColRe.matcher(item)
        require(pc.matches(), s"unparseable column definition: $item")
        fields += StructField(pc.group(1), sqlType(pc.group(2).trim),
          nullable = pc.group(3) == null)
      }
    }
    // LIKE merge: schema/watermark/key/partitions per the reference's
    // MergeTableLikeUtil (flink-table-planner-blink .../operations/
    // MergeTableLikeUtil.java); options merged above
    val (physical, mergedComputed, mergedWatermark, mergedPk, mergedParts) =
      likeBase match {
        case Some((base, strat)) =>
          mergeLikeSchema(base, strat, fields.toSeq, computed.toSeq,
            watermark, primaryKey, declaredPartitions)
        case None =>
          require(fields.nonEmpty,
            s"CREATE TABLE needs physical columns: $text")
          (StructType(fields.toSeq), computed.toSeq, watermark, primaryKey,
           declaredPartitions)
      }
    mergedWatermark.map(_._1).foreach { c =>
      require(physical.fieldNames.exists(_.equalsIgnoreCase(c)) ||
              mergedComputed.exists(_._1.equalsIgnoreCase(c)),
        s"WATERMARK references undeclared column '$c'")
    }
    mergedPk.foreach { c =>
      // the reference requires PHYSICAL key columns (TableSchema's
      // primaryKey validation) — a computed-column key would reach the
      // upsert sink's bucket hash unresolved
      require(physical.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"PRIMARY KEY column '$c' is not a declared physical column" + (
          if (mergedComputed.exists(_._1.equalsIgnoreCase(c)))
            " (computed columns cannot key an upsert table)" else ""))
    }
    mergedParts.foreach { c =>
      require(physical.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"PARTITIONED BY references undeclared physical column '$c'")
    }
    require(mergedParts.isEmpty || mergedPk.isEmpty,
      "PARTITIONED BY and PRIMARY KEY are mutually exclusive here — the " +
      "upsert sink manages its own bucketed layout")

    val d = TableDef(name, physical, mergedComputed, path, format,
      readerOptions, mergedWatermark, mergedPk, mergedParts,
      opts.get("source.max-files-per-trigger"), opts.get("sink.checkpoint"))
    // register FIRST, catalog on success — a rejected CREATE (layout
    // guard, unreadable path) must not leave a phantom catalog entry
    registerTable(spark, d)
    tables(name.toLowerCase) = d
    tableDb(name.toLowerCase) = s"$currentCatalog/$currentDb"
    pkName.foreach(n => pkNames(name.toLowerCase) = n)
    done
  }

  // ---- CREATE TABLE … LIKE (SqlTableLike, parserImpls.ftl:749-806;
  // merge semantics: MergeTableLikeUtil.java) --------------------------

  private def resolveLikeBase(spark: SparkSession, name: String): TableDef =
    tables.getOrElse(name.toLowerCase, throw new IllegalArgumentException(
      s"CREATE TABLE … LIKE: unknown base table '$name'" + (
        if (changelogViews.contains(name.toLowerCase) ||
            spark.catalog.tableExists(name))
          " (it is a VIEW — LIKE takes a table)" else "")))

  private val likeFeatures =
    Seq("CONSTRAINTS", "GENERATED", "OPTIONS", "PARTITIONS", "WATERMARKS")

  /** Parse `INCLUDING ALL EXCLUDING OPTIONS …` (the reference accepts
    * whitespace-separated pairs; commas tolerated) into a per-feature
    * strategy map. Default INCLUDING ALL; OVERWRITING is valid only for
    * GENERATED / OPTIONS / WATERMARKS (SqlTableLike.validate). */
  private def likeStrategies(body: String): Map[String, String] = {
    val tokens = body.trim.toUpperCase.split("[\\s,]+").filter(_.nonEmpty)
    require(tokens.length % 2 == 0,
      s"LIKE options come in <strategy> <feature> pairs " +
      s"(INCLUDING|EXCLUDING|OVERWRITING × ALL|${likeFeatures.mkString("|")}): " +
      s"'$body'")
    val pairs = tokens.grouped(2).map { case Array(s, f) =>
      require(Set("INCLUDING", "EXCLUDING", "OVERWRITING")(s),
        s"LIKE: unknown merging strategy '$s'")
      require(f == "ALL" || likeFeatures.contains(f),
        s"LIKE: unknown feature '$f'")
      require(s != "OVERWRITING" ||
              Set("GENERATED", "OPTIONS", "WATERMARKS")(f),
        s"LIKE: OVERWRITING is not applicable to $f (only GENERATED, " +
        "OPTIONS, WATERMARKS)")
      (s, f)
    }.toSeq
    val default = pairs.collectFirst { case (s, "ALL") => s }
      .getOrElse("INCLUDING")
    likeFeatures.map { f =>
      f -> pairs.collectFirst { case (s, `f`) => s }.getOrElse(default)
    }.toMap
  }

  /** A base TableDef's full WITH-option map, reconstructed (the parsed
    * structural keys + the pass-through reader options). */
  private def fullOptions(d: TableDef): Map[String, String] =
    Map("connector" -> "filesystem", "path" -> d.path,
        "format" -> d.format) ++
      d.maxFilesPerTrigger.map("source.max-files-per-trigger" -> _) ++
      d.checkpoint.map("sink.checkpoint" -> _) ++ d.readerOptions

  /** MergeTableLikeUtil.mergeOptions: INCLUDING inherits all and a
    * redefined key errors; EXCLUDING starts empty; OVERWRITING lets the
    * derived table's WITH win per key. */
  private def mergeLikeOptions(base: TableDef, strategy: String,
                               derived: Map[String, String])
      : Map[String, String] = {
    val start =
      if (strategy == "EXCLUDING") Map.empty[String, String]
      else fullOptions(base)
    derived.foldLeft(start) { case (acc, (k, v)) =>
      if (strategy != "OVERWRITING" && acc.contains(k))
        throw new IllegalArgumentException(
          s"LIKE: there already exists an option '$k' -> '${acc(k)}' in " +
          "the base table — you might want to specify EXCLUDING OPTIONS " +
          "or OVERWRITING OPTIONS")
      acc + (k -> v)
    }
  }

  /** MergeTableLikeUtil's schema merge: physical columns always
    * inherit (a redefinition errors); computed columns and the
    * watermark follow GENERATED / WATERMARKS strategies (OVERWRITING
    * lets the derived definition win); PRIMARY KEY follows CONSTRAINTS
    * (INCLUDING/EXCLUDING only, both-defined errors); PARTITIONED BY
    * follows PARTITIONS (both-defined errors unless EXCLUDING). */
  private def mergeLikeSchema(base: TableDef, strat: Map[String, String],
      declaredFields: Seq[StructField], declaredComputed: Seq[(String, String)],
      declaredWatermark: Option[(String, String)], declaredPk: Seq[String],
      declaredPartitions: Seq[String])
      : (StructType, Seq[(String, String)], Option[(String, String)],
         Seq[String], Seq[String]) = {
    val inheritedComputed =
      if (strat("GENERATED") == "EXCLUDING") Seq.empty else base.computed
    val basePhys = base.physical.fieldNames.map(_.toLowerCase).toSet
    val inheritedCompNames = inheritedComputed.map(_._1.toLowerCase).toSet
    declaredFields.foreach { f =>
      require(!basePhys(f.name.toLowerCase) &&
              !inheritedCompNames(f.name.toLowerCase),
        s"LIKE: a column named '${f.name}' already exists in the base table")
    }
    declaredComputed.foreach { case (n, _) =>
      require(!basePhys(n.toLowerCase),
        s"LIKE: computed column '$n' cannot overwrite a physical column " +
        "of the base table")
      require(!inheritedCompNames(n.toLowerCase) ||
              strat("GENERATED") == "OVERWRITING",
        s"LIKE: a generated column named '$n' already exists in the base " +
        "table — you might want to specify EXCLUDING GENERATED or " +
        "OVERWRITING GENERATED")
    }
    // an OVERWRITING redefinition keeps its base position (later
    // inherited computed columns may reference it in the eval fold)
    val mergedComputed =
      inheritedComputed.map { case (n, e) =>
        declaredComputed.find(_._1.equalsIgnoreCase(n)).getOrElse((n, e))
      } ++ declaredComputed.filterNot(c =>
        inheritedCompNames(c._1.toLowerCase))
    val physical = StructType(base.physical.fields.toSeq ++ declaredFields)

    val inheritedW =
      if (strat("WATERMARKS") == "EXCLUDING") None else base.watermark
    val watermark = (declaredWatermark, inheritedW) match {
      case (Some(w), Some(_)) =>
        require(strat("WATERMARKS") == "OVERWRITING",
          "LIKE: there already exists a watermark spec in the base table " +
          "— you might want to specify EXCLUDING WATERMARKS or " +
          "OVERWRITING WATERMARKS")
        Some(w)
      case (Some(w), None) => Some(w)
      case (None, i) => i
    }

    val inheritedPk =
      if (strat("CONSTRAINTS") == "INCLUDING") base.primaryKey
      else Seq.empty
    require(declaredPk.isEmpty || inheritedPk.isEmpty,
      "LIKE: the base table already has a primary key — you might want " +
      "to specify EXCLUDING CONSTRAINTS")
    val pk = if (declaredPk.nonEmpty) declaredPk else inheritedPk

    require(declaredPartitions.isEmpty || base.partitionedBy.isEmpty ||
            strat("PARTITIONS") == "EXCLUDING",
      "LIKE: the base table already has partitions defined — you might " +
      "want to specify EXCLUDING PARTITIONS")
    val parts =
      if (declaredPartitions.nonEmpty) declaredPartitions
      else if (strat("PARTITIONS") == "EXCLUDING") Seq.empty
      else base.partitionedBy

    (physical, mergedComputed, watermark, pk, parts)
  }

  /** Validate + register a TableDef's readable/streamable surface (the
    * CREATE TABLE registration switch; also the re-registration path
    * for ALTER TABLE RENAME/SET). */
  private def registerTable(spark: SparkSession, d: TableDef): Unit = {
    if (isCdcFormat(d.format)) {
      require(d.watermark.isEmpty,
        s"CDC format '${d.format}' tables are CHANGELOG sources — they " +
        "carry op kinds, not event time; a WATERMARK clause does not " +
        "apply (window their downstream aggregates on a payload " +
        "timestamp via the changelog routes instead)")
      require(d.partitionedBy.isEmpty,
        s"CDC format '${d.format}' tables are read-only changelog sources " +
        "— PARTITIONED BY applies to sinks")
      registerCdcTable(spark, d)
    }
    else if (d.readerOptions.keySet.exists(cdcOptionKeys)) {
      val bad = d.readerOptions.keySet.filter(cdcOptionKeys).mkString(", ")
      throw new IllegalArgumentException(
        s"option(s) $bad apply only to CDC formats, not '${d.format}'")
    }
    else if (d.watermark.isDefined) registerStreamTable(spark, d)
    else if (d.primaryKey.nonEmpty) {
      // upsert table: re-attach to an existing bucketed layout (or
      // register the empty live view) — a restart / re-CREATE must see
      // the merged table again. Pre-existing PLAIN files would mix
      // layouts and corrupt the merge — reject loudly.
      require(!pathHasData(spark, d.path),
        s"CREATE TABLE ${d.name}: path '${d.path}' already holds non-upsert " +
        "data files but the table declares a PRIMARY KEY — the upsert " +
        "sink's bucketed layout cannot mix with plain files (point the " +
        "table at its own directory, or drop the PRIMARY KEY)")
      registerUpsertView(spark, d)
    }
    else if (hasUpsertLayout(spark, d.path))
      throw new IllegalArgumentException(
        s"CREATE TABLE ${d.name}: path '${d.path}' holds an upsert-table " +
        "layout (__bucket= partitions) — declare its PRIMARY KEY (…) NOT " +
        "ENFORCED to re-attach (a raw read would expose retracted rows " +
        "and internal columns)")
    else if (pathHasData(spark, d.path)) registerBatchView(spark, d)
  }

  /** Apply computed columns in declaration-independent order (each may
    * reference physical columns and earlier computed ones). */
  private def withComputed(df: DataFrame, d: TableDef): DataFrame =
    d.computed.foldLeft(df) { case (acc, (n, e)) => acc.withColumn(n, expr(e)) }

  private def registerStreamTable(spark: SparkSession, d: TableDef): Unit = {
    val reader = spark.readStream.schema(d.physical).options(d.readerOptions)
    val withTrigger = d.maxFilesPerTrigger
      .map(k => reader.option("maxFilesPerTrigger", k)).getOrElse(reader)
    val df = withComputed(withTrigger.format(d.format).load(d.path), d)
    val (tsCol, delay) = d.watermark.get
    // a SINGLE-column key doubles as the stream view's rowId (the rank
    // family's row identity); a composite key has no single rowId slot —
    // the routes that need one say so loudly at their own front door
    val rowId = if (d.primaryKey.size == 1) d.primaryKey.headOption else None
    StreamSql.registerStream(d.name, df, tsCol, delay, rowId)
  }

  private def validateFormat(format: String): Unit =
    require(Set("parquet", "csv", "json", "orc",
                "debezium-json", "canal-json")(format),
      s"unsupported format '$format' " +
      "(parquet/csv/json/orc/debezium-json/canal-json)")

  private def isCdcFormat(format: String): Boolean =
    format == "debezium-json" || format == "canal-json"

  /** Format-scoped CDC factory options (the reference's
    * DebeziumJsonFormatFactory / CanalJsonFormatFactory ConfigOptions,
    * keyed `<format>.<option>` as in `'debezium-json.schema-include' =
    * 'true'`). Consumed here — never forwarded to the file reader. */
  private val cdcOptionKeys = Set(
    "debezium-json.schema-include",
    "debezium-json.ignore-parse-errors",
    "canal-json.ignore-parse-errors")

  private def cdcFlag(d: TableDef, key: String): Boolean =
    d.readerOptions.get(key).exists { v =>
      require(v == "true" || v == "false",
        s"option '$key' takes 'true'|'false', got '$v'")
      v.toBoolean
    }

  /** A CDC-format table: the monitoring file source over the CDC
    * tool's JSON-lines envelopes, decoded expression-only into a
    * CHANGELOG view ([[graft.sources.CdcFormats]]) — the reference's
    * debezium-json / canal-json changelog formats. A single-column
    * PRIMARY KEY doubles as the changelog's rowId (upsert identity for
    * the rank/order-sensitive routes). */
  private def registerCdcTable(spark: SparkSession, d: TableDef): Unit = {
    import graft.sources.CdcFormats
    d.readerOptions.keys.filter(_.contains(".")).foreach { k =>
      require(!cdcOptionKeys(k) || k.startsWith(d.format + "."),
        s"option '$k' does not apply to format '${d.format}'")
    }
    val schemaInclude = cdcFlag(d, "debezium-json.schema-include")
    val ignoreErrors = cdcFlag(d, s"${d.format}.ignore-parse-errors")
    val readerOpts = d.readerOptions -- cdcOptionKeys
    val env = if (d.format == "debezium-json")
      CdcFormats.debeziumEnvelope(d.physical, schemaInclude)
    else CdcFormats.canalEnvelope(d.physical)
    val reader = spark.readStream.schema(env).options(readerOpts)
    val withTrigger = d.maxFilesPerTrigger
      .map(k => reader.option("maxFilesPerTrigger", k)).getOrElse(reader)
    val raw = withTrigger.json(d.path)
    val changelog = if (d.format == "debezium-json")
      CdcFormats.debeziumChangelog(raw, d.physical, schemaInclude,
        ignoreErrors)
    else CdcFormats.canalChangelog(raw, d.physical, ignoreErrors)
    val rowId = if (d.primaryKey.size == 1) d.primaryKey.headOption else None
    StreamSql.registerChangelog(d.name, changelog, kindCol = "row_kind",
      rowId = rowId)
  }

  private def registerBatchView(spark: SparkSession, d: TableDef): Unit =
    withComputed(
      spark.read.schema(d.physical).options(d.readerOptions)
        .format(d.format).load(d.path), d)
      .createOrReplaceTempView(d.name)

  /** Does the table directory hold at least one data file? Probed
    * through the Hadoop FileSystem API so hdfs://s3a:// paths resolve
    * on a real cluster exactly like local ones here, skipping hidden/_
    * entries at every level (`_spark_metadata`, `_SUCCESS`, dotfiles).
    * Short-circuits on the first file found, so the walk cost is
    * bounded by the directories BEFORE the first data file (one
    * listing for any populated layout). The depth bound exists only as
    * a cycle/runaway guard — hitting it RAISES instead of silently
    * reporting the tree empty (a quietly-skipped deep Hive layout
    * would register the table with no readable view). */
  private def pathHasData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
    def probe(dir: org.apache.hadoop.fs.Path, depth: Int): Boolean =
      fs.listStatus(dir).exists { st =>
        visible(st.getPath.getName) &&
          (st.isFile || (st.isDirectory && {
            if (depth <= 0) throw new IllegalArgumentException(
              s"path '$path' nests directories deeper than 64 levels " +
              s"(at ${st.getPath}) — refusing to probe further; point " +
              "the table at the partition root of an actual table layout")
            probe(st.getPath, depth - 1)
          }))
      }
    fs.exists(p) && probe(p, 64)
  }

  /** Does the path hold this engine's upsert-sink layout (`__bucket=`
    * partition directories — underscore-prefixed, so [[pathHasData]]
    * deliberately does NOT see them)? One directory listing. */
  private def hasUpsertLayout(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("__bucket="))
  }

  // ---- CREATE VIEW -------------------------------------------------------

  private def createView(spark: SparkSession, name: String,
                         query: String,
                         orReplace: Boolean = true): SqlResult = {
    // duplicate semantics (the reference's catalog): plain CREATE VIEW
    // of an existing DDL view rejects; OR REPLACE replaces. Internal
    // callers (ALTER VIEW re-derivation) replace by construction.
    require(!tables.contains(name.toLowerCase),
      s"CREATE VIEW: '$name' already exists as a TABLE")
    require(orReplace || !(changelogViews.contains(name.toLowerCase) ||
                           viewBodies.contains(name.toLowerCase)),
      s"CREATE VIEW: view '$name' already exists (use CREATE OR " +
      "REPLACE VIEW, or DROP VIEW first)")
    val res = SqlFrontend.sql(spark, query) // analyzed BEFORE any mutation
    // replacing: clear the old registration kind first, so a
    // changelog→batch (or reverse) replacement leaves no stale surface
    if (changelogViews.contains(name.toLowerCase) ||
        viewBodies.contains(name.toLowerCase))
      dropViewSurfaces(spark, name)
    if (!res.isStreaming) res.createOrReplaceTempView(name)
    else if (res.columns.contains("row_kind")) {
      // a routed changelog result: register for downstream statements;
      // row_ord orders sink materialization, not operators — dropped.
      // For single-key GROUP BY bodies the group key IS the result's
      // upsert key (one live row per key) — registered as the rowId so
      // rank/filter statements can chain on the view (the narrow slice
      // of the reference's FlinkRelMdUniqueKeys inference)
      val rowId = StreamSql.groupKeyAlias(query)
        .filter(a => res.columns.contains(a))
      StreamSql.registerChangelog(name,
        if (res.columns.contains("row_ord")) res.drop("row_ord") else res,
        kindCol = "row_kind", rowId = rowId)
      changelogViews(name.toLowerCase) = true
    } else throw new IllegalArgumentException(
      s"CREATE VIEW '$name': the query produced an append-only STREAM, " +
      "which needs event-time metadata (watermark column + delay) a " +
      "view body cannot declare — register it via " +
      "StreamSql.registerStream(name, df, tsCol, delay[, rowId]), or " +
      "make the source a CREATE TABLE … WATERMARK FOR … table")
    viewBodies(name.toLowerCase) = query // ALTER VIEW re-derives from it
    done
  }

  // ---- INSERT INTO -------------------------------------------------------

  /** `k = 'v', …` static PARTITION spec items. */
  private def parsePartitionSpec(s: String): Seq[(String, String)] =
    SqlFrontend.splitTop(s).map { item =>
      val m = java.util.regex.Pattern.compile(
        "(?is)^\\s*(\\w+)\\s*=\\s*'((?:[^']|'')*)'\\s*$").matcher(item)
      require(m.matches(),
        s"unparseable PARTITION spec item (expected col='value'): $item")
      (m.group(1), m.group(2).replace("''", "'"))
    }

  private def insertInto(spark: SparkSession, target: String,
                         query: String, overwrite: Boolean,
                         partitionSpec: Option[String],
                         columnList: Option[Seq[String]] = None): SqlResult = {
    val verb = if (overwrite) "INSERT OVERWRITE" else "INSERT INTO"
    val d = tables.getOrElse(target.toLowerCase, throw
      new IllegalArgumentException(
        s"$verb unknown table '$target' — CREATE TABLE it first " +
        "(filesystem connector)"))
    require(!isCdcFormat(d.format),
      s"$verb $target: a '${d.format}' table is a read-only CHANGELOG " +
      "SOURCE (the CDC tool writes its envelope log) — insert into a " +
      "parquet/csv/json/orc table instead")
    val resQ = SqlFrontend.sql(spark, query)
    // static partition values: pinned literals the query must NOT also
    // produce (the reference's RichSqlInsert static partition check)
    val statics = partitionSpec.map(parsePartitionSpec).getOrElse(Nil)
    // result-column naming, the reference's RichSqlInsert rules:
    //  - explicit column list → POSITIONAL rename onto the listed
    //    declared columns (unlisted nullable columns fill with NULL);
    //  - a bare VALUES query → positional onto the declared columns
    //    (minus any static partition columns) — VALUES carries no
    //    usable names of its own;
    //  - otherwise BY NAME.
    val res0 = columnList match {
      case Some(cols) =>
        cols.foreach(c => require(
          d.physical.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"$verb $target: column list names undeclared column '$c'"))
        require(resQ.columns.length == cols.length,
          s"$verb $target (${cols.mkString(", ")}): query result has " +
          s"${resQ.columns.length} column(s) for a ${cols.length}-column " +
          "list")
        resQ.toDF(cols: _*)
      case None if query.trim.toUpperCase.startsWith("VALUES") =>
        val declared = d.physical.fieldNames.filterNot(f =>
          statics.exists(_._1.equalsIgnoreCase(f)))
        require(resQ.columns.length == declared.length,
          s"$verb $target: VALUES has ${resQ.columns.length} column(s) " +
          s"for ${declared.length} declared column(s) " +
          s"(${declared.mkString(", ")})")
        resQ.toDF(declared.toIndexedSeq: _*)
      case None => resQ
    }
    statics.foreach { case (k, _) =>
      require(d.partitionedBy.exists(_.equalsIgnoreCase(k)),
        s"$verb $target: PARTITION ($k=…) is not a PARTITIONED BY " +
        s"column (declared: ${d.partitionedBy.mkString(", ")})")
      require(!res0.columns.exists(_.equalsIgnoreCase(k)),
        s"$verb $target: static partition column '$k' must not also " +
        "appear in the query result")
    }
    val res1 = statics.foldLeft(res0) { case (acc, (k, v)) =>
      val f = d.physical.fields.find(_.name.equalsIgnoreCase(k)).get
      acc.withColumn(f.name, lit(v).cast(f.dataType))
    }
    // with an explicit column list, unlisted NULLABLE columns fill with
    // NULL (the reference's partial insert); NOT NULL columns reject
    val res = if (columnList.isEmpty) res1 else
      d.physical.fields.filterNot(f =>
        res1.columns.exists(_.equalsIgnoreCase(f.name)))
        .foldLeft(res1) { (acc, f) =>
          require(f.nullable,
            s"$verb $target: column '${f.name}' is NOT NULL and absent " +
            "from the insert's column list")
          acc.withColumn(f.name, lit(null).cast(f.dataType))
        }
    // match BY NAME to the declared columns, cast to declared types
    val missing = d.physical.fieldNames.filterNot(f =>
      res.columns.exists(_.equalsIgnoreCase(f)))
    require(missing.isEmpty,
      s"$verb $target: query result lacks declared column(s) " +
      s"${missing.mkString(", ")} (result columns: " +
      s"${res.columns.mkString(", ")})")
    val aligned = res.select(d.physical.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    require(!(overwrite && aligned.isStreaming),
      s"INSERT OVERWRITE $target takes a bounded (batch) query — a " +
      "streaming result appends or upserts (the reference likewise " +
      "restricts OVERWRITE to batch jobs)")
    require(!(overwrite && d.primaryKey.nonEmpty),
      s"INSERT OVERWRITE into PRIMARY KEY table '$target' is " +
      "unsupported — upsert tables merge by key (DROP and re-create " +
      "the table to rebuild it)")

    if (!aligned.isStreaming && d.primaryKey.nonEmpty) {
      // BATCH upsert — `MERGE INTO … WHEN MATCHED UPDATE` (SCD1) from
      // plain SQL text: the batch result merges by (possibly composite)
      // PRIMARY KEY over the existing table (latest statement wins per
      // key), exactly the reference's batch INSERT INTO an upsert
      // table sink.
      graft.streaming.StreamSinks.applyBatch(
        withUpsertOrd(spark, d,
          aligned.withColumn("__kind", lit(graft.streaming.Changelog.Insert))),
        d.path, d.primaryKey, "__ord", buckets = 64)
      registerUpsertView(spark, d)
      done
    } else if (!aligned.isStreaming) {
      val w0 = aligned.write.options(d.readerOptions).format(d.format)
      val w = if (d.partitionedBy.nonEmpty)
        w0.partitionBy(d.partitionedBy: _*) else w0
      if (overwrite)
        // Flink filesystem-connector OVERWRITE semantics: a partitioned
        // table replaces ONLY the partitions present in the result
        // (dynamic, writer-scoped so the session conf is untouched);
        // an unpartitioned table is replaced whole. Idempotent: the
        // same backfill re-run reproduces identical contents.
        w.option("partitionOverwriteMode",
            if (d.partitionedBy.nonEmpty) "dynamic" else "static")
          .mode("overwrite").save(d.path)
      else w.mode("append").save(d.path)
      registerBatchView(spark, d) // refresh the readable view
      done
    } else if (d.primaryKey.nonEmpty) {
      // UPSERT SINK — the reference's primary-keyed dynamic table sink
      // (UpsertStreamTableSink semantics): per micro-batch the HIGHEST
      // row_ord per key wins (StreamSinks.applyBatch — the
      // deterministic idempotent bucket merge), and the readable view
      // hides keys whose latest op is a retraction. A CHANGELOG result
      // rides its row_kind/row_ord as internal columns; an INSERT-ONLY
      // streaming result upserts each row as +I (the reference's
      // append-into-upsert-sink shape — NOT a plain file append, which
      // would bypass the keyed merge and interleave non-bucketed files
      // with the bucketed layout). One exchange per batch on the
      // bucket hash; per-batch cost follows the batch's key spread,
      // not table size.
      val hasKind = res.columns.contains("row_kind")
      val hasOrd = res.columns.contains("row_ord")
      // per-key change order: a fresh table-scoped EPOCH per
      // micro-batch (monotone across batches AND across successive
      // INSERT statements — a second statement's batch ids restart at
      // 0, so batch id alone would lose to prior data) combined with
      // the per-key within-batch order — a key's changes in one
      // micro-batch leave the keyed operator consecutively from one
      // task, so within-batch order is preserved; all the merge needs
      // is per-KEY monotonicity. A route-emitted row_ord refines the
      // within-epoch order when present.
      val upDf = res.select(d.physical.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq ++ Seq(
        (if (hasKind) col("row_kind").cast("string")
         else lit(graft.streaming.Changelog.Insert)).as("__kind")) ++
        (if (hasOrd) Seq(col("row_ord").cast("long").as("__ord0")) else Nil): _*)
      val ck = d.checkpoint.getOrElse(
        java.nio.file.Files.createTempDirectory("graft_ddl_ck").toString)
      val q = upDf.writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          graft.streaming.StreamSinks.applyBatch(
            withUpsertOrd(spark, d, b), d.path, d.primaryKey, "__ord",
            buckets = 64)
        }
        .start()
      SqlResult(None, Some(q), () => registerUpsertView(spark, d))
    } else {
      // plain APPEND sink — only an insert-only result may land here.
      // A changelog result would physically start (the operators emit
      // OutputMode.Append) and silently write every intermediate
      // +I/-U/+U/-D as an ordinary data row — the reference fails
      // loudly instead (StreamExecSink's changelog-mode validation:
      // "doesn't support consuming update changes"), and so does this.
      require(!res.columns.contains("row_kind") ||
              d.physical.fieldNames.exists(_.equalsIgnoreCase("row_kind")),
        s"INSERT INTO $target: the query produces UPDATE changes " +
        "(row_kind) but the sink declares no PRIMARY KEY and no " +
        "row_kind column — a plain append sink doesn't support " +
        "consuming update changes. Declare PRIMARY KEY (…) NOT " +
        "ENFORCED on the sink to materialize by key, or declare " +
        "row_kind/row_ord columns to land the raw changelog")
      val ck = d.checkpoint.getOrElse(
        java.nio.file.Files.createTempDirectory("graft_ddl_ck").toString)
      // foreachBatch batch-append, NOT the native file sink: the file
      // sink's per-PATH _spark_metadata log marks batch ids committed,
      // so a SECOND streaming INSERT into the same table (fresh
      // checkpoint, batch ids restarting at 0) would silently SKIP its
      // writes — and batch reads of a metadata-bearing directory ignore
      // files the log doesn't list, hiding batch-INSERT appends too.
      // The plain flat layout stays identical to the batch append arm.
      // Trade-off, stated honestly: a micro-batch retried after a
      // mid-write crash could append twice (the bounded-replay await
      // drains each batch once; the reference's filesystem sink rolls
      // in-progress files via its own checkpoint protocol instead).
      val q = aligned.writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val w0 = b.write.options(d.readerOptions).format(d.format)
          val w = if (d.partitionedBy.nonEmpty)
            w0.partitionBy(d.partitionedBy: _*) else w0
          w.mode("append").save(d.path)
        }
        .start()
      SqlResult(None, Some(q), () => registerBatchView(spark, d))
    }
  }

  // table-scoped upsert epochs, keyed by PATH (not name — a DROP +
  // re-CREATE of a same-named table at a different path must not reuse
  // the old counter): monotone within the process; seeded past the
  // table's highest stored epoch on first use, so ords from a previous
  // process (or a previous INSERT statement) never outrank new data.
  // Process-wide like the catalog itself; DROP TABLE also invalidates
  // the entry so a re-created table re-seeds from what's on disk.
  private val upsertEpochs =
    TrieMap.empty[String, java.util.concurrent.atomic.AtomicLong]

  private def nextUpsertEpoch(spark: SparkSession, d: TableDef): Long =
    upsertEpochs.getOrElseUpdate(d.path, {
      val seed =
        try {
          val m = spark.read.parquet(d.path).agg(max(col("__ord"))).head()
          if (m.isNullAt(0)) 0L else (m.getLong(0) >> 44) + 1L
        } catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      new java.util.concurrent.atomic.AtomicLong(seed)
    }).incrementAndGet()

  /** Attach the `__ord` merge key: (fresh epoch << 44) + a per-key
    * within-batch order. A route-emitted `row_ord` is only meaningful
    * as a PER-KEY order WITHIN the batch — and can exceed 2^44 outright
    * (TTL-tracking routes seed ord from the wall clock, ~2^60), which
    * would dwarf any later statement's epoch and silently lose its
    * merge — so it is RESCALED to a dense per-key rank before the epoch
    * is added (bounded by the key's changes in one micro-batch, far
    * under 2^44). Without `__ord0` the partition-local monotonic id is
    * the within-batch order (a key's changes leave the keyed operator
    * consecutively from one task; assumes < 2^11 sink partitions so the
    * id stays inside its 44 bits — the local profile by construction;
    * at cluster scale a table format's MERGE INTO replaces this sink
    * mechanically, see StreamSinks' object doc). */
  private def withUpsertOrd(spark: SparkSession, d: TableDef,
                            b: DataFrame): DataFrame = {
    val epoch = lit(nextUpsertEpoch(spark, d)) * lit(1L << 44)
    if (b.columns.contains("__ord0")) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(d.primaryKey.map(col): _*).orderBy(col("__ord0"))
      b.withColumn("__ord", epoch + row_number().over(w).cast("long"))
        .drop("__ord0")
    } else b.withColumn("__ord", epoch + monotonically_increasing_id())
  }

  /** Readable view of an upsert table: the materialized live rows —
    * keys whose latest op is +I/+U, projected to the declared columns
    * (`__kind`/`__ord`/`__bucket` stay internal). A drained sink that
    * never received a batch registers an empty view of the declared
    * schema (the read-or-empty pattern applyBatch itself uses —
    * pathHasData would skip the underscore-prefixed `__bucket=`
    * partition directories). */
  private def registerUpsertView(spark: SparkSession, d: TableDef): Unit =
    (try graft.streaming.StreamSinks.readUpsertTable(spark, d.path)
       .filter(col("__kind").isin(graft.streaming.Changelog.Insert,
                                  graft.streaming.Changelog.UpdateAfter))
       .select(d.physical.fieldNames.map(col).toSeq: _*)
     catch { case _: org.apache.spark.sql.AnalysisException =>
       spark.createDataFrame(
         new java.util.ArrayList[org.apache.spark.sql.Row](), d.physical)
     }).createOrReplaceTempView(d.name)

  // ---- DROP / SHOW / DESCRIBE --------------------------------------------

  /** Kind-respecting DROP: `DROP TABLE` removes only a registered
    * filesystem table (and its temp/stream registrations); `DROP VIEW`
    * removes only a view (changelog or temp). A kind mismatch is a loud
    * error — a typo'd kind must never destroy the other object. */
  private def drop(spark: SparkSession, kind: String, name: String,
                   ifExists: Boolean): SqlResult = {
    val key = name.toLowerCase
    val isTable = tables.contains(key)
    val isView = changelogViews.contains(key) ||
      (!isTable && spark.catalog.tableExists(name))
    val wantTable = kind.equalsIgnoreCase("TABLE")
    if (wantTable && !isTable && isView) throw new IllegalArgumentException(
      s"DROP TABLE: '$name' is a VIEW (use DROP VIEW)")
    if (!wantTable && !isView && isTable) throw new IllegalArgumentException(
      s"DROP VIEW: '$name' is a TABLE (use DROP TABLE)")
    val known = isTable || isView
    if (!known && !ifExists) throw new IllegalArgumentException(
      s"DROP $kind: unknown name '$name'")
    if (wantTable && isTable) {
      tables.remove(key).foreach(t => upsertEpochs.remove(t.path))
      tableDb.remove(key)
      pkNames.remove(key) // a re-CREATE must not inherit the old name
      unregisterSurfaces(spark, name)
    } else if (!wantTable && isView) {
      changelogViews.remove(key)
      viewBodies.remove(key)
      StreamSql.dropChangelog(name)
      spark.catalog.dropTempView(name)
    }
    done
  }

  /** Drop every registered query surface for a catalog name (temp view
    * / stream registration / changelog registration) — the table's
    * FILES are untouched. */
  private def unregisterSurfaces(spark: SparkSession, name: String): Unit = {
    StreamSql.dropStream(name)
    StreamSql.dropChangelog(name) // CDC-format tables register here
    spark.catalog.dropTempView(name)
    // OPTIONS-hint aliases derived from this table are now stale
    // (DROP/ALTER changed the base definition) — drop them too; the
    // next hinted query re-registers against the current definition
    val prefix = name.toLowerCase + "__opt"
    hintRegs.keys.filter(_.startsWith(prefix)).foreach { a =>
      hintRegs.remove(a)
      StreamSql.dropStream(a); StreamSql.dropChangelog(a)
      spark.catalog.dropTempView(a)
    }
  }

  /** `ALTER TABLE t RENAME TO t2` — the reference's SqlAlterTableRename
    * (parserImpls.ftl:396-412): the catalog entry and every registered
    * surface move to the new name; the table's files stay where they
    * are (same path — an upsert table keeps its epoch ordering, which
    * is keyed by path). */
  private def alterRename(spark: SparkSession, name: String,
                          to: String): SqlResult = {
    val key = name.toLowerCase
    val d = tables.getOrElse(key, throw new IllegalArgumentException(
      s"ALTER TABLE: unknown table '$name'" + (
        if (changelogViews.contains(key) || spark.catalog.tableExists(name))
          " (it is a VIEW — ALTER TABLE applies to tables)" else "")))
    val toKey = to.toLowerCase
    require(toKey != key, s"ALTER TABLE RENAME: '$name' → '$to' is a no-op")
    require(!tables.contains(toKey) && !changelogViews.contains(toKey) &&
            !spark.catalog.tableExists(to),
      s"ALTER TABLE RENAME: target name '$to' already exists")
    unregisterSurfaces(spark, name)
    val d2 = d.copy(name = to)
    try {
      registerTable(spark, d2)
      tables.remove(key)
      tables(toKey) = d2
      tableDb.remove(key).foreach(db => tableDb(toKey) = db)
      pkNames.remove(key).foreach(n => pkNames(toKey) = n)
    } catch { case t: Throwable =>
      registerTable(spark, d) // restore the old surface, then fail loudly
      throw t
    }
    done
  }

  /** `ALTER TABLE t SET ('k'='v', …)` — the reference's
    * SqlAlterTableProperties (parserImpls.ftl:413-421): the listed
    * properties merge over the declaration (path, format, reader
    * options, trigger/checkpoint knobs) and the table re-registers;
    * the schema (columns/watermark/key/partitioning) is not a
    * property and cannot change here. 'connector' stays filesystem. */
  private def alterSet(spark: SparkSession, name: String,
                       optsBody: String): SqlResult = {
    val key = name.toLowerCase
    val d = tables.getOrElse(key, throw new IllegalArgumentException(
      s"ALTER TABLE: unknown table '$name'"))
    val opts = parseOptions(optsBody)
    require(opts.nonEmpty, "ALTER TABLE SET: empty property list")
    val d2 = mergedDef(d, opts, "ALTER TABLE SET")
    unregisterSurfaces(spark, name)
    try {
      registerTable(spark, d2)
      tables(key) = d2
    } catch { case t: Throwable =>
      registerTable(spark, d) // restore the old surface, then fail loudly
      throw t
    }
    done
  }

  /** A TableDef with `opts` merged over its declaration (per-key
    * override — FlinkHints.mergeTableOptions / ALTER TABLE SET share
    * this): structural keys re-derive path/format/trigger knobs,
    * everything else lands in the reader options; the connector is
    * immutable; the schema is not a property. */
  private def mergedDef(d: TableDef, opts: Map[String, String],
                        verb: String): TableDef = {
    opts.get("connector").foreach(c => require(
      c.equalsIgnoreCase("filesystem"),
      s"$verb: 'connector' is immutable (filesystem), got '$c'"))
    val format2 = opts.getOrElse("format", d.format).toLowerCase
    validateFormat(format2)
    val structural = Set("connector", "path", "format",
      "source.max-files-per-trigger", "sink.checkpoint")
    d.copy(
      path = opts.getOrElse("path", d.path),
      format = format2,
      readerOptions = d.readerOptions ++ (opts -- structural),
      maxFilesPerTrigger = opts.get("source.max-files-per-trigger")
        .orElse(d.maxFilesPerTrigger),
      checkpoint = opts.get("sink.checkpoint").orElse(d.checkpoint))
  }

  // ---- dynamic table options: the OPTIONS hint (FLIP-113) ------------------

  // alias names already registered for a (table × hinted-options) pair
  private val hintRegs = TrieMap.empty[String, Boolean]

  private val optionsHintBodyRe = java.util.regex.Pattern.compile(
    "(?is)^OPTIONS\\s*\\((.*)\\)$", java.util.regex.Pattern.DOTALL)

  /** Rewrite hinted scans — a table name followed by a slash-star-plus
    * `OPTIONS('k'='v', …)` hint comment — (outside string literals) to
    * internal alias registrations of the table with the
    * hinted options merged over its WITH clause — the reference's
    * dynamic table options (FlinkHints.mergeTableOptions; enforcement
    * in CatalogSourceTable.toRel). Guarded by the reference's flag:
    * `SET 'table.dynamic-table-options.enabled' = 'true'` first, else
    * the hint rejects with the reference's exact error shape. Sink-side
    * hints (after INSERT INTO/OVERWRITE) reject loudly — dynamic
    * options here are a SOURCE surface. Non-OPTIONS hint comments pass
    * through untouched (Spark sees them as its own join hints). */
  private[graft] def applyOptionsHints(spark: SparkSession,
                                       text: String): String = {
    if (!text.contains("/*+")) return text
    val out = new StringBuilder
    var i = 0
    var last = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'') i = math.min(SqlFrontend.skipLiteral(text, i), text.length)
      else if (c == '/' && i + 2 < text.length &&
               text.charAt(i + 1) == '*' && text.charAt(i + 2) == '+') {
        val close = text.indexOf("*/", i + 3)
        require(close > 0, s"unterminated hint comment at offset $i: $text")
        val body = text.substring(i + 3, close).trim
        val m = optionsHintBodyRe.matcher(body)
        if (m.matches()) {
          // the hinted table is the identifier immediately before the hint
          var e = i - 1
          while (e >= 0 && Character.isWhitespace(text.charAt(e))) e -= 1
          var s0 = e
          while (s0 >= 0 && (text.charAt(s0).isLetterOrDigit ||
                 text.charAt(s0) == '_' || text.charAt(s0) == '.')) s0 -= 1
          val tbl = text.substring(s0 + 1, e + 1)
          require(tbl.nonEmpty && !tbl.head.isDigit,
            s"OPTIONS hint must follow a table name: …${text.substring(
              math.max(0, i - 20), math.min(text.length, close + 2))}")
          // reject sink-side hints (INSERT INTO t /*+ … */ SELECT …)
          var w = s0
          while (w >= 0 && Character.isWhitespace(text.charAt(w))) w -= 1
          var w0 = w
          while (w0 >= 0 && text.charAt(w0).isLetter) w0 -= 1
          val prev = text.substring(w0 + 1, w + 1)
          require(!prev.equalsIgnoreCase("INTO") &&
                  !prev.equalsIgnoreCase("OVERWRITE"),
            s"OPTIONS hint on the INSERT target '$tbl' is unsupported — " +
            "dynamic table options apply to SOURCE scans here (set " +
            "sink-side options on the table with ALTER TABLE SET)")
          val alias = hintAlias(spark, tbl, m.group(1))
          out ++= text.substring(last, s0 + 1)
          out ++= alias
          last = close + 2
          i = close + 2
        } else i = close + 2
      } else i += 1
    }
    out ++= text.substring(last)
    out.toString
  }

  /** Register (once) and return the internal alias for `tbl` with
    * `optsBody` merged over its declared options. */
  private def hintAlias(spark: SparkSession, tbl: String,
                        optsBody: String): String = {
    require(spark.conf.getOption(
        "spark.graft.dynamic.table.options.enabled").exists(_.toBoolean),
      "OPTIONS hint is allowed only when " +
      "table.dynamic-table-options.enabled is set to true")
    val d = tables.getOrElse(tbl.toLowerCase, throw
      new IllegalArgumentException(
        s"OPTIONS hint on '$tbl': not a table created through CREATE " +
        "TABLE — dynamic options merge over a table's WITH clause"))
    val opts = parseOptions(optsBody)
    require(opts.nonEmpty, s"OPTIONS hint on '$tbl': empty option list")
    // collision-free alias per (table × options): a strong digest of
    // the canonical option list (hashCode's 32 bits could map two
    // different option sets to one registration)
    val canon = opts.toSeq.sorted
      .map { case (k, v) => s"$k\u0000$v" }.mkString("\u0001")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
    val alias = s"${d.name}__opt$digest"
    if (hintRegs.putIfAbsent(alias.toLowerCase, true).isEmpty) {
      val d2 = mergedDef(d, opts, s"OPTIONS hint on '$tbl'")
        .copy(name = alias)
      try registerTable(spark, d2)
      catch { case t: Throwable =>
        hintRegs.remove(alias.toLowerCase); throw t }
    }
    alias
  }

  // ---- databases / catalogs / functions ------------------------------------

  private def oneColumn(spark: SparkSession, colName: String,
                        values: Seq[String]): SqlResult = {
    import scala.jdk.CollectionConverters._
    SqlResult(Some(spark.createDataFrame(
      values.map(org.apache.spark.sql.Row(_)).asJava,
      StructType(Seq(StructField(colName, StringType, nullable = false)))
    )), None)
  }

  /** `CREATE DATABASE [IF NOT EXISTS] db [COMMENT '…'] [WITH (…)]` —
    * the reference's SqlCreateDatabase (parserImpls.ftl:135-161).
    * Databases here are catalog NAMESPACING over a flat readable-view
    * namespace (see the catalog fields' note). */
  private def createDatabase(name: String, ifNotExists: Boolean,
                             withBody: Option[String]): SqlResult = {
    val key = resolveDb(name)
    if (databases.contains(key)) {
      if (ifNotExists) return done
      throw new IllegalArgumentException(
        s"CREATE DATABASE: database '$name' already exists")
    }
    databases(key) = withBody.map(parseOptions).getOrElse(Map.empty)
    done
  }

  /** `DROP DATABASE [IF EXISTS] db [RESTRICT|CASCADE]` — RESTRICT (the
    * default) rejects a non-empty database; CASCADE drops its tables
    * (SqlDropDatabase, parserImpls.ftl:187-210). */
  private def dropDatabase(spark: SparkSession, name: String,
                           ifExists: Boolean, cascade: Boolean): SqlResult = {
    val key = resolveDb(name)
    require(key != s"$currentCatalog/${defaultDbOf(currentCatalog)}" &&
            key != "default_catalog/default_database",
      "DROP DATABASE: a catalog's default database cannot be dropped")
    if (!databases.contains(key)) {
      if (ifExists) return done
      throw new IllegalArgumentException(
        s"DROP DATABASE: unknown database '$name'")
    }
    val owned = tableDb.collect { case (t, db) if db == key => t }.toSeq
    if (owned.nonEmpty && !cascade) throw new IllegalArgumentException(
      s"DROP DATABASE: database '$name' is not empty " +
      s"(${owned.sorted.mkString(", ")}) — use CASCADE to drop its tables")
    owned.foreach { t =>
      tables.remove(t).foreach { d =>
        upsertEpochs.remove(d.path)
        unregisterSurfaces(spark, d.name)
      }
      tableDb.remove(t)
      pkNames.remove(t)
    }
    databases.remove(key)
    if (s"$currentCatalog/$currentDb" == key)
      currentDb = defaultDbOf(currentCatalog)
    done
  }

  private def useCatalog(name: String): SqlResult = {
    val key = name.toLowerCase
    require(catalogs.contains(key),
      s"USE CATALOG: unknown catalog '$name' (SHOW CATALOGS lists " +
      s"${catalogs.keys.toSeq.sorted.mkString(", ")}; external " +
      "catalog TYPES — hive/jdbc — are a connector surface)")
    currentCatalog = key
    currentDb = defaultDbOf(key)
    done
  }

  /** `CREATE CATALOG c WITH ('type'='generic_in_memory'[,
    * 'default-database'='db'])` — the reference's SqlCreateCatalog +
    * GenericInMemoryCatalogFactory. Other catalog types need their
    * client jars and reject loudly. The catalog's default database is
    * created implicitly (GenericInMemoryCatalog's constructor does the
    * same). */
  private def createCatalog(name: String, withBody: Option[String]): SqlResult = {
    val key = name.toLowerCase
    require(!catalogs.contains(key),
      s"CREATE CATALOG: catalog '$name' already exists")
    val opts = withBody.map(parseOptions).getOrElse(Map.empty)
    val tpe = opts.getOrElse("type", throw new IllegalArgumentException(
      "CREATE CATALOG needs WITH ('type'=…) — the reference resolves a " +
      "CatalogFactory by it"))
    require(tpe.equalsIgnoreCase("generic_in_memory"),
      s"CREATE CATALOG: type '$tpe' is unsupported here " +
      "(generic_in_memory only — hive/jdbc catalogs need their client " +
      "jars, env-blocked)")
    catalogs(key) = opts
    databases(s"$key/${defaultDbOf(key)}") = Map.empty
    done
  }

  /** `DROP CATALOG [IF EXISTS] c` (SqlDropCatalog). The current
    * catalog and default_catalog are undroppable (the reference
    * rejects dropping the current catalog); a catalog whose databases
    * still own tables rejects — drop those first. */
  private def dropCatalog(name: String, ifExists: Boolean): SqlResult = {
    val key = name.toLowerCase
    require(key != "default_catalog",
      "DROP CATALOG: the built-in default_catalog cannot be dropped")
    if (!catalogs.contains(key)) {
      if (ifExists) return done
      throw new IllegalArgumentException(
        s"DROP CATALOG: unknown catalog '$name'")
    }
    require(key != currentCatalog,
      s"DROP CATALOG: '$name' is the current catalog — USE another first")
    val prefix = s"$key/"
    val owned = tableDb.collect {
      case (t, db) if db.startsWith(prefix) => t }.toSeq
    require(owned.isEmpty,
      s"DROP CATALOG: catalog '$name' still owns table(s) " +
      s"${owned.sorted.mkString(", ")} — DROP them (or their databases " +
      "CASCADE) first")
    databases.keys.filter(_.startsWith(prefix)).foreach(databases.remove)
    catalogs.remove(key)
    done
  }

  private def useDatabase(name: String): SqlResult = {
    val key = resolveDb(name)
    require(databases.contains(key),
      s"USE: unknown database '$name' (CREATE DATABASE first; " +
      "SHOW DATABASES lists the current catalog's: " +
      s"${databases.keys.filter(_.startsWith(s"$currentCatalog/"))
        .map(_.split('/')(1)).toSeq.sorted.mkString(", ")})")
    currentCatalog = key.split('/')(0)
    currentDb = key.split('/')(1)
    done
  }

  private def showDatabases(spark: SparkSession): SqlResult =
    oneColumn(spark, "database name", databases.keys
      .filter(_.startsWith(s"$currentCatalog/"))
      .map(_.split('/')(1)).toSeq.sorted)

  private def showCatalogs(spark: SparkSession): SqlResult =
    oneColumn(spark, "catalog name", catalogs.keys.toSeq.sorted)

  private def describeDatabase(spark: SparkSession,
                               name: String): SqlResult = {
    val key = resolveDb(name)
    val props = databases.getOrElse(key, throw new IllegalArgumentException(
      s"DESCRIBE DATABASE: unknown database '$name'"))
    import scala.jdk.CollectionConverters._
    val rows = (Seq(("database name", key.split('/')(1)),
                    ("catalog", key.split('/')(0))) ++
                props.toSeq.sortBy(_._1))
      .map { case (k, v) => org.apache.spark.sql.Row(k, v) }
    SqlResult(Some(spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("info name", StringType),
                     StructField("info value", StringType))))), None)
  }

  /** `SHOW VIEWS` (SqlShowViews, parserImpls.ftl:353-360): changelog
    * views + the session's plain temp views, minus the readable views
    * this catalog registers FOR its tables. */
  private def showViews(spark: SparkSession): SqlResult = {
    val own = tables.keySet ++ hintRegs.keySet
    val temp = spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && !own.contains(t.name.toLowerCase))
      .map(_.name)
    oneColumn(spark, "view name",
      (changelogViews.keys.toSeq ++ temp).distinct.sorted)
  }

  /** `SHOW [USER] FUNCTIONS` (SqlShowFunctions, parserImpls.ftl:337-346):
    * every SQL-invokable function name — the session registry holds the
    * engine's registered function surface (GraftFunctions + CREATE
    * FUNCTION registrations) alongside Spark's builtins. */
  private def showFunctions(spark: SparkSession): SqlResult =
    oneColumn(spark, "function name",
      spark.catalog.listFunctions().collect().map(_.name).toSeq.sorted)

  /** `CREATE [TEMPORARY] [SYSTEM] FUNCTION name AS 'class'
    * [LANGUAGE JAVA|SCALA]` — the reference's SqlCreateFunction
    * (parserImpls.ftl:230-268) with UserDefinedFunctionHelper's
    * contract: the class is instantiated reflectively and its public
    * `eval` method becomes the SQL function body (the reference's
    * ScalarFunction discovers eval by reflection too). The return type
    * maps from the method's Java return type; arity 0-5. */
  private def createFunction(spark: SparkSession, name: String,
                             className: String, ifNotExists: Boolean,
                             language: Option[String]): SqlResult = {
    language.foreach(l => require(
      l.equalsIgnoreCase("JAVA") || l.equalsIgnoreCase("SCALA"),
      s"CREATE FUNCTION: LANGUAGE $l is unsupported (JAVA|SCALA — this " +
      "is a JVM engine; Python UDFs are out of scope)"))
    val key = name.toLowerCase
    if (createdFunctions.contains(key)) {
      if (ifNotExists) return done
      throw new IllegalArgumentException(
        s"CREATE FUNCTION: function '$name' already exists " +
        "(DROP FUNCTION first, or ALTER FUNCTION to repoint it)")
    }
    registerEvalFunction(spark, name, className)
    createdFunctions(key) = className
    done
  }

  /** The registration core shared by CREATE FUNCTION and ALTER
    * FUNCTION: resolve the class, discover eval, register the UDF. */
  private def registerEvalFunction(spark: SparkSession, name: String,
                                   className: String): Unit = {
    val cls =
      try Class.forName(className)
      catch { case _: ClassNotFoundException =>
        throw new IllegalArgumentException(
          s"CREATE FUNCTION: class '$className' not found on the " +
          "classpath (the reference's CatalogFunction resolution)") }
    val inst =
      try cls.getDeclaredConstructor().newInstance()
      catch { case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"CREATE FUNCTION: '$className' needs a public no-arg " +
          s"constructor (${e.getMessage})") }
    val evals = cls.getMethods.filter(_.getName == "eval")
    require(evals.nonEmpty,
      s"CREATE FUNCTION: '$className' declares no public eval method — " +
      "the ScalarFunction contract (UserDefinedFunctionHelper) is a " +
      "public eval the planner discovers by reflection")
    require(evals.length == 1,
      s"CREATE FUNCTION: '$className' overloads eval " +
      s"(${evals.length} signatures) — one eval per function here")
    val m = evals.head
    val ret = javaTypeToSpark(m.getReturnType, className)
    // Method/instance are NOT Serializable — the UDF ships the class
    // NAME and re-discovers eval lazily per executor (the reference
    // instantiates the ScalarFunction per task the same way)
    val invokeEval = new ReflectiveEval(className)
    import org.apache.spark.sql.api.java._
    m.getParameterCount match {
      case 0 => spark.udf.register(name, new UDF0[Any] {
        def call(): Any = invokeEval(Nil) }, ret)
      case 1 => spark.udf.register(name, new UDF1[AnyRef, Any] {
        def call(a: AnyRef): Any = invokeEval(Seq(a)) }, ret)
      case 2 => spark.udf.register(name, new UDF2[AnyRef, AnyRef, Any] {
        def call(a: AnyRef, b: AnyRef): Any = invokeEval(Seq(a, b)) }, ret)
      case 3 => spark.udf.register(name,
        new UDF3[AnyRef, AnyRef, AnyRef, Any] {
          def call(a: AnyRef, b: AnyRef, c: AnyRef): Any =
            invokeEval(Seq(a, b, c)) }, ret)
      case 4 => spark.udf.register(name,
        new UDF4[AnyRef, AnyRef, AnyRef, AnyRef, Any] {
          def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef): Any =
            invokeEval(Seq(a, b, c, d)) }, ret)
      case 5 => spark.udf.register(name,
        new UDF5[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, Any] {
          def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef,
                   e: AnyRef): Any = invokeEval(Seq(a, b, c, d, e)) }, ret)
      case n => throw new IllegalArgumentException(
        s"CREATE FUNCTION: eval takes $n parameters — up to 5 supported")
    }
  }

  /** Serializable eval invoker: carries only the class NAME; the
    * instance and its eval Method re-resolve lazily on each executor
    * (java.lang.reflect.Method is not Serializable). */
  private class ReflectiveEval(className: String)
      extends (Seq[AnyRef] => Any) with Serializable {
    @transient private lazy val inst =
      Class.forName(className).getDeclaredConstructor().newInstance()
    @transient private lazy val method =
      Class.forName(className).getMethods.find(_.getName == "eval").get
    // SQL literals arrive at the type the parser inferred (10 → Integer)
    // while eval declares its own parameter classes — widen numerics to
    // the declared class the way the reference's data-type inference
    // adapts call arguments to the eval signature. Nulls pass through.
    private def coerce(v: AnyRef, target: Class[_]): AnyRef = v match {
      case null => null
      case n: java.lang.Number => target match {
        case java.lang.Long.TYPE => java.lang.Long.valueOf(n.longValue())
        case java.lang.Integer.TYPE => java.lang.Integer.valueOf(n.intValue())
        case java.lang.Double.TYPE => java.lang.Double.valueOf(n.doubleValue())
        case java.lang.Float.TYPE => java.lang.Float.valueOf(n.floatValue())
        case java.lang.Short.TYPE => java.lang.Short.valueOf(n.shortValue())
        case java.lang.Byte.TYPE => java.lang.Byte.valueOf(n.byteValue())
        case t if t == classOf[java.lang.Long] =>
          java.lang.Long.valueOf(n.longValue())
        case t if t == classOf[java.lang.Integer] =>
          java.lang.Integer.valueOf(n.intValue())
        case t if t == classOf[java.lang.Double] =>
          java.lang.Double.valueOf(n.doubleValue())
        case t if t == classOf[java.lang.Float] =>
          java.lang.Float.valueOf(n.floatValue())
        case t if t == classOf[java.lang.Short] =>
          java.lang.Short.valueOf(n.shortValue())
        case t if t == classOf[java.lang.Byte] =>
          java.lang.Byte.valueOf(n.byteValue())
        case t if t == classOf[java.math.BigDecimal] => n match {
          case bd: java.math.BigDecimal => bd
          case _ => new java.math.BigDecimal(n.toString)
        }
        case _ => v
      }
      case s if target == classOf[String] => s.toString
      case _ => v
    }
    def apply(args: Seq[AnyRef]): Any = {
      val params = method.getParameterTypes
      val coerced = args.zip(params.toSeq).map { case (a, t) => coerce(a, t) }
      method.invoke(inst, coerced: _*)
    }
  }

  /** The eval method's Java return type → Spark DataType. */
  private def javaTypeToSpark(c: Class[_], where: String): DataType = c match {
    case java.lang.Integer.TYPE => IntegerType
    case java.lang.Long.TYPE => LongType
    case java.lang.Double.TYPE => DoubleType
    case java.lang.Float.TYPE => FloatType
    case java.lang.Boolean.TYPE => BooleanType
    case java.lang.Short.TYPE => ShortType
    case java.lang.Byte.TYPE => ByteType
    case _ if c == classOf[String] => StringType
    case _ if c == classOf[java.lang.Integer] => IntegerType
    case _ if c == classOf[java.lang.Long] => LongType
    case _ if c == classOf[java.lang.Double] => DoubleType
    case _ if c == classOf[java.lang.Float] => FloatType
    case _ if c == classOf[java.lang.Boolean] => BooleanType
    case _ if c == classOf[Array[Byte]] => BinaryType
    case _ if c == classOf[java.math.BigDecimal] => DecimalType(38, 18)
    case _ if c == classOf[java.sql.Timestamp] => TimestampType
    case _ if c == classOf[java.sql.Date] => DateType
    case _ => throw new IllegalArgumentException(
      s"CREATE FUNCTION: unsupported eval return type ${c.getName} in " +
      s"$where (int/long/double/float/boolean/short/byte and their " +
      "boxes, String, byte[], BigDecimal, Timestamp, Date)")
  }

  private def dropFunction(spark: SparkSession, name: String,
                           ifExists: Boolean): SqlResult = {
    val key = name.toLowerCase
    if (!createdFunctions.contains(key)) {
      if (ifExists) return done
      throw new IllegalArgumentException(
        s"DROP FUNCTION: unknown function '$name' (only CREATE FUNCTION " +
        "registrations can be dropped — the builtin surface is fixed)")
    }
    spark.sessionState.catalog.dropTempFunction(name, ignoreIfNotExists = true)
    createdFunctions.remove(key)
    done
  }

  /** `ALTER FUNCTION [IF EXISTS] f AS 'class'` (SqlAlterFunction,
    * parserImpls.ftl:269-311): repoint an existing CREATE FUNCTION
    * registration at a new implementation class. */
  private def alterFunction(spark: SparkSession, name: String,
                            className: String, ifExists: Boolean,
                            language: Option[String]): SqlResult = {
    language.foreach(l => require(
      l.equalsIgnoreCase("JAVA") || l.equalsIgnoreCase("SCALA"),
      s"ALTER FUNCTION: LANGUAGE $l is unsupported (JAVA|SCALA — this " +
      "is a JVM engine; Python UDFs are out of scope)"))
    val key = name.toLowerCase
    if (!createdFunctions.contains(key)) {
      if (ifExists) return done
      throw new IllegalArgumentException(
        s"ALTER FUNCTION: unknown function '$name' (only CREATE FUNCTION " +
        "registrations can be altered)")
    }
    registerEvalFunction(spark, name, className) // replaces the UDF slot
    createdFunctions(key) = className
    done
  }

  /** `ALTER DATABASE db SET ('k'='v', …)` (SqlAlterDatabase,
    * parserImpls.ftl:162-186): merge the listed properties over the
    * database's existing ones. */
  private def alterDatabase(name: String, optsBody: String): SqlResult = {
    val key = resolveDb(name)
    val cur = databases.getOrElse(key, throw new IllegalArgumentException(
      s"ALTER DATABASE: unknown database '$name'"))
    databases(key) = cur ++ parseOptions(optsBody)
    done
  }

  private def describeCatalog(spark: SparkSession,
                              name: String): SqlResult = {
    val key = name.toLowerCase
    val props = catalogs.getOrElse(key, throw new IllegalArgumentException(
      s"DESCRIBE CATALOG: unknown catalog '$name' (SHOW CATALOGS lists " +
      s"${catalogs.keys.toSeq.sorted.mkString(", ")})"))
    import scala.jdk.CollectionConverters._
    val rows = (Seq(("catalog name", key),
                    ("default database", defaultDbOf(key)),
                    ("type", props.getOrElse("type", "in-memory"))) ++
                (props - "type").toSeq.sortBy(_._1))
      .map { case (k, v) => org.apache.spark.sql.Row(k, v) }
    SqlResult(Some(spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("info name", StringType),
                     StructField("info value", StringType))))), None)
  }

  /** `ALTER VIEW v RENAME TO v2` (SqlAlterViewRename): re-derive the
    * registration under the new name from the recorded body, then drop
    * the old surfaces. Only DDL-created views carry a body — a temp
    * view registered by library code is not ALTER-able here. */
  private def alterViewRename(spark: SparkSession, name: String,
                              to: String): SqlResult = {
    val key = name.toLowerCase
    if (tables.contains(key)) throw new IllegalArgumentException(
      s"ALTER VIEW: '$name' is a TABLE (use ALTER TABLE RENAME TO)")
    val body = viewBodies.getOrElse(key, throw new IllegalArgumentException(
      s"ALTER VIEW: unknown view '$name' (only views created through " +
      "CREATE VIEW here are renameable — their body is recorded)"))
    val toKey = to.toLowerCase
    require(toKey != key, s"ALTER VIEW RENAME: '$name' → '$to' is a no-op")
    require(!tables.contains(toKey) && !changelogViews.contains(toKey) &&
            !spark.catalog.tableExists(to),
      s"ALTER VIEW RENAME: target name '$to' already exists")
    createView(spark, to, body) // registers the new surface (+ body)
    dropViewSurfaces(spark, name)
    viewBodies.remove(key)
    done
  }

  /** `ALTER VIEW v AS <query>` (SqlAlterViewAs): replace the body. The
    * new body is ANALYZED before the old registration is touched, so a
    * bad body leaves the old view intact. */
  private def alterViewAs(spark: SparkSession, name: String,
                          query: String): SqlResult = {
    val key = name.toLowerCase
    if (tables.contains(key)) throw new IllegalArgumentException(
      s"ALTER VIEW: '$name' is a TABLE (ALTER TABLE has no AS form)")
    require(viewBodies.contains(key),
      s"ALTER VIEW: unknown view '$name' (only views created through " +
      "CREATE VIEW here are alterable)")
    SqlFrontend.sql(spark, query) // analysis gate — throws before mutation
    dropViewSurfaces(spark, name)
    try {
      createView(spark, name, query)
      viewBodies(key) = query
    } catch { case t: Throwable =>
      // restore the old view (its body re-analyzes — it did at CREATE)
      createView(spark, name, viewBodies(key))
      throw t
    }
    done
  }

  /** Drop every registration surface for a VIEW name (changelog
    * registration + temp view); the recorded body stays with the
    * caller to move or replace. */
  private def dropViewSurfaces(spark: SparkSession, name: String): Unit = {
    changelogViews.remove(name.toLowerCase)
    StreamSql.dropChangelog(name)
    spark.catalog.dropTempView(name)
  }

  /** `ALTER TABLE t ADD [CONSTRAINT nm] PRIMARY KEY (cols) NOT
    * ENFORCED` (SqlAlterTableAddConstraint): attach a key to an
    * existing keyless table — it becomes an upsert table, so the same
    * layout guard as CREATE applies (pre-existing plain files would
    * mix with the bucketed merge layout). */
  private def addConstraint(spark: SparkSession, name: String,
                            cname: Option[String],
                            cols: Seq[String]): SqlResult = {
    val key = name.toLowerCase
    val d = tables.getOrElse(key, throw new IllegalArgumentException(
      s"ALTER TABLE: unknown table '$name'"))
    require(d.primaryKey.isEmpty,
      s"ALTER TABLE ADD CONSTRAINT: table '$name' already has a PRIMARY " +
      s"KEY (${d.primaryKey.mkString(", ")}) — DROP CONSTRAINT first")
    // physical columns only — same rule as CREATE TABLE (the upsert
    // sink's bucket hash resolves against the physical row)
    val declared = d.physical.fieldNames.map(_.toLowerCase).toSet
    val missing = cols.filterNot(c => declared(c.toLowerCase))
    require(missing.isEmpty,
      s"ALTER TABLE ADD CONSTRAINT: key column(s) " +
      s"${missing.mkString(", ")} not declared as physical columns " +
      s"on '$name'")
    require(!pathHasData(spark, d.path),
      s"ALTER TABLE ADD CONSTRAINT: path '${d.path}' already holds " +
      "plain data files — the upsert sink's bucketed layout cannot mix " +
      "with them (re-CREATE onto a fresh directory instead)")
    require(d.partitionedBy.isEmpty,
      "ALTER TABLE ADD CONSTRAINT: PARTITIONED BY and PRIMARY KEY are " +
      "mutually exclusive here — the upsert sink manages its own layout")
    val d2 = d.copy(primaryKey = cols)
    unregisterSurfaces(spark, name)
    try { registerTable(spark, d2); tables(key) = d2 }
    catch { case t: Throwable => registerTable(spark, d); throw t }
    cname.foreach(n => pkNames(key) = n)
    done
  }

  /** `ALTER TABLE t DROP CONSTRAINT nm` (SqlAlterTableDropConstraint):
    * detach the named key. A table whose files already carry the
    * bucketed upsert layout rejects — a keyless read of `__bucket=`
    * data would expose retracted rows. */
  private def dropConstraint(spark: SparkSession, name: String,
                             cname: String): SqlResult = {
    val key = name.toLowerCase
    val d = tables.getOrElse(key, throw new IllegalArgumentException(
      s"ALTER TABLE: unknown table '$name'"))
    require(d.primaryKey.nonEmpty,
      s"ALTER TABLE DROP CONSTRAINT: table '$name' has no PRIMARY KEY")
    val declared = pkNames.get(key)
    require(declared.exists(_.equalsIgnoreCase(cname)),
      s"ALTER TABLE DROP CONSTRAINT: no constraint named '$cname' on " +
      s"'$name'" + declared.fold(" (its PRIMARY KEY was declared " +
        "without a CONSTRAINT name)")(n => s" (the declared name is '$n')"))
    require(!hasUpsertLayout(spark, d.path),
      s"ALTER TABLE DROP CONSTRAINT: path '${d.path}' already holds the " +
      "upsert table's bucketed layout — a keyless read would expose " +
      "retracted rows and internal columns (INSERT OVERWRITE a fresh " +
      "plain table from the live view instead)")
    val d2 = d.copy(primaryKey = Nil)
    unregisterSurfaces(spark, name)
    try { registerTable(spark, d2); tables(key) = d2 }
    catch { case t: Throwable => registerTable(spark, d); throw t }
    pkNames.remove(key)
    upsertEpochs.remove(d.path)
    done
  }

  private def showTables(spark: SparkSession): SqlResult = {
    import scala.jdk.CollectionConverters._
    // plain views (CREATE VIEW with a batch body) live only in Spark's
    // temp-view catalog — the reference's SHOW TABLES lists views too,
    // so union them in (minus names this catalog already owns: the
    // readable views registered FOR tables must not double-list)
    // internal OPTIONS-hint aliases are registration plumbing, not
    // catalog entries — hidden from listings
    val own = tables.keySet ++ changelogViews.keySet ++ hintRegs.keySet
    val tempViews = spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && !own.contains(t.name.toLowerCase))
      .map(t => org.apache.spark.sql.Row(t.name, "view", null))
    val rows = tables.values.map { d =>
      val kind =
        if (isCdcFormat(d.format)) "cdc table"
        else if (d.watermark.isDefined) "stream table" else "table"
      org.apache.spark.sql.Row(d.name, kind, d.path)
    } ++ changelogViews.keys.map(n =>
      org.apache.spark.sql.Row(n, "changelog view", null)) ++ tempViews
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("kind", StringType),
      StructField("path", StringType)))
    SqlResult(Some(
      spark.createDataFrame(rows.toList.asJava, schema)), None)
  }

  private def describe(spark: SparkSession, name: String): SqlResult = {
    import scala.jdk.CollectionConverters._
    val d = tables.getOrElse(name.toLowerCase, throw
      new IllegalArgumentException(s"DESCRIBE: unknown table '$name' " +
        "(views: use spark.table(name).schema)"))
    val rows =
      d.physical.fields.map { f =>
        val extras = Seq(
          if (!f.nullable) Some("NOT NULL") else None,
          d.primaryKey.find(_.equalsIgnoreCase(f.name)).map(_ => "PRIMARY KEY"),
          d.partitionedBy.find(_.equalsIgnoreCase(f.name))
            .map(_ => "PARTITIONED BY"),
          d.watermark.collect { case (c, delay) if c.equalsIgnoreCase(f.name) =>
            s"WATERMARK - $delay" }
        ).flatten.mkString(", ")
        org.apache.spark.sql.Row(f.name, f.dataType.simpleString, extras)
      } ++ d.computed.map { case (n, e) =>
        org.apache.spark.sql.Row(n, "computed", s"AS $e")
      }
    val schema = StructType(Seq(
      StructField("col_name", StringType), StructField("data_type", StringType),
      StructField("extras", StringType)))
    SqlResult(Some(
      spark.createDataFrame(rows.toList.asJava, schema)), None)
  }

  // ---- helpers -------------------------------------------------------------

  /** Balanced-paren group content opening at `open` (literal-opaque). */
  private def balanced(s: String, open: Int): String =
    SqlFrontend.balanced(s, open)

  /** Parse `'k' = 'v', …` WITH options ('' doubling unescaped). */
  private[graft] def parseOptions(body: String): Map[String, String] = {
    val optRe = java.util.regex.Pattern.compile(
      "(?s)^\\s*'((?:[^']|'')*)'\\s*=\\s*'((?:[^']|'')*)'\\s*$")
    SqlFrontend.splitTop(body).map { item =>
      val m = optRe.matcher(item)
      require(m.matches(), s"unparseable WITH option (expected 'k'='v'): $item")
      m.group(1).replace("''", "'").toLowerCase ->
        m.group(2).replace("''", "'")
    }.toMap
  }

  private def isTypeKeyword(rest: String): Boolean = {
    val head = rest.trim.split("[\\s(<]")(0).toUpperCase
    Set("STRING", "VARCHAR", "CHAR", "BOOLEAN", "TINYINT", "SMALLINT",
        "INT", "INTEGER", "BIGINT", "FLOAT", "REAL", "DOUBLE", "DATE",
        "DECIMAL", "NUMERIC", "TIMESTAMP", "TIMESTAMP_LTZ", "BYTES",
        "BINARY", "VARBINARY", "ARRAY")(head)
  }

  /** Flink SQL type name → Spark DataType (the SqlToOperationConverter
    * type mapping's filesystem-relevant subset). */
  private[graft] def sqlType(t: String): DataType = {
    val u = t.trim.toUpperCase
    val decRe = "(?:DECIMAL|NUMERIC)\\s*\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)".r
    u match {
      case "STRING" => StringType
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") => StringType
      case "BOOLEAN" => BooleanType
      case "TINYINT" => ByteType
      case "SMALLINT" => ShortType
      case "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "FLOAT" | "REAL" => FloatType
      case "DOUBLE" | "DOUBLE PRECISION" => DoubleType
      case "DATE" => DateType
      case decRe(p, sc) => DecimalType(p.toInt, sc.toInt)
      case "DECIMAL" | "NUMERIC" => DecimalType(10, 0)
      case s if s.startsWith("TIMESTAMP") => TimestampType
      case "BYTES" | "BINARY" | "VARBINARY" => BinaryType
      case s if s.startsWith("BINARY(") || s.startsWith("VARBINARY(") =>
        BinaryType
      case s if s.startsWith("ARRAY<") && s.endsWith(">") =>
        ArrayType(sqlType(s.substring(6, s.length - 1)))
      case other => throw new IllegalArgumentException(
        s"unsupported column type '$other' (STRING/VARCHAR/CHAR/BOOLEAN/" +
        "TINYINT/SMALLINT/INT/BIGINT/FLOAT/DOUBLE/DATE/DECIMAL/TIMESTAMP/" +
        "BYTES/ARRAY<…>)")
    }
  }
}
