package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * CDC ingestion formats — the reference's changelog JSON formats
 * (flink-formats/flink-json: DebeziumJsonDeserializationSchema,
 * CanalJsonDeserializationSchema), which turn a CDC tool's JSON
 * envelope stream into a CHANGELOG of typed rows:
 *
 *  - debezium-json: `{"before": {...}|null, "after": {...}|null,
 *    "op": "c"|"r"|"u"|"d"}` → c/r = +I(after), u = -U(before) +
 *    +U(after), d = -D(before) — exactly the reference's op mapping
 *    (DebeziumJsonDeserializationSchema.deserialize).
 *  - canal-json: `{"type": "INSERT"|"UPDATE"|"DELETE",
 *    "data": [row…], "old": [changed-fields…]|null}` → INSERT = +I per
 *    data row, DELETE = -D per data row, UPDATE = -U(old MERGED over
 *    data — canal's `old` carries only the CHANGED fields, so the full
 *    before-image is field-wise `coalesce(old.f, data.f)`) + +U(data),
 *    the reference's CanalJsonDeserializationSchema merge.
 *
 * Everything is expression-only (schema'd JSON scan → `when`/`array`/
 * `explode` → struct expansion): whole-stage codegen'd, one
 * embarrassingly parallel pass, no UDF, no shuffle — at 100 TB the CDC
 * decode is scan-speed. Unknown op/type values raise loudly per row
 * (a silent drop would desynchronize the downstream materialization).
 *
 * Factory options (the reference's DebeziumJsonFormatFactory /
 * CanalJsonFormatFactory ConfigOptions):
 *  - `schema-include` (debezium only): Debezium with Kafka Connect's
 *    `value.converter.schemas.enable` wraps each envelope as
 *    `{"schema": …, "payload": {before, after, op}}`; the reference
 *    ignores `schema` and extracts `payload` — here the schema'd scan
 *    never even materializes the `schema` subtree (column pruning at
 *    the JSON parser).
 *  - `ignore-parse-errors` (both): skip undecodable envelopes (corrupt
 *    JSON lines, unknown ops, null images) instead of raising — the
 *    reference's catch-and-skip in `deserialize`. The skip is
 *    expression-only too: the op dispatch falls to a NULL array and
 *    `explode` drops it, so the lenient path costs nothing extra.
 *
 * The result carries the payload columns plus `row_kind` — the
 * changelog-view contract ([[graft.streaming.StreamSql.registerChangelog]]),
 * so every changelog SQL route (GROUP BY aggregates, joins, EXISTS,
 * rank, Calc) and the PRIMARY KEY upsert sink consume it directly.
 * Reached from DDL text via `CREATE TABLE … WITH ('format' =
 * 'debezium-json'|'canal-json')` ([[graft.operators.SqlDdl]]).
 */
object CdcFormats {

  /** The tagged (payload, kind) pair array type — the op dispatch's
    * value domain, needed to type the lenient path's NULL branch. */
  private def pairArray(payload: StructType): ArrayType =
    ArrayType(StructType(Seq(
      StructField("p", payload),
      StructField("k", StringType, nullable = false))))

  /** The debezium envelope schema over a payload row schema. With
    * `schemaInclude` the envelope is `{"schema":…, "payload":{…}}` —
    * only `payload` is declared, so the JSON parser prunes the
    * `schema` subtree at the scan (the reference ignores it too). */
  def debeziumEnvelope(payload: StructType,
                       schemaInclude: Boolean = false): StructType = {
    val core = StructType(Seq(
      StructField("before", payload),
      StructField("after", payload),
      StructField("op", StringType)))
    if (schemaInclude) StructType(Seq(StructField("payload", core)))
    else core
  }

  /** Envelope rows (schema = [[debeziumEnvelope]]) → changelog rows
    * (payload columns + `row_kind`). `ignoreParseErrors` skips
    * undecodable envelopes (unknown/null op, null required image)
    * instead of raising — the reference's catch-and-skip. */
  def debeziumChangelog(env: DataFrame, payload: StructType,
                        schemaInclude: Boolean = false,
                        ignoreParseErrors: Boolean = false): DataFrame = {
    val flat = if (schemaInclude) env.select(col("payload.*")) else env
    def tagged(side: String, kind: String) =
      struct(col(side).as("p"), lit(kind).as("k"))
    val dispatch = when(col("op").isin("c", "r"), array(tagged("after", "+I")))
      .when(col("op") === "u",
        array(tagged("before", "-U"), tagged("after", "+U")))
      .when(col("op") === "d", array(tagged("before", "-D")))
    val pairs =
      if (ignoreParseErrors) {
        // NULL for unknown ops, and NULL for a known op with a missing
        // required image (corrupt line) — the reference's
        // ignore-parse-errors skips the WHOLE message, not elements;
        // explode then drops the null array for free
        val lenient = dispatch.otherwise(lit(null).cast(pairArray(payload)))
        when(forall(lenient, x => x.getField("p").isNotNull), lenient)
      }
      else {
        // strict: unknown op raises; so does a known op with a missing
        // required image (the reference NPEs out of deserialize)
        val checked = dispatch.otherwise(raise_error(concat(
          lit("debezium-json: unknown op '"),
          coalesce(col("op"), lit("<null>")),
          lit("' (expected c/r/u/d)")))).cast(pairArray(payload))
        when(forall(checked, x => x.getField("p").isNotNull), checked)
          .otherwise(raise_error(concat(
            lit("debezium-json: op '"), col("op"),
            lit("' with a missing before/after image"))))
      }
    flat.select(explode(pairs).as("e"))
      .select(col("e.p.*") +: Seq(col("e.k").as("row_kind")): _*)
  }

  /** The canal envelope schema over a payload row schema: `data` and
    * `old` are ARRAYS of rows (canal batches several rows per event);
    * `old` rows carry only the CHANGED fields (others null). */
  def canalEnvelope(payload: StructType): StructType = {
    val nullable = StructType(payload.fields.map(_.copy(nullable = true)))
    StructType(Seq(
      StructField("data", ArrayType(nullable)),
      StructField("old", ArrayType(nullable)),
      StructField("type", StringType)))
  }

  /** Envelope rows (schema = [[canalEnvelope]]) → changelog rows. The
    * UPDATE before-image merges `old` over `data` field-wise (canal's
    * partial old rows), positionally zipped — the reference's
    * CanalJsonDeserializationSchema semantics. */
  def canalChangelog(env: DataFrame, payload: StructType,
                     ignoreParseErrors: Boolean = false): DataFrame = {
    val fields = payload.fieldNames.toSeq
    def mergedOld(z: org.apache.spark.sql.Column) = struct(fields.map(f =>
      coalesce(z.getField("old").getField(f),
               z.getField("data").getField(f)).as(f)): _*)
    val zipped = arrays_zip(col("data").as("data"),
      coalesce(col("old"), col("data")).as("old"))
    val dispatch = when(col("type") === "INSERT",
        flatten(transform(col("data"), d =>
          array(struct(d.as("p"), lit("+I").as("k"))))))
      .when(col("type") === "DELETE",
        flatten(transform(col("data"), d =>
          array(struct(d.as("p"), lit("-D").as("k"))))))
      .when(col("type") === "UPDATE",
        flatten(transform(zipped, z =>
          array(struct(mergedOld(z).as("p"), lit("-U").as("k")),
                struct(z.getField("data").as("p"), lit("+U").as("k"))))))
    val pairs =
      if (ignoreParseErrors) {
        // skip the WHOLE undecodable message (unknown type, missing
        // `data`, null rows inside it) — the reference's
        // ignore-parse-errors catch around the full envelope
        val lenient = dispatch.otherwise(lit(null).cast(pairArray(payload)))
        when(forall(lenient, x => x.getField("p").isNotNull), lenient)
      }
      else {
        // strict: unknown type raises; a known type whose `data` is
        // missing/undecodable raises too (pre-tightening, a corrupt
        // INSERT line's null dispatch was silently dropped by explode)
        val checked = dispatch.otherwise(raise_error(concat(
          lit("canal-json: unknown type '"),
          coalesce(col("type"), lit("<null>")),
          lit("' (expected INSERT/UPDATE/DELETE)")))).cast(pairArray(payload))
        when(forall(checked, x => x.getField("p").isNotNull), checked)
          .otherwise(raise_error(concat(
            lit("canal-json: type '"), col("type"),
            lit("' envelope with missing/undecodable data rows"))))
      }
    env.select(explode(pairs).as("e"))
      .select(col("e.p.*") +: Seq(col("e.k").as("row_kind")): _*)
  }
}
