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
 * The result carries the payload columns plus `row_kind` — the
 * changelog-view contract ([[graft.streaming.StreamSql.registerChangelog]]),
 * so every changelog SQL route (GROUP BY aggregates, joins, EXISTS,
 * rank, Calc) and the PRIMARY KEY upsert sink consume it directly.
 * Reached from DDL text via `CREATE TABLE … WITH ('format' =
 * 'debezium-json'|'canal-json')` ([[graft.operators.SqlDdl]]).
 */
object CdcFormats {

  /** The debezium envelope schema over a payload row schema. */
  def debeziumEnvelope(payload: StructType): StructType =
    StructType(Seq(
      StructField("before", payload),
      StructField("after", payload),
      StructField("op", StringType)))

  /** Envelope rows (schema = [[debeziumEnvelope]]) → changelog rows
    * (payload columns + `row_kind`). */
  def debeziumChangelog(env: DataFrame, payload: StructType): DataFrame = {
    def tagged(side: String, kind: String) =
      struct(col(side).as("p"), lit(kind).as("k"))
    val pairs = when(col("op").isin("c", "r"), array(tagged("after", "+I")))
      .when(col("op") === "u",
        array(tagged("before", "-U"), tagged("after", "+U")))
      .when(col("op") === "d", array(tagged("before", "-D")))
      .otherwise(raise_error(concat(
        lit("debezium-json: unknown op '"), col("op"),
        lit("' (expected c/r/u/d)"))))
    env.select(explode(pairs).as("e"))
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
  def canalChangelog(env: DataFrame, payload: StructType): DataFrame = {
    val fields = payload.fieldNames.toSeq
    def mergedOld(z: org.apache.spark.sql.Column) = struct(fields.map(f =>
      coalesce(z.getField("old").getField(f),
               z.getField("data").getField(f)).as(f)): _*)
    val zipped = arrays_zip(col("data").as("data"),
      coalesce(col("old"), col("data")).as("old"))
    val pairs = when(col("type") === "INSERT",
        flatten(transform(col("data"), d =>
          array(struct(d.as("p"), lit("+I").as("k"))))))
      .when(col("type") === "DELETE",
        flatten(transform(col("data"), d =>
          array(struct(d.as("p"), lit("-D").as("k"))))))
      .when(col("type") === "UPDATE",
        flatten(transform(zipped, z =>
          array(struct(mergedOld(z).as("p"), lit("-U").as("k")),
                struct(z.getField("data").as("p"), lit("+U").as("k"))))))
      .otherwise(raise_error(concat(
        lit("canal-json: unknown type '"), col("type"),
        lit("' (expected INSERT/UPDATE/DELETE)"))))
    env.select(explode(pairs).as("e"))
      .select(col("e.p.*") +: Seq(col("e.k").as("row_kind")): _*)
  }
}
