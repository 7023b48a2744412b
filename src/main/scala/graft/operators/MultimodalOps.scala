package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Multimodal column handling (builder north star): media payloads are
 * opaque `binary` columns with typed metadata travelling beside them;
 * decode / feature-extraction runs partition-parallel over the bytes.
 *
 * The real media codecs are NOT in this container, so the decode step is
 * a clearly-marked deterministic fake (md5-based fingerprint + size
 * features); the Spark-side plumbing that matters at 100 TB — binary
 * schema, typed metadata struct, codegen'd expression pipeline, no
 * driver participation, partition-parallel batch shape — is real and
 * oracle-verified. Swap `fakeFingerprint` with a real codec UDF (or
 * `mapInPandas` on the PySpark side) in production.
 */
object MultimodalOps {

  /** STUB decode: deterministic md5 fingerprint standing in for a real
    * image/audio feature extractor. Replace with a codec in production. */
  private def fakeFingerprint(bytes: org.apache.spark.sql.Column) =
    substring(md5(bytes), 1, 16)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pack text into a binary "payload" + typed metadata, then run the
    // feature-extraction pipeline over the bytes.
    "q44_multimodal" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(
            lit("text/plain").as("mime"),
            length(encode(col("text"), "UTF-8")).as("n_bytes"),
            col("source").as("origin")).as("meta"))
        .select(
          col("doc_id"),
          col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.origin").as("origin"),
          fakeFingerprint(col("payload")).as("fingerprint"),
          // "frame sample": first 8 bytes of payload, hex-encoded
          lower(hex(substring(col("payload"), 1, 8))).as("head8"))
    })
  )

  // DuckDB 1.0's md5/hex don't accept BLOB; the payload bytes ARE the
  // UTF-8 text (ASCII-verified), so string-level md5/substr are identical.
  val oracle: Map[String, String] = Map(
    "q44_multimodal" -> """
      SELECT doc_id,
             'text/plain' AS mime,
             CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
             source AS origin,
             substr(md5(text), 1, 16) AS fingerprint,
             lower(hex(substr(text, 1, 8))) AS head8
      FROM documents"""
  )
}
