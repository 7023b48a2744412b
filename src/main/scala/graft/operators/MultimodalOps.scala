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
    }),

    // Frame sampling: slice the payload into fixed 16-byte "frames",
    // keep every 4th (the video frame-sample shape: stride over an
    // opaque byte stream), fingerprint each kept frame. The explode is
    // partition-parallel and the per-frame work is codegen'd — at
    // 100 TB the frame rows never hit the driver and the stride bounds
    // the blow-up factor. Decode stays the documented md5 stand-in.
    "q134_frame_sample" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          explode(expr(
            "sequence(0, int(floor((length(text) - 1) / 16)))")).as("fi"))
        .filter(col("fi") % 4 === 0)
        .select(col("doc_id"), col("fi").cast("int").as("frame_idx"),
          md5(expr("substring(text, fi * 16 + 1, 16)")).as("frame_md5"))
    }),

    // "Resize": 2:1 downsample of the opaque payload (keep the first of
    // every 2 bytes — the media-resize shape on an undecoded stream),
    // emitting the resized payload's size and fingerprint beside the
    // original metadata. Single regexp_replace projection; the real
    // codec swap-in point is the same as fakeFingerprint's.
    "q138_resize" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .withColumn("resized", regexp_replace(col("text"), "(.).", "$1"))
        .select(
          col("doc_id"),
          length(col("text")).as("orig_bytes"),
          length(col("resized")).as("resized_bytes"),
          substring(md5(col("resized")), 1, 16).as("resized_fp"))
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
      FROM documents""",

    "q134_frame_sample" -> """
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             md5(substr(text, CAST(i * 16 + 1 AS INT), 16)) AS frame_md5
      FROM documents,
           UNNEST(generate_series(0,
             CAST(floor((length(text) - 1) / 16) AS BIGINT))) AS g(i)
      WHERE i % 4 = 0""",

    "q138_resize" -> """
      WITH r AS (
        SELECT doc_id, text,
               regexp_replace(text, '(.).', '\1', 'g') AS resized
        FROM documents)
      SELECT doc_id,
             CAST(length(text) AS INT) AS orig_bytes,
             CAST(length(resized) AS INT) AS resized_bytes,
             substr(md5(resized), 1, 16) AS resized_fp
      FROM r"""
  )
}
