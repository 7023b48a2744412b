package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/**
 * Scalar-function parity battery (SURVEY §2.8 — the reference's
 * FlinkSqlOperatorTable surface): string, math and temporal functions
 * exercised over real table data, checked value-exactly against DuckDB.
 *
 * Portability rules baked into the oracles:
 *  - split_index is 0-based (Flink) vs DuckDB split_part 1-based;
 *  - Spark hex() is uppercase, DuckDB's lowercase → lower() both;
 *  - Spark dayofweek is 1=Sunday, DuckDB 0=Sunday → minus 1 on ours;
 *  - transcendentals (exp/ln/pow) are libm-dependent → round(…, 6);
 *    sqrt/arithmetic are IEEE-exact → compared raw.
 */
object ScalarBattery {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_scalar_string" -> ((s, dir) => {
      Tables.table(s, dir, "documents").select(
        col("doc_id"),
        GraftFunctions.splitIndex(col("text"), " ", 0).as("first_tok"),
        GraftFunctions.splitIndex(col("text"), " ", 2).as("third_tok"),
        reverse(col("lang")).as("rev_lang"),
        lpad(col("source"), 8, "_").as("src_pad"),
        length(col("text")).as("tlen"),
        substring(md5(col("text")), 1, 8).as("md5_8"),
        GraftFunctions.isDigit(substring(col("source"), 4, 10)).as("src_digits"),
        concat_ws("-", col("lang"), col("source")).as("tag"),
        instr(col("text"), "hash").as("hash_pos"),
        upper(col("lang")).as("lang_u"),
        repeat(col("lang"), 2).as("lang2"),
        ltrim(rtrim(col("text"))).substr(lit(1), lit(20)).as("head20"),
        translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
        ascii(col("lang")).as("lang_ascii"),
        GraftFunctions.isAlpha(col("lang")).as("lang_alpha"))
    }),

    "q32_scalar_math" -> ((s, dir) => {
      Tables.table(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") % 7).as("mod7"),
          GraftFunctions.divideInteger(col("l_orderkey"), col("l_linenumber"))
            .as("idiv"),
          abs(col("l_discount") - 0.05).as("adisc"),
          signum(col("l_discount") - 0.05).cast("int").as("sgn"),
          ceil(col("l_extendedprice")).as("ceil_p"),
          floor(col("l_extendedprice")).as("floor_p"),
          round(col("l_extendedprice"), 1).as("round_p"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(log(col("l_quantity") + 1), 6).as("ln_q"),
          round(pow(col("l_quantity"), 2), 6).as("pow_q"),
          lower(hex(col("l_orderkey"))).as("hex_k"),
          conv(lower(hex(col("l_orderkey"))), 16, 10).cast("long").as("unhex_k"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
    }),

    "q33_scalar_time" -> ((s, dir) => {
      Tables.table(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          // o_orderdate reads as TIMESTAMP_NTZ (parquet ms, not UTC-adjusted);
          // unix_micros wants LTZ — identical values under the UTC session.
          unix_micros(date_trunc("month", col("o_orderdate")).cast("timestamp"))
            .as("month_start"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH").as("fmt"),
          unix_micros((col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("timestamp"))
            .as("plus90us"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q31_scalar_string" -> """
      SELECT doc_id,
             split_part(text, ' ', 1) AS first_tok,
             split_part(text, ' ', 3) AS third_tok,
             reverse(lang) AS rev_lang,
             lpad(source, 8, '_') AS src_pad,
             length(text) AS tlen,
             substr(md5(text), 1, 8) AS md5_8,
             regexp_full_match(substr(source, 4), '[0-9]+') AS src_digits,
             concat_ws('-', lang, source) AS tag,
             strpos(text, 'hash') AS hash_pos,
             upper(lang) AS lang_u,
             repeat(lang, 2) AS lang2,
             substr(ltrim(rtrim(text)), 1, 20) AS head20,
             translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
             ascii(lang) AS lang_ascii,
             regexp_full_match(lang, '[A-Za-z]+') AS lang_alpha
      FROM documents""",

    "q32_scalar_math" -> """
      SELECT l_orderkey, l_linenumber,
             l_orderkey % 7 AS mod7,
             CAST(l_orderkey AS BIGINT) // CAST(l_linenumber AS BIGINT) AS idiv,
             abs(l_discount - 0.05) AS adisc,
             CAST(sign(l_discount - 0.05) AS INT) AS sgn,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
             CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
             round(l_extendedprice, 1) AS round_p,
             sqrt(l_quantity) AS sqrt_q,
             round(exp(l_discount), 6) AS exp_d,
             round(ln(l_quantity + 1), 6) AS ln_q,
             round(pow(l_quantity, 2), 6) AS pow_q,
             lower(hex(l_orderkey)) AS hex_k,
             CAST(('0x' || lower(hex(l_orderkey))) AS BIGINT) AS unhex_k,
             greatest(l_tax, l_discount) AS gr,
             least(l_tax, l_discount) AS le
      FROM lineitem WHERE l_orderkey < 200""",

    "q33_scalar_time" -> """
      SELECT o_orderkey,
             year(o_orderdate) AS y,
             quarter(o_orderdate) AS q,
             month(o_orderdate) AS m,
             dayofmonth(o_orderdate) AS d,
             dayofweek(o_orderdate) AS dow,
             dayofyear(o_orderdate) AS doy,
             epoch_us(date_trunc('month', o_orderdate)) AS month_start,
             datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to,
             CAST(o_orderdate AS DATE) + 30 AS plus30,
             strftime(o_orderdate, '%Y-%m-%d %H') AS fmt,
             epoch_us(o_orderdate + INTERVAL 90 DAY) AS plus90us
      FROM orders WHERE o_orderkey < 500"""
  )
}
