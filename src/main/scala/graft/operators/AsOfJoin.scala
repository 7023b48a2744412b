package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal / as-of join (SURVEY §2.3, §7.4.3): for each left row, the
 * latest right row with `right.ts <= left.ts` within the same key — the
 * batch analogue of the reference's TemporalRowTimeJoinOperator
 * (flink-table-runtime-blink/.../join/temporal/TemporalRowTimeJoinOperator.java:72,
 * which keeps a versioned build-side sorted by rowtime and emits the
 * version valid at the probe row's time).
 *
 * Implementation is Spark-first, NOT a row-at-a-time port: union the two
 * inputs tagged by side, then one sort-based window pass per key carrying
 * the last-seen right row forward (`last(..., ignoreNulls)` over rows
 * UNBOUNDED PRECEDING..CURRENT). Cost = exactly ONE shuffle on the key +
 * one sort — same as a sort-merge join — and never materializes the
 * quadratic (probe × versions) space a range self-join would. At 100 TB
 * both inputs partition by key; skewed keys are handled by AQE since the
 * window runs after a standard hash exchange.
 *
 * Tie semantics: right rows at ts equal to the left ts ARE visible
 * (inclusive, like Flink's temporal join and DuckDB's ASOF >=); among
 * right rows with identical (key, ts), the one with the highest
 * `rightOrd` wins deterministically.
 */
object AsOfJoin {

  /**
   * @param left      probe side
   * @param right     versioned build side
   * @param leftKey   join key column on left
   * @param rightKey  join key column on right
   * @param leftTs    probe event-time column name (on left)
   * @param rightTs   version event-time column name (on right)
   * @param rightCols right columns to carry into the output (renamed as given)
   * @param rightOrd  deterministic tie-break column on right (e.g. its id)
   * @return left rows + matched right columns (null where no version yet:
   *         left as-of join; filter on non-null for inner semantics)
   */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      rightOrd: String): DataFrame = {

    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lType = StructType(leftCols.map(c => left.schema(c)))
    val rType = StructType(rightCols.map(c => right.schema(c)))

    val lTagged = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__rord"),
      struct(leftCols.map(left(_)): _*).as("__l"),
      lit(null).cast(rType).as("__r"))

    val rTagged = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__side"), col(rightOrd).cast("long").as("__rord"),
      lit(null).cast(lType).as("__l"),
      struct(rightCols.map(right(_)): _*).as("__r"))

    // Right rows sort before left rows at equal ts (inclusive semantics);
    // among equal (key, ts) right rows the highest rightOrd is last seen.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__rord").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
              rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
