package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling (SURVEY §2.4 SplitAggregateRule / §4.1 skew-agg row):
 * AQE already splits skewed JOIN partitions at runtime; aggregation skew
 * and pathological single-key joins still need explicit salting — these
 * helpers make the pattern a first-class operator.
 *
 * saltedJoin: probe side gets a random salt in [0, n); build side is
 * replicated n× with every salt value; the join key becomes (key, salt),
 * spreading one hot key over n reducers. Replication cost is n× the
 * build side — use for dimension-sized builds under fact-side skew.
 *
 * twoPhaseAgg: SplitAggregateRule's partial/final split with an explicit
 * salt for hot grouping keys: groupBy(key, salt) partial-aggregate, then
 * groupBy(key) final-merge.
 */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val salted = probe.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicated = build.withColumn("__bsalt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) &&
        col("__salt") === col("__bsalt"), joinType)
      .drop("__salt", "__bsalt")
  }

  /** Two-phase (salted partial + final) aggregation for hot keys:
    * `aggs` must be decomposable (sum/count/min/max). */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
                  partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}
