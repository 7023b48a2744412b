package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Custom typed aggregators (SURVEY §2.11: Flink AggregateFunction →
 * Spark Aggregator[IN, BUF, OUT]).
 */

/**
 * SINGLE_VALUE (PLANNER-J/functions/aggfunctions + Calcite semantics):
 * returns the sole value of a group; errors if the group has more than
 * one distinct row. Buffer = (seen, value, conflict).
 */
class SingleValueString
  extends Aggregator[String, (Boolean, String, Boolean), String] {
  def zero: (Boolean, String, Boolean) = (false, null, false)
  def reduce(b: (Boolean, String, Boolean), v: String) =
    if (!b._1) (true, v, false)
    else (true, b._2, b._3 || b._2 != v)
  def merge(a: (Boolean, String, Boolean), b: (Boolean, String, Boolean)) =
    if (!a._1) b
    else if (!b._1) a
    else (true, a._2, a._3 || b._3 || a._2 != b._2)
  def finish(r: (Boolean, String, Boolean)): String = {
    if (r._3)
      throw new IllegalStateException(
        "SINGLE_VALUE: more than one value in group")
    r._2
  }
  def bufferEncoder: Encoder[(Boolean, String, Boolean)] =
    Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING,
      Encoders.scalaBoolean)
  def outputEncoder: Encoder[String] = Encoders.STRING
}
