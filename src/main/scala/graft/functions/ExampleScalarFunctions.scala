package graft.functions

/**
 * Example user-defined scalar functions in the reference's
 * `ScalarFunction` shape (flink-table/flink-table-common/src/main/java/
 * org/apache/flink/table/functions/ScalarFunction.java: a public class
 * with a public `eval` the planner discovers by reflection —
 * UserDefinedFunctionHelper.java). `SqlDdl`'s `CREATE FUNCTION f AS
 * '<class>'` registers classes of this shape; these ship with the
 * library as the documented sample + gate fixture.
 *
 * The contract mirrors the reference exactly: public no-arg
 * constructor, ONE public `eval`, JVM types in the signature (boxes
 * for nullable SQL inputs — a null argument yields a null result).
 */

/** `FLOOR(v * scale)` as a BIGINT — fixed-point conversion (dollars →
  * cents with scale 100). */
class FloorScale {
  def eval(v: java.lang.Double, scale: java.lang.Long): java.lang.Long =
    if (v == null || scale == null) null
    else java.lang.Long.valueOf(math.floor(v * scale).toLong)
}
