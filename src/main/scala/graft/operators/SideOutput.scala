package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Side outputs (SURVEY §2.2: OutputTag /
 * SingleOutputStreamOperator.getSideOutput — one operator emitting to
 * multiple logical streams).
 *
 * Spark-first mapping: tag rows in one pass, split downstream with
 * filters. With `cache=true` the tagged frame is computed once and each
 * side reads from the cached plan — the batch analogue of one operator
 * fanning out. In streaming, use the same tagging with `foreachBatch`
 * multi-write (each micro-batch tagged once, written N ways).
 */
object SideOutput {

  /** Tag + split: returns tag → filtered view; rows whose tag is not in
    * `tags` fall into the "__rest" entry (like unconsumed side output). */
  def split(df: DataFrame, tag: Column, tags: Seq[String],
            cache: Boolean = true): Map[String, DataFrame] = {
    val tagged = df.withColumn("__tag", tag)
    val base = if (cache) tagged.cache() else tagged
    val named = tags.map(t => t -> base.filter(col("__tag") === t).drop("__tag"))
    (named :+ ("__rest" ->
      base.filter(!col("__tag").isin(tags.map(lit): _*)).drop("__tag"))).toMap
  }
}
