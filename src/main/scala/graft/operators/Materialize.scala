package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Pin a multiply-consumed frame so its (shuffle/explode-bearing)
 * subtree computes once. Default is `localCheckpoint()` — eager,
 * lineage-truncating, and its blocks free on plan GC so bench reps
 * don't accumulate storage — but localCheckpoint blocks are
 * NON-REPLICATED and NON-FAULT-TOLERANT: on a cluster with executor
 * loss (dynamic allocation, spot instances) a lost block fails the
 * query instead of recomputing (r17 ADVICE item). Deployments in that
 * regime set `spark.graft.materialize=cache` to trade the lineage cut
 * for recomputability.
 *
 * Apply only where the duplicated subtree carries an exchange or a
 * volume-expanding explode — materializing cheap subtrees was measured
 * SLOWER (OPTIMIZATION_r17 §C5: duplicate cheap subtrees run in
 * parallel on idle cores; a checkpoint serializes an extra job onto
 * the critical path).
 */
private[graft] object Materialize {
  def frame(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.materialize")
      .getOrElse("localCheckpoint") match {
      case "cache" => df.cache()
      case _       => df.localCheckpoint()
    }
}
