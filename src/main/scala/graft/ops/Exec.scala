package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Execution-shape helpers shared by the operator families. */
object Exec {

  /** Broadcast `df` only when its row count is at most `maxRows`; otherwise
    * return it unhinted and let AQE pick the join strategy from runtime
    * shuffle stats. An UNCONDITIONAL broadcast hint on a data-dependent
    * candidate set is a scale hazard: a boilerplate-heavy corpus (every doc
    * landing in one LSH band bucket) inflates the candidate-pair set past
    * the broadcast limit and kills the job. The count here is cheap — `df`
    * is persisted first and every call site passes a narrow
    * (few-long-columns) frame, so the gate costs one small job and the
    * frame is computed once either way.
    */
  def broadcastIfSmall(df: DataFrame, maxRows: Long): DataFrame = {
    val pinned = df.persist()
    if (pinned.count() <= maxRows) broadcast(pinned) else pinned
  }
}
