package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for eager-localCheckpoint iteration loops (ADVICE r7).
  *
  * `Dataset.localCheckpoint()` materializes the plan into a persisted
  * internal RDD and returns a Dataset over a [[LogicalRDD]] leaf. A loop
  * that checkpoints every round (PageRank-to-convergence, connected
  * components) therefore accumulates one persisted node-sized RDD PER
  * ROUND in executor storage unless superseded checkpoints are explicitly
  * unpersisted — on a 1e8-node graph at 40 rounds that is 40 copies of the
  * rank table resident for no reason. `Dataset.unpersist()` does not help:
  * it talks to the CacheManager, which never heard of the checkpoint RDD.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD(s) under a localCheckpoint'ed
    * DataFrame. Safe on any DataFrame — plans without a LogicalRDD leaf
    * are left untouched; non-blocking so the loop never waits on block
    * eviction. Call AFTER the superseding round's checkpoint has
    * materialized (eager localCheckpoint), never on a frame still feeding
    * downstream plans. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
}
