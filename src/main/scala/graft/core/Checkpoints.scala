package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit release of `localCheckpoint()` block-manager storage.
  *
  * A local checkpoint materializes the frame into executor storage and
  * truncates lineage; Spark only frees those blocks when the JVM garbage
  * collector happens to collect the RDD reference and the ContextCleaner
  * notices. Inside an iterative driver that checkpoints every round — and
  * across a 103-query bench/verify session — the dead rounds accumulate
  * until GC pressure evicts live cache and inflates job latency. On a real
  * cluster the same leak steals storage memory from every later stage, so
  * eager release is the scale-correct discipline, not just a bench fix:
  * each loop below releases round N's checkpoint as soon as round N+1 is
  * materialized, and the harness releases a query's terminal checkpoints
  * once its result is consumed.
  *
  * Releasing is only safe when the frame is truly dead: a local
  * checkpoint's blocks ARE its data (lineage is gone), so a released
  * frame cannot be recomputed.
  */
object Checkpoints {

  /** Unpersist the checkpoint blocks reachable from each frame's plan.
    * Safe on non-checkpointed frames (no LogicalRDD → no-op). Async
    * (non-blocking) — the blocks disappear without stalling the driver.
    * Deduped by RDD id: a checkpointed frame consumed by two plan
    * branches (e.g. an index probe feeding both df and scoring) appears
    * as two LogicalRDD leaves, and a second RemoveRdd for the same
    * blocks logs spurious "Block does not exist" executor errors. */
  def release(dfs: DataFrame*): Unit = {
    val seen = scala.collection.mutable.Set.empty[Int]
    dfs.foreach { df =>
      df.queryExecution.analyzed.foreach {
        case l: LogicalRDD if seen.add(l.rdd.id) =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
  }
}
