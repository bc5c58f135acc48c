package graft.tools

import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Per-stage profile of a registered query: taskSec / cpuSec / task
  * count / shuffle records in+out / input records per stage, sorted by
  * taskSec. Identifies WHERE a query's time goes on a box whose
  * wall-clock noise (±30–65% on sub-second rows) hides it — shuffle
  * record counts tie stages back to plan operators (the band join's
  * map side writes the candidate fan-out; the verify stage reads it).
  *
  * Usage: runMain graft.tools.R19StageProfile <sfDir> <query> [top]
  */
object R19StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val top = if (args.length > 2) args(2).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(taskMs: Long, cpuMs: Long, tasks: Int,
      inRec: Long, shRead: Long, shWrite: Long)
    val log = new java.util.concurrent.ConcurrentLinkedQueue[St]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          log.add(St(m.executorRunTime, m.executorCpuTime / 1000000L,
            s.stageInfo.numTasks, m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten))
        }
      })

    val q = Registry.byName(name)
    graft.Bench.warmFixtures(spark, sfDir)
    // warm run (codegen, listing) — not profiled
    locally { val df = q.run(spark, sfDir); df.count()
      graft.core.Checkpoints.release(df) }
    Thread.sleep(500); log.clear()
    val w0 = System.nanoTime()
    val df = q.run(spark, sfDir)
    val n = df.count()
    val wall = (System.nanoTime() - w0) / 1e9
    Thread.sleep(500)
    graft.core.Checkpoints.release(df)
    import scala.jdk.CollectionConverters._
    val sts = log.asScala.toSeq
    println(("[sprof] %s rows=%d stages=%d taskSec=%.2f cpuSec=%.2f " +
      "wall=%.2f").formatLocal(Locale.ROOT, name, n, sts.size,
      sts.map(_.taskMs).sum / 1e3, sts.map(_.cpuMs).sum / 1e3, wall))
    sts.sortBy(-_.taskMs).take(top).foreach { s =>
      println(("[sprof]   task=%.2fs cpu=%.2fs tasks=%d in=%d " +
        "shRead=%d shWrite=%d").formatLocal(Locale.ROOT, s.taskMs / 1e3,
        s.cpuMs / 1e3, s.tasks, s.inRec, s.shRead, s.shWrite))
    }
    spark.stop()
  }
}
