package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RangeJoin

/** Round-10 range-join rehearsal with SCALING interval sets (r9 VERDICT
  * "Next round" #5): the driver's 10× corpus copies `orders` verbatim,
  * so q_range_join's rehearsal row only ever showed the job floor — the
  * replication-factor claim in RangeJoin's scaladoc (interval side grows
  * by avg(hi−lo)/binSize + 1; binSize ≈ median length keeps it ≤ 2×) was
  * argued, not measured. This probe measures it.
  *
  * Synthesis (deterministic, mixer-driven — no RNG): points are event
  * timestamps; intervals anchor on a 1-in-8 slice of events with
  * mixer-assigned lengths 60 s × (1 + mix(id) % 240) (1 min – 4 h,
  * median ≈ 2 h — a long-tailed span population like sessions or
  * maintenance windows). Factor F replicates BOTH sides with shifted
  * event ids and a +F·year time offset so the bin space grows with the
  * data instead of densifying one hot range.
  *
  * For each binSize in {med/8, med/2, med, 2·med, 8·med} it reports:
  *   - repl: exploded interval rows / interval rows (the storage+shuffle
  *     replication the knob controls)
  *   - the full pointInInterval wall time (min of 3) at F = 1 and 10
  * The SCALE.md row quotes repl at binSize = med and the 10× time ratio.
  *
  * Usage: runMain graft.tools.R10RangeProbe <sfDir>
  */
object R10RangeProbe {

  /** The repo's portable int64 mixer (KmvDistinct's constants). */
  private def mix(c: org.apache.spark.sql.Column) =
    pmod((pmod(c, lit(1000000007L)) * lit(2654435761L)) + lit(283521L),
      lit(1000000007L))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"))

    def sides(factor: Int): (DataFrame, DataFrame) = {
      val reps = (0 until factor).map { r =>
        ev.select((col("event_id") + lit(r * 100000000L)).as("event_id"),
          (col("t") + lit(r * 31557600L)).as("t"))
      }.reduce(_ unionByName _)
      val pts = reps.select(col("event_id").as("pid"), col("t"))
      val iv = reps.where(pmod(mix(col("event_id")), lit(8L)) === 0L)
        .select(col("event_id").as("anchor"), col("t").as("lo"),
          (col("t") + lit(60L) * (lit(1L) + pmod(mix(col("event_id") + 7L),
            lit(240L)))).as("hi"))
      (pts.localCheckpoint(), iv.localCheckpoint())
    }

    def probe(factor: Int): Unit = {
      val (pts, iv) = sides(factor)
      val nPts = pts.count(); val nIv = iv.count()
      val med = iv.select(expr("median(hi - lo)")).collect()(0).getDouble(0)
      println(f"FACTOR $factor%d: points=$nPts%d intervals=$nIv%d " +
        f"median_len=$med%.0f s")
      for (bin <- Seq(med / 8, med / 2, med, 2 * med, 8 * med).map(_.toLong)) {
        val repl = iv.withColumn("_nb",
          (expr(s"(hi - pmod(hi, ${bin}L)) div ${bin}L") -
            expr(s"(lo - pmod(lo, ${bin}L)) div ${bin}L")) + lit(1L))
          .agg(sum(col("_nb")).cast("double") / count(lit(1)))
          .collect()(0).getDouble(0)
        var rows = 0L
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          rows = RangeJoin.pointInInterval(pts, iv, "t", "lo", "hi", bin)
            .count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"  bin=$bin%6d s  repl=$repl%5.2fx  " +
          f"t=${ts.min}%6.2f s  out_rows=$rows%d")
      }
      graft.core.Checkpoints.release(pts, iv)
    }

    probe(1)
    probe(10)
    spark.stop()
  }
}
