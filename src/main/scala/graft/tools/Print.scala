package graft.tools

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's formatted KV dump — `print(proc, nstride, kflag,
  * vflag)` (`src/mapreduce.cpp:1671-1768`, `src/keyvalue.cpp:773-830`,
  * `doc/print.txt`): every pair rendered as
  * `KV pair: proc P, sizes KB VB, key K, value V`, with kflag/vflag 0–7
  * choosing how the raw bytes are interpreted. Spark columns carry their
  * types already, so each flag maps to a render + the byte size the
  * reference would have reported for that C type.
  *
  * A debugging surface by design, like the original: `lines` builds the
  * formatted dataset distributed (one `spark_partition_id` per "proc",
  * per-partition stride like the reference's every-Nth-pair), `dump`
  * prints to the driver console (the reference token-passes rank order
  * through MPI for the same effect), and `toFiles` writes file.P per
  * partition (fflag=1) or one file (fflag=0).
  */
object Print {

  /** Rendered form of `cols` under `flag` (doc/print.txt table):
    * 0 NULL · 1 int · 2 uint64 · 3 float · 4 double · 5 string ·
    * 6 int pair · 7 uint64 pair. Pairs take two columns; the rest one. */
  private def render(flag: Int, cols: Seq[Column]): Column = flag match {
    case 0 => lit("NULL")
    case 1 => cols.head.cast("int").cast("string")
    case 2 => cols.head.cast("long").cast("string")
    case 3 => format_string("%g", cols.head.cast("float"))
    case 4 => format_string("%g", cols.head.cast("double"))
    case 5 => cols.head.cast("string")
    case 6 => concat_ws(" ", cols.take(2).map(_.cast("int").cast("string")): _*)
    case 7 => concat_ws(" ", cols.take(2).map(_.cast("long").cast("string")): _*)
    case other => throw new IllegalArgumentException(s"Invalid print flag $other")
  }

  /** Byte size the reference would report for `flag` (C sizeof; strings
    * are strlen+1 for the NULL terminator). */
  private def sizeOf(flag: Int, cols: Seq[Column]): Column = flag match {
    case 0 => lit(0)
    case 1 | 3 => lit(4)
    case 2 | 4 => lit(8)
    case 5 => length(cols.head.cast("string")) + 1
    case 6 => lit(8)
    case 7 => lit(16)
    case other => throw new IllegalArgumentException(s"Invalid print flag $other")
  }

  /** Formatted dump lines, distributed. Every `nstride`-th pair per
    * partition is emitted (nstride = 1 → all), mirroring the reference's
    * per-processor stride walk. */
  def lines(df: DataFrame, kflag: Int, vflag: Int,
      keyCols: Seq[Column], valCols: Seq[Column],
      nstride: Int = 1, proc: Int = -1): Dataset[String] = {
    require(nstride >= 1, "nstride must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = if (proc >= 0) df.where(spark_partition_id() === proc) else df
    val rendered = base.select(
      format_string("KV pair: proc %d, sizes %d %d, key %s, value %s",
        spark_partition_id(),
        sizeOf(kflag, keyCols), sizeOf(vflag, valCols),
        render(kflag, keyCols), render(vflag, valCols)).as("line"))
      .as[String]
    if (nstride == 1) rendered
    else rendered.mapPartitions { it =>
      var i = 0
      it.filter { _ => i += 1; val keep = i == nstride; if (keep) i = 0; keep }
    }
  }

  /** Console dump, rank order — `proc < 0`: every partition in order
    * (the reference token-passes through ranks); `proc >= 0`: that
    * partition only. Driver-side by PURPOSE: this is the debugging
    * printer, not a data path. */
  def dump(df: DataFrame, kflag: Int, vflag: Int,
      keyCols: Seq[Column], valCols: Seq[Column],
      proc: Int = -1, nstride: Int = 1): Unit =
    lines(df, kflag, vflag, keyCols, valCols, nstride, proc)
      .collect().foreach(println)

  /** File dump (`print(file, fflag, ...)`): fflag = 1 → one file per
    * partition under `path/` (Spark's native layout, = the reference's
    * file.P); fflag = 0 → a single file (coalesce(1), the "all procs in
    * succession to the named file" mode). */
  def toFiles(df: DataFrame, path: String, fflag: Int, kflag: Int, vflag: Int,
      keyCols: Seq[Column], valCols: Seq[Column], nstride: Int = 1): Unit = {
    val l = lines(df, kflag, vflag, keyCols, valCols, nstride)
    (if (fflag == 0) l.coalesce(1) else l).write.mode("overwrite").text(path)
  }
}
