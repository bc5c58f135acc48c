package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single most recent right
  * row at or before the left row's timestamp, per key — the "latest
  * feature value as of this example's timestamp" operator of
  * feature/training pipelines (pandas merge_asof, DuckDB ASOF JOIN;
  * absent from Spark's operator set).
  *
  * Formulation is a UNION + running `last(ignoreNulls)` window — the
  * compose-existing-ops path (SURVEY §4.1 preference ladder) rather than
  * a custom plan node, because it is already optimal at scale: ONE
  * shuffle on the key, one sort per partition, and — unlike the naive
  * range join + row_number formulation — no candidate-pair blowup: a left
  * row never materializes more than itself, regardless of how many right
  * rows precede it. Spark plans the whole thing as a single Window over
  * sorted runs, entirely whole-stage-friendly.
  *
  * Contract: `right` must be unique per (key, ts) for a deterministic
  * answer (pre-aggregate if not — ties among identical (key, ts) right
  * rows are otherwise resolved arbitrarily); equal timestamps match
  * (ts_right == ts_left is "at or before", the DuckDB ASOF convention).
  * Right value columns surface as `asof_<name>`, null when no right row
  * precedes the left row.
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "asof join needs at least one right value column")
    val l2 = left.withColumn("__q", lit(1))
    val r2 = right.select(
      (Seq(col(key), col(ts)) ++ rightVals.map(c => col(c).as(s"asof_$c"))): _*)
      .withColumn("__q", lit(0))
    // right rows sort before left rows at equal ts (__q 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row's window
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__q").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct is carried through the window, built only on right rows
    // (left rows contribute null, which ignoreNulls skips): every asof_*
    // value is then guaranteed to come from the same single most recent
    // right row — including its genuine nulls. Filling each value column
    // independently would let an older row's value bleed through a null
    // in the matched row, and could blend columns from different rows.
    val rightStruct = when(col("__q") === 0,
      struct(rightVals.map(c => col(s"asof_$c")): _*))
    val filled = u
      .withColumn("__r", last(rightStruct, ignoreNulls = true).over(w))
    val expanded = rightVals.foldLeft(filled)((df, c) =>
      df.withColumn(s"asof_$c", col("__r").getField(s"asof_$c")))
    expanded.where(col("__q") === 1).drop("__q", "__r")
  }
}
