package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct/min/max in ONE
  * aggregate pass — the pre-training corpus audit ("does this table
  * look right before I spend a cluster-week on it"). The reference has
  * no analog (its closest is `kv_stats`' key/value byte stats); this is
  * the relational-side counterpart over any table.
  *
  * Output is long-format, one row per profiled column:
  * (col_name, n_rows, n_nonnull, n_distinct, min_s, max_s) — min/max
  * cast to string AFTER aggregation so mixed-type tables share one
  * schema.
  *
  * 100 TB shape: a single Aggregate — no joins, no windows; the
  * multi-column exact `count(distinct)` expands the scan by the number
  * of profiled columns (Spark's Expand operator) and partial-aggregates
  * map-side, so the shuffle carries one row per (partition, distinct
  * group). For very-high-cardinality columns at extreme scale, swap
  * exact distinct for the [[KmvDistinct]] sketch column-by-column (same
  * output contract, bounded state — the estimate is deterministic and
  * equally oracle-replayable); exact is kept here because the profile
  * IS the correctness surface. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single aggregate row: driver-bounded (|cols| structs)
    one.select(explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          col(s"${c}__nonnull").as("n_nonnull"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_s"),
          col(s"${c}__max").as("max_s"))
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nonnull"),
        col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
  }
}
