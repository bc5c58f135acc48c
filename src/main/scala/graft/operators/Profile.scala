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

  /** Pairwise Pearson correlation matrix over numeric columns in ONE
    * aggregate pass (the profiling step after [[profile]]: "are these
    * features redundant"): all Σx, Σx², and Σxy moments partial-
    * aggregate map-side in a single Aggregate; the |cols|²/2 ratio rows
    * explode from the one result row. Output (col_a, col_b, corr) for
    * each unordered pair, 6 dp. The explicit-moment formula (not the
    * engine's corr()) keeps the expression structure identical on both
    * engines; the ratio is scale-free, so summation-order ulps vanish
    * under the rounding. Zero-variance columns yield null. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("__n")) ++
        cols.flatMap { c =>
          Seq(sum(col(c).cast("double")).as(s"${c}__s"),
            sum(col(c).cast("double") * col(c).cast("double"))
              .as(s"${c}__ss"))
        } ++
        pairs.map { case (a, b) =>
          sum(col(a).cast("double") * col(b).cast("double"))
            .as(s"${a}__${b}__sp")
        }
    val n = col("__n")
    def varTerm(c: String): Column =
      n * col(s"${c}__ss") - col(s"${c}__s") * col(s"${c}__s")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          when(varTerm(a) > 0.0 && varTerm(b) > 0.0,
            round((n * col(s"${a}__${b}__sp") -
                col(s"${a}__s") * col(s"${b}__s")) /
              (sqrt(varTerm(a)) * sqrt(varTerm(b))), 6)).as("corr"))
      }: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.corr"))
  }
}
