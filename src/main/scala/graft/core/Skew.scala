package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling — the Spark port of cc_find's nthresh zone splitting
  * (`/root/reference/oink/cc_find.cpp:224-264`): giant keys are split
  * across `salts` sub-keys with a random salt, aggregated in two phases.
  *
  * Algebraic aggregations don't need this (partial aggregation already
  * splits hot keys map-side); it exists for NON-algebraic per-key work —
  * `collect_list`-style holistic aggregates, or `flatMapGroups` bodies —
  * where a single reducer would otherwise receive the whole hot key.
  * For joins, prefer AQE's skew-join handling (on by default).
  */
object Skew {

  /** Two-phase salted aggregation: `partial` runs per (key, salt) on
    * 1/salts of each key's rows, `merge` combines the salt partials.
    * Requires partial's output to be mergeable (a commutative monoid). */
  def saltedAgg(df: DataFrame, key: Column, salts: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    val phase1 = salted.groupBy(key.as("_k"), col("_salt"))
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(col("_k")).agg(merge.head, merge.tail: _*)
  }

  /** Salted distinct: exact dedup where one key value dominates —
    * pre-dedup within (key, salt), then global dedup touches only the
    * already-thinned stream. */
  def saltedDistinct(df: DataFrame, salts: Int): DataFrame = {
    val cols = df.columns.map(col)
    df.withColumn("_salt", spark_partition_id() % salts)
      .dropDuplicates(df.columns :+ "_salt")
      .drop("_salt")
      .dropDuplicates(df.columns)
      .select(cols: _*)
  }
}
