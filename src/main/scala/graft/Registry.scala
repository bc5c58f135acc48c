package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed to the driver's correctness harness.
  *
  * @param name   stable query id (key in `SparkEntry.queries`)
  * @param run    Spark formulation; `sfDir` points at the testdata scale dir
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None for
  *               ops whose semantics aren't SQL-expressible (driver then does
  *               a weaker rows-only check)
  *
  * Keeping the Spark code and its oracle adjacent is deliberate: the driver
  * hash-compares column-name-sorted results, so the two sides must agree on
  * every output column name.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered capabilities, every SURVEY.md §2 operator maps to ≥1. */
  lazy val all: Seq[Q] =
    relational.RelationalQueries.all ++
      text.TextQueries.all ++
      text.BpeQueries.all ++
      graph.GraphQueries.all ++
      llm.LlmQueries.all ++
      streaming.StreamingQueries.all ++
      multimodal.MultimodalQueries.all ++
      multimodal.ImageCropQueries.all ++
      multimodal.KeyframeQueries.all

  lazy val byName: Map[String, Q] = {
    val dup = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate query names would silently shadow each other: ${dup.mkString(", ")}")
    all.map(q => q.name -> q).toMap
  }
}
