package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin user facade over the operator library (the SURVEY §7.1 "Engine"):
  * binds a session once, registers the SQL function surface, and exposes
  * the capability registry by name — the discoverable entry point for a
  * user switching from the reference's script/command surface. All logic
  * lives in the operator modules (`core.MrOps`, `graph.*`, `text.*`,
  * `llm.*`, `operators.*`, `sources.*`, `streaming.*`); the facade adds
  * none.
  */
final class Engine(val spark: SparkSession) {

  GraftExtensions.register(spark) // the full native-expression SQL surface

  /** Run a registered capability by name against a testdata directory
    * (the OINK named-command analog: one call per command). */
  def query(name: String, sfDir: String): DataFrame =
    Registry.byName.getOrElse(name,
      throw new NoSuchElementException(
        s"unknown capability '$name'; see queryNames")).run(spark, sfDir)

  /** Every registered capability name. */
  def queryNames: Seq[String] = Registry.all.map(_.name).sorted

  /** Capabilities with a DuckDB-replayable oracle — since round 4 this
    * is every registered capability. */
  def oracleCheckedNames: Seq[String] =
    Registry.all.filter(_.oracle.isDefined).map(_.name).sorted
}
