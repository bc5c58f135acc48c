package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver's testdata tables (TESTDATA.md).
  *
  * The reference ingests data via `map()` file-expansion variants
  * (`/root/reference/src/mapreduce.cpp:1060-1101,2812-2936`); our analog is
  * Spark's parquet scan, which gives column pruning + predicate pushdown for
  * free. All engine operators take DataFrames, so any source (csv, text,
  * binaryFile, jdbc) slots in the same way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Parquet `timestamp(isAdjustedToUTC=false)` columns arrive as
    * TIMESTAMP_NTZ, which rejects the numeric casts and unix-epoch
    * arithmetic the operators use (`CAST(ts AS DOUBLE)` is an analysis
    * error on NTZ). Every session here pins `spark.sql.session.timeZone`
    * to UTC, so casting NTZ → TIMESTAMP preserves the wall-clock value
    * exactly while restoring instant semantics — the same frame shape the
    * engine has always exposed. Applied schema-driven so a testdata
    * regeneration that flips the parquet annotation cannot change
    * operator behavior. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.col
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    ntz.foldLeft(df)((d, f) =>
      d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` it
    * arrives as LongType nanos and is converted to a microsecond timestamp
    * here (Spark's native precision). */
  def events(spark: SparkSession, d: String): DataFrame = {
    val df = load(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
