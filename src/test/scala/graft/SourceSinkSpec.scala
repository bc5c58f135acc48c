package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink surface (SURVEY.md §2.2 "scans/sources/sinks"): the
  * reference reads text files and prints formatted dumps; our engine
  * inherits Spark's format matrix. Round-trip equality per format. */
class SourceSinkSpec extends AnyFunSuite {
  import TestSession._

  private lazy val sample = Tables.customer(spark, sf0001)
    .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  private def roundTrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
    sample.write.mode("overwrite").format(fmt)
      .option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    assert(back.count() == sample.count())
    val a = sample.orderBy("c_custkey").collect().map(_.getLong(0))
    val b = back.orderBy("c_custkey").collect().map(r =>
      r.get(r.fieldIndex("c_custkey")).toString.toLong)
    assert(a.sameElements(b))
  }

  test("parquet round trip")(roundTrip("parquet"))
  test("csv round trip")(roundTrip("csv"))
  test("json round trip")(roundTrip("json"))
  test("orc round trip")(roundTrip("orc"))

  test("Compact sizes writes toward the target file size") {
    val li = Tables.lineitem(spark, sf0001).repartition(16)
    // huge target → everything folds (shuffle-free) into one file
    val one = graft.sources.Compact.forWrite(li, targetBytes = 1L << 30)
    assert(one.rdd.getNumPartitions == 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    one.write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    // tiny target only splits when growth is explicitly allowed (shuffle)
    val base = li.coalesce(1)
    assert(graft.sources.Compact.forWrite(base, targetBytes = 64L * 1024)
      .rdd.getNumPartitions == 1)
    assert(graft.sources.Compact.forWrite(base, targetBytes = 64L * 1024,
      allowGrow = true).rdd.getNumPartitions > 1)
  }

  test("partitioned write produces one directory per key (neigh_tri sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pv").toString
    val perVertex = edges((1L, 2L), (1L, 3L), (2L, 3L))
      .select(col("src").as("v"), col("dst"))
    graft.graph.Triangles.writePerVertex(perVertex, dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).sorted
    assert(parts.sameElements(Array("v=1", "v=2")))
  }

  test("partitioned layout prunes at the scan (only the filtered dir is read)") {
    // the 100 TB layout receipt: a lang-partitioned corpus + a lang
    // filter must show PartitionFilters at the file scan and touch ONE
    // partition directory — scan-level pruning, not a post-read filter
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Tables.documents(spark, sf0001)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).where(col("lang") === "en")
      .select(col("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"the lang predicate must prune partitions at the scan:\n$plan")
    val read = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(read.contains(1), s"exactly one partition dir must be read: $read")
  }

  test("NTZ-annotated parquet timestamps normalize to instant semantics") {
    // regression for the round-9 testdata regeneration: parquet
    // timestamp(isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ, which
    // rejects CAST(ts AS DOUBLE) — Tables.load must normalize it so
    // ts arithmetic (sessionize's gap test) keeps working across
    // testdata vintages
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0)),
      org.apache.spark.sql.Row(1L, java.time.LocalDateTime.of(2026, 1, 1, 0, 10, 0)),
      org.apache.spark.sql.Row(1L, java.time.LocalDateTime.of(2026, 1, 1, 9, 0, 0)))
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampNTZType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      "NTZ column must normalize to TimestampType")
    val sessions = graft.operators.Sessionize.sessionize(
      ev, "user_id", "ts", tieCol = "ts", gapSec = 1800)
    assert(sessions.select(countDistinct(col("session_id"))).head.getLong(0) == 2,
      "a 30-minute gap rule must split the 9h-later event into a new session")
  }
}
