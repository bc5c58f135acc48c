package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.Multimodal

/** Partition-count evidence for the r19 fused twin synthesis (verdict
  * item #5): prints `rdd.getNumPartitions` for each synthesis twin and
  * for the corpus ∪ twin union a live ingest consumes. The `.rdd` probe
  * EXECUTES the spread exchanges (AQE materializes upstream stages), so
  * this is a measurement tool only — never on a query path.
  *
  * Usage: runMain graft.tools.R19TwinPartsProbe <sfDir>
  */
object R19TwinPartsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def p(name: String, df: DataFrame): Unit =
      println(s"[parts] $name parts=${df.rdd.getNumPartitions}")

    p("audioExcerptTable", Multimodal.audioExcerptTable(spark, sfDir))
    p("imageCropTable", Multimodal.imageCropTable(spark, sfDir))
    p("imageCrop2dTable", Multimodal.imageCrop2dTable(spark, sfDir))
    p("videoPerceptualTwinTable",
      Multimodal.videoPerceptualTwinTable(spark, sfDir, frameBytes = 32))
    p("videoKeyframePerceptualTwinTable",
      Multimodal.videoKeyframePerceptualTwinTable(spark, sfDir))
    p("imageTable ∪ imageCropTable",
      Multimodal.imageTable(spark, sfDir)
        .unionByName(Multimodal.imageCropTable(spark, sfDir)))
    p("audioTable ∪ audioExcerptTable",
      Multimodal.audioTable(spark, sfDir)
        .unionByName(Multimodal.audioExcerptTable(spark, sfDir)))
    spark.stop()
  }
}
