package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Registry, Tables}
import graft.llm.Similarity

/** Dev probe (SCALE.md "ANN recall, measured"): recall@5 of every
  * approximate-ANN registered query against the exact brute force OF
  * ITS OWN METRIC — cosine truth for the cosine rankers (IVF, LSH), L2
  * truth for the PQ family (ADC scores quantized SQUARED DISTANCE; on
  * unnormalized vectors the two exact rankings differ, so grading PQ
  * against cosine truth would measure the metric gap, not the
  * quantization loss). Also sweeps the IVF nProbe dial so the
  * recall/cost contract is a measured curve, not an argument.
  * All variants share the probe set (vec_id < 10) and k = 5.
  * Usage: runMain graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {

  private def pairsOf(df: DataFrame): Set[(Long, Long)] = {
    val out = df.select(col("qid").cast("long"), col("nid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.core.Checkpoints.release(df)
    out
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)

    val cosTruth = pairsOf(Registry.byName("q_embed_knn").run(spark, sfDir))

    // exact L2 top-5 per probe — the ranking contract of the PQ family
    // (rounded squared distance asc, nid tiebreak)
    val sq = Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * Similarity.dot(col("qv"), col("nv")) +
      Similarity.dot(col("nv"), col("nv"))
    val q = broadcast(emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d").asc, col("nid").asc)
    val l2Truth = pairsOf(q
      .crossJoin(emb.select(col("vec_id").as("nid"), col("embedding").as("nv")))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(sq, 6).as("d"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5))

    def report(name: String, got: Set[(Long, Long)],
        truth: Set[(Long, Long)], metric: String): Unit = {
      val hit = (got & truth).size
      println(f"RECALL $name%-28s vs $metric%-6s recall@5=" +
        f"${hit.toDouble / truth.size}%.3f ($hit/${truth.size})")
    }

    Seq("q_embed_ivf_knn", "q_embed_lsh_knn").foreach { n =>
      report(n, pairsOf(Registry.byName(n).run(spark, sfDir)), cosTruth, "cos")
    }
    Seq("q_embed_pq_knn", "q_embed_pq_refined", "q_embed_ivfpq_knn",
      "q_embed_ivfpq_res_knn").foreach { n =>
      report(n, pairsOf(Registry.byName(n).run(spark, sfDir)), l2Truth, "l2")
    }
    // the IVF recall/cost dial, measured
    Seq(1, 2, 4, 8, 16).foreach { np =>
      report(s"ivfKnn(nProbe=$np)", pairsOf(Similarity.ivfKnn(emb,
        "vec_id", "embedding", col("vec_id") < 10, k = 5,
        numCentroids = 64, nProbe = np)), cosTruth, "cos")
    }
    // the PQ fidelity dials: finer codebooks (m, ksub) and a deeper
    // exact-re-rank shortlist
    Seq((4, 8, 20), (8, 16, 20), (8, 16, 50), (16, 16, 50)).foreach {
      case (m, ksub, sl) =>
        report(s"pqKnnRefined(m=$m,ksub=$ksub,sl=$sl)",
          pairsOf(Similarity.pqKnnRefined(emb, "vec_id", "embedding",
            dim = 64, col("vec_id") < 10, m = m, ksub = ksub,
            shortlistK = sl, k = 5)), l2Truth, "l2")
    }
    // SQ8 asymmetric scoring (r12): cosine over int8 codes + exact
    // re-rank — per-vector 8-bit quantization should sit far above the
    // PQ dials (8 bits/dim vs PQ's ~0.5-2 bits/dim)
    Seq(5, 20).foreach { sl =>
      report(s"int8Knn(sl=$sl)", pairsOf(Similarity.int8Knn(emb,
        "vec_id", "embedding", col("vec_id") < 10, shortlistK = sl,
        k = 5)), cosTruth, "cos")
    }

    // ---- clustered fixture (r10 VERDICT #1) ----------------------------
    // The driver fixture's embeddings are near-uniform — the ADVERSARIAL
    // case for cell-routed ANN (cosine to a random centroid barely orders
    // uniform vectors, so probed cells rarely hold the true neighbors).
    // Real embedding corpora are the opposite: they cluster (that is the
    // entire premise of IVF and SemDeDup). This section measures the same
    // dials on [[graft.llm.Similarity.syntheticClustered]] — the EXACT
    // derivation behind the registered q_embed_knn_clustered /
    // q_embed_ivf_knn_clustered queries (16 mixer-assigned clusters,
    // uniform ±0.3 noise around uniform [-1,1]^64 centers), so the
    // recall table describes precisely what is registered: the uniform
    // floor above and the clustered regime the production configs are
    // tuned for.
    // persist, NOT localCheckpoint: pairsOf releases each result's
    // reachable checkpoints, which would drop a checkpointed input's
    // blocks after the first query (a cached frame stays recomputable
    // and release() ignores it)
    val clustered = Similarity.syntheticClustered(emb, "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"CLUSTERED fixture: ${clustered.count()} rows, 16 clusters, noise ±0.3")
    val cCosTruth = pairsOf(Similarity.bruteForceKnn(clustered, "vec_id",
      "embedding", col("vec_id") < 10, k = 5))
    val cq = broadcast(clustered.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")))
    val cL2Truth = pairsOf(cq
      .crossJoin(clustered.select(col("vec_id").as("nid"),
        col("embedding").as("nv")))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(sq, 6).as("d"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5))
    Seq(1, 2, 4, 8, 16).foreach { np =>
      report(s"CLUSTERED ivfKnn(nProbe=$np)", pairsOf(Similarity.ivfKnn(
        clustered, "vec_id", "embedding", col("vec_id") < 10, k = 5,
        numCentroids = 64, nProbe = np)), cCosTruth, "cos")
    }
    report("CLUSTERED lshKnn(nPlanes=4)", pairsOf(Similarity.lshKnn(
      clustered, "vec_id", "embedding", dim = 64, col("vec_id") < 10,
      k = 5, nPlanes = 4)), cCosTruth, "cos")
    Seq((4, 8, 20), (16, 16, 50)).foreach { case (m, ksub, sl) =>
      report(s"CLUSTERED pqKnnRefined(m=$m,ksub=$ksub,sl=$sl)",
        pairsOf(Similarity.pqKnnRefined(clustered, "vec_id", "embedding",
          dim = 64, col("vec_id") < 10, m = m, ksub = ksub,
          shortlistK = sl, k = 5)), cL2Truth, "l2")
    }
    Seq(5, 20).foreach { sl =>
      report(s"CLUSTERED int8Knn(sl=$sl)", pairsOf(Similarity.int8Knn(
        clustered, "vec_id", "embedding", col("vec_id") < 10,
        shortlistK = sl, k = 5)), cCosTruth, "cos")
    }

    // ---- routed-build partition quality (r13) --------------------------
    // The two-level ROUTED corpus assignment (q_embed_ivf_knn_routed_
    // stored) can park a vector outside its exact-nearest cell (the
    // coarse nProbe=1 approximation), so the same serve dial can recall
    // less than the flat-built twin — this measures that cost on both
    // fixtures so the dial has a number at the registered 64/nProbe
    // configuration.
    def storedRecall(frame: DataFrame, tag: String,
        truth: Set[(Long, Long)]): Unit = {
      val qs = frame.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Seq(("flat", 64), ("routed", 0)).foreach { case (mode, routeAbove) =>
        val nm = s"graft_recall_${mode}_$tag"
        graft.sources.IvfIndex.build(spark, frame, "vec_id", "embedding",
          nm, numCentroids = 64, routeAbove = routeAbove)
        Seq(4, 8, 16).foreach { np =>
          report(s"$tag stored-$mode serve(nProbe=$np)",
            pairsOf(graft.sources.IvfIndex.serve(spark, nm, qs, k = 5,
              nProbe = np)), truth, "cos")
        }
      }
    }
    storedRecall(emb, "uniform", cosTruth)
    storedRecall(clustered, "clustered", cCosTruth)
    clustered.unpersist()
    spark.stop()
  }
}
