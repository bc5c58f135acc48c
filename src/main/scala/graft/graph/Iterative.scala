package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph algorithms of the OINK command library (SURVEY.md §2.4):
  * connected components (`oink/cc_find.cpp`), Luby maximal independent set
  * (`oink/luby_find.cpp`), single-source shortest paths (`oink/sssp.cpp`),
  * and PageRank (completing the reference's stub `oink/pagerank.cpp:52-64`
  * against its documented spec `oinkdoc/pagerank.txt`).
  *
  * Shared iteration discipline (SURVEY.md §7.4.2): every round ends in
  * `localCheckpoint()` to cut lineage (the analog of the reference's
  * in-place KV replacement), convergence is decided by a driver-side count
  * (the analog of its terminal `MPI_Allreduce` flag,
  * `oink/cc_find.cpp:84-86`), and loop-invariant inputs are partitioned by
  * their join key once and persisted (`oink/sssp.cpp:75-76` idiom).
  */
object Iterative {

  /** Symmetric adjacency (v, nbr), self-loops dropped, deduped. */
  private def symmetric(edges: DataFrame): DataFrame = {
    val u = GraphOps.edgeUpper(edges)
    u.select(col("src").as("v"), col("dst").as("nbr"))
      .union(u.select(col("dst").as("v"), col("src").as("nbr")))
  }

  /** cc_find (`oink/cc_find.cpp:38-109`): connected components by min-label
    * propagation to fixpoint; label = min vertex id in the component
    * (matches `oinkdoc/cc_find.txt`). Returns (v, label).
    *
    * The reference's nthresh zone-splitting handles skew in its giant-zone
    * groupBy; here the per-round aggregation is a plain `min`, which Spark
    * partial-aggregates map-side, so a giant component never concentrates
    * on one task — the skew the reference had to hand-salt doesn't arise.
    */
  def ccFind(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val adj = symmetric(edges)
      .repartition(col("nbr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = adj.select(col("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // propagate each vertex's label to its neighbors, take the min
      val cand = adj
        .join(labels.withColumnRenamed("v", "nbr"), "nbr")
        .select(col("v"), col("label"))
      val next = labels.union(cand)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), "v")
        .where(col("label") < col("old")).count()
      labels = next
      iter += 1
    }
    adj.unpersist()
    labels
  }

  /** cc_stats (`oink/cc_stats.cpp:47-56`): #components per size. */
  def ccStats(labels: DataFrame): DataFrame =
    labels.groupBy(col("label")).agg(count(lit(1)).as("csize"))
      .groupBy(col("csize")).agg(count(lit(1)).as("n_components"))

  /** luby_find (`oink/luby_find.cpp:60-90`): maximal independent set.
    * The reference draws per-vertex random priorities from a seeded RNG
    * (`oink/cc_find.cpp:45-46` pattern); we use xxhash64(v, seed) — same
    * role, deterministic on any cluster layout. Returns (v) ∈ MIS. */
  def lubyMis(edges: DataFrame, seed: Long = 12345L, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    var adj = symmetric(edges).localCheckpoint()
    var active = adj.select(col("v")).distinct()
      .withColumn("prio", xxhash64(col("v"), lit(seed)))
      .localCheckpoint()
    var mis = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      active.select("v").schema)
    var iter = 0
    while (active.count() > 0 && iter < maxIter) {
      // winner: priority strictly below every active neighbor's
      val nbrPrio = adj
        .join(active.select(col("v").as("nbr"), col("prio").as("nprio")), "nbr")
        .groupBy(col("v")).agg(min(struct(col("nprio"), col("nbr"))).as("minNbr"))
      val winners = active.join(nbrPrio, Seq("v"), "left")
        .where(col("minNbr").isNull ||
          struct(col("prio"), col("v")) < col("minNbr"))
        .select(col("v"))
        .localCheckpoint()
      mis = mis.union(winners).localCheckpoint()
      // remove winners and their neighborhoods
      val removed = winners
        .union(adj.join(winners, "v").select(col("nbr").as("v")))
        .distinct()
      active = active.join(removed, Seq("v"), "left_anti").localCheckpoint()
      adj = adj.join(removed, Seq("v"), "left_anti")
        .join(removed.withColumnRenamed("v", "nbr"), Seq("nbr"), "left_anti")
        .localCheckpoint()
      iter += 1
    }
    mis
  }

  /** sssp (`oink/sssp.cpp:49-160`): Bellman-Ford frontier relaxation from
    * one source over weighted directed edges (src, dst, w).
    * Edges are partitioned by src once and persisted across all rounds —
    * the reference's `aggregate(NULL)` pre-partition idiom. Returns
    * (v, dist). */
  def sssp(weighted: DataFrame, source: Long, maxIter: Int = 50): DataFrame = {
    val spark = weighted.sparkSession
    import spark.implicits._
    val edges = weighted.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = Seq((source, 0.0)).toDF("v", "dist").localCheckpoint()
    var frontier = dist
    var iter = 0
    while (frontier.count() > 0 && iter < maxIter) {
      val relaxed = frontier
        .join(edges, frontier("v") === edges("src"))
        .select(col("dst").as("v"), (col("dist") + col("w")).as("cand"))
        .groupBy(col("v")).agg(min(col("cand")).as("cand"))
      // one materialization per round; frontier/dist are cheap projections
      val merged = dist.join(relaxed, Seq("v"), "full")
        .select(col("v"), col("dist"), col("cand"),
          least(coalesce(col("dist"), lit(Double.MaxValue)), col("cand")).as("newDist"))
        .localCheckpoint()
      frontier = merged
        .where(col("dist").isNull || (col("cand").isNotNull && col("cand") < col("dist")))
        .select(col("v"), col("newDist").as("dist"))
      dist = merged
        .select(col("v"), coalesce(col("newDist"), col("dist")).as("dist"))
      iter += 1
    }
    edges.unpersist()
    dist
  }

  /** pagerank — the reference parses args and extracts vertices but left the
    * iteration empty (`oink/pagerank.cpp:54-56`); implemented per its doc
    * (`oinkdoc/pagerank.txt`): damped SpMV with 1/out-degree edge weights
    * (degree_weight prep), dangling-mass redistribution, stop when
    * Σ|Δrank| < tol or Nmax. Returns (v, rank). */
  def pagerank(edges: DataFrame, alpha: Double = 0.85, tol: Double = 1e-6,
      maxIter: Int = 20): DataFrame = {
    val directed = edges.where(col("src") =!= col("dst")).distinct()
    val vertices = GraphOps.vertexExtract(directed).persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count().toDouble
    val outDeg = directed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val w = directed.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sources = outDeg.select(col("src").as("v"))
    var ranks = vertices.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var delta = Double.MaxValue
    var iter = 0
    while (delta > tol && iter < maxIter) {
      val contrib = ranks.join(w, ranks("v") === w("src"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("w")).as("contrib"))
      val danglingMass = ranks.join(sources, Seq("v"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val next = vertices
        .join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
        .select(col("v"),
          (lit((1 - alpha) / n) +
            lit(alpha) * (coalesce(col("contrib"), lit(0.0)) + lit(danglingMass / n)))
            .as("rank"))
        .localCheckpoint()
      delta = next.join(ranks.withColumnRenamed("rank", "old"), "v")
        .agg(sum(abs(col("rank") - col("old")))).head().getDouble(0)
      ranks = next
      iter += 1
    }
    w.unpersist(); vertices.unpersist()
    ranks
  }
}
