package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** tri_find (`oink/tri_find.cpp:43-82`, Cohen's algorithm): triangle
  * enumeration/counting.
  *
  * The reference's whole trick — generate candidate wedges only from the
  * LOWER-degree endpoint of each edge (`oink/tri_find.cpp` map_low_degree,
  * reduce_nsq_angles) — is kept: we orient every edge from its
  * (degree, id)-smaller endpoint to the larger, so each vertex's oriented
  * out-degree is O(sqrt(m)) on any graph and the wedge self-join can't
  * explode on skewed (power-law) degree distributions. SURVEY.md §7.4.4.
  *
  * Scale: two shuffles for the degree join, one self-join on the wedge
  * pivot, one join to close the wedge. All equi-joins → sort-merge/AQE at
  * scale; no collect.
  */
object Triangles {

  /** Oriented edges (a, b, ka, kb) with (deg,id) keys; a→b iff key(a)<key(b). */
  private def oriented(edges: DataFrame): DataFrame = {
    val u = GraphOps.edgeUpper(edges)
    val deg = GraphOps.degree(u)
    val dSrc = deg.select(col("v").as("src"), col("degree").as("dsrc"))
    val dDst = deg.select(col("v").as("dst"), col("degree").as("ddst"))
    val withDeg = u.join(dSrc, "src").join(dDst, "dst")
    val srcLower = col("dsrc") < col("ddst") ||
      (col("dsrc") === col("ddst") && col("src") < col("dst"))
    withDeg.select(
      when(srcLower, col("src")).otherwise(col("dst")).as("a"),
      when(srcLower, col("dst")).otherwise(col("src")).as("b"),
      when(srcLower, struct(col("ddst").as("deg"), col("dst").as("id")))
        .otherwise(struct(col("dsrc").as("deg"), col("src").as("id"))).as("kb"))
  }

  /** All triangles as (a, b, c) vertex ids, each exactly once. */
  def triangles(edges: DataFrame): DataFrame = {
    val o = oriented(edges)
    val o1 = o.select(col("a"), col("b").as("w1"), col("kb").as("k1"))
    val o2 = o.select(col("a"), col("b").as("w2"), col("kb").as("k2"))
    // wedges from the low-key pivot, canonical pair order by (deg,id) key
    val wedges = o1.join(o2, "a").where(col("k1") < col("k2"))
      .select(col("a"), col("w1"), col("w2"))
    // close the wedge: oriented edge w1→w2 must exist
    val closing = o.select(col("a").as("w1"), col("b").as("w2"))
    wedges.join(closing, Seq("w1", "w2"), "left_semi")
      .select(col("a"), col("w1").as("b"), col("w2").as("c"))
  }

  /** Global triangle count (`Tri_find: %lu triangles` summary line,
    * `oink/tri_find.cpp:77-79`).
    *
    * Edge-iterator formulation: per oriented edge (a,b), count
    * |N⁺(a) ∩ N⁺(b)| over compact adjacency arrays. Each triangle is
    * counted exactly once (at its lowest-key vertex's edge), and the
    * wedge set is never materialized — the shuffle carries |E| edges +
    * |V| adjacency arrays instead of Σdeg² wedge rows, which is what
    * survives a 100× scale-up. Enumeration (when the triangles
    * themselves are needed) stays on the wedge join in [[triangles]]. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val o = oriented(edges)
    val adj = o.groupBy(col("a")).agg(collect_list(col("b")).as("nbrs"))
    o.select(col("a"), col("b"))
      .join(adj.select(col("a"), col("nbrs").as("na")), "a")
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), "b")
      .select(size(array_intersect(col("na"), col("nb"))).cast("long").as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
  }

  /** Per-edge triangle support over a canonical (src < dst) edge set:
    * each triangle credits its three edges. Same low-degree-oriented
    * enumeration as [[triangles]] — the wedge join can't explode on
    * skew — and the explode emits all three edge rows from ONE pass. */
  private def edgeSupport(u: DataFrame): DataFrame =
    triangles(u)
      .select(explode(array(
        struct(least(col("a"), col("b")).as("src"),
          greatest(col("a"), col("b")).as("dst")),
        struct(least(col("b"), col("c")).as("src"),
          greatest(col("b"), col("c")).as("dst")),
        struct(least(col("a"), col("c")).as("src"),
          greatest(col("a"), col("c")).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("support"))

  /** k-truss: the maximal subgraph whose every edge sits in ≥ k−2
    * triangles OF THE SUBGRAPH — the standard cohesive-community
    * cleaning step one notch stronger than k-core (every k-truss edge
    * is in the (k−1)-core). Synchronous peeling to a fixpoint: each
    * round recomputes support on the surviving edges and drops the
    * under-supported ones; peeling is monotone, so a DuckDB replay
    * that unrolls AT LEAST as many rounds lands on the identical
    * fixpoint (the q_kcore oracle discipline). Returns the surviving
    * canonical edges with their in-truss support.
    *
    * Scale: per round, one oriented wedge self-join (O(m^1.5) work,
    * skew-safe) + one left-semi equi-join; the edge frame shrinks
    * monotonically and is checkpointed per round (lazy — the
    * convergence count materializes it). */
  def kTruss(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame =
    kTrussWithRounds(edges, k, maxIter)._1

  /** [[kTruss]] plus the CONVERGED peel-round count (including the
    * final no-change round) — the q_ktruss oracle unrolls a fixed peel
    * depth, so the registered query asserts rounds ≤ that constant for
    * a clear margin-breach message instead of an opaque hash diff
    * (r10 ADVICE). */
  def kTrussWithRounds(edges: DataFrame, k: Int,
      maxIter: Int = 30): (DataFrame, Int) = {
    require(k >= 2, "k must be >= 2")
    var u = GraphOps.edgeUpper(edges).localCheckpoint()
    var m = u.count()
    var changed = m > 0
    var iter = 0
    while (changed && iter < maxIter) {
      val keep = edgeSupport(u)
        .where(col("support") >= (k - 2).toLong)
        .select(col("src"), col("dst"))
      val u2 = u.join(keep, Seq("src", "dst"), "left_semi")
        .localCheckpoint(eager = false) // the count below materializes
      val m2 = u2.count()
      changed = m2 != m
      graft.core.Checkpoints.release(u)
      u = u2; m = m2
      iter += 1
    }
    (u.join(edgeSupport(u), Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("support"), lit(0L)).as("support")), iter)
  }

  /** neigh_tri (`oink/neigh_tri.cpp:52+`): per-vertex neighbor count +
    * triangle-participation count. */
  def neighTri(edges: DataFrame): DataFrame = {
    val u = GraphOps.edgeUpper(edges)
    val deg = GraphOps.degree(u).withColumnRenamed("degree", "n_nbrs")
    val tv = triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
    deg.join(tv, Seq("v"), "left")
      .select(col("v"), col("n_nbrs"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient per vertex: 2·tri(v) / (deg·(deg−1)),
    * 0.0 for degree-<2 vertices — the closed-wedge fraction, the
    * standard per-vertex community-density readout on top of
    * [[neighTri]]'s counts (same low-degree-oriented triangle
    * enumeration, same shuffles; the ratio is one exact IEEE division
    * of integer counts, 6dp-rounded on both engines). */
  def clusteringCoefficient(edges: DataFrame): DataFrame =
    neighTri(edges).select(col("v"), col("n_nbrs"), col("n_triangles"),
      when(col("n_nbrs") >= 2L,
        round(lit(2.0) * col("n_triangles") /
          (col("n_nbrs") * (col("n_nbrs") - 1L)), 6))
        .otherwise(lit(0.0)).as("clustering"))

  /** neigh_tri full-fidelity output (`oink/neigh_tri.cpp:124-160`): per
    * vertex Vi, the reference prints its first-neighbor edges (Vi Vj) and,
    * for each triangle (Vi,Vj,Vk), the edge between the other two vertices
    * (Vj Vk) — `map1` routes each triangle's opposite edge to each corner.
    * One row per (v, ea, eb); edges canonicalized ea <= eb, so neighbor
    * edges are the rows with v ∈ {ea,eb} and triangle edges the rest
    * (exactly the reference's "Vm = Vi or not" distinction). */
  def neighTriEdges(edges: DataFrame): DataFrame = {
    // explode, don't union: a union of per-corner projections would
    // re-evaluate the whole wedge-join subtree once per branch (seen in
    // the plan audit — 3x the triangle work); explode emits the three
    // corner rows from ONE pass over the triangles (and both endpoint
    // rows from one pass over the edges)
    def corner(v: Column, x: Column, y: Column) =
      struct(v.as("v"), least(x, y).as("ea"), greatest(x, y).as("eb"))
    val u = GraphOps.edgeUpper(edges)
    val nbr = u.select(explode(array(
        corner(col("src"), col("src"), col("dst")),
        corner(col("dst"), col("src"), col("dst")))).as("x"))
    val opposite = triangles(edges).select(explode(array(
        corner(col("a"), col("b"), col("c")),
        corner(col("b"), col("a"), col("c")),
        corner(col("c"), col("a"), col("b")))).as("x"))
    nbr.union(opposite).select(col("x.v"), col("x.ea"), col("x.eb"))
  }

  /** The reference writes one file per vertex (`oink/neigh_tri.cpp`,
    * SURVEY.md §7.4.7) — reproduced as a partitioned write; cap the
    * vertex count before calling on wide graphs. */
  def writePerVertex(perVertex: DataFrame, path: String): Unit =
    perVertex.write.mode("overwrite").partitionBy("v").parquet(path)
}
