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
