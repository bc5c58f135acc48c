package graft.graph

import graft.Q

/** Oracle-checked graph capabilities. The edge table is derived
  * deterministically from lineitem (vertices = keys mod 1000) so DuckDB can
  * replay the exact same graph; see GraphOps.edgesFromLineitem. */
object GraphQueries {

  /** Shared CTE prefix: directed edges + canonical undirected edges. */
  private val e =
    "e AS (SELECT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst FROM lineitem)"
  private val u =
    """u AS (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
            FROM e WHERE src <> dst)"""

  val all: Seq[Q] = Seq(

    Q("q_edge_upper",
      (s, d) => GraphOps.edgeUpper(GraphOps.edgesFromLineitem(s, d)),
      Some(s"WITH $e, $u SELECT src, dst FROM u")),

    Q("q_vertex_extract",
      (s, d) => GraphOps.vertexExtract(GraphOps.edgesFromLineitem(s, d)),
      Some(s"""WITH $e
               SELECT DISTINCT v FROM (
                 SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)""")),

    Q("q_degree",
      (s, d) => GraphOps.degree(GraphOps.edgeUpper(GraphOps.edgesFromLineitem(s, d))),
      Some(s"""WITH $e, $u
               SELECT v, count(*) AS degree FROM (
                 SELECT src AS v FROM u UNION ALL SELECT dst AS v FROM u)
               GROUP BY v""")),

    Q("q_degree_stats",
      (s, d) => GraphOps.degreeStats(GraphOps.edgeUpper(GraphOps.edgesFromLineitem(s, d))),
      Some(s"""WITH $e, $u, dgr AS (
                 SELECT v, count(*) AS degree FROM (
                   SELECT src AS v FROM u UNION ALL SELECT dst AS v FROM u)
                 GROUP BY v)
               SELECT degree, count(*) AS n_vertices FROM dgr GROUP BY degree""")),

    Q("q_degree_weight",
      (s, d) => GraphOps.degreeWeight(
        GraphOps.edgesFromLineitem(s, d).filter("src <> dst").distinct()),
      Some(s"""WITH $e, e2 AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
               dgr AS (SELECT src, count(*) AS outdeg FROM e2 GROUP BY src)
               SELECT e2.src, e2.dst, round(1.0 / outdeg, 6) AS w
               FROM e2 JOIN dgr USING (src)""")),

    Q("q_neighbor",
      (s, d) => GraphOps.neighbor(GraphOps.edgeUpper(GraphOps.edgesFromLineitem(s, d))),
      Some(s"""WITH $e, $u, adj AS (
                 SELECT src AS v, dst AS nbr FROM u
                 UNION ALL SELECT dst AS v, src AS nbr FROM u)
               SELECT v, count(*) AS n_nbrs,
                      string_agg(CAST(nbr AS VARCHAR), ',' ORDER BY nbr) AS nbrs
               FROM adj GROUP BY v""")),

    // histo over component-sized keys: orders-per-week histogram shape on
    // the graph side — frequency of vertex frequencies in the raw edges
    Q("q_graph_histo",
      (s, d) => GraphOps.histo(
        GraphOps.edgesFromLineitem(s, d).selectExpr("src AS v"), "v"),
      Some(s"""WITH $e, freq AS (SELECT src AS v, count(*) AS n FROM e GROUP BY src)
               SELECT n, count(*) AS n_keys FROM freq GROUP BY n"""))
  )
}
