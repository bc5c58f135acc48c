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
    // frontier propagation: only vertices whose label just improved can
    // improve a neighbor, so each round joins adj against the CHANGED set
    // instead of all labels — after the first rounds the frontier is the
    // boundary of the still-merging components, a vanishing fraction of
    // the graph (this is what keeps per-round cost sublinear at scale).
    // The frontier count doubles as the convergence signal.
    var frontier = labels
    var changedN = 1L
    var iter = 0
    while (changedN > 0 && iter < maxIter) {
      // join-shaped update (round 4; replaces union+groupBy): candidate
      // mins are aggregated over frontier-adjacent rows only, then
      // left-joined onto labels — the round's shuffle carries the
      // candidate set, not labels ∪ candidates, and both join sides
      // arrive hash-partitioned on v (groupBy output / checkpointed
      // partitioning). `changed` rides along in the checkpoint so the
      // frontier is a projection, not a recomputation (2 jobs per round).
      val cand = adj
        .join(frontier.withColumnRenamed("v", "nbr"), "nbr")
        .groupBy(col("v")).agg(min(col("label")).as("cand"))
      // LAZY checkpoint: the frontier count below is the round's only
      // job — it materializes the checkpoint as a side effect (the
      // round-4 eager form paid a second traversal per round just to
      // materialize before counting)
      val next = labels.join(cand, Seq("v"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"),
          (col("cand").isNotNull && col("cand") < col("label")).as("changed"))
        .localCheckpoint(eager = false)
      frontier = next.where(col("changed")).select(col("v"), col("label"))
      changedN = frontier.count()
      graft.core.Checkpoints.release(labels) // AFTER next materialized above
      labels = next.select(col("v"), col("label"))
      iter += 1
    }
    adj.unpersist()
    labels
  }

  /** Connected components via alternating large-star / small-star edge
    * rewrites — O(log n) rounds regardless of graph diameter, versus
    * O(diameter) for [[ccFind]]'s label propagation. The scale path for
    * high-diameter graphs (chains, meshes); same output contract as
    * ccFind: (v, label) with label = min vertex id of the component.
    *
    * Each round: large-star hangs every neighbor larger than u off the
    * minimum of u's neighborhood; small-star re-hangs the smaller
    * neighbors. At fixpoint every component is a star rooted at its
    * minimum vertex.
    */
  def ccFindStar(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val vertices = GraphOps.vertexExtract(edges).persist(StorageLevel.MEMORY_AND_DISK)
    // canonical orientation big→small, matching the per-round output so
    // the convergence set-difference compares like with like
    var e = GraphOps.edgeUpper(edges)
      .select(col("dst").as("u"), col("src").as("v"))
      .localCheckpoint()
    var eCount = -1L
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // large-star: over symmetric neighborhoods, attach big neighbors to
      // the neighborhood minimum
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      // no distinct here: sym is a distinct set and mins is 1-row-per-u,
      // so duplicates arise only when two neighborhoods share a minimum —
      // bounded volume the small-star groupBy and the final distinct
      // absorb anyway, whereas the distinct was a full extra shuffle
      // every round
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
      // small-star: orient edges large→small, re-hang small neighbors on
      // the minimum (plus the center itself)
      val down = large
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val smallMins = down.groupBy(col("u")).agg(min(col("v")).as("m"))
      val rehung = down.join(smallMins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(down.join(smallMins, "u").select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("nu"), greatest(col("u"), col("v")).as("nv"))
        .select(col("nv").as("u"), col("nu").as("v"))
        .distinct()
        .localCheckpoint(eager = false) // the count below materializes
      // convergence: both sides are distinct canonical edge sets, so
      // unequal COUNTS prove the sets differ — a scan-only job on the
      // fresh checkpoint, no join. Only when counts match (typically the
      // final round, and rarely a mid-run coincidence) is the exact
      // symmetric difference computed, as one full-outer join with
      // null-side markers. Saves the per-round diff-join shuffle for
      // every converging round.
      val rehungCount = rehung.count()
      changed =
        if (rehungCount != eCount) 1L
        else rehung.withColumn("l", lit(1))
          .join(e.withColumn("r", lit(1)), Seq("u", "v"), "full")
          .where(col("l").isNull || col("r").isNull)
          .count()
      eCount = rehungCount
      graft.core.Checkpoints.release(e) // after the diff-join consumed it
      e = rehung
      iter += 1
    }
    // at fixpoint components are stars rooted at their minimum: each
    // non-root points at the root; roots label themselves
    val labels = e.select(col("u").as("v"), col("v").as("label"))
    val out = vertices.join(labels, Seq("v"), "left")
      .select(col("v"), coalesce(col("label"), col("v")).as("label"))
      .localCheckpoint()
    vertices.unpersist()
    graft.core.Checkpoints.release(e) // final star set folded into out
    out
  }

  /** cc_stats (`oink/cc_stats.cpp:47-56`): #components per size. */
  def ccStats(labels: DataFrame): DataFrame =
    labels.groupBy(col("label")).agg(count(lit(1)).as("csize"))
      .groupBy(col("csize")).agg(count(lit(1)).as("n_components"))

  /** Per-vertex Luby priority: portable integer mixer (multiply + offset,
    * mod a large prime — the [[graft.llm.Sampling.bucket]] family), NOT an
    * engine hash builtin, so any engine — including the DuckDB oracle —
    * replays the priorities and therefore the exact MIS. Values stay
    * below 2^62 for ANY long vertex id — the id is reduced mod 1e9+7
    * before the multiply (ANSI mode throws on the unbounded product; see
    * Sampling.bucket), with identical priorities for ids below 1e9+7.
    * Ties (possible since the range is finite) are broken by vertex id
    * in the winner rule, identically on every engine. */
  def lubyPriority(v: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    pmod(pmod(v, lit(1000000007L)) * lit(2654435761L) + lit(seed * 40503L),
      lit(1000000007L))

  /** Greedy distributed maximal matching (the Israeli–Itai shape,
    * deterministic): per round every vertex nominates its minimum
    * (priority, src, dst) incident active edge; an edge nominated by
    * BOTH endpoints joins the matching and its endpoints deactivate.
    * Edge priorities come from the replayable [[lubyPriority]] mixer
    * over a src/dst fold, so rounds unroll identically on the oracle.
    * The globally minimal active edge always matches, so every round
    * strictly shrinks the active set (converges, typically in
    * O(log n) rounds); matching growth is monotone, so an oracle
    * unrolling ≥ the convergence depth lands on the identical set.
    * Returns the matched edges (src, dst).
    *
    * Scale: per round one explode + min aggregate (map-side partials)
    * and two vertex-keyed equi-joins; the active edge frame shrinks
    * monotonically and is checkpointed lazily (the convergence count
    * materializes it). */
  def maximalMatching(edges: DataFrame, seed: Long = 7L,
      maxIter: Int = 50): DataFrame =
    maximalMatchingWithRounds(edges, seed, maxIter)._1

  /** [[maximalMatching]] plus the CONVERGED round count — the q_matching
    * oracle unrolls a fixed number of nomination rounds, and convergence
    * depth grows with graph size (O(log n)), so the registered query
    * asserts rounds ≤ the unrolled constant for a clear margin-breach
    * message instead of an opaque hash diff (r10 ADVICE). */
  def maximalMatchingWithRounds(edges: DataFrame, seed: Long = 7L,
      maxIter: Int = 50): (DataFrame, Int) = {
    val eprio = lubyPriority(
      pmod(col("src"), lit(1000000007L)) * lit(100003L) + col("dst"), seed)
    var u = GraphOps.edgeUpper(edges).withColumn("prio", eprio)
      .localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var m = u.count()
    var iter = 0
    val empty = u.select(col("src"), col("dst")).limit(0).localCheckpoint()
    while (m > 0 && iter < maxIter) {
      val e = struct(col("prio"), col("src"), col("dst"))
      val best = u
        .select(explode(array(col("src"), col("dst"))).as("v"), e.as("e"))
        .groupBy(col("v")).agg(min(col("e")).as("b"))
      val matched = u
        .join(best.select(col("v").as("src"), col("b").as("bs")), "src")
        .join(best.select(col("v").as("dst"), col("b").as("bd")), "dst")
        .where(e === col("bs") && e === col("bd"))
        .select(col("src"), col("dst"))
        .localCheckpoint()
      rounds += matched
      val mv = matched
        .select(explode(array(col("src"), col("dst"))).as("v")).distinct()
      val u2 = u
        .join(mv.select(col("v").as("src")), Seq("src"), "left_anti")
        .join(mv.select(col("v").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst"), col("prio"))
        .localCheckpoint(eager = false) // the count below materializes
      m = u2.count()
      graft.core.Checkpoints.release(u)
      u = u2
      iter += 1
    }
    graft.core.Checkpoints.release(u)
    ((empty +: rounds.toSeq).reduce(_ unionByName _), iter)
  }

  /** luby_find (`oink/luby_find.cpp:60-90`): maximal independent set.
    * The reference draws per-vertex random priorities from a seeded RNG
    * (`oink/cc_find.cpp:45-46` pattern); we use the replayable
    * [[lubyPriority]] mixer — same role, deterministic on any cluster
    * layout AND on the oracle engine. Returns (v) ∈ MIS. */
  def lubyMis(edges: DataFrame, seed: Long = 12345L, maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    // the adjacency never changes — checkpoint ONCE; each round filters
    // it against the shrinking active set at use time (the nbr-side prio
    // join only keeps active neighbors, and inactive centers fall out of
    // the left join from `active`). Round 4 change: the previous version
    // re-checkpointed a shrinking adj copy every round — one more
    // materialization per round for no change in the winner rule.
    val adj = symmetric(edges).localCheckpoint()
    var active = adj.select(col("v")).distinct()
      .withColumn("prio", lubyPriority(col("v"), seed))
      .localCheckpoint()
    // winners per round are each checkpointed; the MIS union is assembled
    // once at the end instead of re-checkpointing an ever-growing
    // accumulator every round (one fewer job per round, same result)
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var activeN = active.count()
    var iter = 0
    while (activeN > 0 && iter < maxIter) {
      // winner: priority strictly below every active neighbor's
      val nbrPrio = adj
        .join(active.select(col("v").as("nbr"), col("prio").as("nprio")), "nbr")
        .groupBy(col("v")).agg(min(struct(col("nprio"), col("nbr"))).as("minNbr"))
      val winners = active.join(nbrPrio, Seq("v"), "left")
        .where(col("minNbr").isNull ||
          struct(col("prio"), col("v")) < col("minNbr"))
        .select(col("v"))
        .localCheckpoint()
      rounds += winners
      // remove winners and their neighborhoods (inactive neighbors are
      // harmless in `removed` — the anti-join ignores them)
      val removed = winners
        .union(adj.join(winners, "v").select(col("nbr").as("v")))
        .distinct()
      val nextActive = active.join(removed, Seq("v"), "left_anti")
        .localCheckpoint(eager = false) // the count below materializes
      activeN = nextActive.count()
      graft.core.Checkpoints.release(active) // winners are separately checkpointed
      active = nextActive
      iter += 1
    }
    val out = rounds.reduceOption(_ union _).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        active.select("v").schema))
    graft.core.Checkpoints.release(active, adj)
    out
  }

  /** Label propagation communities: every vertex starts as its own label
    * and each synchronous round adopts the most frequent label among its
    * neighbors (tie → smallest label). FIXED round count — LPA has no
    * convergence guarantee (synchronous updates can 2-cycle), so a fixed
    * budget is the honest spec AND what lets the oracle unroll the exact
    * rounds. Deterministic end to end. Per round: one adjacency join +
    * two partial-aggregated shuffles ((v, label) counts, then argmax per
    * v via min(struct(-cnt, label)) — never a per-vertex collect). */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    val adj = symmetric(edges)
      .repartition(col("nbr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = adj.select(col("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    var i = 0
    while (i < rounds) {
      val next = adj
        .join(labels.select(col("v").as("nbr"), col("label")), "nbr")
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("v"), col("m.l").as("label"))
        .localCheckpoint()
      graft.core.Checkpoints.release(labels)
      labels = next
      i += 1
    }
    adj.unpersist()
    labels
  }

  /** k-core: iteratively peel vertices of (undirected) degree < k until
    * fixpoint; returns each surviving vertex with its degree inside the
    * core subgraph. The natural companion of the degree/degree_stats
    * commands (`oink/degree.cpp`) for graph cleaning. Round discipline
    * matches ccFindStar: checkpoint per round, edge-count convergence
    * (peeling only shrinks, so equal counts == fixpoint — and extra
    * rounds at fixpoint are no-ops, which is what lets the oracle unroll
    * a fixed round budget). Per round: one degree aggregation + two
    * semi-join-shaped filters, all partial-aggregated and skew-free. */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    var g = symmetric(edges).localCheckpoint()
    var m = g.count()
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val keep = g.groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("v"))
      val g2 = g.join(keep, "v")
        .join(keep.withColumnRenamed("v", "nbr"), "nbr")
        .select(col("v"), col("nbr"))
        .localCheckpoint(eager = false) // the count below materializes
      val m2 = g2.count()
      changed = m2 != m
      graft.core.Checkpoints.release(g)
      g = g2; m = m2
      iter += 1
    }
    g.groupBy(col("v")).agg(count(lit(1)).as("deg"))
  }

  /** sssp (`oink/sssp.cpp:49-160`): Bellman-Ford frontier relaxation from
    * one source over weighted directed edges (src, dst, w).
    * Edges are partitioned by src once and persisted across all rounds —
    * the reference's `aggregate(NULL)` pre-partition idiom. Returns
    * (v, dist). */
  def sssp(weighted: DataFrame, source: Long, maxIter: Int = 50): DataFrame = {
    val edges = weighted.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = ssspFrom(edges, source, maxIter)
    edges.unpersist()
    out
  }

  /** One Bellman-Ford run over an ALREADY partitioned+persisted edge set
    * — the shared inner loop of [[sssp]] and [[ssspMulti]]. Every round's
    * `merged` is localCheckpointed, so the returned frame is safe to use
    * after the caller unpersists the edges. */
  private def ssspFrom(edges: DataFrame, source: Long, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Seq((source, 0.0)).toDF("v", "dist").localCheckpoint()
    var frontier = dist
    var frontierN = frontier.count()
    var iter = 0
    while (frontierN > 0 && iter < maxIter) {
      val relaxed = frontier
        .join(edges, frontier("v") === edges("src"))
        .select(col("dst").as("v"), (col("dist") + col("w")).as("cand"))
        .groupBy(col("v")).agg(min(col("cand")).as("cand"))
      // ONE job per round: the frontier count materializes the lazy
      // checkpoint; frontier/dist are cheap projections of it
      val merged = dist.join(relaxed, Seq("v"), "full")
        .select(col("v"), col("dist"), col("cand"),
          least(coalesce(col("dist"), lit(Double.MaxValue)), col("cand")).as("newDist"))
        .localCheckpoint(eager = false)
      frontier = merged
        .where(col("dist").isNull || (col("cand").isNotNull && col("cand") < col("dist")))
        .select(col("v"), col("newDist").as("dist"))
      frontierN = frontier.count()
      graft.core.Checkpoints.release(dist) // AFTER merged materialized above
      dist = merged
        .select(col("v"), coalesce(col("newDist"), col("dist")).as("dist"))
      iter += 1
    }
    dist
  }

  /** Deterministic good-source selection (`oink/sssp.cpp:363-375`): the
    * reference's get_good_sources takes the FIRST ncnt vertices with
    * non-zero degree — an MPI-arrival-order accident; the deterministic,
    * any-engine-replayable analog is the n best-connected vertices:
    * top-n by out-degree of the (directed) edge set, min-id tiebreak.
    * Lowers to TakeOrderedAndProject — no global sort at any scale. */
  def goodSources(edges: DataFrame, n: Int): Seq[Long] =
    edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("src").asc)
      .limit(n).collect().map(_.getLong(0)).toSeq

  /** Multi-source sssp (`oink/sssp.cpp:88-160`: the reference loops ncnt
    * sources SEQUENTIALLY, re-scanning its aggregated edge list per
    * source). Here all sources advance in ONE Bellman-Ford whose state is
    * keyed (source, v): every round's edge join and shuffle is shared by
    * every source, and the round count is the MAXIMUM eccentricity over
    * sources instead of their SUM — at N sources this is ~N× fewer jobs
    * and shuffles than the reference's loop for the same answer (each
    * source's recurrence is untouched, so per-source results are
    * bitwise-identical to [[sssp]] — pinned in GraphSpec). Edges are
    * partitioned by src once and persisted across all rounds. Returns
    * (source, v, dist). */
  def ssspMulti(weighted: DataFrame, sources: Seq[Long], maxIter: Int = 50): DataFrame = {
    require(sources.nonEmpty, "ssspMulti needs at least one source")
    val spark = weighted.sparkSession
    import spark.implicits._
    val edges = weighted.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = sources.map(s => (s, s, 0.0)).toDF("source", "v", "dist")
      .localCheckpoint()
    var frontier = dist
    var frontierN = frontier.count()
    var iter = 0
    while (frontierN > 0 && iter < maxIter) {
      val relaxed = frontier
        .join(edges, frontier("v") === edges("src"))
        .select(col("source"), col("dst").as("v"),
          (col("dist") + col("w")).as("cand"))
        .groupBy(col("source"), col("v")).agg(min(col("cand")).as("cand"))
      val merged = dist.join(relaxed, Seq("source", "v"), "full")
        .select(col("source"), col("v"), col("dist"), col("cand"),
          least(coalesce(col("dist"), lit(Double.MaxValue)), col("cand")).as("newDist"))
        .localCheckpoint(eager = false) // the frontier count materializes
      frontier = merged
        .where(col("dist").isNull || (col("cand").isNotNull && col("cand") < col("dist")))
        .select(col("source"), col("v"), col("newDist").as("dist"))
      frontierN = frontier.count()
      graft.core.Checkpoints.release(dist)
      dist = merged
        .select(col("source"), col("v"), coalesce(col("newDist"), col("dist")).as("dist"))
      iter += 1
    }
    edges.unpersist()
    dist
  }

  /** pagerank — the reference parses args and extracts vertices but left the
    * iteration empty (`oink/pagerank.cpp:54-56`); implemented per its doc
    * (`oinkdoc/pagerank.txt`): damped SpMV with 1/out-degree edge weights
    * (degree_weight prep), dangling-mass redistribution, stop when
    * Σ|Δrank| < tol or Nmax. With tol <= 0 the convergence check is skipped
    * entirely (exactly maxIter rounds, one fewer driver job per round) —
    * the fixed-iteration mode the oracle harness replays. Returns (v, rank). */
  def pagerank(edges: DataFrame, alpha: Double = 0.85, tol: Double = 1e-6,
      maxIter: Int = 20): DataFrame = {
    val directed = edges.where(col("src") =!= col("dst")).distinct()
    val outDeg = directed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val w = directed.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // persisted hash(v)-partitioned: the per-round rank rebuild joins
    // vertices on v, and a cached frame's partitioning survives into the
    // plan — without the repartition every round re-exchanges vertices.
    // Derived THROUGH the persisted w, not from `directed` (r19, guide
    // §1.2 step 1 — don't scan twice): w carries every directed edge
    // exactly once (inner join on src; every src has an outdeg row), so
    // the vertex set is identical, and the n-count below materializes
    // w's cache as a side effect — ONE source scan + ONE distinct
    // exchange where the two independent derivations paid two of each.
    val vertices = GraphOps.vertexExtract(w.select(col("src"), col("dst")))
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count().toDouble
    var ranks = vertices.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var delta = Double.MaxValue
    var iter = 0
    // One materialization per round is LOAD-BEARING here, not just a
    // lineage cut: contrib feeds two consumers (the dangling-mass sum
    // and the rank join), so a lazily-fused multi-round plan duplicates
    // the whole previous-round subtree under each consumer and the
    // duplication compounds per round (measured 5–6 s → 30 s+ for 5
    // rounds when round 5 tried stride-checkpointing fixed mode).
    while (delta > tol && iter < maxIter) {
      if (tol > 0) {
        // r19 (guide §1.2: fewer jobs per round): convergence mode used
        // to pay TWO driver-synchronized jobs per round — the checkpoint
        // materialization, then a separate (next ⋈ ranks) delta join.
        // The old rank now rides the round's EXISTING v-join (ranks
        // replaces the vertices frame in the rebuild — same v set, same
        // hash(v) checkpoint partitioning, so the round keeps its single
        // contrib exchange and identical rank arithmetic) and Σ|Δrank|
        // is collected DURING the checkpoint job by a CollectMetrics
        // node (observe) — read back from the executed plan's
        // accumulator, no second job, no extra scan. Delta only steers
        // the stop decision; the ranks a round emits are bit-identical.
        val obsDf = pagerankStepWithOld(ranks, w, n, alpha)
          .observe("pr_delta", sum(abs(col("rank") - col("old"))).as("d"))
          .select(col("v"), col("rank"))
        val next = obsDf.localCheckpoint()
        delta = obsDf.queryExecution.observedMetrics.get("pr_delta")
          .map(r => if (r.isNullAt(0)) 0.0 else r.getDouble(0))
          .getOrElse(Double.MaxValue)
        graft.core.Checkpoints.release(ranks)
        ranks = next
      } else {
        val next = pagerankStep(ranks, w, vertices, n, alpha).localCheckpoint()
        graft.core.Checkpoints.release(ranks)
        ranks = next
      }
      iter += 1
    }
    w.unpersist(); vertices.unpersist()
    ranks
  }

  /** One pagerank round. ONE ranks scan + ONE shuffle yields both the
    * per-vertex contributions and the dangling mass (round 4; replaces a
    * second ranks scan + anti-join against the out-edge source set):
    * pagerank conserves total mass — Σranks = 1 every round (teleport
    * (1-α)/n·n + α·(Σcontrib + dangling) = 1) — so the dangling mass IS
    * 1 − Σcontrib, a 1-row global sum over the same per-dst aggregate the
    * contribution join consumes. Both consumers sit above the byte-identical
    * contrib Exchange, which exchange reuse computes once (pinned in
    * PlanShapeSpec); the dangling mass stays a 1-row side input
    * cross-joined into the plan — no per-round driver collect/sync.
    * FP note: the subtraction matches a direct sum over the dangling set
    * to ~1e-15 (exact on dyadic golden graphs), far inside the oracle's
    * 1e-9 rounding. */
  /** Personalized PageRank: teleport (and dangling) mass returns to the
    * SOURCE set only — rank(v) = 1[v∈S]·((1−α)/|S| + α·dangling/|S|)
    * + α·contrib(v) — the "importance relative to these seeds" readout
    * (recommendation, local community scoring). Fixed `iters` rounds so
    * the DuckDB oracle unrolls the identical chain; same one-shuffle
    * round economics as [[pagerank]] (ONE contrib aggregate feeds both
    * the rank join and the 1-row dangling sum via exchange reuse; the
    * dangling mass is 1 − Σcontrib, valid because PPR conserves total
    * mass when every source exists in the graph — asserted here, one
    * bounded count at build time). */
  def personalizedPagerank(edges: DataFrame, sources: Seq[Long],
      alpha: Double = 0.85, iters: Int = 5, tol: Double = 0.0,
      maxIter: Int = 50): DataFrame = {
    require(sources.nonEmpty && sources.distinct.size == sources.size,
      "sources must be non-empty and distinct")
    val directed = edges.where(col("src") =!= col("dst")).distinct()
    val outDeg = directed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val w = directed.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // vertices through the persisted w — identical vertex set, one
    // source scan + one distinct exchange instead of two (the pagerank
    // restructure's r19 note above)
    val vertices = GraphOps.vertexExtract(w.select(col("src"), col("dst")))
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val present = vertices.where(col("v").isInCollection(sources)).count()
    require(present == sources.size,
      s"every source must be a graph vertex ($present of ${sources.size} found)")
    val sN = sources.size.toDouble
    val inS = col("v").isInCollection(sources)
    var ranks = vertices
      .withColumn("rank", when(inS, lit(1.0 / sN)).otherwise(lit(0.0)))
      .localCheckpoint()
    // tol <= 0 (default): exactly `iters` fixed rounds — the mode the
    // oracle unrolls, no per-round convergence job. tol > 0: production
    // convergence — iterate until Σ|Δrank| < tol or maxIter (the
    // pagerank discipline; one extra 1-row delta aggregate per round).
    var delta = Double.MaxValue
    var iter = 0
    val rankExpr =
      (when(inS, lit((1 - alpha) / sN) +
          lit(alpha) * col("danglingMass") / sN)
        .otherwise(lit(0.0)) +
       lit(alpha) * coalesce(col("contrib"), lit(0.0))).as("rank")
    while (if (tol > 0) delta > tol && iter < maxIter else iter < iters) {
      val contrib = ranks.join(w, ranks("v") === w("src"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("w")).as("contrib"))
      val dangling = contrib
        .agg((lit(1.0) - coalesce(sum(col("contrib")), lit(0.0)))
          .as("danglingMass"))
      if (tol > 0) {
        // convergence mode: one job per round, not two — the pagerank
        // discipline (see the pagerank loop's r19 note): the old rank
        // rides the rebuild's existing v-join (ranks for vertices —
        // same v set, same hash(v) partitioning, identical rankExpr)
        // and Σ|Δrank| is observed during the checkpoint job.
        val obsDf = ranks.withColumnRenamed("rank", "old")
          .join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
          .crossJoin(dangling)
          .select(col("v"), rankExpr, col("old"))
          .observe("ppr_delta", sum(abs(col("rank") - col("old"))).as("d"))
          .select(col("v"), col("rank"))
        val next = obsDf.localCheckpoint()
        delta = obsDf.queryExecution.observedMetrics.get("ppr_delta")
          .map(r => if (r.isNullAt(0)) 0.0 else r.getDouble(0))
          .getOrElse(Double.MaxValue)
        graft.core.Checkpoints.release(ranks)
        ranks = next
      } else {
        val next = vertices
          .join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
          .crossJoin(dangling)
          .select(col("v"), rankExpr)
          .localCheckpoint()
        graft.core.Checkpoints.release(ranks)
        ranks = next
      }
      iter += 1
    }
    w.unpersist(); vertices.unpersist()
    ranks
  }

  private[graft] def pagerankStep(ranks: DataFrame, w: DataFrame,
      vertices: DataFrame, n: Double, alpha: Double): DataFrame = {
    val contrib = ranks.join(w, ranks("v") === w("src"))
      .groupBy(col("dst")).agg(sum(col("rank") * col("w")).as("contrib"))
    // coalesce: an edgeless graph has an empty contrib table, whose global
    // sum is null — the whole mass is dangling then
    val dangling = contrib
      .agg((lit(1.0) - coalesce(sum(col("contrib")), lit(0.0)))
        .as("danglingMass"))
    vertices
      .join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
      .crossJoin(dangling)
      .select(col("v"),
        (lit((1 - alpha) / n) +
          lit(alpha) * (coalesce(col("contrib"), lit(0.0)) +
            col("danglingMass") / n))
          .as("rank"))
  }

  /** [[pagerankStep]] with the PREVIOUS rank carried through as `old` —
    * the convergence-mode variant: the rank rebuild joins the ranks
    * checkpoint itself (same v set and hash(v) partitioning as the
    * persisted vertices frame, so the round still has exactly one
    * contrib exchange) and emits (v, rank, old) so Σ|Δrank| can be
    * observed inside the materialization job instead of a second
    * per-round join job. The rank expression is [[pagerankStep]]'s
    * verbatim — emitted ranks are bit-identical. */
  private def pagerankStepWithOld(ranks: DataFrame, w: DataFrame,
      n: Double, alpha: Double): DataFrame = {
    val contrib = ranks.join(w, ranks("v") === w("src"))
      .groupBy(col("dst")).agg(sum(col("rank") * col("w")).as("contrib"))
    val dangling = contrib
      .agg((lit(1.0) - coalesce(sum(col("contrib")), lit(0.0)))
        .as("danglingMass"))
    ranks.withColumnRenamed("rank", "old")
      .join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
      .crossJoin(dangling)
      .select(col("v"),
        (lit((1 - alpha) / n) +
          lit(alpha) * (coalesce(col("contrib"), lit(0.0)) +
            col("danglingMass") / n))
          .as("rank"),
        col("old"))
  }
}
