package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** rmat / rmat2 (`oink/rmat.cpp:50-70`, `oink/map_rmat_generate.cpp:1-67`,
  * `examples/rmat.cpp:121-163`): R-MAT recursive-quadrant random graph
  * generation, looping generate→dedup until exactly `nnonzero · 2^nlevels`
  * unique edges exist.
  *
  * Params mirror `oink/map_rmat_generate.h`: matrix order 2^nlevels,
  * quadrant probabilities a/b/c/d (a+b+c+d=1), per-level probability jitter
  * `fraction`, RNG seed.
  *
  * Determinism at any scale (SURVEY.md §7.4.1): the reference seeds
  * `drand48` per processor; we seed a Random per (seed, task, round) with
  * an explicit task count, so the emitted edge multiset is identical
  * regardless of cluster layout. Dedup is `dropDuplicates` — one shuffle
  * per round; rounds are few because the deficit shrinks geometrically.
  */
object RMat {

  final case class Params(
      nlevels: Int, nnonzero: Int,
      a: Double, b: Double, c: Double, d: Double,
      fraction: Double, seed: Long)

  /** One generation batch: EXACTLY `howMany` edges across `numTasks`
    * deterministic tasks (`map(rmat_generate)`, one task per proc in the
    * reference) — the remainder spread over the low task ids, so a round
    * can never emit more than the deficit it was asked for. */
  private def batch(spark: SparkSession, p: Params, howMany: Long,
      numTasks: Int, round: Int): DataFrame = {
    import spark.implicits._
    val base = howMany / numTasks
    val extra = howMany % numTasks
    val order = 1L << p.nlevels
    spark.range(0, numTasks, 1, numTasks).as[Long].flatMap { task =>
      val perTask = base + (if (task < extra) 1L else 0L)
      val rng = new java.util.Random(p.seed * 1000003L + task * 8191L + round)
      val (a0, b0, c0, d0) = (p.a, p.b, p.c, p.d)
      Iterator.fill(perTask.toInt) {
        var (i, j) = (0L, 0L)
        var delta = order >> 1
        var (a, b, c, dq) = (a0, b0, c0, d0)
        var lvl = 0
        while (lvl < p.nlevels) {
          val r = rng.nextDouble()
          if (r < a) { /* upper-left */ }
          else if (r < a + b) { j += delta }
          else if (r < a + b + c) { i += delta }
          else { i += delta; j += delta }
          if (p.fraction > 0.0) {
            // reference jitters quadrant probs each level, then renormalizes
            a *= 1.0 - p.fraction / 2 + rng.nextDouble() * p.fraction
            b *= 1.0 - p.fraction / 2 + rng.nextDouble() * p.fraction
            c *= 1.0 - p.fraction / 2 + rng.nextDouble() * p.fraction
            dq *= 1.0 - p.fraction / 2 + rng.nextDouble() * p.fraction
            val norm = 1.0 / (a + b + c + dq)
            a *= norm; b *= norm; c *= norm; dq *= norm
          }
          delta >>= 1
          lvl += 1
        }
        (i, j)
      }
    }.toDF("src", "dst")
  }

  /** Generate until exactly `nnonzero * 2^nlevels` unique edges
    * (`oink/rmat.cpp:50-70` loop: map(add=1) → collate → reduce(cull)). */
  def generate(spark: SparkSession, p: Params, numTasks: Int = 32,
      maxRounds: Int = 20): DataFrame = {
    val target = p.nnonzero.toLong * (1L << p.nlevels)
    var edges: DataFrame = null
    var have = 0L
    var round = 0
    while (have < target && round < maxRounds) {
      val need = target - have
      val fresh = batch(spark, p, need, numTasks, round)
      val next = (if (edges == null) fresh else edges.union(fresh))
        .dropDuplicates("src", "dst")
        .localCheckpoint()
      if (edges != null) graft.core.Checkpoints.release(edges)
      edges = next
      have = edges.count()
      round += 1
    }
    // no overshoot trim: each round emits exactly the deficit, and dedup
    // only shrinks, so `have` approaches the target from below — the
    // exact-count invariant is property-tested in EngineProperties.
    // Fail HERE if maxRounds ran out short of the target, not in whatever
    // downstream count-pinned consumer notices the deficit first.
    require(have == target,
      s"rmat under-delivered $have/$target edges after $round rounds")
    edges
  }

  /** Degree histogram of a generated graph — the reference's rmat example
    * prints exactly this (`examples/rmat.cpp:155-163`). */
  def degreeStats(edges: DataFrame): DataFrame =
    edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))
}
