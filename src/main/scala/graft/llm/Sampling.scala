package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training corpora.
  *
  * `sample(fraction)` / RNG-based sampling is partition-layout-dependent
  * and unrepeatable across runs; hash-gating on a stable id is the
  * standard corpus discipline: the same document lands in the same split
  * on any cluster, any day, and downsampling composes with itself
  * (a 10% sample is a subset of the 20% sample at the same seed).
  *
  * The mixer is the same portable integer arithmetic family as
  * [[Similarity.planeSign]] — multiply, offset, mod a prime — so any
  * engine (including the DuckDB oracle) replays membership exactly;
  * values stay far below 2^63. The modulus bias (9973 buckets) is a
  * documented rounding of the requested fraction, not a correctness
  * concern.
  */
object Sampling {

  val Buckets = 9973L // prime

  /** Stable bucket in [0, 9973) from an integer id and seed. The key is
    * reduced mod 1e9+7 BEFORE the 2654435761 multiply: under Spark's
    * default ANSI mode an unbounded key overflows the multiply with an
    * ARITHMETIC_OVERFLOW error (caught by an EngineProperties generator
    * at |key| ≳ 3.5e9), and pre-ANSI it silently wrapped; the bounded
    * form keeps every product < 2^62 for ANY long key, negative
    * included, and yields IDENTICAL buckets for keys below 1e9+7 (all
    * harness ids). NOTE for oracle replay: DuckDB's % is
    * sign-of-dividend, so plain `%` in oracle SQL matches only while
    * keys are non-negative (true for the testdata ids; a negative-key
    * corpus needs the pmod spelled out). */
  def bucket(key: Column, seed: Long): Column =
    pmod(pmod(key.cast("long"), lit(1000000007L)) * lit(2654435761L)
      + lit(seed * 40503L), lit(Buckets))

  /** Keep ~fraction of rows, deterministically by id. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 7L): DataFrame =
    df.where(bucket(col(keyCol), seed) < lit((fraction * Buckets).toLong))

  /** Mixture sampling: per-group keep fractions (e.g. upsample curated
    * sources, downsample web scrape) — the standard corpus-mixing step.
    * Rows whose group has no entry are dropped; same nested-subset and
    * determinism guarantees as [[hashSample]]. */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
      fractions: Map[String, Double], seed: Long = 7L): DataFrame = {
    val b = bucket(col(keyCol), seed)
    val cut = fractions.foldLeft(lit(-1L)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.where(b < cut)
  }

  /** Temperature-flattened mixture (α = 1/2): each group's keep fraction
    * is f_g = C/√n_g with C = frac·N/Σ_g√n_g, so the sampled mix carries
    * group mass ∝ √(source mass) — the standard flattening of a skewed
    * source distribution toward rarer groups (expected kept mass ≈
    * frac·N overall, rare sources upweighted, dominant ones thinned).
    * α is FIXED at 1/2 because every step is then a correctly-rounded
    * IEEE op (√, ×, ÷) that any engine reproduces bit-for-bit — a free
    * α would route through pow(), whose last-bit behavior is libm-
    * specific. Residual cross-engine risk is only the Σ√n_g summation
    * order (groups are few; a flip needs the cut within ~1e-12 of an
    * integer — the kmeans-oracle convention). Group counts are one
    * aggregation; the per-group cut broadcasts; membership is the same
    * replayable [[bucket]] gate, so nested-subset determinism holds. */
  def temperatureMixture(df: DataFrame, keyCol: String, groupCol: String,
      frac: Double, seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // N and Σ√n ride a global window over the GROUP table (a handful of
    // rows — one window task), not over the data; joining the counts
    // frame with its own aggregate would be a self-referencing lineage
    val all = Window.partitionBy(lit(1))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val cuts = counts.select(col(groupCol),
      floor(least(lit(1.0),
        lit(frac) * sum(col("_n")).over(all).cast("double") /
          (sum(sqrt(col("_n"))).over(all) * sqrt(col("_n"))))
        * Buckets).cast("long").as("_cut"))
    df.join(broadcast(cuts), groupCol :: Nil)
      .where(bucket(col(keyCol), seed) < col("_cut"))
      .drop("_cut")
  }

  /** Stratified QUOTA sampling: exactly min(n, |stratum|) rows per
    * group, chosen deterministically as the n smallest mixer buckets
    * (ties by key) within each stratum — the "N examples per
    * source/lang" curation step, where a per-group FRACTION
    * ([[mixtureSample]]) can neither cap a dominant stratum at a hard
    * count nor guarantee a floor for a rare one. Selection runs on
    * (group, bucket, key) triples through the bounded
    * [[graft.functions.TopKIdsArrayAggregator]] — map-side partial
    * top-n with O(n) state per group, never a per-stratum window sort
    * carrying every row — and the kept ids (≤ n·|groups| rows BY
    * CONSTRUCTION) broadcast back onto the corpus as a semi-join, so
    * the data itself is never shuffled. Same nested-subset determinism
    * as [[hashSample]]: the quota-m sample is a prefix of the quota-n
    * sample for m < n (identical total order per stratum). */
  def stratifiedQuota(df: DataFrame, keyCol: String, groupCol: String,
      n: Int, seed: Long = 7L): DataFrame = {
    val selected = df.select(col(groupCol).as("_g"),
        // negated bucket: the aggregator keeps score DESC, we want the
        // SMALLEST buckets; [0, 9973) is exact in double
        (-bucket(col(keyCol), seed)).cast("double").as("_s"),
        col(keyCol).cast("long").as("_id"))
      .groupBy(col("_g"))
      .agg(graft.functions.TopKIdsArrayAggregator.topkIdsArray(n)(
        col("_s"), col("_id")).as("_ids"))
      .select(col("_g"), explode(col("_ids")).as("_id"))
    df.join(broadcast(selected),
      col(groupCol) === col("_g") && col(keyCol).cast("long") === col("_id"),
      "left_semi")
  }

  /** Deterministic global shuffle + shard assignment — the SERVING end
    * of the pipeline: training wants examples in a fixed pseudo-random
    * order, split into `numShards` files a loader can consume in
    * parallel, and byte-identical on every rebuild. Each row gets
    * `shard` = mixer(key) mod numShards and `pos` = its rank within the
    * shard ordered by (mixer(key), key) — a total order any engine
    * replays, with no RNG and no partition-layout dependence.
    *
    * 100 TB shape: ONE hash exchange on `shard` + an in-partition sort
    * (the window partitions by shard, so there is no global range sort
    * and no single-task window — the scale killer here would be
    * `Window.orderBy` without a partition). Shards sort independently;
    * at 10k shards a 100 TB corpus sorts ~10 GB per shard. The full
    * mixer range (mod 1e9+7, not the 9973 sampling buckets) keeps the
    * within-shard order fine-grained; key is the tiebreak so equal
    * hashes (expected at corpus scale by birthday math) stay total. */
  def shardAssign(df: DataFrame, keyCol: String, numShards: Int,
      seed: Long = 7L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, "numShards must be positive")
    val h = pmod(pmod(col(keyCol).cast("long"), lit(1000000007L))
      * lit(2654435761L) + lit(seed * 40503L), lit(1000000007L))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_h").asc, col(keyCol).asc)
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("_h")
  }

  /** Assign each row a named split by cumulative fraction, e.g.
    * Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1). */
  def splits(df: DataFrame, keyCol: String, parts: Seq[(String, Double)],
      seed: Long = 7L): DataFrame = {
    require(math.abs(parts.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val b = bucket(col(keyCol), seed)
    val cuts = parts.scanLeft(0.0)(_ + _._2).tail.map(f => (f * Buckets).toLong)
    val named = parts.map(_._1).zip(cuts)
    // chained when: first matching cumulative cut wins
    val expr = named.tail.foldLeft(when(b < cuts.head, named.head._1)) {
      case (acc, (name, cut)) => acc.when(b < cut, name)
    }
    df.withColumn("split", expr)
  }

  /** Token-budget mixture: fill a GLOBAL token budget across sources in
    * proportion to `weights` (the "sample a 1T-token training mix at
    * 40/20/… domain weights" step). Each source gets quota
    * ⌊budget · w / Σw⌋ tokens and fills it greedily over its documents
    * in hash-shuffled order ([[bucket]], so the pick is deterministic,
    * replayable, and composes: a bigger budget's pick is a superset).
    * A document is kept while the source's running token total stays
    * within quota; token counts come from the one-scan native
    * [[graft.functions.TextStats]].
    *
    * Scale: one hash shuffle on the source key + a per-source
    * (bucket, id)-ordered running sum — parallel across sources. A
    * corpus whose single source outweighs executor memory would
    * range-partition on (source, bucket) instead; the window spec is
    * the semantic contract either way. Unlisted sources are dropped at
    * the scan (pushdown-friendly IN filter). */
  def tokenBudgetMix(docs: DataFrame, idCol: String, groupCol: String,
      textCol: String, budget: Long, weights: Map[String, Double],
      seed: Long = 7L): DataFrame = {
    require(budget > 0 && weights.nonEmpty && weights.values.forall(_ > 0),
      "budget and weights must be positive")
    import org.apache.spark.sql.expressions.Window
    val totalW = weights.values.sum
    val quota = weights.tail.foldLeft(
      when(col("source") === weights.head._1,
        lit((budget * weights.head._2 / totalW).toLong))) {
      case (acc, (g, w)) => acc.when(col("source") === g,
        lit((budget * w / totalW).toLong))
    }
    val win = Window.partitionBy(col("source"))
      .orderBy(bucket(col("doc_id"), seed).asc, col("doc_id").asc)
    docs
      .where(col(groupCol).isInCollection(weights.keys))
      .select(col(groupCol).as("source"), col(idCol).as("doc_id"),
        element_at(graft.functions.TextStats.textStats(col(textCol),
          TextAnalysis.stopwords), 1).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .where(col("cum_tokens") <= quota)
  }
}
