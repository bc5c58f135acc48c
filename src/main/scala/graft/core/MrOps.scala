package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** The reference's MapReduce operator algebra (SURVEY.md §2.1) re-expressed
  * as Dataset/DataFrame combinators.
  *
  * The reference (`/root/reference/src/mapreduce.h:59-121`) mutates a single
  * KV/KMV set in place, one collective op at a time; here every op is a pure
  * DataFrame→DataFrame function and Catalyst fuses/optimizes the chain (the
  * reference has no optimizer — SURVEY.md §4.1). Shuffle, spill, and
  * out-of-core paging (`src/spool.cpp`, `src/irregular.cpp`) are Spark's own.
  *
  * Scale notes (100 TB discipline):
  *  - group ops stay in partial→final hash aggregation (never collect);
  *  - `groupReduce` hands the group to the callback as an Iterator — the
  *    analog of the reference's multivalue-block streaming
  *    (`src/mapreduce.cpp:1874-1932`) — so a giant group never materializes;
  *  - `topK` lowers to TakeOrderedAndProject (local top-K + merge), the same
  *    idiom `oink/wordfreq.cpp:65-82` hand-codes;
  *  - `broadcastCopy` is the `broadcast()` op (`src/mapreduce.cpp:569-630`)
  *    and doubles as the small-side join hint.
  */
object MrOps {

  /** map v5 (`src/mapreduce.cpp:1560-1647`): re-map existing pairs. */
  def mapKV[T, U: Encoder](ds: Dataset[T])(f: T => IterableOnce[U]): Dataset[U] =
    ds.flatMap(f)

  /** map with addflag=1 (`src/mapreduce.cpp:1560-1647`): emit and append. */
  def mapAppend[T: Encoder](ds: Dataset[T])(f: T => IterableOnce[T]): Dataset[T] =
    ds.union(ds.flatMap(f))

  /** reduce (`src/mapreduce.cpp:1769-1873`): one callback per grouped key,
    * values streamed as an Iterator (multivalue-block discipline). */
  def groupReduce[T, K: Encoder, U: Encoder](ds: Dataset[T])(key: T => K)(
      f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(key).flatMapGroups(f)

  /** aggregate (`src/mapreduce.cpp:385-563`): redistribute by key hash.
    * Rarely needed explicitly — groupBy/join shuffle on their own — but the
    * reference's pre-partition-and-reuse idiom (`oink/sssp.cpp:75-76`) maps
    * to `aggregate(df, cols).persist()` before an iterative loop. */
  def aggregate(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(cols: _*)

  /** collate (`src/mapreduce.cpp:710-748`) + reduce(count): the workhorse. */
  def countByKey(df: DataFrame, cols: Column*): DataFrame =
    df.groupBy(cols: _*).agg(count(lit(1)).as("count"))

  /** compress (`src/mapreduce.cpp:749-860`): map-side combine. Spark's
    * HashAggregateExec already does partial→final automatically; this
    * explicit form exists for parity and for non-algebraic local combines. */
  def localCombine[T: Encoder](ds: Dataset[T])(key: T => Any)(merge: (T, T) => T): Dataset[T] =
    ds.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[Any, T]
      it.foreach { t => m.updateWith(key(t)) { case Some(a) => Some(merge(a, t)); case None => Some(t) } }
      m.valuesIterator
    }

  /** collapse (`src/mapreduce.cpp:681-709`): all pairs under one key as a
    * single ordered list. Global flavor (the per-proc flavor is
    * `mapPartitions` — rarely meaningful under Spark's partitioning). */
  def collapse(df: DataFrame, sortKey: Column, value: Column): DataFrame =
    df.agg(array_sort(collect_list(struct(sortKey.as("k"), value.as("v")))).as("pairs"))

  /** add (`src/mapreduce.cpp:348-374`): append another KV set. */
  def add(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)

  /** scan over a KV (`src/mapreduce.cpp:1933-1983`): visit every pair in
    * place, read-only — no shuffle, no new KV. The reference's scan
    * callback must not emit; the Unit return encodes that. */
  def scanKV[T](ds: Dataset[T])(f: T => Unit): Unit = ds.foreach(f(_))

  /** scan over a KMV (`src/mapreduce.cpp:1984-2074`): visit each grouped
    * key once with its values streamed as an Iterator (the multivalue-
    * block discipline of [[groupReduce]]), read-only. */
  def scanKMV[T, K: Encoder](ds: Dataset[T])(key: T => K)(
      f: (K, Iterator[T]) => Unit): Unit =
    ds.groupByKey(key)
      .mapGroups { (k, it) => f(k, it); true }(
        org.apache.spark.sql.Encoders.scalaBoolean)
      .foreach(_ => ())

  /** scrunch (`src/mapreduce.cpp:2075-2101` = gather(n) ∘ collapse):
    * concentrate onto n partitions, then collapse EACH partition's pairs
    * into one (key, pairs) row — one output row per partition, every row
    * carrying the caller's constant key (`doc/scrunch.txt`: "one for each
    * of the nprocs", same key on every processor). collect_list partial-
    * aggregates map-side, so the post-gather shuffle carries n already-
    * collapsed rows, not the pair data.
    *
    * Two deliberate deviations from the reference contract:
    * 1. the multivalue is `array_sort`ed by (sortKey, value), whereas the
    *    reference's collapse preserves arrival order — collect_list order
    *    is nondeterministic under parallel execution, so the sort is the
    *    price of a replayable result (callers wanting arrival order have
    *    no deterministic analog on any parallel engine);
    * 2. a post-gather partition holding zero rows emits NO output row,
    *    whereas the reference emits one (possibly empty) KMV pair per
    *    proc — so the output can have fewer than n rows when the input
    *    has fewer than n rows (an aggregation can't manufacture rows for
    *    empty groups; the one-row-per-proc shape exists for MPI rank
    *    bookkeeping Spark doesn't have). */
  def scrunch(df: DataFrame, n: Int, key: Column, sortKey: Column,
      value: Column): DataFrame =
    gather(df, n)
      .groupBy(spark_partition_id().as("partition"))
      .agg(array_sort(collect_list(struct(sortKey.as("k"), value.as("v"))))
        .as("pairs"))
      .select(key.as("key"), col("pairs"))

  /** gather (`src/mapreduce.cpp:893-1043`): concentrate onto n partitions
    * without a shuffle (coalesce folds existing partitions in place). */
  def gather(df: DataFrame, n: Int): DataFrame = df.coalesce(n)

  /** broadcast (`src/mapreduce.cpp:569-630`): replicate a (small) set to all
    * workers — as a join hint, the way Spark consumes replicated data. */
  def broadcastCopy(df: DataFrame): DataFrame = broadcast(df)

  /** sort_keys/sort_values per-processor flavor
    * (`src/mapreduce.cpp:2102-2209`; doc warns order is local only). */
  def sortLocal(df: DataFrame, cols: Column*): DataFrame =
    df.sortWithinPartitions(cols: _*)

  /** Global total order — what callers of sort_keys usually wanted. */
  def sortGlobal(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)

  /** sort_multivalues (`src/mapreduce.cpp:2210-2358`): order values within
    * each group — as a sorted array aggregation. The reference's flag sign
    * (+n ascending, -n descending, `doc/sort_keys.txt`) maps to `ascending`;
    * its per-type flags collapse into the value column's own type. */
  def sortedValuesPerKey(df: DataFrame, key: Column, value: Column,
      ascending: Boolean = true): DataFrame = {
    val sorted = array_sort(collect_list(value))
    df.groupBy(key)
      .agg((if (ascending) sorted else reverse(sorted)).as("values"))
  }

  /** sort_multivalues flag-7 flavor (`src/mapreduce.cpp:2239-2246`): caller-
    * supplied comparator, as an array_sort lambda returning -1/0/1. */
  def sortedValuesPerKeyWith(df: DataFrame, key: Column, value: Column)(
      cmp: (Column, Column) => Column): DataFrame =
    df.groupBy(key).agg(array_sort(collect_list(value), cmp).as("values"))

  /** Top-K idiom (`oink/wordfreq.cpp:65-82`): local truncate + merge.
    * Catalyst's TakeOrderedAndProject does exactly this. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** histo (`oink/histo.cpp:45-65`): key frequency, then frequency of
    * frequencies, descending. */
  def histo(df: DataFrame, cols: Column*): DataFrame =
    df.groupBy(cols: _*).agg(count(lit(1)).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n").desc)

  /** kv_stats (`src/mapreduce.cpp:2937-3006`): global count + byte sizes. */
  def kvStats(df: DataFrame, sizeCols: Seq[Column]): DataFrame = {
    val sizeSum = sizeCols.map(c => sum(length(c.cast("string"))))
      .reduce(_ + _).as("approx_bytes")
    df.agg(count(lit(1)).as("n_pairs"), sizeSum)
  }

  /** kv_stats level 2 (`src/mapreduce.cpp:2958-2999`): the reference's
    * verbosity-2 mode prints PER-PROCESSOR KV counts and a histogram of
    * them; the Spark analog is per-partition counts/bytes — the skew
    * diagnostic that tells you whether a shuffle left one task holding
    * the giant key. Partition ids are engine/layout-specific, so this is
    * spec-checked (totals must equal [[kvStats]]) rather than
    * oracle-replayed. One map-side aggregation, no extra shuffle. */
  def kvStatsByPartition(df: DataFrame, sizeCols: Seq[Column]): DataFrame = {
    val sizeSum = sizeCols.map(c => sum(length(c.cast("string"))))
      .reduce(_ + _).as("approx_bytes")
    df.groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("n_pairs"), sizeSum)
  }

  /** Histogram of partition sizes from [[kvStatsByPartition]] — the
    * reference's "histogram of KVs per processor" line: how many
    * partitions hold how many pairs. */
  def kvStatsHisto(perPartition: DataFrame): DataFrame =
    perPartition.groupBy(col("n_pairs"))
      .agg(count(lit(1)).as("n_partitions"))
}
