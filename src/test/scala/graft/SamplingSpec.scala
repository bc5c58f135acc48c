package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSession._

  private def ids(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("hash sampling is deterministic and nested by fraction") {
    val df = ids(5000)
    val p10 = Sampling.hashSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    val p20 = Sampling.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(p10.subsetOf(p20), "10% sample must be a subset of the 20% sample")
    assert(math.abs(p20.size - 1000) < 150, s"~20% of 5000, got ${p20.size}")
    val again = Sampling.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(again == p20)
  }

  test("mixture sampling keeps per-group fractions and drops unlisted groups") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val kept = Sampling.mixtureSample(df, "id", "grp",
      Map("g0" -> 0.9, "g1" -> 0.1))
    val counts = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("g2"))
    assert(math.abs(counts("g0") - 900) < 90)
    assert(math.abs(counts("g1") - 100) < 60)
    // nested in the plain sample at the same seed
    val plain = Sampling.hashSample(df.where(col("grp") === "g1"), "id", 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    val mix = kept.where(col("grp") === "g1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mix == plain)
  }

  test("temperature mixture flattens group mass toward sqrt and nests") {
    val s = spark
    import s.implicits._
    // 4000 of g0, 250 of g1: flattening should keep g1's RATE well above
    // g0's (C/sqrt(n) is decreasing in n) while total mass ≈ frac
    val df = ((0L until 4000L).map(i => (i, "g0")) ++
      (4000L until 4250L).map(i => (i, "g1"))).toDF("id", "grp")
    val kept = Sampling.temperatureMixture(df, "id", "grp", frac = 0.3)
    val counts = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate0 = counts.getOrElse("g0", 0L).toDouble / 4000
    val rate1 = counts.getOrElse("g1", 0L).toDouble / 250
    assert(rate1 > rate0 * 2,
      s"rare group must be upweighted: g0=$rate0 g1=$rate1")
    val total = counts.values.sum.toDouble / 4250
    assert(math.abs(total - 0.3) < 0.05, s"overall mass ~frac, got $total")
    // expected ratio of rates is sqrt(n0/n1) = 4: check within sampling
    // tolerance (the gate itself is exact; the tolerance is for the
    // per-group hash-mass variance)
    assert(math.abs(rate1 / rate0 - 4.0) < 1.0, s"${rate1 / rate0}")
    // nested: lower overall frac is a subset at the same seed
    val small = Sampling.temperatureMixture(df, "id", "grp", frac = 0.15)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("splits cover every row exactly once with ~requested mass") {
    val df = ids(5000)
    val sp = Sampling.splits(df, "id",
      Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
    val counts = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000)
    assert(counts.keySet == Set("train", "eval", "test"))
    assert(math.abs(counts("train") - 4000) < 300)
    // different seed reshuffles membership but keeps mass
    val sp2 = Sampling.splits(df, "id",
      Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1), seed = 99L)
    val moved = sp.as("a").join(sp2.as("b"), "id")
      .where(col("a.split") =!= col("b.split")).count()
    assert(moved > 0)
  }

  test("stratified quota keeps exactly min(n, |stratum|) per group and nests") {
    val s = spark
    import s.implicits._
    // g0: 400 rows, g1: 50 rows, g2: 8 rows (below the quota)
    val df = ((0L until 400L).map(i => (i, "g0")) ++
      (1000L until 1050L).map(i => (i, "g1")) ++
      (2000L until 2008L).map(i => (i, "g2"))).toDF("id", "grp")
    val q20 = Sampling.stratifiedQuota(df, "id", "grp", 20)
    val counts = q20.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 20L, "g1" -> 20L, "g2" -> 8L), counts.toString)
    // nested: the quota-10 sample is a prefix of the quota-20 sample
    val q10 = Sampling.stratifiedQuota(df, "id", "grp", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(q10.subsetOf(
      q20.select("id").collect().map(_.getLong(0)).toSet))
    // selection matches the window formulation (same total order)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
      .orderBy(Sampling.bucket(col("id"), 7L).asc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 20).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(q20.select("id").collect().map(_.getLong(0)).toSet == windowed)
  }

  test("shard assignment is a deterministic permutation with dense per-shard positions") {
    val df = ids(3000)
    val a = Sampling.shardAssign(df, "id", numShards = 8)
    val rows = a.select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 3000, "shard assignment must not drop or duplicate rows")
    assert(rows.map(_._1).toSet.size == 3000)
    // every shard's positions are exactly 0..count-1 (dense, no gaps)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length.toLong),
        s"shard $shard positions must be dense 0..${rs.length - 1}")
    }
    // all shards occupied and roughly balanced at n >> shards
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.max < 2 * sizes.values.min,
      s"mixer balance at 3000/8: $sizes")
    // deterministic: a rebuild yields the identical assignment; a
    // different seed yields a different order
    val again = Sampling.shardAssign(df, "id", numShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet)
    val other = Sampling.shardAssign(df, "id", numShards = 8, seed = 99L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(other != rows.toSet)
  }

  test("token-budget mix fills per-source quotas greedily and nests") {
    val s = spark
    import s.implicits._
    // 20 docs of 10 tokens each per source: quota 55 keeps exactly 5
    // docs (50 tokens; the 6th would overflow), weights 3:1 split quotas
    val docs = (for (src <- Seq("a", "b"); i <- 0 until 20)
      yield (src.hashCode.toLong * 100 + i, src,
        Seq.fill(10)("tok").mkString(" "))).toDF("doc_id", "source", "text")
    val out = Sampling.tokenBudgetMix(docs, "doc_id", "source", "text",
      budget = 220L, weights = Map("a" -> 3.0, "b" -> 1.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // quotas: a=165 -> 16 docs (160 tokens), b=55 -> 5 docs
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 16, "b" -> 5))
    assert(out.forall(_._3 == 10L))
    assert(out.filter(_._1 == "b").map(_._4).sorted.toSeq ==
      Seq(10L, 20L, 30L, 40L, 50L))
    // a bigger budget picks a superset (same hash order, longer prefix)
    val bigger = Sampling.tokenBudgetMix(docs, "doc_id", "source", "text",
      budget = 440L, weights = Map("a" -> 3.0, "b" -> 1.0))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.map(t => (t._1, t._2)).toSet.subsetOf(bigger))
  }
}
