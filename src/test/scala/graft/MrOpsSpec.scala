package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.MrOps

/** Property tests for the core algebra — the doc-stated postconditions the
  * reference never automated (SURVEY.md §5.5, FIXTURES.md §3). */
class MrOpsSpec extends AnyFunSuite {
  import TestSession._

  private lazy val li = Tables.lineitem(spark, sf0001)

  test("aggregate (repartition) preserves the pair multiset") {
    val before = li.count()
    val after = MrOps.aggregate(li, col("l_orderkey")).count()
    assert(before == after)
  }

  test("add (union) sums counts") {
    assert(MrOps.add(li, li).count() == 2 * li.count())
  }

  test("group count sums back to input count") {
    val grouped = MrOps.countByKey(li, col("l_orderkey"))
    val total = grouped.agg(sum(col("count"))).head().getLong(0)
    assert(total == li.count())
  }

  test("localCombine agrees with global groupBy for associative merge") {
    val s = spark
    import s.implicits._
    val kv = li.select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
    val local = MrOps.localCombine(kv)(_._1)((a, b) => (a._1, a._2 + b._2))
    // combine the partials globally, then compare with direct groupBy
    val combined = local.toDF("k", "v").groupBy("k").agg(sum("v").as("v"))
    val direct = li.groupBy(col("l_orderkey").as("k")).agg(sum("l_quantity").as("v"))
    assert(combined.join(direct, "k")
      .where(abs(combined("v") - direct("v")) > 1e-9).count() == 0)
  }

  test("topK returns globally correct extremes") {
    val top = MrOps.topK(li.select(col("l_orderkey"), col("l_extendedprice")),
      5, col("l_extendedprice").desc, col("l_orderkey").asc).collect()
    val maxAll = li.agg(max(col("l_extendedprice"))).head().getDouble(0)
    assert(top.head.getDouble(1) == maxAll)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("sortLocal preserves count; global sort is totally ordered") {
    val sorted = MrOps.sortGlobal(li.select(col("l_orderkey")), col("l_orderkey"))
    assert(sorted.count() == li.count())
    val keys = sorted.limit(1000).collect().map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }

  test("histo: sum(n * n_keys) equals input rows") {
    val h = MrOps.histo(li, col("l_orderkey"))
    val total = h.agg(sum(col("n") * col("n_keys"))).head().getLong(0)
    assert(total == li.count())
  }

  test("scan KV visits every pair exactly once, read-only") {
    val s = spark
    import s.implicits._
    val visited = s.sparkContext.longAccumulator("kv_visited")
    val kv = li.select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
    MrOps.scanKV(kv)(_ => visited.add(1))
    assert(visited.value == li.count())
  }

  test("scan KMV visits each group once and streams all its values") {
    val s = spark
    import s.implicits._
    val groups = s.sparkContext.longAccumulator("kmv_groups")
    val values = s.sparkContext.longAccumulator("kmv_values")
    val kv = li.select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
    MrOps.scanKMV(kv)(_._1) { (_, it) =>
      groups.add(1)
      it.foreach(_ => values.add(1))
    }
    assert(groups.value == li.select("l_orderkey").distinct().count())
    assert(values.value == li.count())
  }

  test("scrunch = gather(n) ∘ collapse: one row per partition, same key") {
    val src = li.select(col("l_orderkey"), col("l_quantity")).repartition(8)
    val out = MrOps.scrunch(src, 3, lit("all"), col("l_orderkey"),
      col("l_quantity")).collect()
    assert(out.length == 3, "doc/scrunch.txt: one KMV pair per proc")
    assert(out.forall(_.getString(0) == "all"))
    assert(out.map(_.getSeq[Any](1).size).sum == li.count())
  }

  test("groupReduce streams each group once (multivalue-block discipline)") {
    val s = spark
    import s.implicits._
    val kv = li.select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
    val reduced = MrOps.groupReduce(kv)(_._1) { (k, it) =>
      Iterator.single((k, it.map(_._2).sum))
    }.toDF("k", "v")
    val direct = li.groupBy(col("l_orderkey").as("k")).agg(sum("l_quantity").as("v"))
    assert(reduced.join(direct, "k")
      .where(abs(reduced("v") - direct("v")) > 1e-9).count() == 0)
    assert(reduced.count() == direct.count())
  }
}
