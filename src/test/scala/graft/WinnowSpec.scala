package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.WinnowFingerprint

/** Winnowing fingerprint: the native expression must match a straight
  * driver-side re-derivation, and carry winnowing's containment
  * guarantee (a shared byte run of length >= k+w-1 selects at least one
  * common gram in both documents, any alignment). */
class WinnowSpec extends AnyFunSuite {
  import TestSession._

  private val K = 8
  private val W = 4

  private def ref(s: String, k: Int = K, w: Int = W): Seq[Long] = {
    val bytes = s.getBytes("UTF-8").map(_ & 0xff)
    val grams = bytes.length - k + 1
    if (grams < w) return Seq.empty
    val hashes = (0 until grams).map { p =>
      bytes.slice(p, p + k).foldLeft(0L)((a, b) =>
        (a * WinnowFingerprint.Base + b) % WinnowFingerprint.Mod)
    }
    (0 to grams - w).map(s0 => hashes.slice(s0, s0 + w).min).distinct.sorted
  }

  private def viaSpark(texts: Seq[String]): Map[Long, Seq[Long]] = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"), WinnowFingerprint.winnow(col("text"), K, W).as("sel"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Seq.empty[Long] else r.getSeq[Long](1).toSeq))
      .toMap
  }

  test("expression matches driver-side reference (codegen, no fallback)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(11)
      val texts = Seq.fill(30)(
        rnd.alphanumeric.take(5 + rnd.nextInt(200)).mkString) ++
        Seq("short", "", "exactly11ch")
      val got = viaSpark(texts)
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == ref(t), s"doc $i: '$t'")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("shared runs select shared grams regardless of alignment") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val a = s"PREFIX-AAA $shared SUFFIX-BBB"
    val b = s"Z$shared"
    val got = viaSpark(Seq(a, b))
    val common = got(0L).toSet.intersect(got(1L).toSet)
    assert(common.nonEmpty,
      "winnowing guarantee: shared run >= k+w-1 bytes must select a common gram")
    val unrelated = viaSpark(Seq("completely different content here, nothing shared at all"))
    assert(unrelated(0L).toSet.intersect(got(0L).toSet).isEmpty)
  }
}
