package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.NormalizeText

/** The native normalization must be byte-identical to
  * trim(regexp_replace(lower(text), "\s+", " ")) on every input — ASCII
  * fast path and unicode fallback alike. */
class NormalizeTextSpec extends AnyFunSuite {
  import TestSession._

  test("md5 of native normalize equals the regex column form (codegen, no fallback)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(13)
      val alphabet = "aB c\t\nD,.!_09Z  ÉéÜ€"
      val texts = Seq.fill(80)(
        (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
        Seq("", "   ", "  A  B  ", "\t\nMiXeD  CaSe\r", "ÉCOLE  Straße")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = df.select(
        md5(NormalizeText.normalize(col("text"))).as("native"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
          .cast("binary")).as("regex"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getString(0) == r.getString(1), s"doc $i: '${texts(i).take(40)}'")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
