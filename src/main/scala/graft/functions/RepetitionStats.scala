package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document repetition counters in ONE
  * scan — `[n_words, n_distinct_words, top_word_count, n_bigrams,
  * top_bigram_count]` as `array<long>`.
  *
  * These are the repetition quality filters a training-data curation
  * pass applies (excessively repeated words / word bigrams mark
  * boilerplate and spam): downstream ratios `top_word_count/n_words`
  * and `top_bigram_count/n_bigrams` are the "fraction of the document
  * that is its most common n-gram" signals. Integer counts only — the
  * ratio arithmetic stays in plain columns so the DuckDB oracle replays
  * it relationally (unnest → GROUP BY → max) against the exact same
  * tokenization.
  *
  * Tokenization matches [[TextStats]] / `split(text, "\\s+")`: words are
  * maximal runs of non-`\s` bytes; bigrams are adjacent word pairs keyed
  * as `w1 ⧺ ' ' ⧺ w2` (unambiguous — words cannot contain whitespace),
  * the same key the bigram oracle builds with `w[i] || ' ' || w[i+1]`.
  *
  * A per-row open-addressing hash over the token byte-slices would be
  * the allocation-free endpoint; a HashMap over UTF8String slices (which
  * share the input buffer — no copying) is already far from the hot
  * path's cost ceiling at ~50-word documents and keeps the code obvious.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.RepetitionStats$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** One pass: tokenize to zero-copy UTF8String slices, count words and
    * adjacent pairs. Called from interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val wordCounts = new java.util.HashMap[UTF8String, Long]()
    val bigramCounts = new java.util.HashMap[UTF8String, Long]()
    val space = UTF8String.fromString(" ")
    var nWords = 0L
    var nBigrams = 0L
    var prev: UTF8String = null
    var runStart = -1
    var i = 0
    def endRun(endExclusive: Int): Unit = if (runStart >= 0) {
      val w = UTF8String.fromBytes(bytes, runStart, endExclusive - runStart)
      nWords += 1
      wordCounts.merge(w, 1L, (a, b) => a + b)
      if (prev != null) {
        nBigrams += 1
        bigramCounts.merge(UTF8String.concat(prev, space, w), 1L, (a, b) => a + b)
      }
      prev = w
      runStart = -1
    }
    while (i < n) {
      if (isSpace(bytes(i))) endRun(i)
      else if (runStart < 0) runStart = i
      i += 1
    }
    endRun(n)
    var topW = 0L
    val wIt = wordCounts.values().iterator()
    while (wIt.hasNext) { val c = wIt.next(); if (c > topW) topW = c }
    var topB = 0L
    val bIt = bigramCounts.values().iterator()
    while (bIt.hasNext) { val c = bIt.next(); if (c > topB) topB = c }
    new GenericArrayData(Array(nWords, wordCounts.size.toLong, topW,
      nBigrams, topB))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def repetitionStats(text: Column): Column =
    ColumnBridge.toColumn(RepetitionStats(ColumnBridge.toExpression(text)))
}
