package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all text-analysis counters in ONE byte
  * scan — `[n_ws_tokens, n_bpe_tokens, n_chars, sum_ws_token_chars,
  * n_stopword_tokens, n_punct_chars]` as `array<long>`.
  *
  * Replaces a per-row stack of interpreted higher-order functions and two
  * regex extractions in the token/quality hot path, with semantics
  * bit-matched to the column formulation the oracles replay:
  *  - ws tokens = maximal runs of non-`\s` characters
  *    (≡ `filter(split(text, "\\s+"), length > 0)`; `\s` is Java regex's
  *    ASCII class [ \t\n\x0B\f\r]);
  *  - bpe-ish tokens = `\w+|[^\w\s]` matches, i.e. maximal word-char runs
  *    plus one per other non-space character (`\w` = [A-Za-z0-9_]);
  *  - character counts are real character counts (UTF-8 continuation
  *    bytes don't count, and a multi-byte character classifies as
  *    non-word non-space, exactly like the regex);
  *  - stopword hits compare the whole ws token byte-for-byte (the
  *    `isInCollection` semantics on raw whitespace tokens).
  *
  * Downstream arithmetic (ratios, quality blend) stays in plain columns,
  * so every existing DuckDB oracle is untouched. Six accesses to the same
  * TextStats tree in one projection collapse to a single evaluation via
  * Spark's subexpression elimination inside whole-stage codegen.
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "text_stats"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stops = ctx.addReferenceObj("stopwords", stopBytes, "byte[][]")
    val helper = "graft.functions.TextStats$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c, $stops);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def isWordChar(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** One pass over the UTF-8 bytes; called from interpreted eval and from
    * generated code. */
  def compute(s: UTF8String, stops: Array[Array[Byte]]): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var nWs = 0L; var nBpe = 0L; var nChars = 0L
    var sumWLen = 0L; var nStop = 0L; var nPunct = 0L
    var runStart = -1 // byte index of the current ws token, -1 if none
    var runChars = 0L
    var inWordRun = false

    def endWsRun(endExclusive: Int): Unit = if (runStart >= 0) {
      nWs += 1
      sumWLen += runChars
      val len = endExclusive - runStart
      var k = 0
      var hit = false
      while (k < stops.length && !hit) {
        val st = stops(k)
        if (st.length == len) {
          var j = 0
          while (j < len && st(j) == bytes(runStart + j)) j += 1
          hit = j == len
        }
        k += 1
      }
      if (hit) nStop += 1
      runStart = -1
      runChars = 0L
    }

    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xc0) == 0x80) {
        // UTF-8 continuation byte: part of the previous character
        i += 1
      } else {
        nChars += 1
        if (isSpace(b)) {
          endWsRun(i)
          inWordRun = false
        } else {
          if (runStart < 0) runStart = i
          runChars += 1
          if (isWordChar(b)) {
            if (!inWordRun) { nBpe += 1; inWordRun = true }
          } else {
            nBpe += 1
            nPunct += 1
            inWordRun = false
          }
        }
        i += 1
      }
    }
    endWsRun(n)
    new GenericArrayData(Array(nWs, nBpe, nChars, sumWLen, nStop, nPunct))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def textStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.toColumn(
      TextStats(ColumnBridge.toExpression(text), stopwords))
}
