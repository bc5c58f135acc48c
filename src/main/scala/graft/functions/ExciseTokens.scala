package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: drop the tokens covered by a set of
  * position spans — `excise_tokens(split(text, "\\s+"), spans)` →
  * `array<string>` of the surviving non-empty tokens, in order. `spans`
  * is an `array<struct<s, e>>` of 1-based inclusive positions into the
  * NON-EMPTY token sequence (the [[graft.llm.Dedup.repeatedSpans]]
  * position space; empty tokens from raw `split` are skipped here the
  * same way [[TokenGramHashes]] skips them). Null/empty spans → all
  * tokens kept.
  *
  * Replaces the higher-order `filter(w, (t, i) -> !exists(spans, ...))`
  * formulation in the substring-dedup excision projection: HOFs are
  * CodegenFallback, and the exists-scan is O(tokens × spans) per row —
  * this is a codegen'd merge-walk, O(tokens + spans) after an O(spans
  * log spans) defensive sort (the spans from `mergedSpans` arrive
  * non-overlapping and sorted; unordered caller input still excises
  * correctly). The excision projection touches EVERY document in the
  * corpus, which is what makes its per-row constant factor a 100 TB
  * concern.
  */
case class ExciseTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "excise_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(st: StructType, _))
          if st.length == 2 &&
            st.fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<struct<long, long>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(words: Any, spans: Any): Any =
    ExciseTokens.compute(words.asInstanceOf[ArrayData],
      spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.ExciseTokens$.MODULE$"
    nullSafeCodeGen(ctx, ev, (w, s) =>
      s"${ev.value} = $helper.compute($w, $s);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExciseTokens =
    copy(left = newLeft, right = newRight)
}

object ExciseTokens {

  /** Merge-walk: non-empty tokens in position order against spans sorted
    * by start; token position p (1-based) survives iff no span covers it. */
  def compute(words: ArrayData, spans: ArrayData): ArrayData = {
    val raw = words.numElements()
    val w = new Array[UTF8String](raw)
    var n = 0
    var r = 0
    while (r < raw) {
      val t = words.getUTF8String(r)
      if (t != null && t.numBytes() > 0) { w(n) = t; n += 1 }
      r += 1
    }
    val m = spans.numElements()
    val starts = new Array[Long](m)
    val ends = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = spans.getStruct(i, 2)
      starts(i) = row.getLong(0)
      ends(i) = row.getLong(1)
      i += 1
    }
    // defensive sort by start (insertion — span lists are tiny and
    // usually already sorted)
    i = 1
    while (i < m) {
      val s = starts(i); val e = ends(i)
      var j = i - 1
      while (j >= 0 && starts(j) > s) {
        starts(j + 1) = starts(j); ends(j + 1) = ends(j); j -= 1
      }
      starts(j + 1) = s; ends(j + 1) = e
      i += 1
    }
    val kept = new Array[Any](n)
    var k = 0
    var si = 0
    var maxEnd = Long.MinValue // overlapping spans: track the running frontier
    var p = 0
    while (p < n) {
      val pos = p + 1L
      while (si < m && starts(si) <= pos) { // spans whose window reached pos
        if (ends(si) > maxEnd) maxEnd = ends(si)
        si += 1
      }
      if (pos > maxEnd) { kept(k) = w(p); k += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      kept.asInstanceOf[Array[AnyRef]], k))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column entry point: `excise(tokens, spans)`. */
  def excise(tokens: Column, spans: Column): Column =
    ColumnBridge.toColumn(ExciseTokens(
      ColumnBridge.toExpression(tokens), ColumnBridge.toExpression(spans)))
}
