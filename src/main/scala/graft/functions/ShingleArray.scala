package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DISTINCT word k-shingles of a token array
  * in one pass — `shingle_array(split(text, "\\s+"), k)` →
  * `array<string>` in first-occurrence order, empty when fewer than k
  * non-empty tokens (zero-length tokens are skipped inside, like
  * [[MinHashSig]]).
  *
  * Replaces the shifted-`slice` + `zip_with`-chain column formulation:
  * `zip_with` is a CodegenFallback higher-order function, so every
  * projection containing it fell out of whole-stage codegen AND paid k−1
  * intermediate array materializations per row (the PlanShapeSpec
  * lesson). This is the shingle producer behind the exact-Jaccard
  * verification joins (minhash candidates, the quadratic truth baseline,
  * decontamination) — per-row work in the hottest dedup scans.
  */
case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.ShingleArray$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.compute($c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {

  /** Distinct k-shingles (space-joined) of the non-empty tokens, first
    * occurrence first — byte-identical to
    * `array_distinct(<zip_with concat chain>)` over the filtered words. */
  def compute(words: ArrayData, k: Int): ArrayData = {
    val raw = words.numElements()
    val w = new Array[UTF8String](raw)
    var n = 0
    var r = 0
    while (r < raw) {
      val t = words.getUTF8String(r)
      if (t != null && t.numBytes() > 0) { w(n) = t; n += 1 }
      r += 1
    }
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = w(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  def shingles(words: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(ShingleArray(ColumnBridge.toExpression(words), k))
  }
}
