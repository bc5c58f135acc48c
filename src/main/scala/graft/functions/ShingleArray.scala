package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word k-shingles of a token array in one
  * pass — `shingle_array(split(text, "\\s+"), k)` → `array<string>`,
  * empty when fewer than k non-empty tokens (zero-length tokens are
  * skipped inside, like [[MinHashSig]]). With `distinct` (the default,
  * and the SQL-registered form) each shingle appears once in
  * first-occurrence order — the set semantics every Jaccard/minhash
  * consumer wants; with `distinct = false` every occurrence is kept in
  * position order — the multiset semantics n-gram COUNTING wants.
  *
  * Replaces the shifted-`slice` + `zip_with`-chain column formulation:
  * `zip_with` is a CodegenFallback higher-order function, so every
  * projection containing it fell out of whole-stage codegen AND paid k−1
  * intermediate array materializations per row (the PlanShapeSpec
  * lesson). This is the shingle producer behind the exact-Jaccard
  * verification joins (minhash candidates, the quadratic truth baseline,
  * decontamination) — per-row work in the hottest dedup scans.
  */
case class ShingleArray(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.ShingleArray$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.compute($c, $k, $distinct);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {

  /** k-shingles (space-joined) of the non-empty tokens; `distinct` keeps
    * first occurrences only — byte-identical to
    * `array_distinct(<zip_with concat chain>)` over the filtered words —
    * while `!distinct` keeps every occurrence in position order. */
  def compute(words: ArrayData, k: Int, distinct: Boolean): ArrayData = {
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
    val sep = UTF8String.fromString(" ")
    def shingleAt(i: Int): UTF8String = {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = w(i + j); j += 1 }
      UTF8String.concatWs(sep, parts: _*)
    }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= n - k) { seen.add(shingleAt(i)); i += 1 }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    } else {
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) { out(i) = shingleAt(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  def shingles(words: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(ShingleArray(ColumnBridge.toExpression(words), k))
  }

  /** Multiset form: every shingle occurrence, in position order. */
  def shinglesAll(words: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(
      ShingleArray(ColumnBridge.toExpression(words), k, distinct = false))
  }
}
