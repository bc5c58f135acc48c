package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the exact-dedup normalization
  * `trim(regexp_replace(lower(text), "\\s+", " "))` as UTF-8 bytes in one
  * scan — the per-row regex engine was the dominant cost of the
  * normalized-dedup / fingerprint path.
  *
  * ASCII inputs (the overwhelming case in a web corpus, and what the
  * harness data is) take the single-pass byte loop; any input containing
  * a non-ASCII byte falls back to composing the SAME Spark primitives
  * (`UTF8String.toLowerCase` + Java regex), so results are identical to
  * the column formulation for every input, not just the fast path —
  * asserted over random and unicode strings in NormalizeTextSpec.
  * Output is BinaryType: callers feed it straight to `md5`, exactly like
  * the `.cast("binary")` they previously applied to the string form.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.NormalizeText$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Lowercase + collapse `\s+` runs to one space + trim, as bytes. */
  def compute(s: UTF8String): Array[Byte] = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var ascii = true
    while (i < n && ascii) { if ((bytes(i) & 0x80) != 0) ascii = false; i += 1 }
    if (!ascii) {
      // exact slow path: the same primitives the column form used. Strip
      // only ' ' at the boundaries — Spark's trim() removes spaces only,
      // while Java String.trim strips every char <= 0x20 (NUL, SOH, ...),
      // which would break byte-identity on inputs mixing non-ASCII chars
      // with boundary control chars outside \s.
      val collapsed = s.toLowerCase.toString.replaceAll("\\s+", " ")
      var st = 0
      var en = collapsed.length
      while (st < en && collapsed.charAt(st) == ' ') st += 1
      while (en > st && collapsed.charAt(en - 1) == ' ') en -= 1
      return collapsed.substring(st, en).getBytes("UTF-8")
    }
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      val b = bytes(i)
      if (isSpace(b)) {
        if (o > 0) pendingSpace = true // leading spaces drop (trim)
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        o += 1
      }
      i += 1
    }
    // trailing pendingSpace drops (trim)
    java.util.Arrays.copyOf(out, o)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def normalize(text: Column): Column =
    ColumnBridge.toColumn(NormalizeText(ColumnBridge.toExpression(text)))
}
