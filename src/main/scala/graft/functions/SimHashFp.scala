package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: SimHash 64-bit fingerprint of a word array
  * in ONE projection — each word hashed with xxhash64 (seed 42, matching
  * `functions.xxhash64`), every bit weighted ±1 and summed, bit set where
  * the sum is positive.
  *
  * Replaces the explode + 64-conditional-sum aggregation formulation:
  * fingerprints become a zero-shuffle map-side pass (the aggregation
  * formulation shuffles every (doc, word) pair). Same fusion rationale as
  * [[MinHashSig]].
  *
  * Zero-length tokens are skipped INSIDE the expression and an input with
  * no non-empty words yields null, so callers pass `split(text, "\\s+")`
  * directly — wrapping the input in a higher-order `filter(...)` (or
  * gating on `size(filter(...))`) would put a CodegenFallback expression
  * in the stage and kick the whole projection out of codegen.
  */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_fp"

  // SQL-registered via GraftExtensions: non-string arrays must fail at
  // analysis time, not read garbage through getUTF8String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) return null
    val words = value.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var used = 0
    var i = 0
    while (i < words.numElements()) {
      val s = words.getUTF8String(i)
      if (s != null && s.numBytes() > 0) {
        used += 1
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (used == 0) return null
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val counts = ctx.freshName("counts")
    val used = ctx.freshName("used")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val s = ctx.freshName("s")
    val h = ctx.freshName("h")
    val fp = ctx.freshName("fp")
    val xxh = classOf[XXH64].getName
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = 0L;
         |if (!${childGen.isNull}) {
         |  int[] $counts = new int[64];
         |  int $used = 0;
         |  for (int $i = 0; $i < ${childGen.value}.numElements(); $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $s =
         |      ${childGen.value}.getUTF8String($i);
         |    if ($s != null && $s.numBytes() > 0) {
         |      $used++;
         |      long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |        $s.numBytes(), 42L);
         |      for (int $b = 0; $b < 64; $b++) {
         |        if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |      }
         |    }
         |  }
         |  if ($used > 0) {
         |    long $fp = 0L;
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ($counts[$b] > 0) $fp |= (1L << $b);
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} = $fp;
         |  }
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhashFp(words: Column): Column =
    ColumnBridge.toColumn(SimHashFp(ColumnBridge.toExpression(words)))
}
