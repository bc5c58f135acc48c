package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full MinHash signature of a document's
  * word array in ONE projection — `minhash_sig(words, k, H)` →
  * `array<long>` where element i = min over all k-word shingles of
  * xxhash64(shingle, seed=i).
  *
  * Shingling happens INSIDE the expression: building a shingle array
  * column first costs O(words²) in practice because Catalyst re-inlines
  * the split() alias into every per-index lambda access, and `min` is
  * idempotent so shingle de-duplication is unnecessary for MinHash.
  * Signatures are therefore a zero-shuffle, single-pass map-side
  * computation (the explode+groupBy formulation shuffles every
  * (doc, shingle) pair). The reference's analog is the fused map callback
  * computing per-record results inline
  * (`/root/reference/cpu/InvertedIndex.cpp:75-90`).
  *
  * Zero-length tokens are skipped INSIDE the expression, so callers pass
  * `split(text, "\\s+")` directly — wrapping the input in a higher-order
  * `filter(...)` would put a CodegenFallback expression in the projection
  * and kick the whole stage out of codegen. Input with fewer than k
  * non-empty words yields null — filter `isNotNull` after projecting.
  * Codegen: generated loop calling XXH64 directly; stays inside
  * whole-stage codegen (no fallback, no UDF boxing).
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // SQL-registered via GraftExtensions: non-string arrays must fail at
  // analysis time, not read garbage through getUTF8String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) null else evalWords(value.asInstanceOf[ArrayData])
  }

  private def evalWords(words: ArrayData): Any = {
    // compact away zero-length tokens first; shingles slide over the
    // compacted sequence
    val raw = words.numElements()
    val w = new Array[UTF8String](raw)
    var n = 0
    var r = 0
    while (r < raw) {
      val t = words.getUTF8String(r)
      if (t != null && t.numBytes() > 0) { w(n) = t; n += 1 }
      r += 1
    }
    if (n < k) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = w(i + j); j += 1 }
      val s = UTF8String.concatWs(sep, parts: _*)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h.toLong)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val s = ctx.freshName("s")
    val v = ctx.freshName("v")
    val n = ctx.freshName("n")
    val parts = ctx.freshName("parts")
    val sep = ctx.freshName("sep")
    val xxh = classOf[XXH64].getName
    val utf8 = classOf[UTF8String].getName
    val w = ctx.freshName("w")
    val raw = ctx.freshName("raw")
    val t = ctx.freshName("t")
    val code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  int $raw = ${childGen.value}.numElements();
         |  $utf8[] $w = new $utf8[$raw];
         |  int $n = 0;
         |  for (int $i = 0; $i < $raw; $i++) {
         |    $utf8 $t = ${childGen.value}.getUTF8String($i);
         |    if ($t != null && $t.numBytes() > 0) { $w[$n++] = $t; }
         |  }
         |  if ($n >= $k) {
         |    long[] $mins = new long[$numHashes];
         |    java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |    $utf8 $sep = $utf8.fromString(" ");
         |    $utf8[] $parts = new $utf8[$k];
         |    for (int $i = 0; $i <= $n - $k; $i++) {
         |      for (int $j = 0; $j < $k; $j++) {
         |        $parts[$j] = $w[$i + $j];
         |      }
         |      $utf8 $s = $utf8.concatWs($sep, $parts);
         |      for (int $h = 0; $h < $numHashes; $h++) {
         |        long $v = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |          $s.numBytes(), (long) $h);
         |        if ($v < $mins[$h]) $mins[$h] = $v;
         |      }
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level entry point: `words` is the tokenized word array. */
  def minhashSig(words: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.toColumn(MinHashSig(ColumnBridge.toExpression(words), k, numHashes))
}
