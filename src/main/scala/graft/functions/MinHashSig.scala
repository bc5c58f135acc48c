package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the full MinHash signature of a shingle set
  * in ONE projection — `minhash_sig(shingles, H)` → `array<long>` where
  * element i = min over shingles of xxhash64(shingle, seed=i).
  *
  * Why an expression and not the explode+groupBy formulation: signatures
  * become a zero-shuffle map-side projection (the explode path shuffles
  * every (doc, shingle) pair to re-group by doc). At 100 TB that removes
  * the largest shuffle of the dedup pipeline entirely; locally it removes
  * ~n_shingles×H aggregation rows. The reference's analog is the fused
  * map callback computing per-record results inline
  * (`/root/reference/cpu/InvertedIndex.cpp:75-90` map-side work).
  *
  * Codegen: generated loop over the shingle array calling XXH64 directly —
  * stays inside whole-stage codegen (no CodegenFallback, no UDF boxing).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    long $v = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |      $s.numBytes(), (long) $h);
         |    if ($v < $mins[$h]) $mins[$h] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level entry point. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.toColumn(MinHashSig(ColumnBridge.toExpression(shingles), numHashes))
}
