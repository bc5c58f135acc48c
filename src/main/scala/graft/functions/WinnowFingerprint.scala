package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprint
  * (Schleimer/Wilkerson/Aiken-style) over the UTF-8 bytes of a string in
  * ONE O(n) pass — Rabin-Karp rolling hashes of every `k`-byte gram,
  * sliding-window minimum over `w` consecutive gram hashes (monotone
  * deque), distinct selected values, sorted ascending.
  *
  * hash(p) = Σ_{j<k} byte(p+j) · B^(k-1-j)  mod M with B = 257,
  * M = 1e9+7 — pure integer arithmetic, so any engine (including the
  * DuckDB oracle) replays it bit-for-bit; no engine hash builtin is
  * involved. Fingerprint = the SET of window minima (values only), the
  * standard containment signal: two documents sharing a sufficiently long
  * run of bytes share selected grams regardless of alignment.
  *
  * Returns null when the text has fewer than k + w - 1 bytes (no full
  * window). The reference's fingerprint analog is the per-record fused
  * map callback idiom (`cpu/InvertedIndex.cpp:75-90`); winnowing itself
  * is the training-data-dedup standard this library adds (SURVEY §7.2.8).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.WinnowFingerprint$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $helper.compute($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {

  val Base = 257L
  val Mod = 1000000007L

  /** O(n): rolling gram hashes + monotone-deque window minima.
    * Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val grams = n - k + 1
    if (grams < w) return null
    // B^(k-1) mod M for the rolling subtract
    var powTop = 1L
    var i = 0
    while (i < k - 1) { powTop = powTop * Base % Mod; i += 1 }
    val hashes = new Array[Long](grams)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i < grams) {
      h = ((h - (bytes(i - 1) & 0xff) * powTop % Mod + Mod) % Mod * Base +
        (bytes(i + k - 1) & 0xff)) % Mod
      hashes(i) = h
      i += 1
    }
    // sliding min over w gram hashes: indices deque, increasing hash values
    val selected = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // [head, tail)
    i = 0
    while (i < grams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column entry point over a string column. */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.toColumn(
      WinnowFingerprint(ColumnBridge.toExpression(text), k, w))
}
