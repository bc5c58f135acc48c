package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: positional token L-gram hashes in ONE
  * O(tokens) pass — `token_gram_hashes(split(text, "\\s+"), L, seed)` →
  * `array<long>` where element `p` (0-based) is a 64-bit hash of the L
  * consecutive non-empty tokens starting at (0-based) filtered-token
  * position `p`; null when the document has fewer than L non-empty
  * tokens. This is the gram producer behind sequence-level (substring)
  * dedup ([[graft.llm.Dedup.repeatedSpans]]): every position must be
  * hashed, so the naive `slice` + `concat_ws` column formulation pays
  * O(tokens × L) byte copies per document — 50× CPU amplification at the
  * production L≈50 — while the rolling form here pays O(tokens).
  *
  * Hash shape: each token is hashed on its own (FNV-1a-style byte fold
  * seeded by `seed`, finished with the splitmix64 finalizer so token
  * boundaries can't cancel), then the gram hash is the polynomial
  * Σ tokHash(p+j) · B^(L-1-j) in the 2^64 wraparound ring, advanced by
  * the standard Rabin-Karp subtract-multiply-add recurrence (the
  * token-level analog of [[WinnowFingerprint]]'s byte-level rolling
  * hash — reference semantics: `oink/reduce_cull.cpp` key identity,
  * generalized from whole records to record substrings). Collisions are
  * why `seed` exists: substring dedup groups grams BY this hash, and a
  * single 64-bit key would see birthday collisions around 2^32 grams —
  * real at 100 TB — so callers key on TWO independently-seeded hashes
  * (effectively 128 bits; both ride the same projection and the same
  * one-pass scan), pushing the first expected collision past 10^18
  * grams. Not cryptographic: an adversarial corpus can manufacture
  * collisions; the downstream exact verification joins are the defense
  * where that matters.
  */
case class TokenGramHashes(child: Expression, gramLen: Int, seed: Long)
    extends UnaryExpression {

  require(gramLen >= 1, "gram length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenGramHashes.compute(input.asInstanceOf[ArrayData], gramLen, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.TokenGramHashes$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $helper.compute($c, $gramLen, ${seed}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenGramHashes =
    copy(child = newChild)
}

object TokenGramHashes {

  /** Polynomial base for the gram-level rolling hash (odd, so it is a
    * unit in the 2^64 ring and the rolling subtract is exact). */
  val GramBase = 1099511628211L // FNV-1a 64-bit prime

  /** splitmix64 finalizer — decorrelates the per-token byte fold so
    * `tokHash(a) + B·tokHash(b)` can't be forged by moving bytes across
    * the token boundary. */
  def fmix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit hash of one token's UTF-8 bytes, seeded. */
  def tokenHash(t: UTF8String, seed: Long): Long = {
    val bytes = t.getBytes
    var h = seed ^ 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * GramBase
      i += 1
    }
    fmix(h)
  }

  /** O(n): filter empty tokens, hash each once, roll the L-window
    * polynomial across all positions. Called from both interpreted eval
    * and generated code. */
  def compute(words: ArrayData, gramLen: Int, seed: Long): ArrayData = {
    val raw = words.numElements()
    val th = new Array[Long](raw)
    var n = 0
    var r = 0
    while (r < raw) {
      val t = words.getUTF8String(r)
      if (t != null && t.numBytes() > 0) { th(n) = tokenHash(t, seed); n += 1 }
      r += 1
    }
    if (n < gramLen) return null
    var powTop = 1L
    var i = 0
    while (i < gramLen - 1) { powTop *= GramBase; i += 1 }
    val out = new Array[Long](n - gramLen + 1)
    var h = 0L
    i = 0
    while (i < gramLen) { h = h * GramBase + th(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= n - gramLen) {
      h = (h - th(i - 1) * powTop) * GramBase + th(i + gramLen - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column entry point over a token-array column (raw `split` output —
    * empty tokens are skipped inside; positions index the non-empty
    * token sequence). */
  def gramHashes(tokens: Column, gramLen: Int, seed: Long = 0L): Column =
    ColumnBridge.toColumn(
      TokenGramHashes(ColumnBridge.toExpression(tokens), gramLen, seed))
}
