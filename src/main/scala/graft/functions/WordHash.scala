package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: [[SimHashFp.wordHash]] as a scalar column
  * — the portable polynomial hash (Σ byte·B^(L-j) mod 1e9+7 over the
  * UTF-8 bytes) every replayable oracle in this repo can recompute in
  * plain int64 SQL. Exposed standalone so sketch operators
  * ([[graft.operators.CountMin]]) can key on the SAME word identity the
  * SimHash fingerprints use: sketch semantics live in hash COLLISIONS,
  * so the oracle must reproduce the hash bit-for-bit, which rules out
  * the engine-private xxhash64 and the 2^64-ring
  * [[TokenGramHashes]] (replayed over gram text, not numerically).
  * Empty string hashes to 0; callers filter empties to match the
  * `list_filter(length > 0)` oracle tokenization. */
case class WordHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "word_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashFp.wordHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashFp$$.MODULE$$.wordHash($c);")

  override protected def withNewChildInternal(newChild: Expression): WordHash =
    copy(child = newChild)
}

object WordHash {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level entry point. */
  def wordHash(s: Column): Column =
    ColumnBridge.toColumn(WordHash(ColumnBridge.toExpression(s)))
}
