package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, MinHashSig, NormalizeText, ShingleArray, SimHashFp, TokenGramHashes, WinnowFingerprint}

/** SQL surface for the native expression layer: `vec_dot`, `simhash_fp`,
  * `minhash_sig`, `shingle_array`, `normalize_text`,
  * `winnow_fingerprint` become callable from `spark.sql(...)` exactly
  * like built-ins (and stay whole-stage-codegen'd — these are the same
  * Expression classes the Column API uses).
  *
  * Two installation paths:
  *  - new sessions: `spark.sql.extensions=graft.GraftExtensions` (or
  *    `SparkSession.builder.withExtensions(new GraftExtensions)`);
  *  - an already-running session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other if other.foldable => other.eval().asInstanceOf[Number].intValue()
    case _ => throw new IllegalArgumentException(
      s"$what must be a literal integer, got $e")
  }

  /** Constant-folds a boolean argument the way [[litInt]] does for ints —
    * `1=1` or `NOT false` work anywhere a bare literal does. */
  private def litBool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other if other.foldable => other.eval() match {
      case b: Boolean => b
      case v => throw new IllegalArgumentException(
        s"$what must be a boolean literal, got $v")
    }
    case _ => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $e")
  }

  private def arity(n: Int, args: Seq[Expression], name: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${args.length}")

  /** (name, info, builder) for every SQL-exposed native expression. */
  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("vec_dot",
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (args: Seq[Expression]) => {
          arity(2, args, "vec_dot"); DotProduct(args(0), args(1))
        }),
      ("simhash_fp",
        new ExpressionInfo(classOf[SimHashFp].getName, "simhash_fp"),
        (args: Seq[Expression]) => args.length match {
          // optional 2nd arg: salt (fingerprint half selector for the
          // 128-bit wide layout)
          case 1 => SimHashFp(args(0))
          case 2 => SimHashFp(args(0), litInt(args(1), "simhash_fp salt"))
          case n => throw new IllegalArgumentException(
            s"simhash_fp expects 1 or 2 arguments, got $n")
        }),
      ("minhash_sig",
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (args: Seq[Expression]) => {
          arity(3, args, "minhash_sig")
          MinHashSig(args(0), litInt(args(1), "minhash_sig k"),
            litInt(args(2), "minhash_sig numHashes"))
        }),
      ("shingle_array",
        new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
        (args: Seq[Expression]) => args match {
          // optional 3rd arg mirrors the Column API's multiset mode:
          // shingle_array(words, k, false) keeps every occurrence
          case Seq(w, k) =>
            ShingleArray(w, litInt(k, "shingle_array k"))
          case Seq(w, k, d) =>
            ShingleArray(w, litInt(k, "shingle_array k"),
              distinct = litBool(d, "shingle_array distinct"))
          case _ => throw new IllegalArgumentException(
            "shingle_array expects (array<string>, k [, distinct])")
        }),
      ("word_hash",
        new ExpressionInfo(classOf[graft.functions.WordHash].getName, "word_hash"),
        (args: Seq[Expression]) => {
          arity(1, args, "word_hash"); graft.functions.WordHash(args(0))
        }),
      ("token_gram_hashes",
        new ExpressionInfo(classOf[TokenGramHashes].getName, "token_gram_hashes"),
        (args: Seq[Expression]) => args match {
          // optional 3rd arg: hash seed (substring dedup keys on two
          // independently-seeded hashes for an effective 128-bit gram id)
          case Seq(t, l) =>
            TokenGramHashes(t, litInt(l, "token_gram_hashes L"), 0L)
          case Seq(t, l, seed) =>
            TokenGramHashes(t, litInt(l, "token_gram_hashes L"),
              litInt(seed, "token_gram_hashes seed").toLong)
          case _ => throw new IllegalArgumentException(
            "token_gram_hashes expects (array<string>, L [, seed])")
        }),
      ("normalize_text",
        new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
        (args: Seq[Expression]) => {
          arity(1, args, "normalize_text"); NormalizeText(args(0))
        }),
      ("winnow_fingerprint",
        new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
        (args: Seq[Expression]) => {
          arity(3, args, "winnow_fingerprint")
          WinnowFingerprint(args(0), litInt(args(1), "winnow_fingerprint k"),
            litInt(args(2), "winnow_fingerprint w"))
        }))

  /** Register the functions on an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.FunctionBridge
        .register(spark, name, info, builder)
    }
}
