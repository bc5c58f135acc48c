package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The SQL function surface must behave exactly like the Column API — the
  * registry hands Catalyst the same Expression classes. */
class GraftExtensionsSpec extends AnyFunSuite {
  import TestSession._

  test("register exposes vec_dot/simhash_fp/minhash_sig to spark.sql") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 32.0)

    val s = spark
    import s.implicits._
    Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
               simhash_fp(split(text, ' ')) AS fp,
               minhash_sig(split(text, ' '), 3, 8) AS sig
         FROM ext_docs""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    val viaColumns = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.SimHashFp.simhashFp(split(col("text"), " ")).as("fp"),
        graft.functions.MinHashSig.minhashSig(split(col("text"), " "), 3, 8).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    assert(viaSql == viaColumns)
    assert(viaSql(0)._2 == viaSql(1)._2, "identical docs, identical fingerprints")
    assert(viaSql(0)._3 == viaSql(1)._3, "identical docs, identical signatures")
  }

  test("extensions injector carries the same descriptors") {
    // the config path (spark.sql.extensions=graft.GraftExtensions) applies
    // at session build; here we check the injector wires every descriptor
    // without error against a fresh extensions container
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftExtensions.descriptors.map(_._1) ==
      Seq("vec_dot", "simhash_fp", "minhash_sig", "shingle_array",
        "word_hash", "token_gram_hashes", "normalize_text",
        "winnow_fingerprint"))
  }

  test("shingle_array / normalize_text / winnow_fingerprint match the Column API") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq((1L, "  The  cat SAT on the cat sat mat  "))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      """SELECT shingle_array(split(text, '\\s+'), 3) AS sh,
               md5(normalize_text(text)) AS norm,
               winnow_fingerprint(text, 8, 4) AS win
         FROM ext_docs2""").head()
    val viaCols = Seq((1L, "  The  cat SAT on the cat sat mat  "))
      .toDF("doc_id", "text")
      .select(graft.llm.Dedup.shingleArray(col("text"), 3).as("sh"),
        md5(graft.functions.NormalizeText.normalize(col("text"))).as("norm"),
        graft.functions.WinnowFingerprint.winnow(col("text"), 8, 4).as("win"))
      .head()
    assert(viaSql.getSeq[String](0) == viaCols.getSeq[String](0))
    assert(viaSql.getString(1) == viaCols.getString(1))
    assert(viaSql.get(2) == viaCols.get(2))
    // 3-arg multiset form ≡ shinglesAll (occurrence-keeping semantics are
    // property-tested in EngineProperties; here pin the SQL wiring)
    val multiSql = spark.sql(
      "SELECT shingle_array(split(text, '\\\\s+'), 2, false) AS sh FROM ext_docs2")
      .head().getSeq[String](0)
    val multiCol = Seq((1L, "  The  cat SAT on the cat sat mat  "))
      .toDF("doc_id", "text")
      .select(graft.functions.ShingleArray.shinglesAll(
        split(col("text"), "\\s+"), 2).as("sh"))
      .head().getSeq[String](0)
    assert(multiSql == multiCol)
    // foldable-but-unliteral boolean constant-folds like litInt does for
    // ints: NOT true ≡ false (the multiset mode)
    val foldedSql = spark.sql(
      "SELECT shingle_array(split(text, '\\\\s+'), 2, NOT true) AS sh FROM ext_docs2")
      .head().getSeq[String](0)
    assert(foldedSql == multiCol)
  }

  test("word_hash SQL form matches SimHashFp.wordHash") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT word_hash('cat'), word_hash('')").head()
    assert(got.getLong(0) == graft.functions.SimHashFp.wordHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("cat")))
    assert(got.getLong(1) == 0L)
  }

  test("token_gram_hashes SQL form matches the Column API, seed optional") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq((1L, "a b c d e f"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs3")
    val viaSql = spark.sql(
      """SELECT token_gram_hashes(split(text, '\\s+'), 3) AS g0,
               token_gram_hashes(split(text, '\\s+'), 3, 2) AS g2
         FROM ext_docs3""").head()
    val viaCols = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
      .select(
        graft.functions.TokenGramHashes.gramHashes(
          split(col("text"), "\\s+"), 3).as("g0"),
        graft.functions.TokenGramHashes.gramHashes(
          split(col("text"), "\\s+"), 3, 2L).as("g2"))
      .head()
    assert(viaSql.getSeq[Long](0) == viaCols.getSeq[Long](0))
    assert(viaSql.getSeq[Long](1) == viaCols.getSeq[Long](1))
    assert(viaSql.getSeq[Long](0) != viaSql.getSeq[Long](1)) // seeds independent
  }

  test("minhash_sig rejects non-literal k") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq(1L).toDF("doc_id").createOrReplaceTempView("ext_ids")
    intercept[Throwable] {
      spark.sql("SELECT minhash_sig(array('a','b','c'), doc_id + 1, 8) FROM ext_ids")
        .collect()
    }
  }
}
