package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, heuristic language ID, content fingerprinting.
  * All pure column expressions (whole-stage codegen, no UDFs) and each
  * re-expressible in ANSI SQL for the DuckDB oracle.
  */
object TextAnalysis {

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")

  /** Shared one-scan counters (native [[graft.functions.TextStats]]):
    * [n_ws_tokens, n_bpe_tokens, n_chars, sum_token_chars, n_stopwords,
    * n_punct]. Repeated accesses below collapse into one evaluation per
    * row via subexpression elimination inside whole-stage codegen —
    * previously this surface was a per-row stack of interpreted
    * higher-order functions plus two regex extractions. */
  private def stats(text: Column): Column =
    graft.functions.TextStats.textStats(text, stopwords)

  /** Gopher-style rule-based quality gate (Rae et al. 2021, §A1.1
    * adapted to the counters this corpus exercises): five named boolean
    * rules as 0/1 flags plus the failure count and the all-rules pass
    * bit. Zero-shuffle — one [[graft.functions.TextStats]] scan and one
    * [[graft.functions.RepetitionStats]] scan per row feed plain column
    * comparisons, all inside whole-stage codegen; every ratio is a
    * single IEEE division of two exact integer counts, so the
    * threshold comparisons are bit-identical on both engines.
    *
    * Rules: word count in [20, 100000]; mean word length in [3, 10];
    * stopword ratio ≥ 0.05; punctuation-to-character ratio ≤ 0.2;
    * top-word fraction ≤ 0.2 (the repetition/boilerplate screen). */
  def gopherRules(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val st = stats(col(textCol))
    val rep = graft.functions.RepetitionStats.repetitionStats(col(textCol))
    val nWords = element_at(st, 1)
    val nw = nWords.cast("double")
    def flag(c: Column): Column = when(c, lit(1L)).otherwise(lit(0L))
    val rWords = flag(nWords >= 20L && nWords <= 100000L)
    val rWordLen = flag(nWords > 0L &&
      element_at(st, 4).cast("double") / nw >= 3.0 &&
      element_at(st, 4).cast("double") / nw <= 10.0)
    val rStop = flag(nWords > 0L &&
      element_at(st, 5).cast("double") / nw >= 0.05)
    val rSym = flag(element_at(st, 3) > 0L &&
      element_at(st, 6).cast("double") / element_at(st, 3) <= 0.2)
    val rRep = flag(nWords > 0L &&
      element_at(rep, 3).cast("double") / nw <= 0.2)
    docs.select(col(idCol), rWords.as("r_words"), rWordLen.as("r_word_len"),
        rStop.as("r_stopwords"), rSym.as("r_symbols"), rRep.as("r_repetition"))
      .withColumn("n_failed", lit(5L) - col("r_words") - col("r_word_len") -
        col("r_stopwords") - col("r_symbols") - col("r_repetition"))
      .withColumn("pass", when(col("n_failed") === 0L, lit(1L)).otherwise(lit(0L)))
  }

  /** Token statistics: whitespace tokens, BPE-ish tokens (word pieces +
    * standalone punctuation), characters. */
  def tokenStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val st = stats(col(textCol))
    docs.select(
      col(idCol),
      element_at(st, 1).as("n_ws_tokens"),
      element_at(st, 2).as("n_bpe_tokens"),
      element_at(st, 3).as("n_chars"))
  }

  /** The blended 4dp quality heuristic of [[qualityScore]] as a bare
    * column (shared with [[relativeQualityFilter]]; identical stats()
    * instances collapse via codegen subexpression elimination). */
  def quality(text: Column): Column = {
    val st = stats(text)
    val nWords = element_at(st, 1)
    val stopRatio = element_at(st, 5).cast("double") / nWords
    val punctRatio = element_at(st, 6).cast("double") / element_at(st, 3)
    round(
      least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4 +
        least(stopRatio * 5.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2,
      4)
  }

  /** Per-group RELATIVE quality filter — "drop the worst `dropFrac` of
    * each source", the curation step where an absolute score cut is
    * wrong because sources have different score distributions. Ranking
    * runs on a quantized-score histogram CDF, NOT a per-group window
    * sort over the corpus: the score is 4dp, so bucket =
    * round(quality·10⁴) is an exact integer in [0, 10⁴] and the whole
    * distribution per group is ≤ 10 001 cells. A bucket is wholly
    * dropped iff its group-cumulative count (ascending buckets,
    * inclusive) ≤ floor(dropFrac·n_group) — whole-bucket granularity is
    * the documented rounding of the fraction, which makes the kept set
    * exactly replayable (no tie-breaking inside a bucket to agree on).
    *
    * 100 TB shape: one map-side-partial histogram aggregate (shuffle
    * carries (group, bucket) CELLS, never documents), a window over the
    * tiny histogram frame, and a ≤-one-row-per-group threshold table
    * broadcast back as the filter — the corpus itself is scanned twice
    * and shuffled never. A per-group `Window.orderBy(score)` over the
    * data would sort 100 TB inside each group and collapse on skewed
    * sources; this shape is invariant to both. */
  def relativeQualityFilter(docs: DataFrame, textCol: String, idCol: String,
      groupCol: String, dropFrac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dropFrac >= 0.0 && dropFrac < 1.0, "dropFrac must be in [0, 1)")
    val withB = docs.withColumn("q_bucket",
      round(quality(col(textCol)) * 10000.0).cast("long"))
    val hist = withB.groupBy(col(groupCol), col("q_bucket"))
      .agg(count(lit(1)).as("_c"))
    val cum = hist
      .withColumn("_cum", sum(col("_c"))
        .over(Window.partitionBy(groupCol).orderBy(col("q_bucket"))))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(groupCol)))
    val thresholds = cum
      .where(col("_cum") <= floor(lit(dropFrac) * col("_n")))
      .groupBy(col(groupCol)).agg(max(col("q_bucket")).as("_t"))
    withB.join(broadcast(thresholds), Seq(groupCol), "left")
      .where(col("_t").isNull || col("q_bucket") > col("_t"))
      .drop("_t")
  }

  /** Quality signals: word count, mean word length, stopword ratio,
    * punctuation ratio, and a blended score. Single projection, no shuffle. */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val st = stats(col(textCol))
    val nWords = element_at(st, 1)
    val meanLen = element_at(st, 4).cast("double") / nWords
    val stopRatio = element_at(st, 5).cast("double") / nWords
    val punctRatio = element_at(st, 6).cast("double") / element_at(st, 3)
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      // blended heuristic: long-enough docs with natural stopword density
      // and little punctuation noise score higher
      round(
        least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4 +
          least(stopRatio * 5.0, lit(1.0)) * 0.4 +
          (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2,
        4).as("quality"))
  }

  /** Heuristic language ID: marker-word rules (the real-corpus version
    * scores character n-gram profiles; the rule chain keeps the operator
    * deterministic and oracle-checkable). */
  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    docs.select(col(idCol),
      when(padded.contains(" the ") || padded.contains(" is "), "en")
        .when(padded.contains(" le ") || padded.contains(" et "), "fr")
        .when(padded.contains(" der ") || padded.contains(" und "), "de")
        .when(padded.contains(" el ") || padded.contains(" y "), "es")
        .otherwise("und").as("lang_pred"))
  }

  /** Repetition quality signals (the boilerplate/spam filters of a
    * curation pass): fraction of the document that is its most frequent
    * word / word-bigram, plus the distinct-word fraction. One native
    * one-scan expression ([[graft.functions.RepetitionStats]]) feeding
    * plain-column ratio arithmetic — no shuffle, and every ratio is one
    * IEEE division of two exact integer counts (engine-identical before
    * the shared 6dp display rounding). Documents with no words (or no
    * bigram) report 0.0 for the undefined ratios. */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val st = graft.functions.RepetitionStats.repetitionStats(col(textCol))
    val nWords = element_at(st, 1)
    val nBigrams = element_at(st, 4)
    def frac(num: Column, den: Column): Column =
      when(den === 0, lit(0.0))
        .otherwise(round(num.cast("double") / den, 6))
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      frac(element_at(st, 2), nWords).as("distinct_word_frac"),
      frac(element_at(st, 3), nWords).as("top_word_frac"),
      frac(element_at(st, 5), nBigrams).as("top_bigram_frac"))
  }

  /** Corpus bigram-LM fluency score — the perplexity-style quality
    * signal a curation pipeline uses to filter gibberish, computed
    * self-contained against the corpus's OWN bigram statistics (no
    * external model): score(doc) = mean over the doc's bigrams (w1,w2)
    * of ln( c(w1,w2) / c(w1) ), with c(·) corpus-wide multiset counts
    * (unigram denominator — the plain MLE conditional; every doc bigram
    * has c ≥ 1, so no smoothing term is needed for finiteness).
    * Repetitive/boilerplate text scores HIGH (predictable), random word
    * salad scores LOW — the complement of [[repetitionStats]], which
    * only sees within-doc structure. Returns (doc_id, n_bigrams,
    * avg_logp) for every document; degenerate docs (< 2 tokens) carry
    * n_bigrams = 0, avg_logp = 0.0.
    *
    * Scale shape: two corpus-wide count aggregates (map-side partial —
    * skewed common bigrams combine before the shuffle) + two equi-joins
    * of the doc-bigram stream against them (hash joins on
    * high-cardinality keys; at 100 TB the bigram vocabulary is not
    * broadcastable and this shuffle IS the cost of corpus-conditional
    * scoring) + one per-doc aggregate. The per-term ln is rounded at
    * 6dp only after the mean — the kmeans rounding-boundary caveat
    * applies verbatim. */
  def lmScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    val bigr = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.ShingleArray.shinglesAll(toks, 2)).as("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val words = docs.select(
      explode(graft.functions.ShingleArray.shinglesAll(toks, 1)).as("w1"))
    val bc = bigr.groupBy(col("bigram")).agg(count(lit(1)).as("cb"))
    val wc = words.groupBy(col("w1")).agg(count(lit(1)).as("cw"))
    val scored = bigr
      .join(bc, "bigram")
      .join(wc, "w1")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("cb").cast("double") / col("cw"))), 6).as("avg_logp"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logp"), lit(0.0)).as("avg_logp"))
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * token pairs: PMI(a,b) = ln(p(ab) / (p(a)·p(b))) — the corpus
    * analysis that surfaces multiword units ("new york") a frequency
    * top-k buries under stopword pairs. Computed in ONE double
    * expression shape, ln((c_ab·N1·N1) / (N2·c_a·c_b)), mirrored
    * operand-for-operand by the oracle so 6dp rounding agrees (the
    * [[lmScore]] ln-parity discipline); `minCount` is the standard
    * low-frequency cutoff (PMI of rare pairs explodes).
    *
    * 100 TB shape: two count aggregates (map-side partials; shuffles
    * carry (gram, count) cells); the unigram table is vocabulary-sized
    * and BROADCASTS into the bigram frame twice; totals are 1-row
    * broadcasts; the final top-k is a TakeOrdered, never a global
    * sort. */
  def pmiPairs(docs: DataFrame, textCol: String, topK: Int = 20,
      minCount: Long = 5L): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    val bigr = docs.select(
      explode(graft.functions.ShingleArray.shinglesAll(toks, 2)).as("bigram"))
    val words = docs.select(
      explode(graft.functions.ShingleArray.shinglesAll(toks, 1)).as("wd"))
    val bc = bigr.groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val wc = words.groupBy(col("wd")).agg(count(lit(1)).as("cw"))
    val n1 = words.agg(count(lit(1)).as("n1"))
    val n2 = bigr.agg(count(lit(1)).as("n2"))
    bc
      .join(broadcast(wc.select(col("wd").as("w1"), col("cw").as("c1"))), "w1")
      .join(broadcast(wc.select(col("wd").as("w2"), col("cw").as("c2"))), "w2")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("bigram"), col("n_pair"),
        round(log(
          (col("n_pair").cast("double") * col("n1") * col("n1")) /
            (col("n2").cast("double") * col("c1") * col("c2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(topK)
  }

  /** DSIR-style data-selection importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling" —
    * public arXiv:2302.03169): score every pool document by how much
    * its n-gram distribution looks like a TARGET slice of the pool
    * (e.g. a curated or in-domain subset) relative to the pool itself:
    *
    *   weight(doc) = mean over doc bigrams g of
    *     ln( p̂_target(g) / p̂_pool(g) )
    *
    * with add-one–smoothed MLEs p̂(g) = (c(g)+1)/(N+V) (V = pool-wide
    * distinct-bigram count; smoothing keeps ln finite for bigrams the
    * target never saw). Selecting the top-quota by weight is the
    * deterministic "importance resampling" step a pretraining pipeline
    * runs to tilt a web crawl toward a target domain. The mean (not
    * sum) keeps long docs from dominating; the single-ln operand shape
    * ln((ct+1)·(Nr+V) / ((cr+1)·(Nt+V))) is mirrored
    * operand-for-operand by the oracle so 6dp rounding agrees (the
    * [[lmScore]] ln-parity discipline). Docs with < 2 tokens carry
    * n_bigrams = 0, weight = 0.0.
    *
    * 100 TB shape: exactly [[lmScore]]'s — two (bigram, count)
    * aggregates (map-side partials), the doc-bigram stream hash-joins
    * against them (the bigram vocabulary is NOT broadcastable at
    * corpus scale; that shuffle is the cost of corpus-conditional
    * scoring), totals are a 1-row broadcast, and the per-doc mean
    * partial-aggregates map-side. The target-count table is left-joined
    * (absent bigram → ct = 0), so the target slice never constrains
    * the join order. */
  def dsirWeights(docs: DataFrame, targetPred: Column, textCol: String,
      idCol: String): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    val bigr = docs.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
      explode(graft.functions.ShingleArray.shinglesAll(toks, 2)).as("bigram"))
    val ct = bigr.where(col("is_t")).groupBy(col("bigram"))
      .agg(count(lit(1)).as("ct"))
    val cr = bigr.groupBy(col("bigram")).agg(count(lit(1)).as("cr"))
    val totals = bigr.agg(
      sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("nt"),
      count(lit(1)).as("nr"),
      countDistinct(col("bigram")).as("v"))
    val scored = bigr
      .join(ct, Seq("bigram"), "left")
      .join(cr, Seq("bigram"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(
          ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double")
            * (col("nr") + col("v"))) /
            ((col("cr") + lit(1L)).cast("double")
              * (col("nt") + col("v"))))), 6).as("weight"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }

  /** Hashed-linear-model document scoring — the inference half of a
    * fastText/CCNet-style model-based quality filter (the step that
    * replaces heuristic [[qualityScore]] once a classifier has been
    * trained offline): each word maps to a weight bucket by the
    * portable [[graft.functions.WordHash]] mod `weights.size` (feature
    * hashing), and the document scores bias + mean of its words'
    * bucket weights — the linear activation. The sigmoid is monotone,
    * so thresholding the activation IS thresholding the probability;
    * emitting the raw activation keeps the oracle free of
    * exp-rounding parity concerns. Docs with no tokens score
    * round(bias, 6).
    *
    * The weight vector is the caller's trained artifact; it rides the
    * plan as a literal array (a broadcast constant at any corpus
    * size). The registered query uses a deterministic mixer-generated
    * stand-in vector — the ENGINE contract under test is the scoring
    * shape, not a particular model.
    *
    * 100 TB shape: one zero-shuffle projection over the scan — hash,
    * index, fold, per row; scales with executors like any map. A
    * production fastText head (≥10⁶ buckets × k classes) outgrows a
    * literal and becomes a broadcast (bucket, weight) join on the
    * exploded word stream + per-doc aggregate — the [[dsirWeights]]
    * join shape; at the config-sized vectors a filter actually
    * thresholds on, the literal projection is strictly better (no
    * explode, no aggregate exchange). */
  def hashedLinearScore(docs: DataFrame, textCol: String, idCol: String,
      weights: Seq[Double], bias: Double = 0.0): DataFrame = {
    require(weights.nonEmpty, "weight vector must be non-empty")
    val dim = weights.size
    val wlit = array(weights.map(lit): _*)
    val toks = filter(split(col(textCol), "\\s+"), w => length(w) > lit(0))
    val pw = transform(toks, w => element_at(wlit,
      (pmod(graft.functions.WordHash.wordHash(w), lit(dim.toLong)) + lit(1L))
        .cast("int")))
    val n = size(toks).cast("long")
    val s = aggregate(pw, lit(0.0), (acc, x) => acc + x)
    docs.select(col(idCol).as("doc_id"), n.as("n_words"),
      round(lit(bias) +
        when(n > 0L, s / n.cast("double")).otherwise(lit(0.0)), 6)
        .as("score"))
  }

  /** The deterministic stand-in weight vector the registered query
    * scores with (mixer-generated, centered on 0): weight i =
    * ((i·2654435761 + 40503) mod 9973)/9973 − 0.5. Generated by the
    * SAME formula in the oracle SQL so both engines index an identical
    * vector. */
  def mixerWeights(dim: Int): Seq[Double] =
    (0 until dim).map(i =>
      ((i * 2654435761L + 40503L) % 9973L).toDouble / 9973.0 - 0.5)

  /** Multi-class hashed-linear DOMAIN classifier — the mixture-
    * bucketing step (CCNet language buckets, DoReMi domain heads) on
    * top of [[hashedLinearScore]]'s projection: `numDomains` mixer-
    * seeded weight heads score every document in ONE scan (each word
    * hashes to its bucket once; head c's weight for bucket h is
    * computed INLINE from the mixer — ((c·dim + h)·2654435761 + 40503)
    * mod 9973 / 9973 − 0.5 — so no weight vector is materialized on
    * either engine), and the document's domain is the argmax score
    * with (score desc, domain asc) tiebreak, expressed as least() over
    * (−score, domain) structs. Per-head sums are ordered left-to-right
    * folds (the list_sum parity). Returns
    * (doc_id, n_words, domain, score).
    *
    * 100 TB shape: a zero-shuffle projection — C·|words| arithmetic
    * per document, no joins, no aggregation exchange; domain
    * assignment gates the mixture sampler exactly like the binary
    * quality score gates filtering. */
  def domainClassify(docs: DataFrame, textCol: String, idCol: String,
      numDomains: Int = 4, dim: Int = 64): DataFrame = {
    require(numDomains >= 2, "need at least two domains")
    val toks = filter(split(col(textCol), "\\s+"), w => length(w) > lit(0))
    val hs = transform(toks, w =>
      pmod(graft.functions.WordHash.wordHash(w), lit(dim.toLong)))
    val base = docs.select(col(idCol).as("doc_id"),
      size(toks).cast("long").as("n_words"), hs.as("hs"))
    def score(c: Int): Column = {
      val terms = transform(col("hs"), h =>
        ((lit(c.toLong * dim) + h) * lit(2654435761L) + lit(40503L))
          % lit(9973L) / lit(9973.0) - lit(0.5))
      round(when(col("n_words") > 0L,
        aggregate(terms, lit(0.0), (a, x) => a + x) /
          col("n_words").cast("double")).otherwise(lit(0.0)), 6)
    }
    val best = least((0 until numDomains).map(c =>
      struct((-score(c)).as("neg"), lit(c.toLong).as("d"))): _*)
    base.select(col("doc_id"), col("n_words"),
      best.getField("d").as("domain"),
      (-best.getField("neg")).as("score"))
  }

  /** Per-source domain-mixture drift: KL(P(domain|source) ‖ P(domain))
    * over [[domainClassify]]'s assignments — the monitoring readout a
    * curation pipeline alarms on when a crawl source's content shifts
    * relative to the corpus mix. Counts are exact integers (one
    * map-side-partial aggregate per grouping); the KL terms sum in a
    * FIXED expression order over pivoted per-domain columns — never a
    * float groupBy sum, whose partial-merge order is nondeterministic —
    * so both engines fold identical doubles (ln parity is the
    * established BM25/DSIR contract). A domain absent from a source
    * contributes 0 (lim p→0 of p·ln(p/q)); q > 0 whenever p > 0 because
    * the corpus contains the source. Returns (source, n_docs, kl).
    *
    * 100 TB shape: the classifier scan + ONE hash aggregate on source
    * (|sources| rows) + a 1-row corpus total cross-joined in (the
    * q_tfidf broadcast shape). */
  def domainMixKl(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, numDomains: Int = 4, dim: Int = 64): DataFrame = {
    val dc = domainClassify(docs, textCol, idCol, numDomains, dim)
      .select(col("doc_id"), col("domain"))
    val joined = dc.join(
      docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source")),
      "doc_id")
    def domCounts(p: String) = (0 until numDomains).map(d =>
      sum(when(col("domain") === d.toLong, 1L).otherwise(0L)).as(s"$p$d"))
    val bySrc = joined.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), domCounts("n"): _*)
    val corpus = broadcast(joined
      .agg(count(lit(1)).as("nt"), domCounts("t"): _*))
    val klTerms = (0 until numDomains).map { d =>
      val p = col(s"n$d") * lit(1.0) / col("n_docs")
      val q = col(s"t$d") * lit(1.0) / col("nt")
      when(col(s"n$d") > 0L, p * log(p / q)).otherwise(lit(0.0))
    }
    bySrc.crossJoin(corpus)
      .select(col("source"), col("n_docs"),
        round(klTerms.reduce(_ + _), 6).as("kl"))
  }

  /** Content fingerprint: md5 over case/whitespace-normalized text —
    * the join key for exact dedup across differently-formatted copies.
    * Normalization is the native one-scan NormalizeText expression. */
  def fingerprint(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
      md5(graft.functions.NormalizeText.normalize(col(textCol))).as("fp"))

  /** Winnowing fingerprint (rolling k-gram hashes → sliding-window
    * minima, [[graft.functions.WinnowFingerprint]]): unlike [[fingerprint]]
    * this survives partial overlap — shared byte runs select shared grams
    * regardless of alignment, the standard copy-containment signal.
    * Emits the selected-hash set as a comma-joined string (harness-safe)
    * plus its size; docs shorter than k+w-1 bytes carry an empty set. */
  def winnowFingerprint(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val sel = graft.functions.WinnowFingerprint.winnow(col(textCol), k, w)
    docs.select(col(idCol),
      coalesce(array_join(transform(sel, _.cast("string")), ","), lit(""))
        .as("fp_set"),
      coalesce(size(sel).cast("long"), lit(0L)).as("n_grams"))
  }
}
