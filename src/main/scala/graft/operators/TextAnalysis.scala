package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines
  * (SURVEY §2 C): language-ID, quality scoring, token counting,
  * fingerprinting. All pure column expressions (whole-stage
  * codegen'd, no UDFs) — at 100 TB these run scan-local with zero
  * shuffle except the langid lexicon broadcast join.
  */
object TextAnalysis {

  /** tiny function-word lexicon for n-gram/stopword language ID */
  val lexicon: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "and" -> "en", "of" -> "en", "to" -> "en",
    "el" -> "es", "la" -> "es", "de" -> "es", "que" -> "es", "y" -> "es",
    "der" -> "de", "die" -> "de", "und" -> "de", "ist" -> "de", "das" -> "de",
    "le" -> "fr", "les" -> "fr", "et" -> "fr", "des" -> "fr", "un" -> "fr",
    "shi" -> "zh", "bu" -> "zh", "wo" -> "zh", "ni" -> "zh", "ta" -> "zh")

  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  /** the stopword membership predicate over a lambda variable `w` —
    * the ONE SQL text the Spark filter expressions ([[quality]]) and
    * every DuckDB oracle (t2, d18) derive from, so the score
    * definition cannot drift between engines or queries */
  val stopPredSql: String = stopwords.map(w => s"w = '$w'").mkString(" OR ")

  def tokens(text: Column): Column = split(lower(text), " ")

  /** Language ID: explode tokens, broadcast-join the lexicon, argmax
    * votes per doc (ties broken by language code). Docs with no
    * lexicon hit → "und". */
  def langId(docs: DataFrame, id: String, text: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.toDF("w", "lex_lang"))
    val toks = docs.select(col(id), explode(tokens(col(text))).as("w"))
    val scored = toks.join(lex, "w").groupBy(col(id), col("lex_lang"))
      .agg(count(lit(1)).as("score"))
    val best = scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(id))
          .orderBy(col("score").desc, col("lex_lang"))))
      .filter(col("rn") === 1).drop("rn")
    docs.select(col(id)).join(best, Seq(id), "left_outer")
      .select(col(id), coalesce(col("lex_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** arithmetic round-half-up — pure IEEE ops, bit-identical in any
    * engine when the oracle uses the same expression text */
  private[operators] def roundA(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }

  /** Quality features: token count, stopword ratio, mean word length,
    * composite score. Ratios are exact-int quotients in double with
    * arithmetic 4dp rounding → DOUBLE outputs, bit-stable in any
    * engine (DECIMAL outputs stringify reader-dependently). */
  def quality(docs: DataFrame, id: String, text: String): DataFrame = {
    val nTok = size(tokens(col(text))).cast("long")
    val stopCnt =
      expr(s"cast(size(filter(split(lower($text), ' '), w -> $stopPredSql)) as long)")
    docs.select(col(id), nTok.as("n_tok"), stopCnt.as("stop_cnt"),
        octet_length(col(text)).as("nbytes"))
      .select(col(id), col("n_tok"), col("stop_cnt"),
        roundA((col("nbytes") - col("n_tok") + 1) * 1.0 / col("n_tok"), 4).as("avg_wlen"),
        roundA(col("stop_cnt") * 1.0 / col("n_tok"), 4).as("stop_ratio"),
        roundA(least(lit(1.0), col("n_tok") / 100.0) * 0.5 +
          (col("stop_cnt") * 1.0 / col("n_tok")) * 0.5, 4).as("score"))
  }

  /** Token counting: whitespace tokens, a bytes/4 estimate, and a
    * BPE-ish estimate (long words count double). */
  def tokenCount(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
      size(tokens(col(text))).cast("long").as("ws_tokens"),
      ceil(octet_length(col(text)) / 4.0).cast("long").as("char_est"),
      (size(tokens(col(text))) +
        expr(s"size(filter(split(lower($text), ' '), w -> length(w) > 6))"))
        .cast("long").as("bpe_est"))
      .withColumn("tok_est", greatest(col("ws_tokens"), col("char_est")))

  /** Per-group top-k term frequencies (corpus vocabulary profile):
    * explode tokens → partial-agg count per (group, term) → window
    * top-k over the (small) aggregate. At 100 TB the shuffle carries
    * only (group, term, partial count) rows — never documents. */
  def topTerms(docs: DataFrame, group: String, text: String, k: Int): DataFrame = {
    val counts = docs
      .select(col(group), explode(tokens(col(text))).as("w"))
      .groupBy(col(group), col("w")).agg(count(lit(1)).as("n"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("n").desc, col("w"))
    counts.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select(col(group), col("rn"), col("w"), col("n"))
  }

  /** Document fingerprint: md5 of the casefolded, punctuation-stripped,
    * space-collapsed canonical form. */
  def fingerprint(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
      md5(trim(regexp_replace(regexp_replace(lower(col(text)),
        "[^a-z0-9 ]", ""), " +", " ")).cast("binary")).as("fp"))

  /** Repetition metrics (Gopher-style quality filters): per document,
    * total tokens, distinct tokens, the modal token's count, and the
    * derived duplicate-token ratio (1 - uniq/total) and top-token
    * fraction — high values mark boilerplate/spam for removal before
    * training. Two partial-agg shuffles of narrow (id, token, count)
    * rows — never documents; at 100 TB this is the scalable form (an
    * in-array mode computation would be O(uniq x total) per row). */
  /** per-(doc, token-type) counts — the ONE exploded aggregate every
    * token-distribution signal ([[repetition]], [[entropy]], the
    * gated [[filterChain]]) derives from */
  private[operators] def perTokCounts(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), explode(tokens(col(text))).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("n"))

  private def dupRatioCol(nUniq: Column, nTok: Column): Column =
    roundA(lit(1.0) - nUniq * 1.0 / nTok, 4)
  private def topFracCol(topN: Column, nTok: Column): Column =
    roundA(topN * 1.0 / nTok, 4)
  /** one type's -p·ln p entropy term in micro fixed-point */
  private def entropyTermMicro(n: Column, nTok: Column): Column =
    floor(-(n / nTok) * log(n / nTok) * 1e6 + 0.5).cast("long")

  def repetition(docs: DataFrame, id: String, text: String): DataFrame =
    perTokCounts(docs, id, text).groupBy(col(id)).agg(
        sum("n").as("n_tok"), count(lit(1)).as("n_uniq"), max("n").as("top_n"))
      .select(col(id), col("n_tok"), col("n_uniq"), col("top_n"),
        dupRatioCol(col("n_uniq"), col("n_tok")).as("dup_ratio"),
        topFracCol(col("top_n"), col("n_tok")).as("top_frac"))

  /** Eval-set decontamination: for every non-eval document, the count
    * and fraction of its distinct word-3-gram digests that appear
    * ANYWHERE in the eval set — the standard benchmark-leakage check
    * run before training. The eval side (benchmarks are MBs, bounded)
    * collapses to ONE sorted distinct digest array broadcast to every
    * task; each train doc is then a single fused two-pointer merge
    * ([[graft.functions.SortedIntersectCount]]) against it — a
    * map-only pass over the corpus with no train-side shuffle and no
    * explode. */
  /** Composed quality-filter chain — the curation step that turns the
    * individual signals into one keep/drop decision with an
    * attributable reason (the shape of production corpus filters:
    * ordered rules, first failure wins, drop reasons audited per
    * stratum). Thresholds are arguments; the defaults fit the synthetic
    * corpus so both keeps and every drop reason occur in tests.
    * Built on [[repetition]]'s aggregates — same two narrow partial-agg
    * shuffles, then a pure codegen'd CASE; nothing new moves. */
  def filterChain(docs: DataFrame, id: String, text: String,
      minTokens: Long = 25, maxDupRatio: Double = 0.65,
      maxTopFrac: Double = 0.15, minEntropy: Double = 0.0): DataFrame = {
    // TOTAL over the input: a NULL-text doc would silently vanish from
    // the exploded aggregates (and so from the verdict table — unjudged
    // rather than dropped); coalescing to "" makes it one empty token
    // → too_short, so every input doc gets exactly one verdict
    val totalDocs = docs.withColumn(text, coalesce(col(text), lit("")))
    // the entropy gate ([[entropy]]'s H) is OFF at the default 0.0
    // (H >= 0 always, strict <). Gated ON, every signal still comes
    // from ONE exploded aggregate: the repetition stats move to a
    // window over the shared perTokCounts rows so the corpus is not
    // tokenized a second time for H (values identical to
    // repetition ⨝ entropy — same expressions, same rounding)
    val judged =
      if (minEntropy > 0) {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col(id))
        perTokCounts(totalDocs, id, text)
          .withColumn("n_tok", sum(col("n")).over(w))
          .withColumn("n_uniq", count(lit(1)).over(w))
          .withColumn("top_n", max(col("n")).over(w))
          .select(col(id), col("n_tok"), col("n_uniq"), col("top_n"),
            entropyTermMicro(col("n"), col("n_tok")).as("t_micro"))
          .groupBy(col(id), col("n_tok"), col("n_uniq"), col("top_n"))
          .agg(sum(col("t_micro")).as("h_micro"))
          .select(col(id), col("n_tok"),
            dupRatioCol(col("n_uniq"), col("n_tok")).as("dup_ratio"),
            topFracCol(col("top_n"), col("n_tok")).as("top_frac"),
            roundA(col("h_micro") / 1e6, 4).as("entropy"))
      } else repetition(totalDocs, id, text)
        .withColumn("entropy", lit(Double.MaxValue))
    judged.select(col(id),
      when(col("n_tok") < minTokens, "too_short")
        .when(col("dup_ratio") > maxDupRatio, "too_repetitive")
        .when(col("top_frac") > maxTopFrac, "top_heavy")
        .when(col("entropy") < minEntropy, "low_entropy")
        .otherwise("keep").as("verdict"))
  }

  /** symbol regex for [[gopher]]'s symbol-to-word rule: the hash mark
    * and the ellipsis (ASCII triple-dot or U+2026), the two symbol
    * classes the published rule names. `[.]` char classes keep the
    * pattern escape-free and identical across regex engines. */
  val gopherSymbolRe = "#|[.][.][.]|…"

  /** The Gopher document-quality rule set (Rae et al. 2021, app. A —
    * the published heuristic filter battery most shipped corpora
    * apply before training), as one map-only pass: per document,
    * word count bounds, mean-word-length bounds, symbol-to-word
    * ratio, alphabetic-word fraction, and a required minimum of
    * DISTINCT stopwords; the verdict applies the rules in the
    * published order, first failure wins (the [[filterChain]]
    * contract, so drop reasons are attributable).
    *
    * Every signal is a codegen'd column expression over the row's own
    * text (mean word length from byte arithmetic — single-space
    * tokenization means word chars = bytes - (words-1); stopword
    * presence as per-word `array_contains` terms, NOT a set
    * intersection, whose dedup semantics differ across engines). No
    * explode, no shuffle, no UDF: at 100 TB this is a pure scan
    * stage, and the same expressions apply unchanged to a streaming
    * ingest (the batch≡stream pin in StreamingSpec). NULL text
    * coalesces to "" → one empty token → `too_few_words`, so every
    * input row gets exactly one verdict (total, like
    * [[filterChain]]). */
  def gopher(docs: DataFrame, id: String, text: String,
      minWords: Long = 50, maxWords: Long = 100000,
      minWlen: Double = 3.0, maxWlen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStops: Int = 2): DataFrame = {
    val tx = coalesce(col(text), lit(""))
    val l = tokens(tx)
    val nWords = size(l).cast("long")
    val nStop = stopwords.map(w =>
      when(array_contains(l, w), 1).otherwise(0)).reduce(_ + _)
    docs.select(col(id), nWords.as("n_words"),
        octet_length(tx).as("nbytes"), tx.as("tx"), l.as("l"),
        nStop.cast("long").as("n_stop"))
      .select(col(id), col("n_words"),
        roundA((col("nbytes") - col("n_words") + 1) * 1.0 / col("n_words"), 4)
          .as("mean_wlen"),
        roundA(regexp_count(col("tx"), lit(gopherSymbolRe)) * 1.0 /
          col("n_words"), 4).as("symbol_ratio"),
        roundA(expr("size(filter(l, w -> w rlike '[a-z]'))") * 1.0 /
          col("n_words"), 4).as("alpha_frac"),
        col("n_stop"))
      .select(col(id), col("n_words"), col("mean_wlen"),
        col("symbol_ratio"), col("alpha_frac"), col("n_stop"),
        when(col("n_words") < minWords, "too_few_words")
          .when(col("n_words") > maxWords, "too_many_words")
          .when(col("mean_wlen") < minWlen, "words_too_short")
          .when(col("mean_wlen") > maxWlen, "words_too_long")
          .when(col("symbol_ratio") > maxSymbolRatio, "too_symbolic")
          .when(col("alpha_frac") < minAlphaFrac, "non_alpha")
          .when(col("n_stop") < minStops, "no_stopwords")
          .otherwise("keep").as("verdict"))
  }

  /** TF-IDF top-k terms per document — the classic per-doc keyword /
    * feature-extraction operator (the retrieval-side complement of
    * [[topTerms]]'s corpus profile). idf = ln(N/df) over DISTINCT
    * doc frequency; each term scores tf·idf in MICRO fixed-point
    * longs (t10's determinism rule — the ranking and the hash check
    * never touch a float), rank ties break on the term.
    *
    * Scale shape: one partial-agg of (id, term, tf) rows; df comes
    * from a COUNT WINDOW over those same aggregated rows partitioned
    * on the term (the t11 rule — a separate df aggregate re-joined on
    * the term key would re-scan the corpus; the window shuffles the
    * same narrow rows once on w, AQE skew-split covers hot function
    * words), then a per-doc top-k window over ≤|doc vocab| narrow
    * rows. Documents never shuffle; N is a SCALAR AGGREGATE broadcast
    * back into the plan (the q34 bounds shape) — not a driver-side
    * `docs.count()` action, which ran a separate corpus-scanning job
    * before the tf pass even started (the VERDICT-r9 finding; this
    * was the only operator with a mid-build driver action). The N
    * scan is column-pruned to nothing (footer row counts), so the
    * plan's second "scan" costs metadata only. */
  def tfidfTopTerms(docs: DataFrame, id: String, text: String,
      k: Int = 5): DataFrame = {
    val nd = docs.agg(count(lit(1)).cast("double").as("__nd"))
    val tf = perTokCounts(docs, id, text).withColumnRenamed("n", "tf")
    val dfw = org.apache.spark.sql.expressions.Window.partitionBy(col("w"))
    val scored = tf.withColumn("df", count(lit(1)).over(dfw))
      .crossJoin(broadcast(nd))
      .select(col(id), col("w"), col("tf"), col("df"),
        floor(col("tf") * log(col("__nd") / col("df")) * 1e6 + 0.5)
          .cast("long").as("score_micro"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("score_micro").desc, col("w"))
    scored.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select(col(id), col("rn"), col("w"), col("tf"), col("df"),
        col("score_micro"))
  }

  /** BM25 "more-like-this" LEXICAL RETRIEVAL — the keyword-ranking
    * operator class (Robertson/Spärck Jones; the lexical half of
    * every hybrid-search deployment next to the ANN family): rank
    * every document against the query document's term set by
    * Okapi BM25 (k1, b), excluding the query doc itself. Per-(doc,
    * matched-term) scores quantize to MICRO fixed-point longs BEFORE
    * the per-doc sum (t10's determinism rule — ln differs ≤1 ulp
    * across libms, orders under the grid; the integer sum is
    * summation-order-free), so ranking and hash are engine-stable.
    *
    * Scale shape: ONE corpus tokenize/aggregate pass (tf is
    * registry-persisted — [[Dedup.registerPersisted]] — because four
    * derivations reference it: doc lengths, the corpus token total,
    * the query term set, and the matched rows; unpersisted, the plan
    * re-scans the corpus per consumer, the d24 lesson); the query
    * term set and its df table are broadcast dims; N and Σdl are
    * 1-row broadcast scalar aggregates (the t17 shape — no mid-build
    * driver action); the final top-k is a TakeOrdered. Only matched
    * (doc, term) rows — |query terms| columns of the posting list —
    * ever join, never the full tf relation. */
  def bm25MoreLikeThis(docs: DataFrame, id: String, text: String,
      queryId: Long, k: Int = 20, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val tf = graft.operators.Dedup.registerPersisted(
      perTokCounts(docs, id, text).withColumnRenamed("n", "tf"))
    val dl = tf.groupBy(col(id)).agg(sum(col("tf")).cast("double").as("dl"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val sumdl = tf.agg(sum(col("tf")).as("sumdl"))
    val qt = tf.filter(col(id) === queryId).select(col("w")).distinct()
    val mtf = tf.join(broadcast(qt), Seq("w"))
    val dfT = mtf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // expression structure mirrors the oracle TOKEN FOR TOKEN (same
    // IEEE op order → bit-identical doubles before the one floor)
    val scored = mtf.join(broadcast(dfT), Seq("w"))
      .join(dl, Seq(id))
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(sumdl))
      .filter(col(id) =!= queryId)
      .select(col(id),
        floor(log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
            (col("sumdl") * 1.0 / col("n")))) * 1000000.0 + 0.5)
          .cast("long").as("s_micro"))
    scored.groupBy(col(id))
      .agg(sum(col("s_micro")).as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col(id)).limit(k)
  }

  /** PII patterns shared by the operator and its SQL oracle. The
    * subset of regex syntax used (char classes, bounded repeats, \b,
    * \.) means Java regex (Spark) and RE2 (DuckDB, Go/Rust engines)
    * match identically — no lookarounds, no backrefs, nothing
    * engine-specific. */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIp = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val piiPhone = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  /** card-shaped digit runs (4-4-4-{1,4}, optional space/dash
    * separators). A match is only REDACTED when
    * [[graft.functions.LuhnValid]] confirms the mod-10 checksum —
    * regex alone would redact every 16-digit order/tracking id. */
  val piiCc = "\\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{1,4}\\b"

  /** the ONE ordered rule list both [[scrubPii]] and
    * [[scrubbedText]] derive from — order is semantics (each class
    * counts matches on the previous class's output); the
    * checksum-gated credit-card rule runs LAST, on the output of the
    * regex rules ([[ccScrub]]) */
  val piiRules: Seq[(String, String)] =
    Seq(piiEmail -> "<EMAIL>", piiIp -> "<IP>", piiPhone -> "<PHONE>")

  /** Luhn-verified matches of [[piiCc]] in `c` — the VALIDATED
    * candidates only, in match order. */
  def ccMatches(c: Column): Column =
    filter(regexp_extract_all(c, lit(piiCc), lit(0)),  // idx 0: whole match
      m => graft.functions.LuhnValid.luhn_valid(m))

  /** redact every Luhn-verified card match — conditional replacement,
    * which regexp_replace cannot express: the validated match list is
    * folded over the text with literal replaces. The fold is an HOF
    * (interpreted), but it iterates the MATCH list — empty for the
    * overwhelming majority of rows — never the text. */
  def ccScrub(c: Column): Column =
    aggregate(ccMatches(c), c, (acc, m) => replace(acc, m, lit("<CC>")))

  /** the chained replacement as one column — the form a pipeline uses
    * to scrub text in place ([[Curation]]'s pii_scrub stage) */
  def scrubbedText(c: Column): Column =
    ccScrub(piiRules.foldLeft(c) { case (s, (p, r)) => regexp_replace(s, p, r) })

  /** PII scrub — the redaction pass every shipped training corpus
    * runs (emails, phone numbers, IP addresses, credit cards → typed
    * placeholder tokens). Patterns apply in a FIXED order
    * (email → ip → phone → card, each counting matches on the
    * previous stage's output) so counts are well-defined when classes
    * could overlap on a dotted digit run. The card class is
    * checksum-gated: only [[ccMatches]] (Luhn-verified) candidates
    * count and redact. Pure codegen'd column expressions plus the
    * match-list fold: at 100 TB this is a map-only scan stage, no
    * shuffle, no UDF. A NULL text passes through as NULL counts +
    * NULL clean text (total like every per-doc scorer). */
  def scrubPii(docs: DataFrame, id: String, text: String): DataFrame = {
    // stages(k) = text after the first k rules; class k's count is
    // taken on stages(k), so counts and replacements can never drift
    val stages = piiRules.scanLeft(col(text)) {
      case (s, (p, r)) => regexp_replace(s, p, r)
    }
    docs.select(col(id),
      regexp_count(stages(0), lit(piiEmail)).cast("long").as("n_email"),
      regexp_count(stages(1), lit(piiIp)).cast("long").as("n_ip"),
      regexp_count(stages(2), lit(piiPhone)).cast("long").as("n_phone"),
      size(ccMatches(stages(3))).cast("long").as("n_cc"),
      ccScrub(stages(3)).as("text_clean"))
  }

  def contamination(docs: DataFrame, id: String, text: String,
      isEval: Column): DataFrame =
    contaminationAgainst(docs.filter(!isEval), docs.filter(isEval),
      id, text)

  /** Corpus-trained bigram language-model scoring — the perplexity
    * quality filter (CCNet/Gopher-style: score every document by how
    * "expected" its word sequences are under a model of the corpus
    * itself; outliers at either tail are spam/boilerplate/garble
    * candidates). Self-contained: the LM IS the corpus's own bigram
    * table — no external model file.
    *
    * Model: Laplace-smoothed bigram MLE. With c12(w1,w2) = corpus
    * bigram count, c1(w1) = Σ_w2 c12(w1,w2) (the context count, so
    * the conditional sums to 1 by construction) and V = corpus
    * unigram vocabulary size, each bigram scores
    * ln((c12 + 1) / (c1 + V)).
    *
    * Determinism across engines: a per-doc avg of doubles is
    * summation-order-dependent, so each bigram's log-prob is rounded
    * half-up to MICRO units and cast to long FIRST; the per-doc sum
    * is then exact integer arithmetic (order-free), and only the
    * final avg_ll is a (4dp-rounded) double. ln() differs by ≤1 ulp
    * across IEEE libms — 10 orders below the 1e-6 grid.
    *
    * Scale shape: bigram extraction is a map-only arrays_zip over the
    * pre-split token array (codegen'd — no HOF lambda, no self-join);
    * c12/c1/V are partial-agg shuffles of narrow (w1,w2,count) rows;
    * the score join is a standard fact-dim shuffle join on the bigram
    * key (dim side = one row per DISTINCT bigram; AQE skew-split
    * covers hot function-word bigrams), with V broadcast as one row.
    * Nothing ever shuffles documents. Total over the input: docs with
    * <2 tokens (or NULL text) get n_bigrams=0, ll_micro=0,
    * avg_ll=NULL — scored "no evidence", never silently dropped. */
  /** Token-distribution entropy per document — the information-theoretic
    * complement of [[repetition]]'s ratio signals: H = -Σ p·ln p over
    * the doc's token-type distribution, low for boilerplate/spam
    * (mass concentrated on few types), ≈ln(n_uniq) for varied text.
    * Per-type terms are rounded half-up to MICRO units and summed as
    * longs (order-free → engine-deterministic, t10's rule); only the
    * final entropy is a rounded double. Same two narrow partial-agg
    * shuffles as [[repetition]] plus one fact-dim join of per-type
    * counts against per-doc totals — never documents. Total over the
    * input: NULL-text docs report n_tok=0 and NULL entropy. */
  def entropy(docs: DataFrame, id: String, text: String): DataFrame = {
    // per-doc totals via a WINDOW over the already-aggregated type
    // rows (the d12 rule: not a second agg + join, which would run
    // the corpus explode+combine twice) — one extra narrow shuffle of
    // (id, w, n) rows instead of a second pass over the documents
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(id))
    val h = perTokCounts(docs, id, text)
      .withColumn("n_tok", sum(col("n")).over(w))
      .withColumn("n_uniq", count(lit(1)).over(w))
      .select(col(id), col("n_tok"), col("n_uniq"),
        entropyTermMicro(col("n"), col("n_tok")).as("t_micro"))
      .groupBy(col(id), col("n_tok"), col("n_uniq"))
      .agg(sum(col("t_micro")).as("h_micro"))
    docs.select(col(id)).join(h, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("n_uniq"), lit(0L)).as("n_uniq"),
        coalesce(col("h_micro"), lit(0L)).as("h_micro"),
        roundA(col("h_micro") / 1e6, 4).as("entropy"))
  }

  /** the (w1, w2) bigram structs of a pre-split token array — a
    * codegen'd arrays_zip over two slices (no HOF lambda, no
    * positional self-join); <2-token arrays yield an empty zip */
  def bigramPairs(tk: Column): Column =
    arrays_zip(slice(tk, lit(1), size(tk) - 1),
      slice(tk, lit(2), size(tk) - 1))

  /** the ONE per-bigram Laplace log-prob expression (micro-unit
    * fixed-point long) batch [[lmScore]] and the streaming twin
    * ([[graft.streaming.EventStreams.lmScoreStream]]) both use —
    * shared so the two can never drift */
  def lpMicro(n12: Column, n1: Column, vs: Column): Column =
    floor(log((n12 + 1.0) / (n1 + vs)) * 1e6 + 0.5).cast("long")

  /** the trained bigram LM as three tables: c12 = (w1, w2, n12)
    * bigram counts, c1 = (w1, n1) context counts (Σ_w2 n12, so the
    * conditional sums to 1), v = the 1-row unigram vocabulary size.
    * Pure aggregates of narrow token rows — at 100 TB two partial-agg
    * shuffles plus a global count-distinct. */
  def lmModel(docs: DataFrame, text: String): (DataFrame, DataFrame, DataFrame) = {
    val toks = docs.select(tokens(col(text)).as("tk"))
    val bg = toks.select(explode(bigramPairs(col("tk"))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
    val v = toks.select(explode(col("tk")).as("w"))
      .agg(count_distinct(col("w")).as("vs"))
    (c12, c1, v)
  }

  def lmScore(docs: DataFrame, id: String, text: String): DataFrame = {
    val (c12, c1, v) = lmModel(docs, text)
    val bg = docs.select(col(id),
        explode(bigramPairs(tokens(col(text)))).as("p"))
      .select(col(id), col("p.0").as("w1"), col("p.1").as("w2"))
    val lp = bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col(id),
        lpMicro(col("n12"), col("n1"), col("vs")).as("lp_micro"))
    val agg = lp.groupBy(col(id)).agg(
      count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("ll_micro"))
    docs.select(col(id)).join(agg, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ll_micro"), lit(0L)).as("ll_micro"),
        roundA(col("ll_micro") / 1e6 / col("n_bigrams"), 4).as("avg_ll"))
  }

  /** DSIR-style importance weighting for data selection (the hashed
    * n-gram importance-resampling method of Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): fit
    * bucket distributions of hashed bigram features over a TARGET
    * (in-domain) slice and the RAW corpus, then weight every doc by
    * Σ_features log(p_target/p_raw) — docs that look like the target
    * domain score positive and are kept. Laplace-smoothed over a
    * FIXED feature space of `buckets` hashed cells, so both
    * distributions are bounded tables no matter the corpus size.
    *
    * Determinism: features hash through the portable fold48(md5)
    * (identical in Spark and DuckDB), each log term is a micro-unit
    * fixed-point long BEFORE the per-doc sum (t10's rule), so the
    * whole fit→weight path hash-checks against the oracle; only the
    * per-feature average is a rounded double.
    *
    * Scale shape: the bucket log-ratio table is ≤ `buckets` rows —
    * fit is a map-side partial agg into a fixed-width table, and
    * scoring joins it BROADCAST: the corpus never shuffles except
    * the one per-doc sum. At 100 TB this is two linear passes
    * (count buckets, score docs) with fixed-size intermediate state
    * — the property that makes DSIR the production data-selection
    * method at pre-training scale. */
  def dsirWeights(docs: DataFrame, id: String, text: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    val bk = dsirBuckets(docs, id, text, Some(isTarget), buckets)
    dsirScoreBuckets(docs, id, bk, dsirRatioOf(bk, buckets))
  }

  /** the hashed-bigram feature rows (one per doc × feature
    * occurrence): feature hashing through the NATIVE n-gram digest
    * (same values as the oracle's instr-fold of
    * md5(w1 || ' ' || w2) — the interpreted-HOF/expr chain was 3×
    * the wall); 48-bit fold is nonnegative, so % is already a total
    * bucket map. */
  private def dsirBuckets(docs: DataFrame, id: String, text: String,
      isTarget: Option[Column], buckets: Int): DataFrame =
    docs.select(Seq(col(id)) ++
        isTarget.map(_.as("__tgt")).toSeq :+
        explode(graft.functions.TextHashes.ngram_hash48(
          tokens(col(text)), 2)).as("h"): _*)
      .withColumn("b", col("h") % buckets).drop("h")

  /** the FITTED log-ratio table — ≤ `buckets` rows of
    * (b, lr_micro), the entire model state of the DSIR selector.
    * Frozen and broadcast, it scores any corpus — including a
    * STREAM: the scoring stage is stateless map-only, so the 26th
    * streaming seat ([[graft.streaming.EventStreams]]) reuses it
    * per micro-batch against this same frozen table. */
  def dsirRatio(docs: DataFrame, id: String, text: String,
      isTarget: Column, buckets: Int = 4096): DataFrame =
    dsirRatioOf(dsirBuckets(docs, id, text, Some(isTarget), buckets),
      buckets)

  private def dsirRatioOf(bk: DataFrame, buckets: Int): DataFrame = {
    // cnt is ≤ `buckets` rows but costs a corpus pass — materialize
    // once (the q40 lineage rule) so tot/lr don't re-tokenize the
    // corpus: with it the whole fit+score path is two passes total
    val cnt = bk.groupBy(col("b")).agg(
        count(lit(1)).as("cq"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
      .localCheckpoint()
    val tot = cnt.agg(sum(col("cq")).as("nq"), sum(col("ct")).as("nt"))
    cnt.crossJoin(broadcast(tot)).select(col("b"),
      (floor(log((col("ct") + 1.0) / (col("nt") + buckets)) * 1e6 + 0.5)
          .cast("long") -
        floor(log((col("cq") + 1.0) / (col("nq") + buckets)) * 1e6 + 0.5)
          .cast("long")).as("lr_micro"))
  }

  /** score `docs` against a FROZEN log-ratio table (same output
    * schema as [[dsirWeights]]): one linear pass, the ratio table
    * joined broadcast. */
  def dsirScoreAgainst(docs: DataFrame, id: String, text: String,
      lr: DataFrame, buckets: Int = 4096): DataFrame =
    dsirScoreBuckets(docs, id,
      dsirBuckets(docs, id, text, None, buckets), lr)

  private def dsirScoreBuckets(docs: DataFrame, id: String,
      bk: DataFrame, lr: DataFrame): DataFrame = {
    val w = bk.join(broadcast(lr), Seq("b"))
      .groupBy(col(id)).agg(count(lit(1)).as("n_feat"),
        sum(col("lr_micro")).as("w_micro"))
    docs.select(col(id)).join(w, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("w_micro"), lit(0L)).as("w_micro"),
        roundA(col("w_micro") / 1e6 / col("n_feat"), 4).as("avg_lr"),
        (coalesce(col("w_micro"), lit(0L)) > 0).as("keep"))
  }

  /** [[contamination]] with the eval set as its own table — the usual
    * pipeline shape (benchmarks live in a separate, static table; the
    * train side may even be a STREAM: the eval array is a static
    * batch aggregate broadcast into a stateless map-only stage, so
    * the same code decontaminates on ingest). */
  def contaminationAgainst(train: DataFrame, evalDocs: DataFrame,
      id: String, text: String): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val evalArr = Dedup.shingleSets(evalDocs, id, text)
      .agg(array_sort(array_distinct(flatten(collect_list(col("sh")))))
        .as("__esh"))
    Dedup.shingleSets(train, id, text)
      .crossJoin(broadcast(evalArr))
      .select(col(id), size(col("sh")).cast("long").as("n_shingles"),
        sorted_intersect_count(col("sh"), col("__esh")).cast("long").as("n_hit"))
      // a doc too short to shingle leaks nothing: contam = 0.0, not
      // the 0/0 NaN (Spark) / decimal divide error (DuckDB) a bare
      // ratio produces — downstream `contam < threshold` keep rules
      // must see a judged value for EVERY doc
      .withColumn("contam",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(roundA(col("n_hit") * 1.0 / col("n_shingles"), 4)))
  }

  /** the j-th Bloom position of a 48-bit shingle digest column named
    * `dig`, as SQL text — fold48 of a salted md5, mod the filter
    * width. The Spark and DuckDB variants differ ONLY in cast
    * spelling (string vs VARCHAR, binary input vs text input);
    * the arithmetic is byte-identical, so each engine derives the
    * SAME deterministic positions (false positives included). */
  def bloomPosSpark(j: Int, mBits: Int): String =
    s"((${graft.queries.Text.fold48(
      s"md5(cast(concat('$j:', cast(dig as string)) as binary))")}) % $mBits)"
  def bloomPosDuck(j: Int, mBits: Int): String =
    s"((${graft.queries.Text.fold48(
      s"md5(concat('$j:', CAST(dig AS VARCHAR)))")}) % $mBits)"

  /** MEMORY-BOUNDED decontamination — [[contamination]]'s sketch
    * twin: the eval set is compressed into an `mBits`-wide Bloom
    * filter (k salted positions per shingle digest, bitmap as an
    * array of 32-bits-per-long words — shift ≤ 31 keeps the word
    * arithmetic inside every engine's signed-BIGINT range), so the
    * broadcast side is FIXED SIZE no matter how many benchmarks the
    * eval table accumulates — t6's exact digest array grows with the
    * eval set and is the term that breaks first when "the eval set"
    * is every public benchmark ever released. Membership tests are
    * k O(1) word probes per shingle (element_at + mask — never a
    * scan of the filter). One-sided error, and DETERMINISTIC: a
    * leaked shingle always hits (no false negatives — the guarantee
    * decontamination needs: a real leak is never missed), and the
    * false-positive rate is set by occupancy (mBits vs k·|eval
    * digests|); both engines compute identical positions, so the
    * exact same shingles false-positive in the oracle — the sketch
    * is hash-checkable, not just bounded. Train side: map-only over
    * (doc, digest) rows + one partial agg; documents never shuffle. */
  def bloomContamination(docs: DataFrame, id: String, text: String,
      isEval: Column, mBits: Int = 1 << 16, k: Int = 3): DataFrame =
    bloomContaminationAgainst(docs.filter(!isEval), docs.filter(isEval),
      id, text, mBits, k)

  /** [[bloomContamination]] with the eval set as its own table — the
    * [[contaminationAgainst]] shape: benchmarks live in a static
    * table, the train side may be a STREAM (the filter is one static
    * 1-row broadcast; probing is stateless map-only —
    * [[graft.streaming.EventStreams.bloomDecontamStream]] reuses the
    * SAME filter builder and probe core, pinned ≡ batch). */
  def bloomContaminationAgainst(train: DataFrame, evalDocs: DataFrame,
      id: String, text: String, mBits: Int = 1 << 16,
      k: Int = 3): DataFrame = {
    val shingled = Dedup.shingleSets(train, id, text)
      .select(col(id), size(col("sh")).cast("long").as("n_shingles"),
        explode_outer(col("sh")).as("dig"))
    bloomScore(shingled, bloomFilterOf(evalDocs, id, text, mBits, k),
      Seq(id), mBits, k)
  }

  /** the eval side as a standalone fixed-size filter: ONE row whose
    * `bloom` column is the mBits-wide bitmap (array of
    * 32-bits-per-long words) over the eval set's shingle digests. */
  def bloomFilterOf(evalDocs: DataFrame, id: String, text: String,
      mBits: Int, k: Int): DataFrame =
    bloomFilterOfDigests(Dedup.shingleSets(evalDocs, id, text)
      .select(explode(col("sh")).as("dig")), mBits, k)

  /** the same fixed-size bitmap over an ARBITRARY key set: `digs` is
    * one row per member with the key in a column named `dig` (any
    * type whose string form matches across engines — long ids and
    * 48-bit digests both qualify). This is the build side
    * [[graft.operators.RuntimeFilter.bloomReduce]] broadcasts as a
    * runtime join filter. */
  def bloomFilterOfDigests(digs: DataFrame, mBits: Int,
      k: Int): DataFrame = {
    require(mBits % 32 == 0, "mBits must fill whole 32-bit words")
    val spark = digs.sparkSession
    val nWords = mBits / 32
    val evalPos = digs
      .select(explode(array((0 until k)
        .map(j => expr(bloomPosSpark(j, mBits))): _*)).as("p"))
    val wordRows = evalPos
      .select((col("p") / 32).cast("long").as("idx"),
        expr("shiftleft(1L, cast(p % 32 as int))").as("b"))
      .groupBy(col("idx")).agg(bit_or(col("b")).as("w"))
    spark.range(nWords).toDF("idx")
      .join(wordRows, Seq("idx"), "left_outer")
      .select(col("idx"), coalesce(col("w"), lit(0L)).as("w"))
      .agg(expr("transform(array_sort(collect_list(struct(idx, w))), x -> x.w)")
        .as("bloom"))
  }

  /** the shared probe core: `shingled` carries (keyCols...,
    * n_shingles, dig — one row per shingle, dig NULL for a
    * zero-shingle doc); joins the broadcast 1-row filter, tests the
    * k word probes, and rolls up per key. Batch keys on the doc id;
    * the streaming twin keys on (id, ts) under its watermark — SAME
    * positions, SAME hit predicate, so the two cannot drift. */
  private[graft] def bloomScore(shingled: DataFrame, bloom: DataFrame,
      keyCols: Seq[String], mBits: Int, k: Int): DataFrame = {
    val keys = keyCols.map(col)
    val probes = shingled.crossJoin(broadcast(bloom))
    val withPos = probes.select(
      keys ++ Seq(col("n_shingles"), col("bloom"), col("dig")) ++
        (0 until k).map(j => expr(bloomPosSpark(j, mBits)).as(s"p$j")): _*)
    val hitJ = (0 until k).map { j =>
      (element_at(col("bloom"), (col(s"p$j") / 32).cast("int") + 1)
        .bitwiseAND(expr(s"shiftleft(1L, cast(p$j % 32 as int))")) =!= 0)
    }.reduce(_ && _)
    withPos
      .select(keys ++ Seq(col("n_shingles"),
        when(col("dig").isNull, lit(0L))
          .otherwise(when(hitJ, 1L).otherwise(0L)).as("hit")): _*)
      .groupBy(keys :+ col("n_shingles"): _*)
      .agg(sum(col("hit")).as("n_hit"))
      .select(keys ++ Seq(col("n_shingles"), col("n_hit"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(roundA(col("n_hit") * 1.0 / col("n_shingles"), 4))
          .as("contam")): _*)
  }

  /** the j-th Count-Min position of a token column named `w` — the
    * bloomPos arithmetic over a STRING key (salted md5 → fold48 →
    * mod width); Spark/DuckDB variants differ only in cast spelling. */
  def cmsPosSpark(j: Int, m: Int): String =
    s"((${graft.queries.Text.fold48(
      s"md5(cast(concat('$j:', w) as binary))")}) % $m)"
  def cmsPosDuck(j: Int, m: Int): String =
    s"((${graft.queries.Text.fold48(s"md5(concat('$j:', w))")}) % $m)"

  /** COUNT-MIN SKETCH heavy hitters — the frequency sketch
    * ([[bloomContamination]]'s counting sibling): token frequencies
    * summarized into a depth×width counter grid of FIXED size (the
    * sketch is k·m longs at ANY corpus size — the property that lets
    * a 100 TB stream keep frequency state in memory), estimates =
    * min over the k salted rows, then top-n terms by estimate. Held
    * RELATIONALLY: counters are (row, pos, count) rows built by one
    * partial agg over per-word positions, estimates come from a
    * fact-dim join back on (row, pos) + a min agg — no dense array,
    * no driver state. One-sided error (est ≥ true; collisions only
    * ADD — the true count column sits alongside so the overestimate
    * is visible) and deterministic: both engines derive identical
    * positions, so the oracle reproduces the exact same collisions
    * and the sketch output is hash-checked. Ranking ties break on
    * the term. */
  def cmsTopTerms(docs: DataFrame, id: String, text: String,
      width: Int = 16, depth: Int = 3, topN: Int = 10): DataFrame = {
    val tf = docs.select(explode(tokens(coalesce(col(text), lit(""))))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val wpos = tf.select(Seq(col("w"), col("n")) ++
      (0 until depth).map(j => expr(cmsPosSpark(j, width)).as(s"p$j")): _*)
    val posLong = wpos.select(col("w"), col("n"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("rw"), col(s"p$j").as("pos"))): _*)).as("rp"))
      .select(col("w"), col("n"), col("rp.rw").as("rw"),
        col("rp.pos").as("pos"))
    val ctr = posLong.groupBy(col("rw"), col("pos"))
      .agg(sum(col("n")).as("c"))
    posLong.join(ctr, Seq("rw", "pos"))
      .groupBy(col("w"), col("n")).agg(min(col("c")).as("est"))
      .select(col("w"), col("est"), col("n").as("n_true"))
      .orderBy(col("est").desc, col("w")).limit(topN)
  }

  /** Multinomial Naive Bayes classifier trained on the corpus's own
    * labels — the MODEL-BASED filtering operator class (real
    * pipelines score documents with trained classifiers: fastText
    * language ID, quality/edu-value classifiers) that the heuristic
    * battery ([[langId]], [[gopher]]) cannot represent. Training is
    * pure counting: per-label priors, per-(label, word) Laplace
    * log-likelihoods over the label's token total and the global
    * vocabulary size — every log-prob is a MICRO fixed-point long
    * via the t10 rule ([[lpMicro]] — the SAME smoothing arithmetic
    * as the bigram LM with (label,word) in place of (w1,w2)), so
    * scoring, argmax, and the oracle hash are all float-free.
    *
    * Scale shape: the model is three partial-agg shuffles of narrow
    * token rows (per-(label,word) counts, per-label totals, one
    * count-distinct) — at 100 TB the model itself is O(L·V), data-
    * independent. Scoring fans each (doc, word, count) row out by
    * the L-row broadcast label table (L is a CONSTANT factor, 5
    * here), LEFT-joins the (word,label) model on the word-bearing
    * equi-key (unseen pairs coalesce to the Laplace floor — no L×V
    * densification is ever materialized), and partial-aggs back to
    * (doc, label) scores. Documents never shuffle; the only wide
    * exchange carries (doc_id, word, label, count).
    *
    * Returns one row per input doc: predicted label, its score in
    * micro-units, and an is_match flag vs the training label (the
    * self-consistency accuracy signal). Ties break on label asc;
    * docs with no tokens in the vocabulary score prior-only. */
  def nbClassify(docs: DataFrame, id: String, text: String,
      label: String): DataFrame = {
    // ONE fact-table scan and ONE tokenize pass (the fuzzyPairs
    // one-pass rule): the slim (id, label) projection and the
    // exploded token table are each materialized once — unchecked,
    // the model counts, the vocab count, the priors, and the scoring
    // fan each re-derived them (6 scans, 3 tokenizations per call)
    val labeled = docs.select(col(id), col(label).as("lab"))
      .localCheckpoint(true)
    val tx = coalesce(col(text), lit(""))
    val tok = docs.select(col(id), explode(tokens(tx)).as("w"))
      .localCheckpoint(true)
    val cnt = tok.groupBy(col(id), col("w")).agg(count(lit(1)).as("c"))
    // model: (label, word) counts, per-label token totals, vocab size
    val wl = tok.join(labeled, Seq(id))
      .groupBy(col("lab"), col("w")).agg(count(lit(1)).as("n_wl"))
    val tot = wl.groupBy(col("lab")).agg(sum(col("n_wl")).as("tot_l"))
    val v = tok.agg(count_distinct(col("w")).as("vs"))
    val nd = labeled.agg(count(lit(1)).as("nd"))
    val priors = labeled.groupBy(col("lab"))
      .agg(count(lit(1)).as("n_l")).crossJoin(broadcast(nd))
      .select(col("lab"),
        floor(log(col("n_l") * 1.0 / col("nd")) * 1e6 + 0.5).cast("long")
          .as("prior_micro"))
    // score: fan (doc, word, count) by the L labels, Laplace via LEFT
    val ll = cnt.crossJoin(broadcast(tot))
      .join(wl, Seq("w", "lab"), "left_outer")
      .crossJoin(broadcast(v))
      .groupBy(col(id), col("lab"))
      .agg(sum(col("c") *
        lpMicro(coalesce(col("n_wl"), lit(0L)), col("tot_l"), col("vs")))
        .as("ll_micro"))
    val scored = labeled.select(col(id), col("lab").as("true_lab"))
      .crossJoin(broadcast(priors))
      .join(ll, Seq(id, "lab"), "left_outer")
      .select(col(id), col("lab"), col("true_lab"),
        (coalesce(col("ll_micro"), lit(0L)) + col("prior_micro"))
          .as("score_micro"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id))
      .orderBy(col("score_micro").desc, col("lab"))
    scored.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col(id), col("lab").as("pred_lab"), col("score_micro"),
        when(col("lab") === col("true_lab"), 1L).otherwise(0L)
          .as("is_match"))
  }
}
