package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application — the
  * subword tokenization a trainer actually consumes (whitespace token
  * counts over-estimate rare words and under-estimate agglutinative
  * text; packing/mixing budgets keyed on them drift from real model
  * cost). Pure DataFrame algebra, deterministic on any engine:
  *
  *  - TRAIN runs over the DISTINCT-WORD vocabulary with frequencies,
  *    not the corpus: Heaps' law keeps |vocab| strongly sublinear in
  *    corpus size, so at 100 TB the iterative part touches millions
  *    of rows while the corpus is read ONCE for the frequency count
  *    (and in production the freq count itself runs on a sample —
  *    BPE statistics converge long before 100 TB).
  *  - One merge round = (a) adjacent-pair counts, freq-weighted
  *    (partial agg, vocab-sized shuffle), (b) argmax pair — count
  *    DESC, then lexicographic (lhs, rhs), a 1-row broadcast,
  *    (c) GREEDY NON-OVERLAPPING merge of that pair in every word:
  *    runs of consecutive matches keep alternate positions
  *    (gaps-and-islands windows — "aaaa" under (a,a) becomes
  *    "aa aa", exactly Sennrich's left-to-right scan), then symbols
  *    renumber. Windows partition on the word key only.
  *  - APPLY to the corpus is a join of per-doc word counts against
  *    the trained vocab tokenization — the corpus shuffles once on
  *    the word key (or not at all when the vocab side broadcasts);
  *    the iterative machinery never sees a document row.
  *
  * Every step is expressible as identical SQL (unrolled CTEs, no
  * recursion): [[oracleCtes]] generates the DuckDB twin the
  * correctness gate runs, so the trained merge table itself is
  * hash-checked — not just spec'd.
  */
object Bpe {

  /** Longest word admitted to the pipeline. The cap is the skew
    * guard, not a modeling choice: every position of a word lands in
    * ONE word-partitioned window task, so a single pathological
    * "word" (a 100 MB no-whitespace document — 100 TB corpora
    * contain them) would otherwise serialize 8 merge rounds through
    * one task. 256 chars is far past natural-language word length
    * (identity on real corpora — the correctness gate's vocab tops
    * out well under it); over-cap tokens are EXCLUDED, identically
    * in the oracle, not truncated (a truncated token would collide
    * with a real word and corrupt its pair counts). */
  val MaxWordLen = 256

  /** tokenization shared with [[TextAnalysis.tokens]] (lower +
    * space-split) minus empty tokens and [[MaxWordLen]]-breakers:
    * (doc id, word) pairs. */
  def docWords(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), explode(split(lower(col(text)), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= MaxWordLen)

  /** (word, freq) vocabulary of the corpus — the only corpus-sized
    * pass in training. */
  def wordFreq(docs: DataFrame, id: String, text: String): DataFrame =
    docWords(docs, id, text).groupBy("word").agg(count(lit(1)).as("freq"))

  /** initial symbol table: one row per (word, position), symbols are
    * single characters. (word, freq, pos, sym). */
  private def initSyms(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("freq"),
      explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("freq"), col("pos").cast("long").as("pos"),
        col("word").substr(col("pos"), lit(1)).as("sym"))

  private val wWord = Window.partitionBy("word").orderBy("pos")

  /** apply ONE pair (lhs, rhs — plan-time literals) to a symbol
    * table with Sennrich left-to-right greedy semantics: in each run
    * of consecutive matches keep alternate positions (1st, 3rd, ...),
    * consume the follower, renumber. Shared by TRAINING rounds and
    * [[applyMerges]], so the two paths cannot drift — the
    * apply-reproduces-training property BpeSpec pins is structural,
    * not coincidental.
    *
    * Plan shape: the pair arrives as literals, so a round is PURE
    * WINDOW ALGEBRA over the one (word)-partitioned sort — lead,
    * a running "last unmatched position" max (whose distance gives
    * the 1-based index inside a run of consecutive matches; odd =
    * merge start, the islands arithmetic without materializing
    * islands), a lag to drop consumed followers, and the renumber.
    * All four window passes share wWord's partitioning+ordering, so
    * EnsureRequirements inserts NO exchange and NO sort between
    * them; the previous form joined a broadcast best-pair table and
    * then self-joined starts back twice on (word, pos) — 3 joins and
    * their exchanges per round, every round. */
  private def applyPair(syms: DataFrame, lhs: String, rhs: String): DataFrame = {
    val wRun = wWord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    syms.withColumn("nxt", lead("sym", 1).over(wWord))
      .withColumn("m", col("sym") === lit(lhs) && col("nxt") === lit(rhs))
      // greatest pos at-or-before this row whose pair does NOT match:
      // for a matched row, pos - lastNo is its 1-based index within
      // its run of consecutive matches (runs start right after an
      // unmatched position, or at pos 1 where lastNo is NULL -> 0)
      .withColumn("lastNo",
        max(when(!col("m"), col("pos"))).over(wRun))
      .withColumn("st", col("m") &&
        pmod(col("pos") - coalesce(col("lastNo"), lit(0L)), lit(2)) === 1)
      // a merge start consumes its follower
      .withColumn("cons", lag("st", 1, false).over(wWord))
      .filter(!col("cons"))
      .select(col("word"), col("freq"), col("pos"),
        when(col("st"), concat(col("sym"), col("nxt"))).otherwise(col("sym"))
          .as("sym"))
      .withColumn("pos", row_number().over(wWord).cast("long"))
      .localCheckpoint(true)
  }

  /** one greedy merge round: the argmax pair — count DESC, then
    * lexicographic (lhs, rhs) — is a LIMIT 1 over the vocab-pair
    * aggregate; its single row is collected (planning-metadata-sized:
    * one row, two short strings) so the merge applies as literals.
    * Returns None when the corpus's pairs are exhausted. */
  private def bestPair(syms: DataFrame): Option[(String, String)] = {
    val n = syms.withColumn("nxt", lead("sym", 1).over(wWord))
    n.filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("lhs"), col("nxt").as("rhs"))
      .agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1)
      .select(col("lhs"), col("rhs"))
      .collect().headOption.map(r => (r.getString(0), r.getString(1)))
  }

  /** tokenize ARBITRARY words with an already-trained merge table —
    * the production 100 TB shape: [[train]] runs once on a SAMPLE
    * (or one corpus snapshot), the merge table (a few thousand tiny
    * rows) ships everywhere, and new text tokenizes without touching
    * the trainer. Merges apply in rank order with the training
    * round's own [[applyPair]]; a word never seen in training still
    * tokenizes (to characters, or to whatever trained subwords its
    * spans recombine — standard BPE open-vocabulary behavior).
    * Input: distinct (word) rows; returns (word, n_tok). */
  def applyMerges(words: DataFrame, merges: DataFrame,
      nMerges: Int): DataFrame = {
    // the merge table is nMerges tiny rows (the trained artifact a
    // serving tier ships everywhere) — one driver read, then every
    // round applies as plan literals
    val table = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    var syms = initSyms(words.select(col("word"), lit(1L).as("freq")))
      .localCheckpoint(true)
    (1 to nMerges).foreach { r =>
      table.get(r.toLong).foreach { case (l, rr) =>
        syms = applyPair(syms, l, rr)
      }
    }
    syms.groupBy("word").agg(count(lit(1)).as("n_tok"))
  }

  /** train `nMerges` rounds; returns (merges: (merge_rank, lhs, rhs),
    * vocabTok: (word, n_tok) — each vocab word's trained token
    * count). A corpus whose pairs exhaust early yields fewer than
    * `nMerges` rows, never a throw. */
  def train(docs: DataFrame, id: String, text: String,
      nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var syms = initSyms(wordFreq(docs, id, text)).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[
      (Long, String, String)]
    var exhausted = false
    (1 to nMerges).foreach { r =>
      if (!exhausted) bestPair(syms) match {
        case Some((l, rr)) =>
          merges += ((r.toLong, l, rr))
          syms = applyPair(syms, l, rr)
        case None =>
          // pairs exhausted: no further round can produce one (a
          // merge never splits symbols), matching the old empty-best
          // no-op rounds without paying their jobs
          exhausted = true
      }
    }
    import spark.implicits._
    val mergeTable = merges.toSeq.toDF("merge_rank", "lhs", "rhs")
    val vocabTok = syms.groupBy("word").agg(count(lit(1)).as("n_tok"))
    (mergeTable, vocabTok)
  }

  /** per-document BPE token counts under a trained vocab: total over
    * the doc's words of each word's trained token count; docs with no
    * words (empty/NULL text) count 0 rather than vanishing. */
  def docTokens(docs: DataFrame, id: String, text: String,
      vocabTok: DataFrame): DataFrame = {
    val wc = docWords(docs, id, text).groupBy(col(id), col("word"))
      .agg(count(lit(1)).as("c"))
    docs.select(col(id))
      .join(wc.join(vocabTok, Seq("word"))
        .groupBy(col(id)).agg(sum(col("c") * col("n_tok")).as("t")),
        Seq(id), "left")
      .select(col(id), coalesce(col("t"), lit(0L)).as("n_tok"))
  }

  /** The DuckDB twin of [[train]] — `nMerges` unrolled CTE rounds of
    * the identical arithmetic (same tie-breaks, same islands), ending
    * with symbol table `s<nMerges>` and merge-pair CTEs `b1..b<n>`.
    * Prefix for the t14/t15 oracle queries. */
  def oracleCtes(nMerges: Int): String = {
    val rounds = (0 until nMerges).map { i =>
      s"""n$i AS MATERIALIZED (SELECT word, freq, pos, sym,
           lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM s$i),
    b${i + 1} AS MATERIALIZED (SELECT lhs, rhs FROM (
           SELECT sym AS lhs, nxt AS rhs, sum(freq) AS cnt FROM n$i
           WHERE nxt IS NOT NULL GROUP BY sym, nxt)
         ORDER BY cnt DESC, lhs, rhs LIMIT 1),
    m$i AS MATERIALIZED (SELECT n.word, n.pos FROM n$i n
         JOIN b${i + 1} b ON n.sym = b.lhs AND n.nxt = b.rhs),
    st$i AS MATERIALIZED (SELECT word, pos FROM (
           SELECT word, pos, row_number() OVER (PARTITION BY word, grp
             ORDER BY pos) AS rn2
           FROM (SELECT word, pos,
                   pos - row_number() OVER (PARTITION BY word ORDER BY pos)
                     AS grp FROM m$i))
         WHERE rn2 % 2 = 1),
    s${i + 1} AS MATERIALIZED (SELECT word, freq,
           CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT)
             AS pos,
           CASE WHEN spos IS NOT NULL THEN sym || nxt ELSE sym END AS sym
         FROM (SELECT n.word, n.freq, n.pos, n.sym, n.nxt,
                 a.pos AS spos, c.pos AS cpos
               FROM n$i n
               LEFT JOIN st$i a ON n.word = a.word AND n.pos = a.pos
               LEFT JOIN st$i c ON n.word = c.word AND n.pos = c.pos + 1)
         WHERE cpos IS NULL)"""
    }.mkString(",\n    ")
    s"""dwords AS MATERIALIZED (SELECT doc_id, w AS word FROM (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           FROM documents) WHERE w <> '' AND length(w) <= $MaxWordLen),
    vocab AS MATERIALIZED (SELECT word, count(*) AS freq FROM dwords GROUP BY word),
    s0 AS MATERIALIZED (SELECT word, freq, CAST(t.pos AS BIGINT) AS pos,
           substr(word, CAST(t.pos AS INT), 1) AS sym
         FROM vocab, unnest(generate_series(1, length(word))) AS t(pos)),
    $rounds"""
  }
}
