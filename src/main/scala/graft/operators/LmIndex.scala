package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED BIGRAM LANGUAGE MODEL — the build-once/score-many
  * contract ([[graft.operators.VectorIndex]] / [[TextIndex]] /
  * [[DedupIndex]]) applied to the MODEL ARTIFACT the quality
  * pipeline trains: t10/t13/curate(ppl) re-train the Laplace bigram
  * LM from the corpus on every run, but a production perplexity
  * filter trains ONCE on a reference corpus and scores every later
  * batch/stream against that frozen model — this is that artifact.
  *
  * Tables under `dir`:
  *   - `bigrams` (w1, w2, n12, n1, vs) — (w1, w2)-clustered, with
  *     BOTH scoring denominators DENORMALIZED into every row: the
  *     context total n1 AND the vocabulary size vs. Scoring reads
  *     ONE table, so there is no cross-table consistency window for
  *     a crashed append to leave behind (two tables flipped
  *     separately could pair a new n12 with an old n1 and MIS-SCORE
  *     — the failure mode the inner-join-loses argument of
  *     [[TextIndex.append]] cannot cover for derived aggregates).
  *     vs rides the rows for the same reason: meta is written LAST
  *     (it is informational — stamp + convenience copies), so a
  *     score() racing an append's flip window must not pair the new
  *     n12/n1 counts with the OLD vocabulary size — with vs in the
  *     row, counts and vs flip in the same atomic table rename;
  *   - `vocab` (w) — the distinct unigram vocabulary (vs must be
  *     RECOMPUTABLE under append: |A's vocab ∪ B's| is not
  *     |A's| + |B's|);
  *   - `meta` (vs, text_col, stamp).
  *
  * Scoring is [[TextAnalysis.lpMicro]] — the ONE log-prob expression
  * batch t10, the streaming seat, and this index share — with the
  * counts read from parquet and `vs` a meta literal, so scores
  * against an index built on corpus C are BIT-IDENTICAL to inline
  * [[TextAnalysis.lmScore]] on C (LmIndexSpec pins it; t25's oracle
  * IS t10's SQL).
  *
  * [[append]] is EXACTLY a rebuild: counts are additive and the
  * vocabulary is a set union, so merging the count tables with a
  * batch's aggregates equals retraining on the union — the merge
  * rewrites VOCABULARY-sized tables, never the corpus, through the
  * staged-verify-flip discipline of the other indexes. */
object LmIndex {

  final case class Meta(vs: Long, textCol: String, stamp: String)

  def write(docs: DataFrame, text: String, dir: String,
      stamp: String = ""): Meta = {
    val spark = docs.sparkSession
    val (c12, _, _) = TextAnalysis.lmModel(docs, text)
    val vocab = docs.select(explode(TextAnalysis.tokens(col(text))).as("w"))
      .distinct()
    val (_, vs) = writeTables(spark, dir, c12, vocab)
    val mt = Meta(vs, text, stamp)
    writeMeta(spark, dir, mt)
    mt
  }

  /** Score docs against the FROZEN model — unseen bigrams/contexts
    * drop out of the inner joins exactly as unseen vocabulary does
    * in the inline form (a doc with no scorable bigram reports
    * n_bigrams = 0, judged-not-dropped). */
  def score(spark: SparkSession, dir: String, docs: DataFrame,
      id: String, text: String): DataFrame = {
    val c12 = spark.read.parquet(s"$dir/bigrams")
    // a model persisted by a pre-denormalization build carries no vs
    // column; fall back to meta.vs (the same value that build scored
    // with) instead of failing with an unresolved-column error — the
    // flip-window consistency argument below only applies to models
    // new enough to carry vs in the rows
    val c12v =
      if (c12.columns.contains("vs")) c12
      else c12.withColumn("vs", lit(readMeta(spark, dir).vs))
    val bg = docs.select(col(id),
        explode(TextAnalysis.bigramPairs(
          TextAnalysis.tokens(col(text)))).as("p"))
      .select(col(id), col("p.0").as("w1"), col("p.1").as("w2"))
    // vs from the ROW, not meta: the bigram table carries every
    // denominator, so the counts and the vocabulary size a score
    // pairs are always from one atomic snapshot of one table (a
    // concurrent append's flip can never mis-pair them); meta.vs is
    // the informational copy for callers that want it cheap
    val lp = bg.join(c12v, Seq("w1", "w2"))
      .select(col(id),
        TextAnalysis.lpMicro(col("n12"), col("n1"), col("vs"))
          .as("lp_micro"))
    val agg = lp.groupBy(col(id)).agg(
      count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("ll_micro"))
    docs.select(col(id)).join(agg, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ll_micro"), lit(0L)).as("ll_micro"),
        TextAnalysis.roundA(col("ll_micro") / 1e6 / col("n_bigrams"), 4)
          .as("avg_ll"))
  }

  /** Fold a batch into the model — count addition + vocabulary
    * union, rewritten through one staged-verify-flip (the rewrite is
    * VOCABULARY-sized; the corpus never re-tokenizes beyond the
    * batch). Returns the new vocabulary size. */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
      newStamp: Option[String] = None, retainMs: Long = 600000L): Long = {
    val mt = readMeta(spark, dir)
    // the flip below retains the superseded tables as `.old-g*` for
    // in-flight readers; reclaim PRIOR appends' copies past the
    // retention window (the TextIndex/VectorIndex contract) so a
    // long-lived model dir doesn't accumulate one copy per batch
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    val text = mt.textCol
    val (b12, _, _) = TextAnalysis.lmModel(newDocs, text)
    val m12 = spark.read.parquet(s"$dir/bigrams")
      .select("w1", "w2", "n12").unionByName(b12)
      .groupBy(col("w1"), col("w2")).agg(sum(col("n12")).as("n12"))
    val mv = spark.read.parquet(s"$dir/vocab").unionByName(
        newDocs.select(explode(TextAnalysis.tokens(col(text))).as("w")))
      .distinct()
    val stage = s"$dir/.stage-append"
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    val (nB, vs) = writeTables(spark, stage, m12, mv)
    // STAGED-VERIFY before any flip (the TextIndex/VectorIndex
    // contract this index claims to share): the staged files are
    // RECOUNTED and checked against totals computed from the
    // pre-merge inputs by a separate job — a torn or short stage
    // write aborts here with the live model untouched. n12 mass is
    // the strong check: staged Σn12 must equal live Σn12 + batch
    // Σn12 (count addition is the append's entire correctness claim).
    val staged12 = spark.read.parquet(s"$stage/bigrams")
      .agg(count(lit(1)), coalesce(sum(col("n12")), lit(0L))).head()
    val stagedV = spark.read.parquet(s"$stage/vocab").count()
    val expMass = spark.read.parquet(s"$dir/bigrams")
      .agg(coalesce(sum(col("n12")), lit(0L))).head().getLong(0) +
      b12.agg(coalesce(sum(col("n12")), lit(0L))).head().getLong(0)
    if (staged12.getLong(0) != nB || staged12.getLong(1) != expMass ||
        stagedV != vs) {
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      throw new java.io.IOException(
        s"staged LM append failed verification: bigram rows " +
          s"${staged12.getLong(0)} (expected $nB), n12 mass " +
          s"${staged12.getLong(1)} (expected $expMass), vocab $stagedV " +
          s"(expected $vs); aborting — live model untouched")
    }
    IndexLifecycle.flipStaged(fs, stage, dir, Seq("bigrams", "vocab"))
    writeMeta(spark, dir, mt.copy(vs = vs,
      stamp = newStamp.getOrElse(mt.stamp)))
    vs
  }

  /** n1 derives from the ONE checkpointed bigram table (a window
    * sum over w1 — context-sized partitions) and lands IN the bigram
    * rows, as does the vocabulary size vs (one literal per row —
    * parquet dictionary-encodes a constant column to nothing), so
    * ALL of a score's inputs can never disagree — in the files or in
    * a reader's snapshot. Returns (bigram rows, vocab size). */
  private def writeTables(spark: SparkSession, dir: String,
      c12: DataFrame, vocab: DataFrame): (Long, Long) = {
    val c12m = c12.localCheckpoint(true)
    val n = c12m.count()
    val vm = vocab.localCheckpoint(true)
    val vs = vm.count()
    val nFiles = math.max(1L, n / 2000000L).toInt
    val w = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    graft.sources.LakeSink.writeSorted(
      c12m.withColumn("n1", sum(col("n12")).over(w))
        .withColumn("vs", lit(vs)),
      s"$dir/bigrams", "parquet", Seq("w1", "w2"), nFiles)
    graft.sources.LakeSink.writeSorted(vm, s"$dir/vocab", "parquet",
      Seq("w"), nFiles)
    (n, vs)
  }

  private def writeMeta(spark: SparkSession, dir: String, mt: Meta): Unit = {
    import spark.implicits._
    Seq((mt.vs, mt.textCol, mt.stamp)).toDF("vs", "text_col", "stamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Meta(r.getAs[Long]("vs"), r.getAs[String]("text_col"),
      r.getAs[String]("stamp"))
  }
}
