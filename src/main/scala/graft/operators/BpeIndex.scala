package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED BPE TOKENIZER — the frozen-artifact contract
  * ([[LmIndex]]'s build-once/score-many, applied to the tokenizer):
  * t14/t15 retrain the merge table from the corpus on every run, but
  * a production pipeline trains its tokenizer ONCE and every later
  * batch/stream encodes against that frozen vocabulary — token
  * budgets (packing d12/d14/d15, mixing, billing) must be computed
  * under the SERVING tokenizer, not whatever today's corpus would
  * retrain.
  *
  * Tables under `dir`:
  *   - `merges` (merge_rank, lhs, rhs) — the trained greedy merge
  *     sequence, THE artifact (order is the algorithm);
  *   - `vocab_tok` (word, n_tok) — every training-vocab word's token
  *     count under the final symbol table: the FAST serving path (a
  *     seen word is one dim-table lookup, no merge replay);
  *   - `meta` (n_merges, text_col, stamp).
  *
  * Serving ([[tokenCount]]) improves on the inline t15 shape for
  * UNSEEN words: `Bpe.docTokens` joins doc words against the
  * training vocab, so a word the training corpus never saw
  * contributes 0 — an under-count that corrupts packing budgets on
  * drifted data. Here unseen words are ENCODED with the frozen
  * merges ([[Bpe.applyMerges]] — exactly what a real tokenizer does
  * with out-of-vocabulary words), at |unseen DISTINCT words| cost,
  * never the corpus: seen words stay a broadcast-dim lookup. On the
  * training corpus itself there are no unseen words, which is why
  * t26 shares t15's oracle bit-for-bit.
  *
  * No `append`: BPE merges are NOT additive — folding a batch's
  * pair counts into trained merges does not equal retraining on the
  * union (early merge choices reshape every later round), so an
  * additive fold would serve a tokenizer NO corpus trains.
  * [[rebuild]] is the honest operation: retrain, staged-verify-flip
  * ([[IndexLifecycle]] — superseded copies retained for in-flight
  * readers, reclaimed past the retention window). */
object BpeIndex {

  final case class Meta(nMerges: Int, textCol: String, stamp: String)

  /** train and COMMIT the artifact. A fresh directory writes
    * directly; an existing one goes through the staged-verify-flip
    * (this is [[rebuild]]). Returns the trained merge count (≤
    * nMerges — a corpus whose pairs exhaust early trains fewer). */
  def write(docs: DataFrame, id: String, text: String, dir: String,
      nMerges: Int, stamp: String = "",
      retainMs: Long = 600000L): Long = {
    val spark = docs.sparkSession
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    val (merges, vocabTok) = Bpe.train(docs, id, text, nMerges)
    val m = merges.localCheckpoint(true)
    val vt = vocabTok.localCheckpoint(true)
    val (nM, nV) = (m.count(), vt.count())
    val live = new org.apache.hadoop.fs.Path(s"$dir/merges")
    val stage = s"$dir/.stage-bpe"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    m.coalesce(1).write.parquet(s"$stage/merges")
    vt.repartition(1).write.parquet(s"$stage/vocab_tok")
    IndexLifecycle.verifyStaged(spark, fs, stage,
      Seq("merges" -> nM, "vocab_tok" -> nV), "bpe rebuild")
    if (fs.exists(live))
      IndexLifecycle.flipStaged(fs, stage, dir, Seq("merges", "vocab_tok"))
    else {
      Seq("merges", "vocab_tok").foreach { tb =>
        require(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/$tb"),
          new org.apache.hadoop.fs.Path(s"$dir/$tb")),
          s"bpe commit failed: $stage/$tb")
      }
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    }
    // meta LAST (the index-kernel rule): totals describe the
    // PUBLISHED tables
    import spark.implicits._
    Seq((nMerges.toLong, text, stamp)).toDF("n_merges", "text_col", "stamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    nM
  }

  /** retrain + atomic flip — the only sound "update" for a BPE
    * artifact (see the no-append argument above). */
  def rebuild(docs: DataFrame, id: String, text: String, dir: String,
      nMerges: Int, stamp: String = "",
      retainMs: Long = 600000L): Long =
    write(docs, id, text, dir, nMerges, stamp, retainMs)

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Meta(r.getAs[Long]("n_merges").toInt, r.getAs[String]("text_col"),
      r.getAs[String]("stamp"))
  }

  /** per-document token counts under the FROZEN tokenizer: seen
    * words from the `vocab_tok` dim lookup, UNSEEN words encoded by
    * replaying the persisted merges over the unseen DISTINCT word
    * set only (|unseen vocab|-sized, never corpus-sized); docs with
    * no words count 0 rather than vanish — t15's contract. */
  def tokenCount(spark: SparkSession, dir: String, docs: DataFrame,
      id: String, text: String): DataFrame = {
    val vt = spark.read.parquet(s"$dir/vocab_tok")
    val merges = spark.read.parquet(s"$dir/merges")
    val meta = readMeta(spark, dir)
    val wc = Bpe.docWords(docs, id, text).groupBy(col(id), col("word"))
      .agg(count(lit(1)).as("c"))
    // |unseen vocab| rows by definition — materialized so the
    // emptiness probe is free and the merge replay runs ONLY when
    // there is something to encode: on an undrifted corpus (training
    // set = serving set, the t26/d33 case) the old form replayed all
    // nMerges rounds over an EMPTY symbol table — ~10 scheduled jobs
    // (checkpoints + windows) to produce zero rows
    val unseen = wc.select(col("word")).distinct()
      .join(vt.select(col("word")), Seq("word"), "left_anti")
      .localCheckpoint(true)
    val allTok = if (unseen.isEmpty) vt
      else vt.unionByName(Bpe.applyMerges(unseen, merges, meta.nMerges))
    docs.select(col(id))
      .join(wc.join(broadcast(allTok), Seq("word"))
        .groupBy(col(id)).agg(sum(col("c") * col("n_tok")).as("t")),
        Seq(id), "left")
      .select(col(id), coalesce(col("t"), lit(0L)).as("n_tok"))
  }
}
