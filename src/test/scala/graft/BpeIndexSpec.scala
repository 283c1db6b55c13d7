package graft

import graft.operators.{Bpe, BpeIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted BPE tokenizer (BpeIndex) — the frozen-artifact
  * lifecycle for the tokenizer:
  *  (a) served token counts ≡ the inline train-then-count (t15's
  *      shape) BIT-FOR-BIT on the training corpus;
  *  (b) the artifact is FROZEN — unseen words are encoded with the
  *      TRAINING merges (not retrained, and not silently counted 0,
  *      the inline shape's under-count);
  *  (c) no append (merges are not additive) — rebuild retrains and
  *      flips atomically, superseded copies retained then GC'd. */
class BpeIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    Tables.load(spark, TestSpark.sf, "documents").localCheckpoint(true)

  private lazy val idxDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpeidx").toString
    BpeIndex.write(docs, "doc_id", "text", dir, nMerges = 8, stamp = "spec")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("served token counts ≡ inline train-then-count bit-for-bit; meta pins the artifact") {
    val served = rows(BpeIndex.tokenCount(spark, idxDir, docs,
      "doc_id", "text"))
    val (_, vocabTok) = Bpe.train(docs, "doc_id", "text", 8)
    val inline = rows(Bpe.docTokens(docs, "doc_id", "text", vocabTok))
    assert(served == inline,
      "persist → serve must equal train → serve on the training corpus")
    val mt = BpeIndex.readMeta(spark, idxDir)
    assert(mt.nMerges == 8 && mt.textCol == "text" && mt.stamp == "spec")
  }

  test("frozen: unseen words are ENCODED with the training merges, never counted 0 and never retrained") {
    import spark.implicits._
    // words the training corpus never saw — the drifted-batch shape
    val drifted = Seq((9001L, "qzxv qzxv wblort"), (9002L, ""),
      (9003L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val served = BpeIndex.tokenCount(spark, idxDir, drifted,
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: replay the PERSISTED merges over the unseen words
    val merges = spark.read.parquet(s"$idxDir/merges")
    val truth = Bpe.applyMerges(Seq("qzxv", "wblort").toDF("word"),
        merges, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served(9001L) == 2 * truth("qzxv") + truth("wblort"),
      s"unseen words must encode under the frozen merges: $served vs $truth")
    assert(served(9001L) > 0L,
      "an unseen word must never contribute 0 (the inline under-count)")
    // empty/NULL text counts 0 rather than vanishing (t15's contract)
    assert(served(9002L) == 0L && served(9003L) == 0L)
    // and the artifact was NOT retrained by serving: merges unchanged
    assert(rows(spark.read.parquet(s"$idxDir/merges")) == rows(merges))
  }

  test("rebuild retrains and flips atomically; superseded copies retained then GC'd; no append by design") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpeidx_rb")
      .toString
    // model A is deliberately SHALLOW (2 merge rounds): token counts
    // under it must differ from the full 8-round artifact, making the
    // rebuild-flip observable in served results (a half-CORPUS model
    // can coincidentally train the identical 8 merges — the corpus's
    // top pairs are stable under halving)
    val a = docs.filter(col("doc_id") % 2 === 0)
    BpeIndex.write(a, "doc_id", "text", dir, nMerges = 2, stamp = "A")
    val servedA = rows(BpeIndex.tokenCount(spark, dir, docs,
      "doc_id", "text"))
    // rebuild on the full corpus ≡ a fresh train on the full corpus
    BpeIndex.rebuild(docs, "doc_id", "text", dir, nMerges = 8,
      stamp = "FULL", retainMs = 600000L)
    assert(BpeIndex.readMeta(spark, dir).stamp == "FULL")
    val servedFull = rows(BpeIndex.tokenCount(spark, dir, docs,
      "doc_id", "text"))
    val freshDir = java.nio.file.Files.createTempDirectory("graft_bpeidx_f")
      .toString
    BpeIndex.write(docs, "doc_id", "text", freshDir, nMerges = 8)
    assert(servedFull == rows(BpeIndex.tokenCount(spark, freshDir, docs,
      "doc_id", "text")), "rebuild must serve exactly a fresh train")
    assert(servedFull != servedA,
      "the fixture must actually change the tokenizer (else the flip " +
        "assert above proves nothing)")
    // superseded copies retained for in-flight readers...
    val olds = new java.io.File(dir).listFiles()
      .filter(_.getName.contains(".old-g"))
    assert(olds.nonEmpty, "the flip must retain the superseded tables")
    // ...and reclaimed past the retention window by the next write
    BpeIndex.rebuild(docs, "doc_id", "text", dir, nMerges = 8,
      stamp = "GC", retainMs = 0L)
    Thread.sleep(5)
    BpeIndex.rebuild(docs, "doc_id", "text", dir, nMerges = 8,
      stamp = "GC2", retainMs = 0L)
    // retainMs=0: everything superseded before this call is eligible
    val leftOver = new java.io.File(dir).listFiles()
      .filter(_.getName.contains(".old-g"))
    assert(leftOver.length <= 2,
      s"superseded copies must GC past the window: ${leftOver.toSeq}")
  }
}
