package graft

import graft.operators.{LmIndex, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted bigram LM (LmIndex) — the model-artifact lifecycle:
  *  (a) served scores ≡ inline lmScore BIT-FOR-BIT on the training
  *      corpus (shared lpMicro over identical counts);
  *  (b) the model is FROZEN — scoring unseen text uses the training
  *      counts, never retrains (the production perplexity-filter
  *      semantics t10's inline form cannot have);
  *  (c) append ≡ retrain on the union (counts additive, vocabulary
  *      a set union). */
class LmIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    Tables.load(spark, TestSpark.sf, "documents").localCheckpoint(true)

  private lazy val idxDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lmidx").toString
    LmIndex.write(docs, "text", dir, stamp = "spec")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("served scores ≡ inline lmScore bit-for-bit; meta pins the vocabulary size") {
    val served = rows(LmIndex.score(spark, idxDir, docs, "doc_id", "text"))
    val inline = rows(TextAnalysis.lmScore(docs, "doc_id", "text"))
    assert(served == inline)
    val vs = docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .distinct().count()
    assert(LmIndex.readMeta(spark, idxDir).vs == vs)
  }

  test("frozen model: unseen text is judged against the TRAINING counts, never retrained") {
    import spark.implicits._
    // a doc of entirely-unseen vocabulary has no scorable bigram:
    // n_bigrams = 0, judged-not-dropped (the no-bigram rule)
    val unseen = Seq((900L, "zzq1 zzq2 zzq3 zzq4")).toDF("doc_id", "text")
    val s1 = LmIndex.score(spark, idxDir, unseen, "doc_id", "text")
      .collect().head
    assert(s1.getLong(1) == 0L && s1.getLong(2) == 0L)
    // a doc of SEEN text scores identically whether it is scored
    // alone or with the corpus — the model never refits to the batch
    val one = docs.filter(col("doc_id") === 3L)
    val alone = rows(LmIndex.score(spark, idxDir, one, "doc_id", "text"))
    val inCorpus = rows(LmIndex.score(spark, idxDir, docs, "doc_id", "text")
      .filter(col("doc_id") === 3L))
    assert(alone == inCorpus)
  }

  test("every scoring denominator rides the bigram rows: one atomic table, no counts/vs mis-pairing window") {
    // n1 AND vs are denormalized into each bigram row, and score()
    // reads vs from the ROW — so a score racing an append's table
    // flip pairs counts and vocabulary size from ONE parquet
    // snapshot; meta.vs is the informational copy and must agree
    val bg = spark.read.parquet(s"$idxDir/bigrams")
    assert(bg.columns.toSet == Set("w1", "w2", "n12", "n1", "vs"))
    val distinctVs = bg.select("vs").distinct().collect().map(_.getLong(0))
    assert(distinctVs.toSeq == Seq(LmIndex.readMeta(spark, idxDir).vs))
  }

  test("append ≡ retrain on the union, bit for bit") {
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0).localCheckpoint(true)
    val dirA = java.nio.file.Files.createTempDirectory("graft_lmidx_a").toString
    val dirU = java.nio.file.Files.createTempDirectory("graft_lmidx_u").toString
    LmIndex.write(a, "text", dirA, stamp = "A")
    val vs = LmIndex.append(spark, dirA, b, Some("AB"))
    LmIndex.write(docs, "text", dirU, stamp = "U")
    assert(vs == LmIndex.readMeta(spark, dirU).vs,
      "appended vocabulary must be the union's")
    assert(LmIndex.readMeta(spark, dirA).stamp == "AB")
    assert(rows(LmIndex.score(spark, dirA, docs, "doc_id", "text")) ==
      rows(LmIndex.score(spark, dirU, docs, "doc_id", "text")),
      "append must serve exactly what a retrain on the union serves")
  }

  test("a legacy model directory (bigrams without the vs column) scores via meta.vs, not an unresolved-column crash") {
    // fabricate a pre-denormalization build: same counts, no vs row
    // column — the migration shape the fallback exists for
    val legacy = java.nio.file.Files.createTempDirectory("graft_lmidx_leg")
      .toString
    LmIndex.write(docs, "text", legacy, stamp = "legacy")
    val stripped = spark.read.parquet(s"$legacy/bigrams")
      .drop("vs").localCheckpoint(true)
    stripped.write.mode("overwrite").parquet(s"$legacy/bigrams")
    val served = rows(LmIndex.score(spark, legacy, docs, "doc_id", "text"))
    assert(served == rows(LmIndex.score(spark, idxDir, docs, "doc_id", "text")),
      "meta.vs fallback must serve the same scores the build did")
  }
}
