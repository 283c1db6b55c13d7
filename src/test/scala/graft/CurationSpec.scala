package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  private lazy val evalDocs = docs.filter(col("source") === "src0")
  private lazy val train = docs.filter(col("source") =!= "src0")

  private lazy val (curated, report) = Curation.curate(
    train, "doc_id", "text", col("lang"), evalDocs,
    jaccard = 0.9, maxContam = 0.9, rates = Map("en" -> 0.5))

  test("pipeline stages run in order and only ever shrink the corpus") {
    val rows = report.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq("pii_scrub", "quality_filter",
      "exact_dedup", "neardup_dedup", "decontaminate", "stratified_mix"))
    rows.foreach { case (s, in, out) =>
      assert(out <= in, s"stage $s grew the corpus: $in -> $out")
    }
    // stage boundaries chain: docs_out of stage k == docs_in of k+1
    rows.toSeq.sliding(2).foreach {
      case Seq((_, _, out), (n, in, _)) =>
        assert(out == in, s"boundary mismatch entering $n")
      case _ =>
    }
    assert(rows.head._2 == train.count())
    // the scrub rewrites in place, never drops
    assert(rows.head._3 == rows.head._2, "pii_scrub must not drop docs")
    // the quality filter and the en-downsampling mix must both bite
    assert(rows(1)._3 < rows(1)._2, "quality filter dropped nothing")
    val mix = rows.last
    assert(mix._3 < mix._2, "stratified mix dropped nothing")
  }

  test("audit counts share one materialization per stage (bounded input IO)") {
    // the VERDICT-r7 question settled by MEASUREMENT: each stage
    // output is persisted before its audit count, so the whole
    // six-stage pipeline reads the source file ~twice (the initial
    // docs_in count + the pii stage's materialization) — an
    // unpersisted audit would re-run every stage's lineage from the
    // scan and multiply source IO by the stage count. local[*] runs
    // executors in this JVM, so Hadoop's LocalFileSystem statistics
    // see every task's reads.
    import spark.implicits._
    val filler = (1 to 2000).map(i => s"tok$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_io").toString
    (1 to 200).map(i => (i.toLong, s"doc $i body $filler", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val ev = Seq((100000L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val fileBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    def bytesRead: Long =
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
        .get("file").getLong("bytesRead")
    val before = bytesRead
    val (out, rep) = Curation.curate(src, "doc_id", "text", col("lang"), ev)
    rep.collect(); out.count()
    val delta = bytesRead - before
    assert(delta > 0, "expected the curate run to read the source file")
    assert(delta < fileBytes * 4,
      s"curate read ${delta}B of a ${fileBytes}B source — audit counts are " +
        "re-executing stage lineages instead of sharing the persisted stage output")
  }

  test("window_dup_filter drops the straddling-boilerplate doc, keeps the first carrier") {
    import spark.implicits._
    // doc 2 = 8 own tokens + a 28-token copy of doc 1's tokens 5..32:
    // a straddle doc-level dedup keeps (the docs differ) and aligned
    // span dedup under-counts — 13 of its 21 overlapping 16-windows
    // (62%) duplicate doc 1's, over the 0.5 cap
    val aTok = (0 until 40).map(i => s"alpha$i")
    val bTok = (0 until 8).map(i => s"beta$i") ++ aTok.slice(5, 33)
    val cTok = (0 until 40).map(i => s"gamma$i")
    val corpus = Seq((1L, aTok.mkString(" "), "en"),
      (2L, bTok.mkString(" "), "en"), (3L, cTok.mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val ev = Seq((9L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val (out, rep) = Curation.curate(corpus, "doc_id", "text", col("lang"),
      ev, maxContam = 0.9, maxDupWindowFrac = Some(0.5))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L),
      s"the first carrier and the unique doc must survive: kept = $kept")
    val stages = rep.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stages("window_dup_filter") == ((3L, 2L)), s"stages = $stages")
    // without the option the stage is absent and the straddle survives
    val (out2, rep2) = Curation.curate(corpus, "doc_id", "text",
      col("lang"), ev, maxContam = 0.9)
    assert(!rep2.collect().map(_.getString(0)).contains("window_dup_filter"))
    assert(out2.count() == 3)
  }

  test("curate scrubs PII before anything downstream sees the text") {
    import spark.implicits._
    val filler = (1 to 30).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, s"reach me at alice@example.com please $filler", "en"),
      (2L, s"server 10.0.0.1 fell over $filler", "en"),
      (3L, s"nothing sensitive $filler", "en")).toDF("doc_id", "text", "lang")
    val ev = Seq((100L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val (out, _) = Curation.curate(corpus, "doc_id", "text", col("lang"), ev)
    assert(out.count() == 3, "all three docs survive this tiny build")
    assert(out.filter(col("text").contains("@") ||
      col("text").rlike("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+")).count() == 0,
      "no unscrubbed PII may reach the curated corpus")
    assert(out.filter(col("doc_id") === 1)
      .head().getAs[String]("text").contains("<EMAIL>"))
  }

  test("semantic_dedup drops a planted paraphrase pair, keeps unembedded docs") {
    import spark.implicits._
    // docs 1 and 2 share ZERO shingles (every lexical dedup keeps
    // both) but their embeddings are scaled copies — the SemDeDup
    // case; doc 3 has NO embedding row and must pass untouched
    val fillerA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val fillerB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val fillerC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val corpus = Seq(
      (1L, s"the cat sat on the mat $fillerA", "en"),
      (2L, s"a feline rested upon the rug $fillerB", "en"),
      (3L, s"completely unrelated quarterly report $fillerC", "en"))
      .toDF("doc_id", "text", "lang")
    val vec = Array.tabulate(64)(i => math.sin(i + 1.0).toFloat)
    val emb = Seq(
      (1L, vec), (2L, vec.map(x => x * 1.01f)))
      .toDF("vec_id", "embedding")
    val ev = Seq((100L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val (out, rep) = Curation.curate(corpus, "doc_id", "text", col("lang"), ev,
      embeddings = Some(emb), semSeedRate = 1.0)
    val stages = rep.collect().map(_.getString(0)).toSeq
    assert(stages == Seq("pii_scrub", "quality_filter", "exact_dedup",
      "neardup_dedup", "semantic_dedup", "decontaminate", "stratified_mix"),
      s"got $stages")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(2L), "planted paraphrase must be dropped")
    assert(kept.contains(1L), "the min-id survivor of the pair stays")
    assert(kept.contains(3L), "an unembedded doc must never be dropped")
  }

  test("keepBestQuality: the near-dup stage keeps the best copy, not the min id") {
    import spark.implicits._
    // 1 and 2 are near-dups (>=0.9 shingle jaccard); 2 has the
    // stopword-rich tail and so the higher t2 score. Default rule
    // keeps min id 1; keepBestQuality must keep 2 instead.
    val base = (1 to 30).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, base + " the the"),
      (3L, s"unrelated ${(1 to 30).map(i => s"other$i").mkString(" ")}"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val ev = Seq((100L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val (outDefault, _) = Curation.curate(corpus, "doc_id", "text",
      col("lang"), ev)
    val keptD = outDefault.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptD == Set(1L, 3L), s"min-id rule: got $keptD")
    val (outBest, rep) = Curation.curate(corpus, "doc_id", "text",
      col("lang"), ev, keepBestQuality = true)
    val keptB = outBest.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptB == Set(2L, 3L), s"keep-best rule: got $keptB")
    // stage order unchanged — the keep rule is inside neardup_dedup
    assert(rep.collect().map(_.getString(0)).toSeq == Seq("pii_scrub",
      "quality_filter", "exact_dedup", "neardup_dedup", "decontaminate",
      "stratified_mix"))
  }

  test("ppl_prune drops the gibberish decile, keeps normal and unjudgeable docs") {
    import spark.implicits._
    // 40 docs of ordinary repeating language (high bigram probability
    // under the self-trained LM), 4 of unique-token gibberish (every
    // bigram unseen elsewhere -> Laplace floor), 1 single-token doc
    // (no bigrams -> unjudgeable, must be KEPT)
    // (0-bigram docs would be KEPT by the stage's unjudgeable rule,
    // but the upstream quality filter already removes them — the rule
    // is a safety net for curate() calls with a laxer filter chain)
    val common = (1 to 40).map { i =>
      val sent = "the quick brown fox jumps over the lazy dog again and again"
      (i.toLong, s"$sent $sent number item $i", "en")
    }
    val gibberish = (41 to 44).map { i =>
      (i.toLong, (1 to 24).map(j => s"zq${i}x$j").mkString(" "), "en")
    }
    val corpus = (common ++ gibberish).toDF("doc_id", "text", "lang")
    val ev = Seq((1000L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val (out, rep) = Curation.curate(corpus, "doc_id", "text", col("lang"), ev,
      jaccard = 0.99, pplKeepDeciles = Some(9))
    val stages = rep.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ppl = stages.find(_._1 == "ppl_prune")
    assert(ppl.isDefined, s"stage missing: $stages")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((41L to 44L).forall(!kept(_)),
      s"gibberish decile must be pruned, kept=$kept")
    assert((1L to 40L).count(kept) >= 30,
      s"ordinary docs must dominate the kept set: $kept")
    // the stage's own audit row shows exactly the bottom decile cut
    val (_, in, outN) = ppl.get
    assert(in - outN >= 4 && in - outN <= in / 10 + 4,
      s"ppl_prune cut $in -> $outN; expected ~the worst decile")
  }

  test("dsir_select keeps the target-like docs, drops the raw-typical ones, never judges the featureless") {
    import spark.implicits._
    // target slice: 'en' docs of one bigram family; raw mass: 'xx'
    // docs of a disjoint family. Two held-out 'xx' docs — one written
    // target-like, one raw-like — must land on opposite sides of the
    // keep threshold purely by content.
    // every doc: its family's 50-word base phrase + a 3-word tail
    // (53 tokens, >= 50 unique — passes the quality gates; distinct
    // tails keep exact/near dedup quiet). Family-base bigrams repeat
    // across the whole slice, so membership dominates the weight by
    // a wide margin (~50 shared transitions ≈ +7 vs ≤ −0.8 for a
    // worst-case feature-hash bucket collision — the margin that
    // makes the planted verdicts collision-proof); the held-out docs
    // reuse base words ONLY (no unique tail), so they are judged
    // purely on which family's bigrams they carry.
    val tw = (1 to 50).map(j => s"tw$j").mkString(" ")
    val rw = (1 to 50).map(j => s"rw$j").mkString(" ")
    val tgt = (1 to 15).map(i => (i.toLong, s"$tw un${i}a un${i}b un${i}c", "en"))
    val raw = (16 to 34).map(i => (i.toLong, s"$rw vn${i}a vn${i}b vn${i}c", "xx"))
    val heldTgt = (46L, s"$tw tw1 tw2 tw3", "xx")
    val heldRaw = (47L, s"$rw rw1 rw2 rw3", "xx")
    val corpus = (tgt ++ raw ++ Seq(heldTgt, heldRaw))
      .toDF("doc_id", "text", "lang")
    val ev = Seq((1000L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val (out, rep) = Curation.curate(corpus, "doc_id", "text", col("lang"), ev,
      jaccard = 0.999, dsirTarget = Some(col("lang") === "en"))
    val stages = rep.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ds = stages.find(_._1 == "dsir_select")
    assert(ds.isDefined, s"stage missing: $stages")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept(46L), s"the target-like held-out doc must be kept: $kept")
    assert(!kept(47L), s"the raw-typical held-out doc must be dropped: $kept")
    assert((1L to 15L).forall(kept), s"the target slice itself survives: $kept")
    // without the knob the stage does not exist
    val (_, rep0) = Curation.curate(corpus, "doc_id", "text", col("lang"), ev,
      jaccard = 0.999)
    assert(!rep0.collect().map(_.getString(0)).contains("dsir_select"))
  }

  test("weighted_cap stage bounds every stratum at n, drawn length-weighted and deterministic") {
    val (out, rep) = Curation.curate(train, "doc_id", "text", col("lang"),
      evalDocs, jaccard = 0.9, maxContam = 0.9, weightedCapN = Some(12))
    val stages = rep.collect().map(_.getString(0)).toSeq
    assert(stages.contains("weighted_cap"),
      "the cap must appear in the audit trail")
    assert(stages.indexOf("weighted_cap") == stages.length - 1,
      "the cap binds on what mixing kept — it runs last")
    val per = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    per.foreach { case (g, n) =>
      assert(n <= 12, s"stratum $g holds $n > 12 after the cap")
    }
    // deterministic: same call, same picks
    val (out2, _) = Curation.curate(train, "doc_id", "text", col("lang"),
      evalDocs, jaccard = 0.9, maxContam = 0.9, weightedCapN = Some(12))
    assert(out.select("doc_id").exceptAll(out2.select("doc_id")).isEmpty)
    // the draw is length-biased: mean kept length exceeds the
    // pre-cap survivor mean (weights = token counts)
    val (pre, _) = Curation.curate(train, "doc_id", "text", col("lang"),
      evalDocs, jaccard = 0.9, maxContam = 0.9)
    def meanLen(df: org.apache.spark.sql.DataFrame) =
      df.agg(avg(size(split(col("text"), " ")))).head().getDouble(0)
    assert(meanLen(out) > meanLen(pre),
      s"length-weighted draw must bias long: ${meanLen(out)} vs ${meanLen(pre)}")
  }

  test("span_dedup stage strips a planted cross-doc span from the survivor's text") {
    import spark.implicits._
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val uniq1 = (1 to 40).map(i => s"u$i").mkString(" ")
    val uniq2 = (1 to 40).map(i => s"v$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$boiler $uniq1", "en", "srcA"),
      (2L, s"$boiler $uniq2", "en", "srcA")) // shares only the boilerplate span
      .toDF("doc_id", "text", "lang", "source")
    val eval = Seq((99L, "nothing here overlaps at all truly", "en", "srcE"))
      .toDF("doc_id", "text", "lang", "source")
    val (out, rep) = Curation.curate(corpus, "doc_id", "text", col("lang"),
      eval, jaccard = 0.95, maxContam = 0.9, spanDedup = Some(16))
    val rows = rep.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).contains("span_dedup"), "stage must appear in the audit")
    val sd = rows.find(_._1 == "span_dedup").get
    assert(sd._2 == sd._3, "span_dedup rewrites in place, never drops docs")
    val texts = out.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L).startsWith("b1 "), "first occurrence keeps its boilerplate")
    assert(!texts(2L).contains("b1"), "later copy loses the shared span")
    assert(texts(2L).contains("v1"), "unique content survives the rewrite")
  }

  test("window_dedup stage cuts a straddling duplicated run in place (filter + rewrite compose)") {
    import spark.implicits._
    // the window_dup_filter fixture's shape, below the drop cap: doc 2
    // carries a 20-token copy of doc 1's tokens 5..24 inside its own
    // text — span_dedup's aligned 16-spans cannot cut it exactly and
    // the 11% dup fraction (5 of 45 windows) survives a 0.5 filter
    // cap; the rewrite stage must remove exactly the copied run and
    // nothing else
    val aTok = (0 until 40).map(i => s"alpha$i")
    val bTok = (0 until 20).map(i => s"beta$i") ++ aTok.slice(5, 25) ++
      (20 until 40).map(i => s"beta$i")
    val cTok = (0 until 40).map(i => s"gamma$i")
    val corpus = Seq((1L, aTok.mkString(" "), "en"),
      (2L, bTok.mkString(" "), "en"), (3L, cTok.mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val ev = Seq((9L, "held out benchmark text entirely unrelated"))
      .toDF("doc_id", "text")
    val (out, rep) = Curation.curate(corpus, "doc_id", "text", col("lang"),
      ev, maxContam = 0.9, maxDupWindowFrac = Some(0.5),
      windowDedup = Some(16))
    val stages = rep.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stages("window_dup_filter") == ((3L, 3L)),
      s"no doc crosses the drop cap here: $stages")
    assert(stages("window_dedup") == ((3L, 3L)),
      s"the rewrite is in place, never a drop: $stages")
    val texts = out.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L) == aTok.mkString(" "),
      "the first carrier is never cut")
    assert(texts(2L) == (bTok.take(20) ++ bTok.drop(40)).mkString(" "),
      s"exactly the 20 copied tokens go: ${texts(2L)}")
    assert(texts(3L) == cTok.mkString(" "), "the unique doc is untouched")
  }

  test("token-budget curation lands near the budget and reports the stage") {
    import spark.implicits._
    val (out, rep) = Curation.curate(
      train, "doc_id", "text", col("lang"), evalDocs,
      jaccard = 0.9, maxContam = 0.9, tokenBudget = Some(10000.0))
    val stages = rep.collect().map(_.getString(0)).toSeq
    assert(stages.contains("budget_mix") && !stages.contains("stratified_mix"))
    val kept = out.agg(sum(size(split(col("text"), " ")).cast("long")))
      .collect().head.getLong(0)
    // rate-1 strata keep whole allocations and rounding is per-doc, so
    // the landing zone is loose — but it must be the budget's order of
    // magnitude, far below the unmixed corpus
    val unmixed = train.agg(sum(size(split(col("text"), " ")).cast("long")))
      .collect().head.getLong(0)
    assert(kept < unmixed / 2, s"budget mix must bite: $kept of $unmixed")
    assert(kept > 2000 && kept < 20000, s"kept tokens $kept far from budget 10000")
  }

  test("curated output carries a complete deterministic split") {
    assert(curated.columns.contains("split"))
    val splits = curated.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.getOrElse("train", 0L) > splits.getOrElse("val", 0L))
    assert(splits.values.sum == curated.count())
    // idempotent: a second full run reproduces the corpus exactly
    val (again, _) = Curation.curate(
      train, "doc_id", "text", col("lang"), evalDocs,
      jaccard = 0.9, maxContam = 0.9, rates = Map("en" -> 0.5))
    assert(curated.exceptAll(again).count() == 0 &&
      again.exceptAll(curated).count() == 0)
  }
}
