package graft

import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted DEDUP SIGNATURE INDEX (DedupIndex) — the serving
  * contract of IndexSpec/TextIndexSpec on the third pillar:
  *  (a) probe plans read the corpus ONLY as the persisted tables —
  *      no corpus re-tokenization in a probe;
  *  (b) probes are BIT-IDENTICAL to the inline estimator /
  *      incremental-dedup corpus check on the same corpus (the index
  *      is the same computation persisted — every table is a pure
  *      per-doc derivation);
  *  (c) append is EXACTLY a rebuild (no global statistic exists to
  *      freeze), delete ≡ a rebuild without the ids, compact is
  *      bit-identical;
  *  (d) refusals and crash discipline match the other two indexes. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    Tables.load(spark, TestSpark.sf, "documents").localCheckpoint(true)
  private lazy val corpus = docs.filter(col("doc_id") % 7 =!= 3)
    .localCheckpoint(true)
  private lazy val batch = docs.filter(col("doc_id") % 7 === 3)
    .localCheckpoint(true)

  private lazy val idxDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_didx").toString
    DedupIndex.write(corpus, "doc_id", "text", dir, stamp = "spec")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("meta pins n/K/BANDS; signatures are the complete key set; bands = n·BANDS") {
    val mt = DedupIndex.readMeta(spark, idxDir)
    assert(mt.n == corpus.count() && mt.k == Dedup.K &&
      mt.bands == Dedup.BANDS && mt.hasShingles && mt.stamp == "spec")
    assert(spark.read.parquet(s"$idxDir/signatures").count() == mt.n)
    assert(spark.read.parquet(s"$idxDir/bands").count() == mt.n * mt.bands)
    assert(spark.read.parquet(s"$idxDir/shingles").count() == mt.n)
  }

  test("probeEst ≡ the inline estimator restricted to cross pairs; no corpus text in the plan") {
    val probed = DedupIndex.probeEst(spark, idxDir, batch)
    val inline = Dedup.minhashEstimate(docs, "doc_id", "text")
      // inline pairs are (d1 < d2); cross pairs can sit either way
      .select(col("d1"), col("d2"), col("est"))
    val crossInline = inline
      .filter(col("d1") % 7 === 3 && col("d2") % 7 =!= 3)
      .select(col("d1").as("bid"), col("d2").as("cid"), col("est"))
      .unionByName(inline
        .filter(col("d2") % 7 === 3 && col("d1") % 7 =!= 3)
        .select(col("d2").as("bid"), col("d1").as("cid"), col("est")))
    assert(rows(probed) == rows(crossInline))
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "probe must not rescan the corpus text:\n" + plan.take(800))
    assert(plan.contains(idxDir),
      "probe must read the persisted index tables")
    // a small batch's band digests push into the clustered band scan
    // (the IN-list prunes band files/row-groups on footer min/max);
    // the batch side broadcasts — the corpus never shuffles
    assert(plan.contains("In(b, ") || plan.contains("In(b,["),
      "batch band digests must push down into the bands scan:\n" +
        plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"),
      "the batch side must broadcast")
  }

  test("dedupBatch ≡ incrementalDedup on the same corpus, row for row") {
    val servedKept = DedupIndex.dedupBatch(spark, idxDir, batch,
      threshold = 0.8)
    val inlineKept = Dedup.incrementalDedup(
      Dedup.bands(Dedup.minhashSignatures(corpus, "doc_id", "text"), "doc_id"),
      Dedup.shingleSets(corpus, "doc_id", "text"), "doc_id",
      batch, "doc_id", "text", threshold = 0.8)
    assert(rows(servedKept) == rows(inlineKept))
  }

  test("append ≡ rebuild bit-for-bit on every probe path") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_didx_a").toString
    val a = corpus.filter(col("doc_id") % 5 =!= 4)
    val b = corpus.filter(col("doc_id") % 5 === 4).localCheckpoint(true)
    DedupIndex.write(a, "doc_id", "text", dirA, stamp = "A")
    val total = DedupIndex.append(spark, dirA, b)
    assert(total == corpus.count(), "meta must track the appended total")
    assert(rows(DedupIndex.probeEst(spark, dirA, batch)) ==
      rows(DedupIndex.probeEst(spark, idxDir, batch)),
      "append must serve exactly what the rebuild serves (probeEst)")
    assert(rows(DedupIndex.probeVerified(spark, dirA, batch, 0.5)) ==
      rows(DedupIndex.probeVerified(spark, idxDir, batch, 0.5)),
      "append must serve exactly what the rebuild serves (probeVerified)")
    // refusals: already-present id, NULL id, intra-batch duplicate
    val e1 = intercept[IllegalArgumentException] {
      DedupIndex.append(spark, dirA, b.limit(1))
    }
    assert(e1.getMessage.contains("INDEX APPEND REFUSED") &&
      e1.getMessage.contains("already present"))
    val e2 = intercept[IllegalArgumentException] {
      DedupIndex.append(spark, dirA,
        b.limit(1).select(lit(null).cast("long").as("doc_id"), col("text")))
    }
    assert(e2.getMessage.contains("NULL"))
    assert(DedupIndex.readMeta(spark, dirA).n == total,
      "refused appends must not touch the meta")
  }

  test("delete: removed id never answers a probe; ≡ rebuild without it; refusals") {
    val dirD = java.nio.file.Files.createTempDirectory("graft_didx_d").toString
    DedupIndex.write(corpus, "doc_id", "text", dirD, stamp = "D")
    // delete a corpus id that actually answers probes, so the pin bites
    val hit = DedupIndex.probeEst(spark, idxDir, batch)
      .orderBy(col("est").desc, col("cid")).select("cid").head().getLong(0)
    import spark.implicits._
    val kept = DedupIndex.delete(spark, dirD, Seq(hit).toDF("doc_id"))
    assert(kept == corpus.count() - 1)
    val after = DedupIndex.probeEst(spark, dirD, batch)
    assert(after.filter(col("cid") === hit).isEmpty,
      "a deleted doc must never answer")
    val dirR = java.nio.file.Files.createTempDirectory("graft_didx_r").toString
    DedupIndex.write(corpus.filter(col("doc_id") =!= hit),
      "doc_id", "text", dirR, stamp = "R")
    assert(rows(after) == rows(DedupIndex.probeEst(spark, dirR, batch)),
      "delete must equal a rebuild without the ids")
    val eU = intercept[IllegalArgumentException] {
      DedupIndex.delete(spark, dirD, Seq(-99L).toDF("doc_id"))
    }
    assert(eU.getMessage.contains("not present"))
    // append-after-delete of the same id passes the collision guard
    DedupIndex.append(spark, dirD, corpus.filter(col("doc_id") === hit))
    assert(rows(DedupIndex.probeEst(spark, dirD, batch)) ==
      rows(DedupIndex.probeEst(spark, idxDir, batch)))
  }

  test("compact: probes bit-identical; band files disjoint on (j, b)") {
    val dirC = java.nio.file.Files.createTempDirectory("graft_didx_c").toString
    val a = corpus.filter(col("doc_id") % 5 =!= 4)
    val b = corpus.filter(col("doc_id") % 5 === 4).localCheckpoint(true)
    DedupIndex.write(a, "doc_id", "text", dirC, stamp = "C")
    DedupIndex.append(spark, dirC, b)
    val before = rows(DedupIndex.probeVerified(spark, dirC, batch, 0.5))
    DedupIndex.compact(spark, dirC)
    assert(rows(DedupIndex.probeVerified(spark, dirC, batch, 0.5)) == before,
      "compact must not change probe results")
    val ranges = spark.read.parquet(s"$dirC/bands")
      .select(concat_ws("|", col("j"), col("b")).as("jb"),
        input_file_name().as("f"))
      .groupBy("f").agg(min("jb").as("lo"), max("jb").as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"band files overlap after compact: $hi1 > $lo2")
      case _ =>
    }
  }

  test("signature-only index serves probeEst and refuses probeVerified by name") {
    val dirS = java.nio.file.Files.createTempDirectory("graft_didx_s").toString
    DedupIndex.write(corpus, "doc_id", "text", dirS, stamp = "S",
      withShingles = false)
    assert(rows(DedupIndex.probeEst(spark, dirS, batch)) ==
      rows(DedupIndex.probeEst(spark, idxDir, batch)))
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probeVerified(spark, dirS, batch, 0.9)
    }
    assert(e.getMessage.contains("withShingles=false"))
  }
}
