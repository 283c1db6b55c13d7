package graft

import graft.operators.{TextAnalysis, TextIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted INVERTED TEXT INDEX (TextIndex) — IndexSpec's
  * serving-path contract on the lexical side:
  *  (a) probe plans read ONLY the index tables (no corpus scan, no
  *      corpus tokenization in the serving path);
  *  (b) served rankings are BIT-IDENTICAL to the inline
  *      bm25MoreLikeThis on the same corpus — the index is the same
  *      computation persisted, not an approximation;
  *  (c) append is EXACTLY a rebuild (df/N/Σdl are probe-time
  *      aggregates of per-doc rows — nothing global is frozen at
  *      build time, the property the PQ index can't have);
  *  (d) the refusal + crash-retry discipline matches VectorIndex. */
class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    Tables.load(spark, TestSpark.sf, "documents").localCheckpoint(true)

  private lazy val idxDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx").toString
    TextIndex.write(docs, "doc_id", "text", dir, stamp = "spec")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("meta pins n (ALL docs, tokenless included) and the corpus token total") {
    val mt = TextIndex.readMeta(spark, idxDir)
    assert(mt.n == docs.count())
    val sumdl = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .count()
    assert(mt.sumdl == sumdl, "meta Σdl must equal the corpus token count")
    assert(mt.stamp == "spec")
    val dlRows = spark.read.parquet(s"$idxDir/doclen").count()
    assert(dlRows == mt.n,
      "doclen is the index's complete key set — one row per doc")
  }

  test("served more-like-this ≡ inline bm25MoreLikeThis bit-for-bit") {
    val served = rows(TextIndex.moreLikeThis(spark, idxDir, 1L, 20))
    val inline = rows(TextAnalysis.bm25MoreLikeThis(
      docs, "doc_id", "text", queryId = 1L, k = 20))
    assert(served == inline)
    // and under non-default BM25 parameters (the expression is shared,
    // not just the defaults)
    val s2 = rows(TextIndex.moreLikeThis(spark, idxDir, 3L, 10,
      k1 = 0.9, b = 0.4))
    val i2 = rows(TextAnalysis.bm25MoreLikeThis(
      docs, "doc_id", "text", queryId = 3L, k = 10, k1 = 0.9, b = 0.4))
    assert(s2 == i2)
  }

  test("conjunctive probeTerms: every hit contains ALL query terms, is a subset of the OR query, scores unchanged") {
    // query = doc 1's top-3 terms (t24's shape) — guaranteed to exist
    val qt = spark.read.parquet(s"$idxDir/postings")
      .filter(col("doc_id") === 1L)
      .orderBy(col("tf").desc, col("w")).limit(3).select("w")
      .localCheckpoint(true)
    val terms = qt.collect().map(_.getString(0))
    val and = TextIndex.probeTerms(spark, idxDir, qt, k = 50,
      requireAll = true)
    val or = TextIndex.probeTerms(spark, idxDir, qt, k = 5000)
    val orMap = or.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = and.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.nonEmpty, "fixture terms must co-occur somewhere")
    // subset of the disjunctive ranking with IDENTICAL scores (the
    // gate filters, never rescores)
    hits.foreach { case (id, s) =>
      assert(orMap.get(id).contains(s),
        s"doc $id scored $s conjunctively vs ${orMap.get(id)} disjunctively")
    }
    // every conjunctive hit really contains all three terms
    val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").isin(terms.toIndexedSeq: _*))
      .groupBy("doc_id").agg(countDistinct("w").as("nm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    hits.foreach { case (id, _) =>
      assert(toks.get(id).contains(3L),
        s"doc $id lacks one of the query terms")
    }
    // and no doc with all three terms is missing (k covers them all)
    val withAll = toks.count(_._2 == 3L)
    assert(hits.length == math.min(withAll, 50),
      s"${hits.length} conjunctive hits vs $withAll docs holding all terms")
  }

  test("probe plan reads only index tables — no corpus scan or tokenize") {
    val df = TextIndex.moreLikeThis(spark, idxDir, 1L, 20)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      s"probe plan scans the corpus — tokenization leaked into the " +
        s"serving path:\n${p.take(1500)}")
    assert(p.contains(idxDir), s"probe must read the persisted index:\n${p.take(800)}")
  }

  test("probeTerms answers a raw term set (the live-query interface)") {
    import spark.implicits._
    val terms = spark.read.parquet(s"$idxDir/postings")
      .select("w").distinct().limit(3).localCheckpoint(true)
    val got = TextIndex.probeTerms(spark, idxDir, terms, 5)
    assert(got.columns.toSeq == Seq("doc_id", "bm25_micro"))
    assert(got.count() <= 5 && got.count() > 0)
    // unseen vocabulary scores nothing instead of crashing
    val none = TextIndex.probeTerms(spark, idxDir,
      Seq("zzzz_not_a_word").toDF("w"), 5)
    assert(none.count() == 0)
  }

  test("append ≡ rebuild bit-for-bit (df/N/Σdl are probe-time identities)") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)
    val dirA = java.nio.file.Files.createTempDirectory("graft_tidx_a").toString
    TextIndex.write(half, "doc_id", "text", dirA, stamp = "a")
    val total = TextIndex.append(spark, dirA, rest, Some("a2"))
    assert(total == docs.count())
    val mt = TextIndex.readMeta(spark, dirA)
    assert(mt.stamp == "a2", "append must advance the staleness stamp")
    assert(mt.sumdl == TextIndex.readMeta(spark, idxDir).sumdl)
    val apd = rows(TextIndex.moreLikeThis(spark, dirA, 1L, 20))
    val blt = rows(TextIndex.moreLikeThis(spark, idxDir, 1L, 20))
    assert(apd == blt,
      "append-then-probe must serve exactly what a full rebuild serves")
  }

  test("append refusals: NULL id, dup within batch, id already indexed") {
    import spark.implicits._
    val dirB = java.nio.file.Files.createTempDirectory("graft_tidx_b").toString
    TextIndex.write(docs.filter(col("doc_id") < 10), "doc_id", "text", dirB)
    val eNull = intercept[IllegalArgumentException] {
      TextIndex.append(spark, dirB,
        Seq((Option.empty[Long], "x y z")).toDF("doc_id", "text"))
    }
    assert(eNull.getMessage.contains("NULL"))
    val eDup = intercept[IllegalArgumentException] {
      TextIndex.append(spark, dirB,
        Seq((100L, "a"), (100L, "b")).toDF("doc_id", "text"))
    }
    assert(eDup.getMessage.contains("duplicated within the batch"))
    val eIn = intercept[IllegalArgumentException] {
      TextIndex.append(spark, dirB,
        Seq((1L, "already here")).toDF("doc_id", "text"))
    }
    assert(eIn.getMessage.contains("already present"))
    // and the index still serves, untouched by the refused batches
    assert(TextIndex.moreLikeThis(spark, dirB, 1L, 5).count() > 0)
  }

  test("write refusals: NULL and duplicate doc ids") {
    import spark.implicits._
    val dirC = java.nio.file.Files.createTempDirectory("graft_tidx_c").toString
    val eNull = intercept[IllegalArgumentException] {
      TextIndex.write(Seq((Option.empty[Long], "x")).toDF("doc_id", "text"),
        "doc_id", "text", dirC + "/n")
    }
    assert(eNull.getMessage.contains("NULL"))
    val eDup = intercept[IllegalArgumentException] {
      TextIndex.write(Seq((1L, "x"), (1L, "y")).toDF("doc_id", "text"),
        "doc_id", "text", dirC + "/d")
    }
    assert(eDup.getMessage.contains("duplicate"))
  }

  test("crash-retry converges: same-tag leftovers swept before the guard") {
    import spark.implicits._
    val dirD = java.nio.file.Files.createTempDirectory("graft_tidx_d").toString
    TextIndex.write(docs.filter(col("doc_id") < 10), "doc_id", "text", dirD)
    val batch = Seq((9001L, "retry batch one"), (9002L, "retry batch two"))
      .toDF("doc_id", "text").localCheckpoint(true)
    TextIndex.append(spark, dirD, batch)
    val served = rows(TextIndex.moreLikeThis(spark, dirD, 1L, 20))
    // simulate the crash window: the batch's published files exist but
    // a retry of the SAME batch arrives (an at-least-once maintenance
    // loop). The sweep must remove the leftovers so the retry lands
    // exactly once instead of refusing or double-counting.
    TextIndex.append(spark, dirD,
      batch.withColumn("text", col("text")))
    assert(rows(TextIndex.moreLikeThis(spark, dirD, 1L, 20)) == served)
    assert(spark.read.parquet(s"$dirD/doclen")
      .filter(col("doc_id") >= 9000).count() == 2,
      "the retried batch must land exactly once")
  }

  test("NULL-text docs index as dl_tok=0 keys and never score") {
    import spark.implicits._
    val dirE = java.nio.file.Files.createTempDirectory("graft_tidx_e").toString
    val withNull = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
      .union(Seq((3L, Option.empty[String])).toDF("doc_id", "text"))
    TextIndex.write(withNull, "doc_id", "text", dirE)
    val mt = TextIndex.readMeta(spark, dirE)
    assert(mt.n == 3, "n counts the NULL-text doc (t20's n = count(*))")
    assert(spark.read.parquet(s"$dirE/doclen").count() == 3)
    val got = TextIndex.moreLikeThis(spark, dirE, 1L, 5)
    assert(!rows(got).exists(_.startsWith("[3,")),
      "a tokenless doc can match no term and must not appear")
  }

  test("delete ≡ a rebuild without the docs — df/N/Σdl shift included; deleted doc never answers; append-after-delete consistent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx_d").toString
    TextIndex.write(docs, "doc_id", "text", dir)
    val delIds = Seq(2L, 5L)
    val left = TextIndex.delete(spark, dir, delIds.toDF("doc_id"))
    assert(left == docs.count() - 2)
    val afterDel = TextIndex.moreLikeThis(spark, dir, 1L, 20)
    assert(afterDel.filter(col("doc_id").isin(delIds: _*)).count() == 0,
      "a deleted doc must never answer")
    // the whole point: scores EQUAL a rebuild without those docs —
    // the df/N/Σdl identities shift with the deletion, bit for bit
    val rb = java.nio.file.Files.createTempDirectory("graft_tidx_rb").toString
    TextIndex.write(docs.filter(!col("doc_id").isin(delIds: _*)),
      "doc_id", "text", rb)
    assert(rows(afterDel) == rows(TextIndex.moreLikeThis(spark, rb, 1L, 20)))
    val (mtD, mtR) = (TextIndex.readMeta(spark, dir),
      TextIndex.readMeta(spark, rb))
    assert(mtD.n == mtR.n && mtD.sumdl == mtR.sumdl,
      s"meta must match the rebuild: $mtD vs $mtR")
    // append-after-delete of a previously-deleted id passes the
    // collision guard (its doclen key went with it) and converges
    TextIndex.append(spark, dir, docs.filter(col("doc_id") === 2L))
    val rb2 = java.nio.file.Files.createTempDirectory("graft_tidx_r2").toString
    TextIndex.write(docs.filter(col("doc_id") =!= 5L), "doc_id", "text", rb2)
    assert(rows(TextIndex.moreLikeThis(spark, dir, 1L, 20)) ==
      rows(TextIndex.moreLikeThis(spark, rb2, 1L, 20)))
  }

  test("delete refusals: unknown id and NULL id by name; index unchanged after refusal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx_f").toString
    TextIndex.write(docs.filter(col("doc_id") <= 20L), "doc_id", "text", dir)
    val before = rows(TextIndex.moreLikeThis(spark, dir, 1L, 10))
    val eU = intercept[IllegalArgumentException] {
      TextIndex.delete(spark, dir, Seq(999999L).toDF("doc_id"))
    }
    assert(eU.getMessage.contains("not present"), eU.getMessage)
    val eN = intercept[IllegalArgumentException] {
      TextIndex.delete(spark, dir,
        Seq(Option.empty[java.lang.Long]).toDF("doc_id"))
    }
    assert(eN.getMessage.contains("NULL"), eN.getMessage)
    assert(rows(TextIndex.moreLikeThis(spark, dir, 1L, 10)) == before,
      "a refused delete must leave the index unchanged")
  }

  test("compact restores clustering after appends; probes bit-identical, meta unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx_c").toString
    TextIndex.write(docs.filter(col("doc_id") <= 20L), "doc_id", "text", dir)
    TextIndex.append(spark, dir,
      docs.filter(col("doc_id") > 20L && col("doc_id") <= 40L))
    TextIndex.append(spark, dir,
      docs.filter(col("doc_id") > 40L && col("doc_id") <= 60L))
    def nParts = new java.io.File(s"$dir/postings").listFiles()
      .count(f => f.getName.startsWith("part-") ||
        f.getName.startsWith("ap-"))
    val (partsBefore, mtBefore) = (nParts, TextIndex.readMeta(spark, dir))
    val before = rows(TextIndex.moreLikeThis(spark, dir, 1L, 20))
    val n = TextIndex.compact(spark, dir)
    assert(n == mtBefore.n)
    assert(nParts < partsBefore,
      s"compaction must collapse the ap-* batches: $nParts vs $partsBefore")
    assert(rows(TextIndex.moreLikeThis(spark, dir, 1L, 20)) == before)
    val mtAfter = TextIndex.readMeta(spark, dir)
    assert(mtAfter.n == mtBefore.n && mtAfter.sumdl == mtBefore.sumdl)
    // superseded copies retained under the window, reclaimed past it
    val olds = new java.io.File(dir).listFiles()
      .count(_.getName.contains(".old-g"))
    assert(olds == 2, s"postings+doclen old copies retained, got $olds")
    Thread.sleep(5)
    TextIndex.compact(spark, dir, retainMs = 1L)
    assert(rows(TextIndex.moreLikeThis(spark, dir, 1L, 20)) == before)
  }
}
