package graft

import graft.operators.{Similarity, VectorIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted ANN index lifecycle (VectorIndex): build once, probe
  * many. Pins the two properties that make it a serving path rather
  * than a cached demo:
  *  (a) probe plans read ONLY the index tables — zero training
  *      stages (training requires scanning the corpus; the corpus
  *      parquet never appears in a probe plan);
  *  (b) probe results are BIT-IDENTICAL to the inline s8/s6/s10
  *      compositions on the same corpus and probe set — the index is
  *      the same computation persisted, not an approximation of it. */
class IndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val anchorPred = col("vec_id") % 125 === 0
  private val probePred = col("vec_id") % 17 === 0

  private lazy val vecs =
    Tables.load(spark, TestSpark.sf, "embeddings")
  // probes handed to the index with their lineage CUT, so any corpus
  // scan in a probe plan could only come from the index path itself
  private lazy val probes = vecs.filter(probePred).localCheckpoint(true)

  private lazy val idxDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    VectorIndex.write(vecs, "vec_id", "embedding", anchorPred, dir,
      stamp = "spec")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("meta pins the build-time sizing (bits from the corpusBits rule)") {
    val mt = VectorIndex.readMeta(spark, idxDir)
    val kA = vecs.filter(anchorPred).count()
    assert(mt.kAnchors == kA && mt.n == vecs.count())
    assert(mt.bits == Similarity.corpusBits(kA, 4),
      "probes must band with the INDEX's bits, pinned at build time")
    assert(mt.stamp == "spec")
  }

  test("probe plans read only index tables — no corpus scan, no training stage") {
    for ((name, df) <- Seq(
        "probe" -> VectorIndex.probe(spark, idxDir, probes, 5, nprobe = 2),
        "probePq" -> VectorIndex.probePq(spark, idxDir, probes, 5),
        "probeRerank" -> VectorIndex.probeRerank(spark, idxDir, probes, 5))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("embeddings.parquet"),
        s"$name plan scans the corpus — a training stage leaked into " +
          s"the serving path:\n${p.take(1500)}")
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans >= 1 && p.contains(idxDir),
        s"$name must read the persisted index tables:\n${p.take(800)}")
    }
  }

  test("probe ≡ inline s8 (ivfKnnLsh) bit-for-bit") {
    val mt = VectorIndex.readMeta(spark, idxDir)
    val inline = Similarity.ivfKnnLsh(vecs, "vec_id", "embedding",
      anchorPred, probePred, 5, nprobe = 2, bits = mt.bits)
    val probed = VectorIndex.probe(spark, idxDir, probes, 5, nprobe = 2)
    assert(rows(probed) == rows(inline))
  }

  test("probePq ≡ inline s6 (ivfPqKnnLsh) bit-for-bit") {
    val mt = VectorIndex.readMeta(spark, idxDir)
    val inline = Similarity.ivfPqKnnLsh(vecs, "vec_id", "embedding",
      anchorPred, probePred, 5, mt.bits)
    val probed = VectorIndex.probePq(spark, idxDir, probes, 5)
    assert(rows(probed) == rows(inline))
  }

  test("probeRerank ≡ inline s10 (pqRerank) bit-for-bit") {
    val mt = VectorIndex.readMeta(spark, idxDir)
    val inline = Similarity.pqRerank(vecs, "vec_id", "embedding",
      anchorPred, probePred, 5, mt.bits)
    val probed = VectorIndex.probeRerank(spark, idxDir, probes, 5)
    assert(rows(probed) == rows(inline))
  }

  test("append: frozen-quantizer inserts; exact-vector probe ≡ same-anchor rebuild; refusals") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_idx_a").toString
    val dirAB = java.nio.file.Files.createTempDirectory("graft_idx_ab").toString
    // corpus A and batch B split so B carries NO anchors (v%125==0 ⇒
    // v%5==0 ≠ 4): a rebuild on A∪B then picks exactly A's anchors,
    // making append ≡ rebuild a meaningful bit-for-bit pin for the
    // exact-vector probe path (the PQ codebook is frozen by design —
    // rebuild would re-seed it from the grown corpus)
    val a = vecs.filter(col("vec_id") % 5 =!= 4)
    val b = vecs.filter(col("vec_id") % 5 === 4).localCheckpoint(true)
    VectorIndex.write(a, "vec_id", "embedding", anchorPred, dirA, stamp = "A")
    val total = VectorIndex.append(spark, dirA, b)
    assert(total == vecs.count(), "meta must track the appended total")
    VectorIndex.write(vecs, "vec_id", "embedding", anchorPred, dirAB,
      stamp = "AB")
    assert(rows(VectorIndex.probe(spark, dirA, probes, 5, nprobe = 2)) ==
      rows(VectorIndex.probe(spark, dirAB, probes, 5, nprobe = 2)),
      "probe over append must equal probe over the same-anchor rebuild")
    // an appended vector is SERVED: a probe that is its exact copy
    // reaches it with the maximal ADC estimate (the encode/ADC shared
    // argmax objective — an exact copy can never be out-scored)
    val v = b.orderBy("vec_id").head()
    val copy = b.filter(col("vec_id") === v.getLong(0))
      .select(lit(-1L).as("vec_id"), col("embedding"))
    val served = VectorIndex.probePq(spark, dirA, copy, 5).collect()
    assert(served.nonEmpty, "the exact-copy probe must return results")
    val best = served.map(_.getAs[Double]("est6")).max
    val own = served.find(_.getAs[Long]("neighbor_id") == v.getLong(0))
    assert(own.exists(_.getAs[Double]("est6") == best),
      s"the appended vector must score the maximal ADC estimate: " +
        served.mkString(", "))
    // refusals BEFORE any byte lands
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.append(spark, dirA, b.limit(1))
    }
    assert(e1.getMessage.contains("INDEX APPEND REFUSED") &&
      e1.getMessage.contains("already present"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.append(spark, dirA,
        b.limit(1).select(lit(null).cast("long").as("vec_id"),
          col("embedding")))
    }
    assert(e2.getMessage.contains("INDEX APPEND REFUSED") &&
      e2.getMessage.contains("NULL"))
    assert(VectorIndex.readMeta(spark, dirA).n == total,
      "refused appends must not touch the meta")
  }

  test("probeRerank at nprobe=2 ≡ inline pqRerank at nprobe=2 (served refine × nprobe)") {
    val mt = VectorIndex.readMeta(spark, idxDir)
    val inline = Similarity.pqRerank(vecs, "vec_id", "embedding",
      anchorPred, probePred, 5, mt.bits, nprobe = 2)
    val probed = VectorIndex.probeRerank(spark, idxDir, probes, 5,
      nprobe = 2)
    assert(rows(probed) == rows(inline))
  }

  test("delete: removed ids never answer any probe path; ≡ rebuild without them; replace cycle; refusals") {
    val dirD = java.nio.file.Files.createTempDirectory("graft_idx_d").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft_idx_r").toString
    VectorIndex.write(vecs, "vec_id", "embedding", anchorPred, dirD,
      stamp = "D")
    // delete NON-anchor, NON-probe ids so (a) a rebuild on the
    // survivors picks the identical anchors (≡ is meaningful) and
    // (b) the probe set is unchanged
    val delPred = col("vec_id") % 5 === 4 && col("vec_id") % 17 =!= 0 &&
      col("vec_id") % 11 === 3
    val delIds = vecs.filter(delPred).select("vec_id").localCheckpoint(true)
    val nDel = delIds.count()
    assert(nDel > 0, "fixture must yield at least one deletable id")
    val kept = VectorIndex.delete(spark, dirD, delIds)
    assert(kept == vecs.count() - nDel, "meta must track the post-delete total")
    assert(VectorIndex.readMeta(spark, dirD).n == kept)
    // no probe path may ever serve a deleted id
    val delSet = delIds.collect().map(_.getLong(0)).toSet
    for ((name, df) <- Seq(
        "probe" -> VectorIndex.probe(spark, dirD, probes, 5, nprobe = 2),
        "probePq" -> VectorIndex.probePq(spark, dirD, probes, 5),
        "probeRerank" -> VectorIndex.probeRerank(spark, dirD, probes, 5,
          nprobe = 2))) {
      val leaked = df.collect()
        .filter(r => delSet.contains(r.getAs[Long]("neighbor_id")))
      assert(leaked.isEmpty, s"$name served deleted ids: ${leaked.toSeq}")
    }
    // raw-vector path ≡ a rebuild without the deleted vectors (same
    // anchors by construction; the PQ path additionally keeps the
    // frozen codebook, the append contract's documented difference)
    VectorIndex.write(vecs.filter(!delPred), "vec_id", "embedding",
      anchorPred, dirR, stamp = "R")
    assert(rows(VectorIndex.probe(spark, dirD, probes, 5, nprobe = 2)) ==
      rows(VectorIndex.probe(spark, dirR, probes, 5, nprobe = 2)),
      "probe after delete must equal probe over the rebuilt survivor index")
    // replace cycle: append the deleted vectors back — raw probe path
    // returns to the original index's answers (frozen quantizer)
    VectorIndex.append(spark, dirD, vecs.filter(delPred)
      .select("vec_id", "embedding").localCheckpoint(true))
    assert(rows(VectorIndex.probe(spark, dirD, probes, 5, nprobe = 2)) ==
      rows(VectorIndex.probe(spark, idxDir, probes, 5, nprobe = 2)),
      "delete + append of the same vectors must restore the raw probe path")
    // refusals: unknown id, NULL id — and neither touches meta
    val before = VectorIndex.readMeta(spark, dirD).n
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.delete(spark, dirD, delIds.select(
        (col("vec_id") + 100000000L).as("vec_id")))
    }
    assert(e1.getMessage.contains("INDEX DELETE REFUSED") &&
      e1.getMessage.contains("not present"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.delete(spark, dirD,
        delIds.limit(1).select(lit(null).cast("long").as("vec_id")))
    }
    assert(e2.getMessage.contains("INDEX DELETE REFUSED") &&
      e2.getMessage.contains("NULL"))
    assert(VectorIndex.readMeta(spark, dirD).n == before,
      "refused deletes must not touch the meta")
  }

  test("softDelete: O(|ids|) tombstones — probes hide pre-top-k ≡ survivor rebuild; fold clears; resurrect refused") {
    val dirS = java.nio.file.Files.createTempDirectory("graft_idx_s").toString
    val dirR2 = java.nio.file.Files.createTempDirectory("graft_idx_s_r").toString
    VectorIndex.write(vecs, "vec_id", "embedding", anchorPred, dirS,
      stamp = "S")
    VectorIndex.writeSq8(spark, dirS)
    val baseN = VectorIndex.readMeta(spark, dirS).n
    // non-anchor, non-probe ids (same reasoning as the delete test)
    val delPred = col("vec_id") % 5 === 4 && col("vec_id") % 17 =!= 0 &&
      col("vec_id") % 11 === 3
    val delIds = vecs.filter(delPred).select("vec_id").localCheckpoint(true)
    val nDel = delIds.count()
    assert(nDel > 0)
    def tableFiles(t: String) = new java.io.File(s"$dirS/$t").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    val before = (tableFiles("assigned"), tableFiles("codes"), tableFiles("sq8"))
    assert(VectorIndex.softDelete(spark, dirS, delIds) == nDel)
    assert((tableFiles("assigned"), tableFiles("codes"), tableFiles("sq8"))
      == before,
      "a soft delete must land O(|ids|) tombstones, never rewrite the tables")
    assert(VectorIndex.readMeta(spark, dirS).n == baseN,
      "meta.n stays the BASE count until a fold materializes the view")
    // no probe path may serve a tombstoned id, and the raw path must
    // equal a rebuild on the survivors (pre-top-k hiding = full k)
    val delSet = delIds.collect().map(_.getLong(0)).toSet
    for ((name, df) <- Seq(
        "probe" -> VectorIndex.probe(spark, dirS, probes, 5, nprobe = 2),
        "probePq" -> VectorIndex.probePq(spark, dirS, probes, 5),
        "probeRerank" -> VectorIndex.probeRerank(spark, dirS, probes, 5,
          nprobe = 2),
        "probeSq8" -> VectorIndex.probeSq8(spark, dirS, probes, 5))) {
      val leaked = df.collect()
        .filter(r => delSet.contains(r.getAs[Long]("neighbor_id")))
      assert(leaked.isEmpty, s"$name served tombstoned ids: ${leaked.toSeq}")
    }
    VectorIndex.write(vecs.filter(!delPred), "vec_id", "embedding",
      anchorPred, dirR2, stamp = "R2")
    val servedPreFold = rows(VectorIndex.probe(spark, dirS, probes, 5,
      nprobe = 2))
    assert(servedPreFold ==
      rows(VectorIndex.probe(spark, dirR2, probes, 5, nprobe = 2)),
      "probe under tombstones must equal probe over the survivor rebuild")
    // refusals: re-deleting a tombstoned id (not live), resurrect via append
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.softDelete(spark, dirS, delIds.limit(1))
    }
    assert(e1.getMessage.contains("not live"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.append(spark, dirS, vecs.filter(delPred)
        .select("vec_id", "embedding").limit(1).localCheckpoint(true))
    }
    assert(e2.getMessage.contains("pending-tombstoned"))
    // compact FOLDS: tombstones clear, meta.n drops to the live count,
    // every probe path bit-identical to its pre-fold answers
    assert(VectorIndex.compact(spark, dirS) == baseN - nDel)
    assert(!new java.io.File(s"$dirS/_deletes").exists,
      "a fold must clear the tombstones it materialized")
    assert(VectorIndex.readMeta(spark, dirS).n == baseN - nDel)
    assert(rows(VectorIndex.probe(spark, dirS, probes, 5, nprobe = 2))
      == servedPreFold,
      "the fold must not change a single served answer")
    // and the formerly-tombstoned ids are appendable again (replace cycle)
    VectorIndex.append(spark, dirS, vecs.filter(delPred)
      .select("vec_id", "embedding").localCheckpoint(true))
    assert(rows(VectorIndex.probe(spark, dirS, probes, 5, nprobe = 2)) ==
      rows(VectorIndex.probe(spark, idxDir, probes, 5, nprobe = 2)),
      "fold + append of the same vectors must restore the raw probe path")
  }

  test("filtered probe (candIds) ≡ probe over an index physically reduced to the matching vectors") {
    // the s25 contract: the id filter hides RESULTS, not geometry —
    // so filtering the stored candidates at probe time must equal
    // probing an index whose tables were hard-delete-reduced to the
    // same id set (same anchors, same cells, same banding bits)
    val dirF = java.nio.file.Files.createTempDirectory("graft_idx_f").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(idxDir), new java.io.File(dirF))
    val keepPred = col("vec_id") % 3 =!= 2 // ~2/3 of the corpus matches
    val dropIds = vecs.filter(!keepPred).select("vec_id").localCheckpoint(true)
    VectorIndex.delete(spark, dirF, dropIds)
    val filtered = VectorIndex.probe(spark, idxDir, probes, 5, nprobe = 2,
      candIds = Some(vecs.filter(keepPred).select("vec_id")))
    assert(rows(filtered) ==
      rows(VectorIndex.probe(spark, dirF, probes, 5, nprobe = 2)),
      "candIds-filtered probe must equal the physically-reduced index")
    // and no excluded id ever surfaces
    val dropSet = dropIds.collect().map(_.getLong(0)).toSet
    assert(filtered.collect()
      .forall(r => !dropSet.contains(r.getAs[Long]("neighbor_id"))))
  }

  test("append retry after a torn publish converges (content-tag sweep)") {
    val dirT = java.nio.file.Files.createTempDirectory("graft_idx_t").toString
    val a = vecs.filter(col("vec_id") % 5 =!= 4)
    val b = vecs.filter(col("vec_id") % 5 === 4).localCheckpoint(true)
    VectorIndex.write(a, "vec_id", "embedding", anchorPred, dirT, stamp = "T")
    val total = VectorIndex.append(spark, dirT, b)
    // simulate the crash window: codes published, assigned not — by
    // removing the batch's tagged files from assigned only (the
    // publish order is codes-then-assigned, so this is the state a
    // crash between the two renames leaves behind)
    val assignedDir = new java.io.File(s"$dirT/assigned")
    val tagged = assignedDir.listFiles().filter(_.getName.startsWith("ap-"))
    assert(tagged.nonEmpty, "appended files must carry the content tag")
    tagged.foreach(f => assert(f.delete()))
    spark.catalog.clearCache()
    // the RETRY of the same batch must converge — not refuse on the
    // leftover codes — and restore the exact post-append state
    assert(VectorIndex.append(spark, dirT, b) == total)
    assert(spark.read.parquet(s"$dirT/assigned").count() == total)
    val mt = VectorIndex.readMeta(spark, dirT)
    assert(spark.read.parquet(s"$dirT/codes").count() == total * mt.m,
      "swept leftover codes must not double-count after the retry")
    // and within-batch duplicate ids refuse by name
    val e = intercept[IllegalArgumentException] {
      VectorIndex.append(spark, dirT,
        b.limit(1).select((col("vec_id") + 1000000L).as("vec_id"),
            col("embedding"))
          .unionAll(b.limit(1).select(
            (col("vec_id") + 1000000L).as("vec_id"), col("embedding"))))
    }
    assert(e.getMessage.contains("INDEX APPEND REFUSED") &&
      e.getMessage.contains("within the batch"))
  }

  test("compact restores global cell-clustering after appends; probes bit-identical") {
    val dirC = java.nio.file.Files.createTempDirectory("graft_idx_c").toString
    val a = vecs.filter(col("vec_id") % 5 =!= 4)
    val b = vecs.filter(col("vec_id") % 5 === 4).localCheckpoint(true)
    VectorIndex.write(a, "vec_id", "embedding", anchorPred, dirC, stamp = "C")
    VectorIndex.append(spark, dirC, b)
    // the appended batch is internally clustered but file ranges now
    // OVERLAP across groups — the thing compact exists to fix
    def ranges(tbl: String) = spark.read.parquet(s"$dirC/$tbl")
      .select(col("cell"), input_file_name().as("f"))
      .groupBy("f").agg(min("cell").as("lo"), max("cell").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    def overlaps(rs: Array[(Long, Long)]) =
      rs.length > 1 && rs.sliding(2).exists {
        case Array((_, hi1), (lo2, _)) => hi1 > lo2
        case _ => false
      }
    val pre = VectorIndex.probe(spark, dirC, probes, 5, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    val prePq = VectorIndex.probePq(spark, dirC, probes, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(overlaps(ranges("assigned")),
      "fixture must actually produce overlapping file ranges pre-compact " +
        "(base + appended group) — otherwise this test pins nothing")
    val n = VectorIndex.compact(spark, dirC)
    assert(n == vecs.count(), "compact must not change the total")
    assert(VectorIndex.readMeta(spark, dirC).n == n)
    for (tbl <- Seq("assigned", "codes")) {
      val rs = ranges(tbl)
      rs.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"$tbl still overlaps after compact: $hi1 > $lo2")
        case _ =>
      }
    }
    // values untouched ⇒ probes identical on both paths
    assert(VectorIndex.probe(spark, dirC, probes, 5, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq == pre)
    assert(VectorIndex.probePq(spark, dirC, probes, 5)
      .collect().map(_.toString).sorted.toSeq == prePq)
  }

  // ---- SQ8 component (writeSq8 / probeSq8 / lifecycle lockstep) ----

  private lazy val sq8Dir = {
    // own directory: writeSq8 adds tables, and the pristine idxDir
    // pins above must keep seeing a component-free index
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_s8").toString
    VectorIndex.write(vecs, "vec_id", "embedding", anchorPred, dir,
      stamp = "spec")
    VectorIndex.writeSq8(spark, dir)
    dir
  }

  test("probeSq8 ≡ inline s17 (sq8Knn) bit-for-bit; plan reads no floats and fits nothing") {
    assert(VectorIndex.hasSq8(spark, sq8Dir) &&
      !VectorIndex.hasSq8(spark, idxDir))
    val served = VectorIndex.probeSq8(spark, sq8Dir, probes, 5)
    val inline = Similarity.sq8Knn(vecs, "vec_id", "embedding",
      probePred, 5, bits = Similarity.corpusBits(vecs.count()))
    assert(rows(served) == rows(inline),
      "the persisted SQ8 path must be the same computation, not an approximation")
    val p = served.queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet"),
      "probeSq8 plan scans the corpus:\n" + p.take(1200))
    // quantizer fitting is min/max over try_element_at — absent from
    // a serving plan (the probe's own coding uses plain element_at
    // against the stored constants)
    assert(!p.contains("try_element_at"),
      "probeSq8 plan fits a quantizer:\n" + p.take(1200))
  }

  test("append keeps sq8 in lockstep: frozen-quantizer codes serve the new vector; counts verified") {
    val dirS = java.nio.file.Files.createTempDirectory("graft_idx_s8a").toString
    VectorIndex.write(vecs, "vec_id", "embedding", anchorPred, dirS,
      stamp = "spec")
    VectorIndex.writeSq8(spark, dirS)
    val newV = vecs.filter(col("vec_id").isin(3, 5))
      .select((col("vec_id") + 500000).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val total = VectorIndex.append(spark, dirS, newV)
    assert(spark.read.parquet(s"$dirS/sq8").count() ==
      total * VectorIndex.readMeta(spark, dirS).tables,
      "every appended vector must band into the sq8 table")
    // the appended COPY of vec 3's vector answers a probe of vec 3 at
    // rank 1 / cos 1.0: identical embedding → identical frozen-quantizer
    // codes → exact match through the served path
    val pr = vecs.filter(col("vec_id") === 3).localCheckpoint(true)
    val top = VectorIndex.probeSq8(spark, dirS, pr, 3)
      .filter(col("rn") === 1).select("neighbor_id", "cos6")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top == Seq((500003L, 1.0)), top.toString)
  }

  test("delete/compact rewrite sq8: removed id never answers probeSq8; compact bit-identical") {
    val dirD = java.nio.file.Files.createTempDirectory("graft_idx_s8d").toString
    VectorIndex.write(vecs, "vec_id", "embedding", anchorPred, dirD,
      stamp = "spec")
    VectorIndex.writeSq8(spark, dirD)
    // results are COLLECTED before each mutation: a flip renames the
    // files a pre-flip plan captured (the documented reader contract —
    // re-resolve after a rewrite; retained .old-g copies cover
    // in-flight scans, not re-executions)
    val victim = VectorIndex.probeSq8(spark, dirD, probes, 5)
      .filter(col("rn") === 1).select("neighbor_id").head().getLong(0)
    import spark.implicits._
    val nAfter = VectorIndex.delete(spark, dirD,
      Seq(victim).toDF("vec_id"), retainMs = 0L)
    assert(spark.read.parquet(s"$dirD/sq8").count() ==
      nAfter * VectorIndex.readMeta(spark, dirD).tables)
    val afterDf = VectorIndex.probeSq8(spark, dirD, probes, 5)
    assert(afterDf.select("neighbor_id").as[Long].collect()
      .forall(_ != victim),
      s"deleted id $victim still answers the SQ8 path")
    val afterRows = rows(afterDf)
    VectorIndex.compact(spark, dirD, retainMs = 0L)
    assert(rows(VectorIndex.probeSq8(spark, dirD, probes, 5)) == afterRows,
      "compact must not change SQ8 probe results")
  }

  test("s21 hybrid fusion ≡ hand-computed RRF of its two served lists; no corpus text scan") {
    // the fused ranking recomputed IN THE TEST from the two component
    // lists' collected rows — exact integer micros, so equality is
    // bitwise, not approximate: RRF over served lists is pure
    // arithmetic the spec can own
    val q = Registry.byName("s21_hybrid_index").run(spark, TestSpark.sf)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val dirT = graft.queries.Text.ensureTextIndex(spark, TestSpark.sf)
    val lex = graft.operators.TextIndex.moreLikeThis(spark, dirT, 1L, 20)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }
    val dirV = graft.queries.Embed.ensureIndex(spark, TestSpark.sf)
    val vec = VectorIndex.probeRerank(spark, dirV,
        vecs.filter(col("vec_id") === 1), 5, nprobe = 2)
      .select("neighbor_id", "rn").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val fused = (lex ++ vec).groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(r => 1000000L / (60 + r._2)).sum }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
      .map { case ((id, s), i) => (1L, i + 1, id, s) }
    assert(got.toSeq == fused,
      s"fused list diverges from hand RRF:\n${got.toSeq}\nvs\n$fused")
    // both retrieval halves are SERVED: the plan never tokenizes the
    // corpus (documents parquet absent) — embeddings appear only as
    // the probe row + the refine stage's candidate vectors
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "hybrid probe plan must not scan the text corpus:\n" + plan.take(800))
  }

  test("assigned/codes land sort-clustered on cell (disjoint file ranges)") {
    // every persisted corpus-sized table must be cell-clustered so a
    // cell-restricted probe batch can skip files on footer min/max
    for (tbl <- Seq("assigned", "codes")) {
      val df = spark.read.parquet(s"$idxDir/$tbl")
        .select(col("cell"), input_file_name().as("f"))
      val ranges = df.groupBy("f")
        .agg(min("cell").as("lo"), max("cell").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"$tbl files overlap on cell: $hi1 > $lo2")
        case _ =>
      }
    }
  }
}
