package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED ANN index lifecycle — build once, probe many.
  *
  * Every inline ANN composition (s2/s6/s8/s9/s10) rebuilds its
  * bands, cell assignment, codebook, and codes per invocation: right
  * for a one-shot batch job, wrong for the serving shape a vector
  * store actually deploys — the reference's own design writes the
  * blob once and serves the pointer many times (reference
  * lambda_fns/order.js:650 reads `s3_prefix` without re-running the
  * migration). [[write]] runs the training-side passes ONCE and
  * persists four lake tables under one index directory:
  *
  *  - `anchors`   (cell, ce) — the coarse-quantizer anchor vectors
  *  - `assigned`  (id, emb, cell) — the banded cell assignment of the
  *                corpus, sort-clustered on `cell`
  *                ([[graft.sources.LakeSink.writeSorted]]) so every
  *                file covers a disjoint cell range: a probe batch
  *                restricted to few cells skips files on footer
  *                min/max, and repeated cell-key joins see clustered
  *                input
  *  - `codebook`  (m, k, cvec) — the trained fixed-K PQ codebook
  *  - `codes`     (id, m, code, cell) — 8 small ints per vector, the
  *                compressed representation ADC scans
  *  - `meta`      1 row: sizes, the pinned `bits` value
  *                ([[Similarity.corpusBits]] at build time — probes
  *                MUST band with the index's bits, not recompute
  *                their own), column names, and the caller's
  *                staleness stamp
  *  - `sq8` / `sq8quant` (OPTIONAL, [[writeSq8]]) — the byte-
  *                quantized serving path: banded offset-128 codes
  *                (no floats) + the frozen per-dim quantizer;
  *                maintained in lockstep by append/delete/compact
  *
  *
  * The probe paths ([[probe]]/[[probePq]]/[[probeRerank]]) plan ZERO
  * training stages: no k-means, no codebook Lloyd, no corpus
  * banding — the only corpus-sized inputs are the persisted tables,
  * and the only per-probe work is band lookup + candidate scoring.
  * Results are BIT-IDENTICAL to the inline s8/s6/s10 compositions on
  * the same corpus/probes (IndexSpec pins it): the persisted tables
  * hold exactly the values the inline queries compute, parquet
  * round-trips floats exactly, and the probe-side arithmetic is the
  * SAME factored code ([[Similarity.searchAssigned]],
  * [[Similarity.adcRank]]), not a reimplementation.
  *
  * Scale shape at 100 TB: build cost equals one inline query's
  * training side and is amortized over every probe batch; a probe
  * batch costs |probes|·(bands + nprobe·cell-depth) — corpus-free.
  * The assigned/codes tables are the only corpus-sized artifacts and
  * stream through the probe join (small probe side broadcasts).
  */
object VectorIndex {

  final case class Meta(n: Long, kAnchors: Long, bits: Int, tables: Int,
      m: Int, d: Int, codebookK: Int, idCol: String, embCol: String,
      stamp: String)

  /** Build + persist the index. One pass for the banded assignment,
    * one for codebook training, one (over the persisted assignment)
    * for encode — the same work one inline s6 query does, done once.
    * `stamp` is an opaque caller-supplied staleness token (e.g. a
    * digest of the source table's file listing) that [[readMeta]]
    * surfaces so callers can detect a regenerated corpus. */
  def write(vectors: DataFrame, id: String, emb: String,
      anchorPred: Column, dir: String, m: Int = 8, d: Int = 8,
      codebookK: Int = 64, tables: Int = Similarity.LSH_TABLES,
      occupancy: Int = 4, stamp: String = ""): Meta = {
    val spark = vectors.sparkSession
    val anchors = vectors.filter(anchorPred)
      .select(col(id).as("cell"), col(emb).as("ce"))
    val kA = anchors.count()
    val n = vectors.count()
    val bits = Similarity.corpusBits(kA, occupancy)
    anchors.write.mode("overwrite").parquet(s"$dir/anchors")
    // the banded cell assignment — the expensive corpus pass — runs
    // ONCE and lands sort-clustered on cell; the encode below reads
    // it BACK from parquet (clean lineage, no double compute, and the
    // codes provably derive from the exact bytes probes will read)
    val assigned = Similarity.argmaxAssignLsh(vectors, id, emb, anchors,
      bits, tables, (a, b) => Similarity.cosR(a, b))
    val nFiles = math.max(1L, n / 500000L).toInt
    graft.sources.LakeSink.writeSorted(assigned, s"$dir/assigned",
      "parquet", Seq("cell"), nFiles)
    val assignedIdx = spark.read.parquet(s"$dir/assigned")
    val cb = Similarity.trainPqCodebook(vectors, id, emb, codebookK, m, d)
    cb.write.mode("overwrite").parquet(s"$dir/codebook")
    val cbIdx = broadcast(spark.read.parquet(s"$dir/codebook"))
    graft.sources.LakeSink.writeSorted(
      Similarity.pqEncode(assignedIdx, id, emb, cbIdx, m, d),
      s"$dir/codes", "parquet", Seq("cell"), nFiles)
    val mt = Meta(n, kA, bits, tables, m, d, codebookK, id, emb, stamp)
    writeMeta(spark, dir, mt)
    mt
  }

  /** INCREMENTAL index maintenance — the other half of build-once:
    * new vectors are quantized by the FROZEN coarse quantizer and
    * codebook (assigned + encoded against the stored anchors/
    * codebook — the standard IVF insert contract: incremental adds
    * never retrain; drifted distributions retrain via a fresh
    * [[write]]) and APPENDED to the assigned/codes tables, each
    * batch internally cell-clustered. Cost is |batch|, never
    * |corpus| — the existing tables are only touched by the id-
    * collision guard's column-pruned key scan.
    *
    * REFUSES BY NAME a batch carrying ids already in the index (a
    * duplicate id would answer probes with two rows for one vector),
    * a NULL id, or an id duplicated WITHIN the batch. For the
    * exact-vector probe path the result equals a full rebuild with
    * the same anchors bit-for-bit (IndexSpec pins it); the PQ path
    * differs from a rebuild only in that the codebook stays frozen
    * (rebuild re-seeds it from the grown corpus). Returns the new
    * total vector count.
    *
    * CRASH SAFETY (the LakeSink.publishGeneration discipline at the
    * path level): the batch's assigned and codes files are written to
    * a STAGING dir, count-verified against the independently-computed
    * batch size, and only then MOVED into the live tables — tagged
    * `ap-<contentTag>-` so a crash mid-publish is recoverable: a
    * RETRY of the same batch (same key content → same tag) first
    * sweeps any same-tag leftovers from both tables, so the
    * duplicate-id guard sees a clean index and the append converges
    * instead of refusing. `meta` is rewritten LAST, with `n`
    * recomputed from the published table (never `old n + batch` — a
    * stale meta can't survive a repaired crash). Files move codes
    * first, then assigned: the window where the two tables disagree
    * is bounded by two renames, and the SINGLE-WRITER contract
    * (same as appendEvolved/mergeKeyed) says no concurrent appends;
    * concurrent PROBES during the publish window may see the batch in
    * one path and not the other — serving tiers that need a hard cut
    * probe a copied index and flip directories, exactly like
    * publishGeneration's catalog flip.
    *
    * `newStamp` advances the index's staleness token with the batch
    * (a streamed-maintenance loop stamps each micro-batch so serving
    * tiers can observe index progress); None keeps the build stamp. */
  def append(spark: SparkSession, dir: String, newVectors: DataFrame,
      newStamp: Option[String] = None): Long = {
    val mt = readMeta(spark, dir)
    val (id, emb) = (mt.idCol, mt.embCol)
    IndexLifecycle.guardBatch(newVectors, id,
      " — a duplicate id would serve two rows for one vector")
    val tag = IndexLifecycle.batchTag(newVectors, id)
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    IndexLifecycle.sweepTag(fs, dir, Seq("assigned", "codes", "sq8"), tag)
    // a pending-tombstoned id must never resurrect through an append
    // (tombstones win because nothing may land after them) — checked
    // BEFORE the collision guard so the refusal names the real cause
    // (the id is still physically in `assigned` until a fold)
    tombIds(spark, dir, id).foreach { t =>
      val nTomb = newVectors.join(broadcast(t), Seq(id), "left_semi").count()
      require(nTomb == 0,
        s"INDEX APPEND REFUSED: $nTomb ids are pending-tombstoned — " +
          "compact first, then append deliberately")
    }
    IndexLifecycle.guardNoCollision(newVectors, id,
      spark.read.parquet(s"$dir/assigned").select(col(id)),
      " — a duplicate id would serve two rows for one vector; removal is " +
        "[[delete]], replacement is delete + append")
    val anchors = spark.read.parquet(s"$dir/anchors")
    val cb = broadcast(spark.read.parquet(s"$dir/codebook"))
    // assignment computed once (localCheckpoint: consumed by both the
    // assigned stage and the encode), then landed cell-clustered
    val na = Similarity.argmaxAssignLsh(
        newVectors.select(col(id), col(emb)), id, emb, anchors,
        mt.bits, mt.tables, (a, b) => Similarity.cosR(a, b))
      .localCheckpoint(true)
    val nNew = na.count()
    val nFiles = math.max(1L, nNew / 500000L).toInt
    val stage = s"$dir/.stage-$tag"
    na.repartitionByRange(nFiles, col("cell")).sortWithinPartitions(col("cell"))
      .write.mode("overwrite").parquet(s"$stage/assigned")
    Similarity.pqEncode(na, id, emb, cb, mt.m, mt.d)
      .repartitionByRange(nFiles, col("cell")).sortWithinPartitions(col("cell"))
      .write.mode("overwrite").parquet(s"$stage/codes")
    // the SQ8 component, when present, stays in lockstep: the batch
    // is coded by the FROZEN quantizer and banded with the pinned
    // bits, staged and verified with the rest
    val withSq8 = hasSq8(spark, dir)
    if (withSq8) {
      val q = spark.read.parquet(s"$dir/sq8quant").head()
      val code = Similarity.sq8Code(col(emb),
        typedLit(q.getSeq[Double](q.fieldIndex("mn"))),
        typedLit(q.getSeq[Double](q.fieldIndex("mx"))))
      Similarity.corpusBands(
          newVectors.select(col(id), col(emb)).withColumn("__qc", code),
          id, emb, q.getAs[Int]("bits"), mt.tables, Seq("__qc"))
        .select(col(id), col("__qc"), col("t"), col("bkt"))
        .repartitionByRange(nFiles, col("t"), col("bkt"))
        .sortWithinPartitions(col("t"), col("bkt"))
        .write.mode("overwrite").parquet(s"$stage/sq8")
    }
    // verify the staged copies BEFORE any live table changes: a short
    // write aborts with the index untouched
    IndexLifecycle.verifyStaged(spark, fs, stage,
      Seq("assigned" -> nNew, "codes" -> nNew * mt.m) ++
        (if (withSq8) Seq("sq8" -> nNew * mt.tables) else Nil), "batch")
    IndexLifecycle.publishStagedAll(fs, stage, dir,
      (if (withSq8) Seq("sq8") else Nil) ++ Seq("codes", "assigned"), tag)
    // meta LAST, n recomputed from the published table (parquet
    // footer counts — no data scan), so a repaired crash can't leave
    // a stale n behind
    val total = spark.read.parquet(s"$dir/assigned").count()
    writeMeta(spark, dir, mt.copy(n = total,
      stamp = newStamp.getOrElse(mt.stamp)))
    total
  }

  /** DELETE from the persisted index — the removal lifecycle a
    * GDPR-style request needs without a full rebuild: the assigned
    * and codes tables are REWRITTEN minus the given ids (cost is one
    * column-pruned scan + filtered rewrite of each — |corpus|-sized
    * but train-free: no k-means, no codebook, no banding), verified
    * against independently-computed expected counts, then swapped in
    * with one directory rename per table (the path-level form of
    * publishGeneration's location flip). The superseded copies are
    * retained as `<table>.old-g<gen>` for `retainMs` — a reader that
    * resolved file paths before the flip finishes its scan — and
    * reclaimed by the NEXT delete (gcOrphans' grace-window rule).
    *
    * REFUSES BY NAME a NULL id and ids not present in the index (a
    * silently-ignored unknown id would report a removal that never
    * happened). Duplicate ids in the request are harmless (distinct
    * applied). Probe results after a delete ≡ a rebuild without the
    * deleted vectors for the raw path (same assignment rows), and
    * ≡ frozen-quantizer relative order for the PQ path (codes are
    * the same bytes minus the deleted rows) — IndexSpec pins both,
    * plus append-after-delete of the same ids (the replace cycle).
    * Single-writer, like [[append]]. Returns the new total. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      retainMs: Long = 600000L): Long = {
    val mt = readMeta(spark, dir)
    val id = mt.idCol
    val nNull = ids.filter(col(id).isNull).count()
    require(nNull == 0,
      s"INDEX DELETE REFUSED: $nNull rows carry a NULL $id")
    val del = ids.select(col(id)).distinct().localCheckpoint(true)
    // reclaim superseded copies past the retention window (and any
    // half-written stage of a crashed previous delete)
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    // liveness is the SERVED view (base minus pending tombstones) —
    // deleting an already-soft-deleted id would double-report
    val assigned = minusTombs(spark, dir,
      spark.read.parquet(s"$dir/assigned"), id)
    val nUnknown = del.join(assigned.select(col(id)), Seq(id), "left_anti")
      .count()
    require(nUnknown == 0,
      s"INDEX DELETE REFUSED: $nUnknown ids not present in the index — " +
        "a silently-ignored id would report a removal that never happened")
    // the rewrite FOLDS pending tombstones too — the materialized
    // copy is the served view, and `_deletes/` clears with the flip.
    // Expected count comes from the FOLDED frame itself, not meta.n
    // arithmetic: a crash between a prior rewrite's flip and its
    // `_deletes` cleanup leaves tables already folded under a stale
    // meta.n, and the arithmetic could never match the staged recount
    // (maintenance would wedge until `_deletes` was removed by hand)
    val expectA = assigned.join(del, Seq(id), "left_anti").count()
    rewriteTables(spark, dir, mt, expectA,
      df => minusTombs(spark, dir, df.join(del, Seq(id), "left_anti"), id))
  }

  // ---- SOFT DELETES (merge-on-read tombstones, the lake's a22/a33
  // contract applied to the index tier) ------------------------------

  /** the committed tombstone batches under `<dir>/_deletes`, if any */
  private def tombBatches(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(dir, "_deletes"), "b-*")))
      .getOrElse(Array.empty).toIndexedSeq.map(_.getPath.toString)
  }

  private def tombIds(spark: SparkSession, dir: String,
      id: String): Option[DataFrame] = {
    val bs = tombBatches(spark, dir)
    if (bs.isEmpty) None
    else {
      val t = spark.read.parquet(bs: _*)
      require(t.columns.toSeq == Seq(id),
        s"INDEX TOMBSTONES carry '${t.columns.mkString(",")}', index id is '$id'")
      Some(t)
    }
  }

  /** serve-side tombstone application: one BROADCAST anti-join on the
    * (tombstone-sized) id set, zero-cost when no soft delete is
    * pending. Applied to the CANDIDATE tables before any top-k, so a
    * probe still returns full k from the survivors — a post-top-k
    * discard would lose result slots. */
  private def minusTombs(spark: SparkSession, dir: String, df: DataFrame,
      id: String): DataFrame =
    tombIds(spark, dir, id).fold(df)(t =>
      df.join(broadcast(t), Seq(id), "left_anti"))

  /** SOFT DELETE from the persisted index — O(|ids|) I/O where
    * [[delete]] rewrites the corpus-sized tables: the id batch lands
    * under `_deletes/b-*` (stage → recount-verify → ONE rename, the
    * lake's tombstone contract) and every probe path applies the
    * accumulated set as a broadcast anti-join BEFORE its top-k. The
    * next [[delete]] or [[compact]] FOLDS the tombstones into the
    * rewrite and clears them — soft deletes are how a serving index
    * absorbs a continuous removal stream between maintenance windows
    * (the same deferral a 100 TB lake table gets from a22).
    * REFUSES NULL ids and ids not live in the served view;
    * [[append]] refuses resurrecting a pending-tombstoned id, so
    * tombstones never race appends. Returns the batch's id count. */
  def softDelete(spark: SparkSession, dir: String, ids: DataFrame): Long = {
    val mt = readMeta(spark, dir)
    val id = mt.idCol
    val nNull = ids.filter(col(id).isNull).count()
    require(nNull == 0,
      s"INDEX SOFT DELETE REFUSED: $nNull rows carry a NULL $id")
    val del = ids.select(col(id)).distinct().localCheckpoint(true)
    val live = minusTombs(spark, dir,
      spark.read.parquet(s"$dir/assigned").select(col(id)), id)
    val nUnknown = del.join(live, Seq(id), "left_anti").count()
    require(nUnknown == 0,
      s"INDEX SOFT DELETE REFUSED: $nUnknown ids not live in the index — " +
        "a silently-ignored id would report a removal that never happened")
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val stage = new org.apache.hadoop.fs.Path(dir, s".tmp-sdel-$tag")
    del.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val staged = spark.read.parquet(stage.toString).count()
    val expected = del.count()
    if (staged != expected) {
      fs.delete(stage, true)
      throw new java.io.IOException(
        s"staged tombstone batch short: $staged of $expected ids; " +
          "aborting — index unchanged")
    }
    val dels = new org.apache.hadoop.fs.Path(dir, "_deletes")
    fs.mkdirs(dels)
    val dest = new org.apache.hadoop.fs.Path(dels, s"b-$tag")
    require(fs.rename(stage, dest),
      s"tombstone publish failed: $stage -> $dest")
    expected
  }

  /** POST-MAINTENANCE COMPACTION — the index's [[graft.sources.LakeSink.compact]]:
    * every [[append]] lands its own (internally cell-clustered)
    * files, so after N batches the assigned/codes tables hold N+1
    * file groups whose cell ranges OVERLAP — a cell-restricted probe
    * stops skipping files on footer min/max. Compact rewrites both
    * tables as ONE sort-clustered copy (global disjoint cell ranges
    * restored, small files merged to the 500k-rows/file rule) through
    * the same staged-verify-flip machinery as [[delete]]; values are
    * untouched, so probes are bit-identical before and after
    * (IndexSpec pins both properties). Run it on the append cadence,
    * like a lakehouse OPTIMIZE. */
  def compact(spark: SparkSession, dir: String,
      retainMs: Long = 600000L): Long = {
    val mt = readMeta(spark, dir)
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    // pending soft-delete tombstones FOLD into the rewrite (and clear
    // with the flip) — compaction materializes the served view.
    // Expected count from the folded frame, not meta.n arithmetic
    // (the crashed-prior-rewrite reconciliation — see [[delete]])
    val expectA = minusTombs(spark, dir,
      spark.read.parquet(s"$dir/assigned"), mt.idCol).count()
    rewriteTables(spark, dir, mt, expectA,
      df => minusTombs(spark, dir, df, mt.idCol))
  }

  /** the shared staged-rewrite-verify-flip of assigned+codes
    * ([[delete]] filters, [[compact]] keeps everything): write both
    * tables' transformed copies sort-clustered into a stage dir,
    * verify counts against the independently-computed expectation,
    * swap in with one rename pair per table (superseded copies
    * retained as `<table>.old-g<stamp>` for the retention window),
    * rewrite meta last. */
  private def rewriteTables(spark: SparkSession, dir: String, mt: Meta,
      expectA: Long, xform: DataFrame => DataFrame): Long = {
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    val stage = s"$dir/.stage-del"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    val nFiles = math.max(1L, expectA / 500000L).toInt
    xform(spark.read.parquet(s"$dir/assigned"))
      .repartitionByRange(nFiles, col("cell")).sortWithinPartitions(col("cell"))
      .write.parquet(s"$stage/assigned")
    xform(spark.read.parquet(s"$dir/codes"))
      .repartitionByRange(nFiles, col("cell")).sortWithinPartitions(col("cell"))
      .write.parquet(s"$stage/codes")
    // the SQ8 band table, when present, goes through the same
    // filtered rewrite, keeping its own (t, bkt) clustering
    val withSq8 = hasSq8(spark, dir)
    if (withSq8)
      xform(spark.read.parquet(s"$dir/sq8"))
        .repartitionByRange(nFiles, col("t"), col("bkt"))
        .sortWithinPartitions(col("t"), col("bkt"))
        .write.parquet(s"$stage/sq8")
    IndexLifecycle.verifyStaged(spark, fs, stage,
      Seq("assigned" -> expectA, "codes" -> expectA * mt.m) ++
        (if (withSq8) Seq("sq8" -> expectA * mt.tables) else Nil), "rewrite")
    IndexLifecycle.flipStaged(fs, stage, dir,
      if (withSq8) Seq("sq8", "codes", "assigned")
      else Seq("codes", "assigned"))
    // tombstones folded into the rewrite clear AFTER the flip — a
    // crash between the two leaves them pending over tables that no
    // longer carry the ids: the anti-join no-ops (idempotent), and
    // the next rewrite clears them for good
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_deletes"), true)
    writeMeta(spark, dir, mt.copy(n = expectA))
    expectA
  }

  private def writeMeta(spark: SparkSession, dir: String, mt: Meta): Unit = {
    import spark.implicits._
    Seq((mt.n, mt.kAnchors, mt.bits, mt.tables, mt.m, mt.d, mt.codebookK,
        mt.idCol, mt.embCol, mt.stamp))
      .toDF("n", "k_anchors", "bits", "tables", "m", "d", "codebook_k",
        "id_col", "emb_col", "stamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Meta(r.getAs[Long]("n"), r.getAs[Long]("k_anchors"),
      r.getAs[Int]("bits"), r.getAs[Int]("tables"), r.getAs[Int]("m"),
      r.getAs[Int]("d"), r.getAs[Int]("codebook_k"),
      r.getAs[String]("id_col"), r.getAs[String]("emb_col"),
      r.getAs[String]("stamp"))
  }

  /** Multi-probe IVF search against the persisted index — the s8
    * composition with the training side replaced by two parquet
    * reads. `probes` needs the index's (id, emb) columns; results ≡
    * inline [[Similarity.ivfKnnLsh]] bit-for-bit for the same probe
    * set. */
  /** `candIds`: PRE-FILTERED search against the served index (s23's
    * semantics, s25) — the id set (from any metadata predicate the
    * caller evaluated) cuts the candidate table BEFORE any distance
    * is computed, so a probe returns the exact top-k among the
    * MATCHING vectors and excluded vectors never cost a score. The
    * trained geometry (anchors, cells) is untouched — filtering
    * before or after assignment yields identical cells for the
    * survivors. */
  def probe(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int, nprobe: Int, candIds: Option[DataFrame] = None): DataFrame = {
    val mt = readMeta(spark, dir)
    val anchors = spark.read.parquet(s"$dir/anchors")
    // pending soft deletes hide BEFORE the top-k (full k from survivors)
    val assigned0 = minusTombs(spark, dir,
      spark.read.parquet(s"$dir/assigned"), mt.idCol)
    val assigned = candIds.fold(assigned0)(c =>
      assigned0.join(c.select(col(mt.idCol)).distinct(),
        Seq(mt.idCol), "left_semi"))
    Similarity.searchAssigned(
      probes.select(col(mt.idCol), col(mt.embCol)),
      assigned, anchors, mt.idCol, mt.embCol, k, nprobe, mt.bits, mt.tables)
  }

  /** ADC (compressed-code) search against the persisted index — the
    * s6 composition, probe-only: the stored codes are scored via the
    * probe LUT; the per-batch work on the training side is ONLY the
    * probes' own cell assignment (|probes| rows against the anchor
    * table — the identical per-row arithmetic the inline build runs,
    * so results ≡ inline [[Similarity.ivfPqKnnLsh]] bit-for-bit).
    * `nprobe` > 1 widens each probe's ADC scan to its top-nprobe
    * candidate cells ([[Similarity.probeCells]] — the identical rule
    * the raw-vector [[probe]] path ranks with), the served form of
    * the inline nprobe knob. */
  def probePq(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int, nprobe: Int = 1): DataFrame = {
    val mt = readMeta(spark, dir)
    val anchors = spark.read.parquet(s"$dir/anchors")
    // pending soft deletes hide BEFORE the ADC top-k
    val codes = minusTombs(spark, dir,
      spark.read.parquet(s"$dir/codes"), mt.idCol)
    val cb = broadcast(spark.read.parquet(s"$dir/codebook"))
    val probesA =
      if (nprobe == 1)
        Similarity.argmaxAssignLsh(
            probes.select(col(mt.idCol), col(mt.embCol)),
            mt.idCol, mt.embCol, anchors, mt.bits, mt.tables,
            (a, b) => Similarity.cosR(a, b))
          .select(col(mt.idCol).as("probe_id"), col(mt.embCol).as("pe"),
            col("cell").as("pcell"))
      else
        Similarity.probeCells(
            probes.select(col(mt.idCol), col(mt.embCol)), anchors,
            mt.idCol, mt.embCol, nprobe, mt.bits, mt.tables)
          .select(col("probe_id"), col("pe"), col("cell").as("pcell"))
    Similarity.adcRank(codes, probesA, cb, mt.idCol, mt.m, mt.d, k)
  }

  /** OPTIONAL SQ8 COMPONENT — the index's byte-quantized serving
    * path (s17's structure, persisted): two extra tables under the
    * same directory,
    *
    *  - `sq8`      (id, __qc, t, bkt) — one band row per table per
    *               vector with the OFFSET-128 BYTE CODES inline,
    *               clustered on (t, bkt) so a probe's bucket lookup
    *               skips files on footer min/max; NO float vectors —
    *               the float corpus is only read at build
    *  - `sq8quant` 1 row (mn, mx, s, bits) — the FROZEN per-dim
    *               affine quantizer and the pinned band width
    *
    * Derived from the stored `assigned` table (clean lineage: the
    * codes provably quantize the exact bytes the raw path serves)
    * through the same factored code as inline s17
    * ([[Similarity.sq8Quantizer]]/[[Similarity.sq8Code]]/
    * [[Similarity.corpusBands]]), so [[probeSq8]] ≡ inline
    * [[Similarity.sq8Knn]] bit-for-bit (IndexSpec pins it).
    * Published by staged-verify-rename with the quantizer LAST —
    * [[hasSq8]] keys on the quantizer, so a crash mid-publish leaves
    * the component cleanly absent, never half-present. [[append]]
    * quantizes new batches with the frozen quantizer (the standard
    * scalar-quantizer insert contract — drifted value ranges retrain
    * via a fresh [[writeSq8]]); [[delete]]/[[compact]] rewrite the
    * band table through the shared staged-verify-flip. */
  def writeSq8(spark: SparkSession, dir: String, dim: Int = 64): Unit = {
    import spark.implicits._
    val mt = readMeta(spark, dir)
    val assigned = spark.read.parquet(s"$dir/assigned")
    val bits8 = Similarity.corpusBits(mt.n)
    val (mnA, mxA, sA) = Similarity.sq8Quantizer(assigned, mt.embCol, dim)
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    val stage = s"$dir/.stage-sq8"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    val code = Similarity.sq8Code(col(mt.embCol),
      typedLit(mnA), typedLit(mxA))
    val nFiles = math.max(1L, mt.n / 500000L).toInt
    Similarity.corpusBands(assigned.withColumn("__qc", code),
        mt.idCol, mt.embCol, bits8, mt.tables, Seq("__qc"))
      .select(col(mt.idCol), col("__qc"), col("t"), col("bkt"))
      .repartitionByRange(nFiles, col("t"), col("bkt"))
      .sortWithinPartitions(col("t"), col("bkt"))
      .write.parquet(s"$stage/sq8")
    Seq((mnA, mxA, sA, bits8)).toDF("mn", "mx", "s", "bits")
      .coalesce(1).write.parquet(s"$stage/sq8quant")
    val staged = spark.read.parquet(s"$stage/sq8").count()
    if (staged != mt.n * mt.tables) {
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      throw new java.io.IOException(
        s"staged sq8 short: $staged rows (want ${mt.n * mt.tables}); " +
          "aborting — index unchanged")
    }
    // quantizer first OUT (component reads as absent during the
    // swap), bands in, quantizer in LAST
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/sq8quant"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/sq8"), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/sq8"),
      new org.apache.hadoop.fs.Path(s"$dir/sq8")), "sq8 publish failed")
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/sq8quant"),
      new org.apache.hadoop.fs.Path(s"$dir/sq8quant")),
      "sq8quant publish failed")
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  def hasSq8(spark: SparkSession, dir: String): Boolean = {
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/sq8quant"))
  }

  /** SQ8 search against the persisted index — inline s17 with the
    * corpus side replaced by the stored byte-code band table: the
    * probe's own code and band keys are computed from its float
    * vector at query time (the float never needs to be STORED), and
    * [[Similarity.sq8Search]] runs the identical Hamming-1 probing
    * and fused dequantize-score. Zero quantizer fitting in the probe
    * plan. */
  def probeSq8(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int): DataFrame = {
    val mt = readMeta(spark, dir)
    val q = spark.read.parquet(s"$dir/sq8quant").head()
    val mnA = q.getSeq[Double](q.fieldIndex("mn"))
    val mxA = q.getSeq[Double](q.fieldIndex("mx"))
    val sA = q.getSeq[Double](q.fieldIndex("s"))
    val bits8 = q.getAs[Int]("bits")
    // pending soft deletes hide BEFORE the SQ8 top-k
    val cb = minusTombs(spark, dir, spark.read.parquet(s"$dir/sq8"), mt.idCol)
    val code = Similarity.sq8Code(col(mt.embCol),
      typedLit(mnA), typedLit(mxA))
    val pb0 = Similarity.corpusBands(
        probes.select(col(mt.idCol), col(mt.embCol))
          .withColumn("__qc", code),
        mt.idCol, mt.embCol, bits8, mt.tables, Seq("__qc"))
      .select(col(mt.idCol).as("probe_id"), col("__qc").as("pqc"),
        col("t"), col("bkt"))
    Similarity.sq8Search(cb, pb0, mt.idCol,
      typedLit(mnA), typedLit(sA), k, bits8)
  }

  /** Two-stage serving read — the s10 refine stage against the
    * persisted index: [[probePq]] nominates `cFactor·k` candidates
    * from the compressed codes, ONLY those candidates' raw vectors
    * are re-fetched from the stored assignment (a fact-dim equi-join
    * on the id — the serving tier's point-lookup join) and re-scored
    * with the exact fused cosine. Results ≡ inline
    * [[Similarity.pqRerank]] bit-for-bit. `nprobe` widens the
    * nomination stage — the served "refine × nprobe" composition the
    * §6 recall harness concluded with (rerank fixes ordering loss,
    * nprobe fixes candidate loss). */
  def probeRerank(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int, cFactor: Int = 4, nprobe: Int = 1): DataFrame = {
    val mt = readMeta(spark, dir)
    val cand = probePq(spark, dir, probes, cFactor * k, nprobe)
      .select(col("probe_id"), col("neighbor_id"))
    val pr = probes
      .select(col(mt.idCol).as("probe_id"), col(mt.embCol).as("pe"))
    val corpus = spark.read.parquet(s"$dir/assigned")
      .select(col(mt.idCol).as("neighbor_id"), col(mt.embCol).as("ne"))
    val exact = cand.join(pr, Seq("probe_id"))
      .join(corpus, Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cosR(col("pe"), col("ne")).as("c6"))
    Similarity.topK(exact, k)
  }
}
