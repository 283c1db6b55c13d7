package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED DEDUP SIGNATURE INDEX — the build-once/probe-many
  * contract ([[VectorIndex]] for vectors, [[TextIndex]] for terms)
  * applied to the third serving pillar: near-duplicate detection.
  * The steady-state ingest loop ([[Dedup.incrementalDedup]], and its
  * streaming seat) needs the CORPUS side as band + signature +
  * shingle-digest tables; recomputing them per run re-tokenizes the
  * corpus, and the streaming seat's driver-held unions are explicitly
  * a stand-in ("in production the corpus tables are lake tables").
  * This is that lake table, with the full index lifecycle:
  * write / probe / append / delete / compact, the same
  * staged-verify-flip discipline as the other two indexes.
  *
  * Tables under `dir` (all pure PER-DOC derivations — no global
  * statistic is stored, so append(B) after write(A) serves
  * bit-for-bit what write(A ∪ B) would, the [[TextIndex]] exactness
  * argument; ids must be LONG):
  *   - `signatures` (id, h0..h15) — the K-slot MinHash signature row
  *     per doc, id-clustered. One row per doc EVEN when the doc has
  *     no tokens (slots NULL) — the table doubles as the index's key
  *     set for collision guards and meta's n.
  *   - `bands` (id, j, b) — the LSH band digests, (j, b)-clustered;
  *     a SMALL probe batch pushes its digest IN-list into the scan,
  *     so the clustered files prune on parquet footer min/max (large
  *     batches stream the bands table map-side against the broadcast
  *     batch — no corpus shuffle either way).
  *   - `shingles` (id, sh) — sorted distinct 48-bit shingle-digest
  *     arrays, the exact-Jaccard verify side (~8 bytes/token — the
  *     digest table a pipeline materializes once; optional:
  *     `withShingles = false` builds a signature-only index that
  *     serves [[probeEst]] but refuses [[probeVerified]] by name).
  *
  * Scale posture: the corpus appears in a probe plan ONLY as these
  * persisted tables — band candidates via an equi-join on (j, b)
  * against the (j, b)-clustered files, signatures/shingles via
  * id-equi-joins on the candidate ids. The probe batch (small side)
  * broadcasts; nothing corpus-sized shuffles.
  */
object DedupIndex {

  final case class Meta(n: Long, k: Int, bands: Int, idCol: String,
      textCol: String, hasShingles: Boolean, stamp: String)

  private def tables(mt: Meta): Seq[String] =
    if (mt.hasShingles) Seq("signatures", "bands", "shingles")
    else Seq("signatures", "bands")

  /** Build + persist. Refuses NULL and duplicate doc ids by name (a
    * duplicate id would report itself as its own near-duplicate and
    * double its band buckets). */
  def write(docs: DataFrame, id: String, text: String, dir: String,
      stamp: String = "", withShingles: Boolean = true): Meta = {
    val spark = docs.sparkSession
    val nNull = docs.filter(col(id).isNull).count()
    require(nNull == 0, s"DEDUP INDEX REFUSED: $nNull rows carry a NULL $id")
    val nDup = docs.groupBy(col(id)).count().filter(col("count") > 1).count()
    require(nDup == 0,
      s"DEDUP INDEX REFUSED: $nDup duplicated $id values")
    val n = docs.count()
    val nFiles = math.max(1L, n / 500000L).toInt
    val sigs = Dedup.minhashSignatures(docs, id, text).localCheckpoint(true)
    graft.sources.LakeSink.writeSorted(sigs, s"$dir/signatures",
      "parquet", Seq(id), nFiles)
    graft.sources.LakeSink.writeSorted(Dedup.bands(sigs, id),
      s"$dir/bands", "parquet", Seq("j", "b"), nFiles)
    if (withShingles)
      graft.sources.LakeSink.writeSorted(Dedup.shingleSets(docs, id, text),
        s"$dir/shingles", "parquet", Seq(id), nFiles)
    val mt = Meta(n, Dedup.K, Dedup.BANDS, id, text, withShingles, stamp)
    writeMeta(spark, dir, mt)
    mt
  }

  /** Max batch band-digest count that still pushes an IN-list into
    * the corpus-bands scan: the digests are uniform md5s over a
    * (j, b)-range-clustered layout, so a SMALL batch's list prunes
    * band files/row-groups on footer min/max (≈ min(|list|, nFiles)
    * files read instead of all); a large batch's list would cover the
    * digest space (no pruning) while bloating the plan, so past the
    * cap the probe streams the whole bands table map-side instead. */
  private val MaxPushedDigests = 1024

  /** batch × corpus candidate ids from the persisted bands: the
    * corpus side never shuffles (batch bands broadcast) and a small
    * batch's digest list pushes into the clustered band files. */
  private def candidates(spark: SparkSession, dir: String, id: String,
      bBands: DataFrame): DataFrame = {
    val corpus0 = spark.read.parquet(s"$dir/bands")
    val digs = bBands.select("b").distinct().limit(MaxPushedDigests + 1)
      .collect().map(_.getString(0))
    val corpus = if (digs.length <= MaxPushedDigests)
      corpus0.filter(col("b").isin(digs.toIndexedSeq: _*)) else corpus0
    corpus.select(col(id).as("cid"), col("j"), col("b"))
      .join(broadcast(bBands.select(col(id).as("bid"), col("j"), col("b"))),
        Seq("j", "b"))
      .select("bid", "cid").distinct()
  }

  /** Candidate cross pairs (batch × corpus) from the persisted bands
    * with the MinHash-agreement Jaccard ESTIMATE ([[Dedup.minhashEstimate]]'s
    * sketch decision over stored slots): (batch id, corpus id, est)
    * for every pair colliding in ≥ 1 band, est ≥ `minEst`. Batch-side
    * signatures/bands are computed inline by the SAME functions that
    * built the index, so probe results are bit-identical to the
    * inline estimator restricted to cross pairs. Output columns
    * `bid`/`cid`/`est`. */
  def probeEst(spark: SparkSession, dir: String, batch: DataFrame,
      minEst: Double = 0.0): DataFrame = {
    val mt = readMeta(spark, dir)
    val (id, k) = (mt.idCol, mt.k)
    val bSigs = Dedup.minhashSignatures(batch, id, mt.textCol)
      .localCheckpoint(true)
    val cand = candidates(spark, dir, id, Dedup.bands(bSigs, id))
    val sa = bSigs.select(col(id).as("bid") +:
      (0 until k).map(i => col(s"h$i").as(s"a$i")): _*)
    val sb = spark.read.parquet(s"$dir/signatures")
      .select(col(id).as("cid") +:
        (0 until k).map(i => col(s"h$i").as(s"b$i")): _*)
    val matches = (0 until k)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(broadcast(sa), "bid").join(sb, "cid")
      .select(col("bid"), col("cid"), (matches * 1.0 / k).as("est"))
      .filter(col("est") >= minEst)
  }

  /** Exact-Jaccard-verified cross pairs (batch × corpus) at
    * ≥ `threshold`: band candidates as in [[probeEst]], verified by
    * the fused sorted-intersect over the PERSISTED shingle-digest
    * sets — [[Dedup.incrementalDedup]]'s corpus check served from the
    * index (same 4dp-rounded decision). Output `bid`/`cid`/`jacc`. */
  def probeVerified(spark: SparkSession, dir: String, batch: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val mt = readMeta(spark, dir)
    require(mt.hasShingles,
      "DEDUP INDEX PROBE REFUSED: index was built withShingles=false — " +
        "exact verification needs the persisted digest sets; use probeEst")
    val id = mt.idCol
    val bSigs = Dedup.minhashSignatures(batch, id, mt.textCol)
      .localCheckpoint(true)
    val cand = candidates(spark, dir, id, Dedup.bands(bSigs, id))
    val bSets = Dedup.shingleSets(batch, id, mt.textCol)
      .select(col(id).as("bid"), col("sh").as("sh1"))
    val cSets = spark.read.parquet(s"$dir/shingles")
      .select(col(id).as("cid"), col("sh").as("sh2"))
    cand.join(broadcast(bSets), "bid").join(cSets, "cid")
      .withColumn("ic", sorted_intersect_count(col("sh1"), col("sh2")))
      .withColumn("jacc", floor((col("ic") * 1.0 /
        (size(col("sh1")) + size(col("sh2")) - col("ic"))) * 10000.0 + 0.5) /
        10000.0)
      .filter(col("jacc") >= threshold)
      .select("bid", "cid", "jacc")
  }

  /** The steady-state ingest step SERVED FROM THE INDEX —
    * [[Dedup.incrementalDedup]] with the corpus side read from the
    * persisted tables: (1) intra-batch self-dedup (greater id of each
    * verified pair drops), (2) survivors verified against the indexed
    * corpus, (3) returns the kept batch rows. Composes with
    * [[append]] for the grow-the-corpus loop the streaming seat runs.
    * Results ≡ [[Dedup.incrementalDedup]] on the same corpus (spec'd
    * row-for-row). */
  def dedupBatch(spark: SparkSession, dir: String, batch0: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    val mt = readMeta(spark, dir)
    val id = mt.idCol
    val intraDrops = Dedup.verifiedPairs(batch0, id, mt.textCol, threshold,
        persist = false)
      .select(col("d2").as(id)).distinct()
    val batch = batch0.join(intraDrops, Seq(id), "left_anti")
    val drops = probeVerified(spark, dir, batch, threshold)
      .select(col("bid").as(id)).distinct()
    batch.join(drops, Seq(id), "left_anti")
  }

  /** INCREMENTAL maintenance — exactly a rebuild (every table is a
    * pure per-doc derivation; no global statistic exists to drift):
    * append(B) after write(A) serves bit-for-bit what write(A ∪ B)
    * would. [[VectorIndex.append]]'s crash-safety discipline
    * verbatim: content-tag staging, leftover sweep before the
    * collision guard reads, staged counts verified BEFORE any live
    * change, meta last with n recomputed from the published
    * signatures. Single-writer, like the rest of the lake. */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
      newStamp: Option[String] = None): Long = {
    val mt = readMeta(spark, dir)
    val (id, text) = (mt.idCol, mt.textCol)
    IndexLifecycle.guardBatch(newDocs, id, "")
    val tag = IndexLifecycle.batchTag(newDocs, id)
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    IndexLifecycle.sweepTag(fs, dir, tables(mt), tag)
    IndexLifecycle.guardNoCollision(newDocs, id,
      spark.read.parquet(s"$dir/signatures").select(col(id)),
      " — a duplicate id would self-collide in every band; removal first")
    val nNew = newDocs.count()
    val nFiles = math.max(1L, nNew / 500000L).toInt
    val stage = s"$dir/.stage-$tag"
    val sigs = Dedup.minhashSignatures(newDocs, id, text)
      .localCheckpoint(true)
    sigs.repartitionByRange(nFiles, col(id)).sortWithinPartitions(col(id))
      .write.mode("overwrite").parquet(s"$stage/signatures")
    Dedup.bands(sigs, id)
      .repartitionByRange(nFiles, col("j"), col("b"))
      .sortWithinPartitions(col("j"), col("b"))
      .write.mode("overwrite").parquet(s"$stage/bands")
    if (mt.hasShingles)
      Dedup.shingleSets(newDocs, id, text)
        .repartitionByRange(nFiles, col(id)).sortWithinPartitions(col(id))
        .write.mode("overwrite").parquet(s"$stage/shingles")
    IndexLifecycle.verifyStaged(spark, fs, stage,
      Seq("signatures" -> nNew, "bands" -> nNew * mt.bands), "batch")
    // bands first: a concurrent probe in the publish window loses the
    // batch at the signature/shingle inner join (absent doc), never
    // scores a half-present one
    IndexLifecycle.publishStagedAll(fs, stage, dir, tables(mt).reverse, tag)
    val total = spark.read.parquet(s"$dir/signatures").count()
    writeMeta(spark, dir, mt.copy(n = total,
      stamp = newStamp.getOrElse(mt.stamp)))
    total
  }

  /** DELETE docs — staged filtered rewrite of every table, verified
    * counts, atomic flip, retention-windowed old copies
    * ([[TextIndex.delete]]'s lifecycle). Unknown ids refuse by name. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      retainMs: Long = 600000L): Long = {
    val mt = readMeta(spark, dir)
    val id = mt.idCol
    val nNull = ids.filter(col(id).isNull).count()
    require(nNull == 0, s"INDEX DELETE REFUSED: $nNull rows carry a NULL $id")
    val del = ids.select(col(id)).distinct().localCheckpoint(true)
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    val known = spark.read.parquet(s"$dir/signatures").select(col(id))
    val nUnknown = del.join(known, Seq(id), "left_anti").count()
    require(nUnknown == 0,
      s"INDEX DELETE REFUSED: $nUnknown ids not present in the index — " +
        "a silently-ignored id would report a removal that never happened")
    val nDel = del.count()
    rewriteTables(spark, dir, mt, mt.n - nDel,
      df => df.join(del, Seq(id), "left_anti"))
  }

  /** COMPACT: rewrite every table at the current counts' natural file
    * sizing, restoring the id-/(j,b)-clustering appends erode.
    * Contents unchanged; same staged-verify-flip path as [[delete]]. */
  def compact(spark: SparkSession, dir: String,
      retainMs: Long = 600000L): Long = {
    val mt = readMeta(spark, dir)
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    rewriteTables(spark, dir, mt, mt.n, identity)
  }

  private def rewriteTables(spark: SparkSession, dir: String, mt: Meta,
      expectDocs: Long, xform: DataFrame => DataFrame): Long = {
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    val stage = s"$dir/.stage-del"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    val nFiles = math.max(1L, expectDocs / 500000L).toInt
    val sortCols: Map[String, Seq[String]] = Map(
      "signatures" -> Seq(mt.idCol), "bands" -> Seq("j", "b"),
      "shingles" -> Seq(mt.idCol))
    tables(mt).foreach { tb =>
      val cs = sortCols(tb).map(col)
      xform(spark.read.parquet(s"$dir/$tb"))
        .repartitionByRange(nFiles, cs: _*).sortWithinPartitions(cs: _*)
        .write.parquet(s"$stage/$tb")
    }
    IndexLifecycle.verifyStaged(spark, fs, stage,
      Seq("signatures" -> expectDocs, "bands" -> expectDocs * mt.bands),
      "rewrite")
    IndexLifecycle.flipStaged(fs, stage, dir, tables(mt).reverse)
    writeMeta(spark, dir, mt.copy(n = expectDocs))
    expectDocs
  }

  private def writeMeta(spark: SparkSession, dir: String, mt: Meta): Unit = {
    import spark.implicits._
    Seq((mt.n, mt.k, mt.bands, mt.idCol, mt.textCol, mt.hasShingles,
        mt.stamp))
      .toDF("n", "k", "bands", "id_col", "text_col", "has_shingles", "stamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Meta(r.getAs[Long]("n"), r.getAs[Int]("k"), r.getAs[Int]("bands"),
      r.getAs[String]("id_col"), r.getAs[String]("text_col"),
      r.getAs[Boolean]("has_shingles"), r.getAs[String]("stamp"))
  }
}
