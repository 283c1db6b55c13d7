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
    import spark.implicits._
    Seq((n, kA, bits, tables, m, d, codebookK, id, emb, stamp))
      .toDF("n", "k_anchors", "bits", "tables", "m", "d", "codebook_k",
        "id_col", "emb_col", "stamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    Meta(n, kA, bits, tables, m, d, codebookK, id, emb, stamp)
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
    * duplicate id would answer probes with two rows for one vector)
    * or a NULL id. For the exact-vector probe path the result
    * equals a full rebuild with the same anchors bit-for-bit
    * (IndexSpec pins it); the PQ path differs from a rebuild only in
    * that the codebook stays frozen (rebuild re-seeds it from the
    * grown corpus). Returns the new total vector count. */
  def append(spark: SparkSession, dir: String, newVectors: DataFrame): Long = {
    val mt = readMeta(spark, dir)
    val (id, emb) = (mt.idCol, mt.embCol)
    val nNull = newVectors.filter(col(id).isNull).count()
    require(nNull == 0,
      s"INDEX APPEND REFUSED: $nNull rows carry a NULL $id")
    val existing = spark.read.parquet(s"$dir/assigned").select(col(id))
    val nDup = newVectors.select(col(id)).join(existing, Seq(id), "left_semi")
      .count()
    require(nDup == 0,
      s"INDEX APPEND REFUSED: $nDup ids already present in the index — " +
        "a duplicate id would serve two rows for one vector; merge/" +
        "delete needs a rebuild (or a lake-side mergeKeyed on the tables)")
    val anchors = spark.read.parquet(s"$dir/anchors")
    val cb = broadcast(spark.read.parquet(s"$dir/codebook"))
    // assignment computed once (localCheckpoint: consumed by both the
    // assigned append and the encode), then landed cell-clustered
    val na = Similarity.argmaxAssignLsh(
        newVectors.select(col(id), col(emb)), id, emb, anchors,
        mt.bits, mt.tables, (a, b) => Similarity.cosR(a, b))
      .localCheckpoint(true)
    val nNew = na.count()
    val nFiles = math.max(1L, nNew / 500000L).toInt
    na.repartitionByRange(nFiles, col("cell")).sortWithinPartitions(col("cell"))
      .write.mode("append").parquet(s"$dir/assigned")
    Similarity.pqEncode(na, id, emb, cb, mt.m, mt.d)
      .repartitionByRange(nFiles, col("cell")).sortWithinPartitions(col("cell"))
      .write.mode("append").parquet(s"$dir/codes")
    import spark.implicits._
    val total = mt.n + nNew
    Seq((total, mt.kAnchors, mt.bits, mt.tables, mt.m, mt.d, mt.codebookK,
        id, emb, mt.stamp))
      .toDF("n", "k_anchors", "bits", "tables", "m", "d", "codebook_k",
        "id_col", "emb_col", "stamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    total
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
  def probe(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val mt = readMeta(spark, dir)
    val anchors = spark.read.parquet(s"$dir/anchors")
    val assigned = spark.read.parquet(s"$dir/assigned")
    Similarity.searchAssigned(
      probes.select(col(mt.idCol), col(mt.embCol)),
      assigned, anchors, mt.idCol, mt.embCol, k, nprobe, mt.bits, mt.tables)
  }

  /** ADC (compressed-code) search against the persisted index — the
    * s6 composition, probe-only: the stored codes are scored via the
    * probe LUT; the per-batch work on the training side is ONLY the
    * probes' own cell assignment (|probes| rows against the anchor
    * table — the identical per-row arithmetic the inline build runs,
    * so results ≡ inline [[Similarity.ivfPqKnnLsh]] bit-for-bit). */
  def probePq(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int): DataFrame = {
    val mt = readMeta(spark, dir)
    val anchors = spark.read.parquet(s"$dir/anchors")
    val codes = spark.read.parquet(s"$dir/codes")
    val cb = broadcast(spark.read.parquet(s"$dir/codebook"))
    val probesA = Similarity.argmaxAssignLsh(
        probes.select(col(mt.idCol), col(mt.embCol)),
        mt.idCol, mt.embCol, anchors, mt.bits, mt.tables,
        (a, b) => Similarity.cosR(a, b))
      .select(col(mt.idCol).as("probe_id"), col(mt.embCol).as("pe"),
        col("cell").as("pcell"))
    Similarity.adcRank(codes, probesA, cb, mt.idCol, mt.m, mt.d, k)
  }

  /** Two-stage serving read — the s10 refine stage against the
    * persisted index: [[probePq]] nominates `cFactor·k` candidates
    * from the compressed codes, ONLY those candidates' raw vectors
    * are re-fetched from the stored assignment (a fact-dim equi-join
    * on the id — the serving tier's point-lookup join) and re-scored
    * with the exact fused cosine. Results ≡ inline
    * [[Similarity.pqRerank]] bit-for-bit. */
  def probeRerank(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int, cFactor: Int = 4): DataFrame = {
    val mt = readMeta(spark, dir)
    val cand = probePq(spark, dir, probes, cFactor * k)
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
