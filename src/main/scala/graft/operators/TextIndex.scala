package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED INVERTED TEXT INDEX — [[VectorIndex]]'s build-once/
  * probe-many contract applied to the LEXICAL half of hybrid search
  * (the retrieval the reference's keyword lookups at
  * order_rdbms_blob.js:449 do one row at a time, re-expressed as a
  * served corpus-scale ranking): one tokenize pass of the corpus
  * lands a term-clustered postings table, and every later BM25 query
  * is answered from the index alone — no corpus scan, no per-query
  * tokenization of anything but the query itself.
  *
  * Tables under `dir`:
  *   - `postings` (id, w, tf) — sort-clustered on `w`
  *     ([[graft.sources.LakeSink.writeSorted]]), so a probe's
  *     term-set join prunes to the matched terms' posting files on
  *     parquet footer min/max; this is the only corpus-sized table a
  *     probe's scoring join reads.
  *   - `doclen` (id, dl_tok) — one row per doc INCLUDING tokenless
  *     docs (dl_tok = 0), so the table doubles as the index's
  *     complete key set: the append-time id-collision guard and
  *     meta's recomputed `n` both read it.
  *   - `meta` (n, sumdl, id_col, text_col, stamp) — the two corpus
  *     scalars BM25's length normalization needs, plus the staleness
  *     token [[VectorIndex.write]] documents.
  *
  * df is NOT materialized: Okapi's per-term document frequency is an
  * aggregate of exactly the posting rows a probe already reads
  * (count per matched term — the same derivation
  * [[TextAnalysis.bm25MoreLikeThis]] uses), so probe-after-append
  * equals a rebuild BIT-FOR-BIT with no vocabulary-sized merge on
  * the append path — the property that makes incremental maintenance
  * of a lexical index trivially exact where the PQ index's frozen
  * codebook is an approximation contract.
  */
object TextIndex {

  final case class Meta(n: Long, sumdl: Long, idCol: String,
      textCol: String, stamp: String)

  /** Build + persist. One corpus tokenize/aggregate pass lands the
    * postings; doclen and the corpus token total derive from the
    * postings PARQUET (clean lineage: the scalars provably agree with
    * the exact bytes probes will read). Refuses NULL and duplicate
    * doc ids by name — a duplicate id would double-count its terms
    * into df and serve two rows for one doc. */
  def write(docs: DataFrame, id: String, text: String, dir: String,
      stamp: String = ""): Meta = {
    val spark = docs.sparkSession
    val nNull = docs.filter(col(id).isNull).count()
    require(nNull == 0, s"TEXT INDEX REFUSED: $nNull rows carry a NULL $id")
    val nDup = docs.groupBy(col(id)).count().filter(col("count") > 1).count()
    require(nDup == 0,
      s"TEXT INDEX REFUSED: $nDup duplicated $id values — a duplicate id " +
        "would double-count its terms into df")
    val n = docs.count()
    val nFiles = math.max(1L, n / 500000L).toInt
    graft.sources.LakeSink.writeSorted(
      TextAnalysis.perTokCounts(docs, id, text).withColumnRenamed("n", "tf"),
      s"$dir/postings", "parquet", Seq("w"), nFiles)
    val post = spark.read.parquet(s"$dir/postings")
    // every doc gets a doclen row (tokenless docs at 0) — the table is
    // the index's key set, not just the normalization denominator
    graft.sources.LakeSink.writeSorted(
      docs.select(col(id))
        .join(post.groupBy(col(id)).agg(sum(col("tf")).as("dl_tok")),
          Seq(id), "left")
        .select(col(id), coalesce(col("dl_tok"), lit(0L)).as("dl_tok")),
      s"$dir/doclen", "parquet", Seq(id), nFiles)
    val sumdl = post.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
    val mt = Meta(n, sumdl, id, text, stamp)
    writeMeta(spark, dir, mt)
    mt
  }

  /** BM25 ranking of the indexed corpus against a TERM SET — the
    * primary serving interface (a live query tokenizes map-side into
    * exactly such a set). The scoring join touches only the matched
    * terms' posting rows (term set broadcast; `w`-clustered files
    * skipped on footer stats), df is aggregated from those same rows,
    * and the corpus scalars come from meta — the expression is
    * token-for-token [[TextAnalysis.bm25MoreLikeThis]]'s, so served
    * rankings are bit-identical to the inline operator's. */
  /** `requireAll = true` is the CONJUNCTIVE (AND) query: only docs
    * containing EVERY distinct query term are ranked — the standard
    * boolean-retrieval gate layered under the same BM25 scoring
    * (postings hold one row per (doc, term), so the per-doc matched
    * count IS the distinct matched-term count). The default keeps the
    * disjunctive plan byte-identical to before. */
  def probeTerms(spark: SparkSession, dir: String, terms: DataFrame,
      k: Int, excludeId: Option[Long] = None, k1: Double = 1.2,
      b: Double = 0.75, requireAll: Boolean = false): DataFrame = {
    val mt = readMeta(spark, dir)
    val id = mt.idCol
    val post = spark.read.parquet(s"$dir/postings")
    val dl = spark.read.parquet(s"$dir/doclen")
      .select(col(id), col("dl_tok").cast("double").as("dl"))
    val qt = terms.select(col("w")).distinct()
    val mtf = post.join(broadcast(qt), Seq("w"))
    val dfT = mtf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored0 = mtf.join(broadcast(dfT), Seq("w")).join(dl, Seq(id))
    val scored = excludeId.map(q => scored0.filter(col(id) =!= q))
      .getOrElse(scored0)
    // expression structure mirrors bm25MoreLikeThis / the t20 oracle
    // TOKEN FOR TOKEN (same IEEE op order → bit-identical doubles
    // before the one floor); meta scalars arrive as literals — the
    // same longs the inline operator's 1-row broadcasts carry
    val perDoc = scored
      .select(col(id),
        floor(log(lit(1.0) + (lit(mt.n) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
            (lit(mt.sumdl) * 1.0 / lit(mt.n)))) * 1000000.0 + 0.5)
          .cast("long").as("s_micro"))
      .groupBy(col(id))
      .agg(sum(col("s_micro")).as("bm25_micro"),
        count(lit(1)).as("__n_match"))
    val gated = if (requireAll) {
      // |query| as a broadcast scalar — the conjunctive threshold is
      // derived in-plan, never a driver action on the terms side
      val nq = qt.agg(count(lit(1)).as("__nq"))
      perDoc.crossJoin(broadcast(nq))
        .filter(col("__n_match") === col("__nq")).drop("__nq")
    } else perDoc
    gated.drop("__n_match")
      .orderBy(col("bm25_micro").desc, col(id)).limit(k)
  }

  /** "More like doc `queryId`": the query's own term set is read from
    * the postings (one column-pruned (id, w) scan — the demo
    * convenience; a serving tier passes the query text's tokens to
    * [[probeTerms]] directly and never pays it), the query doc itself
    * excluded from the ranking, exactly
    * [[TextAnalysis.bm25MoreLikeThis]]'s contract. */
  def moreLikeThis(spark: SparkSession, dir: String, queryId: Long,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val mt = readMeta(spark, dir)
    val qt = spark.read.parquet(s"$dir/postings")
      .filter(col(mt.idCol) === queryId).select(col("w"))
    probeTerms(spark, dir, qt, k, excludeId = Some(queryId), k1 = k1, b = b)
  }

  /** INCREMENTAL maintenance — and unlike the PQ index's frozen-
    * quantizer approximation, EXACTLY a rebuild: postings/doclen rows
    * are pure per-doc derivations and df/N/Σdl are probe-time
    * aggregates, so append(B) after write(A) serves bit-for-bit what
    * write(A ∪ B) would. Cost is |batch| tokenization + the
    * column-pruned key scan of doclen for the id-collision guard; no
    * vocabulary-sized table is merged or rewritten.
    *
    * Crash safety is [[VectorIndex.append]]'s discipline verbatim:
    * the batch's files stage under a content tag, counts verify
    * BEFORE any live change, a retry of the same batch sweeps its own
    * leftovers, and meta is rewritten LAST with n recomputed from the
    * published doclen and Σdl from the published postings (never
    * `old + batch`). Single-writer, like the rest of the lake. */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
      newStamp: Option[String] = None): Long = {
    val mt = readMeta(spark, dir)
    val (id, text) = (mt.idCol, mt.textCol)
    IndexLifecycle.guardBatch(newDocs, id, "")
    val tag = IndexLifecycle.batchTag(newDocs, id)
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    IndexLifecycle.sweepTag(fs, dir, Seq("postings", "doclen"), tag)
    IndexLifecycle.guardNoCollision(newDocs, id,
      spark.read.parquet(s"$dir/doclen").select(col(id)),
      " — a duplicate id would double-count terms into df; removal first")
    val nNew = newDocs.count()
    val nFiles = math.max(1L, nNew / 500000L).toInt
    val stage = s"$dir/.stage-$tag"
    val tf = TextAnalysis.perTokCounts(newDocs, id, text)
      .withColumnRenamed("n", "tf").localCheckpoint(true)
    val nPost = tf.count()
    tf.repartitionByRange(nFiles, col("w")).sortWithinPartitions(col("w"))
      .write.mode("overwrite").parquet(s"$stage/postings")
    newDocs.select(col(id))
      .join(tf.groupBy(col(id)).agg(sum(col("tf")).as("dl_tok")),
        Seq(id), "left")
      .select(col(id), coalesce(col("dl_tok"), lit(0L)).as("dl_tok"))
      .repartitionByRange(nFiles, col(id)).sortWithinPartitions(col(id))
      .write.mode("overwrite").parquet(s"$stage/doclen")
    IndexLifecycle.verifyStaged(spark, fs, stage,
      Seq("postings" -> nPost, "doclen" -> nNew), "batch")
    // postings first: a concurrent probe in the two-rename window sees
    // the batch's terms drop out at the doclen inner join (absent doc,
    // not a wrong score); single-writer covers everything else
    IndexLifecycle.publishStagedAll(fs, stage, dir,
      Seq("postings", "doclen"), tag)
    val total = spark.read.parquet(s"$dir/doclen").count()
    val sumdl = spark.read.parquet(s"$dir/postings")
      .agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
    writeMeta(spark, dir, mt.copy(n = total, sumdl = sumdl,
      stamp = newStamp.getOrElse(mt.stamp)))
    total
  }

  /** DELETE docs from the index — the lifecycle parity
    * [[VectorIndex.delete]] set (staged rewrite, verified counts,
    * atomic flip, retention-windowed old copies), with the lexical
    * index's extra property FOR FREE: df is a probe-time aggregate of
    * the surviving posting rows and N/Σdl are recomputed from the
    * PUBLISHED tables, so scores after a delete equal a rebuild
    * without those docs EXACTLY — df/N shift included (TextIndexSpec
    * pins it). Unknown ids refuse by name (a silently-ignored id
    * would report a removal that never happened); a deleted doc's
    * empty doclen row goes too, so append-after-delete of the same id
    * passes the collision guard. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      retainMs: Long = 600000L): Long = {
    val mt = readMeta(spark, dir)
    val id = mt.idCol
    val nNull = ids.filter(col(id).isNull).count()
    require(nNull == 0,
      s"INDEX DELETE REFUSED: $nNull rows carry a NULL $id")
    val del = ids.select(col(id)).distinct().localCheckpoint(true)
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    val known = spark.read.parquet(s"$dir/doclen").select(col(id))
    val nUnknown = del.join(known, Seq(id), "left_anti").count()
    require(nUnknown == 0,
      s"INDEX DELETE REFUSED: $nUnknown ids not present in the index — " +
        "a silently-ignored id would report a removal that never happened")
    val nDel = del.count()
    rewriteTables(spark, dir, mt, mt.n - nDel,
      df => df.join(del, Seq(id), "left_anti"))
  }

  /** COMPACT: rewrite both tables at the current row counts' natural
    * file sizing, restoring the w- / id-clustering appends erode
    * (each append lands its own `ap-*` file set — probe-side footer
    * skipping degrades as batches accumulate). Contents unchanged;
    * same staged-verify-flip path as [[delete]]. */
  def compact(spark: SparkSession, dir: String,
      retainMs: Long = 600000L): Long = {
    val mt = readMeta(spark, dir)
    IndexLifecycle.gcOldGenerations(spark, dir, retainMs)
    rewriteTables(spark, dir, mt, mt.n, identity)
  }

  /** the staged-verify-flip shared by delete/compact: transform both
    * tables, stage, verify counts independently of the written bytes,
    * flip with one rename pair per table (old copies retained under
    * `.old-g*` for the retention window), then meta LAST with n from
    * the published doclen and Σdl from the published postings. */
  private def rewriteTables(spark: SparkSession, dir: String, mt: Meta,
      expectDocs: Long, xform: DataFrame => DataFrame): Long = {
    val (fs, _) = IndexLifecycle.hfs(spark, dir)
    val stage = s"$dir/.stage-del"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    val nFiles = math.max(1L, expectDocs / 500000L).toInt
    val post = xform(spark.read.parquet(s"$dir/postings"))
      .localCheckpoint(true)
    val expectPost = post.count()
    post.repartitionByRange(nFiles, col("w")).sortWithinPartitions(col("w"))
      .write.parquet(s"$stage/postings")
    xform(spark.read.parquet(s"$dir/doclen"))
      .repartitionByRange(nFiles, col(mt.idCol))
      .sortWithinPartitions(col(mt.idCol))
      .write.parquet(s"$stage/doclen")
    IndexLifecycle.verifyStaged(spark, fs, stage,
      Seq("postings" -> expectPost, "doclen" -> expectDocs), "rewrite")
    // postings first, like append: a probe in the flip window loses
    // at the doclen inner join (absent doc), never scores stale terms
    IndexLifecycle.flipStaged(fs, stage, dir, Seq("postings", "doclen"))
    val sumdl = spark.read.parquet(s"$dir/postings")
      .agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
    writeMeta(spark, dir, mt.copy(n = expectDocs, sumdl = sumdl))
    expectDocs
  }

  private def writeMeta(spark: SparkSession, dir: String, mt: Meta): Unit = {
    import spark.implicits._
    Seq((mt.n, mt.sumdl, mt.idCol, mt.textCol, mt.stamp))
      .toDF("n", "sumdl", "id_col", "text_col", "stamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Meta(r.getAs[Long]("n"), r.getAs[Long]("sumdl"),
      r.getAs[String]("id_col"), r.getAs[String]("text_col"),
      r.getAs[String]("stamp"))
  }
}
