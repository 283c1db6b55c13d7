package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE INDEX-LIFECYCLE KERNEL — the one staged-verify-flip discipline
  * the four persisted indexes ([[VectorIndex]], [[TextIndex]],
  * [[DedupIndex]], [[LmIndex]]) compose instead of hand-copying:
  *
  *  - **content tag**: a batch's identity is a deterministic digest
  *    of its KEY SET ([[batchTag]]) — the same batch retried yields
  *    the same tag, which is what makes a crashed append's leftovers
  *    identifiable and a retry self-repairing;
  *  - **sweep-before-guard** ([[sweepTag]]): a retry removes its own
  *    previous partial publish from the live tables BEFORE the
  *    id-collision guard reads them, so recovery converges instead
  *    of refusing;
  *  - **refusals by name** ([[guardBatch]]/[[guardNoCollision]]):
  *    NULL keys, intra-batch duplicates, and ids already served;
  *  - **independent count verify** ([[verifyStaged]]): staged copies
  *    are RECOUNTED and checked against expectations computed by a
  *    separate job — a torn or short stage write aborts with the
  *    live index untouched;
  *  - **publish** — append moves the staged files into the live
  *    tables under the `ap-<tag>-` prefix ([[publishStagedAll]]);
  *    rewrite flips whole tables by rename pair with the superseded
  *    copy retained as `<table>.old-g<gen>` for the retention window
  *    ([[flipStaged]]), reclaimed by a later run's entry GC
  *    ([[gcOldGenerations]]);
  *  - **meta last**, with totals recomputed from the PUBLISHED
  *    tables (the callers' side — a stale meta can't survive a
  *    repaired crash).
  *
  * Table ORDER is the callers' correctness lever (each index
  * publishes so that a concurrent probe in the window loses rows at
  * an inner join rather than scoring half-present state); the kernel
  * takes the order as given. Single-writer per index directory, like
  * the rest of the lake. */
private[graft] object IndexLifecycle {

  /** Deterministic CONTENT TAG of a batch's key set — one aggregate
    * (count, hashed-id sum/min/max), no collect, no wall clock. */
  def batchTag(batch: DataFrame, id: String): String = {
    val r = batch.agg(count(col(id)), sum(hash(col(id)).cast("long")),
      min(hash(col(id))), max(hash(col(id)))).head()
    java.security.MessageDigest.getInstance("MD5")
      .digest(r.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  def hfs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** NULL-key and intra-batch-duplicate refusals (every index's
    * append precondition; `dupReason` names the index-specific harm) */
  def guardBatch(batch: DataFrame, id: String, dupReason: String): Unit = {
    val nNull = batch.filter(col(id).isNull).count()
    require(nNull == 0,
      s"INDEX APPEND REFUSED: $nNull rows carry a NULL $id")
    val nDupIn = batch.groupBy(col(id)).count()
      .filter(col("count") > 1).count()
    require(nDupIn == 0,
      s"INDEX APPEND REFUSED: $nDupIn ids duplicated within the batch$dupReason")
  }

  /** the id-collision guard: a batch id already served refuses by
    * name (`reason` names the index-specific harm + remedy) */
  def guardNoCollision(batch: DataFrame, id: String, existing: DataFrame,
      reason: String): Unit = {
    val nDup = batch.select(col(id)).join(existing, Seq(id), "left_semi")
      .count()
    require(nDup == 0,
      s"INDEX APPEND REFUSED: $nDup ids already present in the index$reason")
  }

  /** crash-recovery sweep: leftovers of a previous partial publish of
    * THIS batch (same content tag) are removed from the live tables
    * before any guard reads them, so a retry converges. */
  def sweepTag(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      tables: Seq[String], tag: String): Unit =
    tables.foreach { tb =>
      val live = new org.apache.hadoop.fs.Path(s"$dir/$tb")
      if (fs.exists(live))
        fs.listStatus(live).map(_.getPath)
          .filter(_.getName.startsWith(s"ap-$tag-"))
          .foreach(p => require(fs.delete(p, false), s"sweep failed: $p"))
    }

  /** recount every staged table against its independently-computed
    * expectation; on any mismatch delete the stage and abort with the
    * live index untouched. `what` = "batch" (append) / "rewrite". */
  def verifyStaged(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      stage: String, expected: Seq[(String, Long)], what: String): Unit = {
    val got = expected.map { case (tb, _) =>
      tb -> spark.read.parquet(s"$stage/$tb").count() }
    if (got.map(_._2) != expected.map(_._2)) {
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      throw new java.io.IOException(
        s"staged $what short: " +
          expected.zip(got).map { case ((tb, want), (_, g)) =>
            s"$tb=$g (want $want)" }.mkString(", ") +
          "; aborting — index unchanged")
    }
  }

  /** move every data file of staged dir `from` into live dir `to`,
    * prefixed `ap-$tag-` so the batch's files stay identifiable (the
    * crash-recovery sweep keys on the prefix). */
  def publishStaged(fs: org.apache.hadoop.fs.FileSystem,
      from: org.apache.hadoop.fs.Path, to: org.apache.hadoop.fs.Path,
      tag: String): Unit =
    fs.listStatus(from).map(_.getPath)
      .filter(p => p.getName.startsWith("part-"))
      .foreach { p =>
        require(fs.rename(p, new org.apache.hadoop.fs.Path(to,
          s"ap-$tag-${p.getName}")), s"publish rename failed for $p") }

  /** [[publishStaged]] over the append's tables in the caller's
    * publish order, then the stage is gone. */
  def publishStagedAll(fs: org.apache.hadoop.fs.FileSystem, stage: String,
      dir: String, order: Seq[String], tag: String): Unit = {
    order.foreach(tb => publishStaged(fs,
      new org.apache.hadoop.fs.Path(s"$stage/$tb"),
      new org.apache.hadoop.fs.Path(s"$dir/$tb"), tag))
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** the rewrite FLIP: one rename pair per table in the caller's
    * order — superseded copies retained as `<table>.old-g<gen>` for
    * in-flight readers (reclaimed past the retention window by
    * [[gcOldGenerations]]), then the stage is gone. */
  def flipStaged(fs: org.apache.hadoop.fs.FileSystem, stage: String,
      dir: String, order: Seq[String]): Unit = {
    val gen = System.currentTimeMillis()
    order.foreach { tb =>
      val live = new org.apache.hadoop.fs.Path(s"$dir/$tb")
      val old = new org.apache.hadoop.fs.Path(s"$dir/$tb.old-g$gen")
      require(fs.rename(live, old), s"flip failed: $live -> $old")
      require(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/$tb"), live),
        s"flip failed: $stage/$tb -> $live")
    }
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** reclaim `.old-g*` copies past the retention window (and any
    * half-written stage of a crashed previous rewrite). */
  def gcOldGenerations(spark: SparkSession, dir: String,
      retainMs: Long): Unit = {
    val (fs, _) = hfs(spark, dir)
    val now = System.currentTimeMillis()
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/*.old-g*")))
      .getOrElse(Array.empty)
      .filter(st => now - st.getModificationTime > retainMs)
      .foreach(st => fs.delete(st.getPath, true))
  }
}
