package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** One-object-per-record blob writer — the target side of the
  * reference migration (README "Target Architecture": each DB blob
  * becomes an object under `webblob/<id>/<db>`; here
  * `<base>/<prefix>` with the prefix derived by
  * [[graft.operators.Migration.externalize]]).
  *
  * Runs entirely inside executor-side partition loops: every executor
  * opens the filesystem once per partition and streams its own rows'
  * bytes — no blob ever passes through the driver, so throughput
  * scales with executor count. Uses the Hadoop FileSystem API, so
  * `base` may be `file:///...`, `hdfs://...`, or `s3a://bucket/...`
  * unchanged. Writes are idempotent (content-addressed names +
  * overwrite), so task retries are safe.
  */
object BlobSink {

  /** Minimal serializable Hadoop-Configuration carrier: executors must
    * see the SESSION's hadoopConfiguration (spark.hadoop.* s3a
    * credentials/endpoints), not a fresh `new Configuration()` that
    * only works for file://. Configuration itself is Writable but not
    * Serializable, so ship it via its own write/readFields. */
  private final class SerConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false); value.readFields(in)
    }
  }

  private def serConf(spark: SparkSession): SerConf =
    new SerConf(spark.sparkContext.hadoopConfiguration)

  private def fsFor(base: String, conf: Configuration): (FileSystem, Path) = {
    val basePath = new Path(base)
    (basePath.getFileSystem(conf), basePath)
  }

  /** Write each row's `blobCol` bytes to `<base>/<prefixCol>`.
    * Returns the exact number of objects written as the sum of
    * per-task outputs of the single job. (An accumulator updated in a
    * foreachPartition action would work too — result-stage updates
    * are applied exactly once on retry — but the fold keeps the count
    * in the job's dataflow rather than driver-side mutable state.)
    * Rows with a NULL prefix or NULL blob are SKIPPED, not written
    * (there is no key or no content to write — one degenerate row
    * must not NPE a 100 TB migration); the returned count covers only
    * objects actually written, so a validation pass sees the delta. */
  def write(df: DataFrame, base: String, prefixCol: String, blobCol: String): Long = {
    val out = df.select(col(prefixCol).cast("string"), col(blobCol).cast("binary"))
      .filter(col(prefixCol).isNotNull && col(blobCol).isNotNull)
    val conf = serConf(df.sparkSession)
    out.rdd.mapPartitions { rows =>
      val (fs, basePath) = fsFor(base, conf.value)
      var n = 0L
      rows.foreach { r =>
        val p = new Path(basePath, r.getString(0))
        val os = fs.create(p, true)
        try os.write(r.getAs[Array[Byte]](1)) finally os.close()
        n += 1
      }
      Iterator.single(n)
    }.fold(0L)(_ + _)
  }

  /** Single-pass variant: writes each row's blob as a side effect and
    * passes every OTHER column through, so one job can produce both
    * the object store and a downstream table (see
    * [[graft.operators.Migration.migrate]]) from one scan of the
    * source. Blob writes are content-addressed + overwrite, so the
    * retry of a task whose parquet commit failed is safe. */
  def writeThrough(df: DataFrame, base: String, prefixCol: String,
      blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val prefixIdx = df.schema.fieldIndex(prefixCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val keep = df.schema.indices.filterNot(_ == blobIdx)
    // the pointer field must be declared nullable regardless of the
    // input schema: skipped object writes emit NULL pointers, and a
    // schema claiming non-null over rows containing NULL is undefined
    // behavior downstream
    val outSchema = org.apache.spark.sql.types.StructType(
      keep.map(i =>
        if (i == prefixIdx) df.schema.fields(i).copy(nullable = true)
        else df.schema.fields(i)))
    val conf = serConf(spark)
    val outRdd = df.rdd.mapPartitions { rows =>
      val (fs, basePath) = fsFor(base, conf.value)
      rows.map { r =>
        // a NULL prefix/blob row passes through WITHOUT an object
        // write (same skip rule as [[write]]): the pointer row still
        // reaches the downstream table, where its null pointer is
        // visible to validation. NOTE the blob column is dropped from
        // the output either way — for a row with a real payload but a
        // NULL prefix (an upstream keying defect), the payload is NOT
        // persisted by this job and survives only in the source; the
        // NULL-pointer row is the quarantine signal to re-migrate it
        // after fixing the key, not a license to delete the source row
        // (validation a9/a13 counts exactly these).
        val wrote = !r.isNullAt(prefixIdx) && !r.isNullAt(blobIdx)
        if (wrote) {
          val p = new Path(basePath, r.getString(prefixIdx))
          val os = fs.create(p, true)
          try os.write(r.getAs[Array[Byte]](blobIdx)) finally os.close()
        }
        // the inverse hazard: a non-NULL prefix with a NULL blob. The
        // object write was skipped, so the prefix MUST NOT reach the
        // pointer table — a pointer claiming an object that was never
        // written is a dangling reference that reads as data loss
        // downstream. The pointer column is nulled whenever no object
        // was written, so pointer-non-null ⟺ object-exists holds for
        // every row this operator emits.
        Row.fromSeq(keep.map(i =>
          if (i == prefixIdx && !wrote) null else r.get(i)))
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /** Read back a blob store's inventory: (object_key, nbytes, mtime).
    * The driver lists only the first level under `base`; the
    * recursive walk of each prefix runs in parallel on executors — at
    * 100 TB / millions of objects the driver never buffers the full
    * listing. `mtime` is the store's modification timestamp (epoch
    * millis) — the signal [[gcOrphans]]'s grace window needs to tell
    * an abandoned orphan from an object whose pointer row is still
    * in flight. */
  def inventory(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    val conf = serConf(spark)
    val (fs, rawBase) = fsFor(base, conf.value)
    val basePath = fs.makeQualified(rawBase)
    val baseStr = basePath.toString
    val topLevel = fs.listStatus(basePath).map(_.getPath.toString).toSeq
    spark.createDataset(topLevel)
      .repartition(math.min(topLevel.size,
        spark.sparkContext.defaultParallelism).max(1))
      .flatMap { prefix =>
        val (pfs, pPath) = fsFor(prefix, conf.value)
        val it = pfs.listFiles(pPath, true)
        val buf = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        while (it.hasNext) {
          val f = it.next()
          buf += ((f.getPath.toString.stripPrefix(baseStr).stripPrefix("/"),
            f.getLen, f.getModificationTime))
        }
        buf
      }.toDF("object_key", "nbytes", "mtime")
  }

  /** Orphan-object GC — the DELETE side of a13's reconciliation (the
    * reference removes the S3 object in lockstep with the row,
    * order.js:420 deleteS3Asset; this is the batch lifecycle form
    * that collects whatever that lockstep missed): every object
    * under `base` whose key has no pointer row is deleted,
    * executor-parallel, idempotently (an object that vanished
    * between listing and delete counts as already collected — a
    * concurrent GC or a retried task must not fail the job).
    *
    * SAFETY GUARD 1 (mass delete): refuses BY NAME when the orphan
    * fraction exceeds `maxOrphanFrac`. A stale, truncated, or
    * mis-pathed pointer table makes every object look orphaned — and
    * "GC" becomes "delete the store". Destructive lifecycle ops get
    * the same treatment as compact-on-S3: a named refusal over a
    * silent catastrophe. Raising the threshold is a deliberate
    * caller act.
    *
    * SAFETY GUARD 2 (in-flight writers): only objects whose store
    * mtime is older than `graceMs` are collectable. An object
    * written by an in-flight [[write]]/[[writeThrough]] whose
    * pointer row has not yet committed LOOKS orphaned to this pass —
    * without the grace window a concurrent migration's freshest
    * objects would be deleted the moment they land (the mass-delete
    * guard only catches bulk mismatches, not a handful of in-flight
    * rows). Size `graceMs` above the longest pointer-commit lag
    * (write job duration + catalog publish); with the default 0 the
    * CALLER asserts no writer is concurrent. Young objects are
    * excluded from both the orphan set and the guard-1 denominator
    * (they are not evidence about pointer-table staleness either
    * way).
    *
    * CLOCK-SKEW RULE (ADVICE r10): object age compares STORE
    * timestamps, so the cutoff must not trust the driver's clock —
    * a driver running fast would age just-written objects past the
    * window it exists to provide. The cutoff derives from the
    * store's OWN clock, sampled by stat-ing a marker object this
    * very pass writes (and removes): `cutoff = marker mtime −
    * graceMs` compares store time against store time, so driver
    * skew cancels out entirely. The marker is written AFTER the
    * inventory snapshot, so it can never appear in its own orphan
    * listing.
    *
    * Empty prefix DIRECTORIES are left behind on local/HDFS runs —
    * on the object stores this sink models, directories don't exist,
    * so sweeping them would be modeling a non-problem.
    *
    * Returns (objects scanned, objects deleted). */
  def gcOrphans(spark: SparkSession, base: String, pointers: DataFrame,
      prefixCol: String, maxOrphanFrac: Double = 0.5,
      graceMs: Long = 0L): (Long, Long) = {
    import spark.implicits._
    // ONE store listing: scanned and the orphan set must come from
    // the SAME snapshot (unchecked, the recursive listing ran twice
    // and objects landing between the two made the guard's fraction
    // compare counts from different store states)
    val invAll = inventory(spark, base)
      .select(col("object_key"), col("mtime"))
      .localCheckpoint(true)
    val scanned = invAll.count()
    // skew-safe cutoff (see CLOCK-SKEW RULE above): sample the
    // store's own clock via a marker object — store time compares
    // against store time, the driver's clock is never trusted. Grace
    // 0 keeps the explicit no-concurrent-writer contract (everything
    // eligible, no marker write).
    val cutoff =
      if (graceMs <= 0L) Long.MaxValue
      else {
        val marker = base + "/.graft-gc-clock-" +
          java.util.UUID.randomUUID().toString
        val (fs, p) = fsFor(marker,
          spark.sparkContext.hadoopConfiguration)
        fs.create(p, true).close()
        val storeNow = fs.getFileStatus(p).getModificationTime
        fs.delete(p, false)
        storeNow - graceMs
      }
    val inv = invAll.filter(col("mtime") <= cutoff).select(col("object_key"))
    val eligible = inv.count()
    val orphans = inv.join(
        pointers.select(col(prefixCol).cast("string").as("object_key"))
          .filter(col("object_key").isNotNull).distinct(),
        Seq("object_key"), "left_anti")
      .localCheckpoint(true)
    val nOrph = orphans.count()
    if (eligible > 0)
      require(nOrph.toDouble / eligible <= maxOrphanFrac,
        s"ORPHAN GC REFUSED: $nOrph of $eligible grace-aged objects have no " +
          s"pointer (frac ${nOrph.toDouble / eligible} > $maxOrphanFrac) — a " +
          "stale or mis-pathed pointer table would turn GC into store " +
          "deletion; raise maxOrphanFrac only deliberately")
    val conf = serConf(spark)
    val deleted = orphans.as[String].mapPartitions { it =>
      var n = 0L
      it.foreach { key =>
        val (fs, p) = fsFor(base + "/" + key, conf.value)
        if (fs.delete(p, false)) n += 1
      }
      Iterator.single(n)
    }.toDF("n").agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    (scanned, deleted)
  }
}
