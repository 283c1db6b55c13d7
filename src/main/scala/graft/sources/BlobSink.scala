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

  private def fsFor(base: String): (FileSystem, Path) = {
    val basePath = new Path(base)
    (basePath.getFileSystem(new Configuration()), basePath)
  }

  /** Write each row's `blobCol` bytes to `<base>/<prefixCol>`.
    * Returns the exact number of objects written: the count is the
    * sum of per-task outputs of the single job, so task retries and
    * speculative duplicates don't inflate it (an accumulator would —
    * Spark only de-duplicates accumulator updates inside actions for
    * result-stage tasks, and a retried foreachPartition task
    * double-counts). */
  def write(df: DataFrame, base: String, prefixCol: String, blobCol: String): Long = {
    val out = df.select(col(prefixCol).cast("string"), col(blobCol).cast("binary"))
    out.rdd.mapPartitions { rows =>
      val (fs, basePath) = fsFor(base)
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
    val outSchema = org.apache.spark.sql.types.StructType(
      keep.map(i => df.schema.fields(i)))
    val outRdd = df.rdd.mapPartitions { rows =>
      val (fs, basePath) = fsFor(base)
      rows.map { r =>
        val p = new Path(basePath, r.getString(prefixIdx))
        val os = fs.create(p, true)
        try os.write(r.getAs[Array[Byte]](blobIdx)) finally os.close()
        Row.fromSeq(keep.map(r.get))
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /** Read back a blob store's inventory. The driver lists only the
    * first level under `base`; the recursive walk of each prefix runs
    * in parallel on executors — at 100 TB / millions of objects the
    * driver never buffers the full listing. */
  def inventory(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    val (fs, rawBase) = fsFor(base)
    val basePath = fs.makeQualified(rawBase)
    val baseStr = basePath.toString
    val topLevel = fs.listStatus(basePath).map(_.getPath.toString).toSeq
    spark.createDataset(topLevel)
      .repartition(math.min(topLevel.size,
        spark.sparkContext.defaultParallelism).max(1))
      .flatMap { prefix =>
        val (pfs, pPath) = fsFor(prefix)
        val it = pfs.listFiles(pPath, true)
        val buf = scala.collection.mutable.ArrayBuffer[(String, Long)]()
        while (it.hasNext) {
          val f = it.next()
          buf += ((f.getPath.toString.stripPrefix(baseStr).stripPrefix("/"),
            f.getLen))
        }
        buf
      }.toDF("object_key", "nbytes")
  }
}
