package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** One-object-per-record blob writer — the target side of the
  * reference migration (README "Target Architecture": each DB blob
  * becomes an object under `webblob/<id>/<db>`; here
  * `<base>/<prefix>` with the prefix derived by
  * [[graft.operators.Migration.externalize]]).
  *
  * Runs entirely inside `foreachPartition`: every executor opens the
  * filesystem once per partition and streams its own rows' bytes —
  * no blob ever passes through the driver, so throughput scales with
  * executor count. Uses the Hadoop FileSystem API, so `base` may be
  * `file:///...`, `hdfs://...`, or `s3a://bucket/...` unchanged.
  * Writes are idempotent (content-addressed names + overwrite), so
  * task retries are safe.
  */
object BlobSink {

  /** Write each row's `blobCol` bytes to `<base>/<prefixCol>`.
    * Returns the number of objects written. */
  def write(df: DataFrame, base: String, prefixCol: String, blobCol: String): Long = {
    val out = df.select(col(prefixCol).cast("string"), col(blobCol).cast("binary"))
    val counter = df.sparkSession.sparkContext.longAccumulator("blobs_written")
    out.foreachPartition { rows: Iterator[Row] =>
      val conf = new Configuration()
      val basePath = new Path(base)
      val fs = basePath.getFileSystem(conf)
      rows.foreach { r =>
        val p = new Path(basePath, r.getString(0))
        val os = fs.create(p, true)
        try os.write(r.getAs[Array[Byte]](1)) finally os.close()
        counter.add(1)
      }
    }
    counter.value
  }

  /** Read back a blob store's inventory (distributed listing via a
    * parallelized prefix list, not a driver-side walk). */
  def inventory(spark: org.apache.spark.sql.SparkSession, base: String): DataFrame = {
    import spark.implicits._
    val conf = new Configuration()
    val fs = new Path(base).getFileSystem(conf)
    val basePath = fs.makeQualified(new Path(base))
    val files = fs.listFiles(basePath, true)
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (files.hasNext) {
      val f = files.next()
      buf += ((f.getPath.toString.stripPrefix(basePath.toString).stripPrefix("/"),
        f.getLen))
    }
    buf.toSeq.toDF("object_key", "nbytes")
  }
}
