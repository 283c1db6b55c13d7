package graft

import org.apache.spark.sql.{Row, types => T}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate migration inputs: a NULL blob row must produce a NULL
  * pointer (not a hashless prefix) and must be skipped by the object
  * writer (not NPE an executor) — validation then sees the delta. */
class BlobNullSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val df = {
    val schema = T.StructType(Seq(
      T.StructField("order_id", T.LongType),
      T.StructField("description", T.StringType),
      T.StructField("order_blob", T.BinaryType)))
    val rows = Seq(
      Row(1L, "ok", "payload-bytes".getBytes("UTF-8")),
      Row(2L, "null blob", null),
      Row(3L, null, "more-bytes".getBytes("UTF-8")))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("phash is total: NULL and empty payloads emit phash 0, not a dropped row") {
    val bin = df.select(col("order_id").as("record_id"),
      col("order_blob").as("payload"))
    val p = operators.Multimodal.phash(bin).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p.keySet == Set(1L, 2L, 3L),
      s"every record gets a signature row: ${p.keySet}")
    assert(p(2L) == 0L, "NULL payload votes nothing -> all-zero signature")
    assert(p(1L) != 0L, "a real payload must produce a real signature")
  }

  test("externalize: ANY null segment -> NULL pointer, never a malformed prefix") {
    val ext = operators.Migration.externalize(df, col("order_id"),
      col("description"), col("order_blob"))
    val byId = ext.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getString(2)))).toMap
    assert(byId(2L).isEmpty, "null blob must yield a NULL s3_prefix")
    assert(byId(3L).isEmpty,
      "null source must yield a NULL s3_prefix, not a segment-skipped one")
    assert(byId(1L).exists(_.split("/").length == 4),
      s"real blob gets the full blobs/<src>/<id>/<md5> prefix: ${byId(1L)}")
  }

  test("migrate derives the SAME guarded pointers as externalize") {
    val out = java.nio.file.Files.createTempDirectory("blob-mig").toString
    val (n, ptr) = operators.Migration.migrate(df, col("order_id"),
      col("description"), col("order_blob"), s"$out/store", s"$out/ptr")
    assert(n == 1, "objectsWritten counts only rows whose object landed")
    assert(ptr.count() == 3, "every pointer row committed, NULLs included")
    val nullPtrs = ptr.filter(col("s3_prefix").isNull).count()
    assert(nullPtrs == 2,
      "null-blob and null-source rows carry NULL pointers in the table")
  }

  test("blob sink skips unwritable rows instead of NPEing the task") {
    val ext = operators.Migration.externalize(df, col("order_id"),
      col("description"), col("order_blob"))
    val joined = df.join(
      ext.select(col("record_id").as("order_id"), col("s3_prefix")), "order_id")
    val out = java.nio.file.Files.createTempDirectory("blob-null").toString
    val n = sources.BlobSink.write(joined, out, "s3_prefix", "order_blob")
    assert(n == 1, s"wrote $n: only row 1 has both a prefix and a payload")
    // writeThrough: every row passes through, only writable blobs land
    val through = sources.BlobSink.writeThrough(joined, out + "2",
      "s3_prefix", "order_blob")
    assert(through.count() == 3, "pointer rows all reach the table")
  }

  test("writeThrough nulls the pointer when the object write is skipped") {
    // a non-NULL prefix paired with a NULL blob is reachable through
    // the generic API (Migration.prefixExpr guards its own callers
    // only): the object write is skipped, so the emitted pointer must
    // be NULL — a pointer row claiming an object that was never
    // written is a dangling reference
    val schema = T.StructType(Seq(
      T.StructField("order_id", T.LongType),
      T.StructField("s3_prefix", T.StringType),
      T.StructField("order_blob", T.BinaryType)))
    val rows = Seq(
      Row(10L, "dangling/10/deadbeef", null),
      Row(11L, "real/11/cafe", "bytes".getBytes("UTF-8")))
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val out = java.nio.file.Files.createTempDirectory("blob-dangle").toString
    val through = sources.BlobSink.writeThrough(df2, out,
      "s3_prefix", "order_blob")
    val ptr = through.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(ptr(10L).isEmpty,
      "skipped object write must null the emitted pointer")
    assert(ptr(11L).contains("real/11/cafe"), "written row keeps its pointer")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "dangling/10/deadbeef")),
      "no object may exist for the skipped row")
    // the invariant the fix establishes: pointer-non-null ⟺ object-exists
    val inv = sources.BlobSink.inventory(spark, out).collect()
      .map(_.getString(0)).toSet
    assert(inv == Set("real/11/cafe"), s"inventory = $inv")
  }
}
