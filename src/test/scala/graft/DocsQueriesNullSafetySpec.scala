package graft

import org.apache.spark.sql.{Row, types => T}
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate documents table (NULL text, empty text, single token,
  * an exact-dup pair) driven through the round-8 document queries:
  * every query must COMPLETE — a null/empty doc may drop out of a
  * shingle/frame stream (both engines agree on that) but must never
  * kill the job. */
class DocsQueriesNullSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("doc-degenerate").toString
    val schema = T.StructType(Seq(
      T.StructField("doc_id", T.LongType), T.StructField("text", T.StringType),
      T.StructField("lang", T.StringType), T.StructField("source", T.StringType),
      T.StructField("n_chars", T.LongType)))
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      Row(1L, null, "en", "src1", null),
      Row(2L, "", "en", "src1", 0L),
      Row(3L, "solo", "de", "src2", 4L),
      Row(4L, s"shared prefix $body", "en", "src1", 260L),
      Row(5L, s"shared prefix $body", "en", "src2", 260L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("round-8 document queries complete over null/empty/tiny docs") {
    for (q <- Seq("d19_dup_ngrams", "d20_containment", "m8_frame_neardup",
        "t13_ppl_buckets", "d1_dedup_exact", "d2_dedup_minhash")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows != null, s"$q crashed") // completion is the contract
    }
    // and the exact-dup pair is still found despite the degenerates
    val d1 = SparkEntry.queries("d1_dedup_exact")(spark, dir).collect()
    assert(d1.exists(r => r.getLong(2) == 2L), "planted dup pair missed")
  }
}
