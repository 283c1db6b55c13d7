package graft

import graft.sources.JsonLines
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class JsonLinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  test("malformed lines are quarantined verbatim, good lines parse typed") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "guten tag", "lang": "de"}""",
      """{"doc_id": 3, "text": "truncated""",           // cut mid-string
      """not json at all""",
      """{"doc_id": 4, "text": "extra is fine", "lang": "en", "extra": 9}""")
    Files.write(java.nio.file.Paths.get(s"$dir/part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (good, bad) = JsonLines.read(spark, dir, schema)
    assert(good.columns.toSeq == Seq("doc_id", "text", "lang"))
    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(g.toSeq == Seq((1L, "hello world"), (2L, "guten tag"),
      (4L, "extra is fine")))
    val b = bad.collect().map(_.getString(0)).sorted
    assert(b.length == 2, s"quarantine: ${b.toSeq}")
    assert(b.exists(_.startsWith("""{"doc_id": 3""")), "truncated line verbatim")
    assert(b.contains("not json at all"))
  }

  test("readHandle.release unpersists the one cached parse (no ingest-loop leak)") {
    val dir = Files.createTempDirectory("graft_jsonl_rel").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part0.jsonl"),
      Seq("""{"doc_id": 1, "text": "a", "lang": "en"}""", """broken""")
        .mkString("\n").getBytes("UTF-8"))
    val before = spark.sparkContext.getPersistentRDDs.size
    val h = JsonLines.readHandle(spark, dir, schema)
    assert(h.good.count() == 1 && h.quarantined.count() == 1)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "the parse must be cached while both splits materialize")
    h.release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release() must unpersist the parse — repeated ingests in one " +
        "session must not accumulate cached parses")
  }

  test("streaming file-source ingest: files land, parse, and quarantine continuously") {
    // the only non-MemoryStream streaming path in the suite: a real
    // FileStreamSource watching a landing directory — the shape a
    // continuous crawl ingest actually has. Same schema contract as
    // the batch reader: good rows typed, bad lines quarantined, both
    // from ONE readStream.
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_jsonl_stream").toString
    val landing = s"$dir/landing"; new java.io.File(landing).mkdirs()
    val withCorrupt = StructType(
      schema.fields :+ StructField(JsonLines.CorruptCol, StringType))
    val parsed = spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", JsonLines.CorruptCol)
      .json(landing)
    val q = parsed.writeStream.format("memory").queryName("jsonl_ingest")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    def land(name: String, lines: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$landing/$name"),
        lines.mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
    }
    land("a.jsonl", Seq("""{"doc_id": 1, "text": "first", "lang": "en"}"""))
    land("b.jsonl", Seq("""{"doc_id": 2, "text": "second", "lang": "de"}""",
      """garbage line"""))
    q.stop()
    val all = spark.table("jsonl_ingest")
    assert(all.filter(col(JsonLines.CorruptCol).isNull).count() == 2)
    assert(all.filter(col(JsonLines.CorruptCol).isNotNull)
      .collect().map(_.getAs[String](JsonLines.CorruptCol)).toSeq ==
      Seq("garbage line"))
  }

  test("write/read round-trips the documents table") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString + "/docs"
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text", "lang")
    JsonLines.write(docs, dir)
    val (back, bad) = JsonLines.read(spark, dir, StructType(schema.fields))
    assert(bad.isEmpty, "round-trip must quarantine nothing")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
