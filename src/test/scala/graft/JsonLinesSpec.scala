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
