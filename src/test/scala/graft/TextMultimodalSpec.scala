package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  test("quality ratios are well-formed") {
    val q = TextAnalysis.quality(docs, "doc_id", "text")
    val bad = q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
      col("score") < 0 || col("score") > 1 || col("n_tok") <= 0)
    assert(bad.count() == 0)
  }

  test("fingerprint is invariant to case and punctuation") {
    val mangled = docs.withColumn("text",
      concat(upper(substring(col("text"), 1, 10)),
        expr("substring(text, 11)"), lit("!!!")))
    val a = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .withColumnRenamed("fp", "fp_a")
    val b = TextAnalysis.fingerprint(mangled, "doc_id", "text")
      .withColumnRenamed("fp", "fp_b")
    assert(a.join(b, "doc_id").filter(col("fp_a") =!= col("fp_b")).count() == 0)
  }

  test("langId covers every doc exactly once") {
    val l = TextAnalysis.langId(docs, "doc_id", "text")
    assert(l.count() == docs.count())
    assert(l.select("doc_id").distinct().count() == docs.count())
  }

  test("multimodal decode plumbing: stable stub metadata, no shuffle") {
    val bin = Multimodal.asBinary(docs, "doc_id", "text")
    val meta = Multimodal.decodeMeta(bin)
    assert(meta.count() == docs.count())
    val m = meta.filter(col("record_id") === 7).collect().head
    val m2 = Multimodal.decodeMeta(bin).filter(col("record_id") === 7)
      .collect().head
    assert(m == m2, "stub decode must be deterministic")
    assert(m.width >= 16 && m.height >= 16 && m.n_frames >= 1)
    // decode is partition-local: no exchange in the plan
    assert(!meta.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("frame sampling yields ceil(bytes/stride) frames with features") {
    val bin = Multimodal.asBinary(docs.limit(20), "doc_id", "text")
    val frames = Multimodal.sampleFrames(bin, stride = 100)
    val perDoc = frames.groupBy("record_id").count()
    val expect = docs.limit(20).select(col("doc_id").cast("long").as("record_id"),
      ceil(length(col("text")) / 100.0).as("want"))
    val joined = perDoc.join(expect, "record_id")
    assert(joined.filter(col("count") =!= col("want")).count() == 0)
    assert(frames.filter(size(col("feature")) =!= 8).count() == 0)
  }
}
