package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-validation tool must preserve workload shape, or the
  * SURVEY §6 ratios it feeds are measuring the wrong corpus. */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val out = java.nio.file.Files
    .createTempDirectory("scaleup-spec").toString

  private lazy val built: Unit =
    ScaleUp.run(spark, TestSpark.sf, out, 3)

  private def t(n: String) = spark.read.parquet(s"$out/$n.parquet")

  test("facts replicate by the factor; dims stay fixed") {
    built
    val src = Tables.load(spark, TestSpark.sf, "lineitem").count()
    assert(t("lineitem").count() == src * 3)
    assert(t("region").count() == 5 && t("nation").count() == 25)
  }

  test("replica 0 is byte-identical to the source") {
    built
    val src = Tables.load(spark, TestSpark.sf, "documents")
    val maxId = src.agg(max("doc_id")).head.getLong(0)
    val rep0 = t("documents").filter(col("doc_id") <= maxId)
    assert(rep0.exceptAll(src).count() == 0 &&
      src.exceptAll(rep0).count() == 0)
  }

  test("FK offsets move together: no orders point at another replica's customer") {
    built
    val dangling = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(dangling == 0, s"$dangling orders lost their customer")
    // and join fan-out scales exactly linearly (never cross-replica)
    val srcJoin = Tables.load(spark, TestSpark.sf, "orders")
      .join(Tables.load(spark, TestSpark.sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    val sclJoin = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey")).count()
    assert(sclJoin == srcJoin * 3)
  }

  test("re-lettering preserves length (n_chars stays consistent) and changes replicas") {
    built
    val bad = t("documents")
      .filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad == 0, "re-lettering must be length-preserving")
    // replicas of one source doc must NOT be exact duplicates of each
    // other (that would make every LSH bucket 3x deeper)
    val srcCnt = Tables.load(spark, TestSpark.sf, "documents").count()
    val distinctTexts = t("documents").select("text").distinct().count()
    assert(distinctTexts > srcCnt * 2,
      s"only $distinctTexts distinct texts across ${srcCnt * 3} docs")
  }

  test("second decade: factor > 10 keeps replicas distinct (two-alphabet rotation)") {
    // replica 10 shares replica 0's Alpha shift and differs only in
    // the Beta rotation — the exact collision the single-alphabet
    // design had; 12 replicas must still be pairwise non-identical
    val out12 = java.nio.file.Files
      .createTempDirectory("scaleup-spec-12").toString
    ScaleUp.run(spark, TestSpark.sf, out12, 12, Set("documents"))
    val docs = spark.read.parquet(s"$out12/documents.parquet")
    val srcCnt = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(docs.count() == srcCnt * 12)
    val distinctTexts = docs.select("text").distinct().count()
    assert(distinctTexts > srcCnt * 11,
      s"only $distinctTexts distinct texts across ${srcCnt * 12} docs — " +
        "replicas 10+ must not collapse onto replicas 0-9")
    // the subset arg materialized ONLY documents
    assert(!new java.io.File(s"$out12/lineitem.parquet").exists())
  }

  test("factor past the 100 distinct re-letterings is rejected") {
    val e = intercept[IllegalArgumentException] {
      ScaleUp.run(spark, TestSpark.sf, "/tmp/never-written", 101)
    }
    assert(e.getMessage.contains("[1, 100]"))
  }
}
