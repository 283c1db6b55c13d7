package graft

import graft.functions.CosineSimilarity.cosine_sim
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")

  test("native cosine expression is bit-identical to the composable form") {
    val a = emb.select(col("vec_id"), col("embedding"))
    val b = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val pairs = a.join(b, col("vec_id") % 50 === 0 && col("v2") % 71 === 0)
    val diff = pairs.select(
      cosine_sim(col("embedding"), col("e2")).as("native"),
      (Similarity.dot(col("embedding"), col("e2")) /
        (Similarity.norm(col("embedding")) * Similarity.norm(col("e2"))))
        .as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("cosine of a vector with itself is 1") {
    val selfs = emb.select(cosine_sim(col("embedding"), col("embedding")).as("c"))
      .agg(min("c").as("lo"), max("c").as("hi")).collect().head
    assert(math.abs(selfs.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(selfs.getDouble(1) - 1.0) < 1e-9)
  }

  test("brute knn returns k ranked neighbors per probe") {
    val k = Similarity.bruteKnn(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 3)
    val per = k.groupBy("probe_id").agg(count(lit(1)).as("n"),
      max("rn").as("maxrn"))
    assert(per.filter(col("n") =!= 3 || col("maxrn") =!= 3).count() == 0)
    // ranks strictly ordered by cos6 desc within probe
    val bad = k.withColumn("prev",
      lag("cos6", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy("rn")))
      .filter(col("prev").isNotNull && col("prev") < col("cos6"))
    assert(bad.count() == 0)
  }

  test("lsh knn agrees with brute knn restricted to the probe's bucket") {
    val lsh = Similarity.lshKnn(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 5)
    val withBucket = emb.withColumn("bucket",
      Similarity.signBucket(col("embedding")))
    val buckets = withBucket.select(col("vec_id").as("neighbor_id"),
      col("bucket").as("nb"))
    val probeBuckets = withBucket.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("bucket").as("pb"))
    // every LSH neighbor shares the probe's bucket
    val joined = lsh.join(buckets, "neighbor_id").join(probeBuckets, "probe_id")
    assert(joined.filter(col("nb") =!= col("pb")).count() == 0)
  }
}
