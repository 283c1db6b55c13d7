package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate embedding inputs: null vectors, wrong-length vectors,
  * zero vectors. One malformed row must never kill a corpus-scale
  * ANN/near-dup pass (ANSI `element_at` used to throw on a short
  * vector inside the LSH banding). */
class EmbeddingNullSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (1L, Array.fill(64)(0.5f), 0),
      (2L, null.asInstanceOf[Array[Float]], 0),
      (3L, Array.fill(8)(0.5f), 0), // short vector
      (4L, Array.fill(64)(0.0f), 0) // zero vector (norm 0)
    ).toDF("vec_id", "embedding", "label")
  }

  test("LSH banding tolerates short and null vectors (no ANSI throw)") {
    // used to throw SparkArrayIndexOutOfBoundsException on vec 3
    val knn = operators.Similarity.lshKnn(vecs, "vec_id", "embedding",
      col("vec_id") === 1, 3)
    assert(knn.count() <= 3) // must complete, not crash
    val pairs = operators.Similarity.nearDupPairsLsh(
      vecs, "vec_id", "embedding", 0.5)
    // degenerate rows produce NULL cosines, which the threshold drops;
    // nothing crashes and no spurious pair appears
    assert(pairs.filter(col("v1") === 2 || col("v2") === 2 ||
      col("v1") === 3 || col("v2") === 3).count() == 0)
  }

  test("PQ encode and semDedup stay total under degenerate rows") {
    // a NULL embedding yields NULL subspace dots -> NULL codes -> the
    // vector simply never matches a LUT row; a short vector's missing
    // subspaces drop out the same way; nothing crashes
    val top = operators.Similarity.ivfPqKnn(vecs, "vec_id", "embedding",
      col("vec_id") === 1, col("vec_id") === 1, 3).collect()
    assert(top.length <= 3)
    val kept = operators.Similarity.semDedup(vecs, "vec_id", "embedding",
      col("vec_id") === 1, 0.9).collect()
    assert(kept.length == 4, "no degenerate row may be silently dropped")
    // the LSH coarse quantizer (s6) must be exactly as total: a
    // null/short/zero vector's band bits fall to 0 and its candidate
    // cosines are NULL — it still gets a deterministic assignment (or
    // the fallback) and cannot crash the encode
    val topL = operators.Similarity.ivfPqKnnLsh(vecs, "vec_id", "embedding",
      col("vec_id") === 1, col("vec_id") === 1, 3, bits = 2).collect()
    assert(topL.length <= 3)
  }

  test("brute knn and kmeans stay total under degenerate rows") {
    // collect(), NOT count(): count lets Catalyst prune the aggregate
    // that evaluates the per-dim element accesses, so a crashing
    // centroid-update path would still count fine (seen in review)
    assert(operators.Similarity.bruteKnn(vecs, "vec_id", "embedding",
      col("vec_id") === 1, 3).collect().length <= 3)
    val asg = operators.Similarity.kmeansAssign(vecs, "vec_id", "embedding",
      col("vec_id") === 1, 2).collect()
    assert(asg.length == 4, "every vector assigned, none crashed the job")
  }
}
