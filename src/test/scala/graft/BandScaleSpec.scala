package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The banded-LSH broadcast ceiling (VERDICT-r8 top item): every
  * banded operator used to broadcast its anchor/centroid table
  * unconditionally, and under the occupancy rule (k ∝ |corpus|) that
  * table GROWS with the data — a hard stop near 1e6 cells. The fix
  * is size-aware: past the session broadcast threshold the band join
  * degrades to a shuffle-hash join on the (t, bkt) equi-key and the
  * exact fallback to a salted all-pairs product. These specs force
  * the non-broadcast regime (`autoBroadcastJoinThreshold=-1`) and pin
  * (a) the plan: zero broadcast joins, zero CartesianProducts, band
  * join present as ShuffledHashJoin; (b) the RESULTS: bit-identical
  * to the broadcast path — strategy choice must never change values.
  */
class BandScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import operators.Similarity

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertNoBroadcast(df: DataFrame): Unit = {
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      "non-broadcast regime must not plan a broadcast-hash join:\n" + p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "non-broadcast regime must not plan a BNLJ:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"),
      "the salted fallback must keep the product an equi-join:\n" + p.take(1500))
    assert(p.contains("ShuffledHashJoin"),
      "band join must degrade to shuffle-hash on (t, bkt):\n" + p.take(1500))
  }

  private def emb = Tables.load(spark, TestSpark.sf, "embeddings")

  test("kmeansAssignLsh: threshold=-1 plans shuffle band join, assignment identical") {
    def run() = Similarity.kmeansAssignLsh(emb, "vec_id", "embedding",
      col("vec_id") % 125 === 0, iters = 2, bits = 2)
    val base = rows(run())
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val asg = run()
      assertNoBroadcast(asg)
      assert(rows(asg) == base,
        "assignment must be bit-identical across join strategies")
    }
  }

  test("d16 semDedupLsh: threshold=-1 survivors identical to broadcast path") {
    def run() = {
      val k = emb.filter(col("vec_id") % 125 === 0).count()
      Similarity.semDedupLsh(emb, "vec_id", "embedding",
        col("vec_id") % 125 === 0, 0.35, Similarity.corpusBits(k, 4))
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"))
    }
    val base = rows(run())
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(rows(run()) == base,
        "d16 survivors must be identical across join strategies")
    }
  }

  test("persisted-index probes: threshold=-1 answers identical (serving is strategy-invariant)") {
    // the SERVING path must give the same answers whatever join
    // strategy the session/config picks — a vector store cannot
    // return different neighbors because an executor count changed
    // the broadcast decision. Build once, probe under both regimes.
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_bs").toString
    operators.VectorIndex.write(emb, "vec_id", "embedding",
      col("vec_id") % 125 === 0, dir, stamp = "bs")
    val probes = emb.filter(col("vec_id") % 17 === 0).localCheckpoint(true)
    val baseP = rows(operators.VectorIndex.probe(spark, dir, probes, 5, 2))
    val baseR = rows(operators.VectorIndex.probeRerank(spark, dir, probes, 5))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = operators.VectorIndex.probe(spark, dir, probes, 5, 2)
      assert(!p.queryExecution.executedPlan.toString.contains("CartesianProduct"))
      assert(rows(p) == baseP,
        "probe answers must be identical across join strategies")
      assert(rows(operators.VectorIndex.probeRerank(spark, dir, probes, 5))
        == baseR,
        "rerank answers must be identical across join strategies")
    }
  }

  test("s8 ivfKnnLsh: threshold=-1 plans no broadcast, top-k identical") {
    def run() = {
      val k = emb.filter(col("vec_id") % 125 === 0).count()
      Similarity.ivfKnnLsh(emb, "vec_id", "embedding",
        col("vec_id") % 125 === 0, col("vec_id") % 17 === 0, 5, nprobe = 2,
        bits = Similarity.corpusBits(k, 4))
    }
    val base = rows(run())
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val knn = run()
      assertNoBroadcast(knn)
      assert(rows(knn) == base,
        "s8 neighbors must be identical across join strategies")
    }
  }
}
