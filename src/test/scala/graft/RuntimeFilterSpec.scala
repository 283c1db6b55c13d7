package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The join-planning tier ([[graft.operators.RuntimeFilter]]): the
  * runtime Bloom semi-join filter (q49) and CMS join-cardinality
  * estimation (q50). The contracts that matter at 100 TB: NO false
  * negatives ever (the filtered join stays exact), the reduction is
  * map-only (no exchange before the real join's), and the
  * cardinality estimate is one-sided (est ≥ exact, always). */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.operators.RuntimeFilter._

  private def docsFixture = {
    import spark.implicits._
    // fact: key ∈ 0..99 with multiplicity (i % 7); dim keys: 0..9
    (0 until 500).map(i => (i.toLong, i.toLong % 100)).toDF("row_id", "fk")
  }

  test("bloomReduce: zero false negatives — every matching row survives") {
    import spark.implicits._
    val fact = docsFixture
    val dim = (0L until 10L).toDF("pk")
    val survivors = bloomReduce(fact, "fk", dim, "pk").collect().toSet
    val truth = fact.join(dim, col("fk") === col("pk"))
      .select(col("row_id"), col("fk")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = survivors.map(r => (r.getLong(0), r.getLong(1)))
    assert(truth.subsetOf(got), "a matching fact row was dropped")
    // and the reduction actually reduces at the default sizing
    assert(got.size < fact.count(),
      s"no reduction: ${got.size} of ${fact.count()}")
  }

  test("bloomReduce: an undersized filter false-positives but never drops a match") {
    import spark.implicits._
    val fact = docsFixture
    val dim = (0L until 10L).toDF("pk")
    // 32 bits, 1 probe → heavy collisions by construction
    val got = bloomReduce(fact, "fk", dim, "pk", mBits = 32, k = 1)
      .select(col("fk")).distinct().collect().map(_.getLong(0)).toSet
    assert((0L until 10L).toSet.subsetOf(got),
      "false negative under collisions — the one-sided contract broke")
    assert(got.size > 10, "fixture failed to collide (widen the check)")
    // and the real join after the filter is still exact
    val joined = bloomReduce(fact, "fk", dim, "pk", mBits = 32, k = 1)
      .join(dim, col("fk") === col("pk")).count()
    assert(joined === fact.join(dim, col("fk") === col("pk")).count())
  }

  test("bloomReduce adds no exchange on the fact side (map-only probe)") {
    import spark.implicits._
    val fact = docsFixture
    val dim = (0L until 10L).toDF("pk")
    def nExchanges(p: String) =
      "Exchange hashpartitioning".r.findAllIn(p).length
    // the bitmap BUILD aggregates the dim key set (fixed-width,
    // dim-sized exchanges — the legitimate cost); the fact side must
    // contribute ZERO additional exchanges: every exchange in the
    // reduction plan is already in the build-only plan
    val buildOnly = graft.operators.TextAnalysis.bloomFilterOfDigests(
      dim.select(col("pk").as("dig")), 1 << 16, 3)
      .queryExecution.executedPlan.toString
    val reduced = bloomReduce(fact, "fk", dim, "pk")
      .queryExecution.executedPlan.toString
    assert(nExchanges(reduced) === nExchanges(buildOnly),
      s"bloom probe shuffled the fact side:\n$reduced")
  }

  test("q49 ≡ the plain join (false positives removed by the real join)") {
    val d = TestSpark.sf
    val got = SparkEntry.queries("q49_bloom_semijoin")(spark, d)
      .collect().map(_.toSeq).toSeq
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val pt = spark.read.parquet(s"$d/part.parquet")
      .filter(col("p_brand").isin("Brand#23", "Brand#34"))
    val plain = li.join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        graft.queries.Analytics.moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand").collect().map(_.toSeq).toSeq
    assert(got === plain)
  }

  test("q49 keeps the shuffle join the operator exists for") {
    val p = SparkEntry.queries("q49_bloom_semijoin")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"),
      "the merge hint (the too-big-to-broadcast dim shape) was lost")
  }

  test("cms inner product: exact on a collision-free micro fixture") {
    import spark.implicits._
    // A = {a×2, b×1}, B = {a×1, b×2} → |A ⋈ B| = 2·1 + 1·2 = 4
    val a = Seq("a", "a", "b").toDF("k")
    val b = Seq("a", "b", "b").toDF("k")
    val est = innerProductEst(cmsOfKeys(a, "k", 1024, 3),
      cmsOfKeys(b, "k", 1024, 3)).collect()(0).getLong(0)
    assert(est === 4L)
  }

  test("q50: one-sided (est ≥ exact) and tight at the shipped width") {
    val rows = SparkEntry.queries("q50_join_card")(spark, TestSpark.sf)
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact,
        s"${r.getString(0)}: CMS underestimated ($est < $exact)")
      assert(est <= exact * 1.05,
        s"${r.getString(0)}: error above 5% ($est vs $exact)")
    }
  }

  test("cms estimate sees a planted skew explosion the key counts hide") {
    import spark.implicits._
    // 1000 rows over 100 keys, but one hot key holds half the mass:
    // self-join size ≈ 500² — the estimate must report the explosion
    val skewed = ((0 until 500).map(_ => "hot") ++
      (0 until 500).map(i => s"k${i % 99}")).toDF("k")
    val cms = cmsOfKeys(skewed, "k", 65536, 4).localCheckpoint()
    val est = innerProductEst(cms, cms).collect()(0).getLong(0)
    val exact = skewed.groupBy("k").count()
      .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)
    assert(est >= exact && est <= (exact * 1.05).toLong)
    assert(est >= 250000L, "the hot key's quadratic mass went missing")
  }
}
