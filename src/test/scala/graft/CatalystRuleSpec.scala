package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule (`graft.plans.DistinctPairRewrite` via
  * `SparkSessionExtensions.injectOptimizerRule` — GraftSession's
  * builder): the measured q43 multi-distinct Expand trap (§6,
  * r = 10.1 → 4.8) generalized as a planner rewrite, conf-gated off
  * by default. */
class CatalystRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val FLAG = "spark.graft.distinctPairRewrite"

  private def li = Tables.load(spark, TestSpark.sf, "lineitem")

  private def doubleDistinct = li.groupBy("l_returnflag")
    .agg(countDistinct("l_partkey").as("np"),
      countDistinct("l_suppkey").as("ns"))

  private def pairAggs(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions.size == 3 => a
    }

  private def withFlag[A](on: Boolean)(f: => A): A = {
    spark.conf.set(FLAG, on.toString)
    try f finally spark.conf.unset(FLAG)
  }

  test("default off: no pair aggregate appears (the rule must be an explicit choice)") {
    assert(pairAggs(doubleDistinct).isEmpty,
      "with the flag unset the plan must be Spark's own")
    // and the measured trap is really there to fix: the default plan
    // Expands the scan relation for the multi-distinct
    assert(doubleDistinct.queryExecution.executedPlan.toString
      .contains("Expand"))
  }

  test("enabled: distinct pair aggregate planned below; results identical; fixpoint converges") {
    val off = doubleDistinct.collect().map(_.toString).sorted.toSeq
    withFlag(true) {
      val df = doubleDistinct
      // exactly ONE pair aggregate — the convergence guard must stop
      // the fixpoint batch from stacking a second
      assert(pairAggs(df).size == 1,
        df.queryExecution.optimizedPlan.toString.take(1500))
      // the Expand now replicates the pair relation: it sits ABOVE an
      // Aggregate in the physical plan, not directly above the scan
      val p = df.queryExecution.executedPlan.toString
      val iExpand = p.indexOf("Expand")
      assert(iExpand >= 0 && p.indexOf("HashAggregate", iExpand) >= 0,
        "the Expand must feed from the pair aggregate:\n" + p.take(1500))
      assert(df.collect().map(_.toString).sorted.toSeq == off,
        "the rewrite must be invisible in results")
    }
  }

  test("value-set semantics survive: sum/avg distinct + NULLs identical on and off") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 1.0), ("a", 1L, 1.0), ("a", 2L, null),
      ("a", null, 3.0), ("b", null, null), ("b", 5L, 2.0))
      .toDF("g", "x", "y")
    def q = df.groupBy("g").agg(
      countDistinct("x").as("nx"), sum_distinct(col("y")).as("sy"),
      count_distinct(col("y")).as("ny"))
    val off = q.collect().map(_.toString).sorted.toSeq
    val on = withFlag(true) {
      assert(pairAggs(q).size == 1, "three distincts over two args pair up")
      q.collect().map(_.toString).sorted.toSeq
    }
    assert(on == off, s"on=$on off=$off")
  }

  test("ineligible shapes bail: mixed plain aggregate, single distinct arg") {
    withFlag(true) {
      // a plain count(1) would count PAIR rows after the rewrite —
      // the rule must refuse the whole Aggregate
      val mixed = li.groupBy("l_returnflag").agg(
        countDistinct("l_partkey"), countDistinct("l_suppkey"),
        count(lit(1)))
      assert(pairAggs(mixed).isEmpty, "mixed distinct+plain must bail")
      // two distincts over the SAME argument plan no Expand anyway
      val same = li.groupBy("l_returnflag").agg(
        countDistinct("l_partkey"), sum_distinct(col("l_partkey")))
      assert(pairAggs(same).isEmpty, "single distinct argument must bail")
      assert(mixed.collect().nonEmpty && same.collect().nonEmpty)
    }
  }

  test("every native is reachable from plain spark.sql and matches its Column-API twin") {
    import spark.implicits._
    import graft.functions.{SortedIntersectCount, TextHashes}
    val df = Seq((1L, "alpha beta gamma alpha", Seq(1L, 3L, 9L),
        Seq(3L, 9L, 11L))).toDF("id", "text", "sa", "sb")
    df.createOrReplaceTempView("natives_t")
    // token-array natives: SQL expression ≡ Column API bit for bit
    val viaSql = spark.sql("""
      SELECT shingle_hash48(split(text, ' ')) AS sh,
             minhash_sig(split(text, ' ')) AS ms,
             ngram_hash48(split(text, ' '), 2) AS ng,
             md5_fold48(text) AS mf,
             sorted_intersect_count(sa, sb) AS ic
      FROM natives_t""").collect().head
    val viaCol = df.select(
        TextHashes.shingle_hash48(split(col("text"), " ")).as("sh"),
        TextHashes.minhash_sig(split(col("text"), " ")).as("ms"),
        TextHashes.ngram_hash48(split(col("text"), " "), 2).as("ng"),
        TextHashes.md5_fold48(col("text")).as("mf"),
        SortedIntersectCount.sorted_intersect_count(col("sa"), col("sb"))
          .as("ic")).collect().head
    assert(viaSql.toString == viaCol.toString)
    assert(viaSql.getInt(4) == 2, "intersect {3,9}")
    // bloom_hit: the sized parameters must be literals, by name
    val bloom = graft.operators.TextAnalysis.bloomFilterOfDigests(
      Seq(7L, 8L).toDF("dig"), 1 << 10, 3)
    bloom.createOrReplaceTempView("natives_bloom")
    val hits = spark.sql("""
      SELECT bloom_hit(CAST(d AS STRING), bloom, 3, 1024) AS h
      FROM (VALUES (7), (99)) v(d) CROSS JOIN natives_bloom""")
      .collect().map(_.getBoolean(0)).toSeq
    assert(hits.head, "a member key must hit")
    val e = intercept[Exception] {
      spark.sql("SELECT bloom_hit('x', bloom, 3, id + 1) FROM natives_bloom CROSS JOIN (SELECT 1 AS id)").collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"non-literal sizing must refuse by name: ${e.getMessage.take(120)}")
  }

  test("BloomPruneRule: planner-applied manifest pruning — WHERE k = v reads ~1 file, off by default, results identical") {
    import spark.implicits._
    import graft.sources.LakeSink
    val PFLAG = "spark.graft.bloomPrune.enabled"
    val out = java.nio.file.Files.createTempDirectory("graft_bprule")
      .toString + "/t"
    // date-sorted layout, bit-reversed key: min/max stats useless for
    // key lookups (the LakeSpec fixture), bloom decisive
    def bitrev(i: Long): Long =
      (0 until 12).map(b => ((i >> b) & 1L) << (11 - b)).sum
    val rows = (0L until 4000L).map(i => (bitrev(i), i, s"p$i"))
      .toDF("k", "day", "payload")
    rows.repartitionByRange(8, col("day")).sortWithinPartitions("day")
      .write.parquet(out)
    LakeSink.attachBlooms(spark, out, "k")
    val probe = bitrev(2222L)
    def lookup() = spark.read.parquet(out).filter(col("k") === probe)
    // OFF (default): every file read
    assert(lookup().queryExecution.executedPlan.toString.nonEmpty)
    assert(lookup().inputFiles.length == 8,
      "rule must be an explicit choice — default reads everything")
    val expect = lookup().collect().map(_.toString).toSeq
    spark.conf.set(PFLAG, "true")
    try {
      // ON: the optimizer swaps the file index for the bloom
      // survivors; the residual Filter stays (FP safety), results
      // identical, ~1 file read
      val pruned = lookup()
      assert(pruned.inputFiles.length <= 2,
        s"planner must prune to the owning file: ${pruned.inputFiles.length}")
      assert(pruned.collect().map(_.toString).toSeq == expect)
      // literal-on-the-left and spark.sql both fire
      val swapped = spark.read.parquet(out).filter(lit(probe) === col("k"))
      assert(swapped.inputFiles.length <= 2)
      spark.read.parquet(out).createOrReplaceTempView("bprule_t")
      val viaSql = spark.sql(s"SELECT * FROM bprule_t WHERE k = $probe")
      assert(viaSql.inputFiles.length <= 2,
        "spark.sql lookups must prune through the same rule")
      assert(viaSql.collect().map(_.toString).toSeq == expect)
      // absent key: zero files, empty result — still correct
      val none = spark.read.parquet(out).filter(col("k") === -7L)
      assert(none.collect().isEmpty)
      // a column with NO manifest never fires (day carries none)
      val noMan = spark.read.parquet(out).filter(col("day") === 17L)
      assert(noMan.inputFiles.length == 8 && noMan.count() == 1L)
    } finally spark.conf.unset(PFLAG)
  }
}
