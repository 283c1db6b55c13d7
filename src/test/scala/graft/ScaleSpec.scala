package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-adaptivity assertions for the two mechanisms that keep
  * 100 TB joins healthy without hand-tuning: AQE skew-join splitting
  * (a hot key must not pin one task at the stage's tail) and runtime
  * bloom-filter pushdown (a selective dimension filter must prune the
  * fact scan before the shuffle). Thresholds are scaled down so the
  * mechanisms trigger at test size; the PLAN SHAPE is what's asserted.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition instead of tailing on it") {
    // key 0 carries ~100x the rows of every other key — the classic
    // hot-key shape that, un-split, makes one task the stage tail
    import spark.implicits._
    val skewedLeft = spark.range(200000)
      .select((when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000))
        .as("k"), col("id").as("payload"))
    val right = spark.range(1000).select(col("id").as("rk"),
      (col("id") * 2).as("rv"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      // aggregate on a NON-join key: a groupBy on the join key would
      // reuse the join's partitioning, and AQE (correctly) refuses to
      // split a skewed partition when that breaks a downstream
      // requirement
      val joined = skewedLeft.join(right, col("k") === col("rk"))
        .agg(sum("payload").as("t"), count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE must mark and split the skewed partition:\n" + p.take(1500))
    }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // fact ~600k rows, dim filtered to ~1% of keys: worth a bloom
    spark.range(600000).select((col("id") % 10000).as("fk"),
      col("id").as("v")).write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(10000).select(col("id").as("dk"),
      (col("id") % 100).as("cat")).write.mode("overwrite").parquet(s"$dir/dim")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 7)
      val joined = fact.join(dim, col("fk") === col("dk"))
        .agg(sum("v").as("t"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        "selective dim filter must inject a bloom filter on the fact scan:\n" +
          p.take(1500))
    }
  }
}
