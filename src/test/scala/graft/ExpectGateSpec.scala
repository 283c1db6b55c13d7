package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-level aggregate expectations ([[graft.sources.Expect]]
  * BatchGate tier): row-count drift vs the trailing window and
  * key-uniqueness rate — the whole-batch alarms row rules cannot
  * express. */
class ExpectGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.sources.Expect

  private val rules = Seq(Expect.Rule("pos", "v > 0"))

  private def freshDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.delete(); d.getPath
  }

  private def mk(n: Long, from: Long = 0L) =
    spark.range(from, from + n).select(col("id"), lit(1.0).as("v"))

  test("row-count drift: passes open under minHistory, then refuses a batch straying past maxFrac — nothing lands") {
    val dir = freshDir("gate_drift")
    val gates = Seq(Expect.RowCountDrift(maxFrac = 0.5, minHistory = 3))
    // 3 batches of ~100 land (under minHistory the gate passes open)
    Expect.writeExpectGated(spark, dir, 1L, mk(100L), rules, gates)
    Expect.writeExpectGated(spark, dir, 2L, mk(110L, 1000L), rules, gates)
    Expect.writeExpectGated(spark, dir, 3L, mk(90L, 2000L), rules, gates)
    // a half-empty extract (20 rows vs mean 100) refuses BY NAME
    val e = intercept[IllegalStateException] {
      Expect.writeExpectGated(spark, dir, 4L, mk(20L, 3000L), rules, gates)
    }
    assert(e.getMessage.contains("BATCH GATE REFUSED") &&
      e.getMessage.contains("row_count_drift"))
    // nothing landed: batch 4 is absent on both sides
    assert(graft.sources.LakeSink.readBatches(spark, dir).count() == 300L)
    // an in-band batch still lands
    val (v, q) = Expect.writeExpectGated(spark, dir, 4L, mk(95L, 3000L),
      rules, gates)
    assert(v == 95L && q == 0L)
  }

  test("row-count drift reads persisted per-batch counts — counted batches are never re-opened") {
    val dir = freshDir("gate_counts")
    val gates = Seq(Expect.RowCountDrift(maxFrac = 0.5, minHistory = 3))
    Expect.writeExpectGated(spark, dir, 1L, mk(100L), rules, gates)
    Expect.writeExpectGated(spark, dir, 2L, mk(100L, 1000L), rules, gates)
    Expect.writeExpectGated(spark, dir, 3L, mk(100L, 2000L), rules, gates)
    // batch 4's gate evaluation counts batches 1-3 once and persists
    Expect.writeExpectGated(spark, dir, 4L, mk(100L, 3000L), rules, gates)
    val counts = Option(new java.io.File(dir, "_counts").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(Set("batch-1", "batch-2", "batch-3").subsetOf(counts),
      s"per-batch counts must persist: $counts")
    // destroy batches 1-3's DATA files: a gate that re-opened them
    // would die reading an empty dir — the persisted counts carry it
    for (b <- Seq("batch-1", "batch-2", "batch-3"))
      Option(new java.io.File(dir, b).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-")).foreach(f => assert(f.delete()))
    val (v, _) = Expect.writeExpectGated(spark, dir, 5L, mk(100L, 4000L),
      rules, gates)
    assert(v == 100L, "an in-band batch lands off the persisted counts")
    val e = intercept[IllegalStateException] {
      Expect.writeExpectGated(spark, dir, 6L, mk(10L, 5000L), rules, gates)
    }
    assert(e.getMessage.contains("row_count_drift"),
      "drift still refuses off the persisted counts")
  }

  test("key-uniqueness rate: a duplicated extract refuses; the clean replay lands") {
    val dir = freshDir("gate_uniq")
    val gates = Seq(Expect.KeyUniqueness("id", minRate = 1.0))
    val dup = mk(50L).unionAll(mk(5L)) // 5 ids twice
    val e = intercept[IllegalStateException] {
      Expect.writeExpectGated(spark, dir, 1L, dup, rules, gates)
    }
    assert(e.getMessage.contains("key_uniqueness"))
    val (v, _) = Expect.writeExpectGated(spark, dir, 1L, mk(50L), rules, gates)
    assert(v == 50L)
    // a tolerant rate passes a mildly-duplicated batch
    val (v2, _) = Expect.writeExpectGated(spark, dir, 2L,
      mk(50L, 100L).unionAll(mk(2L, 100L)),
      rules, Seq(Expect.KeyUniqueness("id", minRate = 0.9)))
    assert(v2 == 52L)
  }

  test("gated upserts: an aggregate violation holds the whole CDC batch before it touches the log") {
    val dir = freshDir("gate_ups")
    spark.range(20L).select(col("id"), lit(1.0).as("v")).write.parquet(dir)
    val dup = spark.range(5L, 10L).select(col("id"), lit(2.0).as("v"))
      .unionAll(spark.range(5L, 7L).select(col("id"), lit(3.0).as("v")))
    val e = intercept[IllegalStateException] {
      Expect.upsertExpectGated(spark, dir, 1L, dup, "id", rules,
        Seq(Expect.KeyUniqueness("id")))
    }
    assert(e.getMessage.contains("key_uniqueness"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_updates")),
      "nothing may touch the log when the gate refuses")
    val (u, i, q) = Expect.upsertExpectGated(spark, dir, 1L,
      spark.range(5L, 10L).select(col("id"), lit(2.0).as("v")),
      "id", rules, Seq(Expect.KeyUniqueness("id")))
    assert(u == 5L && i == 0L && q == 0L)
  }

  test("gates compose with row rules: the gate refuses the batch BEFORE any row quarantines") {
    val dir = freshDir("gate_compose")
    val gates = Seq(Expect.KeyUniqueness("id"))
    val bad = spark.range(10L).select(col("id"), lit(-1.0).as("v"))
      .unionAll(spark.range(3L).select(col("id"), lit(-1.0).as("v")))
    intercept[IllegalStateException] {
      Expect.writeExpectGated(spark, dir, 1L, bad, rules, gates)
    }
    // no quarantine batch landed either — the whole batch held
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_quarantine")))
    // with the gate green, row rules still split as ever
    val (v, q) = Expect.writeExpectGated(spark, dir, 1L,
      spark.range(10L).select(col("id"),
        when(col("id") < 3, -1.0).otherwise(1.0).as("v")), rules, gates)
    assert(v == 7L && q == 3L)
  }
}
