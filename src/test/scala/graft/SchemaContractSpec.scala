package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The testdata schema contract (Tables.contract / checkContract).
  *
  * Round-7 regression class: the driver re-encoded `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the engine surfaced it
  * as 13 scattered analysis failures. The contract makes the next
  * such drift ONE assertion naming table, column, and offending type.
  */
class SchemaContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("real testdata conforms to the contract at every shipped SF") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val drift = Tables.checkContract(spark, s"/root/testdata/$sf")
      assert(drift.isEmpty, s"$sf drifted:\n  ${drift.mkString("\n  ")}")
    }
  }

  test("a re-typed events.ts yields one diagnostic naming table, column, type") {
    val dir = Files.createTempDirectory("graft_drift").toString
    // copy the real tables, then deliberately re-type events.ts
    for (n <- Tables.names) {
      val df = Tables.load(spark, TestSpark.sf, n)
      val out =
        if (n == "events") df.withColumn("ts", lit(1.5)) else df
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val drift = Tables.checkContract(spark, dir)
    assert(drift.length == 1, s"expected exactly one diagnostic, got:\n$drift")
    assert(drift.head ==
      "events.ts: expected one of [bigint, timestamp, timestamp_ntz], got double",
      drift.head)
  }

  test("a missing column is reported as MISSING, not a crash") {
    val dir = Files.createTempDirectory("graft_drift2").toString
    for (n <- Tables.names) {
      val df = Tables.load(spark, TestSpark.sf, n)
      val out = if (n == "documents") df.drop("lang") else df
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val drift = Tables.checkContract(spark, dir)
    assert(drift ==
      Seq("documents.lang: expected one of [string], column MISSING"), drift)
  }

  test("tsSec adapts per encoding and rejects the unsupported ones loudly") {
    import spark.implicits._
    // micros timestamp (what the lake ships today): NTZ after read
    val real = Tables.load(spark, TestSpark.sf, "events")
    val secReal = real.select(Tables.tsSec(real).as("sec"))
    assert(secReal.schema("sec").dataType.simpleString == "bigint")
    // raw nanosecond long (the NANOS encoding after nanosAsLong)
    val asLong = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val secLong = asLong.select(Tables.tsSec(asLong).as("sec")).head.getLong(0)
    assert(secLong == 1700000000L)
    // the two encodings agree row-for-row on the same instants
    val viaNanos = real.select(col("event_id"),
      (unix_micros(col("ts").cast("timestamp")) * 1000).as("ts"))
    assert(viaNanos.select(Tables.tsSec(viaNanos).as("sec"), col("event_id"))
      .except(real.select(Tables.tsSec(real).as("sec"), col("event_id")))
      .isEmpty)
    // anything else is an immediate, named error
    val bad = Seq((1L, "oops")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Tables.tsSec(bad))
    assert(e.getMessage.contains("events.ts"))
  }
}
