package graft

import org.apache.spark.sql.{Row, types => T}
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate event streams: null users/timestamps/values, NULL and
  * malformed JSON props. Every event query must complete (one bad
  * event must never kill an aggregation — q20's ANSI cast used to),
  * and the malformed rows land in the NULL bucket, not nowhere. */
class EventsNullSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("ev-degenerate").toString
    val base = 1704067200L * 1000000000L
    val schema = T.StructType(Seq(
      T.StructField("event_id", T.LongType), T.StructField("ts", T.LongType),
      T.StructField("user_id", T.LongType), T.StructField("event_type", T.StringType),
      T.StructField("value", T.DoubleType), T.StructField("props", T.StringType)))
    val rows = Seq(
      Row(1L, base, 1L, "click", 1.5, """{"k":"7","v":1}"""),
      Row(2L, base + 60L * 1000000000L, 1L, "view", 2.0, """{"k":"abc"}"""),
      Row(3L, base + 120L * 1000000000L, null, "click", 0.5, null),
      Row(4L, null, 2L, "purchase", null, "not json at all"),
      Row(5L, base + 300L * 1000000000L, 2L, "error", 3.0, """{"nope":1}"""),
      // digit run longer than Int64: passes a naive [0-9]+ admit
      // regex yet overflows the ANSI BIGINT cast on both engines
      Row(6L, base + 360L * 1000000000L, 3L, "click", 1.0,
        """{"k":"99999999999999999999"}"""))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("every event query completes over nulls and malformed props") {
    // also the nanos-LONG branch of Tables.tsSec/tsNative: this
    // synthetic table is the TIMESTAMP(NANOS) encoding the adaptive
    // extraction must keep supporting alongside the lake's MICROS
    for (q <- Seq("q16_sessionize", "q17_pivot", "q18_timeagg", "q19_running",
        "q20_json", "q23_asof", "q26_leadlag", "q28_rangejoin",
        "q29_rangewindow", "q30_funnel", "q31_retention",
        "q36_timeagg_native", "q37_latest", "q38_scd2_islands",
        "q41_resample", "q42_paths", "q45_asof_join",
        "q52_interval_shuffle", "q58_interval_skew")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      // q28's ±300s error×click pairing, q42's 3-event paths, and
      // the interval self-joins (the one purchase row carries a NULL
      // ts) are legitimately EMPTY on this six-event table —
      // completion over NULL ts/user/value is their contract here
      if (!Set("q28_rangejoin", "q42_paths", "q52_interval_shuffle",
          "q58_interval_skew")(q))
        assert(rows.nonEmpty, s"$q returned no rows")
    }
  }

  test("q41 grid buckets FLOOR on pre-epoch timestamps (oracle `//` parity)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // sec = -1 (1969-12-31T23:59:59): floor(-1/21600) = -1; Spark's
    // truncating `div` would say 0 and silently diverge from DuckDB
    val e = Seq((9L, 1L, -1L, 10.0), (9L, 2L, 30000L, 20.0))
      .toDF("user_id", "event_id", "sec", "value")
    val out = queries.Analytics.locfResample(e)
      .orderBy("bucket_s").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(-21600L, 0L, 21600L),
      s"grid must start at bucket floor(-1/21600) = -1: ${out.mkString(",")}")
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 10.0, 20.0),
      "LOCF must carry the pre-epoch observation forward")
  }

  test("q41 refuses BY NAME a span that would explode one user's grid; a decade passes") {
    import spark.implicits._
    def flat(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + flat(t.getCause)
    // one degenerate pair 201 buckets apart against a 100-bucket cap
    val e = Seq((1L, 1L, 0L, 1.0), (1L, 2L, 21600L * 200L, 2.0))
      .toDF("user_id", "event_id", "sec", "value")
    val err = intercept[Exception] {
      queries.Analytics.locfResample(e, maxBucketsPerUser = 100L).collect()
    }
    assert(flat(err).contains("RESAMPLE GRID REFUSED"), flat(err).take(800))
    // a planted DECADE-span user (~14.6k buckets) sails under the
    // default cap — the guard is for degenerate pairs, not real spans
    val decade = Seq((2L, 1L, 0L, 1.0), (2L, 2L, 21600L * 14610L, 2.0))
      .toDF("user_id", "event_id", "sec", "value")
    assert(queries.Analytics.locfResample(decade).count() == 14611L)
  }

  test("q20 routes malformed/missing JSON keys to the NULL bucket") {
    val rows = SparkEntry.queries("q20_json")(spark, dir).collect()
    val r = rows
      .map(x => (if (x.isNullAt(0)) None else Some(x.getLong(0))) -> x.getLong(1))
      .toMap
    assert(r(Some(7L)) == 1L, s"numeric key bucket: $r")
    assert(r(None) == 5L, "malformed, missing-key, AND beyond-Int64 digit " +
      "runs all group under NULL")
    // the NULL bucket's position is part of the contract: the oracle
    // pins NULLS FIRST, so the Spark side must sort it first too
    assert(rows.head.isNullAt(0), "NULL bucket must sort FIRST on both engines")
  }
}
