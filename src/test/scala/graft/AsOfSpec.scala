package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The as-of join operator (q45's machinery): hand-computed temporal
  * lookups, tie determinism, NULL-timestamp semantics, cardinality
  * preservation, and the no-join plan shape. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trades = Seq(
    // (key, ts, trade_id)
    (1L, 100L, 10L), // before any quote → NULL
    (1L, 200L, 11L), // exactly AT quote ts 200 → that quote (<= rule)
    (1L, 250L, 12L), // between 200 and 300 → quote@200
    (1L, 999L, 13L), // far after the last quote → quote@300
    (2L, 500L, 20L), // key 2 has no quotes at all → NULL
    (3L, 0L, 30L))   // placeholder ts, made genuinely NULL below
    .toDF("k", "ts", "trade_id")
    .withColumn("ts", when(col("trade_id") === 30L, lit(null).cast("long"))
      .otherwise(col("ts")))

  private def quotes = Seq(
    (1L, 200L, 100L, "a"),
    (1L, 200L, 101L, "b"), // same (key, ts): tiebreak max qid wins → "b"
    (1L, 300L, 102L, "c"),
    (3L, 50L, 103L, "d"))
    .toDF("k", "qts", "qid", "px")
    .select(col("k"), col("qts").as("ts"), col("qid"), col("px"))
    // a NULL right ts can never be "at or before" anything — dropped
    .unionByName(Seq((1L, 999L, "z")).toDF("k", "qid", "px")
      .select(col("k"), lit(null).cast("long").as("ts"),
        col("qid").cast("long").as("qid"), col("px")))

  test("hand-computed as-of matches: <= rule, latest wins, tie by max tiebreak") {
    val got = AsOf.asofJoin(trades, quotes, "k", "ts",
        Seq("qid", "px"), "qid")
      .collect().map(r => r.getLong(2) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4)))))
      .toMap
    assert(got(10L) == ((None, None)), "no prior quote → NULL payload")
    assert(got(11L) == ((Some(101L), Some("b"))),
      "AT the quote ts: <= matches, and the (k,ts) tie collapses to max qid")
    assert(got(12L) == ((Some(101L), Some("b"))), "between quotes → latest prior")
    assert(got(13L) == ((Some(102L), Some("c"))), "after the last → the last")
    assert(got(20L) == ((None, None)), "keyless left rows keep NULLs")
    assert(got(30L) == ((None, None)),
      "a NULL left ts can match nothing (sorts before every quote)")
  }

  test("cardinality-preserving: every left row out exactly once") {
    val out = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("qid"), "qid")
    assert(out.count() == trades.count())
    assert(out.select("trade_id").distinct().count() == trades.count())
  }

  test("plan is union + per-key window — no join operator at all") {
    val p = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("qid"), "qid")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"),
      "unbounded lookback must come from the union-interleave window, " +
        "not a range/theta join:\n" + p.take(1200))
    assert(p.contains("Window") && p.contains("Union"), p.take(800))
  }

  test("collision and empty-payload refusals") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades, quotes, "k", "ts", Nil, "qid")
    }
    intercept[IllegalArgumentException] {
      // "trade_id" collides with a left column
      AsOf.asofJoin(trades,
        quotes.withColumnRenamed("qid", "trade_id"),
        "k", "ts", Seq("trade_id"), "trade_id")
    }
  }
}
