package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** one (score, id) candidate of a bounded top-k buffer */
case class ScoredId(score: Double, id: Long)

/** Bounded exact per-group TOP-K as a typed `Aggregator` — the
  * AGGREGATION answer to "top k rows per group", completing the
  * extension ladder's typed-aggregate tier (native `Expression`s,
  * an optimizer `Rule`, and a planner strategy + physical operator
  * already ship; this is the `Aggregator`/`udaf` rung).
  *
  * Why it matters at 100 TB: the standard window form
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`)
  * shuffles EVERY row to its group's partition and sorts the whole
  * group just to throw away all but k. This aggregator holds at most
  * k (score, id) pairs per group and is MERGE-ASSOCIATIVE, so Spark
  * plans it as a partial aggregate: each map task reduces its slice
  * to ≤ k candidates per local group BEFORE the exchange — the
  * shuffle carries bounded state, not rows, and no sort ever sees
  * the full group. PlanSpec pins the aggregate-not-Window plan.
  *
  * Determinism: total order (-score, id) — ties break toward the
  * smaller id, identical in the SQL oracle's
  * `ORDER BY score DESC, id` row_number, so the result is
  * hash-checkable despite floating scores.
  */
class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[Long]] {
  require(k > 0, s"top_k: k must be positive, got $k")

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Nil

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    // O(1) reject of the common case: buffer full and the new row
    // can't displace the current k-th
    if (b.lengthCompare(k) == 0 && !lt(a, b.last)) b
    else ((a +: b).sortWith(lt)).take(k)

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    (x ++ y).sortWith(lt).take(k)

  override def finish(r: Seq[ScoredId]): Seq[Long] = r.map(_.id)

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object TopKAgg {
  /** `top_k(k)(score, id)` — array of the group's k ids by
    * (score DESC, id ASC), usable in any `agg(...)`. */
  def top_k(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]())
      .apply(score, id)
}
