package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AS-OF JOIN — the temporal lookup every event/market/CDC pipeline
  * needs: each left row matched to the single most recent right row
  * at or before its timestamp (per key), left-outer (a left row with
  * no prior right keeps NULL payload). The classic examples: price a
  * trade at the latest quote ≤ trade time; attribute a purchase to
  * the user's latest preceding page view; resolve a fact row against
  * the dimension version in force at event time.
  *
  * NOT a join at all in the physical plan — the scale argument: an
  * as-of predicate (`l.ts >= r.ts`, keep max) has UNBOUNDED lookback,
  * so q28's banded-equi-join trick (which relies on a bounded |Δt|)
  * cannot express it, and a theta-join + per-left max is quadratic
  * per key. The shipped plan is the UNION-INTERLEAVE form (q41's
  * LOCF machinery generalized to two tables): right rows carry their
  * payload, left rows carry NULL payload, the union sorts per key on
  * (ts, side) — right-before-left at equal ts, so "at or before" is
  * the window frame itself — and one running `last(payload,
  * ignoreNulls)` per key fills each left row with the latest
  * preceding right payload. Cost: ONE shuffle of |L|+|R| narrow rows
  * on the key; window partitions are bounded by per-key activity,
  * never the corpus (AQE covers skewed keys).
  *
  * Determinism under ties: several right rows at the same (key, ts)
  * would make the match engine-dependent, so the right side is first
  * collapsed to one row per (key, ts) by `max_by` on `rightTiebreak`
  * — the same rule the DuckDB oracle states with `arg_max`, so the
  * two engines pick the identical row. Right rows with NULL ts can
  * never be "at or before" anything (NULL comparison) and are
  * dropped; a left row with NULL ts sorts before every right row and
  * keeps NULL payload — both exactly the oracle's ASOF semantics.
  *
  * `rightCols` must not collide with left column names (alias on the
  * right input; include an aliased copy of the right timestamp if
  * the caller needs the matched row's time, e.g. for a gap column).
  * Returns every left row (cardinality-preserving) with `rightCols`
  * appended. */
object AsOf {
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], rightTiebreak: String): DataFrame = {
    require(rightCols.nonEmpty, "as-of join needs at least one payload column")
    require(!rightCols.contains(key) && !rightCols.contains(ts),
      s"rightCols must not collide with the join key/timestamp ($key, $ts)")
    val leftCols = left.columns.toSeq
    require(rightCols.forall(c => !leftCols.contains(c)),
      "rightCols must not collide with left column names — alias the right input")
    // one right row per (key, ts): max_by on the tiebreak, same rule
    // as the oracle's arg_max, so both engines match the same row
    val r1 = right.filter(col(ts).isNotNull)
      .groupBy(col(key), col(ts))
      .agg(max_by(struct(rightCols.map(col): _*), col(rightTiebreak))
        .as("__p"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r1, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts).asc, col("__side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
