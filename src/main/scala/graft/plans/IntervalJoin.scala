package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, GraftBridge}

import scala.collection.mutable

/** Point-in-interval broadcast join — the full custom-operator
  * extension tier (§2 E): a logical node, a planner
  * [[SparkStrategy]], and a physical [[BroadcastIntervalJoinExec]],
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * (GraftSession's builder).
  *
  * The shape it exists for: `probe.x BETWEEN i.lo AND i.hi` against
  * VARIABLE-LENGTH intervals. Spark has no interval-aware physical
  * join: keyless, it plans BroadcastNestedLoopJoin —
  * O(|probe| × |intervals|) comparisons; with an equi-key it hashes
  * on the key but still evaluates the range residual against EVERY
  * same-key pair — quadratic in each key group, which is the whole
  * cost when keys are few or skewed (IntervalJoinSpec pins both
  * default shapes). q28's banded rewrite fixes the FIXED-width case
  * (|Δt| ≤ w becomes an equi-join on w-sized buckets), but bands
  * cannot express intervals whose lengths vary per row without
  * exploding every probe to the MAXIMUM width — back to quadratic
  * in the skew limit. This operator instead broadcasts the
  * dim-sized interval side as a per-key static interval structure —
  * intervals sorted by `lo`, a max-`hi` segment tree above them —
  * and each probe row answers its stab query in O(log n + matches):
  * binary-search the prefix with `lo ≤ x` (sorted order), then
  * descend only subtrees whose max `hi` reaches x. The classic
  * centered-interval-tree bound without the pointer chasing.
  *
  * Scale posture: the stream side never moves (probe partitioning
  * and ordering preserved — zero shuffle), the build side is
  * collected and broadcast exactly like Spark's own broadcast hash
  * join, with the same contract: intervals must be dim-sized. A
  * conf-gated guard (`spark.graft.intervalJoin.maxBuildRows`,
  * default 10M) refuses fact-sized builds loudly — at 100 TB the
  * fact×fact interval case belongs to q28's banded form; this
  * operator is the variable-length DIM lookup (calendars, price
  * epochs, maintenance windows, error episodes).
  *
  * Semantics: INNER (default) or LEFT OUTER; NULL point, NULL
  * bounds, and NULL keys never match (SQL BETWEEN/equi-join
  * semantics — under LEFT OUTER such probe rows are kept with NULL
  * interval columns, exactly a theta left join's behavior); empty
  * `keys` means a single global interval set. Both sides' columns
  * pass through; the API re-aliases the interval side so self-joins
  * (both sides derived from one table) cannot collide on expression
  * ids.
  */
object IntervalJoin {

  val MaxBuildRowsKey = "spark.graft.intervalJoin.maxBuildRows"

  /** `probe ⋈ intervals ON probe.key* = intervals.key* AND
    * probe(pointCol) BETWEEN intervals(loCol) AND intervals(hiCol)`.
    * All three measure columns must be LONG (epoch seconds, scaled
    * longs — the engine's uniform time/measure representation).
    * Column names must be disjoint across the two sides.
    * `joinType`: "inner" or "left_outer" (an unmatched probe keeps
    * NULL interval columns — the attribution-with-misses shape).
    * `build`: "broadcast" (default — dim-sized interval sides,
    * zero probe-side shuffle) or "shuffle" (fact-sized interval
    * sides — both sides co-partition on the keys, the per-key
    * segment trees build EXECUTOR-side per partition; requires
    * non-empty `keys`, since a keyless variable-length interval set
    * has no partitioning that keeps a stab local). `build = "auto"`
    * is the ADVISED path: dim-sized builds broadcast; fact-sized
    * ones co-partition — and, with exactly one equi-key and a
    * `saltBy` probe column supplied, skew detection runs FIRST
    * ([[graft.operators.RuntimeFilter.heavyKeys]], one
    * key-cardinality-sized count pass): a key holding > `hotFrac` of
    * the intervals would park its whole build and stab share on one
    * partition, so the plan auto-selects [[pointInIntervalSalted]]
    * (output identical — IntervalJoinSpec pins both dispatch
    * directions); a cold key profile pays NO replication and takes
    * the plain co-partitioned build. */
  def pointInInterval(probe: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      keys: Seq[(String, String)] = Nil,
      joinType: String = "inner",
      build: String = "broadcast",
      saltBy: Option[String] = None,
      hotFrac: Double = 0.1,
      saltP: Int = 8): DataFrame = {
    val jt: JoinType = joinType.toLowerCase.replace("_", "") match {
      case "inner" => Inner
      case "leftouter" | "left" => LeftOuter
      case other => throw new IllegalArgumentException(
        s"pointInInterval: joinType must be inner or left_outer, got '$other'")
    }
    import org.apache.spark.sql.functions.col
    val overlap = probe.columns.toSet & intervals.columns.toSet
    require(overlap.isEmpty,
      s"pointInInterval: column names must be disjoint, both sides have ${overlap.mkString(", ")}")
    // fresh exprIds on the build side: a self-join (both inputs
    // carved from the same scan) would otherwise alias attributes
    // across sides and resolve lo/hi against the probe
    val iv = intervals.select(intervals.columns.map(c => col(c).as(c)).toSeq: _*)
    val l = probe.queryExecution.analyzed
    val r = iv.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"pointInInterval: no column '$n' on the $side side (${p.output.map(_.name).mkString(", ")})"))
    val (point, lo, hi) =
      (attr(l, pointCol, "probe"), attr(r, loCol, "interval"), attr(r, hiCol, "interval"))
    Seq(point, lo, hi).foreach(a => require(a.dataType == LongType,
      s"pointInInterval: '${a.name}' must be LONG, is ${a.dataType.simpleString}"))
    val (lk, rk) = (keys.map(k => attr(l, k._1, "probe")),
      keys.map(k => attr(r, k._2, "interval")))
    lk.zip(rk).foreach { case (a, b) => require(a.dataType == b.dataType,
      s"pointInInterval: key type mismatch ${a.name}:${a.dataType.simpleString} vs ${b.name}:${b.dataType.simpleString}") }
    val bc = build.toLowerCase match {
      case "broadcast" => true
      case "shuffle" =>
        require(keys.nonEmpty,
          "pointInInterval: build=shuffle needs at least one equi-key — " +
            "a keyless variable-length interval set cannot co-partition; " +
            "use build=broadcast (dim-sized) or q28's banded form")
        false
      case "auto" =>
        // the advisor move (q53's rule applied here): ONE count
        // action on the interval side against the broadcast cap —
        // dim-sized builds take the zero-probe-shuffle plan,
        // fact-sized ones take the partitioned build the cap would
        // otherwise refuse. Keyless stays broadcast (shuffle has no
        // partitioning to offer it).
        val cap = probe.sparkSession.conf
          .get(MaxBuildRowsKey, "10000000").toLong
        if (keys.isEmpty || intervals.count() <= cap) true
        else {
          // fact-sized: before committing to the plain partitioned
          // build, detect skew (one key-cardinality-sized count pass)
          // — a hot key's intervals AND probes all land on one
          // partition under ClusteredDistribution, the straggler the
          // salted form exists for. Detection needs a salt source;
          // without one the plain shuffle is the only sound plan.
          if (keys.size == 1 && saltBy.isDefined) {
            val hot = graft.operators.RuntimeFilter.heavyKeys(
              iv.select(org.apache.spark.sql.functions.col(keys.head._2)),
              keys.head._2, hotFrac)
            if (!hot.isEmpty)
              return pointInIntervalSalted(probe, intervals, pointCol,
                loCol, hiCol, keys.head, saltBy.get, hot, saltP, joinType)
          }
          false
        }
      case other => throw new IllegalArgumentException(
        s"pointInInterval: build must be broadcast, shuffle, or auto, got '$other'")
    }
    GraftBridge.ofRows(probe.sparkSession,
      PointIntervalJoin(l, r, point, lo, hi, lk, rk, jt, bc))
  }

  /** SKEW-SALTED partitioned interval join — the q51 mitigation
    * lifted to stabs: under `build = "shuffle"` a hot equi-key's
    * ENTIRE interval share and probe share land on one partition
    * (ClusteredDistribution hashes the key — exactly SortMergeJoin's
    * skew behavior), so a key holding 20% of a 100 TB fact parks 20%
    * of the build memory and stab work on one task while the rest of
    * the cluster idles. Here the HOT keys (a broadcast-small set —
    * detect with [[graft.operators.RuntimeFilter.heavyKeys]]) split
    * across `p` salts: each hot PROBE row takes a deterministic salt
    * from `saltBy` (any row-unique probe column), each hot INTERVAL
    * row replicates to ALL `p` salts — so every salt partition holds
    * its key's FULL interval set and a 1/p probe share, and a stab
    * answers identically wherever it lands. Cold keys salt to 0 on
    * both sides: no replication, no extra rows. Cost is p× the HOT
    * intervals only; every probe meets every matching interval
    * exactly once (cold: (0,0); hot: salt s meets replica s), so the
    * output IS the unsalted join — inner AND left outer (a missed
    * hot probe misses against the full interval set of its salt,
    * exactly as unsalted). IntervalJoinSpec pins output ≡ unsalted ≡
    * theta and the per-(key, salt) build-share bound; q58
    * hash-checks it end to end. */
  def pointInIntervalSalted(probe: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      key: (String, String), saltBy: String, hotKeys: DataFrame,
      p: Int = 8, joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(p >= 1, s"salt fan-out must be >= 1, got $p")
    val hot = broadcast(hotKeys.select(col(hotKeys.columns.head)
      .as("__hk")).distinct())
    val ps = probe
      .join(hot, col(key._1) === col("__hk"), "left_outer")
      .withColumn("__salt",
        when(col("__hk").isNotNull, pmod(hash(col(saltBy)), lit(p)))
          .otherwise(lit(0)).cast("int"))
      .drop("__hk")
    val is = intervals
      .join(hot, col(key._2) === col("__hk"), "left_outer")
      .withColumn("__dsalt",
        explode(when(col("__hk").isNotNull, sequence(lit(0), lit(p - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hk")
    pointInInterval(ps, is, pointCol, loCol, hiCol,
        Seq(key, "__salt" -> "__dsalt"), joinType, build = "shuffle")
      .drop("__salt", "__dsalt")
  }
}

/** Logical form — carries resolved attributes, so it passes straight
  * through the analyzer; the optimizer leaves unknown nodes intact
  * and [[IntervalJoinStrategy]] plans it. */
case class PointIntervalJoin(left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    joinType: JoinType, broadcastBuild: Boolean = true)
    extends BinaryNode {
  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointIntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** The planner hook: exactly one rule — the custom logical node
  * becomes the custom physical node, children planned by Spark. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointIntervalJoin(l, r, point, lo, hi, lk, rk, jt, bc) =>
      (if (bc) BroadcastIntervalJoinExec(planLater(l), planLater(r),
        point, lo, hi, lk, rk, jt)
      else ShuffledIntervalJoinExec(planLater(l), planLater(r),
        point, lo, hi, lk, rk, jt)) :: Nil
    case _ => Nil
  }
}

/** Per-key build-side structure: intervals sorted by `lo` with a
  * max-`hi` segment tree. `stab(x)` yields the row indices of every
  * interval with `lo ≤ x ≤ hi` in O(log n + k): indices `< ub(x)`
  * have `lo ≤ x` by sort order, and subtrees whose max `hi` is
  * below x are skipped whole. */
private[plans] final class IntervalBucket(
    val los: Array[Long], val his: Array[Long],
    val rows: Array[InternalRow]) extends Serializable {
  private val n = los.length
  // power-of-two-based segment tree over his (1-indexed, leaves at [size, size+n))
  private val size = {
    var s = 1; while (s < n) s <<= 1; s
  }
  private val tree: Array[Long] = {
    val t = Array.fill(2 * size)(Long.MinValue)
    var i = 0
    while (i < n) { t(size + i) = his(i); i += 1 }
    i = size - 1
    while (i >= 1) { t(i) = math.max(t(2 * i), t(2 * i + 1)); i -= 1 }
    t
  }

  /** first index with lo > x (== count of intervals with lo ≤ x) */
  private def ub(x: Long): Int = {
    var l = 0; var r = n
    while (l < r) {
      val m = (l + r) >>> 1
      if (los(m) <= x) l = m + 1 else r = m
    }
    l
  }

  def stab(x: Long, out: mutable.ArrayBuffer[InternalRow]): Unit = {
    val u = ub(x)
    if (u == 0) return
    // descend: node covers [nl, nl+span); emit leaves < u with hi >= x
    def go(node: Int, nl: Int, span: Int): Unit = {
      if (nl >= u || tree(node) < x) return
      if (span == 1) { out += rows(nl); return }
      val h = span >> 1
      go(2 * node, nl, h)
      go(2 * node + 1, nl + h, h)
    }
    go(1, 0, size)
  }
}

/** Physical broadcast interval join. The build (right) side is
  * collected like Spark's broadcast exchanges, grouped by key, and
  * shipped as [[IntervalBucket]]s; the stream (left) side is mapped
  * in place — `outputPartitioning`/`outputOrdering` are the child's,
  * exactly the broadcast-hash-join contract. */
case class BroadcastIntervalJoinExec(left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    joinType: JoinType)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val maxBuild = conf.getConfString(IntervalJoin.MaxBuildRowsKey, "10000000").toLong
    val buildRows = right.executeCollect()
    require(buildRows.length <= maxBuild,
      s"interval join build side has ${buildRows.length} rows > $maxBuild " +
        s"(${IntervalJoin.MaxBuildRowsKey}); a fact-sized interval side " +
        "belongs in the banded equi-join form (q28), not a broadcast")
    metrics("buildRows") += buildRows.length

    // driver-side: group by key, sort by lo, build the trees
    val rOut = right.output
    val loB = BindReferences.bindReference(lo, rOut)
    val hiB = BindReferences.bindReference(hi, rOut)
    val rkB = rightKeys.map(BindReferences.bindReference(_, rOut))
    val rkProj = UnsafeProjection.create(rkB)
    val grouped = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[(Long, Long, InternalRow)]]
    buildRows.foreach { row =>
      val loV = loB.eval(row); val hiV = hiB.eval(row)
      if (loV != null && hiV != null && !rkB.exists(_.eval(row) == null)) {
        val key = rkProj(row).copy()
        grouped.getOrElseUpdate(key, mutable.ArrayBuffer.empty) +=
          ((loV.asInstanceOf[Long], hiV.asInstanceOf[Long], row))
      }
    }
    val buckets: Map[UnsafeRow, IntervalBucket] = grouped.iterator.map {
      case (k, ivs) =>
        val sorted = ivs.sortBy(_._1)
        k -> new IntervalBucket(sorted.map(_._1).toArray,
          sorted.map(_._2).toArray, sorted.map(_._3).toArray)
    }.toMap
    val bc = sparkContext.broadcast(buckets)

    val lOut = left.output
    val pointExpr = point; val lkExprs = leftKeys
    val outAttrs = output
    val outer = joinType == LeftOuter
    val rightLen = right.output.length
    val numOut = longMetric("numOutputRows")
    left.execute().mapPartitions({ iter =>
      val bkts = bc.value
      val pB = BindReferences.bindReference(pointExpr, lOut)
      val lkB = lkExprs.map(BindReferences.bindReference(_, lOut))
      val lkProj = UnsafeProjection.create(lkB)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightLen)
      val hits = mutable.ArrayBuffer.empty[InternalRow]
      iter.flatMap { lrow =>
        def miss: Iterator[InternalRow] =
          if (!outer) Iterator.empty
          else { numOut += 1
            Iterator.single(outProj(joined(lrow, nullRight)).copy()) }
        val x = pB.eval(lrow)
        if (x == null || lkB.exists(_.eval(lrow) == null)) miss
        else bkts.get(lkProj(lrow)) match {
          case None => miss
          case Some(b) =>
            hits.clear()
            b.stab(x.asInstanceOf[Long], hits)
            if (hits.isEmpty) miss
            // materialize: outProj reuses its buffer; lrow is stable
            // for the duration of this flatMap step
            else hits.iterator.map { rrow =>
              numOut += 1
              outProj(joined(lrow, rrow)).copy()
            }
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Physical SHUFFLED interval join — [[BroadcastIntervalJoinExec]]'s
  * SortMergeJoin analogue, for FACT-sized variable-length interval
  * sides the broadcast contract's build cap orphans: instead of
  * collecting the intervals to the driver, both sides co-partition
  * on the equi-keys (declared through `requiredChildDistribution`,
  * so EnsureRequirements plans exactly one Exchange per unaligned
  * side — never a BroadcastNestedLoopJoin), and each partition
  * builds ITS keys' sorted-lo/max-hi segment trees executor-side,
  * then stabs its probe rows locally in O(log n + matches). Build
  * memory is one partition's interval share — the ShuffledHashJoin
  * contract — so the interval side scales with the CLUSTER, not the
  * driver heap. The partition count is pinned to
  * `spark.sql.shuffle.partitions` on BOTH children (a fixed
  * `requiredNumPartitions` keeps AQE from coalescing the two sides
  * asymmetrically), and a hot key's intervals land on one partition
  * exactly as they would under SortMergeJoin. */
case class ShuffledIntervalJoinExec(left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    joinType: JoinType)
    extends BinaryExecNode {

  require(leftKeys.nonEmpty, "shuffled interval join needs equi-keys")

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override def requiredChildDistribution
      : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] = {
    val n = Some(conf.numShufflePartitions)
    org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(
      leftKeys, requiredNumPartitions = n) ::
      org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(
        rightKeys, requiredNumPartitions = n) :: Nil
  }
  override def outputPartitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ShuffledIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (pointExpr, loExpr, hiExpr) = (point, lo, hi)
    val (lkExprs, rkExprs) = (leftKeys, rightKeys)
    val outAttrs = output
    val outer = joinType == LeftOuter
    val rightLen = right.output.length
    val numOut = longMetric("numOutputRows")
    val numBuild = longMetric("buildRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // BUILD: this partition's interval share, grouped per key —
      // executor-side, the partition is the unit of memory
      val loB = BindReferences.bindReference(loExpr, rOut)
      val hiB = BindReferences.bindReference(hiExpr, rOut)
      val rkB = rkExprs.map(BindReferences.bindReference(_, rOut))
      val rkProj = UnsafeProjection.create(rkB)
      val grouped = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[(Long, Long, InternalRow)]]
      rIter.foreach { row =>
        val loV = loB.eval(row); val hiV = hiB.eval(row)
        if (loV != null && hiV != null && !rkB.exists(_.eval(row) == null)) {
          numBuild += 1
          // iterator rows are reused buffers — copy what we keep
          grouped.getOrElseUpdate(rkProj(row).copy(), mutable.ArrayBuffer.empty) +=
            ((loV.asInstanceOf[Long], hiV.asInstanceOf[Long], row.copy()))
        }
      }
      val buckets = grouped.map { case (k, ivs) =>
        val sorted = ivs.sortBy(_._1)
        k -> new IntervalBucket(sorted.map(_._1).toArray,
          sorted.map(_._2).toArray, sorted.map(_._3).toArray)
      }
      // PROBE: co-partitioned, so every possible match is local
      val pB = BindReferences.bindReference(pointExpr, lOut)
      val lkB = lkExprs.map(BindReferences.bindReference(_, lOut))
      val lkProj = UnsafeProjection.create(lkB)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightLen)
      val hits = mutable.ArrayBuffer.empty[InternalRow]
      lIter.flatMap { lrow =>
        def miss: Iterator[InternalRow] =
          if (!outer) Iterator.empty
          else { numOut += 1
            Iterator.single(outProj(joined(lrow, nullRight)).copy()) }
        val x = pB.eval(lrow)
        if (x == null || lkB.exists(_.eval(lrow) == null)) miss
        else buckets.get(lkProj(lrow)) match {
          case None => miss
          case Some(b) =>
            hits.clear()
            b.stab(x.asInstanceOf[Long], hits)
            if (hits.isEmpty) miss
            else hits.iterator.map { rrow =>
              numOut += 1
              outProj(joined(lrow, rrow)).copy()
            }
        }
      }
    }
  }
}
