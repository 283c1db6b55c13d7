package graft

import graft.plans.IntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom-operator tier end to end (`plans.IntervalJoin`):
  * logical `PointIntervalJoin` → injected `IntervalJoinStrategy` →
  * `BroadcastIntervalJoinExec`. Ground truth for every comparison is
  * Spark's OWN theta-join over the identical inputs (which plans as
  * BroadcastNestedLoopJoin — the quadratic fallback the operator
  * exists to replace). */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev = {
    val e = Tables.load(spark, TestSpark.sf, "events")
    e.withColumn("sec", Tables.tsSec(e))
  }
  private def windows = ev.filter(col("event_type") === "error")
    .select(col("event_id").as("win_id"), col("user_id").as("w_user"),
      col("sec").as("lo"),
      (col("sec") + lit(60L) + floor(col("value") * 600.0).cast("long")).as("hi"))
  private def probes = ev.filter(col("event_type") === "purchase")
    .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
      col("sec").as("psec"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("keyed join ≡ Spark's own theta-join on real data; plan is the custom exec, no shuffle") {
    val ours = IntervalJoin.pointInInterval(probes, windows,
      "psec", "lo", "hi", Seq("p_user" -> "w_user"))
    val theta = probes.join(windows,
      col("p_user") === col("w_user") &&
        col("psec") >= col("lo") && col("psec") <= col("hi"))
    assert(sortedRows(ours) == sortedRows(theta))
    assert(ours.collect().nonEmpty, "fixture must actually exercise matches")
    val plan = ours.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastIntervalJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("Exchange"),
      "stream side must not shuffle:\n" + plan.take(800))
  }

  test("keyless (global interval set) ≡ theta-join, which Spark itself can only nested-loop") {
    val w = windows.limit(40).select(col("win_id"), col("lo"), col("hi"))
    val p = probes.select(col("purchase_id"), col("psec"))
    val ours = IntervalJoin.pointInInterval(p, w, "psec", "lo", "hi")
    val theta = p.join(w, col("psec") >= col("lo") && col("psec") <= col("hi"))
    assert(sortedRows(ours) == sortedRows(theta))
    // the keyless default really is the quadratic fallback the
    // operator replaces (keyed defaults hash on the key but still
    // evaluate the range residual against every same-key pair)
    assert(theta.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(!ours.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("nested / contained / duplicate / empty intervals and boundary inclusivity") {
    val w = Seq(
      (1L, "k", 10L, 100L),   // long outer
      (2L, "k", 20L, 30L),    // nested
      (3L, "k", 20L, 30L),    // duplicate of 2
      (4L, "k", 25L, 25L),    // point interval
      (5L, "k", 50L, 40L),    // inverted = empty
      (6L, "z", 0L, 1000L)    // other key
    ).toDF("win_id", "wk", "lo", "hi")
    val p = Seq((100L, "k", 25L), (101L, "k", 45L), (102L, "k", 10L),
      (103L, "k", 100L), (104L, "k", 101L), (105L, "q", 25L))
      .toDF("pid", "pk", "x")
    val got = IntervalJoin.pointInInterval(p, w, "x", "lo", "hi",
        Seq("pk" -> "wk"))
      .select("pid", "win_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (101L, 1L), (102L, 1L), (103L, 1L)))
  }

  test("SQL null semantics: null point / bounds / keys never match") {
    val w = Seq((java.lang.Long.valueOf(1L), "k", java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
      (java.lang.Long.valueOf(2L), "k", null, java.lang.Long.valueOf(100L)),
      (java.lang.Long.valueOf(3L), "k", java.lang.Long.valueOf(0L), null),
      (java.lang.Long.valueOf(4L), null, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)))
      .toDF("win_id", "wk", "lo", "hi")
    val p = Seq((java.lang.Long.valueOf(10L), "k", java.lang.Long.valueOf(5L)),
      (java.lang.Long.valueOf(11L), "k", null),
      (java.lang.Long.valueOf(12L), null, java.lang.Long.valueOf(5L)))
      .toDF("pid", "pk", "x")
    val got = IntervalJoin.pointInInterval(p, w, "x", "lo", "hi",
        Seq("pk" -> "wk"))
      .select("pid", "win_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 1L)), s"only the fully-non-null pair matches: $got")
  }

  test("left outer: unmatched and null-measure probes kept with NULL interval columns ≡ theta left join") {
    val ours = IntervalJoin.pointInInterval(probes, windows,
      "psec", "lo", "hi", Seq("p_user" -> "w_user"), joinType = "left_outer")
    val theta = probes.join(windows,
      col("p_user") === col("w_user") &&
        col("psec") >= col("lo") && col("psec") <= col("hi"), "left_outer")
    assert(sortedRows(ours) == sortedRows(theta))
    val inner = IntervalJoin.pointInInterval(probes, windows,
      "psec", "lo", "hi", Seq("p_user" -> "w_user"))
    assert(ours.filter(col("win_id").isNull).count() > 0,
      "fixture must contain unmatched probes")
    assert(ours.filter(col("win_id").isNotNull).count() == inner.count(),
      "matched rows must be exactly the inner join's")
    // a NULL measure can't match, but LEFT OUTER keeps the probe
    val p = Seq((java.lang.Long.valueOf(1L), "k",
      null.asInstanceOf[java.lang.Long])).toDF("pid", "pk", "x")
    val w = Seq((2L, "k", 0L, 10L)).toDF("win_id", "wk", "lo", "hi")
    val kept = IntervalJoin.pointInInterval(p, w, "x", "lo", "hi",
      Seq("pk" -> "wk"), joinType = "left_outer").collect()
    assert(kept.length == 1 && kept.head.isNullAt(3),
      s"null-measure probe must survive with NULL intervals: ${kept.toSeq}")
    val bad = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(p, w, "x", "lo", "hi", Nil, "full")
    }
    assert(bad.getMessage.contains("joinType"))
  }

  test("empty build side yields empty result (not a crash)") {
    val got = IntervalJoin.pointInInterval(probes,
      windows.filter(lit(false)), "psec", "lo", "hi",
      Seq("p_user" -> "w_user"))
    assert(got.count() == 0L)
  }

  test("refusals: fact-sized build, non-LONG measure, colliding names") {
    spark.conf.set(IntervalJoin.MaxBuildRowsKey, "3")
    try {
      val e = intercept[Exception] {
        IntervalJoin.pointInInterval(probes, windows, "psec", "lo", "hi",
          Seq("p_user" -> "w_user")).collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("banded"),
        s"guard must point at the banded form: $msgs")
    } finally spark.conf.unset(IntervalJoin.MaxBuildRowsKey)
    val badType = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(
        probes.withColumn("d", col("psec").cast("double")), windows,
        "d", "lo", "hi")
    }
    assert(badType.getMessage.contains("must be LONG"))
    val collide = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(windows, windows, "lo", "lo", "hi")
    }
    assert(collide.getMessage.contains("disjoint"))
  }

  // ---- the SHUFFLED sibling (fact-sized interval sides) ------------

  test("shuffled build ≡ broadcast build ≡ Spark's theta-join; one Exchange per side, no BNLJ, no broadcast") {
    val ours = IntervalJoin.pointInInterval(probes, windows,
      "psec", "lo", "hi", Seq("p_user" -> "w_user"), build = "shuffle")
    val bc = IntervalJoin.pointInInterval(probes, windows,
      "psec", "lo", "hi", Seq("p_user" -> "w_user"))
    val theta = probes.join(windows,
      col("p_user") === col("w_user") &&
        col("psec") >= col("lo") && col("psec") <= col("hi"))
    assert(sortedRows(ours) == sortedRows(theta))
    assert(sortedRows(ours) == sortedRows(bc))
    assert(ours.collect().nonEmpty)
    val plan = ours.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledIntervalJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("BroadcastExchange"),
      "the interval side must NOT broadcast:\n" + plan.take(800))
    // count in the FINAL plan only (AQE prints the initial plan too,
    // doubling every occurrence)
    val finalPlan = plan.split("== Initial Plan ==").head
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(nExchanges == 2,
      s"exactly one hash Exchange per side, got $nExchanges:\n" + finalPlan.take(1200))
  }

  test("shuffled left outer ≡ theta left join; null semantics match the broadcast form") {
    val ours = IntervalJoin.pointInInterval(probes, windows,
      "psec", "lo", "hi", Seq("p_user" -> "w_user"),
      joinType = "left_outer", build = "shuffle")
    val theta = probes.join(windows,
      col("p_user") === col("w_user") &&
        col("psec") >= col("lo") && col("psec") <= col("hi"), "left_outer")
    assert(sortedRows(ours) == sortedRows(theta))
    assert(ours.filter(col("win_id").isNull).count() > 0,
      "fixture must contain unmatched probes")
    // null point / bounds / keys never match, probe kept under outer
    val w = Seq((java.lang.Long.valueOf(1L), "k", java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
      (java.lang.Long.valueOf(2L), "k", null, java.lang.Long.valueOf(100L)),
      (java.lang.Long.valueOf(3L), null, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)))
      .toDF("win_id", "wk", "lo", "hi")
    val p = Seq((java.lang.Long.valueOf(10L), "k", java.lang.Long.valueOf(5L)),
      (java.lang.Long.valueOf(11L), "k", null),
      (java.lang.Long.valueOf(12L), null, java.lang.Long.valueOf(5L)))
      .toDF("pid", "pk", "x")
    val got = IntervalJoin.pointInInterval(p, w, "x", "lo", "hi",
        Seq("pk" -> "wk"), joinType = "left_outer", build = "shuffle")
      .select("pid", "win_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq
    assert(got == Seq((10L, 1L), (11L, -1L), (12L, -1L)), s"$got")
  }

  test("shuffled build handles an interval side ABOVE the broadcast cap (where broadcast refuses)") {
    spark.conf.set(IntervalJoin.MaxBuildRowsKey, "3")
    try {
      intercept[Exception] {
        IntervalJoin.pointInInterval(probes, windows, "psec", "lo", "hi",
          Seq("p_user" -> "w_user")).collect()
      }
      // the same fact-sized side the refusal orphaned, through the
      // partitioned build — no cap applies (per-partition memory)
      val got = IntervalJoin.pointInInterval(probes, windows,
        "psec", "lo", "hi", Seq("p_user" -> "w_user"), build = "shuffle")
      val theta = probes.join(windows,
        col("p_user") === col("w_user") &&
          col("psec") >= col("lo") && col("psec") <= col("hi"))
      assert(sortedRows(got) == sortedRows(theta))
    } finally spark.conf.unset(IntervalJoin.MaxBuildRowsKey)
  }

  test("build=auto: dim-sized side broadcasts, above-cap side shuffles, keyless stays broadcast") {
    val under = IntervalJoin.pointInInterval(probes, windows.limit(20),
      "psec", "lo", "hi", Seq("p_user" -> "w_user"), build = "auto")
    assert(under.queryExecution.executedPlan.toString
      .contains("BroadcastIntervalJoin"))
    spark.conf.set(IntervalJoin.MaxBuildRowsKey, "3")
    try {
      val over = IntervalJoin.pointInInterval(probes, windows,
        "psec", "lo", "hi", Seq("p_user" -> "w_user"), build = "auto")
      assert(over.queryExecution.executedPlan.toString
        .contains("ShuffledIntervalJoin"))
      val theta = probes.join(windows,
        col("p_user") === col("w_user") &&
          col("psec") >= col("lo") && col("psec") <= col("hi"))
      assert(sortedRows(over) == sortedRows(theta))
      // keyless has no shuffled form to fall back to — auto keeps
      // broadcast (and the cap's refusal) rather than mis-planning
      val keyless = IntervalJoin.pointInInterval(
        probes.select(col("purchase_id"), col("psec")),
        windows.limit(2).select(col("win_id"), col("lo"), col("hi")),
        "psec", "lo", "hi", Nil, build = "auto")
      assert(keyless.queryExecution.executedPlan.toString
        .contains("BroadcastIntervalJoin"))
    } finally spark.conf.unset(IntervalJoin.MaxBuildRowsKey)
  }

  test("build=auto with a salt source: a hot interval key auto-selects the salted plan (output ≡ unsalted ≡ theta); a cold profile pays no replication") {
    import spark.implicits._
    // hot key 0 holds 80% of the intervals and 2/3 of the probes —
    // the straggler profile; keys 1..100 are uniform
    val w = ((1 to 400).map(i => (0L, i.toLong * 10, i.toLong * 10 + 500, 10000L + i))
      ++ (1 to 100).map(i => (i.toLong, 0L, 5000L, 20000L + i)))
      .toDF("w_uid", "lo", "hi", "win_id")
    val p = ((1 to 200).map(i => (0L, i.toLong * 20, 30000L + i))
      ++ (1 to 100).map(i => (i.toLong, 2500L, 40000L + i)))
      .toDF("p_uid", "psec", "purchase_id")
    val theta = p.join(w, col("p_uid") === col("w_uid") &&
      col("psec") >= col("lo") && col("psec") <= col("hi"))
    spark.conf.set(IntervalJoin.MaxBuildRowsKey, "3") // everything is fact-sized
    try {
      val auto = IntervalJoin.pointInInterval(p, w, "psec", "lo", "hi",
        Seq("p_uid" -> "w_uid"), build = "auto",
        saltBy = Some("purchase_id"))
      val plan = auto.queryExecution.executedPlan.toString
      assert(plan.contains("__dsalt") && plan.contains("ShuffledIntervalJoin"),
        "the hot fixture must dispatch the SALTED partitioned form:\n" +
          plan.take(900))
      assert(sortedRows(auto) == sortedRows(theta),
        "auto-salted output must be the plain join")
      // COLD: uniform keys — detection finds nothing hot, the plain
      // co-partitioned build runs, NO interval replication is paid
      val wCold = w.filter(col("w_uid") =!= 0L)
      val pCold = p.filter(col("p_uid") =!= 0L)
      val cold = IntervalJoin.pointInInterval(pCold, wCold, "psec", "lo",
        "hi", Seq("p_uid" -> "w_uid"), build = "auto",
        saltBy = Some("purchase_id"))
      val coldPlan = cold.queryExecution.executedPlan.toString
      assert(coldPlan.contains("ShuffledIntervalJoin") &&
        !coldPlan.contains("__dsalt"),
        "a cold profile must stay unsalted:\n" + coldPlan.take(900))
      val thetaCold = pCold.join(wCold, col("p_uid") === col("w_uid") &&
        col("psec") >= col("lo") && col("psec") <= col("hi"))
      assert(sortedRows(cold) == sortedRows(thetaCold))
      // no salt source → the plain shuffle is the only sound plan,
      // hot or not (detection needs a row-unique probe column)
      val noSalt = IntervalJoin.pointInInterval(p, w, "psec", "lo", "hi",
        Seq("p_uid" -> "w_uid"), build = "auto")
      assert(!noSalt.queryExecution.executedPlan.toString.contains("__dsalt"))
      assert(sortedRows(noSalt) == sortedRows(theta))
    } finally spark.conf.unset(IntervalJoin.MaxBuildRowsKey)
  }

  test("shuffled keyless refused by name (no partitioning keeps a stab local)") {
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(
        probes.select(col("purchase_id"), col("psec")),
        windows.select(col("win_id"), col("lo"), col("hi")),
        "psec", "lo", "hi", Nil, build = "shuffle")
    }
    assert(e.getMessage.contains("equi-key"), e.getMessage)
    val bad = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(probes, windows, "psec", "lo", "hi",
        Seq("p_user" -> "w_user"), build = "sideways")
    }
    assert(bad.getMessage.contains("broadcast, shuffle, or auto"),
      bad.getMessage)
  }

  test("q52 runs the shuffled exec and matches the q46-shaped theta aggregate") {
    val df = Registry.byName("q52_interval_shuffle").run(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledIntervalJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(df.collect().nonEmpty)
    assert(df.columns.toSeq ==
      Seq("purchase_id", "n_win", "first_win", "max_into_s"))
  }

  test("skew-salted shuffled join: output ≡ unsalted ≡ theta (inner + left outer); hot key's build share bounded by ~1/p") {
    // plant a HOT key: sentinel user 0 absorbs every 'view' event on
    // both sides — one key holding a large share of intervals AND
    // probes, the straggler shape
    val e = ev.filter(col("user_id").isNotNull)
      .withColumn("uid", when(col("event_type") === "view", 0L)
        .otherwise(col("user_id")))
    val w = e.select(col("event_id").as("win_id"), col("uid").as("w_uid"),
      col("sec").as("lo"),
      (col("sec") + lit(60L) + floor(col("value") * 600.0).cast("long"))
        .as("hi"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("uid").as("p_uid"),
        col("sec").as("psec"))
    val hot = graft.operators.RuntimeFilter.heavyKeys(
      w.select(col("w_uid")), "w_uid", 0.05)
    assert(hot.collect().map(_.getLong(0)).contains(0L),
      "fixture must plant the sentinel hot key (tiny SF flags more)")
    val salted = IntervalJoin.pointInIntervalSalted(p, w, "psec", "lo",
      "hi", "p_uid" -> "w_uid", saltBy = "purchase_id", hotKeys = hot,
      p = 8)
    val unsalted = IntervalJoin.pointInInterval(p, w, "psec", "lo", "hi",
      Seq("p_uid" -> "w_uid"), build = "shuffle")
    val theta = p.join(w, col("p_uid") === col("w_uid") &&
      col("psec") >= col("lo") && col("psec") <= col("hi"))
    assert(sortedRows(salted) == sortedRows(unsalted))
    assert(sortedRows(salted) == sortedRows(theta))
    assert(salted.collect().nonEmpty)
    // LEFT OUTER parity: a missed hot probe misses against its
    // salt's FULL interval replica — kept exactly once, like unsalted
    val wNarrow = w.filter(col("win_id") % 3 === 0)
    val saltedLo = IntervalJoin.pointInIntervalSalted(p, wNarrow, "psec",
      "lo", "hi", "p_uid" -> "w_uid", saltBy = "purchase_id",
      hotKeys = hot, p = 8, joinType = "left_outer")
    val thetaLo = p.join(wNarrow, col("p_uid") === col("w_uid") &&
      col("psec") >= col("lo") && col("psec") <= col("hi"), "left_outer")
    assert(sortedRows(saltedLo) == sortedRows(thetaLo))
    // THE STRAGGLER BOUND, measured on the build shares: unsalted,
    // the hot key's whole interval share is one partition's build;
    // salted, no (key, salt) cell exceeds ~1/p of it (hash skew slack)
    val hotShare = w.filter(col("w_uid") === 0L).count()
    val saltedShares = w
      .join(broadcast(hot.select(col("w_uid").as("__hk"))),
        col("w_uid") === col("__hk"), "left_outer")
      .withColumn("__dsalt", explode(when(col("__hk").isNotNull,
          sequence(lit(0), lit(7))).otherwise(array(lit(0)))))
      .groupBy(col("w_uid"), col("__dsalt"))
      .agg(count(lit(1)).as("n"))
    // interval replicas are full copies per salt — the PROBE side is
    // what the salt divides; measure its max (key, salt) cell
    val probeShares = p
      .join(broadcast(hot.select(col("w_uid").as("__hk"))),
        col("p_uid") === col("__hk"), "left_outer")
      .withColumn("__salt", when(col("__hk").isNotNull,
          pmod(hash(col("purchase_id")), lit(8))).otherwise(lit(0)))
      .groupBy(col("p_uid"), col("__salt"))
      .agg(count(lit(1)).as("n"))
    val hotProbes = p.filter(col("p_uid") === 0L).count()
    val maxHotCell = probeShares.filter(col("p_uid") === 0L)
      .agg(max(col("n"))).head().getLong(0)
    assert(maxHotCell <= (hotProbes + 7) / 8 * 3,
      s"hot key's probe share must spread across the salts: " +
        s"$maxHotCell of $hotProbes on one (key, salt) cell")
    assert(saltedShares.filter(col("w_uid") === 0L).count() == 8L,
      "hot intervals must replicate to every salt")
  }

  test("self-join inputs (both sides carved from one scan) resolve cleanly") {
    // probes and windows both derive from the same events scan —
    // without the build-side re-alias their attributes would share
    // expression ids across sides; q46 is exactly this shape
    val df = Registry.byName("q46_interval_join").run(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq ==
      Seq("purchase_id", "n_win", "first_win", "min_into_s"))
  }
}
