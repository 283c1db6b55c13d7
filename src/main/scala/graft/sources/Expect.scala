package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WRITE-SIDE EXPECTATIONS with QUARANTINE — the data-quality
  * contract every managed ingest tier ships (Delta Live Tables'
  * `expect_or_drop`, Great Expectations' checkpoint): named row-level
  * predicates are checked AT THE WRITE, valid rows commit, violating
  * rows land in a `_quarantine/` side table carrying WHICH rules they
  * broke — never silently dropped (a dropped row is undebuggable; a
  * quarantined row is a work queue). The reference validates orders
  * before accepting them (lambda_fns/order.js:596-650 rejects
  * malformed bodies with a 400) — this is that gate when the writer
  * is a 100 TB batch/stream, not an HTTP handler.
  *
  * Scale shape: ONE pass over the batch — every rule compiles to a
  * codegen'd boolean column, the verdict is an array-filter over
  * their names, and the two sides split from one checkpointed
  * flagged frame. No shuffle, no per-rule scan; rules cost what one
  * `filter` costs. Both sides land through [[LakeSink.appendBatchOnce]]
  * under the SAME caller-supplied batch id, so the whole gated write
  * is exactly-once under replays (a crash between the two landings
  * replays into "one side no-ops, the other completes").
  *
  * TERNARY RULE: a row whose predicate evaluates to NULL is a
  * VIOLATION (not provably valid ⇒ quarantine) — the conservative
  * direction for a gate; pinned in spec.
  */
object Expect {

  /** one named expectation. `sqlPredicate` is PREDICATE TEXT — the
    * same string runs as Spark SQL here and as the audit query a
    * human pastes into any engine later (names are the quarantine's
    * vocabulary, so they must be non-empty, comma-free, distinct). */
  final case class Rule(name: String, sqlPredicate: String)

  private def requireWellFormed(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "EXPECT REFUSED: empty rule set gates nothing")
    require(rules.forall(r => r.name.nonEmpty && !r.name.contains(",")),
      "EXPECT REFUSED: rule names must be non-empty and comma-free " +
        "(the quarantine's _violated column is comma-joined)")
    require(rules.map(_.name).distinct.size == rules.size,
      "EXPECT REFUSED: duplicate rule names")
  }

  /** the violated-rule-names column: for each rule IN DECLARATION
    * ORDER, its name iff the row fails it (NULL folds to fail). */
  private def violatedCol(rules: Seq[Rule]): Column =
    array_join(
      filter(
        array(rules.map(r =>
          when(!coalesce(expr(r.sqlPredicate), lit(false)), lit(r.name))): _*),
        x => x.isNotNull),
      ",")

  /** split a batch by the rule set: (valid, quarantined) — the
    * quarantined side carries `_violated` = comma-joined names of ALL
    * rules the row broke, in declaration order. Pure transform (no
    * I/O); [[writeExpect]] is the landing form. */
  def split(batch: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    requireWellFormed(rules)
    val flagged = batch.withColumn("_violated", violatedCol(rules))
    (flagged.filter(col("_violated") === "").drop("_violated"),
      flagged.filter(col("_violated") =!= ""))
  }

  /** land a batch under expectations, EXACTLY-ONCE: valid rows append
    * as `batch-<id>` through [[LakeSink.appendBatchOnce]]; violators
    * land under `_quarantine/` through the same machinery and id
    * (`_`-prefixed — invisible to every plain data read). Returns
    * (nValid, nQuarantined) for THIS batch — (0, 0) means the id was
    * already committed on both sides (a replay). The flagged frame is
    * checkpointed once so the batch is scanned once, not per side. */
  def writeExpect(spark: SparkSession, dir: String, batchId: Long,
      batch: DataFrame, rules: Seq[Rule]): (Long, Long) = {
    requireWellFormed(rules)
    val flagged = batch.withColumn("_violated", violatedCol(rules))
      .localCheckpoint(true)
    val valid = flagged.filter(col("_violated") === "").drop("_violated")
    val quar = flagged.filter(col("_violated") =!= "")
    val nQ = quar.count()
    val landedV = LakeSink.appendBatchOnce(spark, dir, batchId, valid)
    // the quarantine landing rides the SAME id: a crash between the
    // two appends replays into one no-op + one completion. An
    // all-valid batch still lands an EMPTY quarantine batch — the
    // id must be committed on both sides or a replay after a crash
    // here could never converge.
    val landedQ = LakeSink.appendBatchOnce(spark, s"$dir/_quarantine",
      batchId, quar)
    if (!landedV && !landedQ) (0L, 0L)
    else (valid.count(), nQ)
  }

  /** every quarantined row ever landed, with its `_violated` names —
    * the audit/repair queue. Empty-schema-safe: a table whose batches
    * were all clean still has (empty) quarantine batches to read. */
  def readQuarantine(spark: SparkSession, dir: String): DataFrame =
    LakeSink.readBatches(spark, s"$dir/_quarantine")

  /** EXPECTATIONS-GATED UPSERT — the CDC quality gate: an update
    * stream carries garbage like any other ingest, but a bad UPDATE
    * is worse than a bad insert (it silently corrupts a row that was
    * fine), so the rule set gates the batch BEFORE it touches the
    * log: valid rows land through [[LakeSink.softUpsertDir]] (one
    * atomic log batch, latest-wins fold downstream), violators land
    * in `_quarantine/` with every broken rule named — the row keeps
    * serving its LAST GOOD version until a repaired batch arrives.
    * Exactly-once under `batchId` on BOTH sides (the upsert keyed by
    * delivery id, the quarantine by batch directory) — a crash
    * between the two landings replays into one no-op + one
    * completion. Returns (updated, inserted, quarantined); a full
    * replay returns (0, 0, 0). */
  def upsertExpect(spark: SparkSession, dir: String, batchId: Long,
      batch: DataFrame, key: String, rules: Seq[Rule]): (Long, Long, Long) = {
    requireWellFormed(rules)
    val flagged = batch.withColumn("_violated", violatedCol(rules))
      .localCheckpoint(true)
    val valid = flagged.filter(col("_violated") === "").drop("_violated")
    val quar = flagged.filter(col("_violated") =!= "")
    val nQ = quar.count()
    val (upd, ins) = LakeSink.softUpsertDir(spark, dir, valid, key,
      onceId = Some(batchId))
    val landedQ = LakeSink.appendBatchOnce(spark, s"$dir/_quarantine",
      batchId, quar)
    // a full replay reads (0, 0, 0) naturally: the upsert no-ops on
    // its delivery id, the quarantine on its batch directory — and a
    // crash-window replay completes exactly the missing side
    (upd, ins, if (landedQ) nQ else 0L)
  }

  /** per-rule violation counts over the whole quarantine — one
    * explode over the (quarantine-sized) side table, never the data. */
  def violationCounts(spark: SparkSession, dir: String): DataFrame =
    readQuarantine(spark, dir)
      .select(explode(org.apache.spark.sql.functions
        .split(col("_violated"), ",")).as("rule"))
      .groupBy("rule").agg(count(lit(1)).as("n_rows"))

  // ---- BATCH-LEVEL (aggregate) expectations --------------------------

  /** a gate over the WHOLE batch — what row-level rules cannot
    * express ("this batch is 40% smaller than usual", "5% of keys are
    * duplicated"): the DLT `expect_or_fail` tier a 100 TB ingest
    * actually alarms on. A violated gate REFUSES THE ENTIRE BATCH by
    * name before any row lands — a batch that fails an aggregate
    * invariant is a pipeline incident, not a per-row repair queue. */
  trait BatchGate {
    def name: String
    /** Some(reason) iff the batch violates the gate */
    def violation(spark: SparkSession, dir: String,
        batch: DataFrame): Option[String]
  }

  /** ROW-COUNT DRIFT vs the trailing window of landed batches: with
    * ≥ `minHistory` committed batches, a new batch whose size strays
    * more than `maxFrac` from their mean refuses — the upstream-broke
    * alarm (a half-empty extract, a doubled replay) that row rules
    * can never see. Under `minHistory` the gate passes open (no basis
    * to judge drift from).
    *
    * History cost is O(1) per already-seen batch: each batch's row
    * count persists as one tiny `_counts/<batch>` file the FIRST time
    * this gate counts it (footer-only even then), and later
    * evaluations read the number back — the old path re-opened every
    * prior batch's footers per landing, O(n_batches) file opens
    * growing unboundedly with table age. The cache is write-once
    * deterministic (batches are immutable once committed), so
    * concurrent gate evaluations at worst write the same value; an
    * unreadable cache file falls back to a recount. */
  final case class RowCountDrift(maxFrac: Double, minHistory: Int = 3)
      extends BatchGate {
    val name = "row_count_drift"

    private def batchCount(spark: SparkSession,
        fs: org.apache.hadoop.fs.FileSystem,
        root: org.apache.hadoop.fs.Path,
        p: org.apache.hadoop.fs.Path): Long = {
      val cf = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "_counts"), p.getName)
      val cached = scala.util.Try {
        val in = fs.open(cf)
        try new String(org.apache.commons.io.IOUtils
          .toByteArray(in), "UTF-8").trim.toLong
        finally in.close()
      }.toOption
      cached.getOrElse {
        val n = spark.read.parquet(p.toString).count()
        scala.util.Try {
          fs.mkdirs(cf.getParent)
          val out = fs.create(cf, true)
          out.write(n.toString.getBytes("UTF-8")); out.close()
        }
        n
      }
    }

    def violation(spark: SparkSession, dir: String,
        batch: DataFrame): Option[String] = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(root)) return None
      val prior = fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith("batch-")).toSeq
      if (prior.size < minHistory) None
      else {
        val mean = prior.map(p =>
          batchCount(spark, fs, root, p)).sum.toDouble / prior.size
        val n = batch.count().toDouble
        val drift = if (mean == 0.0) { if (n == 0.0) 0.0 else 1.0 }
          else math.abs(n - mean) / mean
        if (drift > maxFrac)
          Some(f"batch has ${n.toLong} rows vs trailing mean " +
            f"${mean}%.1f over ${prior.size} batches — drift " +
            f"$drift%.2f exceeds $maxFrac%.2f")
        else None
      }
    }
  }

  /** KEY-UNIQUENESS RATE: distinct(key)/count must be ≥ `minRate` —
    * the duplicated-extract alarm (a CDC source replaying rows inside
    * one delivery, an unkeyed join upstream fanning out). 1.0 demands
    * a strictly unique key. One aggregate pass over the batch. */
  final case class KeyUniqueness(key: String, minRate: Double = 1.0)
      extends BatchGate {
    val name = "key_uniqueness"
    def violation(spark: SparkSession, dir: String,
        batch: DataFrame): Option[String] = {
      val r = batch.agg(count(lit(1)).as("n"),
        count_distinct(col(key)).as("d")).head()
      val (n, d) = (r.getLong(0), r.getLong(1))
      val rate = if (n == 0) 1.0 else d.toDouble / n
      if (rate < minRate)
        Some(f"$d distinct '$key' over $n rows — uniqueness $rate%.3f " +
          f"below $minRate%.3f")
      else None
    }
  }

  /** evaluate every gate; the violations, gate-named, in order */
  def checkGates(spark: SparkSession, dir: String, batch: DataFrame,
      gates: Seq[BatchGate]): Seq[(String, String)] =
    gates.flatMap(g => g.violation(spark, dir, batch).map(g.name -> _))

  /** [[writeExpect]] behind batch gates: aggregate invariants check
    * FIRST (a violated gate refuses the whole batch by name — nothing
    * lands, valid or not), then the row-level rule set splits and
    * lands as usual. The two tiers compose exactly like DLT's
    * `expect_or_fail` over `expect_or_drop`. */
  def writeExpectGated(spark: SparkSession, dir: String, batchId: Long,
      batch: DataFrame, rules: Seq[Rule],
      gates: Seq[BatchGate]): (Long, Long) = {
    requireGates(spark, dir, batch, gates)
    writeExpect(spark, dir, batchId, batch, rules)
  }

  /** [[upsertExpect]] behind batch gates — the CDC quality gate's
    * aggregate tier: a violated gate holds the WHOLE update batch by
    * name before any row touches the log (a half-sized CDC extract
    * or a duplicated replay corrupting latest-wins is a pipeline
    * incident). Note [[RowCountDrift]]'s history is `batch-*`
    * landings; an upsert-log table tracks drift against its own
    * `_updates` cadence, so row-count gates here are most useful
    * with an explicit trailing-mean baseline or [[KeyUniqueness]]. */
  def upsertExpectGated(spark: SparkSession, dir: String, batchId: Long,
      batch: DataFrame, key: String, rules: Seq[Rule],
      gates: Seq[BatchGate]): (Long, Long, Long) = {
    requireGates(spark, dir, batch, gates)
    upsertExpect(spark, dir, batchId, batch, key, rules)
  }

  private def requireGates(spark: SparkSession, dir: String,
      batch: DataFrame, gates: Seq[BatchGate]): Unit = {
    val bad = checkGates(spark, dir, batch, gates)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"BATCH GATE REFUSED: ${bad.map { case (n, why) => s"$n: $why" }
          .mkString("; ")} — the whole batch is held (nothing landed); " +
          "an aggregate violation is a pipeline incident, not a " +
          "row-repair queue")
  }
}
