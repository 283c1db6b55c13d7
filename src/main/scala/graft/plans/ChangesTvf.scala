package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** `graft_changes` — THE CHANGE FEED AS A SQL TABLE FUNCTION
  * (Delta's `table_changes(t, from, to)`; the polling consumer's
  * [[graft.sources.LakeSink.changeFeedBetween]] reachable from plain
  * `spark.sql`, completing the SQL story: a41/a45 write through SQL,
  * a46 travels through SQL, and this polls through SQL — the
  * reference's consumers only ever speak SQL):
  *
  *   - `graft_changes('/dir')` — the COMPLETE feed (every landed
  *     insert/update/delete row, shared-seq ordered);
  *   - `graft_changes('/dir', from)` — the half-open window
  *     `(from, head]` where head = the newest committed landing
  *     ([[graft.sources.LakeSink.lastLandedSeq]]) — "everything
  *     since my last poll";
  *   - `graft_changes('/dir', from, to)` — the exact half-open
  *     window `(from, to]`: consecutive polls partition the history,
  *     no gap, no overlap.
  *
  * Output: `(batch_seq, op, <table columns>)` — upsert AND delete
  * events, before-images on deletes, exactly the batch API's rows
  * (a48's oracle hash-proves the prefix against a43's full-history
  * oracle over the same fixture). Windowed forms are SEQ-PRUNED like
  * the API (batches selected by directory name — O(|window|) feed
  * files, never the log). Arguments must be LITERALS (a plan-time
  * source cannot depend on row values — same rule as every
  * skipping-manifest surface); the directory must carry a registered
  * key (`_updates/_key`) — refusals by name, matching the DML/travel
  * surfaces. Injected via `SparkSessionExtensions.injectTableFunction`
  * in [[graft.GraftSession.builder]]. */
object GraftChangesTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_changes")

  // usage text lives in the Scaladoc above; the usage-bearing
  // ExpressionInfo constructors are deprecated (3.0) or validate
  // group/source enums this function has no seat in
  val info: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftChangesTvf", null, "graft_changes")

  private def literal(e: Expression, what: String): Any = e match {
    case Literal(v, _) => v
    case _ => throw new IllegalArgumentException(
      s"graft_changes REFUSED: $what must be a literal — a plan-time " +
        "feed source cannot depend on row values")
  }

  private def asLong(e: Expression, what: String): Long =
    (literal(e, what), e.dataType) match {
      case (v: Integer, IntegerType) => v.longValue()
      case (v: java.lang.Long, LongType) => v.longValue()
      case (v, t) => throw new IllegalArgumentException(
        s"graft_changes REFUSED: $what must be an integer seq, got " +
          s"$v: ${t.simpleString}")
    }

  def build(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.nonEmpty && args.size <= 3,
      "graft_changes takes (dir[, fromSeq[, toSeq]]), got " +
        s"${args.size} arguments")
    val dir = (literal(args.head, "dir"), args.head.dataType) match {
      case (s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        s.toString
      case (v, t) => throw new IllegalArgumentException(
        s"graft_changes REFUSED: dir must be a string path, got " +
          s"$v: ${t.simpleString}")
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key = graft.sources.LakeSink.updateLogKey(fs, dir).getOrElse(
      throw new IllegalStateException(
        s"graft_changes REFUSED: $dir carries no registered key " +
          "(_updates/_key) — the feed's ops are keyed; registerKeyDir " +
          "first, or land a first upsert"))
    val df = args.size match {
      case 1 => graft.sources.LakeSink.changeFeed(spark, dir, key)
      case 2 =>
        val from = asLong(args(1), "fromSeq")
        graft.sources.LakeSink.changeFeedBetween(spark, dir, key,
          from, math.max(from, graft.sources.LakeSink.lastLandedSeq(spark, dir)))
      case _ =>
        graft.sources.LakeSink.changeFeedBetween(spark, dir, key,
          asLong(args(1), "fromSeq"), asLong(args(2), "toSeq"))
    }
    df.queryExecution.analyzed
  }

  /** the tuple `injectTableFunction` takes */
  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (identifier, info, build)
}

/** `graft_history` — the LOG TIER'S COMMIT HISTORY as a SQL table
  * function (Delta's `DESCRIBE HISTORY` for the directory-addressed
  * table): one row per committed landing,
  * `(seq, kind ∈ upsert|delete, n_rows)` — n_rows is the landed
  * batch's own row count (upsert: the batch's data rows; delete: the
  * tombstoned key count), deterministic by construction, so the
  * history is ORACLE-able (a49 restates the fixture's three landings
  * over raw orders). The natural companions compose from it in SQL:
  * `max(seq)` is [[graft.sources.LakeSink.lastLandedSeq]], and any
  * row's seq feeds `VERSION AS OF` (a46) or `graft_changes` (a48) —
  * inspect history, then travel or replay, all in plain SQL.
  *
  * Scale shape: one row per landing, computed from the batch
  * directories' parquet FOOTERS on the DRIVER at plan time —
  * metadata-sized at any table size, zero Spark jobs (the r16 form
  * launched one count job per landing; spec-pinned gone). Pre-seq
  * legacy tombstones REFUSE by name (they have no place in history —
  * [[graft.sources.LakeSink.migrateLegacyTombstones]] mints their
  * seqs). A CATALOG TABLE name serves the GENERATION tier
  * ([[graft.sources.LakeSink.generationHistory]] — r17): one row per
  * retained generation, seq = the generation number `VERSION AS OF`
  * accepts, kind ∈ data|delete, n_rows from footer sums (a delete
  * snapshot counts the keys it removed — its `_tombstones` footer). */
object GraftHistoryTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_history")

  val info: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftHistoryTvf", null, "graft_history")

  def build(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.size == 1,
      s"graft_history takes (dir|table), got ${args.size}")
    val dir = args.head match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        s.toString
      case e => throw new IllegalArgumentException(
        s"graft_history REFUSED: dir must be a string literal, got $e")
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a CATALOG TABLE name serves the generation tier (seq =
    // generation, kind ∈ data|delete — r17, closing the API-only
    // gap); anything else is a directory-addressed log history.
    // Both are driver-side footer reads — zero Spark jobs. A path
    // (contains '/') is never probed as a name: dotted paths would
    // mis-parse as db.table.
    val isTable = !dir.contains("/") &&
      graft.sources.LakeSink.catalogTableExists(spark, dir)
    val rows = (if (isTable)
        graft.sources.LakeSink.generationHistory(spark, dir)
      else graft.sources.LakeSink.logHistory(spark, fs, dir))
      .map { case (seq, kind, n) => org.apache.spark.sql.Row(seq, kind, n) }
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("seq", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n_rows", LongType,
        nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), sch).queryExecution.analyzed
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (identifier, info, build)
}
