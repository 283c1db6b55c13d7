package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** SQL DML FOR THE LAKE — `DELETE FROM` / `UPDATE` / `MERGE INTO`
  * parsed by a session parser extension and routed to the
  * merge-on-read write machinery
  * ([[graft.sources.LakeSink.softDeleteUpsertDir]] /
  * [[graft.sources.LakeSink.softUpsertDir]] / the delete-snapshot
  * [[graft.sources.LakeSink.softDelete]]). The reference's write
  * surface IS SQL DML (lambda_fns/order.js:596-709 issues literal
  * UPDATE/DELETE statements); with the read side already plain-SQL
  * end to end (the prune/fold rules a24-a32, a36), this closes the
  * loop: a reference user speaks SQL for every read AND every write.
  *
  * Grammar (case-insensitive; everything else delegates to Spark's
  * own parser untouched):
  *
  *  - `DELETE FROM <target> [WHERE <pred>]` — rows matching the
  *    predicate resolve to their KEYS (one filtered scan of the MOR
  *    view), which land as an O(|keys|) tombstone batch: data files
  *    are never rewritten. On a catalog table with no pending update
  *    log this publishes a delete SNAPSHOT generation (time-travel
  *    visible, the a22/a27 contract); otherwise the batch lands in
  *    the directory's `_deletes/` log.
  *  - `UPDATE <target> SET c = e [, ...] [WHERE <pred>]` — every RHS
  *    evaluates against the OLD row (standard SQL UPDATE semantics:
  *    assignments never see each other), the updated full rows land
  *    as ONE upsert-log batch. Assigning the table's KEY refuses by
  *    name (a key change is a delete + an insert — two intents, two
  *    statements).
  *  - `MERGE INTO <target> [AS a] USING <source> [AS b] ON <a>.k = <b>.k
  *    [WHEN MATCHED AND <cond> THEN DELETE]
  *    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *    — the canonical upsert, plus the CDC-apply clause: matched
  *    source rows satisfying the DELETE condition tombstone, the
  *    remaining matched keys update, unmatched keys insert — the
  *    exact statement a Debezium-style change stream replays into a
  *    lake (op = 'D' rows delete, the rest upsert). The ON condition
  *    must be an equi-join on the table's registered key; any other
  *    merge shape refuses by name pointing at
  *    [[graft.sources.LakeSink.mergeKeyed]] (the copy-on-write API
  *    that can express arbitrary merges).
  *
  * `<target>` is a catalog table name, or a path-addressed lake dir
  * as `` parquet.`/path` `` (Delta's ``delta.`path` `` convention).
  * THE KEY is resolved, in order, from: the directory's committed
  * `_updates/_key` marker (one key governs one log), the catalog
  * table's `graft.key` property ([[graft.sources.LakeSink
  * .registerExternal]]'s keyed overload writes it), or the session
  * conf `spark.graft.dml.key.<table>`; with none present the
  * statement REFUSES BY NAME — guessing a key would make "latest
  * wins" meaningless.
  *
  * Scale shape: each statement costs one filtered scan of the MOR
  * view (predicate and column pruning push into it like any read)
  * plus a churn-sized log landing — the 100 TB table is never
  * rewritten; the landing serializes under the directory's log claim
  * like every other log write. Each statement returns its effect row
  * (`op, n_updated, n_inserted, n_deleted`) — the reference's lambda
  * returns affectedRows the same way. */
object GraftDml {

  // ---- statement shapes (anchored, case-insensitive, dot-all) ----
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+(.+?)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val MergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+(.+?)\s+USING\s+(.+?)\s+ON\s+(.+?)\s+""" +
      """(?:WHEN\s+MATCHED\s+AND\s+(.+?)\s+THEN\s+DELETE\s+)?""" +
      """WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$""").r
  private val MergeHead = """(?is)^\s*MERGE\s+INTO\s.*""".r

  /** parse `sqlText` as a graft DML statement, or None to delegate.
    * A statement that IS one of the three DML heads but does not fit
    * the supported shape still delegates — Spark's own v2-table
    * error is honest, and a parse-time hijack of a shape we cannot
    * route would hide it. */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case DeleteRe(target, pred) =>
      Some(GraftDmlCommand("delete", target.trim,
        Option(pred).map(_.trim), Nil, None, None))
    case UpdateRe(target, setList, pred) =>
      splitAssignments(setList).map(assigns =>
        GraftDmlCommand("update", target.trim,
          Option(pred).map(_.trim), assigns, None, None))
    case MergeRe(target, source, onCond, delCond) =>
      Some(GraftDmlCommand("merge", target.trim,
        Option(delCond).map(_.trim), Nil,
        Some(source.trim), Some(onCond.trim)))
    case MergeHead() =>
      // a MERGE we cannot route must not silently fall through to
      // Spark (its v1 error names no alternative) — refuse by name
      throw new UnsupportedOperationException(
        "MERGE REFUSED: only `MERGE INTO t USING s ON t.k = s.k " +
          "[WHEN MATCHED AND <cond> THEN DELETE] WHEN MATCHED THEN " +
          "UPDATE SET * WHEN NOT MATCHED THEN INSERT *` routes " +
          "through the upsert log; other shapes go through " +
          "LakeSink.mergeKeyed (copy-on-write) or " +
          "LakeSink.softPatchDir (column-subset patches).")
    case _ => None
  }

  /** split `a = e1, b = e2` on TOP-LEVEL commas (parens/brackets and
    * string literals tracked — `greatest(a, b)` must not split), then
    * each assignment on its first top-level `=`. None = not an
    * assignment list (delegate). */
  private[graft] def splitAssignments(s: String): Option[Seq[(String, String)]] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { if (ch == quote) quote = 0; cur += ch }
      else ch match {
        case '\'' | '"' | '`' => quote = ch; cur += ch
        case '(' | '[' => depth += 1; cur += ch
        case ')' | ']' => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    parts += cur.result()
    val AssignRe = """(?s)^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$""".r
    val assigns = parts.toSeq.map {
      case AssignRe(c, e) => Some(c -> e.trim)
      case _ => None
    }
    if (assigns.forall(_.isDefined)) Some(assigns.flatten) else None
  }

  /** `parquet.`/path`` (optional alias) → path; anything else → table */
  private val PathTarget =
    """(?is)^parquet\s*\.\s*`([^`]+)`(?:\s+(?:AS\s+)?[A-Za-z_][A-Za-z0-9_]*)?$""".r

  private[plans] def resolveTarget(spark: SparkSession,
      target: String): (String, Option[String]) = target match {
    case PathTarget(p) => (p, None)
    case t =>
      // strip an optional alias (`orders o` / `orders AS o`)
      val name = t.split("""(?i)\s+(?:AS\s+)?""")(0)
      (graft.sources.LakeSink.tableLocation(spark, name), Some(name))
  }

  /** key resolution: log marker > catalog property > session conf */
  private[plans] def resolveKey(spark: SparkSession, loc: String,
      table: Option[String]): String = {
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.LakeSink.updateLogKey(fs, loc)
      .orElse(table.flatMap { t =>
        val ident = TableIdentifier(t.toLowerCase)
        spark.sessionState.catalog.getTableMetadata(ident)
          .properties.get("graft.key")
      })
      .orElse(table.flatMap(t =>
        spark.conf.getOption(s"spark.graft.dml.key.$t")))
      .getOrElse(throw new IllegalStateException(
        s"DML REFUSED: no key registered for $loc — DML folds through " +
          "the keyed merge-on-read log, and guessing a key would make " +
          "\"latest wins\" meaningless. Register one: registerExternal(" +
          "..., key = ...), TBLPROPERTIES('graft.key'='<col>'), or the " +
          s"session conf spark.graft.dml.key.<table>."))
  }

  private def hasUpdates(spark: SparkSession, loc: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(p, "_updates"), "u-*")))
      .exists(_.nonEmpty)
  }

  /** the table view a DML predicate scans. With
    * `spark.graft.morApply.enabled` on, a SINGLE-ROOT read — the
    * planner folds the log ([[TombstoneApplyRule]], value-identical
    * to the explicit API, a36's hash-proved contract) AND the
    * manifest prune rules can fire on it, so `DELETE … WHERE k = 42`
    * over a blooms-carrying table reads ~the owning files instead of
    * the table (Delta's DELETE does its file skipping exactly here).
    * With the conf off, the explicit fold API (prune-proof but always
    * correct). The landing kernels re-verify liveness under the log
    * claim either way, so the choice affects READ cost only. */
  private def dmlView(spark: SparkSession, loc: String,
      key: String): org.apache.spark.sql.DataFrame =
    if (spark.conf.get("spark.graft.morApply.enabled", "false").toBoolean)
      spark.read.parquet(loc)
    else graft.sources.LakeSink.morReadUpsertDir(spark, loc, key)

  private[plans] def runDelete(spark: SparkSession, target: String,
      pred: Option[String]): Long = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val (loc, table) = resolveTarget(spark, target)
    val key = resolveKey(spark, loc, table)
    val view = dmlView(spark, loc, key)
    val keys = view.filter(pred.map(expr).getOrElse(lit(true)))
      .select(col(key)).distinct().localCheckpoint(true)
    if (keys.isEmpty) return 0L
    if (hasUpdates(spark, loc) || table.isEmpty)
      graft.sources.LakeSink.softDeleteUpsertDir(spark, loc, keys, key)
    else
      // log-free catalog table: the richer route — the delete also
      // publishes a time-travel-visible snapshot generation
      graft.sources.LakeSink.softDelete(spark, table.get, keys, key)
  }

  private[plans] def runUpdate(spark: SparkSession, target: String,
      assigns: Seq[(String, String)], pred: Option[String]): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val (loc, table) = resolveTarget(spark, target)
    val key = resolveKey(spark, loc, table)
    require(!assigns.exists(_._1.equalsIgnoreCase(key)),
      s"UPDATE REFUSED: SET targets the key column '$key' — a key " +
        "change is a DELETE plus an INSERT (two intents, two " +
        "statements); an updated key would orphan the old version")
    val view = dmlView(spark, loc, key)
    val unknown = assigns.map(_._1)
      .filterNot(c => view.columns.exists(_.equalsIgnoreCase(c)))
    require(unknown.isEmpty,
      s"UPDATE REFUSED: unknown columns ${unknown.mkString(", ")} — " +
        s"the table carries [${view.columns.mkString(", ")}]")
    val byName = assigns.map { case (c, e) => c.toLowerCase -> e }.toMap
    // ALL right-hand sides evaluate against the OLD row: one select
    // applies every assignment simultaneously (SQL UPDATE semantics —
    // `SET a = b, b = a` swaps)
    val batch = view.filter(pred.map(expr).getOrElse(lit(true)))
      .select(view.columns.toIndexedSeq.map(c =>
        byName.get(c.toLowerCase)
          .map(e => expr(e).cast(view.schema(c).dataType).as(c))
          .getOrElse(col(c))): _*)
      .localCheckpoint(true)
    if (batch.isEmpty) (0L, 0L)
    else graft.sources.LakeSink.softUpsertDir(spark, loc, batch, key)
  }

  private val OnCondRe =
    """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)\s*$""".r

  /** the canonical upsert, plus the CDC-apply clause: with `delCond`
    * set (`WHEN MATCHED AND <cond> THEN DELETE`), MATCHED source rows
    * satisfying it delete (tombstone batch), the rest of the matched
    * rows update and unmatched rows insert — standard MERGE clause
    * order: the delete clause is tried first per matched pair;
    * unmatched rows always insert (Delta's semantics — a 'D' record
    * for a key never present inserts unless the source pre-filters).
    * The upsert batch lands FIRST, the tombstones second — the two
    * key sets are disjoint (each source key takes exactly one
    * clause), so the pending-tombstone refusal can never fire between
    * them. Returns (updated, inserted, deleted). */
  private[plans] def runMerge(spark: SparkSession, target: String,
      source: String, onCond: String,
      delCond: Option[String]): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.{col, expr}
    val (loc, table) = resolveTarget(spark, target)
    val key = resolveKey(spark, loc, table)
    val onKey = onCond match {
      case OnCondRe(_, c1, _, c2) if c1.equalsIgnoreCase(c2) => c1
      case _ => throw new UnsupportedOperationException(
        s"MERGE REFUSED: ON must be an equi-join on the table's key " +
          s"('$key'), got `$onCond` — other merge conditions go " +
          "through LakeSink.mergeKeyed")
    }
    require(onKey.equalsIgnoreCase(key),
      s"MERGE REFUSED: ON joins on '$onKey' but the table's " +
        s"registered key is '$key' — one key governs one log")
    // source: a table name, or a parenthesized subquery, each with an
    // optional alias — kept, so a DELETE condition can qualify source
    // columns (`s.op = 'D'`)
    val SubqueryRe =
      """(?s)^\((.+)\)(?:\s+(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*))?$""".r
    val (srcRaw, srcAlias) = source.trim match {
      case SubqueryRe(inner, alias) => (spark.sql(inner), Option(alias))
      case t =>
        val parts = t.split("""(?i)\s+(?:AS\s+)?""")
        (spark.table(parts(0)),
          if (parts.length > 1) Some(parts.last) else None)
    }
    val srcDf = srcAlias.foldLeft(srcRaw.localCheckpoint(true))(_.alias(_))
    // SET * / INSERT * map source → target BY NAME: every table
    // column must exist in the source; EXTRA source columns (a CDC
    // op/ts envelope) are simply unused — Delta's semantics
    val view = dmlView(spark, loc, key)
    val missing = view.columns.filterNot(c =>
      srcDf.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"MERGE REFUSED: SET */INSERT * needs every table column in the " +
        s"source; missing ${missing.mkString(", ")}")
    val projected = srcDf.select(view.columns.toIndexedSeq.map(col): _*)
    delCond match {
      case None =>
        val (u, i) = graft.sources.LakeSink.softUpsertDir(spark, loc,
          projected, key)
        (u, i, 0L)
      case Some(cond) =>
        val matchedKeys = view.select(col(key)).distinct()
        val delKeys = srcDf.filter(expr(cond))
          .join(matchedKeys, Seq(key), "left_semi")
          .select(col(key)).localCheckpoint(true)
        val upserts = projected.join(delKeys, Seq(key), "left_anti")
        val (u, i) =
          if (upserts.isEmpty) (0L, 0L)
          else graft.sources.LakeSink.softUpsertDir(spark, loc, upserts, key)
        val d =
          if (delKeys.isEmpty) 0L
          else graft.sources.LakeSink.softDeleteUpsertDir(spark, loc,
            delKeys, key)
        (u, i, d)
    }
  }
}

/** the eagerly-executed command [[GraftDml.parse]] produces — one
  * effect row back (`op, n_updated, n_inserted, n_deleted`), the
  * reference's affectedRows contract. */
case class GraftDmlCommand(kind: String, target: String,
    pred: Option[String], assigns: Seq[(String, String)],
    source: Option[String], onCond: Option[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("n_updated", LongType, nullable = false)(),
    AttributeReference("n_inserted", LongType, nullable = false)(),
    AttributeReference("n_deleted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = kind match {
    case "delete" =>
      val n = GraftDml.runDelete(spark, target, pred)
      Seq(Row("delete", 0L, 0L, n))
    case "update" =>
      val (u, i) = GraftDml.runUpdate(spark, target, assigns, pred)
      Seq(Row("update", u, i, 0L))
    case "merge" =>
      val (u, i, d) = GraftDml.runMerge(spark, target, source.get,
        onCond.get, pred)
      Seq(Row("merge", u, i, d))
  }
}

/** the parser extension itself: graft DML shapes route to
  * [[GraftDmlCommand]], every other statement — and every other
  * parser surface (expressions, identifiers, schemas) — delegates to
  * Spark's parser byte-for-byte. Injected via
  * `SparkSessionExtensions.injectParser` in
  * [[graft.GraftSession.builder]]. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftDml.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}
