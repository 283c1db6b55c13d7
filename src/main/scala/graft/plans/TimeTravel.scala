package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL TIME TRAVEL — `SELECT … FROM t VERSION AS OF n` resolved to
  * graft's travel reads (Delta's syntax; Spark's ANTLR grammar
  * already parses the temporal clause into a [[RelationTimeTravel]]
  * node). Rewritten AT PARSE TIME from [[GraftSqlParser.parsePlan]]:
  * Spark's own `ResolveRelations` THROWS `timeTravelUnsupportedError`
  * for v1 relations before any injected resolution rule could run,
  * so the analyzer is too late — the parser we already own is the
  * seam (the same place the DML routing lives). This closes the read
  * side of the SQL story a41 opened: a reference user
  * (order.js:596-709 speaks SQL for every access) reads history with
  * the syntax Delta users know, no API call.
  *
  *  - `` parquet.`/dir` VERSION AS OF <seq> `` — the LOG tier:
  *    [[graft.sources.LakeSink.morReadUpsertDirAsOf]] folds exactly
  *    the update/tombstone batches with shared-counter seq ≤ n
  *    (0 = the base as written; a44's contract). The directory must
  *    carry a registered key (`_updates/_key`) — refuses by name
  *    otherwise, exactly like the DML surface.
  *  - `<table> VERSION AS OF <gen>` — the CATALOG tier:
  *    [[graft.sources.LakeSink.readGeneration]] (a27/a35's retained
  *    generation snapshots; unretained generations refuse by name
  *    listing what IS retained).
  *
  * `TIMESTAMP AS OF` refuses by name on graft targets — landings
  * carry sequence numbers, not wall clocks, and mapping a timestamp
  * onto them would invent history. Non-graft targets (an identifier
  * that is neither a lake path nor a catalog table) pass through
  * untouched so Spark's own error names the real problem.
  *
  * Scale shape is the underlying read's: the as-of fold is
  * O(log ≤ seq) over an explicit file list (rule-proof), the
  * generation read is one snapshot directory. */
object GraftTimeTravel {

  /** rewrite every graft-addressable [[RelationTimeTravel]] node in a
    * freshly-parsed plan; no active session or no graft target →
    * the plan passes through untouched. */
  def rewrite(plan: LogicalPlan): LogicalPlan =
    SparkSession.getActiveSession match {
      case None => plan
      case Some(spark) => plan.transformUp {
        case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
          resolve(spark, u, ts, ver).getOrElse(tt)
      }
    }

  private def refuseTimestamp(target: String): Nothing =
    throw new UnsupportedOperationException(
      s"TIME TRAVEL REFUSED: TIMESTAMP AS OF is not supported on " +
        s"$target — landings carry sequence numbers, not wall clocks " +
        "(mapping a timestamp onto them would invent history); use " +
        "VERSION AS OF <seq|generation>")

  private def parseVersion(target: String, ver: String): Long =
    try ver.toLong
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"TIME TRAVEL REFUSED: version '$ver' on $target is not a " +
          "number — the log tier travels by landing seq, the catalog " +
          "tier by generation number")
    }

  private def resolve(spark: SparkSession, u: UnresolvedRelation,
      ts: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      ver: Option[String]): Option[LogicalPlan] =
    u.multipartIdentifier match {
      case Seq(fmt, path) if fmt.equalsIgnoreCase("parquet") =>
        if (ts.nonEmpty || ver.isEmpty) refuseTimestamp(s"parquet.`$path`")
        val seq = parseVersion(s"parquet.`$path`", ver.get)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val key = graft.sources.LakeSink.updateLogKey(fs, path).getOrElse(
          throw new IllegalStateException(
            s"TIME TRAVEL REFUSED: parquet.`$path` carries no " +
              "registered key (_updates/_key) — the log-tier fold is " +
              "keyed; registerKeyDir first, or land a first upsert"))
        Some(graft.sources.LakeSink
          .morReadUpsertDirAsOf(spark, path, key, seq)
          .queryExecution.analyzed)
      // one- or two-part catalog names (`t` / `db.t`), resolved with
      // the catalog's current-database rules; a database literally
      // named `parquet` is shadowed by the path form above — rename
      // it or travel through the API. The parts arrive pre-unquoted
      // from the grammar, so the identifier is built directly (a name
      // containing a literal dot must not re-split).
      case parts @ (Seq(_) | Seq(_, _))
          if spark.sessionState.catalog.tableExists(identOf(parts)) =>
        val name = parts.map(p => s"`$p`").mkString(".")
        if (ts.nonEmpty || ver.isEmpty) refuseTimestamp(name)
        val gen = parseVersion(name, ver.get)
        Some(graft.sources.LakeSink.readGeneration(spark, name, gen)
          .queryExecution.analyzed)
      case _ => None
    }

  private def identOf(parts: Seq[String]): TableIdentifier = parts match {
    case Seq(t) => TableIdentifier(t.toLowerCase)
    case Seq(db, t) => TableIdentifier(t.toLowerCase, Some(db.toLowerCase))
    case _ => throw new IllegalStateException("unreachable: 1-2 parts")
  }
}
