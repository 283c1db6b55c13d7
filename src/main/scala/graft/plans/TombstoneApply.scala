package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.EqualTo
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MERGE-ON-READ TOMBSTONES APPLIED BY THE PLANNER — closing the
  * plain-read resurrection hole: `spark.table(t)` /
  * `spark.read.parquet(dir)` on a tombstone-carrying table reads
  * DATA FILES ONLY (`_deletes/` is `_`-hidden from the scan), so
  * every soft-deleted row silently came back unless the caller knew
  * to use [[graft.sources.LakeSink.readMor]]. The reference's
  * contract is the opposite — a deleted order must NEVER serve again
  * (order.js:675 deletes row and object in lockstep); a GDPR erasure
  * followed by plain SQL must stay erased.
  *
  * With `spark.graft.morApply.enabled` on, every eligible parquet
  * scan whose single root directory carries `_deletes/b-*` batches is
  * rewritten to `scan ⟕̸ tombstones` — a LEFT ANTI join against the
  * union of the delete-key batches, broadcast-hinted (the tombstone
  * side is delete-sized, the same shape [[graft.sources.LakeSink
  * .morRead]] builds explicitly — this rule makes it the PLAN'S
  * default, exactly how Delta applies deletion vectors inside scan
  * planning). The key column comes from the tombstone schema itself
  * (one column, [[graft.sources.LakeSink.softDeleteDir]]'s shape); a
  * scan that does not expose that column cannot have the deletes
  * applied and REFUSES BY NAME pointing at readMor — serving
  * resurrected rows silently is the one wrong answer.
  *
  * Discipline ([[BloomPruneRule]]'s): conf-gated OFF by default;
  * convergence-guarded through the shared
  * [[ManifestPrune.PrunedFileIndex]] ledger under the name "mor"
  * (the marked relation — the join's left child — is skipped on the
  * next fixpoint pass, while the manifest prune rules still compose
  * on it: predicates push below the anti-join's left side, so a
  * `WHERE k = v` over a MOR table prunes files AND hides deletes in
  * one plan); existence probes memoized on the root's mtime
  * (creating `_deletes/` updates the root directory entry, so the
  * memo never serves a pre-delete answer). Queries over tables with
  * no `_deletes` pay one memoized probe and are otherwise untouched.
  * LakeSpec pins plain-read ≡ readMor under the flag, pre/post
  * softDelete and post-compactMor; a29 hash-checks it end to end. */
class TombstoneApplyRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import ManifestPrune._

  val ConfKey = "spark.graft.morApply.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if eligibleRoot(r).exists(!_._2.contains("mor")) =>
        val (root, prunedBy) = eligibleRoot(r).get
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val rootMtime = fs.getFileStatus(root).getModificationTime
        if (!manifestExists(fs, root, rootMtime, "_deletes")) l
        else {
          val batches = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
              new org.apache.hadoop.fs.Path(root, "_deletes"), "b-*")))
            .getOrElse(Array.empty).map(_.getPath.toString)
          if (batches.isEmpty) l
          else {
            val tomb = spark.read.parquet(batches.toIndexedSeq: _*)
            require(tomb.columns.length == 1,
              s"MOR PLAN REFUSED: tombstones under $root carry " +
                s"${tomb.columns.length} columns (${tomb.columns.mkString(",")}) " +
                "— not a softDeleteDir key set")
            val key = tomb.columns.head
            val resolver = spark.sessionState.conf.resolver
            val keyAttr = l.output.find(a => resolver(a.name, key))
              .getOrElse(throw new IllegalStateException(
                s"MOR PLAN REFUSED: $root carries pending tombstones on " +
                  s"'$key' but this scan does not expose that column — " +
                  "the deletes cannot be applied and serving resurrected " +
                  "rows silently is not an option. Read through " +
                  "LakeSink.readMor/morRead, or compactMor the table."))
            // marked left child (all files kept — the mark is the
            // point): the fixpoint batch must not stack a second
            // anti-join; the prune rules still compose on it
            val marked = pruneRelation(spark, l, r, root, prunedBy, "mor",
              r.location.inputFiles.map(f =>
                new org.apache.hadoop.fs.Path(f).getName).toSet)
            // tombstones have no NULL keys (softDeleteDir refuses
            // them), so plain equality is exactly morRead's anti-join
            val tplan = tomb.queryExecution.analyzed
            Join(marked, tplan, LeftAnti,
              Some(EqualTo(keyAttr, tplan.output.head)),
              JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
          }
        }
    }
  }
}
