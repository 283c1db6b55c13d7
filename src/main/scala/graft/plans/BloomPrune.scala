package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** BLOOM-MANIFEST FILE PRUNING AS AN OPTIMIZER RULE — a23's
  * membership skipping consulted by the PLANNER itself, so a plain
  * `spark.sql("… WHERE k = 42")` over a manifest-carrying parquet
  * directory reads ~1 file with NO special read API (the a23 read
  * path is the explicit form; this is where the decision
  * architecturally belongs — Delta/Iceberg do their stats pruning
  * inside scan planning exactly like this).
  *
  * Shape: `Filter(… k = lit …, LogicalRelation(parquet))` where the
  * relation's single root directory carries `_blooms_<k>` → the
  * relation's file index is replaced by one listing only the bloom
  * SURVIVORS (re-anchored by file NAME, the rename-stable identity).
  * The Filter stays on top untouched — bloom false positives are
  * removed by the very predicate that triggered the prune, so the
  * rewrite can never change results, only the files read
  * ([[graft.sources.LakeSink.fileBlooms]] has no false negatives, so
  * no matching file is ever skipped).
  *
  * Discipline (the [[DistinctPairRewrite]] rules): conf-gated OFF by
  * default (`spark.graft.bloomPrune.enabled`); convergence-guarded —
  * the pruned index is a marker subclass, so the fixpoint batch
  * can't re-fire; fires only on the exact eligible shape (single
  * unpartitioned parquet root, non-null literal equality on a
  * manifest column, survivors strictly fewer than the full listing).
  * Planning-time manifest reads are memoized per (dir, col, value,
  * manifest mtime) — the file-count-sized read every lakehouse
  * planner does, paid once per distinct lookup. */
class BloomPruneRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  val ConfKey = "spark.graft.bloomPrune.enabled"

  /** marker: a file index this rule already produced */
  private class BloomPrunedFileIndex(files: Seq[org.apache.hadoop.fs.Path],
      schema: org.apache.spark.sql.types.StructType)
    extends InMemoryFileIndex(spark, files,
      Map.empty[String, String], Some(schema),
      FileStatusCache.getOrCreate(spark), None, None)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, Long),
      Array[String]]()

  private def survivors(dir: String, c: String, v: Literal,
      mtime: Long): Array[String] = {
    val key = (dir, c, v.toString, mtime)
    val hit = cache.get(key)
    if (hit != null) return hit
    // bounded memo: distinct lookups are usually few, but a driver
    // serving ad-hoc point queries for weeks must not leak — drop
    // the memo wholesale past the cap (manifest reads are cheap to
    // redo; correctness never depended on the cache)
    if (cache.size() > 1024) cache.clear()
    val man = spark.read.parquet(s"$dir/_blooms_$c")
    val scalaV = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToScala(v.value, v.dataType)
    val got = graft.sources.LakeSink.bloomSurvivors(man, c,
      org.apache.spark.sql.functions.lit(scalaV))
    cache.put(key, got)
    got
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond,
          l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _))
          if r.partitionSchema.isEmpty &&
            r.fileFormat.toString.toLowerCase.contains("parquet") &&
            !r.location.isInstanceOf[BloomPrunedFileIndex] &&
            r.location.rootPaths.length == 1 =>
        val root = r.location.rootPaths.head
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // the equality conjuncts whose column has a committed manifest
        val eligible = splitConjunctivePredicates(cond).collectFirst {
          case EqualTo(a: AttributeReference, v: Literal)
              if v.value != null && l.output.exists(_.exprId == a.exprId) &&
                fs.exists(new org.apache.hadoop.fs.Path(root,
                  s"_blooms_${a.name}")) => (a.name, v)
          case EqualTo(v: Literal, a: AttributeReference)
              if v.value != null && l.output.exists(_.exprId == a.exprId) &&
                fs.exists(new org.apache.hadoop.fs.Path(root,
                  s"_blooms_${a.name}")) => (a.name, v)
        }
        eligible match {
          case Some((c, v)) =>
            val manPath = new org.apache.hadoop.fs.Path(root, s"_blooms_$c")
            val mtime = fs.getFileStatus(manPath).getModificationTime
            val keep = survivors(root.toString, c, v, mtime)
              .map(p => new org.apache.hadoop.fs.Path(root,
                new org.apache.hadoop.fs.Path(p).getName))
            if (keep.length < r.location.inputFiles.length) {
              val pruned = new BloomPrunedFileIndex(keep.toIndexedSeq,
                r.dataSchema)
              val rel = r.copy(location = pruned)(spark)
              Filter(cond, l.copy(relation = rel))
            } else f
          case None => f
        }
    }
  }
}
