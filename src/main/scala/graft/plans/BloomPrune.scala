package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** Shared plumbing for the MANIFEST-CONSULTING planner rules
  * ([[BloomPruneRule]] — membership, [[StatsPruneRule]] — range):
  * the marker file index that convergence-guards BOTH rules inside
  * the optimizer's fixpoint batch (either rule's rewrite blocks the
  * other from re-firing on the same scan — one manifest pruning per
  * relation, never a loop), the bounded LRU memo for planning-time
  * manifest reads, and the staleness guard every prune must pass. */
private[graft] object ManifestPrune {

  /** marker: a file index a manifest rule already produced */
  class PrunedFileIndex(spark: SparkSession,
      files: Seq[org.apache.hadoop.fs.Path],
      schema: org.apache.spark.sql.types.StructType)
    extends InMemoryFileIndex(spark, files,
      Map.empty[String, String], Some(schema),
      FileStatusCache.getOrCreate(spark), None, None)

  /** size-bounded LRU (access-ordered LinkedHashMap): a steady
    * ad-hoc lookup workload past the cap evicts the COLDEST entry
    * instead of clearing the whole memo — the clear-on-cap shape
    * thrashed every hot manifest read once 1024 distinct lookups
    * accumulated (the r12 watch item). Synchronized: optimizer
    * invocations are driver-side and cheap relative to a manifest
    * read, so one lock is the right shape. */
  final class Lru[K, V](cap: Int) {
    private val m = new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        this.size() > cap
    }
    def getOrElseUpdate(k: K)(compute: => V): V = {
      val hit = m.synchronized(m.get(k))
      if (hit != null) hit
      else {
        val v = compute // outside the lock: manifest reads are slow
        m.synchronized(m.put(k, v))
        v
      }
    }
    def size: Int = m.synchronized(m.size())
  }

  /** The STALENESS GUARD: a prune is sound only if the manifest
    * knows every file the relation is about to read — files added
    * AFTER the manifest was built (a bootstrap attachBlooms followed
    * by more writes, an evolved append) are absent from it, so
    * "keep < listing" would silently exclude them: FALSE NEGATIVES
    * on a plain read. The mtime memo key cannot catch this (adding
    * files does not rewrite the manifest), so the check is by NAME:
    * prune only when the manifest's file-name set covers the
    * relation's current listing. Survivors are then intersected
    * with the listing, so a manifest naming already-DELETED files
    * can never direct a read at a path that is gone. */
  def coveringNames(manifestNames: Set[String],
      listing: Array[String]): Option[Set[String]] = {
    val current = listing.map(f =>
      new org.apache.hadoop.fs.Path(f).getName).toSet
    if (current.subsetOf(manifestNames)) Some(current) else None
  }

  /** the eligible scan shape both rules share: a filter directly
    * over a single-root, unpartitioned parquet relation not already
    * pruned by a manifest rule */
  def eligibleRoot(r: HadoopFsRelation): Option[org.apache.hadoop.fs.Path] =
    if (r.partitionSchema.isEmpty &&
        r.fileFormat.toString.toLowerCase.contains("parquet") &&
        !r.location.isInstanceOf[PrunedFileIndex] &&
        r.location.rootPaths.length == 1)
      Some(r.location.rootPaths.head)
    else None

  def scalaLit(v: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(v, dt))
}

/** BLOOM-MANIFEST FILE PRUNING AS AN OPTIMIZER RULE — a23's
  * membership skipping consulted by the PLANNER itself, so a plain
  * `spark.sql("… WHERE k = 42")` (or `k IN (…)` — the reference's
  * paged point-lookup shape, order_rdbms_blob.js:520) over a
  * manifest-carrying parquet directory reads ~the owning files with
  * NO special read API (the a23/a25 read paths are the explicit
  * form; this is where the decision architecturally belongs —
  * Delta/Iceberg do their stats pruning inside scan planning exactly
  * like this).
  *
  * Shape: `Filter(… k = lit | k IN (lits) …, LogicalRelation
  * (parquet))` where the relation's single root directory carries
  * `_blooms_<k>` → the relation's file index is replaced by one
  * listing only the bloom SURVIVORS (union over the IN-list's
  * values, re-anchored by file NAME, the rename-stable identity).
  * The Filter stays on top untouched — bloom false positives are
  * removed by the very predicate that triggered the prune, so the
  * rewrite can never change results, only the files read
  * ([[graft.sources.LakeSink.fileBlooms]] has no false negatives, so
  * no matching file is ever skipped).
  *
  * Discipline (the [[DistinctPairRewrite]] rules): conf-gated OFF by
  * default (`spark.graft.bloomPrune.enabled`); convergence-guarded —
  * the pruned index is [[ManifestPrune.PrunedFileIndex]], so the
  * fixpoint batch can't re-fire (and [[StatsPruneRule]] can't
  * double-prune the same scan); fires only on the exact eligible
  * shape; BAILS (keeps the full listing) when the manifest does not
  * cover the relation's current file listing — files appended after
  * the manifest was built would otherwise be silently excluded
  * (ManifestPrune.coveringNames). Planning-time manifest reads are
  * memoized in a 1024-entry LRU keyed by (dir, col, values,
  * manifest mtime) — the file-count-sized read every lakehouse
  * planner does, paid once per distinct lookup, coldest evicted
  * first. IN-lists above 1024 values bail: at that width the
  * driver-side probe work stops being worth a file-skip decision. */
class BloomPruneRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {
  import ManifestPrune._

  val ConfKey = "spark.graft.bloomPrune.enabled"
  private val MaxInValues = 1024

  private val memo = new Lru[(String, String, String, Long), Array[String]](1024)
  /** manifest file-NAME sets for the staleness guard, memoized
    * separately (a string literal could otherwise collide with any
    * sentinel key in the survivors memo) */
  private val namesMemo = new Lru[(String, String, Long), Set[String]](256)
  private[plans] def memoSize: Int = memo.size

  /** bloom survivors for ANY of `values` — ONE driver-side manifest
    * pass however long the IN-list (per-value probes would re-scan
    * the manifest |values| times), memoized per distinct list */
  private def survivors(dir: String, c: String,
      values: Seq[org.apache.spark.sql.Column], valueKey: String,
      mtime: Long): Array[String] =
    memo.getOrElseUpdate((dir, c, valueKey, mtime)) {
      val man = spark.read.parquet(s"$dir/_blooms_$c")
      values.flatMap(v =>
        graft.sources.LakeSink.bloomSurvivors(man, c, v)).distinct.toArray
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond,
          l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _))
          if eligibleRoot(r).isDefined =>
        val root = eligibleRoot(r).get
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def hasManifest(name: String): Boolean =
          fs.exists(new org.apache.hadoop.fs.Path(root, s"_blooms_$name"))
        def owned(a: AttributeReference): Boolean =
          l.output.exists(_.exprId == a.exprId)
        // the first equality / IN conjunct on a manifest column:
        // (column, probe values as Columns, memo key)
        val eligible = splitConjunctivePredicates(cond).collectFirst {
          case EqualTo(a: AttributeReference, v: Literal)
              if v.value != null && owned(a) && hasManifest(a.name) =>
            (a.name, Seq(scalaLit(v.value, v.dataType)), v.toString)
          case EqualTo(v: Literal, a: AttributeReference)
              if v.value != null && owned(a) && hasManifest(a.name) =>
            (a.name, Seq(scalaLit(v.value, v.dataType)), v.toString)
          case In(a: AttributeReference, vs)
              if vs.nonEmpty && vs.length <= MaxInValues &&
                vs.forall { case Literal(x, _) => x != null; case _ => false } &&
                owned(a) && hasManifest(a.name) =>
            (a.name,
              vs.map { case Literal(x, dt) => scalaLit(x, dt) },
              vs.map(_.toString).sorted.mkString("|"))
          case InSet(a: AttributeReference, hset)
              if hset.nonEmpty && hset.size <= MaxInValues &&
                !hset.contains(null) && owned(a) && hasManifest(a.name) =>
            (a.name,
              hset.toSeq.map(scalaLit(_, a.dataType)),
              hset.map(String.valueOf).toSeq.sorted.mkString("|"))
        }
        eligible match {
          case Some((c, values, valueKey)) =>
            val manPath = new org.apache.hadoop.fs.Path(root, s"_blooms_$c")
            val mtime = fs.getFileStatus(manPath).getModificationTime
            val got = survivors(root.toString, c, values, valueKey, mtime)
            val gotNames = got.map(p =>
              new org.apache.hadoop.fs.Path(p).getName).toSet
            val listing = r.location.inputFiles
            coveringNames(
                namesMemo.getOrElseUpdate((root.toString, c, mtime)) {
                  spark.read.parquet(manPath.toString)
                    .select("file").collect()
                    .map(row => new org.apache.hadoop.fs.Path(
                      row.getString(0)).getName).toSet
                }, listing) match {
              case Some(current) =>
                val keep = (gotNames & current).toSeq.sorted
                  .map(n => new org.apache.hadoop.fs.Path(root, n))
                if (keep.length < listing.length) {
                  val pruned = new PrunedFileIndex(spark, keep, r.dataSchema)
                  val rel = r.copy(location = pruned)(spark)
                  Filter(cond, l.copy(relation = rel))
                } else f
              case None => f // stale manifest: full listing, no false negatives
            }
          case None => f
        }
    }
  }
}

/** MIN/MAX-STATS FILE PRUNING AS AN OPTIMIZER RULE —
  * [[BloomPruneRule]]'s RANGE sibling: a20's `_stats` manifest
  * ([[graft.sources.LakeSink.fileStats]], the Delta/Iceberg
  * data-skipping surface) consulted by the planner, so a plain
  * `spark.sql("… WHERE k BETWEEN a AND b")` over a sorted/z-ordered
  * directory touches ~the overlapping files — the explicit
  * [[graft.sources.LakeSink.readPrunedDir]] decision with no special
  * read API.
  *
  * Shape: range/equality conjuncts (`>= > <= < =`, both operand
  * orders) over columns with `min_<c>`/`max_<c>` in the committed
  * `_stats`; ALL such conjuncts fold into one per-column interval
  * box, and the survivors are the files whose [min, max] can
  * intersect it (NULL-stats files drop — an all-NULL column can
  * never satisfy a range). Strict bounds prune as their non-strict
  * form — conservative by one boundary file at most; the untouched
  * residual Filter keeps the answer exact.
  *
  * Same discipline as the bloom rule: conf-gated OFF by default
  * (`spark.graft.statsPrune.enabled`), convergence-guarded by the
  * shared marker index, staleness-guarded by manifest-name coverage,
  * LRU-memoized planning reads. */
class StatsPruneRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {
  import ManifestPrune._

  val ConfKey = "spark.graft.statsPrune.enabled"

  /** (file name, per-column (min, max) as Spark-side scala values) —
    * the whole manifest, memoized per (dir, mtime); survivors for a
    * given box are then a driver-side array filter, no re-read per
    * distinct predicate */
  private val memo =
    new Lru[(String, Long), Array[(String, Map[String, (Any, Any)])]](256)

  private def manifestRows(dir: String, mtime: Long)
      : Array[(String, Map[String, (Any, Any)])] =
    memo.getOrElseUpdate((dir, mtime)) {
      val man = spark.read.parquet(s"$dir/_stats")
      val statCols = man.columns.filter(_.startsWith("min_"))
        .map(_.stripPrefix("min_"))
        .filter(c => man.columns.contains(s"max_$c")).toSeq
      man.collect().map { row =>
        val name = new org.apache.hadoop.fs.Path(
          row.getAs[String]("file")).getName
        name -> statCols.map(c =>
          c -> ((row.getAs[Any](s"min_$c"), row.getAs[Any](s"max_$c")))).toMap
      }
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: Comparable[_], y) =>
      x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => 0 // incomparable: never prune on it
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond,
          l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _))
          if eligibleRoot(r).isDefined =>
        val root = eligibleRoot(r).get
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val statsPath = new org.apache.hadoop.fs.Path(root, "_stats")
        if (!fs.exists(statsPath)) f
        else {
          def owned(a: AttributeReference): Boolean =
            l.output.exists(_.exprId == a.exprId)
          // fold every range conjunct into per-column (lo, hi) bounds
          // (scala-converted values; strict bounds conservatively
          // widen to non-strict — the residual filter stays exact)
          val bounds = scala.collection.mutable.Map
            .empty[String, (Option[Any], Option[Any])]
          def sc(v: Literal): Any =
            org.apache.spark.sql.catalyst.CatalystTypeConverters
              .convertToScala(v.value, v.dataType)
          def addLo(c: String, v: Any): Unit = {
            val (lo, hi) = bounds.getOrElse(c, (None, None))
            bounds(c) = (Some(lo.fold(v)(x => if (cmp(v, x) > 0) v else x)), hi)
          }
          def addHi(c: String, v: Any): Unit = {
            val (lo, hi) = bounds.getOrElse(c, (None, None))
            bounds(c) = (lo, Some(hi.fold(v)(x => if (cmp(v, x) < 0) v else x)))
          }
          splitConjunctivePredicates(cond).foreach {
            case GreaterThanOrEqual(a: AttributeReference, v: Literal)
                if v.value != null && owned(a) => addLo(a.name, sc(v))
            case GreaterThan(a: AttributeReference, v: Literal)
                if v.value != null && owned(a) => addLo(a.name, sc(v))
            case LessThanOrEqual(a: AttributeReference, v: Literal)
                if v.value != null && owned(a) => addHi(a.name, sc(v))
            case LessThan(a: AttributeReference, v: Literal)
                if v.value != null && owned(a) => addHi(a.name, sc(v))
            case GreaterThanOrEqual(v: Literal, a: AttributeReference)
                if v.value != null && owned(a) => addHi(a.name, sc(v))
            case GreaterThan(v: Literal, a: AttributeReference)
                if v.value != null && owned(a) => addHi(a.name, sc(v))
            case LessThanOrEqual(v: Literal, a: AttributeReference)
                if v.value != null && owned(a) => addLo(a.name, sc(v))
            case LessThan(v: Literal, a: AttributeReference)
                if v.value != null && owned(a) => addLo(a.name, sc(v))
            case EqualTo(a: AttributeReference, v: Literal)
                if v.value != null && owned(a) =>
              addLo(a.name, sc(v)); addHi(a.name, sc(v))
            case EqualTo(v: Literal, a: AttributeReference)
                if v.value != null && owned(a) =>
              addLo(a.name, sc(v)); addHi(a.name, sc(v))
            case _ => ()
          }
          if (bounds.isEmpty) f
          else {
            val mtime = fs.getFileStatus(statsPath).getModificationTime
            val rows = manifestRows(root.toString, mtime)
            // only bounds whose column the manifest actually tracks
            // can prune; none tracked → bail untouched
            val tracked = bounds.filter { case (c, _) =>
              rows.headOption.exists(_._2.contains(c)) }
            if (tracked.isEmpty) f
            else coveringNames(rows.map(_._1).toSet,
                r.location.inputFiles) match {
              case Some(current) =>
                val keepNames = rows.filter { case (name, stats) =>
                  current.contains(name) && tracked.forall { case (c, (lo, hi)) =>
                    stats.get(c).forall { case (mn, mx) =>
                      mn != null && mx != null &&
                        lo.forall(v => cmp(mx, v) >= 0) &&
                        hi.forall(v => cmp(mn, v) <= 0)
                    }
                  }
                }.map(_._1)
                if (keepNames.length < r.location.inputFiles.length) {
                  val keep = keepNames.sorted
                    .map(n => new org.apache.hadoop.fs.Path(root, n)).toSeq
                  val pruned = new PrunedFileIndex(spark, keep, r.dataSchema)
                  Filter(cond, l.copy(relation = r.copy(location = pruned)(spark)))
                } else f
              case None => f // stale manifest: keep the full listing
            }
          }
        }
    }
  }
}
