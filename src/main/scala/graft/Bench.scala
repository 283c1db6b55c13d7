package graft
import scala.util.control.NonFatal
object Bench {
  /** Force FULL row production of the query's own plan.
    *
    * NOT `df.count()`: counting re-optimizes with `count(1)` on top,
    * and column pruning then DELETES every aggregate expression whose
    * value the count doesn't need — s4_kmeans under count() skips all
    * |corpus|×k assignment cosines (the entire workload) and timed
    * 3.2s where the honest run is ~7s at the 10x corpus; every
    * agg-output query was under-measured the same way. toRdd executes
    * the optimized plan exactly as the query defines it (AQE
    * included), producing every output row. */
  private def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()
  /** host 1-min loadavg — recorded in the artifact so round-over-round
    * comparisons can see the ambient band (external load inflated r13's
    * committed numbers ~1.2× and disentangling it took forensic work
    * over commit timestamps; now the artifact carries the evidence). */
  private def loadavg(): Double = {
    val v = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    math.floor(v * 100.0 + 0.5) / 100.0
  }
  def main(args: Array[String]): Unit = {
    val loadBefore = loadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.attach(GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    // schema-contract gate (footer-only, costs nothing): drift is one
    // named line here instead of a family of -1.0 sentinels below —
    // AND a "drift" count in the emitted JSON, so the artifact itself
    // records whether its inputs were on-contract (a drifted run must
    // not publish a clean-looking record readable only via stderr)
    val drift = Tables.checkContract(spark, sfDir)
    drift.foreach(d => System.err.println(s"[bench] SCHEMA DRIFT: $d"))
    // SPARK_GRAFT_BENCH_ONLY=d1_dedup_exact,s2_knn_lsh,... restricts
    // the suite — used for the family-only second-decade (sf10) scale
    // runs where materializing every table would be pure waste. The
    // driver's per-round bench never sets it, so the round artifact
    // stays the full suite.
    val onlyEnv = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // the three by-design quadratic teaching forms (each with a
    // shipped linear twin) are excluded from the default artifact so
    // the headline total contains only scale-shaped queries; they
    // stay oracle-checked in Verify, runnable here via
    // SPARK_GRAFT_BENCH_DEMOS=1 or an explicit BENCH_ONLY listing
    val demoKeys = Set("s1_knn_brute", "d4_ngram_jaccard", "d5_embed_neardup")
    val withDemos = sys.env.get("SPARK_GRAFT_BENCH_DEMOS").exists(_.nonEmpty)
    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyEnv match {
        case Some(set) => set.contains(n)
        case None => withDemos || !demoKeys(n)
      }}
    // pass 0 (untimed, tiny SF): whole-stage-codegen classes are
    // cached by generated source, which is identical across input
    // directories of the same schema — so compiling and JITing them
    // against the smallest sibling SF pushes ~100x less data through
    // the interpreted-execution phase. Random first-run C2/interpreter
    // storms (observed: 98-130s on a single query at sf0.1) are
    // bounded to the tiny corpus. Failures are logged, not swallowed:
    // a query that fails every run must be visible from the warmup.
    val tiny = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      .getPath
    if (sfDir != tiny && new java.io.File(tiny).isDirectory)
      suite.foreach { case (name, fn) =>
        try { force(fn(spark, tiny)) } catch {
          case NonFatal(e) => System.err.println(
            s"[bench] tiny-warmup $name failed: ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    // pass 1 (untimed, target SF): session init, parquet footers, and
    // residual plan/codegen/JIT one-time costs that would otherwise
    // land arbitrarily on whichever timed queries run first (the
    // alphabetically-first query absorbed ~6s of session warmup).
    suite.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)) } catch {
        case NonFatal(e) => System.err.println(
          s"[bench] warmup $name failed: ${e.getClass.getName}: ${e.getMessage}")
      }
      System.err.println(f"[bench] warmup $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // timed: best of 2 full passes, per query. A C2/JIT storm or GC
    // pause is a one-off event — it cannot hit the same query in both
    // passes, so min-of-2 reports engine steady-state rather than
    // whichever query the JVM chose to tax this run.
    // a pass records (time, succeeded): a throwing query must not
    // publish its (fast) failure time — min-of-2 would otherwise
    // PREFER the failure timing over the genuine run
    def timedPass(): Map[String, (Double, Boolean)] = {
      // cold-path discipline: the warm-up passes populate the SQL cache
      // (persisted minhash signature / shingle-digest tables), so
      // without this the timed d2/d6/d7 family would largely measure
      // cache READS. Dropping every cache entry before each pass makes
      // a pass measure one cold end-to-end run of the suite — within
      // the pass the dedup queries still share the once-per-run
      // persisted signatures, which is the documented pipeline shape.
      graft.operators.Dedup.releasePersisted(spark)
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      var i = 0
      suite.map { case (name, fn) =>
        // periodic GC lets the ContextCleaner reclaim broadcast/
        // shuffle/cache blocks from earlier queries; without it a late
        // heavy query can hit a fragmented heap and degrade 10-20x
        i += 1; if (i % 8 == 0) System.gc()
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true } catch {
          case NonFatal(e) =>
            System.err.println(
              s"[bench] timed $name failed: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
        name -> (((System.nanoTime() - t0) / 1e9, ok))
      }.toMap
    }
    val p1 = timedPass()
    val p2 = timedPass()
    // timings published at ms precision: full-precision doubles made
    // the single JSON line ~3.2KB and the driver's stdout tail
    // truncated it mid-map (BENCH_r06/r08 both shipped with "parsed":
    // null) — 3dp keeps every entry AND makes the headline total the
    // EXACT sum of the published per-query values
    def r3(v: Double): Double = math.floor(v * 1000.0 + 0.5) / 1000.0
    val results = suite.map { case (name, _) =>
      val good = Seq(p1(name), p2(name)).collect { case (t, true) => t }
      // both passes failed -> -1 marks the query broken in the artifact
      name -> (if (good.nonEmpty) r3(good.min) else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1.0 failure sentinels must not be summed into the headline
    // total (they'd UNDERSTATE it); publish the failure count instead
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    val nFailed = results.count(_._2 < 0)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,"drift":${drift.size},"loadavg_before":$loadBefore,"loadavg_after":${loadavg()},"queries":$qs,"sf":"$sfDir"}"""
    // The driver tails stdout, which truncated the r6 artifact to the
    // last ~10 per-query timings; the file copy is the complete record.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json"))
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
