package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-posture assertions on physical plans: broadcasts where
  * intended, filter/column pushdown reaching the parquet scan
  * (SURVEY §4). A plan regression here is a 100 TB regression even
  * when sf0.001 results stay correct. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("suite-wide: no CartesianProduct outside the documented demo set") {
    // the whole-registry join-degeneracy guard: a refactor that turns
    // an equi-join into an unkeyed cross product anywhere in the 100
    // queries fails HERE by name, not in a 100 TB run. The suite
    // plans ZERO shuffle cartesians — no exceptions, not even the
    // quadratic demos (s1/d5/d4 pay their cost through a BROADCAST
    // nested loop or an exploded equi-join, never a shuffle cross).
    // BroadcastNestedLoop appears ONLY where a broadcast-small side
    // is the design: scalar count/vocab/bound cross joins
    // (q30/q34/t10/t13), the broadcast eval-digest array (t6), the
    // broadcast probe set (s1), the IVF/k-means family's broadcast
    // anchor tables, and t18's broadcast NB model scalars (the
    // 1-row vocab/doc-count and L-row label tables).
    val bnljOk = Set(
      "q30_funnel", "q34_histogram", "t6_contamination", "t10_lm",
      "t13_ppl_buckets", "s1_knn_brute", "s3_knn_ivf", "s4_kmeans",
      "s5_knn_pq", "s6_knn_pq_lsh", "s7_knn_ivf_mp", "s8_knn_ivf_mp_lsh",
      "s10_knn_rerank", "t18_nb_lang", "d25_bloom_decontam",
      "t17_tfidf", "t20_bm25", // 1-row N/Σdl scalar broadcasts (q34's shape)
      // index probes: the exact brute FALLBACK for probes sharing no
      // band nests against the broadcast anchor table (tiny) — the
      // same allowance as the inline s6/s8/s10 compositions
      "s11_index_probe", "s12_index_rerank",
      "s13_rrf_fusion", // composes s8's machinery incl. its fallback
      // r11: the nprobe'd PQ tail (probeCells' brute fallback + the
      // codebook broadcast), its served twin, the weighted fusion
      // (s13's allowance), and t21's 1-row cutpoint-array broadcast
      "s14_knn_rerank_np", "s15_index_rerank_np", "s16_rrf_weighted",
      "s21_hybrid_index", // composes s15's probe machinery verbatim
      "t21_ppl_buckets_sketch",
      // t22's 1-row bucket-total broadcast (q34's scalar shape): the
      // DSIR fit normalizes the ≤4096-row bucket table against the
      // single (nq, nt) totals row
      "t22_dsir",
      // q49's 1-row bloom-bitmap broadcast (the runtime filter IS a
      // broadcast scalar); q50's 1-row exact × 1-row estimate zips
      "q49_bloom_semijoin", "q50_join_card",
      // q51's 1-row total broadcast inside heavyKeys' frac filter
      "q51_skew_join",
      // q56's 1-row (Σcents, n) threshold broadcast (q34's shape)
      "q56_global_threshold_anti",
      // q53's bloom branch carries q49's 1-row bitmap broadcast (at
      // tiny SF the advisor picks broadcast and no BNLJ plans at all)
      "q53_advised_join",
      // q57 is q53 through committed stats — same branch allowances
      "q57_advised_stats",
      // q58's hot-key detection is q51's heavyKeys: the same 1-row
      // total broadcast inside the frac filter
      "q58_interval_skew",
      // s23 composes s7's ivfKnn verbatim (filtered corpus, same
      // broadcast-anchor assignment crossJoin); s24/s25 are s11's
      // probe machinery (soft-deleted copy / candIds filter)
      "s23_knn_filtered", "s24_index_soft_delete", "s25_index_filtered")
    val offenders = Registry.all.flatMap { q =>
      val p = q.run(spark, TestSpark.sf).queryExecution.executedPlan.toString
      val cart = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin") && !bnljOk(q.name)
      if (cart || bnlj) Some(s"${q.name}(cart=$cart)") else None
    }
    assert(offenders.isEmpty,
      s"unplanned cross products in: ${offenders.mkString(", ")}")
  }

  test("q2 dim joins are broadcast, not shuffled") {
    val p = plan("q2_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q6 predicate reaches the parquet scan") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("l_shipdate"))
    // pruned read: only the 4 needed columns in ReadSchema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"))
  }

  test("a4 projection prunes the blob column from the scan") {
    val p = plan("a4_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), "blob column must not be scanned")
  }

  test("a3 point lookup pushes the key predicate") {
    val p = plan("a3_point_lookup")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]") ||
      p.contains("EqualTo(o_orderkey,42)"))
  }

  test("s1 probes are broadcast (no shuffle of the corpus)") {
    val p = plan("s1_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q1 aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial + final aggregate")
  }

  test("q48 per-group top-k is a partial AGGREGATE, not a Window sort of every row") {
    val p = plan("q48_topk_group")
    // the typed Aggregator plans as ObjectHashAggregate with a
    // partial stage before the exchange — bounded k-row state per
    // group crosses the shuffle, never the sorted full group
    assert(p.contains("ObjectHashAggregate"),
      "expected the typed-Aggregator ObjectHashAggregate:\n" + p.take(1200))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "expected partial + final aggregate stages:\n" + p.take(1200))
    assert(!p.contains("Window"),
      "per-group top-k must not plan a Window over the orders:\n" + p.take(1200))
  }

  test("s3 IVF anchor assignment broadcasts the anchor table") {
    val p = plan("s3_knn_ivf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"),
      "anchor assignment must broadcast, never a shuffled cartesian")
  }

  test("s3 IVF argmax is a partial aggregate, not a window over the cross product") {
    val p = plan("s3_knn_ivf")
    // the nearest-anchor argmax must collapse map-side (groupBy+max_by):
    // a Window.partitionBy(vec_id) here would Exchange the exploded
    // |corpus|×|anchors| relation — the only Window allowed in this
    // plan is the final per-probe top-k.
    assert(p.contains("max_by"), p.take(1200))
    assert("windowspecdefinition".r.findAllIn(p).length == 1,
      "argmax must not be a Window over the anchor cross join:\n" + p.take(1200))
  }

  test("s5 PQ: encode argmax is map-side, scoring joins codes against a broadcast LUT") {
    val p = plan("s5_knn_pq")
    assert(!p.contains("CartesianProduct"),
      "assignment/encode must broadcast, never a shuffled cartesian")
    // two argmaxes (cell assignment + per-subspace encode) both as
    // max_by partial aggregates; the only Window is the final top-k
    assert("max_by".r.findAllIn(p).length >= 2, p.take(1200))
    assert("windowspecdefinition".r.findAllIn(p).length == 1,
      "argmaxes must not be Windows over exploded relations:\n" + p.take(1200))
    assert(p.contains("dotproduct"),
      "subspace scoring must use the fused native dot")
  }

  test("tokenized does not reshuffle an already-parallel input") {
    // earlier suites may have persisted the signature table for the
    // same logical plan; drop caches so the raw plan (not an
    // InMemoryRelation whose stored rendering carries its own
    // Exchange) is what gets inspected
    spark.sharedState.cacheManager.clearCache()
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val p = operators.Dedup.minhashSignatures(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // exactly the test's own repartition Exchange — the signature pass
    // itself must stay map-only on a wide input
    assert("Exchange".r.findAllIn(p).length == 1, p.take(800))
  }

  test("q28 range join is a banded equi-join, not a theta-join") {
    val p = plan("q28_rangejoin")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "range join must band into an equi-join at scale")
  }

  test("t5 top-terms aggregates partially before the shuffle") {
    val p = plan("t5_topterms")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "per-(group,term) counts must map-side combine before shuffling")
  }

  test("a11 keyset predicate reaches the parquet scan") {
    val p = plan("a11_keyset")
    assert(p.contains("GreaterThan(o_orderkey,40)"), p.take(800))
  }

  test("a12 STRING keyset predicate reaches the parquet scan") {
    val p = plan("a12_keyset_str")
    assert(p.contains("GreaterThan(c_name,Customer#000000040)"), p.take(800))
  }

  test("d7 computes the minhash signature pass exactly once (persisted)") {
    spark.sharedState.cacheManager.clearCache()
    val p = plan("d7_minhash_est")
    // all four signature consumers (two band-join sides, two
    // estimator-join sides) must read the persisted table. Every
    // InMemoryTableScan re-renders the cached subtree (and so its
    // FileScan), so the tell for a consumer BYPASSING the cache is a
    // FileScan count exceeding the InMemoryTableScan count.
    val cached = "InMemoryTableScan".r.findAllIn(p).length
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(cached >= 2, p.take(800))
    assert(scans <= cached,
      s"$scans file scans vs $cached cached reads — some consumer " +
        "recomputes the signature pass:\n" + p.take(1500))
  }

  test("d6 candidates come from LSH bands, not length blocking") {
    val p = plan("d6_dedup_apply")
    assert(!p.contains("n_chars"),
      "the skew-prone floor(n_chars/8) blocking key must be gone from d6:\n" +
        p.take(1200))
  }

  test("per-probe top-k prunes partially before the shuffle (WindowGroupLimit)") {
    val p = plan("s1_knn_brute")
    // row_number()<=k must push a partial group-limit below the
    // Exchange: each map task forwards at most k rows per probe
    // instead of shuffling every scored candidate
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      p.take(1200))
  }

  test("global top-k is TakeOrdered, not a full sort") {
    val p = plan("q3_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT must plan as a bounded per-partition heap:\n" +
        p.take(1200))
  }

  test("t6 contamination broadcasts the eval digest array — no train-side join shuffle") {
    val p = plan("t6_contamination")
    // the eval side collapses to one row and arrives by broadcast; the
    // train side must never sort-merge or hash-partition for the join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"), "train side must not shuffle for the join")
    assert(p.contains("sortedintersectcount"),
      "per-doc overlap must be the native fused intersect")
  }

  test("d10 stratified sample joins its rate table by broadcast and keeps pushdown") {
    val p = plan("d10_stratified")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"), "tiny rate table must broadcast")
  }

  test("d9 pair stage: no shuffle ever carries the document text") {
    // the final d9 plan reads localCheckpoint'ed labels and could
    // never show text; the property lives in the PAIR stage, so walk
    // that plan's exchanges directly: only ids/digests may shuffle
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val pairs = graft.operators.Dedup
      .verifiedPairs(docs, "doc_id", "text", 0.9, persist = false)
    pairs.collect() // materialize AQE's final stages
    def shuffles(p: SparkPlan): Seq[Seq[String]] = {
      val here = p match {
        case e: ShuffleExchangeLike => Seq(e.output.map(_.name).toSeq)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(shuffles)
    }
    val shuffled = shuffles(pairs.queryExecution.executedPlan).flatten
    assert(shuffled.nonEmpty, "expected at least one exchange in the pair stage")
    assert(!shuffled.exists(n => n == "text" || n == "__tk"),
      s"a shuffle carries document payloads: $shuffled")
  }

  test("d19 repeated-ngram rate: digests shuffle, documents never do; no cross product") {
    val p = plan("d19_dup_ngrams")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "digest-frequency join must be an equi-join on the digest:\n" + p.take(1200))
    // both aggregations are partial before their exchanges
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "digest-count and per-doc aggs must partial-aggregate:\n" + p.take(1200))
  }

  test("d20 containment verify: candidates from the band equi-join, native sorted-intersect") {
    val p = plan("d20_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "containment candidates must come from the LSH band equi-join:\n" + p.take(1200))
    assert(p.toLowerCase.contains("sortedintersectcount"),
      "verify must use the native two-pointer sorted-intersect:\n" + p.take(1200))
  }

  test("d22 semantic decontamination: eval bands broadcast, train never self-joined") {
    // pin the CONTAMINATION CHECK itself (semContaminatedIds): the
    // full d22 query then applies the drop set with one legitimate
    // anti-join shuffle, which is not this stage's concern
    import org.apache.spark.sql.functions.col
    val vecs = Tables.load(spark, TestSpark.sf, "embeddings")
    val cont = graft.operators.Similarity.semContaminatedIds(
      vecs.filter(col("vec_id") % 17 =!= 0),
      vecs.filter(col("vec_id") % 17 === 0),
      "vec_id", "embedding", 0.35,
      graft.operators.Similarity.corpusBits(vecs.count()))
    cont.collect()
    val p = cont.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "eval band table must broadcast into a hash join:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "train side must never shuffle for the contamination check:\n" + p.take(1200))
    assert(p.contains("cosinesimilarity"),
      "verification must use the native fused cosine")
  }

  test("d11 LSH near-dup candidates come from a band equi-join, never a cross product") {
    val p = plan("d11_embed_neardup_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "corpus self-join must be an equi-join on the (table, bucket) key:\n" +
        p.take(1200))
    assert(p.contains("cosinesimilarity"),
      "verification must use the native fused cosine")
  }

  test("d16 band candidates join broadcast-hash; only the exact fallback nests") {
    // the LSH-accelerated assignment must look like: banded centroid
    // table BROADCAST + hash join on (t, bkt); the sole nested-loop
    // allowed is the exact brute fallback against the (tiny, broadcast)
    // centroid table — a CartesianProduct anywhere means a vectors-side
    // blow-up snuck in. Pinned on the assignment plan itself (the
    // shipped query localCheckpoints it, which would hide the lineage).
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
    val p = operators.Similarity.kmeansAssignLsh(emb, "vec_id", "embedding",
      col("vec_id") % 125 === 0, iters = 2, bits = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "band candidate join must be broadcast-hash")
    assert(!p.contains("CartesianProduct"),
      "no non-broadcast cross product anywhere in the assignment")
    assert(p.contains("cosinesimilarity"),
      "assignment scoring must use the native fused cosine")
  }

  test("native cosine participates in whole-stage codegen") {
    val df = SparkEntry.queries("d5_embed_neardup")(spark, TestSpark.sf)
    df.collect() // materialise the AQE final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cosinesimilarity"))
    // codegen stages render as "*(n)" markers in the final plan
    assert(p.contains("*("), "expected whole-stage codegen stages")
  }

  test("d12 mix: rates broadcast back, corpus scanned exactly twice") {
    val p = plan("d12_mix")
    // pass 1 aggregates per-stratum totals, pass 2 applies the keep
    // rule; the rate table must arrive by broadcast (never shuffling
    // the corpus for the join), and the wsum window must not cost a
    // third scan of the corpus
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), "rate table must broadcast")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected exactly 2 corpus scans, got $scans:\n${p.take(1500)}")
  }

  test("q34 histogram: bounds broadcast, bucket agg is partial before the shuffle") {
    val p = plan("q34_histogram")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row bounds table must broadcast:\n" + p.take(1200))
    assert("HashAggregate".r.findAllIn(p).length >= 3,
      "bounds agg + partial/final bucket aggs expected:\n" + p.take(1200))
  }

  test("t9 PII scrub is a map-only scan stage (no join, no aggregate)") {
    val p = plan("t9_pii")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "redaction must not shuffle or aggregate:\n" + p.take(1200))
    // the only exchange is the output ORDER BY's range partitioning
    assert("Exchange".r.findAllIn(p).length <= 2, p.take(1200))
  }

  test("d13 semdedup: pair mining is a cell equi-join with the fused cosine") {
    val p = plan("d13_semdedup")
    // the k-means loop is materialized behind a localCheckpoint before
    // this plan; what remains must join on the cell key — never a
    // cartesian — and verify with the native codegen'd cosine
    assert(!p.contains("CartesianProduct"),
      "within-cell pairs must come from an equi-join on cell:\n" + p.take(1200))
    assert(p.contains("cosinesimilarity"),
      "pair verification must use the native fused cosine")
  }

  test("m6 phash: single scan, bit votes partially aggregated before the shuffle") {
    val p = plan("m6_phash")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"chunk grid + votes must come from ONE scan, got $scans")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial + final vote aggregation:\n" + p.take(1200))
  }

  test("t11 entropy: ONE token explode — totals come from a window, not a second pass") {
    val p = plan("t11_entropy")
    assert("Generate explode".r.findAllIn(p).length == 1,
      "per-doc totals must window over the aggregated type rows:\n" + p.take(1200))
  }

  test("s6 LSH coarse quantizer: band join broadcast-hash, no cartesian, native cosine") {
    // same contract as d16's assignment pin, on the single-pass
    // quantizer: banded anchors BROADCAST + hash join on (t, bkt);
    // the only nested-loop is the exact fallback against the tiny
    // anchor table; scoring is the fused native cosine
    val p = plan("s6_knn_pq_lsh")
    assert(p.contains("BroadcastHashJoin"),
      "band candidate join must be broadcast-hash")
    assert(!p.contains("CartesianProduct"),
      "no non-broadcast cross product anywhere in the s6 plan")
    assert(p.contains("cosinesimilarity"),
      "assignment scoring must use the native fused cosine")
  }

  test("s8 banded multi-probe: assignment joins broadcast-hash, no cartesian past the tiny fallback") {
    // the VERDICT-r7 contract: the recall knob must live on the
    // LINEAR quantizer — s8's corpus assignment AND probe cell-ranking
    // both come from the banded broadcast-hash join (the d16/s6
    // machinery); brute scoring exists only in the exact fallbacks
    // against the broadcast anchor table, never as a corpus-sized
    // CartesianProduct
    val p = plan("s8_knn_ivf_mp_lsh")
    assert(p.contains("BroadcastHashJoin"),
      "band candidate join must be broadcast-hash")
    assert(!p.contains("CartesianProduct"),
      "no non-broadcast cross product anywhere in the s8 plan")
    assert(p.contains("cosinesimilarity"),
      "assignment scoring must use the native fused cosine")
  }

  test("d17 sampleN: partial top-n runs before the stratum shuffle (WindowGroupLimit)") {
    val p = plan("d17_sample_n")
    // Partial + Final WindowGroupLimit: each input partition prunes to
    // its own top-n BEFORE the exchange, so the shuffle carries at most
    // n rows per (partition, stratum) — never the corpus
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      "expected partial+final WindowGroupLimit:\n" + p.take(1200))
  }

  test("t10 LM: bigram extraction is a codegen'd generate, vocab size broadcast") {
    val p = plan("t10_lm")
    // arrays_zip over pre-split slices — a Generate, NOT an HOF lambda
    // (zip_with/transform run interpreted: the §6 trap) and NOT a
    // positional self-join (which would shuffle the token stream)
    assert(p.contains("Generate explode"), p.take(1200))
    assert(!p.contains("zip_with") && !p.contains("lambdafunction"),
      "bigrams must not come from an interpreted HOF:\n" + p.take(1200))
    // V (one row) joins the score stage by broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    // bigram counts map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "expected partial+final aggregation for c12 and the per-doc sums")
  }

  test("d24 fuzzy join reads the fact table once (checkpointed domain)") {
    // the domain-first contract: everything downstream of the
    // distinct+count derives from the ONE materialized domain table —
    // the final plan re-scans no parquet (the unchecked form planned
    // SIX scans of the input)
    val p = plan("d24_fuzzy_join")
    assert(!p.contains("Scan parquet"),
      "fuzzy join must not re-scan the fact table:\n" + p.take(1200))
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      "candidate generation must be an equi-join on the token key")
  }

  test("q41 resample is one union + one window — no join at all") {
    val p = plan("q41_resample")
    assert(!p.contains("Join"),
      "LOCF must come from a window over interleaved marks, not an " +
        "as-of join per grid point:\n" + p.take(1200))
    assert(p.contains("Window"), p.take(600))
    assert(p.contains("Union"), p.take(600))
  }

  test("q45 as-of join plans NO join — union-interleave + per-key window") {
    // the as-of predicate has unbounded lookback: q28's banded
    // equi-join cannot express it and a theta-join is quadratic per
    // key; the shipped plan unions both sides and fills with one
    // running last() per key — one narrow shuffle, window partitions
    // bounded by per-key activity
    val p = plan("q45_asof_join")
    assert(!p.contains("Join"),
      "as-of must be the union-interleave window, not a join:\n" +
        p.take(1200))
    assert(p.contains("Window") && p.contains("Union"), p.take(800))
  }

  test("q40 pagerank rounds derive from checkpointed tables, equi-joins only") {
    val p = plan("q40_pagerank")
    assert(!p.contains("Scan parquet"),
      "iteration lineage must start at the checkpointed edge/degree " +
        "tables, not re-scan lineitem per round:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("t17 tfidf: N is an in-plan broadcast scalar — no mid-build corpus action") {
    // Building ANY parquet-backed query launches one footer job
    // (schema inference), so "zero jobs" is not the invariant —
    // "no MORE jobs than a query with no mid-build action" is: t16
    // loads the same single table and is pure column expressions,
    // making it the clean baseline. The r9 defect (a driver-side
    // docs.count() before the tf pass) costs exactly one extra job
    // and fails this pin.
    def buildJobs(name: String): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        SparkEntry.queries(name)(spark, TestSpark.sf)
        org.apache.spark.GraftTestBridge.drainListenerBus(spark.sparkContext)
        jobs.get
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val baseline = buildJobs("t16_gopher")
    val t17 = buildJobs("t17_tfidf")
    assert(t17 <= baseline,
      s"building t17 launched $t17 jobs vs the clean baseline's $baseline — " +
        "N must be an in-plan scalar aggregate, not a driver-side action")
    // plan shape: the tf pass + the column-pruned N aggregate (its
    // scan reads zero data columns — footer row counts only)
    val p = SparkEntry.queries("t17_tfidf")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"tf pass + pruned N agg = 2 scans, got $scans:\n" +
      p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row N aggregate must broadcast:\n" + p.take(1200))
  }

  test("suite-wide: no corpus-sized unpartitioned window outside the documented set") {
    // `WindowExec: No Partition Defined` = every row through ONE task.
    // t13's global ntile is the one documented corpus-sized case (its
    // input is narrow (id, score) rows, documented to ~1e9 docs); the
    // PQ family's seed-ranking window is bounded by construction (it
    // runs above a LIMIT codebookK = 64 rows). ANY other query
    // planning a global window fails here by name — a future operator
    // cannot silently introduce a single-task sort of the corpus.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(p: SparkPlan): Int = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here + kids.map(globalWindows).sum
    }
    // corpus-sized-by-design: t13 (global decile rank). Bounded-input
    // (allowed, but still pinned so growth is visible): the trained-PQ
    // queries' 64-row seed ranking (s5/s6/s10 — the window sits above
    // a LIMIT codebookK) and the weight-total windows of d12 and d30,
    // both over an already-aggregated |strata|-row table (PlanSpec's
    // own d12 pin covers the 2-scan shape; d30's temperatureMix is
    // the same bounded-input pattern at Sampling.temperatureMix).
    val corpusSized = Set("t13_ppl_buckets")
    val boundedInput = Set("s5_knn_pq", "s6_knn_pq_lsh", "s10_knn_rerank",
      "s14_knn_rerank_np", "d12_mix", "d30_temp_mix",
      // s21's lexical-rank window sits above the LIMIT-k BM25 index
      // read (20 rows by construction)
      "s21_hybrid_index")
    val offenders = Registry.all.flatMap { q =>
      val n = globalWindows(
        q.run(spark, TestSpark.sf).queryExecution.executedPlan)
      if (n > 0 && !corpusSized(q.name) && !boundedInput(q.name))
        Some(s"${q.name}($n)")
      else None
    }
    assert(offenders.isEmpty,
      "unpartitioned Window outside the documented set — a global sort " +
        s"of the corpus at 100 TB: ${offenders.mkString(", ")}")
  }

  test("suite-wide: shuffle budget — no query plans a runaway Exchange count") {
    // every hash/range Exchange is a corpus-sized shuffle at 100 TB;
    // a query quietly accumulating them (a lost broadcast hint, a
    // repartition snuck into a helper) is the regression this audit
    // exists to catch before a benchmark does. Budget = the measured
    // suite envelope + headroom; broadcast/reused exchanges are
    // exempt (dims and reuse are the point).
    val budget = 14
    // t21: the broadcast-cutpoint pipeline stacks narrow (id, score)
    // shuffles — 15 exchanges, every one score-row-sized (the point
    // of the t13 replacement); documented, not runaway
    val allowed = Map("t21_ppl_buckets_sketch" -> 16)
    val offenders = Registry.all.flatMap { q =>
      val p = q.run(spark, TestSpark.sf).queryExecution.executedPlan
        .toString
      val n = p.linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("BroadcastExchange") && !l.contains("ReusedExchange"))
      if (n > allowed.getOrElse(q.name, budget)) Some(s"${q.name}($n)")
      else None
    }
    assert(offenders.isEmpty,
      s"shuffle-heavy plans above the $budget-Exchange budget: " +
        offenders.mkString(", "))
  }

  test("q43 double-EXISTS is decorrelated: per-order partial agg, no correlated self-joins") {
    val p = plan("q43_multi_exists")
    // r17: the fact table feeds ONE derivation — the distinct-pair
    // aggregate; the per-order counts ride an unbounded window over
    // it (the old shape re-aggregated per order and joined back,
    // planning lineitem twice); a correlated EXISTS rewrite would
    // plan extra scans/self-joins of lineitem
    val liScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(liScans == 1, s"expected 1 lineitem scan, got $liScans:\n" +
      p.take(1200))
    assert(p.contains("Window"), "per-order counts must be window aggs")
    assert(p.contains("BroadcastHashJoin"), "supplier dim must broadcast")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the pair aggregate stays partial before its exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1200))
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be a TakeOrdered, not a global sort")
  }

  test("a15 merge: keys-only anti-join, payloads move once, no cross product") {
    val p = plan("a15_merge")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "survivor selection must be an equi-key anti-join:\n" + p.take(1200))
    // the gone-key set must reach the anti-join as KEYS (a plan
    // shuffling full payload rows for the key-set side would show a
    // wide exchange); cheap proxy: the anti-join is hash/sort-merge
    // on the key with aggregation below it only for distinct keys
    assert(p.contains("LeftAnti"), p.take(1200))
  }

  test("d28 rewrite cuts map-side: no posexplode of the token stream, no (id,pos) token join") {
    // the r10-VERDICT re-plan: dup windows aggregate to ONE
    // drop-interval row per affected doc; the cut is array
    // expressions over __tk after a doc-id join. The superseded form
    // posexploded EVERY token and re-keyed the corpus on (id, pos) —
    // |tokens| shuffled rows (measured 22.6s at sf10) vs |docs| +
    // |dup windows| here.
    val p = plan("d28_window_rewrite")
    assert(!p.contains("posexplode"),
      "token stream must never posexplode into a join:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // exactly the digest explode remains generate-shaped
    val gens = p.linesIterator.count(l => l.contains("Generate"))
    assert(gens <= 2, s"only the window-digest explode may generate " +
      s"rows, got $gens:\n" + p.take(1500))
  }

  test("t21 sketch deciles: no global rank — cutpoints broadcast, bucketing map-side") {
    // t13's documented 100 TB form: the global ntile (single-task
    // sort of the corpus) must be GONE; deciles come from a 1-row
    // approx_percentile aggregate broadcast back over the scored docs
    val p = plan("t21_ppl_buckets_sketch")
    // no Window operator ⇒ no ntile: the rank can only run inside one
    // (a textual "ntile(" probe would false-positive on
    // approx_percentile's own name)
    assert(!p.contains("Window"),
      "sketch variant must not rank:\n" + p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the 1-row cutpoint array must broadcast:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("d27 window-dup digests: partial aggs, no cross product, text never in an exchange") {
    val p = plan("d27_window_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "per-doc rollup must partial-aggregate:\n" + p.take(1200))
  }

  test("t19 CMS is relational: partial aggs + equi-join, no window, no dense state") {
    val p = plan("t19_cms_heavyhitters")
    assert(!p.contains("Window"),
      "estimates must come from the (row,pos) join + min agg:\n" + p.take(1200))
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "expected partial+final aggregation for tf and the counters")
    assert(p.contains("TakeOrderedAndProject"),
      "top-n must be a TakeOrdered, not a global sort")
  }
}
