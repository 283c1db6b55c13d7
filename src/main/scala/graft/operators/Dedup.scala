package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines
  * (SURVEY §2 C): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale posture (SURVEY §4): exact dedup shuffles 16-byte digests,
  * never documents; MinHash shuffles fixed-width signatures and
  * generates candidate pairs per LSH band bucket (work is
  * Σ|bucket|², bounded by band selectivity — never the all-pairs
  * |corpus|²); Jaccard verification runs only on blocked candidates.
  *
  * Engine-parity trick: a MinHash permutation is implemented as the
  * *lexicographic min of md5 hex digests* — md5 is identical in every
  * engine, so the oracle can reproduce signatures exactly (no
  * murmur3/xxhash divergence).
  */
object Dedup {

  val K = 16 // minhash signature length
  val BANDS = 4 // LSH bands (rows per band = K/BANDS = 4)

  /** Every DataFrame this object persists, keyed by session. SQL cache
    * entries are NOT reclaimed by the ContextCleaner (unlike raw RDD
    * blocks), so a long-lived session running dedup over many corpora
    * would otherwise accrete multi-TB signature/digest cache entries
    * until session end. [[releasePersisted]] is the release handle. */
  private val persisted =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.util.Set[DataFrame]]()

  /** contexts that already carry the end-of-application cleanup hook */
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.SparkContext]()

  private[operators] def registerPersisted(df: DataFrame): DataFrame = {
    // an abandoned session must not pin registry entries forever: every
    // registration first drops sessions whose context is gone, and the
    // context carries a listener that empties its sessions' entries on
    // application end (the CacheManager dies with the session; this
    // keeps the REGISTRY from outliving it and re-pinning plans)
    persisted.keySet.forEach { s =>
      if (s.sparkContext.isStopped) persisted.remove(s)
    }
    val sc = df.sparkSession.sparkContext
    if (hooked.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          persisted.keySet.forEach { s =>
            if (s.sparkContext eq sc) persisted.remove(s)
          }
          hooked.remove(sc)
        }
      })
    val set = persisted.computeIfAbsent(df.sparkSession,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]())
    set.add(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    df
  }

  /** registry entries currently held for `spark` (spec hook). */
  private[graft] def registeredCount(spark: SparkSession): Int = {
    val set = persisted.get(spark)
    if (set == null) 0 else set.size
  }

  /** Unpersist every signature/shingle-digest table this object cached
    * for `spark` (non-blocking) and drop the session from the registry
    * — call between corpora in a long-lived session. Returns the
    * number of entries released. Already-collected DataFrames
    * unpersist as a no-op. */
  def releasePersisted(spark: SparkSession): Int = {
    val set = persisted.remove(spark)
    if (set == null) 0
    else {
      var n = 0
      set.forEach { df => df.unpersist(false); n += 1 }
      n
    }
  }

  /** word n-gram shingles (default 3) over a pre-split TOKENS column;
    * sequence/element_at are 1-based inclusive. Docs with fewer than
    * n tokens produce ONE truncated shingle of the available tokens:
    * try_element_at yields NULL past the end (plain element_at throws
    * under ANSI mode) and concat_ws skips NULLs — the same semantics
    * as the native [[graft.functions.ShingleHash48]]/[[graft.functions.MinHashSig]]
    * loop and the DuckDB oracle's concat_ws form. Higher-order lambdas
    * run interpreted, so the tokens array MUST be a materialised
    * column: inlining `split(text)` into the lambda re-splits the
    * whole document per element — O(tokens²) per doc. */
  def shingleSql(tokCol: String, n: Int = 3): String =
    s"transform(sequence(1, greatest(size($tokCol) - ${n - 1}, 1)), " +
      s"i -> concat_ws(' ', " +
      (0 until n).map(o => s"try_element_at($tokCol, i + $o)").mkString(", ") +
      "))"

  /** project id + tokens, spread over all cores when the input is
    * narrow: the per-row shingle/hash work is CPU-heavy and a small
    * test corpus is one parquet file = one partition. The widen is
    * CONDITIONAL — a 100 TB input already has thousands of partitions,
    * and an unconditional repartition would full-shuffle every
    * document before any dedup work (pure overhead). The check reads
    * the STATIC plan's partitioning (`.rdd.getNumPartitions` is
    * pre-AQE): exact for the file scans the dedup entry points pass
    * in; a caller handing over a post-shuffle DataFrame that AQE will
    * coalesce below target should widen it explicitly. */
  private[graft] def tokenized(docs: DataFrame, id: String, text: String,
      extra: Seq[Column] = Nil): DataFrame = {
    val target = docs.sparkSession.sparkContext.defaultParallelism
    // a streaming DF has no .rdd to probe (and its micro-batch
    // parallelism is the source's concern) — pass it through unwidened
    val spread =
      if (!docs.isStreaming && docs.rdd.getNumPartitions < target)
        docs.repartition(target)
      else docs
    spread.select((col(id) +: extra) :+ split(col(text), " ").as("__tk"): _*)
  }

  /** Exact dedup: group by content digest, keep min id. */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text).cast("binary")).as("h"))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n"))

  /** MinHash signatures: K lexicographic-min md5s over shingles.
    * One native per-row expression — no explode, no shuffle: at any
    * scale this is a map-only stage (the old explode+groupBy form
    * shuffled |docs|x|shingles| rows). */
  def minhashSignatures(docs: DataFrame, id: String, text: String): DataFrame = {
    val sig = tokenized(docs, id, text)
      .select(col(id), graft.functions.TextHashes.minhash_sig(col("__tk")).as("sig"))
    sig.select(col(id) +:
      (0 until K).map(k => element_at(col("sig"), k + 1).as(s"h$k")): _*)
  }

  /** LSH band digests from a signature row. */
  def bands(sig: DataFrame, id: String): DataFrame = {
    val r = K / BANDS
    val bandCols = (0 until BANDS).map { j =>
      struct(lit(j).as("j"),
        md5(concat_ws("|", (0 until r).map(i => col(s"h${j * r + i}")): _*)
          .cast("binary")).as("b"))
    }
    sig.select(col(id), explode(array(bandCols: _*)).as("band"))
      .select(col(id), col("band.j").as("j"), col("band.b").as("b"))
  }

  /** Signatures persisted once per run: at 100 TB the map-only
    * signature pass (tokenize + shingle + K minhashes per document) is
    * the dominant scan, and every LSH consumer references it at least
    * twice (both sides of the band self-join; both sides of the
    * estimator join). Persisting the K-column signature table — a few
    * hundred bytes per doc, NOT the documents — means exactly one
    * signature computation per run. The entry lives in the session's
    * CacheManager until released: it is registered here and freed by
    * [[releasePersisted]] — a long-lived session running many corpora
    * calls that between corpora. For Verify/Bench the entries are few
    * and small, and the same plan re-persisting is a no-op ("already
    * cached"). */
  def persistedSignatures(docs: DataFrame, id: String, text: String): DataFrame =
    registerPersisted(minhashSignatures(docs, id, text))

  /** MinHash+LSH candidate near-dup pairs: self-join per band bucket. */
  def minhashCandidates(docs: DataFrame, id: String, text: String): DataFrame =
    bandCandidates(bands(persistedSignatures(docs, id, text), id), id)
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_bands"))

  /** distinct candidate pairs from a band table (d1 < d2). */
  private def bandCandidates(bs: DataFrame, id: String): DataFrame = {
    val a = bs.select(col(id).as("d1"), col("j"), col("b"))
    val b = bs.select(col(id).as("d2"), col("j"), col("b"))
    a.join(b, Seq("j", "b")).filter(col("d1") < col("d2"))
  }

  /** MinHash Jaccard ESTIMATE for the LSH candidate pairs: the
    * fraction of the K signature slots that agree — the classic
    * sketch estimator E[est] = J(a,b), so near-dup decisions can be
    * made from fixed-width signatures without touching shingle sets.
    * est = matches/16 is a dyadic rational: exact in double, no
    * rounding needed for engine parity. All four references to the
    * signature table (two band-join sides, two estimator-join sides)
    * read the one persisted copy — one signature scan per run. */
  def minhashEstimate(docs: DataFrame, id: String, text: String): DataFrame = {
    val sigs = persistedSignatures(docs, id, text)
    val cands = bandCandidates(bands(sigs, id), id)
      .select("d1", "d2").distinct()
    val sa = sigs.select(col(id).as("d1") +:
      (0 until K).map(k => col(s"h$k").as(s"a$k")): _*)
    val sb = sigs.select(col(id).as("d2") +:
      (0 until K).map(k => col(s"h$k").as(s"b$k")): _*)
    val matches = (0 until K)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    cands.join(sa, "d1").join(sb, "d2")
      .select(col("d1"), col("d2"), (matches * 1.0 / K).as("est"))
  }

  /** SimHash: 32-bit signature from per-token md5 bit-majorities
    * (8 hex digits × 4 bits), built from portable string/arithmetic
    * ops only. */
  def simhash(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokenized(docs, id, text)
      .select(col(id), explode(col("__tk")).as("w"))
    val digits = toks.select(col(id) +:
      (0 until 8).map(i =>
        expr(s"instr('0123456789abcdef', substr(md5(cast(w as binary)), ${i + 1}, 1)) - 1")
          .as(s"d$i")): _*)
    val sums = (0 until 32).map { b =>
      expr(s"sum(((d${b / 4} div ${1 << (b % 4)}) % 2) * 2 - 1)").as(s"s$b")
    }
    digits.groupBy(col(id)).agg(sums.head, sums.tail: _*)
      .select(col(id),
        (0 until 32).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
          .as("sig"))
  }

  /** 48-bit shingle digest from the first 12 md5 hex digits, decoded
    * with the portable instr-fold (identical in Spark and any SQL
    * oracle). Set ops on BIGINT arrays are ~10-20x cheaper than on
    * shingle strings — at 100 TB this is the difference between the
    * verify join being compute-bound or GC-bound. Collisions are
    * ~1e-9 per pair and, because both engines hash identically,
    * affect both sides of the oracle equally. */
  def shingleHashes(tokCol: String): Column = {
    val fold = (1 to 12)
      .map(i => s"cast(instr('0123456789abcdef', substr(h, $i, 1)) - 1 as bigint) * cast(${math.pow(16, 12 - i).toLong} as bigint)")
      .mkString(" + ")
    expr(s"transform(transform(${shingleSql(tokCol)}, s -> md5(cast(s as binary))), h -> $fold)")
  }

  /** Incremental ingest dedup: drop arriving docs that near-dup the
    * EXISTING corpus, using the corpus's persisted band table for
    * candidates and its persisted shingle-digest table for the exact
    * verify. The steady-state shape of continuous ingest at 100 TB:
    * the corpus is never rescanned — both corpus-side tables
    * (fixed-width digests, not documents) are maintained once, and
    * per-batch cost is O(|batch| signatures + matched buckets + the
    * verify join over matched candidates only).
    *
    * A band collision alone is NOT grounds to drop: 4 agreeing slots
    * of 16 happen at ~J⁴ per band, so boilerplate-sharing but
    * distinct documents would be silently lost at a few-per-thousand
    * rate. Every candidate is therefore verified at >=threshold exact
    * Jaccard, like the batch path ([[lshDuplicates]]).
    *
    * The batch is ALSO deduped against itself first ([[verifiedPairs]]
    * over the batch, min-id survivor per verified pair): without that
    * step, two near-dup docs arriving in the same batch would both
    * survive the corpus anti-join and both enter the corpus
    * permanently. The corpus check then runs only on intra-batch
    * survivors (a doc dropped by its batch sibling needs no corpus
    * verify).
    *
    * `corpusBands` = [[bands]] output (corpusIdCol, j, b);
    * `corpusSets` = [[shingleSets]] output (corpusIdCol, sh). */
  def incrementalDedup(corpusBands: DataFrame, corpusSets: DataFrame,
      corpusIdCol: String, batch0: DataFrame, id: String, text: String,
      threshold: Double = 0.9): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    // step 1: intra-batch self-dedup (greater id of each verified pair
    // drops — same one-pass dominance as lshDuplicates; per-batch
    // tables are not persisted, a batch is small relative to the corpus)
    val intraDrops = verifiedPairs(batch0, id, text, threshold, persist = false)
      .select(col("d2").as(id)).distinct()
    val batch = batch0.join(intraDrops, Seq(id), "left_anti")
    // step 2: survivors vs the EXISTING corpus
    val cand = bands(minhashSignatures(batch, id, text), id)
      .select(col(id).as("__bid"), col("j"), col("b"))
      .join(corpusBands.select(col(corpusIdCol).as("__cid"), col("j"), col("b")),
        Seq("j", "b"))
      .select("__bid", "__cid").distinct()
    val bs = shingleSets(batch, id, text)
      .select(col(id).as("__bid"), col("sh").as("sh1"))
    val cs = corpusSets.select(col(corpusIdCol).as("__cid"), col("sh").as("sh2"))
    val drops = cand.join(bs, "__bid").join(cs, "__cid")
      .withColumn("ic", sorted_intersect_count(col("sh1"), col("sh2")))
      .filter((floor((col("ic") * 1.0 /
        (size(col("sh1")) + size(col("sh2")) - col("ic"))) * 10000.0 + 0.5) /
        10000.0) >= threshold)
      .select(col("__bid").as(id)).distinct()
    batch.join(drops, Seq(id), "left_anti")
  }

  /** Sorted distinct 48-bit shingle-digest set per doc — the
    * exact-verify side of near-dup detection (one fused two-pointer
    * merge per candidate pair, no per-pair hash sets). */
  def shingleSets(docs: DataFrame, id: String, text: String,
      extra: Seq[Column] = Nil): DataFrame =
    tokenized(docs, id, text, extra).select((col(id) +: extra) :+
      array_sort(array_distinct(
        graft.functions.TextHashes.shingle_hash48(col("__tk")))).as("sh"): _*)

  /** Duplicate ids at >=threshold Jaccard, with candidate pairs from
    * the MinHash-LSH band buckets — the scale path for near-dup
    * REMOVAL. LSH buckets are selective by SIMILARITY (a pair
    * colliding in any band is likely similar), so Σ|bucket|² stays
    * bounded on real corpora; blocking by document length is not
    * (length distributions are heavily peaked — see [[ngramJaccard]]'s
    * demo caveat). Each candidate is then verified by exact Jaccard
    * over the 48-bit shingle digests; the greater id of every
    * verified pair is reported as a drop (standard one-pass min-id
    * dominance; full connected components is an iterative job). */
  def lshDuplicates(docs: DataFrame, id: String, text: String,
      threshold: Double): DataFrame =
    verifiedPairs(docs, id, text, threshold)
      .select(col("d2").as("dup_id")).distinct()

  /** Verified near-dup pairs (d1 < d2) at >=threshold exact Jaccard,
    * candidates from the MinHash-LSH band buckets — the shared core of
    * [[lshDuplicates]], [[connectedComponents]]-based clustering, and
    * the intra-batch step of [[incrementalDedup]]. `persist=true`
    * (default, corpus-scale path) registers the signature and
    * shingle-digest tables in the session cache so both verify-join
    * sides read one computed copy; per-batch callers pass false — a
    * small batch's tables are cheaper to recompute than to churn
    * through the CacheManager. */
  def verifiedPairs(docs: DataFrame, id: String, text: String,
      threshold: Double, persist: Boolean = true): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val sigs =
      if (persist) persistedSignatures(docs, id, text)
      else minhashSignatures(docs, id, text)
    val cands = bandCandidates(bands(sigs, id), id).select("d1", "d2").distinct()
    // persisted like the signatures: both verify-join sides read the
    // one computed copy instead of re-tokenizing the corpus (disk
    // spill is fine — the digest table is ~8 bytes/shingle; at true
    // scale this is the digest table a pipeline materializes once);
    // registered for release via releasePersisted
    val sets0 = shingleSets(docs, id, text)
    val sets = if (persist) registerPersisted(sets0) else sets0
    cands.join(sets.select(col(id).as("d1"), col("sh").as("sh1")), "d1")
      .join(sets.select(col(id).as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("ic", sorted_intersect_count(col("sh1"), col("sh2")))
      .filter((floor((col("ic") * 1.0 /
        (size(col("sh1")) + size(col("sh2")) - col("ic"))) * 10000.0 + 0.5) /
        10000.0) >= threshold)
      .select("d1", "d2")
  }

  /** Connected components over an undirected pair graph via iterative
    * min-label propagation to fixpoint: every node starts as its own
    * component, and each round adopts the min of its own and its
    * neighbours' labels. Converges in O(component diameter) rounds —
    * near-dup clusters are shallow (dup chains, not paths), so
    * real corpora converge in a handful of rounds; `maxIters` is a
    * runaway bound, not an accuracy knob (the loop exits as soon as a
    * round changes nothing). Each round is one shuffle join + a
    * partial-agg min over (node, label) pairs — never document
    * payloads — and labels are localCheckpoint'ed per round so the
    * plan/lineage stays O(1) instead of growing per iteration (at
    * cluster scale with lossy executors, swap for a reliable
    * checkpoint dir). Returns (node, comp) where comp = min id of the
    * node's component. */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
      maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("node")).agg(min("comp").as("nbr"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"),
          (col("nbr") < col("comp")).as("__moved"))
        .localCheckpoint(true)
      changed = next.filter(col("__moved")).count()
      labels = next.drop("__moved")
      i += 1
    }
    edges.unpersist(false)
    labels
  }

  /** Cluster-representative selection — the KEEP side of fuzzy dedup
    * (the RefinedWeb/C4 shape): instead of dropping the greater id of
    * every near-dup pair, group the corpus into duplicate CLUSTERS
    * ([[verifiedPairs]] → [[connectedComponents]]) and keep each
    * cluster's highest-QUALITY member (ties → min id), so the best
    * copy survives — a min-id drop rule deletes the clean original
    * whenever a lower-id boilerplate twin exists. `scores` is any
    * (id, score) table (t2's quality signal in the shipped query; a
    * model score in production).
    *
    * Scale shape: everything heavy is the already-linear candidate
    * machinery; the selection itself is one partial-agg max_by over
    * (comp, score) pairs — no window sort over members, no document
    * payloads past the pair stage. Returns one row per multi-member
    * cluster: (comp, keeper, n_members). Singletons never enter the
    * pair graph and are implicitly kept — emitting them would just
    * re-list the corpus. */
  /** keeper per component: highest (coalesced) score, ties → MIN
    * node. min_by over (-score, node) rather than max_by over
    * (score, -node): negating the NODE would cast a string id to
    * double (NULL — the tie-break silently vanishes and the keeper
    * becomes partitioning-dependent); negating the SCORE is always a
    * double. LEFT join + -Inf coalesce: a member the score table
    * missed still COUNTS (n_members must be the true cluster size)
    * and loses to any scored member; an all-unscored cluster falls
    * back to the min id. The ONE keeper rule —
    * [[clusterRepresentatives]] and Curation's keepBestQuality both
    * call this, so the two cannot drift. */
  def componentKeepers(cc: DataFrame, scores: DataFrame,
      scoreId: String): DataFrame =
    cc.join(scores.select(col(scoreId).as("node"), col("score")),
        Seq("node"), "left_outer")
      .groupBy(col("comp"))
      .agg(
        min_by(col("node"),
          struct((-coalesce(col("score"), lit(Double.NegativeInfinity)))
            .as("ns"), col("node"))).as("keeper"),
        count(lit(1)).as("n_members"))

  def clusterRepresentatives(docs: DataFrame, id: String, text: String,
      scores: DataFrame, threshold: Double = 0.9): DataFrame = {
    val pairs = verifiedPairs(docs, id, text, threshold)
    val cc = connectedComponents(pairs, "d1", "d2")
    componentKeepers(cc, scores, id)
  }

  /** n-gram Jaccard on length-blocked candidate pairs: docs within
    * ±8 chars meet via a banded equi-join (each right row explodes to
    * 3 neighbor keys — no range-join cartesian). Length blocking is a
    * DEMO of banded blocking — at 100 TB length distributions are
    * modal and Σ|bucket|² explodes; the scale path for dedup-apply is
    * [[lshDuplicates]] (similarity-selective LSH candidates). */
  def ngramJaccard(docs: DataFrame, id: String, text: String, lenCol: String,
      threshold: Double = 0.5): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    // sorted+distinct digests once per doc; each candidate pair is
    // then a single fused two-pointer merge (no per-pair hash sets)
    val base = tokenized(docs, id, text, Seq(col(lenCol)))
      .select(col(id), col(lenCol).as("nc"),
        array_sort(array_distinct(
          graft.functions.TextHashes.shingle_hash48(col("__tk")))).as("sh"),
        floor(col(lenCol) / 8).as("k"))
    val left = base.select(col(id).as("d1"), col("nc").as("nc1"),
      col("sh").as("sh1"), col("k"))
    val right = base.select(col(id).as("d2"), col("nc").as("nc2"),
      col("sh").as("sh2"),
      explode(array(col("k") - 1, col("k"), col("k") + 1)).as("k"))
    left.join(right, Seq("k"))
      .filter(col("d1") < col("d2") && abs(col("nc1") - col("nc2")) <= 8)
      .withColumn("ic", sorted_intersect_count(col("sh1"), col("sh2")))
      // arithmetic 4dp rounding (no BigDecimal in the per-pair loop);
      // output stays DOUBLE — decimal stringification is
      // reader-dependent and breaks hash comparison
      .select(col("d1"), col("d2"),
        (floor((col("ic") * 1.0 /
          (size(col("sh1")) + size(col("sh2")) - col("ic"))) * 10000.0 + 0.5) /
          10000.0).as("jr"))
      .filter(col("jr") >= threshold)
      .select(col("d1"), col("d2"), col("jr").as("jacc"))
  }

  /** Cross-document SPAN-level dedup (the CCNet/RefinedWeb
    * paragraph-dedup shape, on a corpus whose "paragraphs" are
    * fixed `span`-token blocks): every document is cut into
    * non-overlapping spans, each span keyed by a 48-bit content
    * digest, and only the globally FIRST occurrence of each digest
    * ((doc_id, span_idx) order — the deterministic keep rule) is
    * retained; later copies are the boilerplate/quote duplication
    * doc-level dedup ([[exact]], [[lshDuplicates]]) cannot see,
    * because the containing documents differ. Returns per-doc
    * retention stats: span/token counts kept vs total — the rewrite
    * decision a curation pass applies.
    *
    * Scale shape: span digests are a map-only explode of the
    * pre-split token array (≤ n_tok/span narrow rows per doc); the
    * only shuffle carries (digest, doc_id, span_idx, span_len) — 32
    * bytes per span, never text. The first-occurrence pick is a
    * window over the digest key whose partitions are duplicate
    * chains (bounded by duplication depth, not corpus size — the
    * same reasoning as d18's keeper pick); the final per-doc rollup
    * is one partial agg. At 100 TB nothing wide ever moves. */
  def spanDedup(docs: DataFrame, id: String, text: String,
      span: Int = 16): DataFrame = {
    val spans = tokenized(docs, id, text)
      .select(col(id), col("__tk"), size(col("__tk")).as("n_tok"))
      .select(col(id), col("__tk"), col("n_tok"),
        explode(sequence(lit(0),
          ceil(col("n_tok") / (span * 1.0)).cast("int") - 1)).as("sp"))
      .select(col(id), col("n_tok"), col("sp"),
        least(lit(span), col("n_tok") - col("sp") * span).as("span_len"),
        expr(graft.queries.Text.fold48(
          s"md5(cast(array_join(slice(__tk, sp * $span + 1, $span), ' ') as binary))"))
          .as("dig"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dig")).orderBy(col(id), col("sp"))
    spans.withColumn("rn", row_number().over(w))
      .groupBy(col(id))
      .agg(max(col("n_tok")).cast("long").as("n_tok"),
        count(lit(1)).as("n_spans"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_spans"),
        sum(when(col("rn") === 1, col("span_len")).otherwise(0L))
          .as("kept_tokens"))
  }

  /** OVERLAPPING-window exact-substring duplication — the Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models
    * Better") window form of [[spanDedup]]: every `w`-token window
    * at `stride`-token steps is keyed by a 48-bit digest, and a
    * window is DUPLICATED when an identical window occurs EARLIER in
    * the corpus ((doc_id, start) order — d23's first-occurrence
    * rule). d23's non-overlapping aligned spans MISS a duplicated
    * run that straddles a span boundary: each containing span
    * differs by its non-duplicated remainder, so neither span
    * matches anything. Overlapping windows close that gap with a
    * hard guarantee: at stride s, ANY duplicated run of
    * ≥ w + s − 1 tokens contains at least one aligned identical
    * window pair — stride 1 gives the paper's exact ≥ w-token
    * guarantee at w× d23's digest rows. Docs shorter than w emit one
    * whole-doc window (short exact duplicates still collide).
    *
    * Returns per-doc (n_tok, n_windows, dup_windows) — the
    * window-granular drop/rewrite signal.
    *
    * Scale shape: digest rows are a map-only explode — ~n_tok/stride
    * NARROW rows per doc ((digest, doc, start) = 24 bytes; text
    * never leaves its scan); `stride` is the cost lever (stride s
    * divides rows by s and weakens the guarantee to w+s−1). The
    * first-occurrence window partitions on the digest — bounded by
    * duplication depth, never corpus size (d23's argument); the
    * rollup is one partial agg. */
  def windowDupStats(docs: DataFrame, id: String, text: String,
      w: Int = 16, stride: Int = 1): DataFrame = {
    val spans = windowDigests(docs, id, text, w, stride)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dig")).orderBy(col(id), col("st"))
    spans.withColumn("rn", row_number().over(win))
      .groupBy(col(id))
      .agg(max(col("n_tok")).cast("long").as("n_tok"),
        count(lit(1)).as("n_windows"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("dup_windows"))
  }

  /** the ONE overlapping-window digest definition every window-dedup
    * consumer shares ([[windowDupStats]], [[windowDedupRewrite]], and
    * the continuous-ingest loop in StreamingSpec): (id, n_tok, st,
    * dig) — one 48-bit digest per w-token window at `stride` steps,
    * whole-doc window for docs shorter than w. Map-only.
    *
    * NULL-text docs emit NO window (n_tok >= 1 required before the
    * explode): without the guard, `greatest(NULL − w, 0) = 0` (Spark
    * greatest skips NULLs) manufactures one whole-doc window whose
    * digest is NULL, and the digest window then groups ALL NULL-text
    * docs together — the second NULL doc would count as a duplicated
    * window and window_dup_filter would drop it as boilerplate. The
    * oracle's `range(...)` over NULL emits zero rows; so do we. */
  private[graft] def windowDigests(docs: DataFrame, id: String,
      text: String, w: Int, stride: Int): DataFrame =
    tokenized(docs, id, text)
      .select(col(id), col("__tk"), size(col("__tk")).as("n_tok"))
      .filter(col("n_tok") >= 1)
      .select(col(id), col("__tk"), col("n_tok"),
        explode(sequence(lit(0),
          floor(greatest(col("n_tok") - w, lit(0)) / stride).cast("int")))
          .as("wi"))
      .select(col(id), col("n_tok"), (col("wi") * stride).as("st"),
        expr(graft.queries.Text.fold48(
          s"md5(cast(array_join(slice(__tk, wi * $stride + 1, $w), ' ') as binary))"))
          .as("dig"))

  /** The APPLY side of [[windowDupStats]] — Lee et al.'s actual cut:
    * REWRITE each document dropping exactly the tokens covered by
    * its LATER-occurrence duplicated windows (first-occurrence keep,
    * so a passage's first carrier is never cut), keeping everything
    * else in original order. Because windows overlap at stride 1,
    * the dropped set is the token-interval UNION of the dup windows
    * — i.e. precisely the duplicated run itself, wherever it sits
    * relative to span boundaries (the straddle d26's aligned spans
    * cannot cut exactly; the spec pins a 20-token straddle whose
    * rewrite removes exactly those 20 tokens).
    *
    * Scale shape (the r10-VERDICT re-plan): dup windows — rows
    * proportional to DUPLICATED MASS, never the corpus — aggregate
    * into ONE sorted drop-interval array per affected doc; that
    * single row joins the tokenized base on the doc id, and the cut
    * happens MAP-SIDE with array expressions over `__tk` (merge
    * overlapping intervals, slice out the complement ranges, join
    * with spaces). Nothing token-shaped ever shuffles: the previous
    * form posexploded the FULL token stream and re-keyed the whole
    * corpus per token through a (id, pos) join + collect_list
    * (measured 22.6s / r=4.9 at sf10 — the heaviest dedup op);
    * here the only corpus-sized movement is the digest explode
    * windowDigests already pays. Per-doc work is O(n_tok + |iv|):
    * intervals merge in one sorted fold, the complement slices copy
    * each kept token once. Total: NULL-text docs report 0/'' — a
    * judged row for every input. */
  def windowDedupRewrite(docs: DataFrame, id: String, text: String,
      w: Int = 16, stride: Int = 1): DataFrame = {
    val base = tokenized(docs, id, text)
      .select(col(id), col("__tk"), size(col("__tk")).as("n_tok"))
    val spans = windowDigests(docs, id, text, w, stride)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dig")).orderBy(col(id), col("st"))
    // one narrow row per doc WITH dup windows: its sorted (lo, hi)
    // drop intervals (clamped to n_tok; sorting key is lo — struct
    // order — so the merge fold below sees a sweep line)
    val dropIv = spans.withColumn("rn", row_number().over(win))
      .filter(col("rn") > 1)
      .groupBy(col(id))
      .agg(array_sort(collect_list(struct((col("st") + 1).as("lo"),
        least(col("st") + w, col("n_tok")).as("hi")))).as("iv0"))
    // MAP-SIDE cut over the one joined interval row:
    //  iv   — overlapping/adjacent intervals merged by a sorted fold
    //  kept — complement ranges of iv within [1, n_tok], sliced out
    //         of __tk and rejoined in original order
    val merged = expr("""
      aggregate(iv0, cast(array() as array<struct<lo:int,hi:int>>),
        (acc, x) -> CASE
          WHEN size(acc) = 0 OR x.lo > element_at(acc, -1).hi + 1
            THEN concat(acc, array(x))
          ELSE concat(slice(acc, 1, size(acc) - 1),
            array(named_struct('lo', element_at(acc, -1).lo,
              'hi', greatest(element_at(acc, -1).hi, x.hi))))
        END)""")
    val out = base.join(dropIv, Seq(id), "left_outer")
      .withColumn("iv", coalesce(merged,
        expr("cast(array() as array<struct<lo:int,hi:int>>)")))
      .withColumn("dropped",
        expr("aggregate(iv, 0L, (a, r) -> a + r.hi - r.lo + 1)"))
      .select(col(id), col("n_tok").cast("long").as("n_tok"),
        (col("n_tok") - col("dropped")).as("kept_tokens"),
        expr("""
          array_join(flatten(transform(
            filter(zip_with(
                concat(array(1), transform(iv, r -> r.hi + 1)),
                concat(transform(iv, r -> r.lo - 1), array(n_tok)),
                (s, e) -> named_struct('s', s, 'e', e)),
              se -> se.s <= se.e),
            se -> slice(__tk, se.s, se.e - se.s + 1))), ' ')""")
          .as("text_kept"))
    // total over the input: a NULL-text doc never enters the digest
    // path (windowDigests' n_tok guard) and its base row carries NULL
    // n_tok — both coalesce to the 0/'' judged row here
    out.select(col(id),
      coalesce(col("n_tok"), lit(0L)).as("n_tok"),
      coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
      coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** The APPLY side of [[spanDedup]]: REWRITE each document keeping
    * only its globally-first-occurrence spans — the curation action
    * the d23 stats justify (CCNet/RefinedWeb drop repeated
    * paragraphs from later documents rather than dropping the
    * documents). Same digest/window machinery as [[spanDedup]]; the
    * kept spans reassemble IN ORIGINAL ORDER via a per-doc sorted
    * struct collect (the per-group array is ≤ n_tok/span slices of
    * one document — bounded by document length, never by corpus).
    * Output is TOTAL: a doc whose every span was seen earlier
    * rewrites to the empty string, and a NULL-text doc reports
    * n_tok=0 with an empty rewrite — downstream stages must see a
    * judged row for every input. */
  def spanDedupRewrite(docs: DataFrame, id: String, text: String,
      span: Int = 16): DataFrame = {
    val spans = tokenized(docs, id, text)
      .select(col(id), col("__tk"), size(col("__tk")).as("n_tok"))
      .select(col(id), col("__tk"), col("n_tok"),
        explode(sequence(lit(0),
          ceil(col("n_tok") / (span * 1.0)).cast("int") - 1)).as("sp"))
      .select(col(id), col("n_tok"), col("sp"),
        least(lit(span), col("n_tok") - col("sp") * span).as("span_len"),
        expr(s"array_join(slice(__tk, sp * $span + 1, $span), ' ')")
          .as("sp_text"),
        expr(graft.queries.Text.fold48(
          s"md5(cast(array_join(slice(__tk, sp * $span + 1, $span), ' ') as binary))"))
          .as("dig"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dig")).orderBy(col(id), col("sp"))
    val agg = spans.withColumn("rn", row_number().over(w))
      .groupBy(col(id))
      .agg(max(col("n_tok")).cast("long").as("n_tok"),
        sum(when(col("rn") === 1, col("span_len")).otherwise(0L))
          .as("kept_tokens"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN rn = 1 THEN struct(sp, sp_text) END)), x -> x.sp_text)"))
          .as("text_kept"))
    docs.select(col(id)).join(agg, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Token-blocked edit-distance FUZZY JOIN over a string-valued
    * column (entity resolution: near-identical product names,
    * author variants, typo'd domains). Returns every unordered pair
    * of DISTINCT values within Levenshtein `tau`, weighted by each
    * value's fact-table multiplicity — the merge decision + blast
    * radius an ER pass consumes.
    *
    * Scale shape: the ONLY pass over the fact table is the
    * distinct+count aggregation — value domains grow sublinearly
    * with row count (the Heaps-law argument the BPE vocab uses), so
    * everything after operates on the much smaller domain table.
    * Candidates come from TOKEN BLOCKING (pairs sharing ≥1 blocking
    * token, an equi-join on the token key — never all-pairs);
    * tokens occurring in more than `maxTokenNames` distinct values
    * are EXCLUDED from blocking (the stop-frame rule — m8: one
    * pervasive token, e.g. a unit suffix in every product name,
    * would otherwise make one block quadratic in the domain).
    * The exact Levenshtein filter runs only on blocked candidates.
    *
    * Token blocking is a RECALL choice, not an approximation the
    * caller can't see: a pair within `tau` whose every shared token
    * was edited (or stop-capped) is missed — the classic
    * prefix/partition-filter tradeoff (PassJoin's pigeonhole
    * segments are the guaranteed-complete production alternative;
    * same family as m7's pigeonhole bands). The oracle mirrors the
    * blocking, so what ships is exactly what's checked. */
  def fuzzyPairs(rows: DataFrame, valueCol: String, tau: Int = 3,
      maxTokenNames: Long = 32): DataFrame = {
    // the domain table is materialized ONCE (it is small by the
    // Heaps-law premise): without this, the token explode, the
    // stop-token filter, and the two weight joins each re-derive it
    // — six fact-table scans in the plan where one pass suffices
    // (measured: the unchecked form planned 6 parquet scans of the
    // input at the gate SF)
    val names = rows.groupBy(col(valueCol).as("nm"))
      .agg(count(lit(1)).as("n_rows"))
      .localCheckpoint(true)
    // per-name DISTINCT tokens, so the stop cap below counts the
    // distinct VALUES containing a token (its documented contract) —
    // a value repeating a token ("green green widget") must not push
    // that token over the cap
    val tok = names.select(col("nm"),
      explode(array_distinct(split(col("nm"), " "))).as("w"))
    val blockable = tok.groupBy(col("w")).agg(count(lit(1)).as("nn"))
      .filter(col("nn") <= maxTokenNames).select(col("w"))
    val blk = tok.join(blockable, Seq("w"))
    val cand = blk.as("a").join(blk.as("b"),
        col("a.w") === col("b.w") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"))
      .distinct()
    val pairs = cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= tau)
    pairs
      .join(names.select(col("nm").as("name_a"), col("n_rows").as("n_a")),
        Seq("name_a"))
      .join(names.select(col("nm").as("name_b"), col("n_rows").as("n_b")),
        Seq("name_b"))
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }
}
