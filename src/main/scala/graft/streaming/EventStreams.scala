package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators
  * (SURVEY §2 D). Batch q16/q18 are the oracle-checked equivalents;
  * these run the same semantics incrementally with watermarked state.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(sid: Long, lastSec: Long, nEvents: Long, startSec: Long)

  case class SessionOut(user_id: Long, sid: Long, n_events: Long,
      start_s: Long, end_s: Long)

  case class LatestOut(user_id: Long, event_type: String, event_id: Long,
      ts: java.sql.Timestamp, value: Double)

  /** Streaming latest-event-per-key — batch q37's CDC read as
    * incremental state: one state row per (user, event_type) holding
    * the current latest event (max by (ts, event_id), the same
    * ordering rule as q37's window); each micro-batch emits the new
    * latest for every key it touched (Update-mode sink). State is one
    * fixed-width row per key — the log-compaction memory shape, no
    * watermark needed because the state never grows past key
    * cardinality. StreamingSpec pins final emitted state ≡ batch q37
    * on the real events table. */
  def latestPerKey(events: Dataset[Event]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[LatestOut, LatestOut](GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[LatestOut]) =>
          val newest = (rows.map(e =>
            LatestOut(e.user_id, e.event_type, e.event_id, e.ts, e.value))
            ++ state.getOption.iterator)
            .maxBy(o => (o.ts.getTime, o.event_id))
          state.update(newest)
          newest
      }
  }

  case class AsOfIn(k: Long, ts: Long, side: Int, id: Long, payload: Double)

  case class AsOfState(ts: Long, id: Long, payload: Double)

  case class AsOfOut(k: Long, id: Long, ts: Long,
      m_id: Option[Long], m_ts: Option[Long], m_payload: Option[Double])

  /** Stream-stream AS-OF enrichment — q45's operator
    * ([[graft.operators.AsOf.asofJoin]]) as continuous state: both
    * sides arrive as ONE keyed stream (`side` 0 = right/reference,
    * 1 = left/probe — the caller unions its two sources, the
    * streaming twin of the batch union-interleave), and each left
    * row is answered with the latest right payload AT OR BEFORE its
    * event time among rows seen so far. State is ONE fixed-width row
    * per key (the newest right seen — [[latestPerKey]]'s
    * log-compaction shape, no watermark needed, never grows past key
    * cardinality).
    *
    * SEMANTICS UNDER DISORDER, stated honestly: within a micro-batch
    * rows are processed in (ts, side, id) order — right-before-left
    * at equal ts, exactly the batch frame rule — so an event-ordered
    * feed reproduces the batch as-of join row for row (StreamingSpec
    * pins it on the real events table). ACROSS batches the state
    * only ever advances (a late right row older than the stored
    * state cannot regress it — monotone, deterministic), so a left
    * row arriving before the right row it would have matched in
    * batch is answered with the best value KNOWN at processing time
    * — the standard streaming-enrichment contract; a deployment
    * needing exact event-time as-of under unbounded disorder runs
    * the batch operator over the closed table. Ties on (key, ts) on
    * the right pick the max id — the same tiebreak as the batch
    * operator's max_by / the oracle's arg_max. */
  def asofEnrich(in: Dataset[AsOfIn]): Dataset[AsOfOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.k)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k, rows, state: GroupState[AsOfState]) =>
          val out = scala.collection.mutable.ArrayBuffer[AsOfOut]()
          var st = state.getOption
          rows.toSeq.sortBy(r => (r.ts, r.side, r.id)).foreach { r =>
            if (r.side == 0) {
              if (st.forall(s => s.ts < r.ts || (s.ts == r.ts && s.id <= r.id)))
                st = Some(AsOfState(r.ts, r.id, r.payload))
            } else
              out += AsOfOut(k, r.id, r.ts,
                st.map(_.id), st.map(_.ts), st.map(_.payload))
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Watermarked sliding-window aggregation (streaming q18). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total"))

  /** windowed APPROX-DISTINCT users on ingest (q47's HLL partials in
    * their streaming seat) — the unbounded-state trap fixed: exact
    * streaming count-distinct must hold EVERY user id per in-flight
    * window (state ∝ cardinality — the aggregation that OOMs first
    * on a 100 TB/day stream); the DataSketches HLL partial is
    * fixed-size mergeable state per (window, type) no matter how
    * many users arrive, and the SAME sketch the batch rollup q47
    * unions. Estimates are deterministic for a given row set, so
    * StreamingSpec pins the streamed estimate ≡ the batch
    * `hll_sketch_agg` on identical rows EXACTLY (not just within
    * the error bound), plus <5% vs exact distinct on real events. */
  def windowApproxUsers(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12))
          .as("users_est"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("users_est"), col("n_events"))

  /** Streaming exact dedup within the watermark horizon (streaming
    * d1: drop replayed events by id). */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id", "ts")

  /** Streaming near-dup suppression (streaming d2): an incoming
    * document is dropped when its full K-slot MinHash signature was
    * already seen inside the watermark horizon — identical signatures
    * ⇒ near-identical shingle sets. `dropDuplicatesWithinWatermark`
    * (NOT plain dropDuplicates: without the event-time column in the
    * keys, plain dedup never evicts and state grows with every
    * distinct document ever seen) keeps ONE 32-char digest per
    * distinct signature inside the horizon, never documents, so
    * memory is bounded by distinct-rate × horizon at any stream
    * length. Expects (doc_id, ts, text). */
  def minhashDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("sigkey", md5(concat_ws("|",
        graft.functions.TextHashes.minhash_sig(split(col("text"), " ")))
        .cast("binary")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("sigkey")
      .drop("sigkey")

  /** Streaming embedding near-dup suppression against a STATIC corpus
    * — the vector twin of [[minhashDedup]] and the streaming analogue
    * of batch d11: an incoming vector is dropped when any corpus
    * vector sharing one of its multi-table sign-LSH band buckets
    * verifies at >= `threshold` cosine (paraphrase-level re-ingests
    * that share no shingles and pass every lexical dedup).
    *
    * Plan shape — fully STATELESS, which beats bounded state: the
    * corpus side is grouped ONCE per (table, bucket) into candidate
    * lists and persisted; each micro-batch row computes its own
    * bucket per table (same codegen'd difference-hyperplane bits as
    * batch, so stream and batch can never disagree on banding) and
    * makes one 1:1 stream-static LEFT join per table — no stream-side
    * explode, no aggregation, no watermark state; the only per-row
    * work beyond the joins is the fused-cosine verify over the
    * candidate list, whose length the LSH sizing rule (BITS ∝
    * log₂|corpus|) keeps bounded. A degenerate (short/NULL-element)
    * vector yields NULL cosines, never matches, and passes through —
    * a malformed row cannot crash the ingest or vanish silently. */
  def embedNearDupSuppress(stream: DataFrame, corpus: DataFrame,
      id: String = "vec_id", emb: String = "embedding",
      threshold: Double = 0.99): DataFrame = {
    import graft.operators.Similarity.{LSH_TABLES, tableBucket, cosR}
    val gbs = (0 until LSH_TABLES).map { t =>
      corpus.select(col(id).as(s"__cid$t"), col(emb).as("__cemb"))
        .withColumn(s"__bkt$t", tableBucket(col("__cemb"), t))
        .groupBy(col(s"__bkt$t"))
        .agg(collect_list(struct(col(s"__cid$t").as("cid"),
          col("__cemb").as("cemb"))).as(s"__cands$t"))
        .persist()
    }
    val joined = (0 until LSH_TABLES).foldLeft(stream) { (acc, t) =>
      acc.join(gbs(t), tableBucket(col(emb), t) === col(s"__bkt$t"),
        "left_outer").drop(s"__bkt$t")
    }
    val dup = (0 until LSH_TABLES).map(t =>
      coalesce(exists(col(s"__cands$t"), c =>
        c("cid") =!= col(id) && cosR(col(emb), c("cemb")) >= threshold),
        lit(false)))
      .reduce(_ || _)
    joined.filter(!dup)
      .drop((0 until LSH_TABLES).map(t => s"__cands$t"): _*)
  }

  /** MULTIMODAL near-dup suppression ON INGEST (streaming m6+m7):
    * each arriving binary payload is phash-signed with the SAME
    * chunk-majority construction as batch m6 and suppressed when one
    * of the 4 pigeonhole bands collides with a known signature AND
    * the exact XOR-popcount verifies ≤ `maxDist` (m7's exact-blocking
    * guarantee carries over: Hamming ≤ 3 ⇒ some band equal, so no
    * qualifying duplicate slips through). Scale shape: the
    * MICRO-BATCH's band table is the BROADCAST side — micro-batches
    * are small, the accumulated corpus streams through the join
    * map-side, so the corpus signature table is never shuffled per
    * batch (the bloom-decontam rule with the sides reversed).
    * Drive from foreachBatch, unioning each batch's surviving
    * signatures into the corpus table for the next (the
    * continuous-ingest pattern — StreamingSpec pins a batch-2 copy
    * of a batch-1 survivor suppressed). */
  def phashSuppress(batchBin: DataFrame, corpusSigs: DataFrame,
      maxDist: Int = 3, bits: Int = 32): DataFrame = {
    val bw = bits / 4
    def bands(df: DataFrame, idN: String, sN: String) =
      df.select(col(idN), col(sN),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"),
            pmod(expr(s"$sN div ${1L << (bw * b)}"), lit(1L << bw))
              .as("bv"))): _*)).as("bb"))
        .select(col(idN), col(sN), col("bb.b").as("b"), col("bb.bv").as("bv"))
    val sigs = graft.operators.Multimodal.phash(batchBin, bits)
    val sb = bands(sigs.select(col("record_id").as("sid"),
      col("phash").as("ssig")), "sid", "ssig")
    val cb = bands(corpusSigs.select(col("record_id").as("cid"),
      col("phash").as("csig")), "cid", "csig")
    val dups = cb.join(broadcast(sb), Seq("b", "bv"))
      .filter(col("cid") =!= col("sid") &&
        expr("bit_count(csig ^ ssig)") <= maxDist)
      .select(col("sid").as("record_id")).distinct()
    batchBin.join(dups, Seq("record_id"), "left_anti")
  }

  /** Streaming LM quality scoring (streaming t10): score documents ON
    * INGEST against a bigram model pre-trained on a static corpus —
    * the perplexity gate a live ingestion pipeline runs before
    * admitting a document. Model = [[graft.operators.TextAnalysis.lmModel]]
    * (c12/c1/V tables, computed once on the static side); scoring =
    * the SAME fixed-point per-bigram expression as batch t10
    * ([[graft.operators.TextAnalysis.lpMicro]]), so a doc scores
    * identically whether it arrives in a batch build or on a stream.
    *
    * Two differences forced by streaming semantics, both principled:
    * (a) count joins are LEFT outer with 0-coalesce — a stream doc
    * may contain bigrams/contexts the static model never saw, which
    * Laplace smoothing scores as ln(addK/(n1+V)) (in batch t10 every
    * bigram is in the model by construction, so inner ≡ left there);
    * (b) the per-doc aggregation is keyed by (doc_id, ts) under the
    * watermark, so scoring state evicts as event time advances —
    * bounded memory at any stream length. Docs with <2 tokens emit no
    * bigram rows and so no score row (a stream cannot left-join back
    * to itself); the ingest gate treats absence as "no evidence".
    * Expects (doc_id, ts, text). */
  def lmScoreStream(docs: DataFrame, corpus: DataFrame,
      text: String = "text"): DataFrame = {
    import graft.operators.TextAnalysis
    val (c12r, c1r, v) = TextAnalysis.lmModel(corpus, text)
    // materialize the model AT STREAM DEFINITION: a stream-static
    // join re-executes the static side EVERY micro-batch, so lazy
    // count tables would re-tokenize and re-aggregate the whole
    // training corpus per batch — persisted, each batch pays a
    // dim-table join instead (same rule as embedNearDupSuppress's
    // banded corpus). persist() alone is LAZY (the first micro-batch
    // would pay the training pass); the count() forces the blocks
    // now. The CALLER owns the cache entries' lifetime: unpersist
    // them (or clear the session cache) when the stream is torn
    // down — repeatedly re-defining streams without that leaks cache
    // entries for the session's lifetime.
    val c12 = c12r.persist(); c12.count()
    val c1 = c1r.persist(); c1.count()
    // V is one static scalar: pinned at stream definition (a lazy
    // cross join of a streaming side is not a supported stream-static
    // shape, and the value cannot change mid-run anyway)
    val vs = lit(v.head().getLong(0))
    docs.withWatermark("ts", "1 hour")
      .select(col("doc_id"), col("ts"),
        explode(TextAnalysis.bigramPairs(TextAnalysis.tokens(col(text))))
          .as("p"))
      .select(col("doc_id"), col("ts"),
        col("p.0").as("w1"), col("p.1").as("w2"))
      .join(c12, Seq("w1", "w2"), "left_outer")
      .join(c1, Seq("w1"), "left_outer")
      .select(col("doc_id"), col("ts"),
        TextAnalysis.lpMicro(coalesce(col("n12"), lit(0L)),
          coalesce(col("n1"), lit(0L)), vs).as("lp_micro"))
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("ll_micro"))
  }

  /** BPE tokenization on ingest — the t14-trained merge table
    * applied to a document stream (the model-application serve
    * path: a tokenizer trained offline counts tokens for every
    * arriving doc, the budget signal d12/d14 consume). The trained
    * (word → n_tok) vocabulary is materialized ONCE at stream
    * definition (lmScoreStream's rule — a lazy static side would
    * re-run 8 merge rounds every micro-batch; persist is forced by a
    * count so the 8 rounds run NOW, not on the first micro-batch; the
    * caller owns unpersisting when the stream is torn down) and
    * joined as a dim table on the word key. Unseen, empty, and
    * over-cap words
    * contribute 0 via the LEFT join — exactly the batch
    * [[graft.operators.Bpe.docTokens]] inner-join-plus-coalesce
    * semantics, so a doc of only unknown words still emits a 0-count
    * row. Per-(doc, ts) sum under a watermark; state is one counter
    * per in-flight doc. */
  def bpeTokensStream(docs: DataFrame, corpus: DataFrame,
      text: String = "text", nMerges: Int = 8): DataFrame = {
    val vocabTok = graft.operators.Bpe
      .train(corpus, "doc_id", text, nMerges)._2.persist()
    vocabTok.count()
    docs.withWatermark("ts", "1 hour")
      .select(col("doc_id"), col("ts"),
        explode(split(lower(coalesce(col(text), lit(""))), " ")).as("word"))
      .join(vocabTok, Seq("word"), "left_outer")
      .groupBy(col("doc_id"), col("ts"))
      .agg(sum(coalesce(col("n_tok"), lit(0L))).as("n_tok"))
  }

  /** DSIR selection on ingest — t22's importance weighting in its
    * production seat: the ≤ 4096-row log-ratio table is fit ONCE
    * offline over a reference corpus
    * ([[graft.operators.TextAnalysis.dsirRatio]] — persisted AND
    * forced at stream definition, the lmScoreStream rule; the
    * caller owns unpersisting at teardown) and every arriving doc
    * is scored map-only against the frozen broadcast table: feature
    * hash (the SAME native ngram_hash48 as batch), left-join, one
    * per-(doc_id, ts) sum under the watermark — stateless but for
    * the in-flight doc counters. Zero-feature and unseen-bucket
    * docs emit a judged (0, 0, keep=false) row via
    * explode_outer + left join — the batch scorer's
    * row-for-every-doc rule. StreamingSpec pins n_feat/w_micro/keep
    * ≡ [[TextAnalysis.dsirScoreAgainst]] on the same docs. */
  def dsirSelectStream(docs: DataFrame, corpus: DataFrame,
      isTarget: Column, text: String = "text",
      buckets: Int = 4096): DataFrame = {
    import graft.operators.TextAnalysis
    val lr = TextAnalysis
      .dsirRatio(corpus, "doc_id", text, isTarget, buckets).persist()
    lr.count()
    docs.withWatermark("ts", "1 hour")
      .select(col("doc_id"), col("ts"),
        explode_outer(graft.functions.TextHashes.ngram_hash48(
          TextAnalysis.tokens(col(text)), 2)).as("h"))
      .withColumn("b", col("h") % buckets)
      .join(broadcast(lr), Seq("b"), "left_outer")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(col("lr_micro")).as("n_feat"),
        coalesce(sum(col("lr_micro")), lit(0L)).as("w_micro"))
      .select(col("doc_id"), col("ts"), col("n_feat"), col("w_micro"),
        (col("w_micro") > 0).as("keep"))
  }

  /** Bloom decontamination on ingest — the memory-bounded sketch in
    * its intended seat: the eval set's FIXED-SIZE filter is built
    * once at stream definition (persisted AND forced — the
    * lmScoreStream rule: a lazy static side would re-aggregate the
    * eval set every micro-batch; the caller owns unpersisting at
    * stream teardown) and broadcast into a stateless map-only probe
    * stage; d25's batch form and this stream share
    * [[graft.operators.TextAnalysis.bloomScore]] — same positions,
    * same hit predicate — so they cannot drift (pinned ≡ batch on
    * the real corpus). Keyed (doc_id, ts) under the watermark. */
  def bloomDecontamStream(docs: DataFrame, evalDocs: DataFrame,
      text: String = "text", mBits: Int = 1 << 16,
      k: Int = 3): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val bloom = TextAnalysis
      .bloomFilterOf(evalDocs, "doc_id", text, mBits, k).persist()
    bloom.count()
    val shingled = Dedup
      .shingleSets(docs.withWatermark("ts", "1 hour"), "doc_id", text,
        Seq(col("ts")))
      .select(col("doc_id"), col("ts"),
        size(col("sh")).cast("long").as("n_shingles"),
        explode_outer(col("sh")).as("dig"))
    TextAnalysis.bloomScore(shingled, bloom, Seq("doc_id", "ts"), mBits, k)
  }

  /** Count-Min counters as STREAMING STATE — the sketch's native
    * habitat (t19's batch query summarizes a static corpus; a
    * production ingest keeps the counters as running state). The
    * aggregation key space is the k×m grid itself, so the state is
    * FIXED SIZE by construction — no watermark, no eviction, no
    * growth with stream length: the property that makes frequency
    * tracking viable on an unbounded stream. The same function runs
    * on a static frame (it is one explode + one count agg), which is
    * how StreamingSpec pins stream ≡ batch without a second code
    * path. */
  def cmsCounters(docs: DataFrame, text: String = "text",
      width: Int = 16, depth: Int = 3): DataFrame = {
    import graft.operators.TextAnalysis
    docs.select(explode(TextAnalysis.tokens(
        coalesce(col(text), lit("")))).as("w"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("rw"),
          expr(TextAnalysis.cmsPosSpark(j, width)).as("pos"))): _*)).as("rp"))
      .groupBy(col("rp.rw").as("rw"), col("rp.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
  }

  /** Watermarked stream-stream interval join (streaming q28): each
    * error event joined to the same user's click events within the
    * preceding 5 minutes. Both sides carry watermarks and the join
    * condition bounds event-time distance, so state for either side
    * is dropped as the watermark advances — bounded memory at any
    * stream length. */
  def intervalJoin(errors: DataFrame, clicks: DataFrame): DataFrame = {
    val e = errors.filter(col("event_type") === "error")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("ets"))
    val c = clicks.filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    e.join(c, col("user_id") === col("c_user") &&
      col("cts") >= col("ets") - expr("INTERVAL 5 MINUTES") &&
      col("cts") <= col("ets"))
      .select(col("user_id"), col("err_id"), col("click_id"),
        ((col("ets").cast("long")) - col("cts").cast("long")).as("gap_s"))
  }

  /** [[intervalJoin]]'s LEFT OUTER form — the attribution feed where
    * an error with NO click in its 5-minute lookback must still
    * emit, click_id NULL. In a STREAM that row can only exist once
    * the watermark proves no matching click can still arrive: inner
    * matches emit as both sides meet, but the NULL rows are emitted
    * by WATERMARK PASSAGE (state-cleanup time), not by batch end —
    * the semantics StreamingSpec pins by advancing event time and
    * watching the unmatched row appear. Same state bound as the
    * inner form: both sides' buffers are clipped to the watermark
    * minus the interval, independent of stream length. */
  def intervalJoinOuter(errors: DataFrame, clicks: DataFrame): DataFrame = {
    val e = errors.filter(col("event_type") === "error")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("ets"))
    val c = clicks.filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    e.join(c, col("user_id") === col("c_user") &&
      col("cts") >= col("ets") - expr("INTERVAL 5 MINUTES") &&
      col("cts") <= col("ets"), "left_outer")
      .select(col("user_id"), col("err_id"), col("click_id"),
        (col("ets").cast("long") - col("cts").cast("long")).as("gap_s"))
  }

  /** Stateful sessionization with a 30-minute gap, as
    * flatMapGroupsWithState custom state (streaming q16). Emits a
    * session row each time a gap closes it; an event-time timeout
    * (watermark-driven, deterministic) flushes tail sessions once the
    * watermark passes session-end + gap.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // flush the open session but KEEP a tombstone (nEvents=0,
            // no timeout armed) holding the per-user sid counter:
            // removing state here would restart sids at 1 and break
            // row-for-row parity with batch q16's cumulative
            // per-user session rank (StreamingSpec pins the
            // equivalence). The tombstone is a few dozen bytes per
            // user ever seen — callers that don't need cumulative
            // sids can remove() instead.
            val s = state.get
            state.update(SessionState(s.sid, s.lastSec, 0, s.startSec))
            Iterator(SessionOut(userId, s.sid, s.nEvents, s.startSec, s.lastSec))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                // nEvents == 0 is the timeout tombstone: no open
                // session, sid counter preserved. An event reaching
                // here is never a late continuation of the flushed
                // session — the timeout fired because the watermark
                // passed lastSec + gap, and anything at or before the
                // watermark is dropped as late upstream.
                case Some(s) if s.nEvents > 0 && sec - s.lastSec <= 1800 =>
                  cur = Some(s.copy(lastSec = sec, nEvents = s.nEvents + 1))
                case Some(s) if s.nEvents > 0 =>
                  closed += SessionOut(userId, s.sid, s.nEvents, s.startSec, s.lastSec)
                  cur = Some(SessionState(s.sid + 1, sec, 1, sec))
                case Some(tomb) =>
                  cur = Some(SessionState(tomb.sid + 1, sec, 1, sec))
                case None =>
                  cur = Some(SessionState(1, sec, 1, sec))
              }
            }
            cur.filter(_.nEvents > 0).foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max(s.lastSec * 1000L + 1800 * 1000L,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }
}
