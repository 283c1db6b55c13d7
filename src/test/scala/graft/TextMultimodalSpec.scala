package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  test("quality ratios are well-formed") {
    val q = TextAnalysis.quality(docs, "doc_id", "text")
    val bad = q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
      col("score") < 0 || col("score") > 1 || col("n_tok") <= 0)
    assert(bad.count() == 0)
  }

  test("fingerprint is invariant to case and punctuation") {
    val mangled = docs.withColumn("text",
      concat(upper(substring(col("text"), 1, 10)),
        expr("substring(text, 11)"), lit("!!!")))
    val a = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .withColumnRenamed("fp", "fp_a")
    val b = TextAnalysis.fingerprint(mangled, "doc_id", "text")
      .withColumnRenamed("fp", "fp_b")
    assert(a.join(b, "doc_id").filter(col("fp_a") =!= col("fp_b")).count() == 0)
  }

  test("langId covers every doc exactly once") {
    val l = TextAnalysis.langId(docs, "doc_id", "text")
    assert(l.count() == docs.count())
    assert(l.select("doc_id").distinct().count() == docs.count())
  }

  test("multimodal decode plumbing: stable stub metadata, no shuffle") {
    val bin = Multimodal.asBinary(docs, "doc_id", "text")
    val meta = Multimodal.decodeMeta(bin)
    assert(meta.count() == docs.count())
    val m = meta.filter(col("record_id") === 7).collect().head
    val m2 = Multimodal.decodeMeta(bin).filter(col("record_id") === 7)
      .collect().head
    assert(m == m2, "stub decode must be deterministic")
    assert(m.width >= 16 && m.height >= 16 && m.n_frames >= 1)
    // decode is partition-local: no exchange in the plan
    assert(!meta.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("repetition metrics: planted boilerplate doc scores high, varied doc low") {
    import spark.implicits._
    val planted = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam ham"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(planted, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))))
      .toMap
    assert(r(1L) == ((10L, 2L, 9L, 0.8, 0.9)))
    assert(r(2L) == ((10L, 10L, 1L, 0.0, 0.1)))
    // full corpus: every doc scored exactly once, ratios in range
    val full = TextAnalysis.repetition(docs, "doc_id", "text")
    assert(full.count() == docs.count())
    assert(full.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1 ||
      col("top_frac") <= 0 || col("top_frac") > 1).count() == 0)
  }

  test("filter chain: each rule fires on its planted doc, first failure wins") {
    import spark.implicits._
    val varied = (1 to 30).map(i => s"w$i").mkString(" ")
    val planted = Seq(
      (1L, "short doc"),                                    // too_short
      (2L, Seq.fill(30)("spam").mkString(" ")),             // too_repetitive
      (3L, varied + " " + Seq.fill(7)("x").mkString(" ")),  // top_heavy (7/37)
      (4L, varied)                                          // keep
    ).toDF("doc_id", "text")
    val v = TextAnalysis.filterChain(planted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(1L -> "too_short", 2L -> "too_repetitive",
      3L -> "top_heavy", 4L -> "keep"), s"got $v")
    // precedence: doc 2 is also top-heavy, but the earlier rule names it
    // full corpus: all four verdicts occur (thresholds fit the data)
    val verdicts = TextAnalysis.filterChain(docs, "doc_id", "text")
      .select("verdict").distinct().collect().map(_.getString(0)).toSet
    assert(verdicts == Set("keep", "too_short", "too_repetitive", "top_heavy"),
      s"corpus verdicts $verdicts")
    // optional entropy gate: 20 types over 30 tokens passes every
    // ratio rule (dup 0.33, top 0.067) but H ≈ ln 20 < 3.2, while 30
    // distinct tokens (H = ln 30) keep; gate OFF by default
    val lowH = ((1 to 10).map(i => s"t$i") ++ (1 to 10).map(i => s"t$i") ++
      (1 to 10).map(i => s"u$i")).mkString(" ")
    val he = Seq((5L, lowH), (6L, varied)).toDF("doc_id", "text")
    val vh = TextAnalysis.filterChain(he, "doc_id", "text", minEntropy = 3.2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vh == Map(5L -> "low_entropy", 6L -> "keep"), s"got $vh")
    val voff = TextAnalysis.filterChain(he, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(voff == Map(5L -> "keep", 6L -> "keep"),
      s"entropy gate must be off by default: $voff")
  }

  test("contamination: planted eval overlap is found, clean doc reports zero") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", false),
      // doc 2 shares a 4-token run (2 of its 4 shingles) with eval doc 10
      (2L, "alpha beta gamma delta other words", true),
      (3L, "completely unrelated text goes here now", true),
      (10L, "alpha beta gamma delta epsilon zeta", false)
    ).toDF("doc_id", "text", "is_train")
    val c = TextAnalysis.contamination(corpus, "doc_id", "text",
      isEval = !col("is_train"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(c.keySet == Set(2L, 3L), "only train docs are scored")
    assert(c(2L)._2 == 2L, s"doc 2 should hit 2 eval shingles, got ${c(2L)}")
    assert(c(3L)._2 == 0L, "clean doc must report zero hits")
  }

  test("shardAssign: corpus-independent shards, independent of the split hash, balanced, bounded order key") {
    import graft.operators.Sampling
    import spark.implicits._
    val sh = Sampling.shardAssign(docs, col("doc_id"), 8)
    // corpus independence: sharding HALF the corpus moves nobody — the
    // property that makes incremental ingest append instead of reshuffle
    val half = Sampling.shardAssign(
      docs.filter(col("doc_id") % 2 === 0), col("doc_id"), 8)
    val moved = half.select(col("doc_id"), col("shard"))
      .join(sh.select(col("doc_id"), col("shard").as("s2")), "doc_id")
      .filter(col("shard") =!= col("s2")).count()
    assert(moved == 0, s"$moved docs changed shard when the corpus shrank")
    // balance: 500 docs over 8 shards — all populated, no gross skew
    val counts = sh.groupBy("shard").count().select("count").as[Long].collect()
    assert(counts.length == 8 && counts.min > 0, counts.toSeq.toString)
    assert(counts.max.toDouble / counts.min <= 3.0, counts.toSeq.toString)
    // independence from the train/val/test hash: within one split
    // bucket the shard still varies (disjoint digest nibbles)
    val cross = sh.select(Sampling.md5Mod10(col("doc_id")).as("v"), col("shard"))
      .groupBy("v").agg(countDistinct("shard").as("ns"))
      .filter(col("ns") > 1).count()
    assert(cross > 0, "shard must not be a function of the split bucket")
    // order key: 16 bits, deterministic
    val oh = sh.select(col("ohash")).as[Long].collect()
    assert(oh.forall(o => o >= 0 && o < 65536))
    val again = Sampling.shardAssign(docs, col("doc_id"), 8)
    assert(sh.select("doc_id", "shard", "ohash").exceptAll(
      again.select("doc_id", "shard", "ohash")).count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(docs, col("doc_id"), 1000)
    }
  }

  test("stratified sample is deterministic and downsamples only the target stratum") {
    import graft.operators.Sampling
    val s1 = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.25))
    val s2 = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.25))
    // deterministic: two runs agree row-for-row
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-target strata pass through untouched
    total.keys.filter(_ != "en").foreach(l => assert(kept(l) == total(l)))
    // target stratum lands near its rate (16-bit hash, ±10% abs tolerance)
    val frac = kept("en").toDouble / total("en")
    assert(frac > 0.15 && frac < 0.35, s"en kept fraction $frac")
    // schema passes through unchanged
    assert(s1.columns.sameElements(docs.columns))
  }

  test("resize fits the box, preserves aspect ordering, never upscales, no shuffle") {
    val bin = Multimodal.asBinary(docs, "doc_id", "text")
    val r = Multimodal.resize(bin, maxDim = 64).toDF()
    assert(r.count() == docs.count())
    val bad = r.filter(
      col("new_width") > 64 || col("new_height") > 64 ||
        col("new_width") > col("width") || col("new_height") > col("height") ||
        col("new_width") < 1 || col("new_height") < 1 ||
        // aspect ordering: the longer side stays the longer side
        (col("width") > col("height") && col("new_width") < col("new_height")) ||
        (col("height") > col("width") && col("new_height") < col("new_width")))
    assert(bad.count() == 0)
    // already-small assets pass through untouched
    val small = r.filter(col("width") <= 64 && col("height") <= 64)
      .filter(col("new_width") =!= col("width") || col("new_height") =!= col("height"))
    assert(small.count() == 0)
    // partition-local: no exchange in the plan
    assert(!r.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("PII scrub: planted emails/phones/IPs/cards redacted with right counts; clean text byte-identical") {
    import spark.implicits._
    val planted = Seq(
      (1L, "contact alice@example.com or bob.smith+tag@sub.domain.org today"),
      (2L, "call 555-123-4567 or 555.987.6543 now"),
      (3L, "server at 192.168.1.100 and 10.0.0.1 down"),
      (4L, "clean document with no personal information at all"),
      (5L, null.asInstanceOf[String]),
      // Luhn-valid cards in all three separator styles -> redacted
      (6L, "pay with 4111 1111 1111 1111 or 4111-1111-1111-1111 or 4111111111111111 ok"),
      // card-SHAPED but Luhn-invalid digit runs (an order id and a
      // tracking number) -> the checksum gate must KEEP them
      (7L, "order 4111 1111 1111 1112 tracking 1234-5678-9012-3456 intact")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.scrubPii(planted, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    // (doc_id, n_email, n_ip, n_phone, n_cc, text_clean)
    assert(r(1L).getLong(1) == 2 && !r(1L).getString(5).contains("@"),
      s"both emails scrubbed: ${r(1L)}")
    assert(r(1L).getString(5) ==
      "contact <EMAIL> or <EMAIL> today")
    assert(r(2L).getLong(3) == 2 &&
      r(2L).getString(5) == "call <PHONE> or <PHONE> now", s"${r(2L)}")
    assert(r(3L).getLong(2) == 2 &&
      r(3L).getString(5) == "server at <IP> and <IP> down", s"${r(3L)}")
    assert(r(4L).getLong(1) == 0 && r(4L).getLong(2) == 0 &&
      r(4L).getLong(3) == 0 && r(4L).getLong(4) == 0 &&
      r(4L).getString(5) == "clean document with no personal information at all",
      "a clean doc must come back byte-identical (zero false positives)")
    assert(r(5L).isNullAt(5), "null text passes through as null, not a crash")
    assert(r(6L).getLong(4) == 3 &&
      r(6L).getString(5) == "pay with <CC> or <CC> or <CC> ok", s"${r(6L)}")
    assert(r(7L).getLong(4) == 0 &&
      r(7L).getString(5) ==
        "order 4111 1111 1111 1112 tracking 1234-5678-9012-3456 intact",
      s"Luhn-invalid digit runs must survive untouched: ${r(7L)}")
  }

  test("phash: payload differing in one chunk lands near; unrelated payload far") {
    import spark.implicits._
    // 32 chunks of 256 bytes each; `near` re-writes ONE chunk
    def blob(chunks: Seq[String]) = chunks.map(_.padTo(256, 'x')).mkString
    val base = (0 until 32).map(i => s"chunk $i content")
    val near = base.updated(13, "tampered chunk !!")
    val far = (0 until 32).map(i => s"totally different chunk $i")
    val df = Seq((1L, blob(base)), (2L, blob(near)), (3L, blob(far)))
      .toDF("doc_id", "text")
    val p = Multimodal.phash(Multimodal.asBinary(df, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(p(1L), p(2L)) < ham(p(1L), p(3L)),
      s"near-dup ${ham(p(1L), p(2L))} bits must beat unrelated ${ham(p(1L), p(3L))}")
    assert(ham(p(1L), p(2L)) <= 10,
      s"one changed chunk of 32 moves few majority bits: ${ham(p(1L), p(2L))}")
    assert(ham(p(1L), p(3L)) >= 8,
      s"unrelated payloads differ broadly: ${ham(p(1L), p(3L))}")
  }

  test("phashNearDups: exact-dup pair at dist 0, unrelated pair absent") {
    import spark.implicits._
    def blob(chunks: Seq[String]) = chunks.map(_.padTo(256, 'x')).mkString
    val base = (0 until 32).map(i => s"chunk $i content")
    val far = (0 until 32).map(i => s"totally different chunk $i")
    val df = Seq((1L, blob(base)), (2L, blob(base)), (3L, blob(far)))
      .toDF("doc_id", "text")
    val pairs = Multimodal.phashNearDups(
      Multimodal.phash(Multimodal.asBinary(df, "doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)),
      s"identical payloads pair at dist 0 and nothing else: ${pairs.toSeq}")
    // pigeonhole exactness at BOTH widths: every Hamming<=3 pair is
    // FOUND, not sampled — brute-force over the corpus's signatures
    // agrees with the banded join exactly (60 bits is the shipped m7
    // width; its band arithmetic must stay exact past double's 2^53)
    for (bits <- Seq(32, 60)) {
      val sigs = Multimodal.phash(Multimodal.asBinary(
        docs.limit(200), "doc_id", "text"), bits)
      val got = Multimodal.phashNearDups(sigs, bits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val all = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = (for {
        (i1, s1) <- all; (i2, s2) <- all
        if i1 < i2 && java.lang.Long.bitCount(s1 ^ s2) <= 3
      } yield (i1, i2)).toSet
      assert(got == brute, s"banded pairs at $bits bits must equal brute: " +
        s"missing ${brute -- got}, extra ${got -- brute}")
    }
  }

  test("mixToBudget: budget split by weight, under-allocated strata pass through whole") {
    import graft.operators.Sampling
    import spark.implicits._
    // every doc is exactly 10 tokens, so tokens = 10 × docs
    val text = Seq.fill(10)("w").mkString(" ")
    val rows =
      (1 to 1000).map(i => (i.toLong, "big", text)) ++
        (2001 to 2400).map(i => (i.toLong, "mid", text)) ++
        (3001 to 3005).map(i => (i.toLong, "tiny", text)) ++
        Seq((4001L, null.asInstanceOf[String], text))
    val df = rows.toDF("id", "src", "text")
    val nTok = size(split(col("text"), " "))
    val out = Sampling.mixToBudget(df, col("src"), col("id"), nTok, 3000.0)
    val kept = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // uniform weights, 3 strata -> 1000 tokens (100 docs) per stratum
    assert(kept("tiny") == 5, s"tiny (50 tokens < 1000) passes through whole: $kept")
    assert(kept("big") > 60 && kept("big") < 140,
      s"big keeps ~100 of 1000 docs (rate 0.1): $kept")
    assert(kept("mid") > 60 && kept("mid") < 140,
      s"mid keeps ~100 of 400 docs (rate 0.25): $kept")
    assert(!kept.contains(null), "NULL stratum receives no budget -> dropped")
    // weights shift allocation: big at 2x weight doubles its keep rate
    val weighted = Sampling.mixToBudget(df, col("src"), col("id"), nTok,
      3000.0, Map("big" -> 2.0))
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weighted("big") > kept("big") * 3 / 2,
      s"2x weight must raise big's keep: $weighted vs $kept")
    // deterministic: two identical calls agree row-for-row
    val again = Sampling.mixToBudget(df, col("src"), col("id"), nTok, 3000.0)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    // schema passes through unchanged
    assert(out.columns.sameElements(df.columns))
  }

  test("sequence packing: exact boundary arithmetic, every doc packed once") {
    import graft.operators.Sampling
    import spark.implicits._
    // 10 docs x 10 tokens, one shard, 25-token sequences: docs start
    // at cumulative offsets 0,10,20,30,... -> seqs 0,0,0,1,1,2,2,2,3,3
    val text = Seq.fill(10)("w").mkString(" ")
    val docs = (1L to 10L).map((_, text)).toDF("doc_id", "text")
    val packed = Sampling.packSequences(docs, col("doc_id"),
      size(split(col("text"), " ")).cast("long"), 25L, 1)
      .select("doc_id", "seq_id", "seq_offset")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 10L)), 3L -> ((0L, 20L)),
      4L -> ((1L, 5L)), 5L -> ((1L, 15L)), 6L -> ((2L, 0L)),
      7L -> ((2L, 10L)), 8L -> ((2L, 20L)), 9L -> ((3L, 5L)),
      10L -> ((3L, 15L)))
    assert(packed == want, s"got $packed")
    // corpus-level: packing is a PARTITION of the docs (nothing lost,
    // nothing doubled) and deterministic across runs
    val full = Sampling.packSequences(docs.unionByName(
        (11L to 200L).map((_, text)).toDF("doc_id", "text")),
      col("doc_id"), size(split(col("text"), " ")).cast("long"), 512L, 16)
    assert(full.count() == 200)
    assert(full.select("doc_id").distinct().count() == 200)
  }

  test("packSpans splits straddling docs into contiguous slices, fills every sequence") {
    import graft.operators.Sampling
    import spark.implicits._
    // 10 docs x 10 tokens, one shard, 25-token sequences: docs 3 and 8
    // straddle the 25/75 boundaries and must split into two slices
    val text = Seq.fill(10)("w").mkString(" ")
    val docs10 = (1L to 10L).map((_, text)).toDF("doc_id", "text")
    val spans = Sampling.packSpans(docs10, col("doc_id"),
      size(split(col("text"), " ")).cast("long"), 25L, 1)
      .select("doc_id", "seq_id", "slice_start", "slice_len", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = Set(
      (1L, 0L, 0L, 10L, 0L), (2L, 0L, 0L, 10L, 10L),
      (3L, 0L, 0L, 5L, 20L), (3L, 1L, 5L, 5L, 0L),
      (4L, 1L, 0L, 10L, 5L), (5L, 1L, 0L, 10L, 15L),
      (6L, 2L, 0L, 10L, 0L), (7L, 2L, 0L, 10L, 10L),
      (8L, 2L, 0L, 5L, 20L), (8L, 3L, 5L, 5L, 0L),
      (9L, 3L, 0L, 10L, 5L), (10L, 3L, 0L, 10L, 15L))
    assert(spans == want, s"got $spans")
    // real corpus: every sequence's slices sum to seqLen except each
    // shard's LAST sequence, and per-doc slices sum to the doc's tokens
    val full = Sampling.packSpans(docs, col("doc_id"),
      size(split(col("text"), " ")).cast("long"), 512L, 16)
    val perSeq = full.groupBy("shard", "seq_id")
      .agg(sum("slice_len").as("tok"))
    val lastSeq = perSeq.groupBy("shard").agg(max("seq_id").as("last"))
    val short = perSeq.join(lastSeq, "shard")
      .filter(col("seq_id") =!= col("last") && col("tok") =!= 512L)
    assert(short.count() == 0, "a non-final sequence is not fully packed")
    val perDoc = full.groupBy("doc_id").agg(sum("slice_len").as("tok"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("want")), "doc_id")
    assert(perDoc.filter(col("tok") =!= col("want")).count() == 0,
      "per-doc slice lengths must sum to the doc's token count")
    // totality: a NULL-text doc packs as a zero-length slice, not a drop
    val weird = docs10.unionByName(Seq((11L, null: String)).toDF("doc_id", "text"))
    val wspans = Sampling.packSpans(weird, col("doc_id"),
      size(split(col("text"), " ")).cast("long"), 25L, 1)
    assert(wspans.filter(col("doc_id") === 11L && col("slice_len") === 0L)
      .count() == 1, "NULL-token doc must emit one empty slice")
  }

  test("sampleN: exact counts, bottom-k stability under growth, short strata whole") {
    import graft.operators.Sampling
    import spark.implicits._
    val s = Sampling.sampleN(docs, col("lang"), col("doc_id"), 15)
    // exactly min(15, |stratum|) per stratum
    val got = s.groupBy("lang").count()
    val want = docs.groupBy("lang").count()
      .select(col("lang"), least(col("count"), lit(15L)).as("want"))
    assert(got.join(want, "lang").filter(col("count") =!= col("want"))
      .count() == 0)
    // bottom-k property: sampling a SUPERSET never invents a new pick
    // that hashes behind an existing one — the sample from half the
    // corpus is the bottom-15 of that half, so every doc sampled from
    // the full corpus that is present in the half must also be in the
    // half's sample unless displaced by a lower hash
    val half = docs.filter(col("doc_id") % 2 === 0)
    val sHalf = Sampling.sampleN(half, col("lang"), col("doc_id"), 15)
      .select(col("lang"), col("doc_id"))
    val sFullOnHalf = s.filter(col("doc_id") % 2 === 0)
      .select(col("lang"), col("doc_id"))
    // full-corpus picks that live in the half are a SUBSET of the
    // half's own picks (growth only ever displaces, never admits)
    assert(sFullOnHalf.except(sHalf).count() == 0)
    // determinism: same call twice, identical set
    val s2 = Sampling.sampleN(docs, col("lang"), col("doc_id"), 15)
      .select("lang", "doc_id")
    assert(s.select("lang", "doc_id").except(s2).count() == 0 &&
      s2.except(s.select("lang", "doc_id")).count() == 0)
  }

  test("weightedSampleN: hand-computed E-S ranks, weight monotonicity, growth stability, refusals") {
    import graft.operators.Sampling
    import spark.implicits._
    // hand-oracle: recompute the A-Res rank in the test from the same
    // md5 fold + micro-rounded ln and compare the per-stratum top-n
    // EXACTLY (the s21 pattern: exact integers → bitwise equality)
    val rows = (0L until 300L).map(i =>
      (s"g${i % 3}", i, 1L + (i % 7) * 10L)).toDF("g", "id", "w")
    val got = Sampling.weightedSampleN(rows, col("g"), col("id"),
        col("w"), 10)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet
    def esKey(id: Long, w: Long): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val fold = (0 until 6).map(i =>
        java.lang.Long.parseLong(hx.substring(i, i + 1), 16) <<
          (4 * (5 - i))).sum
      math.floor(math.log((fold + 1).toDouble / 16777216.0) / w *
        1000000.0 + 0.5).toLong
    }
    val want = (0L until 300L).map(i => (s"g${i % 3}", i, 1L + (i % 7) * 10L))
      .groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(r => (r._2, esKey(r._2, r._3)))
          .sortBy { case (id, es) => (-es, id) }.take(10)
          .map { case (id, _) => (g, id) }
      }.toSet
    assert(got == want, s"E-S ranks diverge:\n$got\nvs\n$want")
    // weight monotonicity in aggregate: heavy rows (w=61) must be
    // over-represented vs light rows (w=1) in the sample
    val byW = (0L until 300L).map(i => (i, 1L + (i % 7) * 10L)).toMap
    val heavy = got.count { case (_, id) => byW(id) == 61L }
    val light = got.count { case (_, id) => byW(id) == 1L }
    assert(heavy > light,
      s"weighting must bias the draw: heavy=$heavy light=$light")
    // growth stability (the sampleN bottom-k law, weighted form)
    val half = rows.filter(col("id") % 2 === 0)
    val sHalf = Sampling.weightedSampleN(half, col("g"), col("id"),
      col("w"), 10).select("g", "id")
    val sFullOnHalf = Sampling.weightedSampleN(rows, col("g"), col("id"),
        col("w"), 10)
      .filter(col("id") % 2 === 0).select("g", "id")
    assert(sFullOnHalf.except(sHalf).count() == 0)
    // refusals by name: NULL and non-positive weights
    val bad = Seq(("a", 1L, 0L)).toDF("g", "id", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSampleN(bad, col("g"), col("id"), col("w"), 5)
    }
    assert(e.getMessage.contains("WEIGHTED SAMPLE REFUSED"))
  }

  test("entropy: zero for single-type spam, ln(k) for uniform, total over NULL") {
    import spark.implicits._
    val planted = Seq(
      (1L, "spam spam spam spam"),      // one type: H = 0 exactly
      (2L, "one two three four"),       // uniform over 4: H = ln 4
      (3L, null: String)).toDF("doc_id", "text")
    val r = TextAnalysis.entropy(planted, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), Option(x.get(4))))).toMap
    assert(r(1L) == ((4L, 1L, 0L, Some(0.0))))
    // 4 · floor(0.25·ln4 · 1e6 + 0.5) = 4 · 346574 = 1386296
    assert(r(2L) == ((4L, 4L, 1386296L, Some(1.3863))))
    assert(r(3L) == ((0L, 0L, 0L, None)), "NULL text: judged empty, not dropped")
    // full corpus: one row per doc, H bounded by ln(n_uniq)
    val full = TextAnalysis.entropy(docs, "doc_id", "text")
    assert(full.count() == docs.count())
    assert(full.filter(col("entropy") < 0 ||
      col("entropy") > log(col("n_uniq")) + 0.0001).count() == 0)
  }

  test("lmScore: hand-computed Laplace bigram log-probs, total over degenerate docs") {
    import spark.implicits._
    val planted = Seq((1L, "a b a b a c"), (2L, "x"), (3L, null: String))
      .toDF("doc_id", "text")
    // corpus model: c12 = {(a,b):2, (b,a):2, (a,c):1}, c1 = {a:3, b:2},
    // V = |{a,b,c,x}| = 4; doc 1's five bigrams score
    // 2·ln(3/7) + 2·ln(3/6) + ln(2/7) in micro units (half-up):
    // 2·(-847298) + 2·(-693147) + (-1252763) = -4333653
    val r = TextAnalysis.lmScore(planted, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), Option(x.get(3))))).toMap
    assert(r(1L) == ((5L, -4333653L, Some(-0.8667))))
    assert(r(2L) == ((0L, 0L, None)), "single-token doc: no evidence, not a drop")
    assert(r(3L) == ((0L, 0L, None)), "NULL-text doc: no evidence, not a drop")
    // full corpus: every doc scored exactly once; scored docs' avg_ll
    // is a well-formed negative log-prob
    val full = TextAnalysis.lmScore(docs, "doc_id", "text")
    assert(full.count() == docs.count())
    assert(full.filter(col("n_bigrams") > 0 &&
      (col("avg_ll").isNull || col("avg_ll") >= 0)).count() == 0)
  }

  test("gopher rules: each failure mode fires on its planted doc, in order") {
    import spark.implicits._
    def rep(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    val planted = Seq(
      (1L, "too short"),
      (2L, rep("supercalifragilistic", 60)),               // wlen 20 > 10
      (3L, rep("a", 60)),                                  // wlen 1 < 3
      (4L, rep("word#", 60)),                              // symbol ratio 1
      (5L, rep("12345", 60)),                              // no alpha words
      (6L, (1 to 60).map(i => s"word$i").mkString(" ")),   // no stopwords
      (7L, "the " + rep("good", 58) + " a"),               // keep
      (8L, null.asInstanceOf[String]))                     // NULL → total
      .toDF("doc_id", "text")
    val v = TextAnalysis.gopher(planted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(v == Map(1L -> "too_few_words", 2L -> "words_too_long",
      3L -> "words_too_short", 4L -> "too_symbolic", 5L -> "non_alpha",
      6L -> "no_stopwords", 7L -> "keep", 8L -> "too_few_words"))
    // real corpus: total (one verdict per doc), metrics well-formed
    val g = TextAnalysis.gopher(docs, "doc_id", "text")
    assert(g.count() == docs.count())
    assert(g.filter(col("alpha_frac") < 0 || col("alpha_frac") > 1 ||
      col("symbol_ratio") < 0 || col("n_stop") < 0 ||
      col("n_stop") > TextAnalysis.stopwords.size).count() == 0)
    // map-only: the whole battery runs without an exchange
    assert(!g.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("tfidf: hand-computed scores, rank order, and df semantics") {
    import spark.implicits._
    val tiny = Seq((1L, "x x y the"), (2L, "y z the"), (3L, "w w w the"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopTerms(tiny, "doc_id", "text", 5)
      .collect().map(x => (x.getLong(0), x.getInt(1)) ->
        ((x.getString(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // idf: ln(3/1)=1.0986..., ln(3/2)=0.4055..., ln(3/3)=0
    assert(r((1L, 1)) == (("x", 2L, 1L,
      math.floor(2 * math.log(3.0) * 1e6 + 0.5).toLong)))
    assert(r((1L, 2)) == (("y", 1L, 2L,
      math.floor(math.log(1.5) * 1e6 + 0.5).toLong)))
    assert(r((1L, 3))._1 == "the") // idf 0 → score 0, ranked last
    assert(r((3L, 1)) == (("w", 3L, 1L,
      math.floor(3 * math.log(3.0) * 1e6 + 0.5).toLong)))
    // real corpus: ≤5 rows per doc, rn consecutive from 1
    val full = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 5)
    val perDoc = full.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"), min("rn").as("mn"))
    assert(perDoc.filter(col("n") > 5 || col("mx") =!= col("n") ||
      col("mn") =!= 1).count() == 0)
  }

  test("frame sampling yields ceil(bytes/stride) frames with features") {
    val bin = Multimodal.asBinary(docs.limit(20), "doc_id", "text")
    val frames = Multimodal.sampleFrames(bin, stride = 100)
    val perDoc = frames.groupBy("record_id").count()
    val expect = docs.limit(20).select(col("doc_id").cast("long").as("record_id"),
      ceil(length(col("text")) / 100.0).as("want"))
    val joined = perDoc.join(expect, "record_id")
    assert(joined.filter(col("count") =!= col("want")).count() == 0)
    assert(frames.filter(size(col("feature")) =!= 8).count() == 0)
  }

  test("bloomContamination: one-sided error vs exact; FP rate tracks occupancy") {
    val isEval = col("source") === "src0"
    val exact = TextAnalysis.contamination(docs, "doc_id", "text", isEval)
      .select(col("doc_id"), col("n_shingles"), col("n_hit").as("exact_hit"))
    def bloomAt(m: Int) =
      TextAnalysis.bloomContamination(docs, "doc_id", "text", isEval, mBits = m)
        .select(col("doc_id"), col("n_hit").as("bloom_hit"))
    val j = exact.join(bloomAt(1 << 16), "doc_id").persist()
    // the decontamination guarantee: a real leak is NEVER missed
    assert(j.filter(col("bloom_hit") < col("exact_hit")).count() == 0,
      "bloom must have no false negatives")
    val r = j.agg(sum(col("bloom_hit") - col("exact_hit")).as("fp"),
      sum(col("n_shingles")).as("probes")).collect().head
    val fpRate = r.getLong(0).toDouble / r.getLong(1)
    assert(fpRate < 0.01, s"64Kbit filter FP rate $fpRate should be <1%")
    // shrinking the filter raises occupancy → more FPs, never FNs
    val tiny = exact.join(bloomAt(1 << 10), "doc_id").persist()
    assert(tiny.filter(col("bloom_hit") < col("exact_hit")).count() == 0)
    val rt = tiny.agg(sum(col("bloom_hit") - col("exact_hit")).as("fp"))
      .collect().head
    assert(rt.getLong(0) > r.getLong(0),
      "a saturated 1Kbit filter must show more false positives")
    j.unpersist(); tiny.unpersist()
  }

  test("cmsTopTerms: one-sided estimates, narrow sketch collides, wide sketch exact") {
    // full-vocab view: rank over every word so the sketch bound is
    // checked corpus-wide, not just on the emitted top-n
    val narrow = TextAnalysis.cmsTopTerms(docs, "doc_id", "text",
      width = 16, depth = 3, topN = 10000)
    assert(narrow.filter(col("est") < col("n_true")).count() == 0,
      "Count-Min never underestimates")
    val over = narrow.filter(col("est") > col("n_true")).count()
    assert(over > 0, "a 3x16 grid over a 31-word vocab must collide somewhere")
    val wide = TextAnalysis.cmsTopTerms(docs, "doc_id", "text",
      width = 4096, depth = 3, topN = 10000)
    assert(wide.filter(col("est") =!= col("n_true")).count() == 0,
      "a wide sketch resolves every count exactly on this vocab")
  }

  test("nbClassify: separable fixture learns its labels; degenerate docs total") {
    import spark.implicits._
    val planted = Seq(
      (1L, "aaa aaa aaa", "A"), (2L, "aaa aaa", "A"), (3L, "aaa ccc", "A"),
      (4L, "bbb bbb bbb", "B"), (5L, "bbb ccc", "B"),
      (6L, null.asInstanceOf[String], "A"),  // null text must not vanish
      (7L, "", "B"))                         // empty text: "" is a token
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.nbClassify(planted, "doc_id", "text", "lang")
    assert(r.count() == 7, "one row per input doc, nulls included")
    val m = r.collect().map(x => x.getLong(0) ->
      ((x.getString(1), x.getLong(3)))).toMap
    // pure docs classify to their own label (is_match = 1)
    assert(m(1L) == (("A", 1L)) && m(2L) == (("A", 1L)))
    assert(m(4L) == (("B", 1L)) && m(5L) == (("B", 1L)))
    // the shared-word doc leans to the heavier "aaa" class
    assert(m(3L)._1 == "A")
    // is_match is exactly (pred == label) everywhere
    val mism = TextAnalysis.nbClassify(planted, "doc_id", "text", "lang")
      .join(planted.select(col("doc_id"), col("lang")), "doc_id")
      .filter((col("pred_lab") === col("lang")).cast("long") =!= col("is_match"))
    assert(mism.count() == 0)
  }

  test("nbClassify on the corpus beats the majority-class baseline") {
    val n = docs.count()
    val majority = docs.groupBy("lang").count()
      .agg(max("count")).collect().head.getLong(0)
    val acc = TextAnalysis.nbClassify(docs, "doc_id", "text", "lang")
      .agg(sum("is_match")).collect().head.getLong(0)
    // the planted lexicon function-words carry real signal the
    // trained model must pick up through the shared-vocab noise
    assert(acc > majority,
      s"NB accuracy $acc/$n should beat majority $majority/$n")
    // prediction is total and unique per doc
    val p = TextAnalysis.nbClassify(docs, "doc_id", "text", "lang")
    assert(p.count() == n && p.select("doc_id").distinct().count() == n)
  }

  test("dsirWeights: target-typical docs score positive, raw-typical negative, total and deterministic") {
    import spark.implicits._
    // a planted corpus whose target slice repeats one bigram family
    // and whose raw slice repeats a disjoint one — DSIR must rank a
    // fresh target-like doc positive and a raw-like doc negative
    val tgtPhrase = "alpha beta " * 6
    val rawPhrase = "gamma delta " * 6
    val planted = ((1L to 20L).map(i => (i, tgtPhrase.trim, true)) ++
      (21L to 60L).map(i => (i, rawPhrase.trim, false)) ++
      Seq((61L, tgtPhrase.trim, false),          // target-like held-out
        (62L, rawPhrase.trim, false),            // raw-like held-out
        (63L, null.asInstanceOf[String], false)) // NULL text
      ).toDF("doc_id", "text", "tgt")
    val w = TextAnalysis.dsirWeights(planted, "doc_id", "text", col("tgt"))
    assert(w.count() == 63 &&
      w.select("doc_id").distinct().count() == 63, "total and unique")
    val byId = w.select("doc_id", "w_micro", "n_feat", "keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(byId(61L)._2 > 0 && byId(61L)._4,
      s"target-like doc must keep: ${byId(61L)}")
    assert(byId(62L)._2 < 0 && !byId(62L)._4,
      s"raw-like doc must drop: ${byId(62L)}")
    // NULL text: zero features, zero weight, dropped — never NULL out
    assert(byId(63L) == ((63L, 0L, 0L, false)))
    // deterministic: a second evaluation is row-identical
    val again = TextAnalysis.dsirWeights(planted, "doc_id", "text", col("tgt"))
    assert(w.exceptAll(again).isEmpty && again.exceptAll(w).isEmpty)
  }
}
