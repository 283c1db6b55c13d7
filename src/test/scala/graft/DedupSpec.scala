package graft

import graft.operators.{Dedup => D}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  test("minhash LSH candidates catch the true high-jaccard near-dups") {
    val truth = D.ngramJaccard(docs, "doc_id", "text", "n_chars", 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus should contain seeded near-dups")
    val cands = D.minhashCandidates(docs, "doc_id", "text")
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = truth.intersect(cands)
    // LSH with 4 bands of 4 catches ~99% at j>=0.9
    assert(caught.size >= (truth.size * 0.9).toInt,
      s"LSH caught ${caught.size}/${truth.size}")
  }

  test("simhash signatures of near-dups are hamming-close") {
    val sig = D.simhash(docs, "doc_id", "text")
    val pairs = D.ngramJaccard(docs, "doc_id", "text", "n_chars", 0.9)
    val s1 = sig.select(col("doc_id").as("d1"), col("sig").as("sig1"))
    val s2 = sig.select(col("doc_id").as("d2"), col("sig").as("sig2"))
    val ham = pairs.join(s1, "d1").join(s2, "d2")
      .select(bit_count(expr("sig1 ^ sig2")).as("hd"))
      .agg(avg("hd")).collect().head.getDouble(0)
    assert(ham < 8.0, s"avg hamming distance of near-dups was $ham / 32")
  }

  test("d27 catches a straddling duplicated run that d23's aligned spans provably miss") {
    import spark.implicits._
    // doc 1 = a0..a39; doc 2 = 8 own tokens, then a COPY of doc 1's
    // tokens a8..a27 (a 20-token run), then 8 own tokens. The copied
    // run straddles doc 2's 16-token span boundary, so every d23 span
    // containing it also contains non-duplicated remainder tokens —
    // no span matches any doc-1 span.
    val d1tok = (0 until 40).map(i => s"a$i")
    val d2tok = (0 until 8).map(i => s"b$i") ++ d1tok.slice(8, 28) ++
      (0 until 8).map(i => s"c$i")
    val two = Seq((1L, d1tok.mkString(" ")), (2L, d2tok.mkString(" ")))
      .toDF("doc_id", "text")
    val span = D.spanDedup(two, "doc_id", "text", 16)
      .filter(col("doc_id") === 2).head()
    assert(span.getAs[Long]("kept_spans") == span.getAs[Long]("n_spans"),
      "d23 must NOT see the straddle — that is exactly the gap d27 closes")
    val win = D.windowDupStats(two, "doc_id", "text", 16, 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("dup_windows"))).toMap
    // doc 2's windows fully inside the copied run start at offsets
    // 8..12 — exactly 5 aligned pairs with doc 1's windows 8..12
    assert(win(1L) == ((25L, 0L)), s"doc 1 is the first occurrence: $win")
    assert(win(2L) == ((21L, 5L)),
      s"the 20-token straddle must yield 5 duplicated 16-windows: $win")
    // the w+s-1 guarantee boundary: at stride 4 the same run is only
    // caught when its alignment cooperates — stride is a recall lever,
    // 20 >= 16+4-1 so at least one aligned window pair must survive
    val s4 = D.windowDupStats(two, "doc_id", "text", 16, 4)
      .filter(col("doc_id") === 2).head().getAs[Long]("dup_windows")
    assert(s4 >= 1, s"stride-4 must still catch a 20-token run, got $s4")
    // the APPLY side (d28): the interval union of doc 2's dup windows
    // is EXACTLY the copied run — the rewrite removes those 20 tokens
    // and nothing else; the first carrier is uncut
    val rw = D.windowDedupRewrite(two, "doc_id", "text", 16, 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rw(1L) == ((40L, 40L, d1tok.mkString(" "))),
      s"first carrier must be uncut: ${rw(1L)}")
    val expect2 = ((0 until 8).map(i => s"b$i") ++
      (0 until 8).map(i => s"c$i")).mkString(" ")
    assert(rw(2L) == ((36L, 16L, expect2)),
      s"rewrite must remove exactly the 20-token run: ${rw(2L)}")
  }

  test("short docs (<3 tokens): native, SQL, and truncated-shingle forms agree") {
    import spark.implicits._
    val short = Seq((1L, "solo"), (2L, "two words"), (3L, "three word doc"),
      (4L, "a full four tokens")).toDF("doc_id", "text")
      .withColumn("__tk", split(col("text"), " "))
    // native expression vs the exported SQL form (try_element_at +
    // concat_ws truncation): must be value-identical per doc
    val both = short.select(col("doc_id"),
      graft.functions.TextHashes.shingle_hash48(col("__tk")).as("native"),
      expr(s"transform(transform(${D.shingleSql("__tk")}, s -> md5(cast(s as binary))), " +
        "h -> " + (1 to 12).map(i =>
          s"cast(instr('0123456789abcdef', substr(h, $i, 1)) - 1 as bigint) * " +
            s"cast(${math.pow(16, 12 - i).toLong} as bigint)").mkString(" + ") + ")")
        .as("sqlform"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Long](1)} != sql ${r.getSeq[Long](2)}")
    }
    // shingle counts: max(n_tokens - 2, 1)
    val counts = both.select(col("doc_id"), size(col("native")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2))
    // minhash signatures must also not throw / agree in length on short docs
    val sig = D.minhashSignatures(short.drop("__tk"), "doc_id", "text")
    assert(sig.count() == 4)
  }

  test("incremental dedup drops verified corpus near-dups, keeps fresh docs") {
    // the two corpus-side tables a continuous-ingest pipeline maintains
    val corpusBands = D.bands(D.minhashSignatures(docs, "doc_id", "text"), "doc_id")
    val corpusSets = D.shingleSets(docs, "doc_id", "text")
    // batch: an exact re-ingest of doc 3 (new id) + one genuinely new doc
    val dup = docs.filter(col("doc_id") === 3)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"))
    val fresh = spark.sql(
      "SELECT 900001L AS doc_id, 'entirely novel zebra quantum walrus text nobody wrote before' AS text")
    val batch = dup.unionByName(fresh)
    val kept = D.incrementalDedup(corpusBands, corpusSets, "doc_id",
      batch, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(900001L), s"kept $kept")
  }

  test("incremental dedup drops intra-batch near-dups: one survivor per pair") {
    val corpusBands = D.bands(D.minhashSignatures(docs, "doc_id", "text"), "doc_id")
    val corpusSets = D.shingleSets(docs, "doc_id", "text")
    // two near-dup docs arriving in the SAME batch (B = A + one
    // trailing token, shingle jaccard ~28/29) + one genuinely new doc;
    // pre-fix both A and B survived the corpus-only anti-join
    val base = (1 to 30).map(i => s"nonce$i").mkString(" ")
    val batch = spark.sql(
      s"""SELECT * FROM VALUES
         (900010L, '$base'),
         (900011L, '$base trailer'),
         (900012L, 'entirely novel zebra quantum walrus text nobody wrote before')
         AS t(doc_id, text)""")
    val kept = D.incrementalDedup(corpusBands, corpusSets, "doc_id",
      batch, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(900010L, 900012L), s"kept $kept")
  }

  test("connected components resolve a transitive chain to one survivor") {
    import spark.implicits._
    // A~B~C~D path (min label needs diameter rounds to reach the far
    // end) plus a disjoint pair — exactly two components
    val pairs = Seq((3L, 4L), (2L, 3L), (1L, 2L), (10L, 11L))
      .toDF("d1", "d2")
    val cc = D.connectedComponents(pairs, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L), s"labels $cc")
  }

  test("releasePersisted empties the registry; double release is a no-op") {
    D.releasePersisted(spark)
    D.persistedSignatures(docs, "doc_id", "text").count()
    assert(D.registeredCount(spark) >= 1)
    assert(D.releasePersisted(spark) >= 1)
    assert(D.registeredCount(spark) == 0)
    assert(D.releasePersisted(spark) == 0)
  }

  test("clusterRepresentatives keeps the best-quality member, not the min id") {
    import spark.implicits._
    // a 3-doc near-dup chain (10–20 and 20–30 at >=0.9 shingle
    // jaccard) where QUALITY rises with id: doc 30's stopword-rich
    // tail gives it the top t2 score, so the keeper must be 30 —
    // a min-id drop rule would delete it and keep the stopword-free 10
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val planted = Seq(
      (10L, base),
      (20L, base + " the the"),
      (30L, base + " the the the")).toDF("doc_id", "text")
    val scores = graft.operators.TextAnalysis
      .quality(planted, "doc_id", "text").select(col("doc_id"), col("score"))
    val rep = D.clusterRepresentatives(planted, "doc_id", "text", scores, 0.9)
      .collect()
    D.releasePersisted(spark)
    assert(rep.length == 1)
    assert(rep.head.getAs[Long]("comp") == 10L, "component label = min id")
    assert(rep.head.getAs[Long]("keeper") == 30L,
      "keeper must be the best-quality member")
    assert(rep.head.getAs[Long]("n_members") == 3L)
    // a member the score table missed still counts and still loses to
    // any scored member; it must never shrink the cluster
    val partial = scores.filter(col("doc_id") =!= 30L)
    val rep2 = D.clusterRepresentatives(planted, "doc_id", "text",
      partial, 0.9).collect()
    D.releasePersisted(spark)
    assert(rep2.head.getAs[Long]("n_members") == 3L,
      "unscored member silently dropped from its cluster")
    assert(rep2.head.getAs[Long]("keeper") == 20L,
      "keeper must be the best SCORED member when one is unscored")
  }

  test("componentKeepers: STRING ids tie-break to min id (no numeric-cast NULL)") {
    import spark.implicits._
    // the old max_by ordering negated the NODE, which casts a string
    // id to double -> NULL and made equal-score keepers
    // partitioning-dependent; min_by over (-score, node) keeps the
    // tie-break in the id's native ordering
    val cc = Seq(("b", "a"), ("a", "a"), ("c", "a")).toDF("node", "comp")
    val scores = Seq(("a", 0.5), ("b", 0.5), ("c", 0.5))
      .toDF("doc_id", "score")
    val k = D.componentKeepers(cc, scores, "doc_id").collect()
    assert(k.length == 1)
    assert(k.head.getAs[String]("keeper") == "a",
      "equal scores must break to the MIN string id deterministically")
    assert(k.head.getAs[Long]("n_members") == 3L)
  }

  test("exact dedup groups are singletons in a dup-free corpus") {
    val d = D.exact(docs, "doc_id", "text")
    assert(d.count() == docs.count())
    assert(d.agg(max("n")).collect().head.getLong(0) == 1L)
  }

  test("exact dedup collapses true duplicates") {
    val dup = docs.limit(5).unionAll(docs.limit(5))
    val d = D.exact(dup, "doc_id", "text")
    assert(d.count() == 5)
    assert(d.agg(max("n")).collect().head.getLong(0) == 2L)
  }

  test("span dedup: first occurrence kept, later cross-doc copies dropped") {
    import spark.implicits._
    val a = (1 to 16).map(i => s"w$i").mkString(" ")   // span A
    val b = (17 to 32).map(i => s"w$i").mkString(" ")  // span B
    val c = (33 to 48).map(i => s"w$i").mkString(" ")  // span C
    val planted = Seq(
      (1L, s"$a $b"),        // first occurrence of A and B: all kept
      (2L, s"$a $c"),        // A is a copy → 1 of 2 spans kept
      (3L, s"$b $a"),        // both copies → 0 kept
      (4L, (1 to 20).map(i => s"u$i").mkString(" "))) // 16+4 split, unique
      .toDF("doc_id", "text")
    val r = D.spanDedup(planted, "doc_id", "text", 16)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) == ((32L, 2L, 2L, 32L)))
    assert(r(2L) == ((32L, 2L, 1L, 16L)))
    assert(r(3L) == ((32L, 2L, 0L, 0L)))
    assert(r(4L) == ((20L, 2L, 2L, 20L)), "short tail span counts its real length")
    // real corpus: totals consistent, kept ≤ total per doc
    val full = D.spanDedup(docs, "doc_id", "text", 16)
    assert(full.count() == docs.count())
    assert(full.filter(col("kept_spans") > col("n_spans") ||
      col("kept_tokens") > col("n_tok")).count() == 0)
  }

  test("spanDedupRewrite: keeps first occurrences in order, totals agree with the stats") {
    import spark.implicits._
    val a = (1 to 16).map(i => s"w$i").mkString(" ")
    val b = (17 to 32).map(i => s"w$i").mkString(" ")
    val c = (33 to 48).map(i => s"w$i").mkString(" ")
    val planted = Seq(
      (1L, s"$a $b"),   // first occurrences: rewrite = identity
      (2L, s"$a $c"),   // A already seen → keeps only C
      (3L, s"$b $a"),   // both seen → rewrites to ""
      (4L, null.asInstanceOf[String])) // NULL text: total, empty
      .toDF("doc_id", "text")
    val r = D.spanDedupRewrite(planted, "doc_id", "text", 16)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((32L, 32L, s"$a $b")))
    assert(r(2L) == ((32L, 16L, c)), "kept span reassembles in position order")
    assert(r(3L) == ((32L, 0L, "")), "all-duplicate doc rewrites to empty, not absence")
    assert(r(4L) == ((0L, 0L, "")), "NULL text stays total")
    // real corpus: rewrite totals must agree with the d23 stats, and
    // the rewritten text's own token count must equal kept_tokens
    val stats = D.spanDedup(docs, "doc_id", "text", 16)
      .select(col("doc_id"), col("kept_tokens").as("want_kept"))
    val rw = D.spanDedupRewrite(docs, "doc_id", "text", 16)
    assert(rw.join(stats, "doc_id")
      .filter(col("kept_tokens") =!= col("want_kept")).count() == 0)
    val badLen = rw.filter(
      when(col("text_kept") === "", lit(0L))
        .otherwise(size(split(col("text_kept"), " ")).cast("long"))
        =!= col("kept_tokens"))
    assert(badLen.count() == 0, "rewritten token count = kept_tokens")
  }

  test("fuzzyPairs: planted typo found with multiplicities; far pair absent") {
    import spark.implicits._
    val rows = Seq(
      "acme widget", "acme widget", "acme widget",  // n_rows = 3
      "acme widgot",                                 // 1 sub from widget
      "acme wídgét extra",                           // blocked via "acme" but dist 8 > tau
      "zinc bolt", "zinc bolts"                      // dist 1, share "zinc"
    ).toDF("nm")
    val byPair = D.fuzzyPairs(rows, "nm", tau = 2, maxTokenNames = 32)
      .collect().map(r => ((r.getAs[String]("name_a"), r.getAs[String]("name_b")),
        (r.getAs[Long]("dist"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))).toMap
    assert(byPair(("acme widget", "acme widgot")) == ((1L, 3L, 1L)))
    assert(byPair(("zinc bolt", "zinc bolts")) == ((1L, 1L, 1L)))
    // the accented long variant is > tau from everything: absent
    assert(!byPair.keySet.exists { case (a, b) =>
      a.contains("extra") || b.contains("extra") })
  }

  test("fuzzyPairs: stop-token cap drops pervasive-token-only blocks, keeps rare-token pairs") {
    import spark.implicits._
    // "unit" appears in EVERY name (the pervasive token); each pair
    // below is within tau=2 and shares ONLY "unit" except the last,
    // which also shares the rare token "zeta".
    val rows = Seq(
      "unit aa", "unit ab",     // dist 1, shared tokens: only "unit"
      "unit zeta x", "unit zeta y" // dist 1, share rare "zeta"
    ).toDF("nm")
    val capped = D.fuzzyPairs(rows, "nm", tau = 2, maxTokenNames = 3)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // cap=3 < 4 names containing "unit" → "unit" is a stop token;
    // the aa/ab pair loses its only block, the zeta pair survives
    assert(capped == Set(("unit zeta x", "unit zeta y")))
    val uncapped = D.fuzzyPairs(rows, "nm", tau = 2, maxTokenNames = 32)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(uncapped.contains(("unit aa", "unit ab")))
    // the cap counts DISTINCT values containing a token: a value
    // repeating it ("zz zz ab") must not push it over the cap
    import spark.implicits._
    // "zz" is the ONLY shared token: 2 distinct names, 3 occurrences;
    // lev("zz aaaa", "zz zz a") = 3 (three substitutions)
    val repeated = Seq("zz aaaa", "zz zz a").toDF("nm")
    val got = D.fuzzyPairs(repeated, "nm", tau = 3, maxTokenNames = 2)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("zz aaaa", "zz zz a")),
      "2 distinct names ≤ cap 2 — occurrence-counting would drop the block")
  }

  test("fuzzyPairs on parts: ordered pairs, dist bound, weights cover the fact table") {
    val part = Tables.load(spark, TestSpark.sf, "part")
    val p = D.fuzzyPairs(part, "p_name", tau = 3, maxTokenNames = 32)
    assert(p.filter(col("name_a") >= col("name_b")).count() == 0)
    assert(p.filter(col("dist") > 3 || col("dist") < 1).count() == 0)
    assert(p.filter(col("n_a") < 1 || col("n_b") < 1).count() == 0)
    assert(p.count() > 0, "the bounded name domain must contain near pairs")
  }
}
