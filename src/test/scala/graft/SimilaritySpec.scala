package graft

import graft.functions.CosineSimilarity.cosine_sim
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")

  test("native cosine expression is bit-identical to the composable form") {
    val a = emb.select(col("vec_id"), col("embedding"))
    val b = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val pairs = a.join(b, col("vec_id") % 50 === 0 && col("v2") % 71 === 0)
    val diff = pairs.select(
      cosine_sim(col("embedding"), col("e2")).as("native"),
      (Similarity.dot(col("embedding"), col("e2")) /
        (Similarity.norm(col("embedding")) * Similarity.norm(col("e2"))))
        .as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("nullable cosine is bit-identical to the composable try_divide chain") {
    import graft.functions.CosineSimilarity.cosine_sim_nullable
    // float vectors against DOUBLE centroid means — the k-means
    // round-2 shape the native variant exists for
    val cents = emb.groupBy("label").agg(
      array((1 to 64).map(i =>
        avg(element_at(col("embedding"), i))): _*).as("ce"))
    val pairs = emb.crossJoin(cents)
    val diff = pairs.select(
      cosine_sim_nullable(col("embedding"), col("ce")).as("native"),
      try_divide(Similarity.dot(col("embedding"), col("ce")),
        Similarity.norm(col("embedding")) * Similarity.norm(col("ce")))
        .as("composed"))
      .filter(col("native") =!= col("composed") ||
        (col("native").isNull =!= col("composed").isNull))
    assert(diff.count() == 0)
    // degenerate parity: zero-norm and short vectors -> NULL both ways
    import spark.implicits._
    val weird = Seq(
      (Array.fill(64)(0.0f), Array.fill(64)(1.0)),
      (Array.fill(8)(0.5f), Array.fill(64)(1.0))).toDF("a", "b")
    val w = weird.select(
      cosine_sim_nullable(col("a"), col("b")).as("native"),
      try_divide(Similarity.dot(col("a"), col("b")),
        Similarity.norm(col("a")) * Similarity.norm(col("b"))).as("composed"))
      .collect()
    w.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), s"want NULL/NULL: $r"))
  }

  test("native vector functions are SQL-registered on graft sessions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(float(1.0), float(0.0)), array(float(1.0), float(0.0))) AS c, " +
        "dot_product(array(float(2.0)), array(float(3.0))) AS d, " +
        "cosine_sim_nullable(array(float(1.0)), array(float(1.0), float(1.0))) AS n, " +
        // dot_product over mixed float/double inputs (the trained-PQ
        // encode shape) and NULL — not a silent prefix dot — on
        // length mismatch, matching the nullable cosine's contract
        "dot_product(array(float(2.0), float(4.0)), array(double(3.0), double(0.5))) AS dm, " +
        "dot_product(array(float(1.0)), array(float(1.0), float(1.0))) AS dn")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 6.0)
    assert(r.isNullAt(2), "length mismatch must be NULL through the SQL path")
    assert(r.getDouble(3) == 8.0)
    assert(r.isNullAt(4), "dot_product length mismatch must be NULL, not a prefix dot")
  }

  test("sq8 cosine ≡ the composable dequantize-then-cosine chain, bit for bit") {
    import graft.functions.Sq8Cosine.sq8_cosine
    // a hand-built quantizer over 4 dims, codes crossed against
    // themselves; the composable twin dequantizes with transform()
    // and scores with the dot/norm reference chain
    val mn = typedLit(Seq(-1.0, 0.0, 2.5, -3.0))
    val s = typedLit(Seq(0.01, 0.002, 0.0, 0.5))
    val codes = spark.range(0, 40).selectExpr("id",
      """transform(array(id % 7, id % 11, id % 3, id % 255),
         x -> cast(x - 128 as byte)) AS qc""")
    val pairs = codes.crossJoin(
      codes.select(col("id").as("id2"), col("qc").as("qc2")))
    def dq(c: org.apache.spark.sql.Column) = transform(c, (x, i) =>
      element_at(mn, i + 1) +
        (x.cast("double") + 128.0) * element_at(s, i + 1))
    val diff = pairs.select(
      sq8_cosine(col("qc"), col("qc2"), mn, s).as("native"),
      (Similarity.dot(dq(col("qc")), dq(col("qc2"))) /
        (Similarity.norm(dq(col("qc"))) * Similarity.norm(dq(col("qc2")))))
        .as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("sq8 cosine NULL semantics: length mismatch and null element, never a prefix score") {
    val r = spark.sql(
      "SELECT sq8_cosine(array(cast(1 as byte)), array(cast(1 as byte), cast(2 as byte)), " +
        "array(0.0d), array(1.0d)) AS lm, " +
        "sq8_cosine(array(cast(1 as byte), null), array(cast(1 as byte), cast(2 as byte)), " +
        "array(0.0d, 0.0d), array(1.0d, 1.0d)) AS ne, " +
        "sq8_cosine(array(cast(0 as byte), cast(127 as byte)), array(cast(0 as byte), cast(127 as byte)), " +
        "array(0.0d, 0.0d), array(1.0d, 1.0d)) AS self")
      .collect().head
    assert(r.isNullAt(0), "length mismatch must be NULL")
    assert(r.isNullAt(1), "null element must be NULL")
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("sq8 knn: planted exact copy ranks first at cos 1.0; scores within quantization error of exact") {
    import spark.implicits._
    // identical vectors quantize to identical codes — the copy must
    // score exactly 1.0 (after 6dp rounding) at rank 1
    val base = emb.filter(col("vec_id") < 120)
      .select(col("vec_id"), col("embedding"))
    val copy = base.filter(col("vec_id") === 17)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val planted = base.unionByName(copy)
    val k = Similarity.sq8Knn(planted, "vec_id", "embedding",
      col("vec_id") === 17, 3, bits = 4)
    val top = k.filter(col("rn") === 1)
      .select("neighbor_id", "cos6").as[(Long, Double)].collect()
    assert(top.toSeq == Seq((100017L, 1.0)), top.toSeq.toString)
    // and on real data every sq8 score sits within quantization error
    // of the exact cosine of the same pair
    val q = Similarity.sq8Knn(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 5)
      .select(col("probe_id"), col("neighbor_id"), col("cos6").as("q6"))
    val withExact = q
      .join(emb.select(col("vec_id").as("probe_id"), col("embedding").as("pe")), "probe_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .select(col("q6"), Similarity.cosR(col("pe"), col("ne")).as("e6"))
    val worst = withExact.agg(max(abs(col("q6") - col("e6")))).collect().head.getDouble(0)
    assert(worst < 0.02, s"quantization error $worst exceeds the SQ8 budget")
  }

  test("sq8 rerank: final scores are EXACT cosines (quantization error refined away); copy at rank 1") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") < 120)
      .select(col("vec_id"), col("embedding"))
    val copy = base.filter(col("vec_id") === 17)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val planted = base.unionByName(copy)
    val r = Similarity.sq8Rerank(planted, "vec_id", "embedding",
      col("vec_id") === 17, 3, bits = 4)
    assert(r.filter(col("rn") === 1).select("neighbor_id", "cos6")
      .as[(Long, Double)].collect().toSeq == Seq((100017L, 1.0)))
    // every refined score equals the exact cosine of that pair — the
    // quantized estimate is provably gone from the output
    val q = Similarity.sq8Rerank(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 5)
    val bad = q
      .join(emb.select(col("vec_id").as("probe_id"), col("embedding").as("pe")), "probe_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .filter(col("cos6") =!= Similarity.cosR(col("pe"), col("ne")))
    assert(bad.count() == 0)
  }

  test("cosine of a vector with itself is 1") {
    val selfs = emb.select(cosine_sim(col("embedding"), col("embedding")).as("c"))
      .agg(min("c").as("lo"), max("c").as("hi")).collect().head
    assert(math.abs(selfs.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(selfs.getDouble(1) - 1.0) < 1e-9)
  }

  test("brute knn returns k ranked neighbors per probe") {
    val k = Similarity.bruteKnn(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 3)
    val per = k.groupBy("probe_id").agg(count(lit(1)).as("n"),
      max("rn").as("maxrn"))
    assert(per.filter(col("n") =!= 3 || col("maxrn") =!= 3).count() == 0)
    // ranks strictly ordered by cos6 desc within probe
    val bad = k.withColumn("prev",
      lag("cos6", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy("rn")))
      .filter(col("prev").isNotNull && col("prev") < col("cos6"))
    assert(bad.count() == 0)
  }

  test("filtered ANN: pre-filter = exact top-k among MATCHING vectors; post-filtering an unfiltered top-k provably loses results; IVF ≡ brute within reach") {
    val probeP = col("vec_id") % 100 === 0
    val candP = col("label") === 1
    // PRE-filtered brute = the ground truth: top-3 among label-1 only
    val pre = Similarity.bruteKnn(emb, "vec_id", "embedding", probeP, 3,
      candPred = Some(candP))
    assert(pre.join(emb.filter(!candP).select(col("vec_id")
        .as("neighbor_id")), Seq("neighbor_id"), "left_semi").isEmpty,
      "no non-matching neighbor may ever surface")
    val perProbe = pre.groupBy("probe_id").count()
    assert(perProbe.filter(col("count") =!= 3).count() == 0,
      "a 10%-selective filter over this corpus still fills k=3")
    // the POST-filter collapse, measured: filter the UNFILTERED top-3
    // afterwards — some probe keeps fewer than 3 (whenever < 3 of its
    // global winners carry label 1), the recall hole pre-filtering
    // exists to close
    val post = Similarity.bruteKnn(emb, "vec_id", "embedding", probeP, 3)
      .join(emb.filter(candP).select(col("vec_id").as("neighbor_id")),
        Seq("neighbor_id"), "left_semi")
    val short = perProbe.select(col("probe_id"))
      .join(post.groupBy("probe_id").count().filter(col("count") === 3),
        Seq("probe_id"), "left_anti")
    assert(short.count() > 0,
      "fixture must exhibit the post-filter loss (≈ every probe: " +
        "3 of 3 global winners all label-1 is a ~0.1% event)")
    // filtered IVF ≡ filtered brute WITHIN the probed cells: every
    // returned neighbor is exact, and equals brute when brute's
    // winners live in reach (spot-check: the IVF result is a subset
    // of the filtered-brute ranking domain and carries exact cosines)
    val ivf = Similarity.ivfKnn(emb, "vec_id", "embedding",
      col("vec_id") % 125 === 0 && col("vec_id") < 8000, probeP, 3,
      nprobe = 2, candPred = Some(candP))
    assert(ivf.join(emb.filter(!candP).select(col("vec_id")
        .as("neighbor_id")), Seq("neighbor_id"), "left_semi").isEmpty)
    // exactness of scores: IVF's (probe, neighbor, cos6) triples are
    // a subset of the full filtered score table
    val truth = Similarity.bruteKnn(emb, "vec_id", "embedding", probeP,
      1000000, candPred = Some(candP))
      .select("probe_id", "neighbor_id", "cos6")
    assert(ivf.select("probe_id", "neighbor_id", "cos6")
      .exceptAll(truth).isEmpty,
      "every filtered-IVF hit must carry the exact filtered cosine")
  }

  test("lsh candidates share a (table, bucket-or-Hamming-1) with the probe") {
    val lsh = Similarity.lshKnn(emb, "vec_id", "embedding",
      col("vec_id") % 100 === 0, 5)
    def bandsOf(pred: org.apache.spark.sql.Column, as: String) =
      emb.filter(pred).select(col("vec_id").as(as),
        array((0 until Similarity.LSH_TABLES).map(t =>
          Similarity.tableBucket(col("embedding"), t)): _*).as(s"${as}_b"))
    val joined = lsh
      .join(bandsOf(lit(true), "neighbor_id"), "neighbor_id")
      .join(bandsOf(col("vec_id") % 100 === 0, "probe_id"), "probe_id")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val nb = r.getAs[scala.collection.Seq[Int]]("neighbor_id_b")
      val pb = r.getAs[scala.collection.Seq[Int]]("probe_id_b")
      val ok = nb.indices.exists { t =>
        val x = nb(t) ^ pb(t)
        x == 0 || (x & (x - 1)) == 0 // equal or Hamming-1
      }
      assert(ok, s"pair $r shares no probed bucket")
    }
  }

  test("wide LSH recovers planted near-dups with bounded candidate work") {
    // plant near-identical copies of every 10th vector (cos >= ~0.99):
    // the multi-table + multi-probe setting must find them even though
    // each 12-bit table is far too selective on its own
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
        transform(col("embedding"), x => (x * 1.02d + 0.013d).cast("float"))
          .as("embedding"))
    val corpus = emb.unionByName(planted)
    val top1 = Similarity.lshKnn(corpus, "vec_id", "embedding",
      col("vec_id") >= 1000000, 1)
    val hits = top1.filter(col("rn") === 1 &&
      col("probe_id") - 1000000 === col("neighbor_id")).count()
    val nPlanted = planted.count()
    assert(hits >= (nPlanted * 8) / 10,
      s"recall ${hits}/$nPlanted below 0.8")
    // probe work stays bounded: candidates examined << |Q| x |corpus|
    val nCand = Similarity.lshKnn(corpus, "vec_id", "embedding",
      col("vec_id") >= 1000000, Int.MaxValue).count()
    assert(nCand < nPlanted * corpus.count() / 5,
      s"candidate set $nCand not selective")
  }

  test("IVF-PQ surfaces planted exact copies in the estimate top-k") {
    // an exact copy shares every PQ code with its source, and the
    // source's codes are the per-subspace argmax for the probe's own
    // subvectors — so NO vector can out-score the source in the ADC
    // estimate (ties only with identically-coded vectors), and the
    // copy lands in the same IVF cell (cosine ties break identically)
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
        col("embedding"))
    val corpus = emb.unionByName(copies)
    val top = Similarity.ivfPqKnn(corpus, "vec_id", "embedding",
      col("vec_id") % 125 === 0, col("vec_id") >= 1000000, 5)
    val hits = top.filter(col("probe_id") - 1000000 === col("neighbor_id"))
      .count()
    val n = copies.count()
    assert(hits >= (n * 8) / 10, s"PQ recall $hits/$n below 0.8")
  }

  test("multi-probe IVF: nprobe=2 recall dominates nprobe=1 against brute truth") {
    val probePred = col("vec_id") % 17 === 0
    val anchorPred = col("vec_id") % 125 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteKnn(emb, "vec_id", "embedding",
      probePred, 5))
    val r1 = pairs(Similarity.ivfKnn(emb, "vec_id", "embedding",
      anchorPred, probePred, 5)).intersect(truth).size
    val r2 = pairs(Similarity.ivfKnn(emb, "vec_id", "embedding",
      anchorPred, probePred, 5, nprobe = 2)).intersect(truth).size
    // widening the probed cell set can only add candidates: recall is
    // monotone in nprobe, and on this corpus strictly better coverage
    // of the truth set is expected to at least hold
    assert(r2 >= r1, s"nprobe=2 recall $r2 fell below nprobe=1 $r1")
    assert(r2 * 10 >= truth.size * 5, s"nprobe=2 recall $r2/${truth.size} below 0.5")
  }

  test("banded multi-probe IVF: recall knob works on the linear path too") {
    // same contract as the brute multi-probe test, on ivfKnnLsh (the
    // shipped composition: LSH-banded assignment × nprobe): widening
    // the probed cell set is monotone in recall vs brute truth
    val probePred = col("vec_id") % 17 === 0
    val anchorPred = col("vec_id") % 125 === 0
    val bits = Similarity.corpusBits(emb.filter(anchorPred).count(), 4)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteKnn(emb, "vec_id", "embedding",
      probePred, 5))
    val r1 = pairs(Similarity.ivfKnnLsh(emb, "vec_id", "embedding",
      anchorPred, probePred, 5, nprobe = 1, bits = bits)).intersect(truth).size
    val r2 = pairs(Similarity.ivfKnnLsh(emb, "vec_id", "embedding",
      anchorPred, probePred, 5, nprobe = 2, bits = bits)).intersect(truth).size
    assert(r2 >= r1, s"banded nprobe=2 recall $r2 fell below nprobe=1 $r1")
    assert(r2 * 10 >= truth.size * 5,
      s"banded nprobe=2 recall $r2/${truth.size} below 0.5")
  }

  test("LSH-assigned IVF-PQ surfaces planted exact copies in the estimate top-k") {
    // same recall property as the brute-quantizer composition: an
    // exact copy shares every band bucket with its source (collides
    // in ALL tables), so probe and source land in the SAME cell even
    // under approximate assignment, and the shared-code ADC argument
    // carries over unchanged
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
        col("embedding"))
    val corpus = emb.unionByName(copies)
    val top = Similarity.ivfPqKnnLsh(corpus, "vec_id", "embedding",
      col("vec_id") % 125 === 0, col("vec_id") >= 1000000, 5,
      bits = 2)
    val hits = top.filter(col("probe_id") - 1000000 === col("neighbor_id"))
      .count()
    val n = copies.count()
    assert(hits >= (n * 8) / 10, s"LSH IVF-PQ recall $hits/$n below 0.8")
  }

  test("re-rank stage: exact copies score cos 1.0 at rank 1; recall ≥ the ADC ranking") {
    // the refine-stage property: ADC quantization can demote a true
    // neighbor WITHIN the candidate list; exact re-scoring restores
    // it. A planted exact copy that survives candidate generation
    // must re-rank to position 1 with an exact 1.0 cosine — the ADC
    // estimate can only approximate that.
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
        col("embedding"))
    val corpus = emb.unionByName(copies)
    val probeP = col("vec_id") >= 1000000
    val rerank = Similarity.pqRerank(corpus, "vec_id", "embedding",
      col("vec_id") % 125 === 0, probeP, 5, bits = 2)
    val adc = Similarity.ivfPqKnnLsh(corpus, "vec_id", "embedding",
      col("vec_id") % 125 === 0, probeP, 5, bits = 2)
    val n = copies.count()
    def recallOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("probe_id") - 1000000 === col("neighbor_id")).count()
    val rr = recallOf(rerank)
    assert(rr >= recallOf(adc),
      "exact re-ranking must not lose neighbors the ADC ranking found")
    assert(rr >= (n * 8) / 10, s"re-rank recall $rr/$n below 0.8")
    // every surfaced copy ranks FIRST with an exact 1.0 cosine
    val copyRows = rerank.filter(col("probe_id") - 1000000 === col("neighbor_id"))
    assert(copyRows.filter(col("rn") =!= 1 || col("cos6") =!= 1.0).count() == 0,
      "an exact copy must re-rank to position 1 at cosine 1.0")
  }

  test("refine × nprobe: widening the nomination stage is monotone in recall") {
    // the production composition (VERDICT r10 #1): rerank fixes
    // ordering loss, nprobe fixes candidate loss. Against brute
    // truth, pqRerank at nprobe=2 must dominate nprobe=1 — the wider
    // nomination can only ADD candidate cells, and the exact re-rank
    // scores both candidate sets with the same metric.
    val probePred = col("vec_id") % 17 === 0
    val anchorPred = col("vec_id") % 125 === 0
    val bits = Similarity.corpusBits(emb.filter(anchorPred).count(), 4)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteKnn(emb, "vec_id", "embedding",
      probePred, 5))
    val r1 = pairs(Similarity.pqRerank(emb, "vec_id", "embedding",
      anchorPred, probePred, 5, bits, nprobe = 1)).intersect(truth).size
    val r2 = pairs(Similarity.pqRerank(emb, "vec_id", "embedding",
      anchorPred, probePred, 5, bits, nprobe = 2)).intersect(truth).size
    assert(r2 >= r1, s"rerank nprobe=2 recall $r2 fell below nprobe=1 $r1")
  }

  test("weighted RRF: equal micro weights ≡ unweighted bit-for-bit; refusals by name") {
    val probePred = col("vec_id") % 17 === 0
    val anchorPred = col("vec_id") % 125 === 0
    val bits = Similarity.corpusBits(emb.filter(anchorPred).count(), 4)
    val la = Similarity.lshKnn(emb, "vec_id", "embedding", probePred, 5,
        bits = Similarity.corpusBits(emb.count()))
      .select("probe_id", "rn", "neighbor_id").localCheckpoint(true)
    val lb = Similarity.ivfKnnLsh(emb, "vec_id", "embedding", anchorPred,
        probePred, 5, nprobe = 2, bits = bits)
      .select("probe_id", "rn", "neighbor_id").localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // 1000000 micro = weight 1.0: the weighted form must reproduce
    // the unweighted scores exactly (same integer division), so a
    // caller migrating to weights cannot silently change results
    assert(rows(Similarity.rrfFuse(Seq(la, lb), 5,
        weightsMicro = Seq(1000000L, 1000000L))) ==
      rows(Similarity.rrfFuse(Seq(la, lb), 5)))
    // recall-weighted fusion keeps the dominant list's members: with
    // w_a/(c+k) > w_b/(c+1), every a-listed neighbor outscores every
    // b-only neighbor, so the fused top-5 ⊆ a's members ∪ (a∩b)
    val aSet = la.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val fused = Similarity.rrfFuse(Seq(la, lb), 5,
        weightsMicro = Seq(987000L, 323000L))
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // (restricted to probes where a's list is FULL — with fewer than
    // k a-members, b-only candidates legitimately fill the tail)
    val fullProbes = aSet.groupBy(_._1).filter(_._2.size == 5).keySet
    val stray = fused.filter(p => fullProbes.contains(p._1) && !aSet.contains(p))
    assert(stray.isEmpty,
      s"dominant-weighted fusion must keep the dominant list's members " +
        s"for probes it covers: ${stray.toSeq}")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq(la, lb), 5, weightsMicro = Seq(1000000L))
    }
    assert(e1.getMessage.contains("RRF FUSE REFUSED"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq(la, lb), 5, weightsMicro = Seq(0L, 1000000L))
    }
    assert(e2.getMessage.contains("RRF FUSE REFUSED") &&
      e2.getMessage.contains("positive"))
  }

  test("PQ codebook cardinality is FIXED: K·m bound holds when the corpus doubles") {
    // the scale property the trained codebook exists for — the old
    // anchor-subset demo codebook had K ∝ |corpus|, making encode
    // |corpus|·m·K super-linear
    val cb1 = Similarity.trainPqCodebook(emb, "vec_id", "embedding", 64, 8, 8)
    val doubled = emb.unionByName(emb.select(
      (col("vec_id") + 2000000).as("vec_id"), col("label"), col("embedding")))
    val cb2 = Similarity.trainPqCodebook(doubled, "vec_id", "embedding", 64, 8, 8)
    assert(cb1.count() <= 64 * 8, "codebook exceeds K*m")
    assert(cb2.count() <= 64 * 8, "codebook must not grow with the corpus")
    val shape = cb1.select(max("k").as("mk"), max("m").as("mm"),
      min(size(col("cvec"))).as("lo"), max(size(col("cvec"))).as("hi"))
      .collect().head
    assert(shape.getInt(0) < 64 && shape.getInt(1) < 8)
    assert(shape.getInt(2) == 8 && shape.getInt(3) == 8,
      "every codeword is a d-dim double vector")
  }

  test("semDedup drops planted paraphrase-level near-dups, keeps distinct vectors") {
    // plant a near-identical copy of every 10th vector (the
    // "paraphrase" no lexical dedup can see); semantic dedup over the
    // k-means cells must drop the copies and keep everything else.
    // An exact-scale copy lands in the SAME cell as its source (cosine
    // to every centroid is scale-invariant, identical tie-breaks), so
    // within-cell mining is guaranteed to see each planted pair.
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
        transform(col("embedding"), x => (x * 1.01d).cast("float"))
          .as("embedding"))
    val corpus = emb.unionByName(planted)
    val kept = Similarity.semDedup(corpus, "vec_id", "embedding",
      col("vec_id") % 125 === 0, 0.995)
    val survivors = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    val plantedIds = planted.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.intersect(survivors).isEmpty,
      s"${plantedIds.intersect(survivors).size} planted copies survived")
    // nothing else may be dropped at a 0.995 threshold: the original
    // corpus carries no pairs that close (verified via nearDupPairsLsh
    // elsewhere at far lower thresholds)
    assert(survivors.size == corpus.count() - plantedIds.size,
      s"${corpus.count() - plantedIds.size - survivors.size} innocents dropped")
  }

  test("LSH-assigned semDedup: total, deterministic, and drops planted near-dups") {
    // the scaled copy shares every sign-LSH band with its source
    // (x_a >= x_b is invariant under positive scaling), so source and
    // copy see IDENTICAL candidate centroids — fallback or not — and
    // land in the same cell: the planted pair is always mined
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
        transform(col("embedding"), x => (x * 1.01d).cast("float"))
          .as("embedding"))
    val corpus = emb.unionByName(planted)
    val kept = Similarity.semDedupLsh(corpus, "vec_id", "embedding",
      col("vec_id") % 125 === 0, 0.995, bits = 2)
    val survivors = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    val plantedIds = planted.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.intersect(survivors).isEmpty,
      s"${plantedIds.intersect(survivors).size} planted copies survived")
    assert(survivors.size == corpus.count() - plantedIds.size,
      s"${corpus.count() - plantedIds.size - survivors.size} innocents dropped")
    // assignment totality: band candidates OR exact fallback — a
    // vector can land in a worse cell, never in no cell / two cells
    val asg = Similarity.kmeansAssignLsh(emb, "vec_id", "embedding",
      col("vec_id") % 125 === 0, iters = 2, bits = 2)
    assert(asg.count() == emb.count() &&
      asg.select("vec_id").distinct().count() == emb.count())
    // and deterministic: two independent builds agree row-for-row
    val asg2 = Similarity.kmeansAssignLsh(emb, "vec_id", "embedding",
      col("vec_id") % 125 === 0, iters = 2, bits = 2)
    assert(asg.exceptAll(asg2).count() == 0 && asg2.exceptAll(asg).count() == 0)
  }

  test("LSH-blocked near-dup pairs find every planted exact duplicate") {
    // an exact copy shares every band bucket, so it collides in ALL
    // tables: recall on exact dups is 1.0 by construction, not chance
    val copies = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
        col("embedding"))
    val corpus = emb.unionByName(copies)
    val pairs = Similarity.nearDupPairsLsh(corpus, "vec_id", "embedding", 0.999)
    val found = pairs.filter(col("v2") - 1000000 === col("v1")).count()
    assert(found == copies.count(), s"found $found of ${copies.count()} dups")
    // and the pair set is deduped: no (v1, v2) appears twice
    assert(pairs.groupBy("v1", "v2").count().filter(col("count") > 1).count() == 0)
  }

  test("filtered ANN ≡ per-label lshKnn; every neighbor shares the probe's label") {
    val bits = 3
    val filtered = Similarity.lshKnnFiltered(emb, "vec_id", "embedding",
      "label", col("vec_id") % 17 === 0, 5, bits = bits)
    // label purity: join both sides' labels and compare
    val lbl = emb.select(col("vec_id"), col("label"))
    val labeled = filtered
      .join(lbl.withColumnRenamed("vec_id", "probe_id")
        .withColumnRenamed("label", "pl"), "probe_id")
      .join(lbl.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nl"), "neighbor_id")
    assert(labeled.filter(col("pl") =!= col("nl")).count() == 0)
    // per-part banding ≡ running the unfiltered machinery on each
    // label subset separately (same band functions, same bits): the
    // candidate sets — and so the exact top-k — must coincide
    val labels = emb.select("label").distinct().collect().map(_.getInt(0))
    val perLabel = labels.map { l =>
      Similarity.lshKnn(emb.filter(col("label") === l), "vec_id",
        "embedding", col("vec_id") % 17 === 0, 5, bits = bits)
    }.reduce(_ unionAll _)
    assert(filtered.exceptAll(perLabel).count() == 0)
    assert(perLabel.exceptAll(filtered).count() == 0)
  }
}
