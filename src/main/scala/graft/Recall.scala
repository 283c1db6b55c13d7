package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN recall-vs-cost measurement (SURVEY §6 artifact): recall@5 of
  * each shipped ANN composition against the brute-force ground truth
  * on the same probe set, with wall time — so the recall/cost
  * tradeoff is a MEASURED record, not a spec-only claim.
  *
  * Usage: runMain graft.Recall <sfDir> [probeMod]
  * `probeMod` thins the probe set at large SFs (brute truth is
  * probes × corpus — exact, so its cost bounds the measurable SF;
  * the ANN methods themselves run the full linear path).
  * Prints ONE JSON line.
  */
object Recall {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probeMod = if (args.length > 1) args(1).toInt else 17
    val k = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.attach(GraftSession.builder(cpus)
      .master(s"local[$cpus]").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val vecs = Tables.load(spark, dir, "embeddings").localCheckpoint(true)
    val n = vecs.count()
    val probePred = col("vec_id") % probeMod === 0
    val anchorPred = col("vec_id") % 125 === 0
    val kAnchors = vecs.filter(anchorPred).count()
    val bits = Similarity.corpusBits(kAnchors, 4)
    val bitsCorpus = Similarity.corpusBits(n)
    val nProbes = vecs.filter(probePred).count()

    // exact ground truth: same topK ordering rule as every method
    val (truth, truthSec) = timed {
      Similarity.bruteKnn(vecs, "vec_id", "embedding", probePred, k)
        .select(col("probe_id"), col("neighbor_id")).localCheckpoint(true)
    }
    // FILTERED ground truth for s9: per-label brute — the relevant
    // set for a constrained probe is its own partition's true top-k
    // (recall against the unfiltered truth would punish the filter
    // for working). Built from the public brute path per label.
    val labels = vecs.select("label").distinct()
      .collect().map(_.getInt(0)).sorted
    val truthF = labels.map(l =>
        Similarity.bruteKnn(vecs.filter(col("label") === l),
          "vec_id", "embedding", probePred, k))
      .reduce(_ unionByName _)
      .select(col("probe_id"), col("neighbor_id")).localCheckpoint(true)
    val maxPart = vecs.groupBy("label").count()
      .agg(max("count")).head().getLong(0)
    val bitsPart = Similarity.corpusBits(maxPart)

    def recallOf(df: DataFrame, t: DataFrame): Double =
      df.select(col("probe_id"), col("neighbor_id"))
        .join(t, Seq("probe_id", "neighbor_id")).count() / t.count().toDouble

    val methods: Seq[(String, () => DataFrame, DataFrame)] = Seq(
      ("s2_lsh", () => Similarity.lshKnn(vecs, "vec_id", "embedding",
        probePred, k, bitsCorpus), truth),
      // SQ8 (s17): identical candidate structure to s2 — the recall
      // delta vs s2 is the cost of scoring byte codes instead of
      // floats, isolated from every other knob
      ("s17_sq8", () => Similarity.sq8Knn(vecs, "vec_id", "embedding",
        probePred, k, bitsCorpus), truth),
      // SQ8 nominate + exact refine (s19): does the two-stage
      // composition recover the exact-scored recall of s2?
      ("s19_sq8_rerank", () => Similarity.sq8Rerank(vecs, "vec_id",
        "embedding", probePred, k, bitsCorpus), truth),
      ("s6_ivfpq_lsh", () => Similarity.ivfPqKnnLsh(vecs, "vec_id",
        "embedding", anchorPred, probePred, k, bits), truth),
      ("s8_np1", () => Similarity.ivfKnnLsh(vecs, "vec_id", "embedding",
        anchorPred, probePred, k, nprobe = 1, bits = bits), truth),
      ("s8_np2", () => Similarity.ivfKnnLsh(vecs, "vec_id", "embedding",
        anchorPred, probePred, k, nprobe = 2, bits = bits), truth),
      ("s8_np4", () => Similarity.ivfKnnLsh(vecs, "vec_id", "embedding",
        anchorPred, probePred, k, nprobe = 4, bits = bits), truth),
      ("s10_rerank", () => Similarity.pqRerank(vecs, "vec_id", "embedding",
        anchorPred, probePred, k, bits), truth),
      // the r10-VERDICT composition: refine × nprobe — rerank fixes
      // ordering loss, nprobe fixes candidate loss; measured against
      // both parents (expect ≥ s8@np4 and ≥ s10_rerank@np1)
      ("s14_rerank_np4", () => Similarity.pqRerank(vecs, "vec_id",
        "embedding", anchorPred, probePred, k, bits, nprobe = 4), truth),
      // cFactor is the third knob: when the COMPRESSED nomination
      // binds (small-bits regimes where ADC estimate noise drops true
      // neighbors out of the cFactor·k pool), widening the pool
      // toward the probed cells' depth converges the refine path to
      // the raw-vector scan's recall at a fraction of its exact-
      // cosine work
      ("s14_np4_c16", () => Similarity.pqRerank(vecs, "vec_id",
        "embedding", anchorPred, probePred, k, bits, cFactor = 16,
        nprobe = 4), truth),
      // recall-under-filter: does a selective label constraint cost
      // recall at fixed per-part bits? (the number a production
      // vector store quotes for filtered search)
      ("s9_filtered", () => Similarity.lshKnnFiltered(vecs, "vec_id",
        "embedding", "label", probePred, k, bits = bitsPart), truthF),
      // filtered × quantized (s20): does byte-code scoring cost any
      // recall ON TOP of the filter at fixed per-part bits? (compare
      // against s9_filtered — the same candidate structure scored
      // float vs sq8)
      ("s20_sq8_filtered", () => Similarity.sq8KnnFiltered(vecs, "vec_id",
        "embedding", "label", probePred, k, bits = bitsPart), truthF),
      // ensemble fusion: does rank-fusing the high-recall banded list
      // with the IVF list keep the better member's recall?
      ("s13_rrf", () => Similarity.rrfFuse(Seq(
        Similarity.lshKnn(vecs, "vec_id", "embedding", probePred, k,
          bitsCorpus).select("probe_id", "rn", "neighbor_id"),
        Similarity.ivfKnnLsh(vecs, "vec_id", "embedding", anchorPred,
          probePred, k, nprobe = 2, bits = bits)
          .select("probe_id", "rn", "neighbor_id")), k), truth),
      // recall-weighted fusion (s16): the same two lists weighted by
      // their validated sf1 recalls — expect the dilution closed
      // (fused ≥ max of the inputs, i.e. ≈ s2's recall)
      ("s16_rrf_weighted", () => Similarity.rrfFuse(Seq(
        Similarity.lshKnn(vecs, "vec_id", "embedding", probePred, k,
          bitsCorpus).select("probe_id", "rn", "neighbor_id"),
        Similarity.ivfKnnLsh(vecs, "vec_id", "embedding", anchorPred,
          probePred, k, nprobe = 2, bits = bits)
          .select("probe_id", "rn", "neighbor_id")), k,
        weightsMicro = Seq(987000L, 323000L)), truth))

    val results = methods.map { case (name, mk, t) =>
      val (r, sec) = timed {
        val out = mk().localCheckpoint(true) // materialize = the timed work
        recallOf(out, t)
      }
      name -> ((r, sec))
    }
    def r3(v: Double) = math.floor(v * 1000.0 + 0.5) / 1000.0
    val rec = results.map { case (m, (r, _)) => s"\"$m\":${r3(r)}" }
      .mkString("{", ",", "}")
    val secs = results.map { case (m, (_, s)) => s"\"$m\":${r3(s)}" }
      .mkString("{", ",", "}")
    println(s"""{"sf":"$dir","n":$n,"probes":$nProbes,"k":$k,"anchors":$kAnchors,"bits":$bits,"brute_sec":${r3(truthSec)},"recall":$rec,"secs":$secs}""")
    spark.stop()
  }
}
