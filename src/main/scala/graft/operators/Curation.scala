package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the pipeline the individual operators
  * exist to compose, in the order production corpus builds run it:
  *
  *   1. PII scrub        ([[TextAnalysis.scrubbedText]] — in place;
  *                        FIRST so docs identical up to their PII
  *                        dedup together, and nothing downstream ever
  *                        sees an unscrubbed byte)
  *   2. quality filter   ([[TextAnalysis.filterChain]])
  *   3. exact dedup      ([[Dedup.exact]] — min-id survivor per digest)
  *   4. near-dup dedup   ([[Dedup.verifiedPairs]] →
  *                        [[Dedup.connectedComponents]] — one survivor
  *                        per transitive cluster)
  *   4b. semantic dedup  (OPTIONAL, when an embeddings table is given:
  *                        [[Similarity.semDedupLsh]] over k-means cells —
  *                        drops paraphrase-level duplicates lexical
  *                        dedup can't see)
  *   4c. perplexity prune (OPTIONAL, `pplKeepDeciles`: CCNet's LM
  *                        pruning — train [[TextAnalysis.lmScore]]'s
  *                        bigram model on the deduped survivors, keep
  *                        the best k of 10 avg-log-prob deciles;
  *                        after dedup so duplicate mass can't skew
  *                        the model)
  *   5. decontamination  ([[TextAnalysis.contaminationAgainst]] vs a
  *                        held-out eval table)
  *   6. stratified mix   ([[Sampling.stratifiedSample]])
  *   7. split assignment (deterministic md5 mod 10 → train/val/test)
  *
  * Every stage is deterministic in document keys, so the whole
  * pipeline is engine/run/partitioning-invariant and idempotent —
  * re-running over the same input produces the same corpus. Stage
  * order matters and is the cheap-to-expensive order: the quality
  * filter is map-only and drops rows before anything shuffles; exact
  * dedup shuffles 16-byte digests; only the survivors reach the
  * LSH band join (the most expensive stage); decontamination is
  * map-only against a broadcast digest array; sampling and split are
  * map-only. At 100 TB each boundary shrinks the data the next, more
  * expensive stage sees.
  *
  * Returns (curated docs + `split` column, audit report). The report
  * is one row per stage — (stage, docs_in, docs_out) — the artifact a
  * corpus build publishes next to the corpus.
  */
object Curation {

  /** `tokenBudget`: when set, the mixing stage becomes token-budget
    * mixing ([[Sampling.mixToBudget]] with `rates` reinterpreted as
    * stratum WEIGHTS) instead of fixed-rate stratified sampling —
    * "curate this corpus down to ~B tokens at these source weights"
    * as one pipeline argument.
    *
    * `embeddings`: when set — an (embId, embCol) table mapping doc
    * keys to vectors — a `semantic_dedup` stage ([[Similarity.semDedupLsh]],
    * SemDeDup over k-means cells) runs AFTER the lexical near-dup
    * stage: it removes the paraphrase-level duplicates that share no
    * shingles and so pass every lexical dedup, and runs after it so
    * only lexical survivors pay the embedding-space pass. Seeds are a
    * deterministic [[Sampling.hashFrac]] sample at `semSeedRate`, so
    * cell count grows with the corpus (the SemDeDup scale rule);
    * choose `semSeedRate` ≳ 125/|corpus| — an empty seed sample
    * leaves no cells and the stage keeps everything. A doc with no
    * embedding row cannot be judged and is KEPT — the stage never
    * silently drops unembedded docs.
    *
    * `maxDupWindowFrac`: when set, a `window_dup_filter` stage runs
    * after the span rewrite: documents whose d27 overlapping-window
    * duplication fraction ([[Dedup.windowDupStats]] at `dupWindow`
    * tokens, stride 1) exceeds the cap are DROPPED — the
    * boilerplate-mass rule for duplication that straddles span
    * boundaries; first-occurrence keep means a passage's first
    * carrier always survives.
    *
    * `windowDedup`: when set, a `window_dedup` stage rewrites each
    * surviving doc IN PLACE through [[Dedup.windowDedupRewrite]]
    * (the Lee et al. cut — drop exactly the tokens of
    * later-occurrence duplicated `windowDedup`-token windows at
    * stride 1), after `window_dup_filter` when both are on: the
    * filter drops mostly-boilerplate docs, the rewrite strips
    * residual duplicated runs from the keepers.
    *
    * `keepBestQuality`: when true, the near-dup stage keeps each
    * cluster's highest-QUALITY member ([[Dedup.clusterRepresentatives]]'
    * rule over [[TextAnalysis.quality]]'s score, ties → min id)
    * instead of the min id — the RefinedWeb keep rule, so the clean
    * copy survives its boilerplate twins. Scores are computed on the
    * stage's own (scrubbed, quality-filtered) input, so the judged
    * text is exactly the text being kept. */
  def curate(docs: DataFrame, id: String, text: String, stratum: Column,
      evalDocs: DataFrame, jaccard: Double = 0.9, maxContam: Double = 0.2,
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      tokenBudget: Option[Double] = None,
      embeddings: Option[DataFrame] = None,
      embId: String = "vec_id", embCol: String = "embedding",
      semCosine: Double = 0.995,
      semSeedRate: Double = 0.008,
      keepBestQuality: Boolean = false,
      pplKeepDeciles: Option[Int] = None,
      spanDedup: Option[Int] = None,
      maxDupWindowFrac: Option[Double] = None,
      dupWindow: Int = 16,
      windowDedup: Option[Int] = None,
      dsirTarget: Option[Column] = None,
      weightedCapN: Option[Int] = None): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val report = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    // each stage output is persisted before it is counted, the
    // predecessor unpersisted after, and the out-count carried forward
    // as the next in-count — one evaluation per stage rather than the
    // naive shape where every count re-runs the whole upstream chain
    var cur = docs
    var curCount = docs.count()
    var prevOwned: Option[DataFrame] = None
    def stage(name: String)(f: DataFrame => DataFrame): Unit = {
      val out = f(cur).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val outCount = out.count()
      report += ((name, curCount, outCount))
      prevOwned.foreach(_.unpersist(false))
      prevOwned = Some(out)
      cur = out
      curCount = outCount
    }

    stage("pii_scrub") { d =>
      // map-only in-place rewrite: docs_in == docs_out by construction
      d.withColumn(text, TextAnalysis.scrubbedText(col(text)))
    }
    stage("quality_filter") { d =>
      d.join(TextAnalysis.filterChain(d, id, text)
        .filter(col("verdict") === "keep").select(id), id)
    }
    stage("exact_dedup") { d =>
      d.join(Dedup.exact(d, id, text).select(col("keeper").as(id)), id)
    }
    stage("neardup_dedup") { d =>
      // persist = true: this IS the corpus-scale path — both verify-join
      // sides must read one computed signature/shingle copy
      val pairs = Dedup.verifiedPairs(d, id, text, jaccard)
      val cc = Dedup.connectedComponents(pairs, "d1", "d2")
      val drops =
        if (keepBestQuality) {
          // the ONE keeper rule ([[Dedup.componentKeepers]]): best
          // t2-quality member per cluster, ties → min id. Partial-agg
          // argmax then a fact-dim join back — never a per-cluster
          // collected array (a pathological million-member cluster
          // must stay row-shaped).
          val sc = TextAnalysis.quality(d, id, text)
            .select(col(id), col("score"))
          val keep = Dedup.componentKeepers(cc, sc, id)
            .select(col("comp"), col("keeper").as("__keep"))
          cc.join(keep, "comp")
            .filter(col("node") =!= col("__keep"))
            .select(col("node").as(id))
        } else
          cc.filter(col("node") =!= col("comp")).select(col("node").as(id))
      d.join(drops, Seq(id), "left_anti")
    }
    spanDedup.foreach { spanLen =>
      stage("span_dedup") { d =>
        // cross-document span REWRITE (d26's operator): doc-level
        // dedup above removed whole-document copies; this strips the
        // residual repeated spans (boilerplate/quotes) from the
        // survivors' TEXT, so the later text-judging stages
        // (ppl_prune, decontaminate) and the token-budget mix see
        // the cleaned corpus. In-place rewrite: docs_in == docs_out
        // by construction — an all-duplicate doc becomes an empty
        // string here and the judging stages decide its fate.
        d.drop(text).join(
          Dedup.spanDedupRewrite(d, id, text, spanLen)
            .select(col(id), col("text_kept").as(text)), Seq(id))
      }
    }
    maxDupWindowFrac.foreach { maxFrac =>
      stage("window_dup_filter") { d =>
        // d27's overlapping-window signal as a DROP rule: a doc whose
        // duplicated-window fraction exceeds the cap is mostly text
        // seen EARLIER in the corpus — boilerplate/template mass that
        // straddles span boundaries, which doc-level dedup kept (the
        // docs as wholes differ) and aligned span_dedup under-counts.
        // Drop, not rewrite (the rewrite seat is span_dedup's); the
        // first-occurrence rule means the first carrier of a popular
        // passage always survives, so the stage can never drop a
        // passage's every copy.
        val stats = Dedup.windowDupStats(d, id, text, dupWindow)
        val drops = stats.filter(col("n_windows") > 0 &&
            col("dup_windows") * 1.0 / col("n_windows") > maxFrac)
          .select(id)
        d.join(drops, Seq(id), "left_anti")
      }
    }
    windowDedup.foreach { w =>
      stage("window_dedup") { d =>
        // Lee et al.'s actual cut as a pipeline seat (d28's operator,
        // the REWRITE complement of window_dup_filter's drop rule):
        // each surviving doc loses exactly the tokens covered by its
        // later-occurrence duplicated windows — the duplicated run
        // itself, wherever it straddles span boundaries — keeping
        // the rest in order. Runs AFTER the filter stage (when both
        // are on): the filter drops the mostly-boilerplate docs
        // outright, the rewrite strips the residual runs from the
        // keepers, so the later text-judging stages (ppl_prune,
        // decontaminate) and the token-budget mix see the cleaned
        // text. In-place: docs_in == docs_out by construction; the
        // map-side interval cut never shuffles a token row (the r11
        // re-plan). First-occurrence keep: a passage's first carrier
        // is never cut.
        d.drop(text).join(
          Dedup.windowDedupRewrite(d, id, text, w)
            .select(col(id), col("text_kept").as(text)), Seq(id))
      }
    }
    embeddings.foreach { embTab =>
      stage("semantic_dedup") { d =>
        // restrict to the lexical survivors' vectors, then SemDeDup;
        // drops = embedded docs that did NOT survive (anti of the
        // survivor set), so unembedded docs are untouched
        val vecs = embTab.select(col(embId).as("__eid"), col(embCol).as("__e"))
          .join(d.select(col(id).as("__eid")), Seq("__eid"), "left_semi")
        // the LSH-assigned SemDeDup (d16's operator): the Lloyd
        // assignment stays linear when the seed count — k ∝ corpus
        // under the constant-cell-size rule — grows; bits sized from
        // the seed count (one cheap count on the survivor vectors)
        val seedPred = Sampling.hashFrac(col("__eid")) < semSeedRate
        val bits = Similarity.corpusBits(vecs.filter(seedPred).count(), 4)
        val kept = Similarity.semDedupLsh(vecs, "__eid", "__e",
          seedPred, semCosine, bits)
        val drops = vecs.select("__eid")
          .join(kept.select("__eid"), Seq("__eid"), "left_anti")
        d.join(drops, col(id) === col("__eid"), "left_anti")
      }
    }
    pplKeepDeciles.foreach { k =>
      stage("ppl_prune") { d =>
        // CCNet's perplexity pruning (t13's decile rule inside the
        // pipeline): train the bigram LM on the deduped survivors,
        // keep the top-k deciles by avg log-prob. Runs AFTER dedup so
        // duplicate mass can't skew the model it is judged by. A doc
        // with no bigrams can't be judged and is KEPT (the
        // semantic_dedup unembedded-doc rule). ntile ranks NARROW
        // (id, score) rows; the 100 TB form swaps in broadcast
        // approx-quantile cutpoints (see t13's scaladoc).
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("avg_ll").desc, col(id))
        val scored = TextAnalysis.lmScore(d, id, text)
        val keep = scored.filter(col("n_bigrams") > 0)
          .withColumn("__dec", ntile(10).over(w))
          .filter(col("__dec") <= k)
          .select(id)
          .unionByName(scored.filter(col("n_bigrams") === 0).select(id))
        d.join(keep, Seq(id), "left_semi")
      }
    }
    dsirTarget.foreach { tgt =>
      stage("dsir_select") { d =>
        // DSIR domain selection inside the pipeline (t22's operator,
        // Xie et al. 2023): fit the hashed-bigram target/raw
        // distributions on the DEDUPED survivors — after dedup for
        // the same reason ppl_prune is: duplicate mass must not skew
        // the distributions a doc is judged by — and keep docs whose
        // importance weight is positive (more target-like than
        // corpus-typical). A doc with no bigram features cannot be
        // judged and is KEPT (the unembedded-doc/no-bigram rule).
        val w = TextAnalysis.dsirWeights(d, id, text, tgt)
        d.join(w.filter(col("keep") || col("n_feat") === 0)
          .select(id), Seq(id), "left_semi")
      }
    }
    stage("decontaminate") { d =>
      val contaminated = TextAnalysis
        .contaminationAgainst(d, evalDocs, id, text)
        .filter(col("contam") > maxContam).select(id)
      d.join(contaminated, Seq(id), "left_anti")
    }
    tokenBudget match {
      case Some(budget) =>
        stage("budget_mix") { d =>
          // fully-qualified split: the `split` column val below
          // shadows functions.split in this scope
          Sampling.mixToBudget(d, stratum, col(id),
            size(org.apache.spark.sql.functions.split(col(text), " ")),
            budget, rates)
        }
      case None =>
        stage("stratified_mix") { d =>
          Sampling.stratifiedSample(d, stratum, col(id), rates, defaultRate)
        }
    }
    weightedCapN.foreach { n =>
      stage("weighted_cap") { d =>
        // hard per-stratum cap drawn LENGTH-WEIGHTED (d32's operator,
        // Efraimidis-Spirakis): where the mix stage hits a RATE or
        // token budget, this bounds stratum CARDINALITY — at most n
        // docs per stratum, long docs preferred, deterministic in the
        // key. Runs after mixing so the cap binds on what mixing kept.
        Sampling.weightedSampleN(d, stratum, col(id),
          greatest(size(org.apache.spark.sql.functions.split(col(text), " "))
            .cast("long"), lit(1L)), n)
      }
    }
    // deterministic 8/1/1 split — the ONE md5-fold definition d8 uses
    val v = Sampling.md5Mod10(col(id))
    val split = cur.withColumn("split",
      when(v <= 7, "train").when(v === 8, "val").otherwise("test"))
      .localCheckpoint(true) // pin results before releasing stage caches
    prevOwned.foreach(_.unpersist(false))
    // free the dedup signature/digest caches this run registered (the
    // registry is session-wide: a session running OTHER graft dedup
    // pipelines concurrently should release manually instead)
    Dedup.releasePersisted(spark)
    (split, report.toSeq.toDF("stage", "docs_in", "docs_out"))
  }
}
