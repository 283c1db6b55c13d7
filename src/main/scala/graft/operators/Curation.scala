package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the pipeline the individual operators
  * exist to compose, in the order production corpus builds run it:
  *
  *   1. quality filter   ([[TextAnalysis.filterChain]])
  *   2. exact dedup      ([[Dedup.exact]] — min-id survivor per digest)
  *   3. near-dup dedup   ([[Dedup.verifiedPairs]] →
  *                        [[Dedup.connectedComponents]] — one survivor
  *                        per transitive cluster)
  *   4. decontamination  ([[TextAnalysis.contaminationAgainst]] vs a
  *                        held-out eval table)
  *   5. stratified mix   ([[Sampling.stratifiedSample]])
  *   6. split assignment (deterministic md5 mod 10 → train/val/test)
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

  def curate(docs: DataFrame, id: String, text: String, stratum: Column,
      evalDocs: DataFrame, jaccard: Double = 0.9, maxContam: Double = 0.2,
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val report = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    def stage(name: String, in: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
      val out = f(in)
      report += ((name, in.count(), out.count()))
      out
    }

    val filtered = stage("quality_filter", docs) { d =>
      d.join(TextAnalysis.filterChain(d, id, text)
        .filter(col("verdict") === "keep").select(id), id)
    }
    val exact = stage("exact_dedup", filtered) { d =>
      d.join(Dedup.exact(d, id, text).select(col("keeper").as(id)), id)
    }
    val nearDup = stage("neardup_dedup", exact) { d =>
      val pairs = Dedup.verifiedPairs(d, id, text, jaccard, persist = false)
      val drops = Dedup.connectedComponents(pairs, "d1", "d2")
        .filter(col("node") =!= col("comp")).select(col("node").as(id))
      d.join(drops, Seq(id), "left_anti")
    }
    val clean = stage("decontaminate", nearDup) { d =>
      val contaminated = TextAnalysis
        .contaminationAgainst(d, evalDocs, id, text)
        .filter(col("contam") > maxContam).select(id)
      d.join(contaminated, Seq(id), "left_anti")
    }
    val mixed = stage("stratified_mix", clean) { d =>
      Sampling.stratifiedSample(d, stratum, col(id), rates, defaultRate)
    }
    // deterministic 8/1/1 split — same md5 fold as the d8 query
    val v = expr(
      s"((instr('0123456789abcdef', substr(md5(cast(cast($id as string) as binary)), 1, 1)) - 1) * 16 + " +
        s"instr('0123456789abcdef', substr(md5(cast(cast($id as string) as binary)), 2, 1)) - 1) % 10")
    val split = mixed.withColumn("split",
      when(v <= 7, "train").when(v === 8, "val").otherwise("test"))
    (split, report.toSeq.toDF("stage", "docs_in", "docs_out"))
  }
}
