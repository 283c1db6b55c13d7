package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-composition operators for LLM training-data pipelines
  * (SURVEY §2 C): deterministic stratified sampling — the "data
  * mixing" step that rebalances language/source/quality strata before
  * training.
  *
  * Scale posture: keep/drop is a PURE FUNCTION of the document's
  * stable key (md5 fold → uniform in [0,1)), so any engine, any run,
  * any partitioning, any retry produces the SAME sample — no sampling
  * state, no seed plumbing, no shuffle: the decision is evaluated
  * scan-local inside whole-stage codegen, and rates arrive via a
  * broadcast of the (tiny) strata→rate table. Downsampling 100 TB to
  * a target mix is therefore a single map-only pass.
  */
object Sampling {

  /** uniform-[0,1) fraction from the first 4 hex digits of
    * md5(key-as-string) — the same portable instr-fold every other
    * graft operator uses, so a SQL oracle reproduces it digit by
    * digit. 16 bits of hash is plenty for rate resolution (1/65536). */
  def hashFrac(key: Column): Column = {
    val hx = md5(key.cast("string").cast("binary"))
    val fold = (1 to 4).map { i =>
      (instr(lit("0123456789abcdef"), substring(hx, i, 1)) - 1) *
        lit(1 << (4 * (4 - i)))
    }.reduce(_ + _)
    fold.cast("double") / 65536.0
  }

  /** md5(key) mod 10 — the deterministic 10-bucket assignment behind
    * the 8/1/1 train/val/test split (d8 query and [[Curation]] share
    * this ONE definition so the oracle-checked split and the pipeline
    * split can never drift). */
  def md5Mod10(key: Column): Column = {
    val hx = md5(key.cast("string").cast("binary"))
    ((instr(lit("0123456789abcdef"), substring(hx, 1, 1)) - 1) * 16 +
      instr(lit("0123456789abcdef"), substring(hx, 2, 1)) - 1) % 10
  }

  /** Keep each row with probability `rates(stratum)` (default
    * `defaultRate` for unlisted strata), deterministically in the
    * row's `key`. Returns the input rows that survive, unchanged.
    * A NULL key hashes as the empty string rather than letting the
    * NULL comparison silently drop the row — a rate-1.0 stratum must
    * be a true pass-through. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateTable = broadcast(
      rates.toSeq.toDF("__stratum", "__rate"))
    df.join(rateTable, stratum === col("__stratum"), "left_outer")
      .filter(hashFrac(coalesce(key.cast("string"), lit(""))) <
        coalesce(col("__rate"), lit(defaultRate)))
      .drop("__stratum", "__rate")
  }
}
