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

  /** exact integer from md5 hex nibbles [from, from+n] (1-based,
    * n ≤ 8) — the portable instr-fold generalized so independent
    * hashes come from DISJOINT nibble ranges of one digest (shard
    * key from 5–6, within-shard order from 7–10: uncorrelated by
    * construction, one md5 per row). DuckDB twin: the identical
    * instr-nibble arithmetic over `md5(CAST(key AS VARCHAR))`. */
  def md5Nibbles(key: Column, from: Int, n: Int): Column = {
    require(n >= 1 && n <= 8 && from >= 1 && from + n <= 33,
      s"md5Nibbles: bad range ($from, $n)")
    val hx = md5(key.cast("string").cast("binary"))
    (0 until n).map { i =>
      (instr(lit("0123456789abcdef"), substring(hx, from + i, 1)) - 1) *
        lit(1L << (4 * (n - 1 - i)))
    }.reduce(_ + _)
  }

  /** Deterministic TRAINING-SHARD assignment — the write-side op a
    * distributed training pipeline needs between curation and the
    * data loader: every row gets a `shard` in [0, shards) from the
    * key hash (content- and corpus-INDEPENDENT: a document's shard
    * never changes when the corpus grows, so incremental ingest
    * appends to existing shards instead of reshuffling them) and an
    * `ohash` 16-bit order key from DISJOINT digest nibbles —
    * `ORDER BY (ohash, key)` within a shard is the deterministic,
    * seed-free "shuffled" training order (hash order ≈ random order,
    * reproducible across engines and runs). Nibbles 5–6/7–10 are
    * deliberately disjoint from [[md5Mod10]]'s 1–2 and
    * [[hashFrac]]'s 1–4, so shard and order are INDEPENDENT of the
    * train/val/test split and of sampling decisions — a shard is a
    * uniform draw from every split. Map-only: compose with
    * `LakeSink.writeSorted(..., Seq("shard"))`-style writes for the
    * physical layout; the d29 audit aggregates balance + a
    * membership fingerprint per shard. ≤256 shards per level — shard
    * files, not partitions (a 100 TB corpus writes each shard as
    * many files; the shard is the LOADER-visible unit). */
  def shardAssign(df: DataFrame, key: Column, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 256,
      s"shardAssign: shards must be in [1, 256], got $shards")
    df.withColumn("shard", (md5Nibbles(key, 5, 2) % shards).cast("int"))
      .withColumn("ohash", md5Nibbles(key, 7, 4))
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

  /** Exact fixed-COUNT per-stratum sampling — the complement of the
    * rate-based [[stratifiedSample]]: keep exactly `n` rows per
    * stratum (all of them when a stratum holds fewer), chosen
    * deterministically as the first `n` in md5(key) order. The
    * hash-order pick means the sample is uniform-without-replacement,
    * reproducible on any engine/run/partitioning, and STABLE under
    * corpus growth: a doc already in the sample stays in it unless a
    * new doc hashes ahead of it (the standard bottom-k sketch
    * property — this IS bottom-k per stratum).
    *
    * Scale shape: the `row_number <= n` filter is recognized by
    * Spark's WindowGroupLimit rule, which runs a PARTIAL top-n in
    * each input partition BEFORE the stratum shuffle — so the
    * exchange carries at most n rows per (partition, stratum), never
    * the corpus.
    *
    * PRECONDITION (same as [[packSequences]]): `key` must be UNIQUE
    * and non-null within each stratum for the determinism claim —
    * (md5(key), key) is the entire sort order, so duplicate keys tie
    * and their relative rank at the n-boundary is
    * partitioning-dependent. A NULL key hashes as the empty string
    * (judged, not silently dropped) but two NULLs tie with each other
    * — and with a real empty-string key — and NULL ordering differs
    * across engines, so NULL keys also void oracle parity at the
    * boundary. */
  def sampleN(df: DataFrame, stratum: Column, key: Column, n: Int): DataFrame = {
    val h = md5(coalesce(key.cast("string"), lit("")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(h, key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** WEIGHTED fixed-count per-stratum sampling — Efraimidis–Spirakis
    * A-Res (Inf. Proc. Letters 2006), the standard
    * one-pass weighted-reservoir rule, in [[sampleN]]'s deterministic
    * hash form: each row draws u ∈ (0, 1] from a 24-bit md5 fraction
    * of its key and ranks by ln(u)/w (maximizing u^(1/w) ⇔
    * maximizing ln(u)/w); the top `n` per stratum are the sample, so
    * inclusion probability grows with `weight` (the length-weighted /
    * quality-weighted corpus draw every curriculum pipeline runs)
    * while staying a pure function of the key — reproducible on any
    * engine/run/partitioning, and STABLE under corpus growth exactly
    * like sampleN's bottom-k (a kept row leaves the sample only when
    * displaced by a new higher-ranked row; spec'd).
    *
    * Engine parity: the ONLY transcendental is one ln, rounded to
    * micro units by the t10/LM convention (floor(x·1e6 + 0.5)) before
    * the rank — u is an exact dyadic rational (24-bit fold + 1, so
    * ln's argument is never 0) and w an exact integer, so both
    * engines round the same double. Refuses NULL/non-positive
    * weights BY NAME (a silently-dropped row would under-report the
    * sample; w ≤ 0 has no E-S semantics). Same WindowGroupLimit
    * scale shape and unique-key precondition as [[sampleN]]. */
  def weightedSampleN(df: DataFrame, stratum: Column, key: Column,
      weight: Column, n: Int): DataFrame = {
    val nBad = df.filter(weight.isNull || weight <= 0).count()
    require(nBad == 0,
      s"WEIGHTED SAMPLE REFUSED: $nBad rows carry a NULL or non-positive " +
        "weight — Efraimidis–Spirakis needs w > 0; filter or floor first")
    val u = (md5Nibbles(coalesce(key.cast("string"), lit("")), 1, 6) +
      lit(1L)).cast("double") / lit(16777216.0)
    val es = floor(log(u) / weight.cast("double") * 1000000.0 + lit(0.5))
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(col("__es").desc, key)
    df.withColumn("__es", es)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn", "__es")
  }

  /** Deterministic sequence PACKING — the last step before tokens hit
    * a trainer: concatenate documents back to back into fixed
    * `seqLen`-token training sequences (no separator tokens are
    * accounted — callers budgeting an EOS between docs should fold it
    * into `nTok`). Documents are sharded deterministically (md5 fold
    * → shard), ordered by key within the shard, and a doc starts in
    * sequence floor(tokens_before / seqLen) — the standard causal-LM
    * concatenation packing where documents may straddle sequence
    * boundaries. Returns one row per doc with its
    * (shard, seq_id, offset-in-sequence).
    *
    * PRECONDITION: `key` must be unique per shard (it is the only
    * window-order term, so duplicate keys would make seq_id/seq_offset
    * rank-dependent and nondeterministic). With unique keys the layout
    * is deterministic in (key, shard count, seqLen) on any
    * engine/run/partitioning.
    *
    * Scale shape: one shuffle on the shard key + an in-shard ordered
    * running sum (the packing ORDER is inherently sequential per
    * shard — that is what sharding is for: shards pack independently
    * and in parallel, exactly like per-worker packing in a real
    * pipeline; shard count scales with the cluster). */
  def packSequences(df: DataFrame, key: Column, nTok: Column,
      seqLen: Long, shards: Int): DataFrame = {
    val shard = floor(hashFrac(coalesce(key.cast("string"), lit(""))) *
      shards).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__shard").orderBy(key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__shard", shard)
      .withColumn("__cum", sum(nTok).over(w))
      .withColumn("seq_id", floor((col("__cum") - nTok) / seqLen.toDouble))
      .withColumn("seq_offset", (col("__cum") - nTok) % seqLen)
      .withColumnRenamed("__shard", "shard")
      .drop("__cum")
  }

  /** Packed SPANS — the trainer-facing decomposition of
    * [[packSequences]]: one row per (shard, seq_id, doc-slice), where
    * a document that crosses a sequence boundary is split into
    * consecutive slices — `slice_start`/`slice_len` are the token
    * range WITHIN the doc, `seq_offset` is where the slice lands in
    * its sequence. Per-sequence slice_len sums equal `seqLen` for
    * every sequence except each shard's last (the property
    * SamplingSpec pins); per-doc slice_len sums equal the doc's token
    * count, and consecutive slices are contiguous in both coordinate
    * systems.
    *
    * Totality: a NULL token count packs as 0 tokens — the doc emits
    * one zero-length slice at its deterministic position rather than
    * vanishing (same rule for genuinely zero-token docs). Same
    * unique-`key` precondition and scale shape as [[packSequences]];
    * the explode adds only ceil(nTok/seqLen) extra rows per
    * boundary-crossing doc, map-side after the one shard shuffle. */
  def packSpans(df: DataFrame, key: Column, nTok: Column,
      seqLen: Long, shards: Int): DataFrame = {
    val shard = floor(hashFrac(coalesce(key.cast("string"), lit(""))) *
      shards).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__shard").orderBy(key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__shard", shard)
      .withColumn("__tok", coalesce(nTok.cast("long"), lit(0L)))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .withColumn("__bef", col("__cum") - col("__tok"))
      .withColumn("__q0", floor(col("__bef") / seqLen.toDouble).cast("long"))
      // last sequence the doc touches; a zero-token doc still owns one
      // (empty) slice at __q0, hence the greatest()
      .withColumn("__q1", greatest(col("__q0"),
        floor((col("__cum") - 1) / seqLen.toDouble).cast("long")))
      .withColumn("seq_id", explode(sequence(col("__q0"), col("__q1"))))
      .withColumn("slice_start",
        greatest(lit(0L), col("seq_id") * seqLen - col("__bef")))
      .withColumn("slice_len",
        least((col("seq_id") + 1) * seqLen, col("__cum")) -
          greatest(col("seq_id") * seqLen, col("__bef")))
      .withColumn("seq_offset",
        greatest(col("seq_id") * seqLen, col("__bef")) -
          col("seq_id") * seqLen)
      .withColumnRenamed("__shard", "shard")
      .drop("__tok", "__cum", "__bef", "__q0", "__q1")
  }

  /** Token-budget data mixing: downsample each stratum so the kept
    * corpus approaches `budget` tokens split across strata in
    * proportion to `weights` (default weight 1.0 per stratum,
    * normalized over the strata actually present). The keep rate for
    * stratum s is min(1, budget·w_s/Σw / tokens_s) — a stratum under
    * its allocation is passed through whole (rate 1), never
    * upsampled. Keep/drop is then [[hashFrac]]-deterministic per key,
    * like [[stratifiedSample]].
    *
    * This is the step that turns "mix 30% code, 60% web, 10% books
    * into a 2T-token training set" into a plan: at 100 TB the
    * per-stratum token totals are ONE tiny partial aggregate
    * (|strata| rows), the rate table is derived from it and
    * broadcast, and the keep decision is map-only — the data itself
    * is never shuffled.
    *
    * Rows with a NULL stratum receive no budget and are dropped
    * (documented; a real pipeline routes them to a quarantine stratum
    * first). Token counts must be non-negative; a NULL token count
    * contributes nothing to its stratum's total. */
  def mixToBudget(df: DataFrame, stratum: Column, key: Column,
      nTok: Column, budget: Double,
      weights: Map[String, Double] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wTable = weights.toSeq.toDF("__ws", "__w")
    // per-stratum token totals: a partial agg down to |strata| rows
    val strata = df.groupBy(stratum.as("__stratum"))
      .agg(sum(nTok).cast("double").as("__toks"))
      .join(broadcast(wTable), col("__stratum") === col("__ws"), "left_outer")
      .select(col("__stratum"), col("__toks"),
        coalesce(col("__w"), lit(1.0)).as("__w"))
    // normalize weights over the strata present, derive keep rates;
    // expression shape (budget * (w / wsum)) / toks is mirrored
    // verbatim in the SQL oracle — IEEE ops in the same order give
    // bit-identical rates on any engine. The weight total comes from
    // an unpartitioned window over the ALREADY-AGGREGATED strata
    // table (|strata| rows): an agg-and-crossJoin would re-evaluate
    // the strata subtree and cost a second full scan of the corpus
    val rates = strata
      .withColumn("__wsum", sum(col("__w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("__stratum"),
        least(lit(1.0),
          (lit(budget) * (col("__w") / col("__wsum"))) / col("__toks"))
          .as("__rate"))
    df.join(broadcast(rates), stratum === col("__stratum"), "left_outer")
      .filter(hashFrac(coalesce(key.cast("string"), lit(""))) <
        coalesce(col("__rate"), lit(0.0)))
      .drop("__stratum", "__rate")
  }

  /** TEMPERATURE-scaled mixture — [[mixToBudget]] with the weights
    * DERIVED from the data instead of caller-supplied: stratum d gets
    * weight (its token total)^α, so α = 1 reproduces the natural
    * distribution (every stratum the same keep rate — proportional
    * allocation is a no-op rebalance), α = 0 allocates the budget
    * uniformly per stratum, and the production range between them
    * (the mT5/XLM-R "sampling temperature", typically 0.3–0.7)
    * flattens the mix toward low-resource strata. This is THE
    * standard multilingual/multi-source rebalance knob, and at
    * 100 TB it stays what mixToBudget is: one |strata|-row partial
    * aggregate + a broadcast rate table + a map-only keep decision.
    *
    * Numeric portability: the α-power runs as `sqrt` when α = 0.5 —
    * sqrt is CORRECTLY ROUNDED under IEEE 754 on every engine, and
    * its result is micro-quantized (floor(·1e6 + 0.5) → exact
    * integer weights, exact integer weight total) BEFORE the rate
    * division, so the d30 oracle bit-matches the boundary the same
    * way d12's does. Other α run through `pow`, which libms only
    * promise within 1 ulp — engine-stable, but a cross-engine oracle
    * could flip a doc whose hash lands inside that ulp; callers
    * wanting hash-checked parity at other temperatures pre-compute
    * weights and call [[mixToBudget]]. NULL-stratum rows receive no
    * budget and drop (mixToBudget's documented rule). */
  def temperatureMix(df: DataFrame, stratum: Column, key: Column,
      nTok: Column, budget: Double, alpha: Double = 0.5): DataFrame = {
    val strata = df.groupBy(stratum.as("__stratum"))
      .agg(sum(nTok).cast("double").as("__toks"))
    val scaled =
      if (alpha == 0.5) sqrt(col("__toks"))
      else pow(col("__toks"), lit(alpha))
    val rates = strata
      .withColumn("__ws",
        floor(scaled * 1000000.0 + 0.5).cast("long"))
      .withColumn("__wsum", sum(col("__ws")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("__stratum"),
        least(lit(1.0),
          (lit(budget) * (col("__ws") * 1.0 / col("__wsum"))) / col("__toks"))
          .as("__rate"))
    df.join(broadcast(rates), stratum === col("__stratum"), "left_outer")
      .filter(hashFrac(coalesce(key.cast("string"), lit(""))) <
        coalesce(col("__rate"), lit(0.0)))
      .drop("__stratum", "__rate")
  }
}
