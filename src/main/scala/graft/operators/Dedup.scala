package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** word n-gram shingles (default 3) over the named text column;
    * sequence/element_at are 1-based inclusive */
  def shingleSql(textCol: String, n: Int = 3): String =
    s"transform(sequence(1, greatest(size(split($textCol, ' ')) - ${n - 1}, 1)), " +
      s"i -> concat_ws(' ', " +
      (0 until n).map(o => s"element_at(split($textCol, ' '), i + $o)").mkString(", ") +
      "))"

  def shingles(textCol: String, n: Int = 3): Column = expr(shingleSql(textCol, n))

  /** Exact dedup: group by content digest, keep min id. */
  def exact(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text).cast("binary")).as("h"))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n"))

  /** MinHash signatures: K lexicographic-min md5s over shingles. */
  def minhashSignatures(docs: DataFrame, id: String, text: String): DataFrame = {
    val sh = docs.select(col(id), explode(shingles(text)).as("s"))
    val hashed = sh.select(col(id) +:
      (0 until K).map(k => md5(concat(lit(s"$k:"), col("s")).cast("binary")).as(s"m$k")): _*)
    hashed.groupBy(col(id))
      .agg((0 until K).map(k => min(col(s"m$k")).as(s"h$k")).head,
        (0 until K).map(k => min(col(s"m$k")).as(s"h$k")).tail: _*)
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

  /** MinHash+LSH candidate near-dup pairs: self-join per band bucket. */
  def minhashCandidates(docs: DataFrame, id: String, text: String): DataFrame = {
    val bs = bands(minhashSignatures(docs, id, text), id)
    val a = bs.select(col(id).as("d1"), col("j"), col("b"))
    val b = bs.select(col(id).as("d2"), col("j"), col("b"))
    a.join(b, Seq("j", "b")).filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_bands"))
  }

  /** SimHash: 32-bit signature from per-token md5 bit-majorities
    * (8 hex digits × 4 bits), built from portable string/arithmetic
    * ops only. */
  def simhash(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = docs.select(col(id), explode(split(col(text), " ")).as("w"))
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
  def shingleHashes(textCol: String): Column = {
    val fold = (1 to 12)
      .map(i => s"cast(instr('0123456789abcdef', substr(h, $i, 1)) - 1 as bigint) * cast(${math.pow(16, 12 - i).toLong} as bigint)")
      .mkString(" + ")
    expr(s"transform(transform(${shingleSql(textCol)}, s -> md5(cast(s as binary))), h -> $fold)")
  }

  /** n-gram Jaccard on length-blocked candidate pairs: docs within
    * ±8 chars meet via a banded equi-join (each right row explodes to
    * 3 neighbor keys — no range-join cartesian). */
  def ngramJaccard(docs: DataFrame, id: String, text: String, lenCol: String,
      threshold: Double = 0.5): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    // sorted+distinct digests once per doc; each candidate pair is
    // then a single fused two-pointer merge (no per-pair hash sets)
    val base = docs.select(col(id), col(lenCol).as("nc"),
      array_sort(array_distinct(shingleHashes(text))).as("sh"),
      floor(col(lenCol) / 8).as("k"))
    val left = base.select(col(id).as("d1"), col("nc").as("nc1"),
      col("sh").as("sh1"), col("k"))
    val right = base.select(col(id).as("d2"), col("nc").as("nc2"),
      col("sh").as("sh2"),
      explode(array(col("k") - 1, col("k"), col("k") + 1)).as("k"))
    left.join(right, Seq("k"))
      .filter(col("d1") < col("d2") && abs(col("nc1") - col("nc2")) <= 8)
      .withColumn("ic", sorted_intersect_count(col("sh1"), col("sh2")))
      .select(col("d1"), col("d2"),
        round(col("ic") * 1.0 /
          (size(col("sh1")) + size(col("sh2")) - col("ic")), 4)
          .cast(DecimalType(18, 4)).as("jacc"))
      .filter(col("jacc") >= threshold)
  }
}
