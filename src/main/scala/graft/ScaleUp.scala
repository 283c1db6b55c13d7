package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up: replicate an SF directory `factor`×
  * into a sibling layout Bench/Verify can read, preserving the
  * WORKLOAD SHAPE of every operator family rather than naively
  * copying rows:
  *
  *   - replica 0 is byte-identical to the source, so literal point
  *     lookups (a3/a5) still hit and dimension joins still resolve;
  *   - every key domain gets a per-replica offset of (max+1), applied
  *     consistently across fact/dim FKs (c_custkey and o_custkey move
  *     together), so join fan-outs scale linearly — no replica ever
  *     joins another replica's rows;
  *   - region/nation stay fixed (TPC-H semantics: dims don't scale);
  *   - document text is re-lettered per replica (a rotation of a
  *     10-char substitution alphabet — length-preserving, so n_chars
  *     stays consistent), which rewrites most shingles: cross-replica
  *     docs are NOT near-duplicates, so MinHash/LSH bucket occupancy
  *     and verified-pair counts grow linearly with the corpus, the
  *     same shape a real 10× crawl has (a naive text copy would grow
  *     every LSH bucket 10× and the verify join 100×);
  *   - embeddings get per-replica deterministic noise for the same
  *     reason: replicas must not collapse into zero-distance clusters
  *     that inflate ANN buckets quadratically.
  *
  * Used for the SURVEY §6 scale-validation run (sf0.1 → "sf1"); the
  * output is bench input only, never a correctness oracle.
  */
object ScaleUp {

  /** 10-char substitution alphabet; rotation r gives 10 distinct
    * length-preserving re-letterings (r=0 is the identity). Rotations
    * repeat with period 10 — hence the factor <= 10 bound in [[run]]:
    * past it, replica r and replica r-10 would carry byte-identical
    * texts and every LSH bucket would gain exact cross-replica dups,
    * the distortion this tool exists to prevent.
    *
    * Known shape limitation: function words ('the', 'de', 'und', …)
    * are re-lettered too, so the langid/stopword LEXICON JOINS (t1/t2)
    * only hit replica 0 — their §6 ratios underestimate join-side
    * growth. Dedup/LSH/ANN shape (the primary validation target) is
    * unaffected. */
  private val Alpha = "aeioubcdfg"
  private def rot(r: Int): String =
    Alpha.drop(r % Alpha.length) + Alpha.take(r % Alpha.length)

  private def keyCeil(df: DataFrame, c: String): Long = {
    val m = df.agg(max(col(c).cast("long"))).head
    require(!m.isNullAt(0), s"cannot scale an empty table (max($c) is null)")
    m.getLong(0) + 1L
  }

  /** Cross-join with replicas 0..factor-1 and rewrite columns:
    * `offsets` maps column name → per-replica key offset. */
  private def replicate(df: DataFrame, factor: Int,
      offsets: Map[String, Long],
      extra: Map[String, Column] = Map.empty): DataFrame = {
    val reps = df.sparkSession.range(0, factor.toLong)
      .select(col("id").cast("int").as("rep"))
    val cols = df.columns.map { c =>
      offsets.get(c) match {
        case Some(off) => (col(c) + col("rep").cast("long") * off).as(c)
        case None => extra.getOrElse(c, col(c)).as(c)
      }
    }
    df.crossJoin(broadcast(reps)).select(cols.toIndexedSeq: _*)
  }

  /** when-chain applying the replica-r re-lettering to a text col. */
  private def relettered(c: Column, factor: Int): Column =
    (1 until factor).foldLeft(when(col("rep") === 0, c)) { (acc, r) =>
      acc.when(col("rep") === r, translate(c, Alpha, rot(r)))
    }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <outDir> <factor>")
    val spark = GraftSession.local()
    run(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    require(factor >= 1 && factor <= Alpha.length,
      s"factor must be in [1, ${Alpha.length}]: the re-lettering rotation " +
        "repeats past that and replicas would be exact text duplicates")
    // NOTE: the copy is for the SPARK bench only — events.ts
    // round-trips from TIMESTAMP(NANOS) to plain INT64 (nanosAsLong),
    // which Spark reads identically but a SQL oracle binding
    // timestamp functions would reject. Never point the DuckDB
    // correctness gate at a scaled directory.
    def rd(n: String) = Tables.load(spark, src, n)
    def wr(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")

    // fixed dims — copied, not scaled
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    val cust = rd("customer"); val custOff = keyCeil(cust, "c_custkey")
    val supp = rd("supplier"); val suppOff = keyCeil(supp, "s_suppkey")
    val part = rd("part"); val partOff = keyCeil(part, "p_partkey")
    val ord = rd("orders"); val ordOff = keyCeil(ord, "o_orderkey")

    wr(replicate(cust, factor, Map("c_custkey" -> custOff)), "customer")
    wr(replicate(supp, factor, Map("s_suppkey" -> suppOff)), "supplier")
    wr(replicate(part, factor, Map("p_partkey" -> partOff)), "part")
    wr(replicate(ord, factor,
      Map("o_orderkey" -> ordOff, "o_custkey" -> custOff)), "orders")
    wr(replicate(rd("lineitem"), factor, Map(
      "l_orderkey" -> ordOff, "l_partkey" -> partOff,
      "l_suppkey" -> suppOff)), "lineitem")

    val ev = rd("events")
    wr(replicate(ev, factor, Map(
      "event_id" -> keyCeil(ev, "event_id"),
      "user_id" -> keyCeil(ev, "user_id"))), "events")

    val docs = rd("documents")
    wr(replicate(docs, factor,
      Map("doc_id" -> keyCeil(docs, "doc_id")),
      Map("text" -> relettered(col("text"), factor))), "documents")

    val emb = rd("embeddings")
    // deterministic per-(replica, vector, dim) perturbation; rep 0 exact
    val noisy = expr(
      "transform(embedding, (x, i) -> " +
        "cast(x + 0.05d * sin(rep * 2999 + vec_id * 31 + i) as float))")
    wr(replicate(emb, factor,
      Map("vec_id" -> keyCeil(emb, "vec_id")),
      Map("embedding" -> when(col("rep") === 0, col("embedding"))
        .otherwise(noisy))), "embeddings")

    Tables.names.foreach { n =>
      println(s"[scaleup] $n -> " +
        spark.read.parquet(s"$out/$n.parquet").count())
    }
  }
}
