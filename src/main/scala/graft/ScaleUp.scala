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

  /** Two disjoint 10-char substitution alphabets, rotated
    * independently: replica r shifts Alpha by r%10 and Beta by
    * (r/10)%10, giving 10×10 = 100 distinct length-preserving
    * re-letterings (r=0 is the identity on both) — hence the
    * factor <= 100 bound in [[run]]: past it, replica r and replica
    * r-100 would carry byte-identical texts and every LSH bucket
    * would gain exact cross-replica dups, the distortion this tool
    * exists to prevent.
    *
    * Known shape limitations: (a) function words ('the', 'de',
    * 'und', …) are re-lettered too, so the langid/stopword LEXICON
    * JOINS (t1/t2) only hit replica 0 — their §6 ratios
    * underestimate join-side growth; (b) two replicas sharing an
    * Alpha shift (r, r+10, …) differ only in Beta letters, so the
    * rare shingle built entirely from {Alpha ∪ t,v,w,x,y,z} words
    * recurs across them — residual cross-replica Jaccard is ≪ the
    * 0.8–0.9 near-dup thresholds, so bucket/pair growth stays
    * linear (the property [[ScaleUpSpec]] pins). Dedup/LSH/ANN
    * shape (the primary validation target) is unaffected. */
  private val Alpha = "aeioubcdfg"
  private val Beta = "hjklmnpqrs"
  private def rot(s: String, r: Int): String =
    s.drop(r % s.length) + s.take(r % s.length)
  /** Substitution image of Alpha+Beta for replica r. */
  private def sub(r: Int): String =
    rot(Alpha, r % Alpha.length) + rot(Beta, (r / Alpha.length) % Beta.length)

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
      acc.when(col("rep") === r, translate(c, Alpha + Beta, sub(r)))
    }

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleUp <srcDir> <outDir> <factor> [tableA,tableB,...]")
    val spark = GraftSession.local()
    val only: Set[String] =
      if (args.length == 4) args(3).split(",").map(_.trim).toSet else Set.empty
    run(spark, args(0), args(1), args(2).toInt, only)
    spark.stop()
  }

  /** `only`: when non-empty, materialize just those tables (e.g.
    * documents,embeddings for a dedup/ANN-family-only bench) — the
    * second-decade sf10 run doesn't need 60M lineitem rows on disk. */
  def run(spark: SparkSession, src: String, out: String, factor: Int,
      only: Set[String] = Set.empty): Unit = {
    val maxF = Alpha.length * Beta.length
    require(factor >= 1 && factor <= maxF,
      s"factor must be in [1, $maxF]: the re-lettering rotations " +
        "repeat past that and replicas would be exact text duplicates")
    // NOTE: the copy is for the SPARK bench only — if the source
    // carried events.ts as TIMESTAMP(NANOS), it round-trips here to
    // plain INT64 (nanosAsLong), which the engine reads identically
    // (Tables.tsSec adapts) but a SQL oracle binding timestamp
    // functions would reject. Never point the DuckDB correctness gate
    // at a scaled directory.
    def want(n: String) = only.isEmpty || only.contains(n)
    def rd(n: String) = Tables.load(spark, src, n)
    def wr(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")

    // fixed dims — copied, not scaled
    if (want("region")) wr(rd("region"), "region")
    if (want("nation")) wr(rd("nation"), "nation")

    // key offsets are cheap (a parquet max scan) and shared across
    // FK domains, so compute them lazily only when a table needs one
    lazy val custOff = keyCeil(rd("customer"), "c_custkey")
    lazy val suppOff = keyCeil(rd("supplier"), "s_suppkey")
    lazy val partOff = keyCeil(rd("part"), "p_partkey")
    lazy val ordOff = keyCeil(rd("orders"), "o_orderkey")

    if (want("customer"))
      wr(replicate(rd("customer"), factor, Map("c_custkey" -> custOff)), "customer")
    if (want("supplier"))
      wr(replicate(rd("supplier"), factor, Map("s_suppkey" -> suppOff)), "supplier")
    if (want("part"))
      wr(replicate(rd("part"), factor, Map("p_partkey" -> partOff)), "part")
    if (want("orders"))
      wr(replicate(rd("orders"), factor,
        Map("o_orderkey" -> ordOff, "o_custkey" -> custOff)), "orders")
    if (want("lineitem"))
      wr(replicate(rd("lineitem"), factor, Map(
        "l_orderkey" -> ordOff, "l_partkey" -> partOff,
        "l_suppkey" -> suppOff)), "lineitem")

    if (want("events")) {
      val ev = rd("events")
      wr(replicate(ev, factor, Map(
        "event_id" -> keyCeil(ev, "event_id"),
        "user_id" -> keyCeil(ev, "user_id"))), "events")
    }

    if (want("documents")) {
      val docs = rd("documents")
      wr(replicate(docs, factor,
        Map("doc_id" -> keyCeil(docs, "doc_id")),
        Map("text" -> relettered(col("text"), factor))), "documents")
    }

    if (want("embeddings")) {
      val emb = rd("embeddings")
      // deterministic per-(replica, vector, dim) perturbation; rep 0 exact
      val noisy = expr(
        "transform(embedding, (x, i) -> " +
          "cast(x + 0.05d * sin(rep * 2999 + vec_id * 31 + i) as float))")
      wr(replicate(emb, factor,
        Map("vec_id" -> keyCeil(emb, "vec_id")),
        Map("embedding" -> when(col("rep") === 0, col("embedding"))
          .otherwise(noisy))), "embeddings")
    }

    Tables.names.filter(want).foreach { n =>
      println(s"[scaleup] $n -> " +
        spark.read.parquet(s"$out/$n.parquet").count())
    }
  }
}
