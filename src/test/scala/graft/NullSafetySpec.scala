package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input semantics: a production corpus WILL contain NULL
  * and empty text. Nothing may crash, and the per-operator behavior
  * is pinned here so it changes deliberately or not at all. */
class NullSafetySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "some normal document text here"),
      (2L, null.asInstanceOf[String]), (3L, "")).toDF("doc_id", "text")
  }

  test("exact dedup: null and empty are distinct groups, nothing crashes") {
    val d = operators.Dedup.exact(docs, "doc_id", "text")
    assert(d.count() == 3) // null-digest group, ""-digest group, text group
  }

  test("signature/digest passes cover every doc (null -> null signature)") {
    assert(operators.Dedup.minhashSignatures(docs, "doc_id", "text").count() == 3)
    assert(operators.Dedup.shingleSets(docs, "doc_id", "text").count() == 3)
    assert(operators.Dedup
      .verifiedPairs(docs, "doc_id", "text", 0.9, persist = false).count() == 0)
  }

  test("filterChain is TOTAL: null text gets a verdict (too_short), never vanishes") {
    val v = operators.TextAnalysis.filterChain(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v.keySet == Set(1L, 2L, 3L), s"every doc judged: $v")
    assert(v(2L) == "too_short" && v(3L) == "too_short")
  }

  test("exploded metrics (repetition/simhash) drop null-text rows, keep empty") {
    // documented: explode of a null token array yields no rows — these
    // are per-token metrics and a null doc has no tokens. filterChain
    // (above) is the operator that must be total, and is.
    val rep = operators.TextAnalysis.repetition(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep == Set(1L, 3L))
    val sim = operators.Dedup.simhash(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sim == Set(1L, 3L))
  }

  test("per-doc scorers (quality/langid/fingerprint) stay total") {
    assert(operators.TextAnalysis.quality(docs, "doc_id", "text").count() == 3)
    assert(operators.TextAnalysis.langId(docs, "doc_id", "text").count() == 3)
    assert(operators.TextAnalysis.fingerprint(docs, "doc_id", "text").count() == 3)
  }

  test("contamination never emits NaN: short/empty docs score a judged 0-or-valid value") {
    import spark.implicits._
    val train = Seq((1L, "one two"), (2L, ""), (3L, "a b c d e f g"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val ev = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val c = operators.TextAnalysis.contaminationAgainst(train, ev,
      "doc_id", "text")
    // NaN is the poison value here: `contam < threshold` keep rules
    // silently KEEP a NaN-scored doc (NaN comparisons are false), so
    // decontaminate would wave contaminated-unknown docs through
    assert(c.filter(isnan(col("contam"))).count() == 0, "no NaN scores")
    val byId = c.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(byId(1L).exists(v => v >= 0.0 && v <= 1.0), s"short doc judged: $byId")
    assert(byId(2L).exists(v => v >= 0.0 && v <= 1.0), s"empty doc judged: $byId")
    assert(byId(3L).exists(_ > 0.9), s"fully-leaked doc flagged: $byId")
    assert(byId(4L).isEmpty,
      "null text has no token stream: NULL score (documented), not NaN")
  }
}
