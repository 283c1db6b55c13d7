package graft

import graft.operators.{Bpe, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("greedy non-overlapping merge: 'aaaa' under (a,a) becomes two 'aa' symbols") {
    // freq-dominant 'aaaa' forces (a,a) as the first merge; Sennrich's
    // left-to-right scan tokenizes it [aa, aa] — NOT [aa, a, a] (lazy)
    // and NOT three overlapping merges
    val d = docs((1L, "aaaa aaaa aaaa"), (2L, "b c"))
    val (merges, vocabTok) = Bpe.train(d, "doc_id", "text", 1)
    val m = merges.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(m.toSeq == Seq((1L, "a", "a")))
    val vt = vocabTok.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vt("aaaa") == 2, s"greedy pairing must yield [aa][aa]: $vt")
    assert(vt("b") == 1 && vt("c") == 1)
  }

  test("merges chain into longer subwords and apply in rank order") {
    // 'abab' x3: round 1 merges the most frequent pair; subsequent
    // rounds build on merged symbols — final tokenization of 'abab'
    // must reach a single symbol within 3 merges
    val d = docs((1L, "abab abab abab"))
    val (merges, vocabTok) = Bpe.train(d, "doc_id", "text", 3)
    val got = merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    // (a,b) wins round 1 (count 6); (ab,ab) wins round 2 (count 3);
    // no pairs remain for round 3
    assert(got.toSeq == Seq(("a", "b"), ("ab", "ab")))
    val vt = vocabTok.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(vt("abab") == 1, "rank-ordered merges must collapse abab fully")
  }

  test("tie-break is lexicographic on (lhs, rhs) at equal counts") {
    val d = docs((1L, "zy ba"))
    val (merges, _) = Bpe.train(d, "doc_id", "text", 1)
    val m = merges.collect().map(r => (r.getString(1), r.getString(2)))
    assert(m.toSeq == Seq(("b", "a")),
      s"all pairs count 1 — (b,a) is the lexicographic minimum: ${m.toSeq}")
  }

  test("docTokens is total: empty and null text count 0, never vanish") {
    val d = docs((1L, "hello hello world"), (2L, ""), (3L, null))
    val (_, vocabTok) = Bpe.train(d, "doc_id", "text", 2)
    val got = Bpe.docTokens(d, "doc_id", "text", vocabTok)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) == 0 && got(3L) == 0)
    assert(got(1L) > 0)
  }

  test("pair exhaustion yields fewer merges, never a throw") {
    val d = docs((1L, "a b c"))  // single-char words: no pairs at all
    val (merges, vocabTok) = Bpe.train(d, "doc_id", "text", 4)
    assert(merges.count() == 0)
    assert(vocabTok.collect().map(_.getLong(1)).forall(_ == 1L))
  }

  test("a no-whitespace monster doc cannot pin training to one window task") {
    // the skew guard: a single over-cap "word" is excluded from the
    // pipeline entirely (both engines), so its positions never
    // serialize the word-partitioned windows; normal words untouched
    val monster = "z" * 100000
    val d = docs((1L, s"hello $monster world"), (2L, "hello world"))
    val (merges, vocabTok) = Bpe.train(d, "doc_id", "text", 2)
    assert(!vocabTok.collect().map(_.getString(0)).contains(monster))
    assert(merges.count() > 0)
    val toks = Bpe.docTokens(d, "doc_id", "text", vocabTok)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 1 counts only its admitted words — present, not poisoned
    assert(toks(1L) == toks(2L) && toks(1L) > 0)
  }

  test("applyMerges reproduces training tokenization on the training vocab") {
    // the classic BPE property, pinned on REAL documents: greedy
    // rank-order application of the trained merges to the training
    // words yields exactly the training-time token counts — so a
    // sample-trained merge table can tokenize the full corpus without
    // the trainer (the production 100 TB shape)
    val docsDf = Tables.load(spark, TestSpark.sf, "documents")
    val (merges, vocabTok) = Bpe.train(docsDf, "doc_id", "text", 8)
    val applied = Bpe.applyMerges(
      Bpe.docWords(docsDf, "doc_id", "text").select("word").distinct(),
      merges, 8)
    val drift = applied.join(vocabTok.withColumnRenamed("n_tok", "trained"),
      Seq("word"))
      .filter(col("n_tok") =!= col("trained")).count()
    assert(drift == 0, "apply-with-merges must reproduce training tokenization")
    assert(applied.count() == vocabTok.count())
  }

  test("applyMerges tokenizes UNSEEN words: trained subwords recombine, novelty stays chars") {
    import spark.implicits._
    val d = docs((1L, "abab abab abab"))
    val (merges, _) = Bpe.train(d, "doc_id", "text", 3) // (a,b), (ab,ab)
    val got = Bpe.applyMerges(
      Seq("ababab", "ba", "zq").toDF("word"), merges, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 'ababab': (a,b) merges -> ab ab ab; (ab,ab) greedy -> [abab][ab]
    assert(got("ababab") == 2, s"trained subwords must recombine: $got")
    // 'ba' has no trained pair in order; 'zq' is out-of-alphabet
    assert(got("ba") == 2 && got("zq") == 2,
      s"unseen content falls back to characters: $got")
  }

  test("d14 packing keyed on REAL BPE counts: spans cover every BPE token exactly once") {
    // the verdict-r8 integration: the packing operator consumes t15's
    // trained counts, not the whitespace estimate — per-doc slice_len
    // sums must equal the doc's BPE count, and every full sequence
    // must hold exactly seqLen tokens
    val docsDf = Tables.load(spark, TestSpark.sf, "documents")
    val (_, vocabTok) = Bpe.train(docsDf, "doc_id", "text", 8)
    val toks = Bpe.docTokens(docsDf, "doc_id", "text", vocabTok)
      .localCheckpoint(true)
    val spans = Sampling.packSpans(toks, col("doc_id"), col("n_tok"),
      seqLen = 256, shards = 4)
    val perDoc = spans.groupBy("doc_id").agg(sum("slice_len").as("s"))
      .join(toks, Seq("doc_id"))
      .filter(col("s") =!= col("n_tok")).count()
    assert(perDoc == 0, "per-doc slice sums must equal the BPE token count")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    val badSeq = spans.groupBy("shard", "seq_id").agg(sum("slice_len").as("s"))
      .withColumn("last", max("seq_id").over(w))
      .filter(col("seq_id") =!= col("last") && col("s") =!= 256).count()
    assert(badSeq == 0, "every non-final sequence must hold exactly seqLen BPE tokens")
  }
}
