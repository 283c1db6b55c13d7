package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke every registry query at sf0.001: runs, has columns, and the
  * handful with guaranteed output have rows. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val mustHaveRows = Set("q1_agg", "q2_join_broadcast", "q5_multijoin",
    "q13_outerjoin", "a1_count", "a6_externalize", "t1_langid",
    "t4_fingerprint", "d1_dedup_exact", "d3_dedup_simhash", "s1_knn_brute",
    "m1_blob_meta", "q16_sessionize", "q18_timeagg", "q20_json")

  Registry.all.foreach { q =>
    test(s"${q.name} runs") {
      val df = q.run(spark, TestSpark.sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (mustHaveRows(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("every query has a matching oracle column contract") {
    // oracle SQL must alias every output; cheap sanity: it mentions
    // each Spark output column name
    Registry.all.foreach { q =>
      q.oracle.foreach { sql =>
        val cols = q.run(spark, TestSpark.sf).columns
        cols.foreach(c =>
          assert(sql.toLowerCase.contains(c.toLowerCase),
            s"${q.name}: oracle SQL does not mention column $c"))
      }
    }
  }
}
