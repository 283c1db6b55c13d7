package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pageRank: hand-computed path graph, exact integer updates") {
    import spark.implicits._
    // path a(1)-b(2)-c(3): deg a=1, b=2, c=1
    // iter1: sums a=500000, b=2000000, c=500000
    //   -> r1 a=575000, b=1850000, c=575000
    // iter2: sums a=925000, b=1150000, c=925000
    //   -> r2 a=936250, b=1127500, c=936250
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.pageRank(edges, "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
    val r2 = Graph.pageRank(edges, "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("pageRank on the part-supplier graph: deterministic, hubs outrank leaves") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val edges = li.select((col("l_partkey") * 2).as("u"),
      (col("l_suppkey") * 2 + 1).as("v"))
    val a = Graph.pageRank(edges, "u", "v", 2)
    val b = Graph.pageRank(edges, "u", "v", 2)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "integer arithmetic must make reruns bit-identical")
    // stationary mass follows degree: the max-degree node must
    // outrank the min-degree node (strict on this data)
    val und = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val joined = a.join(deg, col("node") === col("u"))
    val hub = joined.orderBy(col("deg").desc).select("r").head.getLong(0)
    val leaf = joined.orderBy(col("deg").asc).select("r").head.getLong(0)
    assert(hub > leaf, s"hub rank $hub must exceed leaf rank $leaf")
    assert(a.filter(col("r") < 150000L).count() == 0,
      "every rank carries at least the damping floor")
  }
}
