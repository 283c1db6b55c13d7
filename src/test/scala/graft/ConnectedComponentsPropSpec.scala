package graft

import graft.operators.{Dedup => D}
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the iterative min-label propagation in
  * [[graft.operators.Dedup.connectedComponents]]: on seeded random
  * pair graphs the distributed fixpoint must agree with a driver-side
  * union-find — chains, stars, cycles, multi-component mixes, and
  * duplicate edges included. (Deterministic seeds rather than
  * scalacheck: the offline cache carries no scalatest-scalacheck
  * bridge, and reproducibility beats shrinking here.) */
class ConnectedComponentsPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("distributed CC fixpoint equals driver-side union-find on random graphs") {
    import spark.implicits._
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val nodes = 3 + rnd.nextInt(40)
      val nEdges = 1 + rnd.nextInt(60)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(nodes).toLong
        var b = rnd.nextInt(nodes).toLong
        if (b == a) b = (a + 1) % nodes
        (a, b)
      }
      val got = D.connectedComponents(edges.toDF("d1", "d2"), "d1", "d2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(edges)
      assert(got == want,
        s"seed=$seed edges=$edges\n distributed=$got\n union-find=$want")
    }
  }

  test("worst-case path graph converges within the iteration bound") {
    import spark.implicits._
    // a 40-node path is the max-diameter shape: min-label propagation
    // needs O(diameter) rounds and must still reach the fixpoint
    val path = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = D.connectedComponents(path.toDF("d1", "d2"), "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L), "one component labeled by min id")
    assert(got.keySet == (0L until 40L).toSet)
  }
}
