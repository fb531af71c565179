package graft

import graft.functions.Graphs
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def ranks(nodes: Seq[Long], pairs: Seq[(Long, Long)],
      iters: Int = 3): Map[Long, Long] =
    Graphs.pageRank(nodes.toDF("id"), "id",
        pairs.toDF("id_a", "id_b"), iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("pageRank: symmetric ring keeps the uniform distribution") {
    // 4-cycle, every node degree 2: the uniform vector is the fixed point
    val r = ranks(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(r.values.toSet.size == 1)
    assert(r(1L) == 1000000000000L / 4)
  }

  test("pageRank: star center outranks leaves; leaves tie") {
    val r = ranks(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert(Set(r(2L), r(3L), r(4L), r(5L)).size == 1)
    assert(r(1L) > r(2L))
  }

  test("pageRank: dangling node holds exactly the teleport mass") {
    val r = ranks(Seq(1L, 2L, 3L), Seq((1L, 2L)))
    val base = 1000000000000L / 3
    assert(r(3L) == (15L * base) / 100L)
    assert(r(1L) == r(2L)) // symmetric 2-clique
  }

  test("pageRank: rank mass is conserved up to floor-division loss") {
    // no dangling nodes (a dangling node's mass leaks by design — the
    // standard simplification); floor divisions lose at most a few units
    // per node per round
    val r = ranks(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (3L, 4L)))
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 1000L)
  }
}
