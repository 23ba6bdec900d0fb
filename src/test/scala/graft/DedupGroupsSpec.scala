package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.DedupGroups

class DedupGroupsSpec extends AnyFunSuite with SparkTestBase {

  test("connected components: chains, diamonds, singleton edges") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle+tail via 10-11,
    // 11-12, 10-12), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = DedupGroups.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("groups: representative is min id, members sorted") {
    import spark.implicits._
    val pairs = Seq((5L, 9L), (9L, 7L), (100L, 42L)).toDF("a", "b")
    val got = DedupGroups.groups(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(got == Set(
      (5L, 3L, Seq(5L, 7L, 9L)),
      (42L, 2L, Seq(42L, 100L))))
  }

  test("long chain fully converges within the hop bound (path halving)") {
    import spark.implicits._
    val n = 60
    val pairs = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val labels = DedupGroups.connectedComponents(pairs, maxIters = 10)
      .collect().map(r => r.getLong(1)).toSet
    assert(labels == Set(0L), s"chain did not contract: $labels")
  }
}
