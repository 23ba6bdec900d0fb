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

  // round-8 optimization pin: the hop loop derives its shuffle-partition
  // count from the edge count and carries the convergence probe inside
  // the checkpoint job as a CollectMetrics observation. Neither may
  // change the labels, and the session conf must come back restored even
  // when the loop ran several hops at the derived width.
  test("r8: derived hop partitioning restores session conf, labels exact") {
    import spark.implicits._
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "7") // distinctive width to observe restoration
      val pairs = ((0 until 40).map(i => (i.toLong, (i + 1).toLong)) ++
        Seq((100L, 101L), (200L, 201L), (201L, 202L))).toDF("a", "b")
      val got = DedupGroups.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (0 to 40).map(_.toLong -> 0L).toMap ++
        Map(100L -> 100L, 101L -> 100L, 200L -> 200L, 201L -> 200L, 202L -> 200L)
      assert(got == want)
      assert(spark.conf.get(key) == "7",
        s"hop loop leaked its derived shuffle-partition setting: ${spark.conf.get(key)}")
    } finally spark.conf.set(key, saved)
  }

  test("r8: observed-probe convergence equals a brute-force grouping") {
    import spark.implicits._
    // adversarial mix: star, chain, triangle with cross edge, self-loop
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (10L, 11L), (11L, 12L), (12L, 13L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 30L)).toDF("a", "b")
    val got = DedupGroups.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: union-find on the driver over the same edge list
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (10L, 11L), (11L, 12L),
      (12L, 13L), (20L, 21L), (21L, 22L), (20L, 22L), (30L, 30L))
      .foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val want = parent.keys.map(v => v -> find(v)).toMap
    assert(got == want)
  }
}
