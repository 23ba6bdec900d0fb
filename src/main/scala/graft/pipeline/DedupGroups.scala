package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Turn near-duplicate PAIRS (from LSH/SimHash/embedding passes) into
  * duplicate GROUPS: connected components by iterative min-label
  * propagation, the standard large-graph approach when components are
  * shallow (duplicate clusters are tiny — a handful of crawls of the same
  * page — so a few hops converge; each hop is one self-join + groupBy on
  * (id, label), all shuffle-partitioned by id).
  *
  * Returns (id, rep) where rep = the component's minimum id — the row to
  * KEEP; everything else in the group is the drop set.
  */
object DedupGroups {

  /** @param pairs two columns, (id_a, id_b), undirected edges
    * @param maxIters hop bound (duplicate clusters are shallow; 10 covers
    *                 chains of length 2^10)
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.toDF("a", "b")
      .union(pairs.toDF("b", "a").select(col("a"), col("b")))
      .distinct()
      .persist()
    // size the HOP shuffles from the edge count, not the session core
    // count (guide §2: derive partitioning from input size — the q40
    // state-shard rule). Every per-hop job (neighbor join + groupBy,
    // jump join, checkpoint materialization, convergence probe) runs
    // 2-4x per iteration over data bounded by |edges|; at 32 session
    // partitions a few-hundred-edge graph pays ~100 near-empty tasks
    // per hop (measured at sf0.1: 26.5 s of process CPU for ~1.2k
    // directed edges — almost all task/scheduler overhead). ~100k edge
    // rows per partition before adding partitions, clamped to the
    // session's configured parallelism so a 100 TB edge set still fans
    // out fully. The count() is one job over the just-persisted tiny
    // projection — the same bounded-metadata cost class as q15's
    // max(doc_id) guard. Conf is restored after the loop; the labels
    // returned to callers are localCheckpoint'd RDD-backed frames, so
    // downstream consumers are unaffected by the temporary setting.
    val nEdges = edges.count()
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val hopParts = math.max(2L, math.min(
      saved.toLong, nEdges / 100000L + 1L)).toInt
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("rep", col("id"))
    var converged = false
    var i = 0
    try {
    spark.conf.set("spark.sql.shuffle.partitions", hopParts)
    while (!converged && i < maxIters) {
      // each vertex takes min(own label, neighbors' labels); `prev`
      // (the incoming label) rides along so the convergence probe below
      // is a scan of THIS checkpoint's cached partitions — the former
      // probe joined the post-jump labels back against the previous
      // generation, a full extra shuffle job every other hop
      val viaNeighbors = edges
        .join(labels.select(col("id").as("nbr"), col("rep").as("nrep")),
          col("b") === col("nbr"))
        .groupBy(col("a").as("id"))
        .agg(min("nrep").as("nbrMin"))
      // eager localCheckpoint truncates the logical plan each iteration —
      // without it the self-joins double the plan tree per hop and the
      // analyzer stack-overflows around iteration 10.
      // The moved-row count rides INSIDE the checkpoint job as a
      // CollectMetrics observation (the q41 candidate-probe pattern):
      // the former standalone probe was one extra driver-round-trip job
      // per hop — ~25% of the loop's job count for a pure scan of
      // blocks the checkpoint had just cached (measured: the tiny-graph
      // loop floor is per-JOB latency, not per-task width).
      val obs = org.apache.spark.sql.Observation()
      val hop = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("rep").as("prev"),
          least(col("rep"), coalesce(col("nbrMin"), col("rep"))).as("rep"))
        .observe(obs, count(when(col("rep") =!= col("prev"), 1)).as("moved"))
        .localCheckpoint(true)
      // probe BEFORE the pointer jump: a hop that moved nothing means
      // labels were already the fixpoint (min(own, neighbors) == own for
      // every vertex => labels uniform per component => the component
      // min), so the final iteration's jump join never runs at all —
      // the jump only ACCELERATES convergence, it cannot create
      // movement at a hop fixpoint (rep is the component min, whose own
      // label is itself)
      converged = movedCount(hop, obs) == 0L
      if (!converged) {
        // pointer jump (path halving): rep <- label(rep), contracting
        // chains geometrically so convergence is O(log diameter), not
        // O(diameter)
        labels = hop
          .join(hop.select(col("id").as("rep"), col("rep").as("rep2")), Seq("rep"), "left")
          .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"))
          .localCheckpoint(true)
      } else labels = hop.select(col("id"), col("rep"))
      i += 1
    }
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    edges.unpersist()
    // fail-loud on an exhausted hop budget (the file's q15/q16/q26 guard
    // convention): the final probe at i == maxIters - 1 already measured
    // whether labels moved — returning unconverged labels would silently
    // SPLIT a deep component (e.g. a mirror-farm chain beyond 2^maxIters)
    // into several keep/drop groups, corrupting the dedup decision
    require(converged,
      s"connectedComponents did not converge within $maxIters hops — a " +
        "component's diameter exceeds the hop budget (with path halving, " +
        s"depth > ~2^$maxIters); raise maxIters for this graph")
    labels
  }

  /** Moved-row count of one hop: read the observation the checkpoint job
    * just populated; if the listener bus has not delivered it within ~2 s
    * (observation results are async — the q41CandidateCount caveat), fall
    * back to the explicit scan of the checkpointed blocks. The fallback
    * preserves exactness: the observation is an optimization of the probe,
    * never its only source of truth. */
  private def movedCount(
      hop: DataFrame, obs: org.apache.spark.sql.Observation): Long = {
    val fut = obs.future
    var left = 20
    while (!fut.isCompleted && left > 0) { Thread.sleep(100); left -= 1 }
    fut.value match {
      case Some(scala.util.Success(row)) =>
        row.getLong(row.fieldIndex("moved"))
      case _ =>
        System.err.println("[cc] observation not delivered — fallback probe")
        hop.filter(col("rep") =!= col("prev")).limit(1).count()
    }
  }

  /** Group summary: representative, exact member count, members (bounded).
    *
    * The members list is capped at `memberCap` ids BEFORE aggregation:
    * rows beyond the cap are dropped by a rank filter, so the
    * collect_list buffer itself is bounded — slicing after collect_list
    * would still materialize a mirror-farm mega-cluster's millions of
    * ids in one task's agg buffer (the window sort spills; an agg buffer
    * does not). n_members stays the exact full count. The scale-safe
    * primary output of a dedup pass remains the (id, rep) label table
    * from connectedComponents; `members` is the bounded summary view. */
  def groups(pairs: DataFrame, memberCap: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = connectedComponents(pairs)
    // ONE aggregation over the window's existing rep-partitioning instead
    // of the former two (counts + capped members) joined back together:
    // collect_list skips nulls, so when(rnk <= cap, id) bounds the agg
    // buffer exactly like the old rank-filter-then-collect while count(*)
    // still sees every row — same output, minus one groupBy exchange and
    // the rep-keyed join (the window already partitioned by rep, so the
    // single groupBy reuses that exchange)
    labels
      .withColumn("rnk", row_number().over(Window.partitionBy("rep").orderBy("id")))
      .groupBy("rep")
      .agg(
        count(lit(1)).as("n_members"),
        sort_array(collect_list(when(col("rnk") <= memberCap, col("id"))))
          .as("members"))
  }
}
