package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the cluster
  * step at the end of every near-duplicate pipeline (candidate pairs →
  * duplicate CLUSTERS → one kept representative per cluster).
  *
  * Each iteration every node takes the minimum label among itself and its
  * neighbors; convergence (no label changed) is reached after
  * O(component diameter) rounds. Near-dup graphs have tiny diameters
  * (boilerplate families, re-posts), so this converges in a handful of
  * rounds; for adversarial long-path graphs the alternating large/small
  * star variant halves rounds — noted, not needed here.
  *
  * Scale: per round ONE equi-join edges⋈labels plus one min-aggregate —
  * all shuffle-partitioned by node id, no driver-side graph. Lineage is
  * cut per round with localCheckpoint so the plan stays flat across
  * iterations (the classic iterative-Spark pitfall). Convergence
  * detection is FUSED into the propagation aggregate (r15): each node's
  * previous label rides the union as its flagged self-row and comes out
  * of the same groupBy, so the changed-check is a local filter over the
  * checkpointed round result instead of the old prop⋈labels re-join —
  * which cost a second shuffle join per round, as much as the
  * propagation itself.
  */
object ConnectedComponents {

  /** @return (node, label) — label is the component's minimum node id. */
  def apply(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    // Small-graph mode (r19, guide §1.2/§2): once the edge set is
    // materialized its size is EXACT; under one scan split the loop's
    // cost is pure per-round fixed overhead — AQE re-plans every stage
    // as its own job (~8 jobs/round observed vs 2), and wide shuffles
    // buy nothing on KB-scale tables. Scope AQE off + few partitions
    // for the rounds, restore after. Big graphs (the 100 TB case) keep
    // AQE (skew handling) and the session partitioning untouched.
    val spark = edges.sparkSession
    // Exact size of the MATERIALIZED edge set, read from the block
    // manager (zero jobs): the eager localCheckpoint above cached its
    // RDD, so its storage footprint is already known. Plan statistics
    // are NOT trustworthy here — a localCheckpoint carries the
    // PRE-checkpoint plan's estimate forward, and the embedding
    // pipeline's self-join cardinality estimate read 8.1e17 bytes for a
    // ~65 KB edge set, so small-graph mode silently never engaged for it
    // (guide §3.2's "estimates are often badly wrong" lesson, applied to
    // our own gate). Schema-width × count is no better for
    // variable-width ids (a 200-byte string id counts as 20). Unmatched
    // storage info falls back to Long.MaxValue = big-graph mode, the
    // safe direction.
    val symBytes = sym.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        spark.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .getOrElse(Long.MaxValue)
      case _ => Long.MaxValue
    }
    val smallGraph = symBytes <
      spark.sessionState.conf.filesMaxPartitionBytes
    if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] symBytes=$symBytes small=$smallGraph")
    def scopedRounds[T](body: => T): T =
      if (!smallGraph) body
      else {
        val keys = Seq("spark.sql.adaptive.enabled",
          "spark.sql.shuffle.partitions")
        val prev = keys.map(k => k -> spark.conf.get(k))
        keys.zip(Seq("false", "8")).foreach { case (k, v) =>
          spark.conf.set(k, v) }
        try body
        finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
      }
    scopedRounds(ccRounds(sym, maxIter, bcastLabels = smallGraph))
  }

  /** @param bcastLabels small-graph mode: broadcast the label table into
    *        both per-round joins (its size is bounded by the edge set the
    *        caller just measured exactly), so a round is one map-side
    *        pass + one aggregate exchange instead of three sort-merge
    *        exchanges — with AQE scoped off, the planner would otherwise
    *        fall back to SMJ on the garbage pre-checkpoint estimates
    *        (guide §3.1: broadcast explicitly when you KNOW the size). */
  private def ccRounds(
      sym: DataFrame, maxIter: Int, bcastLabels: Boolean): DataFrame = {
    def maybeB(df: DataFrame): DataFrame =
      if (bcastLabels) broadcast(df) else df
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor contributions + each node's own previous label (the
      // flagged self-row: exactly one per node, so max(self label) IS
      // the old label) through one aggregate
      val contrib = sym
        .join(maybeB(labels), sym("a") === labels("node"))
        .select(col("b").as("node"), col("label"),
          lit(false).as("__self"))
        .unionByName(labels.withColumn("__self", lit(true)))
      val neigh = contrib
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"),
          max(when(col("__self"), col("label"))).as("__old"))
      // pointer jumping (r15): ALSO shortcut label[v] := label[label[v]]
      // each round — plain min-propagation needs O(diameter) rounds
      // (the embedding near-dup graph at sf0.1 took 18; a pure 31-chain
      // takes 31), while one jump per round compounds propagation
      // exponentially (the 31-chain converges in 3 rounds; the real
      // graph's giant component in 12). More jumps per round measured
      // WORSE here — each adds a join to every round while the round
      // count barely moves on realistic (non-chain) topologies, where
      // fresh minima still arrive via graph edges one hop at a time. A
      // label is always a live node id, so the jump is an equi
      // self-join on the label table (tiny relative to edges).
      val j = neigh.select(col("node").as("__jn"), col("label").as("__jl"))
      val round = neigh
        .join(maybeB(j), neigh("label") === j("__jn"), "left")
        .select(neigh("node"),
          coalesce(col("__jl"), neigh("label")).as("label"), col("__old"))
        .localCheckpoint(true)
      converged = round.where(col("label") =!= col("__old")).isEmpty
      labels = round.select(col("node"), col("label"))
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
