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
  * Scale: per round one equi-join edges⋈labels plus one min-aggregate —
  * all shuffle-partitioned by node id, no driver-side graph. Lineage is
  * cut per round with localCheckpoint so the plan stays flat across
  * iterations (the classic iterative-Spark pitfall).
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
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = sym
        .join(labels, sym("a") === labels("node"))
        .select(col("b").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      converged = prop
        .join(labels.withColumnRenamed("label", "old"), "node")
        .where(col("label") =!= col("old"))
        .isEmpty
      labels = prop
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
