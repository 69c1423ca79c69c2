package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd's k-means over `array<float>` embedding columns —
  * the trained-centroid path for IVF vector search (the every-Nth-vector
  * "centroids" in q_vector_ivf_topk are the untrained stand-in; real
  * deployments train).
  *
  * Determinism contract (same spirit as VectorOps): init = the k lowest
  * ids; assignment maximizes 2·x·c − c·c (argmin euclidean without the
  * per-row |x|² constant) with ties to the LOWEST centroid id via the
  * max(struct) reduction; centroid means are per-dimension EXACT decimal
  * sums divided by counts — partial-agg order cannot change a bit, so two
  * runs produce identical centroids.
  *
  * Scale: per iteration one broadcast of k centroids, one map-side-reduced
  * max(struct) assignment (no global sort — the q_vector_ivf_topk shape),
  * one (centroid, dim) aggregation over posexploded rows. Lineage is cut
  * per iteration with localCheckpoint.
  */
object KMeans {

  /** @return (cent_id, centroid: array<double>) — cent_id 0..k-1 by init
    *         order. */
  def apply(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k > 0 && iters > 0)
    val vecs = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))

    // Deterministic SPREAD init: ids at multiples of ceil((maxId+1)/k)
    // sample across the id range (the k lowest ids would all come from
    // one region of the corpus and collapse clusters), first k by id,
    // relabeled 0..k-1. Scan-parallel — no global sort of the corpus.
    val maxId = vecs.agg(max(col("__id"))).head().getLong(0)
    val stride = math.max(1L, (maxId + k) / k)
    var cents = vecs.where(pmod(col("__id"), lit(stride)) === 0)
      .orderBy(col("__id")).limit(k)
      .select(col("__id"), transform(col("__v"), _.cast("double")).as("__c"))
      .withColumn("cent_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__id"))) - 1)
      .select(col("cent_id").cast("long").as("cent_id"), col("__c"))
      .localCheckpoint(true)

    (1 to iters).foreach { _ =>
      val scored = vecs.join(broadcast(cents))
        .select(col("__id"), col("__v"), col("cent_id"),
          (lit(2.0) * VectorOps.dotDouble(col("__v"),
            transform(col("__c"), _.cast("float"))) -
            VectorOps.dotDouble(
              transform(col("__c"), _.cast("float")),
              transform(col("__c"), _.cast("float")))).as("score"))
      val assign = scored
        .groupBy(col("__id"), col("__v"))
        .agg(max(struct(col("score"), (-col("cent_id")).as("nc"))).as("best"))
        .select(col("__id"), col("__v"), (-col("best.nc")).as("cent_id"))
      val updated = assign
        .select(col("cent_id"), posexplode(col("__v")).as(Seq("dim", "x")))
        .groupBy(col("cent_id"), col("dim"))
        .agg((sum(col("x").cast(DecimalType(27, 9))).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m"))))
          .as("entries"))
        .select(col("cent_id"),
          transform(col("entries"), e => e.getField("m")).as("__new"))
      // a cluster that captured no points keeps its previous centroid
      cents = cents.join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("__new"), col("__c")).as("__c"))
        .localCheckpoint(true)
    }
    cents.select(col("cent_id"), col("__c").as("centroid"))
  }
}
