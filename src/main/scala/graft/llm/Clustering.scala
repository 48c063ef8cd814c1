package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed k-means (Lloyd's algorithm) over an embedding column — the
 * trainable coarse quantizer behind IVF ANN ([[Similarity.ivfTopK]]) and
 * semantic-cluster curation (SemDeDup-style): train centroids once, then
 * assignment is a shuffle-free projection.
 *
 * Scale shape per iteration:
 *  - assignment: broadcast the k×dim centroids as literal expressions into
 *    a codegen'd argmin projection — NO join, NO shuffle;
 *  - update: one posexplode of assigned vectors into (cluster, dim, x)
 *    and one partially-aggregated groupBy(cluster, dim) — the only
 *    shuffle, with map-side combine; k×dim values return to the driver
 *    per iteration (the centroids themselves, bounded and tiny).
 *
 * Determinism: init is the first k distinct-id vectors; assignment breaks
 * distance ties toward the lowest cluster id. The centroid update has two
 * modes:
 *  - fast (default): plain sum/count per (cluster, dim). FP addition runs
 *    in shuffle arrival order — the standard production path, not
 *    bit-reproducible across engines/layouts.
 *  - exact: per (cluster, dim) the member values are folded in ascending
 *    row-id order, making every centroid a well-defined IEEE value any
 *    engine can replay bit-for-bit. Costs a collect_list per group (group
 *    size = cluster population), so it is for verification/small-k
 *    calibration runs, NOT the 100 TB path.
 */
object Clustering {

  /** Squared-euclidean distance of a vector column to a literal centroid,
    * summed in ascending dimension order (bit-reproducible). */
  private def dist2(vec: Column, c: Array[Double]): Column =
    aggregate(zip_with(vec, array(c.map(lit): _*),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** The k distances of a vector to literal centroids, as one array
    * column. Callers MUST bind this to its own column (withColumn) before
    * referencing it twice: lambda-bearing expressions are excluded from
    * Spark's subexpression elimination, so inlining it into both
    * array_position and array_min would run the whole k×dim arithmetic
    * twice per row. */
  private def distArr(vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map(c => dist2(vec, c)): _*)

  /** Argmin over a bound distance-array column, first-match (= lowest
    * cluster id) tie-break. */
  private def argminCluster(darr: Column): Column =
    (array_position(darr, array_min(darr)) - 1).cast("int")

  /**
   * Train `k` centroids with `iters` Lloyd iterations. Returns the final
   * centroids (k × dim). Clusters that lose all members keep their previous
   * centroid (the standard empty-cluster fallback).
   */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      exact: Boolean = false): Array[Array[Double]] = {
    require(k >= 1, "kmeans: k must be >= 1")
    require(iters >= 0, "kmeans: iters must be >= 0")
    // persisted for the loop: without it every Lloyd iteration (plus the
    // init collect) re-scans and re-projects the full corpus from source.
    // NaN-bearing vectors drop with NULLs: one NaN element makes EVERY
    // distance NaN, Spark's NaN=NaN equality assigns the row to cluster 0,
    // and the NaN __x sums then corrupt that centroid to NaN permanently
    // (the empty-cluster fallback preserves it — k silently became k-1)
    val base = corpus.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), x => isnan(x)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // deterministic init: the first k vectors by id (same quantizer seed
    // rule as ivfTopK — production would kmeans||-sample instead; the
    // iteration machinery is identical either way)
    var centroids: Array[Array[Double]] = base.orderBy(col("__id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "kmeans: corpus has no non-null embeddings")
    require(centroids.length == k,
      s"kmeans: corpus has only ${centroids.length} usable embeddings for " +
        s"k=$k — a silently smaller model would surprise every consumer " +
        "that persisted 'the k-cell quantizer' (pass a smaller k)")
    val dim = centroids(0).length
    require(centroids.forall(_.length == dim),
      s"kmeans: mixed embedding widths in the init sample " +
        s"(${centroids.map(_.length).distinct.mkString(", ")})")
    requireWidth(corpus, vecCol, dim, "kmeansCentroids")

    for (_ <- 0 until iters) {
      val assigned = base
        .withColumn("__d", distArr(col("__v"), centroids))
        .withColumn("__c", argminCluster(col("__d")))
        .drop("__d")
      val exploded = assigned.select(col("__id"), col("__c"),
        posexplode(col("__v")).as(Seq("__i", "__x")))
      val sums =
        if (exact)
          exploded.groupBy("__c", "__i").agg(
            (aggregate(array_sort(collect_list(struct(col("__id"), col("__x").as("x")))),
              lit(0.0), (acc, s) => acc + s("x")) /
              count(lit(1)).cast("double")).as("__m"))
        else
          exploded.groupBy("__c", "__i")
            .agg((sum(col("__x")) / count(lit(1)).cast("double")).as("__m"))
      val next = sums.collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          val arr = new Array[Double](dim)
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          c -> arr
        }
      centroids = Array.tabulate(centroids.length)(c => next.getOrElse(c, centroids(c)))
    }
    centroids
    } finally base.unpersist()
  }

  /** Assign every vector to its nearest centroid (shuffle-free projection).
    * Returns the input plus (cluster, dist2). NULL embeddings are DROPPED
    * — they have no nearest centroid, and passing them through would emit
    * half-null (cluster=NULL, dist2=NULL) rows that silently poison any
    * downstream group-by (and diverge from training, which excludes them). */
  def kmeansAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "kmeansAssign: no centroids")
    requireWidth(corpus, vecCol, centroids(0).length, "kmeansAssign")
    val v = col(vecCol).cast("array<double>")
    corpus
      // NaN-bearing vectors drop like NULLs (all-NaN distances would pin
      // the row to cluster 0 with dist2=NaN — the half-garbage rows this
      // contract forbids), matching training's filter
      .filter(col(vecCol).isNotNull && !exists(v, x => isnan(x)))
      .withColumn("__d", distArr(v, centroids))
      .withColumn("cluster", argminCluster(col("__d")))
      .withColumn("dist2", element_at(col("__d"), col("cluster") + 1))
      .drop("__d")
  }

  /** A vector whose width differs from the centroid dim zip_with-null-pads
    * every distance to NULL: training crashes mid-job on a NULL cluster id
    * and assignment emits the half-null rows its contract forbids. Probe
    * one non-null row (the Similarity.requireDim discipline) and fail with
    * an actionable message instead. */
  private def requireWidth(df: DataFrame, vecCol: String, dim: Int,
      op: String): Unit =
    Similarity.probeWidth(df, vecCol).foreach { w =>
      require(w == dim,
        s"$op: centroid dim=$dim does not match embedding width $w")
    }

  /** Train + assign in one call: (idCol, cluster, dist2). */
  def kmeans(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      exact: Boolean = false): DataFrame = {
    val cs = kmeansCentroids(corpus, idCol, vecCol, k, iters, exact)
    kmeansAssign(corpus, idCol, vecCol, cs)
      .select(col(idCol), col("cluster"), col("dist2"))
  }
}
