package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space diagnostics: dominant principal direction by
  * distributed power iteration.
  *
  * v_{k+1} = normalize( mean_x  x * (x · v_k) )  — repeated Gram-matrix /
  * vector products without ever materializing the Gram matrix. Each round
  * is ONE corpus scan: the projection x·v_k is a codegen'd dot product
  * against a broadcast literal, and the vector sum is the fixed-width
  * [[Centroid]] partial/final aggregate, so the shuffle carries one
  * dim-sized buffer per partition. The driver holds only the dim-sized
  * direction vector (the "model"), never data — the same shape as
  * [[Ivf]] training.
  *
  * Used for corpus health checks (a dominant direction capturing most of
  * the energy usually means un-centered or collapsed embeddings) and as
  * the projection axis for cheap 1-d bucketing.
  */
object Pca {

  /** One power-iteration step's scaled-vector column: x * (x·v), with the
    * scalar projection bound ONCE (an element lambda referencing the dot
    * expression directly would re-evaluate it per element). */
  private def scaledBy(vecCol: Column, v: Array[Double]): Column = {
    val proj = Vectors.dotFast(vecCol, typedLit(v.map(_.toFloat)))
    flatten(transform(array(proj), w =>
      transform(vecCol, e => (e * w).cast("float"))))
  }

  /** Dominant (uncentered) principal direction, unit-norm, sign-canonical
    * (first nonzero component positive). */
  def dominantDirection(
      embs: DataFrame, vecCol: String, dim: Int, iters: Int = 8): Array[Double] = {
    val centroidU = udaf(Centroid)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    for (_ <- 0 until iters) {
      val mean = embs
        .select(centroidU(scaledBy(col(vecCol), v)).as("m"))
        .collect().head.getSeq[Double](0).toArray
      val n = math.sqrt(mean.map(x => x * x).sum)
      if (n > 0) v = mean.map(_ / n)
    }
    val lead = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
    if (lead < 0) v.map(-_) else v
  }

  /** Raw UNNORMALIZED power rounds — the golden-fixture hash face
    * (d6_pca_golden, the d7_compression_golden recipe): on a small
    * integer-valued fixture with a power-of-two row count, every
    * product, partial sum and mean (÷2^k) is a dyadic rational far
    * inside float32 range, so ALL arithmetic — including the per-round
    * float casts — is exact and therefore order-independent across
    * partitions: the same [[Centroid]]/dot machinery the corpus path
    * runs becomes hash-checkable against a SQL oracle. The normalized
    * corpus path ([[dominantDirection]]) stays spec-mode: its
    * per-round float sums are order-sensitive by nature. */
  def powerRounds(embs: DataFrame, vecCol: String, dim: Int, iters: Int,
      v0: Array[Double]): Array[Double] = {
    val centroidU = udaf(Centroid)
    var v = v0
    for (_ <- 0 until iters)
      v = embs.select(centroidU(scaledBy(col(vecCol), v)).as("m"))
        .collect().head.getSeq[Double](0).toArray
    v
  }

  /** Rayleigh quotient E[(x·v)^2] of a direction — the variance (energy)
    * the corpus carries along v; one scan. */
  def energy(embs: DataFrame, vecCol: String, v: Array[Double]): Double = {
    val proj = Vectors.dotFast(col(vecCol), typedLit(v.map(_.toFloat)))
    embs.select(avg(proj * proj)).collect().head.getDouble(0)
  }
}
