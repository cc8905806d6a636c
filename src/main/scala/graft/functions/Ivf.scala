package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the second mandate ANN path next to
  * sign-LSH ([[Vectors.lshTables]]).
  *
  * Everything is DataFrame-shaped: training is Lloyd's iterations where
  * assignment is a broadcast join against the (tiny) centroid relation
  * and the update step is the [[Centroid]] typed aggregator; the index is
  * one `(cluster, vec_id, embedding)` relation, naturally partitionable
  * by cluster at 100 TB; search probes the `nProbe` nearest clusters and
  * reranks exactly with the native codegen'd cosine. Seeding is
  * deterministic (k lowest vec_ids), so the index is reproducible.
  *
  * Recall/cost dial: nProbe (search) and k (train). The brute-force
  * baseline is `d6_cosine_topk`; FunctionsSpec measures IVF recall
  * against it.
  */
object Ivf {

  /** Train k centroids with `iters` Lloyd iterations. Returns
    * (cluster: int, centroid: array<double>). */
  def train(embeddings: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val centroidAgg = udaf(Centroid)
    // deterministic seeding: the k lowest vec_ids. The codebook is k rows
    // of driver state between rounds (Bounded.local — the distributed-
    // Lloyd discipline: the driver holds k×dim, never the corpus), so
    // cluster ids come from a k-sized literal id→rank map — not a
    // Window.orderBy over the whole relation, which would spam the
    // misleading "No Partition Defined" scale warning.
    val seeds = Bounded.local(embeddings.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("centroid")))
    val ranks: Map[Long, Int] = seeds.select(col("vec_id")).collect()
      .map(_.getLong(0)).sorted.zipWithIndex.toMap
    var cents = seeds
      .select(element_at(typedlit(ranks), col("vec_id")).as("cluster"),
        col("centroid"))
    (0 until iters).foreach { _ =>
      // one embeddings scan per iteration: the vector rides through the
      // argmax aggregate, so the update step needs no second scan and no
      // shuffle join back onto embeddings; each round's k-row result
      // lands back in driver state (flat lineage, fault-tolerant)
      cents = Bounded.local(assignKeepVec(embeddings, cents)
        .groupBy(col("cluster"))
        .agg(centroidAgg(col("embedding")).as("centroid")))
    }
    cents
  }

  /** Centroids with the vector as array<float>: lets the assignment and
    * probe cross joins use the native codegen'd CosineF32 (requires both
    * sides f32). The cast runs once on the k-row broadcast side; the
    * float rounding of centroid components only moves assignment
    * boundaries (measured recall is unchanged — FunctionsSpec). */
  private def centsF32(cents: DataFrame): DataFrame =
    cents.select(col("cluster"), col("centroid").cast("array<float>").as("centroid"))

  /** Argmax ordering packed into ONE decimal(38,0): max(struct(sim,
    * cluster)) would demote the aggregate to SortAggregate (structs
    * aren't mutable agg-buffer types); a packed numeric keeps the
    * HashAggregate with map-side partials. sim in [-1,1] shifts to
    * [0,1e15] at 1e-15 resolution (beyond double ulp near 1), low four
    * digits carry the min-cluster tiebreak. */
  private def packScore(sim: org.apache.spark.sql.Column,
      cluster: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round((sim + 1.0) * 5e14).cast("decimal(38,0)") * 10000 +
      (lit(9999) - cluster).cast("decimal(38,0)")

  private def unpackCluster(packed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(9999) - pmod(packed, lit(10000))).cast("int")

  /** Nearest-centroid assignment carrying the vector:
    * (vec_id, embedding, cluster). The embedding is constant per vec_id
    * across the centroid cross join, so `first` is exact.
    *
    * Deliberate trade: `first` over an array buffer demotes this
    * aggregate to sort-based (arrays aren't mutable agg-buffer types),
    * but the partial/final structure still reduces k*n rows to n before
    * the shuffle, and the alternative — aggregating ids only and shuffle-
    * joining embeddings back per Lloyd iteration — costs a second corpus
    * scan plus a join per iteration (measured worse in round 2). */
  private def assignKeepVec(embeddings: DataFrame, cents: DataFrame): DataFrame =
    embeddings.crossJoin(broadcast(centsF32(cents)))
      .select(col("vec_id"), col("embedding"),
        packScore(Vectors.cosineFast(col("embedding"), col("centroid")),
          col("cluster")).as("p"))
      .groupBy(col("vec_id"))
      .agg(max(col("p")).as("best"), first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), unpackCluster(col("best")).as("cluster"))

  /** Nearest-centroid assignment: (vec_id, cluster). */
  def assign(embeddings: DataFrame, cents: DataFrame): DataFrame =
    embeddings.crossJoin(broadcast(centsF32(cents)))
      .select(col("vec_id"),
        packScore(Vectors.cosineFast(col("embedding"), col("centroid")),
          col("cluster")).as("p"))
      .groupBy(col("vec_id"))
      .agg(max(col("p")).as("best"))
      .select(col("vec_id"), unpackCluster(col("best")).as("cluster"))

  /** The inverted file: (cluster, vec_id, embedding). At scale this is
    * what you bucket/partition by cluster on disk. */
  def index(embeddings: DataFrame, cents: DataFrame): DataFrame =
    assignKeepVec(embeddings, cents)
      .select(col("cluster"), col("vec_id"), col("embedding"))

  /** Top-k cosine search probing the nProbe nearest clusters per query.
    * `queries` = (q_id, qe: array<float>). */
  /** The nProbe nearest clusters per query: (q_id, qe, cluster). The
    * probe-selection stage shared by [[search]] and the IVF-PQ composite. */
  def probes(queries: DataFrame, cents: DataFrame, nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("cluster").asc)
    queries.crossJoin(broadcast(centsF32(cents)))
      .select(col("q_id"), col("qe"), col("cluster"),
        Vectors.cosineFast(col("qe"), col("centroid")).as("sim"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("qe"), col("cluster"))
  }

  def search(
      ivf: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      nProbe: Int,
      topK: Int
  ): DataFrame = {
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    ivf.join(broadcast(probes(queries, cents, nProbe)), "cluster")
      .select(col("q_id"), col("vec_id"),
        Vectors.cosineFast(col("qe"), col("embedding")).as("cos"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topK)
      .select(col("q_id"), col("rn"), col("vec_id"), col("cos"))
  }
}
