package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.{CutSyntax, Iter}

/** Product quantization (PQ) — the memory-bound ANN codec (Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search"): split each
  * vector into `m` subvectors, k-means each subspace independently, store
  * a vector as `m` small codes. Search is ADC (asymmetric distance
  * computation): per query, one m×k table of subspace distances; a
  * candidate's distance is m table LOOKUPS + adds — the float corpus is
  * never touched during the candidate pass.
  *
  * Scale shape: at m=8, ksub≤256 a vector's code is 8 bytes — a 100 TB
  * float32 corpus's candidate structure compresses ~32×; training and
  * assignment are the same broadcast-argmax hash aggregates as [[Ivf]],
  * per subspace; the ADC pass shuffles codes + one decimal, never
  * vectors.
  *
  * Determinism: subspace distances are strict left folds in double
  * (DuckDB's list_reduce reproduces them bit-for-bit), the argmax rides
  * the packed-decimal trick ([[Ivf]]'s), and ADC table entries are
  * rounded to DECIMAL(28,9) at the subspace boundary so the m-way sum is
  * EXACT decimal — order-independent, which is what makes the whole
  * assign→table→sum→top-k pipeline hash-checkable against a SQL oracle
  * over the frozen codebook fixture (`fixtures/pq_centroids.parquet`).
  */
object Pq {

  /** Subvector `s` (0-based) of a vector split into equal `subDim` parts. */
  def subvec(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** Exact squared L2 between two float subvectors: strict left fold in
    * double (deterministic; oracle-reproducible via list_reduce). */
  def d2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Argmin-by-distance packed into one decimal (38,0): smaller d2 ⇒
    * larger packed value; low four digits break ties toward the lower
    * cluster id. Keeps the per-(vec, sub) argmin a HashAggregate (max
    * over a decimal), exactly like [[Ivf]]'s packScore. */
  private def pack(dist: Column, cluster: Column): Column =
    round((lit(0.0) - dist) * 1e13).cast("decimal(38,0)") * 10000 +
      (lit(9999) - cluster).cast("decimal(38,0)")

  private def unpack(p: Column): Column =
    (lit(9999) - pmod(p, lit(10000))).cast("int")

  /** (vec_id, sub, subvec) — one row per subspace. */
  def subvectors(embeddings: DataFrame, m: Int, subDim: Int): DataFrame =
    embeddings.select(col("vec_id"),
      posexplode(array((0 until m).map(s =>
        subvec(col("embedding"), s, subDim)): _*)).as(Seq("sub", "subvec")))

  private def centsF32(cents: DataFrame): DataFrame =
    cents.select(col("sub"), col("cluster"),
      col("centroid").cast("array<float>").as("cf"))

  /** Train `ksub` centroids per subspace with Lloyd iterations — all m
    * subspaces in ONE plan (grouped by `sub`), one corpus scan per
    * iteration. Seeds: the subvectors of vec_ids 0..ksub-1 (deterministic).
    * Returns (sub: int, cluster: int, centroid: array<double>). */
  def train(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
      iters: Int = 2, dim: Int = 64): DataFrame = {
    val sv = subvectors(embeddings, m, dim / m).cut(Iter)
    val centroidAgg = udaf(Centroid)
    // the m×ksub codebook is driver state between rounds (Bounded.local):
    // fault-tolerant, broadcasts naturally, lineage flat — the corpus-
    // sized sv above is the only executor-side materialization
    var cents = Bounded.local(sv.filter(col("vec_id") < ksub)
      .select(col("sub"), col("vec_id").cast("int").as("cluster"),
        col("subvec").cast("array<double>").as("centroid")))
    (0 until iters).foreach { _ =>
      cents = Bounded.local(sv.join(broadcast(centsF32(cents)), "sub")
        .select(col("vec_id"), col("sub"), col("subvec"),
          pack(d2(col("subvec"), col("cf")), col("cluster")).as("p"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(max(col("p")).as("best"), first(col("subvec")).as("subvec"))
        .select(col("sub"), unpack(col("best")).as("cluster"), col("subvec"))
        .groupBy(col("sub"), col("cluster"))
        .agg(centroidAgg(col("subvec")).as("centroid")))
    }
    cents
  }

  /** Encode: nearest sub-centroid per (vector, subspace) —
    * (vec_id, sub, code). The corpus's PQ representation. */
  def assign(embeddings: DataFrame, cents: DataFrame,
      m: Int = 8, dim: Int = 64): DataFrame =
    subvectors(embeddings, m, dim / m)
      .join(broadcast(centsF32(cents)), "sub")
      .select(col("vec_id"), col("sub"),
        pack(d2(col("subvec"), col("cf")), col("cluster")).as("p"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(max(col("p")).as("best"))
      .select(col("vec_id"), col("sub"), unpack(col("best")).as("code"))

  /** ADC shortlist: top-`shortlist` candidates per query by exact-decimal
    * ADC distance. The distance table (queries × m × ksub rows) is
    * broadcast; the codes relation — the only corpus-sized input — flows
    * through one lookup join and one (q_id, vec_id) hash aggregate.
    * Emits (q_id, vec_id, adc: decimal, rn). */
  def adcShortlist(queries: DataFrame, cents: DataFrame, codes: DataFrame,
      m: Int = 8, dim: Int = 64, shortlist: Int = 40): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    codes.join(broadcast(dtable(queries, cents, m, dim)), Seq("sub", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dd")).as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= shortlist)
  }

  /** Per-query ADC distance table: (q_id, sub, code, dd) — queries × m ×
    * ksub rows, the broadcast-sized lookup every ADC pass keys on. */
  private def dtable(queries: DataFrame, cents: DataFrame,
      m: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    val qsub = queries.select(col("q_id"),
      posexplode(array((0 until m).map(s =>
        subvec(col("qe"), s, subDim)): _*)).as(Seq("sub", "qsub")))
    qsub.join(broadcast(centsF32(cents)), "sub")
      .select(col("q_id"), col("sub"), col("cluster").as("code"),
        round(d2(col("qsub"), col("cf")), 9).cast("decimal(28,9)").as("dd"))
  }

  /** ADC restricted to a candidate set (the IVF-PQ composite): only
    * (q_id, vec_id) pairs in `candidates` are scored — the probed
    * clusters' codes, not the whole corpus, ride the aggregate. */
  def adcShortlistOver(candidates: DataFrame, queries: DataFrame,
      cents: DataFrame, codes: DataFrame,
      m: Int = 8, dim: Int = 64, shortlist: Int = 40): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    candidates.join(codes, "vec_id")
      .join(broadcast(dtable(queries, cents, m, dim)), Seq("q_id", "sub", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dd")).as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= shortlist)
  }
}
