package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.{CutSyntax, Shared}

/** Ingest-time write of the ANN BACKBONE — the FOURTH and last
  * ingest-time artifact family (after CBO sketches
  * `graft.plans.SketchCbo.writeSketch`, LSH signatures
  * `graft.dedup.Dedup.writeIndex`, and text postings
  * `graft.functions.TextIndex.writeIndex`).
  *
  * A production vector pipeline trains/loads its codebooks and encodes
  * the corpus ONCE per ingest, persisting four relations; query-time
  * IVF-PQ search then plans FROM the parquet index and touches raw
  * float vectors only for the final exact rerank of a bounded
  * shortlist:
  *
  *   - `ivf_centroids` (cluster, centroid)    — the coarse codebook;
  *   - `pq_centroids`  (sub, cluster, centroid) — the m sub-codebooks;
  *   - `ivf`           (vec_id, cluster)      — the inverted file;
  *   - `codes`         (vec_id, sub, code)    — 8-byte PQ codes.
  *
  * At 100 TB the win: nearest-centroid assignment and PQ encoding are
  * each a corpus×codebook broadcast-argmax pass — the dominant cost of
  * every ANN query — paid once per ingest and amortized across every
  * search. At query time the probe pass is queries×k (broadcast), the
  * candidate pass joins the probed clusters' inverted lists, ADC rides
  * the 8-byte codes, and the float corpus serves only shortlist-sized
  * point lookups. On disk you bucket `ivf`+`codes` by cluster so a
  * probe reads nProbe/k of the index.
  */
object AnnIndex {

  /** Write the IVF-PQ index for `embeddings` (vec_id, embedding) under
    * `path`, given the trained/frozen codebooks. Overwrites —
    * re-ingest replaces. */
  def writeIndex(embeddings: DataFrame, ivfCents: DataFrame,
      pqCents: DataFrame, path: String, m: Int = 8, dim: Int = 64): Unit = {
    ivfCents.write.mode("overwrite").parquet(s"$path/ivf_centroids")
    pqCents.write.mode("overwrite").parquet(s"$path/pq_centroids")
    Ivf.assign(embeddings, ivfCents)
      .write.mode("overwrite").parquet(s"$path/ivf")
    Pq.assign(embeddings, pqCents, m, dim)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Incremental index maintenance — an ingest BATCH updates the two
    * corpus-sized relations (`ivf`, `codes`) WITHOUT re-encoding the
    * corpus (the [[TextIndex.mergeBatch]] recipe applied to the ANN
    * backbone): only the batch runs the two codebook argmax passes
    * (IVF assignment + PQ encoding — each a batch×codebook broadcast
    * cross join, riding BATCH size); existing rows for replaced
    * vec_ids are dropped by a broadcast-id anti-join (vec_id-pushable
    * at the parquet scan) and the batch rows unioned in. Codebooks
    * stay FROZEN — the production regime between retrains; a drifted
    * corpus re-trains and re-ingests via [[writeIndex]].
    *
    * Upsert semantics: a batch vector replaces any existing vector
    * with the same id, else inserts. Each merged relation overwrites
    * the path it was read from, so lineage is severed eagerly first
    * ([[graft.Materialize]] Barrier — the DocStore uploadBatch
    * discipline). At 100 TB `ivf`+`codes` are bucketed by cluster and
    * the merge becomes a dynamic-partition overwrite of the touched
    * clusters only; the single-dir overwrite here is the local-mode
    * spelling of the same plan. d6_ivfpq_index_incremental proves
    * build(corpus∖batch) + mergeBatch(batch) ≡ writeIndex(corpus)
    * bit-for-bit through the IVF-PQ search. */
  def mergeBatch(spark: SparkSession, path: String, batch: DataFrame,
      m: Int = 8, dim: Int = 64): Unit = {
    import graft.Materialize.{CutSyntax, Barrier}
    val ivfCents = spark.read.parquet(s"$path/ivf_centroids")
    val pqCents = spark.read.parquet(s"$path/pq_centroids")
    val batchIds = batch.select(col("vec_id")).distinct()
    val batchIvf = Ivf.assign(batch, ivfCents)
    val batchCodes = Pq.assign(batch, pqCents, m, dim)
    val oldIvf = spark.read.parquet(s"$path/ivf")
    val mergedIvf = oldIvf
      .join(broadcast(batchIds), Seq("vec_id"), "left_anti")
      .unionByName(batchIvf)
      .cut(Barrier) // overwrites its own input path
    mergedIvf.write.mode("overwrite").parquet(s"$path/ivf")
    val oldCodes = spark.read.parquet(s"$path/codes")
    val mergedCodes = oldCodes
      .join(broadcast(batchIds), Seq("vec_id"), "left_anti")
      .unionByName(batchCodes)
      .cut(Barrier) // overwrites its own input path
    mergedCodes.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** IVF-PQ top-k from a persisted index — bit-identical to the live
    * composite (d6_ivfpq_search), zero corpus assignment/encoding at
    * query time. `queries` = (q_id, qe); `corpusFloats` = (vec_id,
    * embedding) used ONLY for the shortlist-sized exact rerank. */
  def ivfpqSearch(spark: SparkSession, path: String, queries0: DataFrame,
      corpusFloats: DataFrame, nProbe: Int = 2, shortlist: Int = 20,
      topK: Int = 5, m: Int = 8, dim: Int = 64): DataFrame = {
    // the query set is consumed three times (probe selection, ADC
    // distance table, exact rerank) and is broadcast-sized by nature —
    // materialize it once so the only corpus-relation scan left in the
    // plan is the shortlist rerank's point lookup
    val queries = queries0.cut(Shared)
    val ivfCents = spark.read.parquet(s"$path/ivf_centroids")
    val pqCents = spark.read.parquet(s"$path/pq_centroids")
    val asg = spark.read.parquet(s"$path/ivf")
    val codes = spark.read.parquet(s"$path/codes")
    val cand = Ivf.probes(queries, ivfCents, nProbe)
      .select(col("q_id"), col("cluster"))
      .join(asg, Seq("cluster"))
      .select(col("q_id"), col("vec_id"))
    val short = Pq.adcShortlistOver(cand, queries, pqCents, codes,
        m, dim, shortlist)
      .select(col("q_id"), col("vec_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("l2").asc, col("vec_id").asc)
    short
      .join(corpusFloats.select(col("vec_id"), col("embedding")), "vec_id")
      .join(queries, "q_id")
      .select(col("q_id"), col("vec_id"),
        Pq.d2(col("qe"), col("embedding")).as("l2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
  }
}
