package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time write of the TEXT-RETRIEVAL backbone — the d3 sibling of
  * `graft.dedup.Dedup.writeIndex` (LSH signatures),
  * `graft.plans.SketchCbo.writeSketch` (CBO cells) and
  * `graft.functions.AnnIndex.writeIndex` (IVF-PQ codes) — the third of
  * the four ingest-time artifact families, with incremental
  * maintenance via [[mergeBatch]].
  *
  * A production search pipeline tokenizes the corpus ONCE per ingest
  * and persists five relations; every query-time scorer (TF-IDF, BM25,
  * phrase/boolean/QL composition) then plans FROM the parquet index
  * and never re-reads corpus text:
  *
  *   - `postings` (term, doc_id, tf) — the inverted index proper;
  *   - `df`       (term, df)         — per-term document frequency;
  *   - `doclen`   (doc_id, dlen)     — per-doc token count (= Σ tf);
  *   - `ids`      (doc_id)           — the doc catalog (INCLUDING
  *                                     zero-token docs, which never
  *                                     reach postings/doclen but still
  *                                     count toward n for idf);
  *   - `stats`    1 row (n, avgdl)   — collection size + mean length.
  *
  * At 100 TB the win is twofold. The tokenize + group-by pass over raw
  * text (the dominant cost of every d3 query) is paid once per ingest
  * and amortized across every downstream search. And at query time the
  * term filter pushes down to the parquet scans (`PushedFilters:
  * In(term, ...)`) on BOTH postings and df, so a 3-term query reads a
  * vanishing fraction of the index instead of re-aggregating the whole
  * vocabulary — df/avgdl are point lookups, not scans.
  */
object TextIndex {

  /** Write the index for `docs` (must have `doc_id`, `text`) under
    * `path`. Overwrites — re-ingest replaces. */
  def writeIndex(docs: DataFrame, path: String): Unit = {
    val postings = docs
      .select(col("doc_id"), explode(Text.tokenize(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    postings.write.mode("overwrite").parquet(s"$path/postings")
    // derived sidecars read the postings JUST WRITTEN (never the corpus
    // text a second time): df by term, doc length as sum(tf)
    val written = postings.sparkSession.read.parquet(s"$path/postings")
    written.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/df")
    val dl = written.groupBy(col("doc_id")).agg(sum(col("tf")).as("dlen"))
    dl.write.mode("overwrite").parquet(s"$path/doclen")
    // the doc catalog — the id authority mergeBatch counts replacements
    // against (doclen cannot stand in: a zero-token doc has no doclen
    // row but IS a document for idf purposes — ADVICE r13)
    docs.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$path/ids")
    // n comes from the DOCUMENT relation, not the postings (a doc with
    // zero tokens is still a document for idf purposes); avgdl matches
    // the live leg's avg over docs that have at least one token
    dl.agg(avg(col("dlen")).as("avgdl"))
      .crossJoin(docs.agg(count(lit(1)).as("n")))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Incremental index maintenance — an ingest BATCH updates the five
    * persisted relations WITHOUT re-tokenizing the corpus (the
    * d5_incremental_lsh discipline applied to the text index): only
    * the batch is tokenized; existing postings for replaced doc_ids
    * are dropped by an anti-join (doc_id-pushed parquet scan) and the
    * batch postings unioned in; df is maintained as old df + a
    * term-DELTA computed from the batch postings and the (small,
    * id-filtered) replaced postings — never a re-aggregation of the
    * whole vocabulary from postings; doclen merges the same way; stats
    * re-folds the merged DOCLEN relation (doc-count-sized — orders of
    * magnitude below the postings, let alone the corpus).
    *
    * Upsert semantics: a batch doc replaces any existing doc with the
    * same id, else inserts. Writes overwrite paths they read, so each
    * merged relation severs lineage eagerly first
    * ([[graft.Materialize]] class (c) Barrier — the DocStore
    * uploadBatch discipline). At 100 TB postings/doclen are
    * partitioned (by term range / doc range) and the merge becomes a
    * dynamic-partition overwrite of touched partitions only; the
    * single-file overwrite here is the local-mode spelling of the same
    * plan. d3_bm25_index_incremental proves build(corpus∖batch) +
    * mergeBatch(batch) ≡ writeIndex(corpus) bit-for-bit through BM25. */
  def mergeBatch(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    import graft.Materialize.CutSyntax
    import graft.Materialize.Barrier
    val batchPost = batch
      .select(col("doc_id"), explode(Text.tokenize(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cut(Barrier) // consumed by three writes that overwrite inputs
    val batchIds = batch.select(col("doc_id")).distinct()
    val oldPost = spark.read.parquet(s"$path/postings")
    // replaced docs' old postings: a doc_id-semi-joined scan — batch-
    // sized output, and the broadcast id set prunes at the scan
    val replacedPost = oldPost
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
    // term delta for df: +1 per (new doc, term), −1 per (replaced doc,
    // term) — rides batch size only
    val dfDelta = batchPost.select(col("term"), lit(1L).as("d"))
      .unionAll(replacedPost.select(col("term"), lit(-1L).as("d")))
      .groupBy(col("term")).agg(sum(col("d")).as("ddf"))
      .cut(Barrier)
    val mergedPost = oldPost
      .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
      .unionByName(batchPost)
      .cut(Barrier) // overwrites its own input path
    mergedPost.write.mode("overwrite").parquet(s"$path/postings")
    val oldDf = spark.read.parquet(s"$path/df")
    val mergedDf = oldDf
      .join(dfDelta, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("ddf"), lit(0L)))
          .as("df"))
      .filter(col("df") > 0)
      .cut(Barrier)
    mergedDf.write.mode("overwrite").parquet(s"$path/df")
    val batchDl = batchPost.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dlen"))
    val oldDl = spark.read.parquet(s"$path/doclen")
    // batch ids already present BEFORE the merge, counted against the
    // persisted `ids` CATALOG — not doclen, which misses zero-token
    // docs and would inflate n when such a doc is replaced (ADVICE
    // r13); the catalog merges by the same anti-join + union
    val oldIds = spark.read.parquet(s"$path/ids")
    val nPresentBefore = oldIds
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi").count()
    val mergedIds = oldIds
      .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
      .unionByName(batchIds)
      .cut(Barrier) // overwrites its own input path
    mergedIds.write.mode("overwrite").parquet(s"$path/ids")
    val mergedDl = oldDl
      .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
      .unionByName(batchDl)
      .cut(Barrier) // overwrites its own input path
    mergedDl.write.mode("overwrite").parquet(s"$path/doclen")
    // n: previous doc count − replaced + batch; avgdl re-folds the
    // merged DOCLEN (doc-count-sized), matching writeIndex's semantics
    val oldN = spark.read.parquet(s"$path/stats")
      .select(col("n")).collect()(0).getLong(0)
    val nNew = oldN - nPresentBefore + batchIds.count()
    mergedDl.agg(avg(col("dlen")).as("avgdl"))
      .select(col("avgdl"), lit(nNew).as("n"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k from a persisted index — bit-identical to the live
    * `d3_search_bm25` plan, zero tokenize work at query time: postings
    * and df scans are term-filtered parquet reads, stats is one row. */
  def bm25(spark: SparkSession, path: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(queryTerms: _*))
    val dfreq = spark.read.parquet(s"$path/df")
      .filter(col("term").isin(queryTerms: _*))
    val dl = spark.read.parquet(s"$path/doclen")
    val stats = spark.read.parquet(s"$path/stats")
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val score = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("dlen") / col("avgdl")))
    postings
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(score), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
  }
}
