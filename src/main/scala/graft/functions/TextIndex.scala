package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time write of the TEXT-RETRIEVAL backbone — the d3 sibling of
  * `graft.dedup.Dedup.writeIndex` (LSH signatures) and
  * `graft.plans.SketchCbo.writeSketch` (CBO cells), completing the
  * third and last ingest-time artifact family.
  *
  * A production search pipeline tokenizes the corpus ONCE per ingest
  * and persists four relations; every query-time scorer (TF-IDF, BM25,
  * phrase/boolean/QL composition) then plans FROM the parquet index
  * and never re-reads corpus text:
  *
  *   - `postings` (term, doc_id, tf) — the inverted index proper;
  *   - `df`       (term, df)         — per-term document frequency;
  *   - `doclen`   (doc_id, dlen)     — per-doc token count (= Σ tf);
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
    // n comes from the DOCUMENT relation, not the postings (a doc with
    // zero tokens is still a document for idf purposes); avgdl matches
    // the live leg's avg over docs that have at least one token
    dl.agg(avg(col("dlen")).as("avgdl"))
      .crossJoin(docs.agg(count(lit(1)).as("n")))
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
