package graft.queries

import org.apache.spark.sql.functions._
import graft.Canon._
import graft.sources.Tables

/** Graph analytics over the document corpus — the link-graph quality
  * signals a web-scale training-data pipeline runs next to dedup
  * (PageRank-weighted sampling is the classic crawl-quality prior; the
  * connected-components side lives in [[graft.dedup.Dedup]]).
  *
  * The reference has no graph surface at all; this is mandate-driven
  * (SURVEY.md §2.9 quality scoring, extended to link structure).
  */
object GraphOps {

  val all: Seq[Q] = Seq(
    Q(
      "g1_pagerank",
      // PageRank, EXACT-hash-checked despite being iterative float math:
      // the graph is built so every intermediate stays a dyadic rational
      // with a short mantissa — out-degree exactly 4 (contribution =
      // rank/4, an exponent shift) and damping 7/8 (3 mantissa bits per
      // round), so every per-node sum is EXACT in IEEE double and
      // therefore independent of Spark's aggregation order. 3 unrolled
      // iterations ≈ 15 low bits + ~9 value bits ≪ 53. The link graph is
      // deterministic: doc d links to (d*31 + k*17 + 7) mod N, k ∈ 0..3.
      //
      // 100 TB shape: per iteration one join shuffle (edges ⋈ ranks on
      // src — co-partitionable across iterations since the key never
      // changes) + one hash aggregate on dst with map-side partials; the
      // driver holds nothing but the scalar N. Rounds are a fixed count,
      // not data-dependent.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |e AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks
             |),
             |r0 AS (SELECT doc_id, 1.0::DOUBLE AS pr FROM documents),
             |c1 AS (SELECT e.dst AS doc_id, sum(r.pr/4) AS cin
             |       FROM e JOIN r0 r ON r.doc_id = e.src GROUP BY e.dst),
             |r1 AS (SELECT d.doc_id, 0.125 + 0.875*coalesce(c.cin, 0.0) AS pr
             |       FROM documents d LEFT JOIN c1 c USING (doc_id)),
             |c2 AS (SELECT e.dst AS doc_id, sum(r.pr/4) AS cin
             |       FROM e JOIN r1 r ON r.doc_id = e.src GROUP BY e.dst),
             |r2 AS (SELECT d.doc_id, 0.125 + 0.875*coalesce(c.cin, 0.0) AS pr
             |       FROM documents d LEFT JOIN c2 c USING (doc_id)),
             |c3 AS (SELECT e.dst AS doc_id, sum(r.pr/4) AS cin
             |       FROM e JOIN r2 r ON r.doc_id = e.src GROUP BY e.dst),
             |r3 AS (SELECT d.doc_id, 0.125 + 0.875*coalesce(c.cin, 0.0) AS pr
             |       FROM documents d LEFT JOIN c3 c USING (doc_id))
             |SELECT doc_id, pr FROM r3
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        var ranks = docs.select(col("doc_id"), lit(1.0).as("pr"))
        for (_ <- 1 to 3) {
          val contribs = edges.join(ranks, col("src") === col("doc_id"))
            .select(col("dst"), (col("pr") / 4).as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
          ranks = docs.join(contribs, col("doc_id") === col("dst"), "left")
            .select(col("doc_id"),
              (lit(0.125) + lit(0.875) * coalesce(col("cin"), lit(0.0))).as("pr"))
        }
        ordered(ranks)
      }
    )
  )
}
