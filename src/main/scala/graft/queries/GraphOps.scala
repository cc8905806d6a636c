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
    ),
    Q(
      "g2_triangles",
      // Exact triangle count + global clustering coefficient over the
      // same deterministic link graph as g1 — the local-density
      // diagnostic run next to connected components (dup families with
      // high clustering are template farms; low clustering means chains
      // of borderline pairs). Edges are canonicalized a < b, so the
      // ordered triple join (a,b)⋈(b,c)⋈(a,c) counts each triangle
      // exactly once; wedges come from the degree relation
      // (Σ d(d−1)/2 — integer, d(d−1) is even); the coefficient
      // 3T/wedges is a ratio of exact BIGINTs rounded once. 100 TB
      // shape: all equi-joins on edge endpoints (the standard
      // edge-iterator algorithm — at real scale the join is oriented
      // low-degree → high-degree, which this a < b canonical form
      // already approximates on a near-regular graph); degrees and the
      // final scalars ride the edge relation, never the corpus.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |raw AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks
             |),
             |e AS (
             |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |  FROM raw WHERE src <> dst
             |),
             |deg AS (
             |  SELECT v, count(*) AS d
             |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
             |),
             |w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
             |t AS (
             |  SELECT count(*) AS n_triangles
             |  FROM e e1 JOIN e e2 ON e1.b = e2.a
             |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
             |)
             |SELECT (SELECT count(*) FROM e) AS n_edges, n_wedges, n_triangles,
             |       round(3.0 * n_triangles / n_wedges, 4) AS clustering_coeff
             |FROM w CROSS JOIN t""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id")).localCheckpoint()
        val n = docs.count()
        val raw = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        val e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .localCheckpoint() // feeds degrees, wedges and the triple join
        val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("d"))
        val wedges = deg.agg(sum(expr("d * (d - 1) div 2")).as("n_wedges"))
        val tri = e.as("e1")
          .join(e.as("e2"), col("e1.b") === col("e2.a"))
          .join(e.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .agg(count(lit(1)).as("n_triangles"))
        val edges = e.agg(count(lit(1)).as("n_edges"))
        edges.crossJoin(wedges).crossJoin(tri) // three 1-row scalars
          .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
            round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4)
              .as("clustering_coeff"))
      }
    )
  )
}
