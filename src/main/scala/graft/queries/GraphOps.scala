package graft.queries

import org.apache.spark.sql.functions._
import graft.Canon._
import graft.sources.Tables
import graft.Materialize.{CutSyntax, Iter, Shared}

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
        val docs = t.documents.select(col("doc_id")) // cheap column-pruned scan: re-reading beats pinning the id column in executor memory
        val n = docs.count()
        val raw = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        val e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .cut(Shared) // feeds degrees, wedges and the triple join
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
    ),
    Q(
      "g3_bfs_hops",
      // Bounded multi-source BFS over the same deterministic link graph:
      // shortest hop distance (<= 3) from the seed set {doc_id < 3} —
      // the crawl-frontier / influence-radius primitive next to g1's
      // PageRank. Each round expands EVERY known node through the edge
      // relation at the round's literal distance and a min-aggregate
      // keeps the first discovery, so the result is pure integer math.
      // 100 TB shape: per round one equi-join shuffle (edges x known, on
      // src — the same key every round, so the edge side's partitioning
      // is reused) + one min hash-aggregate with map-side partials; the
      // frontier relation is bounded by reached nodes, and rounds are a
      // fixed count, not data-dependent.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |e AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks
             |),
             |d0 AS (SELECT doc_id, 0 AS dist FROM documents WHERE doc_id < 3),
             |d1 AS (SELECT doc_id, min(dist) AS dist FROM (
             |         SELECT doc_id, dist FROM d0
             |         UNION ALL
             |         SELECT e.dst, 1 FROM e JOIN d0 ON d0.doc_id = e.src
             |       ) GROUP BY doc_id),
             |d2 AS (SELECT doc_id, min(dist) AS dist FROM (
             |         SELECT doc_id, dist FROM d1
             |         UNION ALL
             |         SELECT e.dst, 2 FROM e JOIN d1 ON d1.doc_id = e.src
             |       ) GROUP BY doc_id),
             |d3 AS (SELECT doc_id, min(dist) AS dist FROM (
             |         SELECT doc_id, dist FROM d2
             |         UNION ALL
             |         SELECT e.dst, 3 FROM e JOIN d2 ON d2.doc_id = e.src
             |       ) GROUP BY doc_id)
             |SELECT doc_id, CAST(dist AS BIGINT) AS dist FROM d3
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id")) // cheap column-pruned scan: re-reading beats pinning the id column in executor memory
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        var dist = docs.filter(col("doc_id") < 3)
          .select(col("doc_id"), lit(0).as("dist"))
        for (r <- 1 to 3) {
          val next = edges.join(dist, col("src") === col("doc_id"))
            .select(col("dst").as("doc_id"), lit(r).as("dist"))
          dist = dist.unionByName(next)
            .groupBy(col("doc_id")).agg(min(col("dist")).as("dist"))
        }
        ordered(dist.select(col("doc_id"), col("dist").cast("long").as("dist")))
      }
    ),
    Q(
      "g5_kcore_peel",
      // Bounded k-core peeling (k=10) — the "dense dup-family core"
      // extractor: three unrolled rounds of remove-degree-<k nodes,
      // then recompute degrees on the induced subgraph. Each round is
      // two semi-joins (keep edges whose BOTH endpoints survive) + one
      // count aggregate — all equi-joins on node ids, pure integers.
      // The base 4-out graph is 8-REGULAR (each per-k successor map is
      // a bijection mod N), so it alone would peel to nothing under
      // k=10 in one round; a planted dense core among doc_id < 50
      // (8 extra intra-core out-edges each) is what survives — and
      // peeling is genuinely iterative, because core nodes whose base
      // edges pointed outside lose them when the bulk dies in round 1.
      // A full k-core runs peels to fixpoint; three rounds are the
      // bounded prefix (the spec proves round-over-round containment).
      // 100 TB shape: the edge relation is filtered in place each
      // round (no rebuild), the survivor set is the broadcast side,
      // and rounds are a fixed count — the standard distributed
      // peeling step of Montresor et al.'s k-core algorithm.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |raw AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks
             |  UNION ALL
             |  SELECT doc_id AS src, (doc_id*7 + j*13 + 3) % 50 AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,8)) AS j) js
             |  WHERE doc_id < 50
             |),
             |e0 AS (
             |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |  FROM raw WHERE src <> dst
             |),
             |d0 AS (SELECT v, count(*) AS d FROM
             |        (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
             |k1 AS (SELECT v FROM d0 WHERE d >= 10),
             |e1 AS (SELECT a, b FROM e0
             |       WHERE a IN (SELECT v FROM k1) AND b IN (SELECT v FROM k1)),
             |d1 AS (SELECT v, count(*) AS d FROM
             |        (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1) GROUP BY v),
             |k2 AS (SELECT v FROM d1 WHERE d >= 10),
             |e2 AS (SELECT a, b FROM e1
             |       WHERE a IN (SELECT v FROM k2) AND b IN (SELECT v FROM k2)),
             |d2 AS (SELECT v, count(*) AS d FROM
             |        (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2) GROUP BY v),
             |k3 AS (SELECT v FROM d2 WHERE d >= 10),
             |e3 AS (SELECT a, b FROM e2
             |       WHERE a IN (SELECT v FROM k3) AND b IN (SELECT v FROM k3)),
             |d3 AS (SELECT v, count(*) AS d FROM
             |        (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3) GROUP BY v)
             |SELECT v AS doc_id, d AS core_deg FROM d3
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id")) // cheap column-pruned scan: re-reading beats pinning the id column in executor memory
        val n = docs.count()
        val raw = docs.select(col("doc_id").as("src"),
            explode(array((0 until 4).map(k =>
              (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
          .unionByName(docs.filter(col("doc_id") < 50)
            .select(col("doc_id").as("src"),
              explode(array((0 until 8).map(j =>
                (col("doc_id") * 7 + j * 13 + 3) % 50): _*)).as("dst")))
        var e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .cut(Iter)
        def degrees(edges: org.apache.spark.sql.DataFrame) =
          edges.select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
            .groupBy(col("v")).agg(count(lit(1)).as("d"))
        for (_ <- 1 to 3) {
          val keep = degrees(e).filter(col("d") >= 10).select(col("v"))
          e = e
            .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
            .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
            .select(col("a"), col("b"))
            .cut(Iter)
        }
        ordered(degrees(e).select(col("v").as("doc_id"), col("d").as("core_deg")))
      }
    ),
    Q(
      "g4_link_predict",
      // Common-neighbor link prediction over the undirected form of the
      // link graph — the "likely same dup family" heuristic run before
      // committing an expensive pairwise verify: for every NON-adjacent
      // pair sharing >= 2 neighbors, the common-neighbor count and the
      // neighborhood Jaccard cn/(d_a + d_b - cn), a ratio of exact
      // BIGINTs rounded once. 100 TB shape: the candidate relation is
      // the wedge join adj x adj on the shared center (bounded by
      // sum(d^2), with the same degree-capping valve the dedup joins
      // use), existing edges leave via a left-anti join on the edge key,
      // and degrees ride the node relation onto the candidate pairs.
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
             |adj AS (SELECT a AS v, b AS w FROM e UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
             |cand AS (
             |  SELECT x.w AS a, y.w AS b, count(*) AS cn
             |  FROM adj x JOIN adj y ON x.v = y.v AND x.w < y.w
             |  GROUP BY 1, 2
             |),
             |nonedge AS (
             |  SELECT c.a, c.b, c.cn FROM cand c
             |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = c.a AND e.b = c.b)
             |)
             |SELECT ne.a, ne.b, ne.cn,
             |       round(ne.cn * 1.0 / (da.d + db.d - ne.cn), 4) AS nbr_jaccard
             |FROM nonedge ne
             |JOIN deg da ON da.v = ne.a
             |JOIN deg db ON db.v = ne.b
             |WHERE ne.cn >= 2
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id")) // cheap column-pruned scan: re-reading beats pinning the id column in executor memory
        val n = docs.count()
        val raw = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        val e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .cut(Shared) // feeds adjacency (twice), degrees and the anti-join
        val adj = e.select(col("a").as("v"), col("b").as("w"))
          .unionAll(e.select(col("b").as("v"), col("a").as("w")))
        val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("d"))
        val cand = adj.as("x")
          .join(adj.as("y"), col("x.v") === col("y.v") && col("x.w") < col("y.w"))
          .groupBy(col("x.w").as("a"), col("y.w").as("b"))
          .agg(count(lit(1)).as("cn"))
        val nonedge = cand.join(e, Seq("a", "b"), "left_anti")
        ordered(
          nonedge.filter(col("cn") >= 2)
            .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
            .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
            .select(col("a"), col("b"), col("cn"),
              round(col("cn") * lit(1.0) / (col("da") + col("db") - col("cn")), 4)
                .as("nbr_jaccard")))
      }
    ),
    Q(
      "g6_label_prop",
      // LABEL-PROPAGATION community detection — the near-linear-time
      // community algorithm (Raghavan et al. 2007), made hash-exact by
      // running SYNCHRONOUS rounds with a total-order vote: each node
      // adopts the neighbor label with the highest count, ties broken by
      // the SMALLEST label. Three fixed rounds over the symmetrized
      // deterministic link graph (the g1 generator), labels seeded with
      // doc_id. Integer votes + deterministic tiebreak mean both engines
      // converge identically — no float, no RNG, no async order. 100 TB
      // shape: per round ONE edges-join-labels shuffle on src (the same
      // co-partitionable key every round) + one (node, label) count
      // aggregate with map-side partials; the vote winner is a hash
      // aggregate over max(struct(count, -label)), never a corpus-wide
      // window sort. Fixed round count, not data-dependent.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |e0 AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks
             |),
             |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
             |l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents),
             |c1 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
             |       FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
             |l1 AS (SELECT node, lbl FROM
             |        (SELECT node, lbl, row_number() OVER (PARTITION BY node
             |                 ORDER BY c DESC, lbl ASC) AS rn FROM c1)
             |       WHERE rn = 1),
             |c2 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
             |       FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
             |l2 AS (SELECT node, lbl FROM
             |        (SELECT node, lbl, row_number() OVER (PARTITION BY node
             |                 ORDER BY c DESC, lbl ASC) AS rn FROM c2)
             |       WHERE rn = 1),
             |c3 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
             |       FROM e JOIN l2 l ON l.node = e.src GROUP BY 1, 2),
             |l3 AS (SELECT node, lbl FROM
             |        (SELECT node, lbl, row_number() OVER (PARTITION BY node
             |                 ORDER BY c DESC, lbl ASC) AS rn FROM c3)
             |       WHERE rn = 1)
             |SELECT node AS doc_id, lbl AS community FROM l3
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id"))
        val n = docs.count()
        val e0 = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        val edges = e0.unionByName(
            e0.select(col("dst").as("src"), col("src").as("dst")))
          .cut(Shared) // feeds all 3 rounds; lineage cut like CC
        var labels = docs.select(col("doc_id").as("node"), col("doc_id").as("lbl"))
        for (_ <- 1 to 3) {
          // vote winner as a hash aggregate: max over (count, -label)
          // picks highest count then SMALLEST label — no per-node window
          labels = edges.join(labels, edges("src") === labels("node"))
            .groupBy(edges("dst").as("node"), col("lbl"))
            .agg(count(lit(1)).as("c"))
            .groupBy(col("node"))
            .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("win"))
            .select(col("node"), (-col("win.neg")).as("lbl"))
        }
        ordered(labels.select(col("node").as("doc_id"), col("lbl").as("community")))
      }
    ),
    Q(
      "g7_modularity",
      // MODULARITY SCORING of the g6 label-propagation communities — the
      // quality metric every community pipeline reports (Newman-Girvan Q):
      // Q = Σ_c [in_c/2m − (d_c/2m)²] over the symmetrized directed edge
      // list (2m = 8n rows by construction). Kept EXACT by cross-
      // multiplication: q_scaled = in_c·2m − d_c² is pure BIGINT — the
      // single rounded double division happens once per output row,
      // identically in both engines. 100 TB shape: the 3 LPA rounds (one
      // co-partitioned edges⋈labels shuffle each), then TWO hash
      // aggregates over the labeled edge list (internal-edge count and
      // out-degree sum, both keyed by the src community) and one over the
      // label relation; output rides the community count.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |e0 AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks
             |),
             |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
             |l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents),
             |c1 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
             |       FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
             |l1 AS (SELECT node, lbl FROM
             |        (SELECT node, lbl, row_number() OVER (PARTITION BY node
             |                 ORDER BY c DESC, lbl ASC) AS rn FROM c1)
             |       WHERE rn = 1),
             |c2 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
             |       FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
             |l2 AS (SELECT node, lbl FROM
             |        (SELECT node, lbl, row_number() OVER (PARTITION BY node
             |                 ORDER BY c DESC, lbl ASC) AS rn FROM c2)
             |       WHERE rn = 1),
             |c3 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
             |       FROM e JOIN l2 l ON l.node = e.src GROUP BY 1, 2),
             |l3 AS (SELECT node, lbl FROM
             |        (SELECT node, lbl, row_number() OVER (PARTITION BY node
             |                 ORDER BY c DESC, lbl ASC) AS rn FROM c3)
             |       WHERE rn = 1),
             |m AS (SELECT count(*) AS two_m FROM e),
             |wc AS (SELECT ls.lbl AS cs, ld.lbl AS cd
             |       FROM e JOIN l3 ls ON ls.node = e.src
             |              JOIN l3 ld ON ld.node = e.dst),
             |inc AS (SELECT cs AS community, count(*) AS in_edges
             |        FROM wc WHERE cs = cd GROUP BY 1),
             |deg AS (SELECT cs AS community, count(*) AS deg_sum
             |        FROM wc GROUP BY 1),
             |sz AS (SELECT lbl AS community, count(*) AS n_nodes
             |       FROM l3 GROUP BY 1)
             |SELECT sz.community, CAST(n_nodes AS BIGINT) AS n_nodes,
             |       CAST(coalesce(in_edges, 0) AS BIGINT) AS in_edges,
             |       CAST(deg_sum AS BIGINT) AS deg_sum,
             |       CAST(coalesce(in_edges, 0) * two_m - deg_sum * deg_sum
             |            AS BIGINT) AS q_scaled,
             |       round(CAST(coalesce(in_edges, 0) * two_m - deg_sum * deg_sum
             |                  AS DOUBLE) / (two_m * two_m), 8) AS q_contrib
             |FROM sz LEFT JOIN inc USING (community)
             |        JOIN deg USING (community) CROSS JOIN m
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id"))
        val n = docs.count()
        val e0 = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        val edges = e0.unionByName(
            e0.select(col("dst").as("src"), col("src").as("dst")))
          .cut(Shared) // feeds 3 LPA rounds + the 2 scoring passes
        var labels = docs.select(col("doc_id").as("node"), col("doc_id").as("lbl"))
        for (_ <- 1 to 3) {
          labels = edges.join(labels, edges("src") === labels("node"))
            .groupBy(edges("dst").as("node"), col("lbl"))
            .agg(count(lit(1)).as("c"))
            .groupBy(col("node"))
            .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("win"))
            .select(col("node"), (-col("win.neg")).as("lbl"))
        }
        val lab = labels.cut(Iter) // consumed by 3 scoring passes
        val twoM = lit(8L * n) // symmetrized list is exactly 8n rows
        val wc = edges
          .join(lab.select(col("node").as("sn"), col("lbl").as("cs")),
            col("src") === col("sn"))
          .join(lab.select(col("node").as("dn"), col("lbl").as("cd")),
            col("dst") === col("dn"))
          .select(col("cs"), col("cd"))
        val inc = wc.filter(col("cs") === col("cd"))
          .groupBy(col("cs").as("community")).agg(count(lit(1)).as("in_edges"))
        val deg = wc.groupBy(col("cs").as("community"))
          .agg(count(lit(1)).as("deg_sum"))
        val sz = lab.groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("n_nodes"))
        val qs = (coalesce(col("in_edges"), lit(0L)) * twoM -
          col("deg_sum") * col("deg_sum"))
        ordered(
          sz.join(inc, Seq("community"), "left")
            .join(deg, Seq("community"))
            .select(col("community"), col("n_nodes"),
              coalesce(col("in_edges"), lit(0L)).as("in_edges"),
              col("deg_sum"),
              qs.cast("long").as("q_scaled"),
              round(qs.cast("double") / (twoM * twoM), 8).as("q_contrib")))
      }
    ),
    Q(
      "g8_hits",
      // HITS HUB/AUTHORITY SCORES (Kleinberg) over the same
      // deterministic link graph as g1 — the link-topic dual of
      // PageRank: authorities are pointed to by good hubs, hubs point
      // to good authorities. Two full mutual-reinforcement rounds,
      // UNNORMALIZED so every score stays an exact BIGINT (h0 = 1;
      // a1 = in-degree; h1 = Σ_out a1; a2 = Σ_in h1; h2 = Σ_out a2) —
      // normalization is a per-query scalar divide the consumer can do,
      // and skipping it keeps the hash check exact with zero float ops.
      // Out-degree is 4 by construction, so scores grow ~16× per round:
      // bounded, overflow-free. 100 TB shape: same as PageRank —
      // alternating edges⋈scores equi-join + hash aggregate rounds, the
      // join key flipping between src and dst (each round one shuffle
      // with map-side partials); the driver holds only the scalar N.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |e AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,4)) AS k) ks
             |),
             |a1 AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY 1),
             |h1 AS (SELECT e.src AS v, CAST(sum(a1.a) AS BIGINT) AS h
             |       FROM e JOIN a1 ON a1.v = e.dst GROUP BY 1),
             |a2 AS (SELECT e.dst AS v, CAST(sum(h1.h) AS BIGINT) AS a
             |       FROM e JOIN h1 ON h1.v = e.src GROUP BY 1),
             |h2 AS (SELECT e.src AS v, CAST(sum(a2.a) AS BIGINT) AS h
             |       FROM e JOIN a2 ON a2.v = e.dst GROUP BY 1)
             |SELECT d.doc_id, coalesce(a2.a, 0) AS authority,
             |       coalesce(h2.h, 0) AS hub
             |FROM documents d
             |LEFT JOIN a2 ON a2.v = d.doc_id
             |LEFT JOIN h2 ON h2.v = d.doc_id
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id"))
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        val a1 = edges.groupBy(col("dst").as("v")).agg(count(lit(1)).as("a"))
        val h1 = edges.join(a1, col("dst") === col("v"))
          .groupBy(col("src").as("u")).agg(sum(col("a")).as("h"))
        val a2 = edges.join(h1, col("src") === col("u"))
          .groupBy(col("dst").as("v2")).agg(sum(col("h")).as("a2"))
        val h2 = edges.join(a2, col("dst") === col("v2"))
          .groupBy(col("src").as("u2")).agg(sum(col("a2")).as("h2"))
        ordered(
          docs.join(a2, col("doc_id") === col("v2"), "left")
            .join(h2, col("doc_id") === col("u2"), "left")
            .select(col("doc_id"),
              coalesce(col("a2"), lit(0L)).as("authority"),
              coalesce(col("h2"), lit(0L)).as("hub")))
      }
    ),
    Q(
      "g9_assortativity",
      // DEGREE ASSORTATIVITY (Newman's r) over the g2 canonical
      // undirected edge set — do high-degree nodes link to high-degree
      // nodes? The one-number mixing diagnostic run before sampling by
      // degree (crawl graphs are disassortative; template farms are
      // assortative). Exact WITHOUT any sqrt: symmetrizing each edge to
      // (x,y) and (y,x) makes the two variance legs identical, so
      // r = (nΣxy − (Σx)²)/(nΣx² − (Σx)²) is a ratio of exact BIGINTs
      // with one rounded division. The g1 graph is near-regular (degree
      // variance 0 ⇒ r undefined), so this query uses a degree-skewed
      // variant: out-degree 1 + doc_id % 7 — same hash-mix rule, now
      // with real degree spread. 100 TB shape: degrees are one hash
      // aggregate over edge endpoints; two equi-joins plant d(a), d(b)
      // on the edge relation; the global sums are a map-side-combined
      // 1-row fold. Nothing ever leaves the edge relation's size.
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
             |raw AS (
             |  SELECT doc_id AS src,
             |         (doc_id*31 + k*17 + 7) % (SELECT n FROM nn) AS dst
             |  FROM documents CROSS JOIN (SELECT unnest(range(0,7)) AS k) ks
             |  WHERE k < 1 + doc_id % 7
             |),
             |e AS (
             |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |  FROM raw WHERE src <> dst
             |),
             |deg AS (
             |  SELECT v, CAST(count(*) AS BIGINT) AS d
             |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
             |),
             |p AS (
             |  SELECT da.d AS x, db.d AS y FROM e
             |  JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
             |),
             |s AS (
             |  SELECT CAST(2*count(*) AS BIGINT) AS n,
             |         CAST(sum(x + y) AS BIGINT) AS sx,
             |         CAST(sum(2*x*y) AS BIGINT) AS sxy,
             |         CAST(sum(x*x + y*y) AS BIGINT) AS sxx
             |  FROM p
             |)
             |SELECT n AS n_endpoints,
             |       CASE WHEN n*sxx - sx*sx > 0
             |            THEN round((n*sxy - sx*sx) * 1.0 / (n*sxx - sx*sx), 6)
             |       END AS assortativity
             |FROM s ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id"))
        val n = docs.count()
        val raw = docs.select(col("doc_id").as("src"),
          posexplode(array((0 until 7).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as(Seq("k", "dst")))
          .filter(col("k") < lit(1) + col("src") % 7)
        val e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val deg = e.select(col("a").as("v"))
          .union(e.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("d"))
        val p = e
          .join(deg.select(col("v").as("va"), col("d").as("x")),
            col("a") === col("va"))
          .join(deg.select(col("v").as("vb"), col("d").as("y")),
            col("b") === col("vb"))
        val s = p.agg((lit(2) * count(lit(1))).as("n"),
          sum(col("x") + col("y")).as("sx"),
          sum(lit(2) * col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x") + col("y") * col("y")).as("sxx"))
        ordered(
          s.select(col("n").as("n_endpoints"),
            when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
              round((col("n") * col("sxy") - col("sx") * col("sx")) * 1.0 /
                (col("n") * col("sxx") - col("sx") * col("sx")), 6))
              .as("assortativity")))
      }
    ),
    Q(
      "g10_local_clustering",
      // PER-NODE LOCAL CLUSTERING COEFFICIENT — g2's global coefficient
      // says the graph is clustered; the per-node version says WHICH
      // nodes sit inside dense pockets (the link-spam / template-farm
      // feature next to g9's mixing diagnostic): lcc(v) = 2·T(v) /
      // (d(v)·(d(v)−1)). Triangles come from the same oriented a<b<c
      // triple join as g2 — each found once, then exploded to its three
      // corners and counted per vertex; the coefficient is one rounded
      // division of exact BIGINTs. 100 TB shape: the g2 edge-iterator
      // joins, then one Generate (3 rows per triangle) + a vertex-keyed
      // hash aggregate with map-side partials; degrees left-join the
      // triangle counts so triangle-free nodes report exact 0.
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
             |  SELECT v, CAST(count(*) AS BIGINT) AS d
             |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
             |),
             |tr AS (
             |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e e1 JOIN e e2 ON e1.b = e2.a
             |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
             |),
             |tv AS (
             |  SELECT v, CAST(count(*) AS BIGINT) AS t
             |  FROM (SELECT unnest([x, y, z]) AS v FROM tr) GROUP BY 1
             |)
             |SELECT deg.v AS doc_id, deg.d AS degree,
             |       coalesce(tv.t, 0) AS n_triangles,
             |       CASE WHEN deg.d >= 2
             |            THEN round(2.0 * coalesce(tv.t, 0) /
             |                       (deg.d * (deg.d - 1)), 6) END AS lcc
             |FROM deg LEFT JOIN tv ON tv.v = deg.v
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val docs = t.documents.select(col("doc_id"))
        val n = docs.count()
        val raw = docs.select(col("doc_id").as("src"),
          explode(array((0 until 4).map(k =>
            (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
        val e = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .cut(Shared) // feeds degrees and the triple join
        val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("d"))
        val tr = e.as("e1")
          .join(e.as("e2"), col("e1.b") === col("e2.a"))
          .join(e.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        val tv = tr.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("t"))
        ordered(
          deg.join(tv.withColumnRenamed("v", "tvv"),
              col("v") === col("tvv"), "left")
            .select(col("v").as("doc_id"), col("d").as("degree"),
              coalesce(col("t"), lit(0L)).as("n_triangles"),
              when(col("d") >= 2,
                round(lit(2.0) * coalesce(col("t"), lit(0L)) /
                  (col("d") * (col("d") - 1)), 6)).as("lcc")))
      }
    )
  )
}
