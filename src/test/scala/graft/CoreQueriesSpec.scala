package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Shared session for all suites: building one SparkSession per suite class
  * would pay JVM+context startup repeatedly. */
object SharedSpark {
  lazy val spark = Graft.session(master = "local[4]", shufflePartitions = 4,
    appName = "graft-test")
  val sf = "/root/testdata/sf0.001"
}

class CoreQueriesSpec extends AnyFunSuite {
  import SharedSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs non-empty at sf0.001") {
    val empties = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = run(name).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty)
  }

  test("t14: every cohort's offset-0 cell retains 100% of the cohort") {
    // a user's first event defines the cohort, so week_offset 0 must
    // contain every cohort member — retention exactly 100
    val rows = run("t14_cohort_retention")
      .filter(col("week_offset") === 0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention_pct") == 100.0)
    }
  }

  test("d8_incremental_agg: totals match a direct aggregate of the t2 snapshot") {
    // the oracle proves base+delta == recompute cell by cell; this law
    // pins the global invariant inside the engine too: group totals sum
    // to the t2 snapshot's doc count (49 files survive the fences)
    val out = run("d8_incremental_agg").collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 49L)
    assert(out.forall(_.getAs[Long]("total_chars") > 0L))
  }

  test("d7_zipf_fit: slope is negative and finite on real corpus data") {
    val r = run("d7_zipf_fit").collect().head
    val slope = r.getAs[Double]("slope")
    assert(!slope.isNaN && !slope.isInfinite)
    assert(slope < 0.0, s"rank-frequency slope must fall, got $slope")
    assert(r.getAs[Long]("n_terms") > 1L)
  }

  test("w7: rolling median is bracketed by its frame and robust to one spike") {
    val rows = run("w7_rolling_median").collect()
    // median of any frame containing the row lies within the series'
    // global min/max per type — cheap bracketing sanity
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val ns = rs.map(_.getAs[Long]("n").toDouble)
      rs.foreach { r =>
        val m = r.getAs[Double]("roll_median")
        assert(m >= ns.min && m <= ns.max)
      }
    }
  }

  test("a6_cms_estimate: the sketch's one-sided error law holds on every row") {
    // count-min can only ever OVER-estimate (a bucket sums its term's
    // true count plus colliders) — estimate < truth means a broken hash
    val rows = run("a6_cms_estimate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"),
        s"CMS under-estimated ${r.getAs[String]("term")}")
    }
  }

  test("g3_bfs_hops: seeds at 0, all distances within the round bound") {
    val rows = run("g3_bfs_hops").collect()
    val dist = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dist")).toMap
    assert(Seq(0L, 1L, 2L).forall(dist.get(_).contains(0L)))
    assert(dist.values.forall(d => d >= 0L && d <= 3L))
    // every direct successor of a seed must sit at distance <= 1
    val n = 500L
    for (s <- 0L to 2L; k <- 0 until 4) {
      val succ = (s * 31 + k * 17 + 7) % n
      assert(dist(succ) <= 1L, s"seed successor $succ at ${dist(succ)}")
    }
  }

  test("g4_link_predict: candidates are strict non-edges with >= 2 witnesses") {
    val n = 500L
    val edges = (0L until n).flatMap(v => (0 until 4).map(k =>
      (v * 31 + k * 17 + 7) % n).filter(_ != v).map(w =>
      (math.min(v, w), math.max(v, w)))).toSet
    val rows = run("g4_link_predict").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(!edges.contains((a, b)), s"($a,$b) is already an edge")
      assert(r.getAs[Long]("cn") >= 2L)
    }
  }

  test("d3_hybrid_rrf: fusion scores reconcile with the leg ranks") {
    val rows = run("d3_hybrid_rrf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank"))
      val vec = Option(r.getAs[java.lang.Long]("vec_rank"))
      assert(lex.isDefined || vec.isDefined, "doc in neither leg")
      val expect = lex.map(l => 1.0 / (60 + l)).getOrElse(0.0) +
        vec.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
  }

  test("d5_containment is directional: halves embed in originals, never the reverse") {
    val rows = run("d5_containment").collect()
    val pairs = rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // a healthy share of the planted half-docs must be caught...
    val caught = pairs.count { case (a, b) => a >= 20000L && b == a - 20000L }
    assert(caught > 100, s"only $caught half-doc plants detected")
    // ...and no original is ever 'contained' in its own half — the
    // asymmetry Jaccard cannot express
    assert(!pairs.exists { case (a, b) => b == a + 20000L },
      "an original doc scored as contained in its half")
  }

  test("t15_cumulative_users: monotone, and the plateau equals total distinct users") {
    val rows = run("t15_cumulative_users").orderBy(col("day")).collect()
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (x, y) => x <= y })
    val total = Tables(spark, sf).events.select(col("user_id")).distinct().count()
    assert(cums.last == total)
    assert(cums.sameElements(rows.map(_.getAs[Long]("new_users")).scanLeft(0L)(_ + _).tail))
  }

  test("d2_bpe_merges: counts non-increasing, round-1 winner re-derived exactly") {
    val rows = run("d2_bpe_merges").orderBy(col("round")).collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getAs[Long]("pair_count"))
    // merging can only redistribute mass downward: each round's best
    // pair is bounded by the previous round's
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // independent driver-side recompute of the round-1 argmax
    val words = Tables(spark, sf).documents
      .select(explode(graft.functions.Text.tokenize(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((w, c) <- words; i <- 0 until w.length - 1) {
      val k = (w(i).toString, w(i + 1).toString)
      pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
    }
    val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a + "" + b) }
    assert((rows(0).getAs[String]("left_sym"), rows(0).getAs[String]("right_sym")) == best._1)
    assert(rows(0).getAs[Long]("pair_count") == best._2)
  }

  test("j8_asof_nearest: backward choices agree with the backward-only as-of join") {
    val near = run("j8_asof_nearest")
      .filter(col("direction") === "b")
      .select(col("user_id"), col("ts_s"), col("nearest_error_id"))
    val back = run("j8_asof")
      .select(col("user_id"), col("ts_s"), col("last_error_id"))
    // whenever 'nearest' picks the backward side, it must be exactly the
    // match j8 computes — the two queries share one semantics there
    val disagree = near.join(back, Seq("user_id", "ts_s"))
      .filter(col("nearest_error_id") =!= col("last_error_id"))
    assert(disagree.count() == 0)
    assert(near.count() > 0)
    // and 'f' rows exist only where a forward error is strictly closer
    assert(run("j8_asof_nearest").filter(col("direction") === "f").count() > 0)
  }

  test("d6_diverse_topk: no cluster holds more than 2 of any result page") {
    val rows = run("d6_diverse_topk").collect()
    assert(rows.nonEmpty)
    val perQc = rows.groupBy(r => (r.getAs[Long]("q_id"), r.getAs[Int]("cluster")))
    assert(perQc.values.forall(_.length <= 2))
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.values.forall(_.length == 10))
  }

  test("t11_mad_robust: every flagged row re-verifies against driver-side median/MAD") {
    def medianOf(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val vals = Tables(spark, sf).events
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .groupBy(_.getAs[String]("event_type"))
    val flagged = run("t11_mad_robust").collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      val xs = vals(r.getAs[String]("event_type")).map(_.getAs[Double]("value")).toSeq
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      val z = (r.getAs[Double]("value") - med) / (1.4826 * mad)
      assert(math.abs(z) > 3.5)
      assert(math.abs(r.getAs[Double]("robust_z") - z) < 1e-3)
    }
  }

  test("g5_kcore_peel: the regular bulk dies, only the planted dense core survives") {
    val rows = run("g5_kcore_peel").collect()
    // the base graph is 8-regular — under k=10 it cannot survive; the
    // planted intra-core edges are confined to doc_id < 50
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") < 50L))
  }

  test("d3_prf_expand: expansion never lowers a doc's score vs the base query") {
    val base = run("d3_search_bm25").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val exp = run("d3_prf_expand").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25x")).toMap
    assert(exp.nonEmpty)
    // BM25 terms contribute non-negatively, so adding query terms can
    // only add score — any doc present in both rankings must not drop
    val both = base.keySet intersect exp.keySet
    assert(both.nonEmpty)
    both.foreach { d => assert(exp(d) >= base(d) - 1e-9) }
  }

  test("the SQL entry path: temp views + spark.sql + extension functions") {
    // users of the library can work entirely in SQL: register the corpus
    // as views, query with spark.sql, and call the engine's native
    // functions (GraftExtensions) from SQL
    val t = Tables(spark, sf)
    t.orders.createOrReplaceTempView("orders_v")
    t.embeddings.createOrReplaceTempView("emb_v")
    val agg = spark.sql(
      """SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total
        |FROM orders_v GROUP BY o_orderstatus""".stripMargin)
    assert(agg.count() == 3)
    val knn = spark.sql(
      """SELECT a.vec_id, b.vec_id AS other,
        |       vec_cosine_f32(a.embedding, b.embedding) AS cos
        |FROM emb_v a JOIN emb_v b ON a.vec_id = 0 AND b.vec_id BETWEEN 1 AND 5
        |ORDER BY cos DESC""".stripMargin)
    assert(knn.count() == 5)
    assert(!knn.head().isNullAt(2))
  }

  test("W1 latest-per-key agrees with A1 groupBy-max (top-1 window ≡ max)") {
    val t = Tables(spark, sf)
    val w1 = run("w1_latest_per_key").select("o_custkey", "o_orderkey")
    val a1 = t.orders.groupBy(col("o_custkey"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("m.o_orderkey").as("o_orderkey"))
    assert(w1.except(a1).isEmpty && a1.except(w1).isEmpty)
  }

  test("P3 regex filter is a subset of S1-style full scan") {
    val t = Tables(spark, sf)
    val all = t.customer.select("c_custkey")
    val filtered = t.customer.filter(col("c_name").rlike("1$")).select("c_custkey")
    assert(filtered.except(all).isEmpty)
  }

  test("U1/U3: (a except b) union (a intersect b) == distinct a when b ⊆ a") {
    val t = Tables(spark, sf)
    val a = t.orders.select(col("o_custkey").as("k"))
    val b = t.customer.filter(col("c_custkey") < 100).select(col("c_custkey").as("k"))
      .intersect(a.distinct())
    val rebuilt = a.except(b).union(a.distinct().intersect(b)).distinct()
    assert(rebuilt.except(a.distinct()).isEmpty && a.distinct().except(rebuilt).isEmpty)
  }

  test("A5 distinct is idempotent") {
    val t = Tables(spark, sf)
    val d1 = t.orders.select("o_orderstatus").distinct()
    assert(d1.distinct().count() == d1.count())
  }

  test("J4 semi + J5 anti partition the left side") {
    val t = Tables(spark, sf)
    val big = t.orders.filter(col("o_totalprice") > 350000.0)
    val semi = t.customer.join(big, t.customer("c_custkey") === big("o_custkey"), "left_semi")
    val anti = t.customer.join(big, t.customer("c_custkey") === big("o_custkey"), "left_anti")
    assert(semi.count() + anti.count() == t.customer.count())
  }

  test("d4_keep_best_per_cluster: one keeper per cluster, clusters cover the corpus") {
    val rows = run("d4_keep_best_per_cluster").collect()
    // exactly one kept row per cluster id
    assert(rows.map(_.getAs[Long]("cluster_id")).distinct.length == rows.length)
    // every doc belongs to a cluster: sizes sum to the corpus count
    val corpus = Tables(spark, sf).documents.count()
    assert(rows.map(_.getAs[Long]("cluster_size")).sum == corpus)
    // the keeper is never a quality-dominated member: no cluster reports a
    // singleton with quality below the floor rounding range
    rows.foreach(r => assert(r.getAs[Double]("quality") >= 0.0
      && r.getAs[Double]("quality") <= 1.0))
  }

  test("d11_cluster_split: audit column proves no dup family straddles a split") {
    val rows = run("d11_cluster_split").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("max_splits_per_cluster") == 1L))
    // split proportions are hash-uniform-ish: train strictly largest
    val bySplit = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("d11_epoch_shuffle is a permutation: every doc once, positions dense per shard") {
    val rows = run("d11_epoch_shuffle").collect()
    val corpus = Tables(spark, sf).documents.count()
    assert(rows.length == corpus)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      val pos = rs.map(_.getAs[Long]("pos")).sorted
      assert(pos.head == 1L && pos.last == pos.length.toLong,
        "within-shard positions must be dense 1..n")
    }
  }

  test("d2_bpe_encode: merges only ever shrink a word's symbol count") {
    val rows = run("d2_bpe_encode").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = r.getAs[Long]("n_words")
      val syms = r.getAs[Long]("n_symbols")
      // at least 1 symbol per word, and 3 merge rounds can never push the
      // average above the raw character count (merges only concatenate)
      assert(syms >= words)
      assert(r.getAs[Double]("avg_word_syms") >= 1.0)
    }
  }

  test("d5_sorted_neighborhood: every planted tail-mutant pair is recovered") {
    // the query unions a ' snmtail'-suffixed copy of every doc; the copy
    // differs only in its final token, so it sorts NEXT TO its original
    // (Jaccard = n/(n+1) >= 0.5) unless prefix-sharing docs crowd the
    // window — the inherent SNM loss mode. Recall must stay high (the
    // hash-match against DuckDB separately proves both engines lose the
    // IDENTICAL pairs), but 100% is not the method's contract.
    val rows = run("d5_sorted_neighborhood").collect()
    val planted = rows.count(r =>
      r.getAs[Long]("b") - r.getAs[Long]("a") == 10000L)
    val corpus = Tables(spark, sf).documents.count()
    assert(planted >= corpus * 9 / 10,
      s"SNM recovered $planted of $corpus planted near-dup pairs")
    rows.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }

  test("t17_ks_drift: statistic in [0,1] and halves cover every event") {
    val r = run("t17_ks_drift").collect().head
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    val total = Tables(spark, sf).events.count()
    assert(r.getAs[Long]("n_first") + r.getAs[Long]("n_second") == total)
  }

  test("s14_compaction_plan: groups are contiguous and conserve every byte") {
    val rows = run("s14_compaction_plan").collect()
    val t = Tables(spark, sf)
    val totals = t.documents.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("bytes")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("bytes")).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      // conservation: the plan accounts for every byte of the partition
      assert(rs.map(_.getAs[Long]("grp_bytes")).sum == totals(src))
      // contiguity: group doc-id ranges never overlap in grp order
      val ordered = rs.sortBy(_.getAs[Long]("grp"))
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      }
    }
  }

  test("t18_trending: ranks dense per day, cold-start lift is (n+1)") {
    val rows = run("t18_trending").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("day_idx")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rn")).sorted
      assert(ranks.head == 1 && ranks.last == ranks.length && ranks.length <= 3)
    }
    rows.filter(_.getAs[Long]("prev_n") == 0L).foreach { r =>
      assert(r.getAs[Double]("lift") == (r.getAs[Long]("n") + 1).toDouble)
    }
  }

  test("d6_hard_negatives: negatives never share the anchor's label") {
    val rows = run("d6_hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("q_label") != r.getAs[Int]("neg_label"))
      val cos = r.getAs[Double]("cos")
      assert(cos >= -1.0001 && cos <= 1.0001)
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rn")).sorted
      assert(ranks.head == 1 && ranks.last == ranks.length)
    }
  }

  test("d2_oov_rate: rates bounded and the corpus tail is what overflows the vocab") {
    val rows = run("d2_oov_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val oov = r.getAs[Long]("n_oov")
      assert(oov >= 0 && oov <= n)
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("d3_search_ql: log-likelihoods negative, top page full, smoothing total-orders") {
    val rows = run("d3_search_ql").collect()
    assert(rows.length == 20, "Dirichlet smoothing scores every doc; top-20 must fill")
    rows.foreach(r => assert(r.getAs[Double]("ql") < 0.0))
  }

  test("d7_readability: sentence floor holds and the score is bounded above") {
    val rows = run("d7_readability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("words") > 0 && r.getAs[Long]("sentences") >= 1)
      // 206.835 is the formula's intercept — no text can exceed it
      assert(r.getAs[Double]("flesch") <= 206.835)
    }
  }

  test("d5_incremental_lsh: pairs only cross new->index, planted recall high") {
    val rows = run("d5_incremental_lsh").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("new_id") >= 10000L, "left side must be the batch")
      assert(r.getAs[Long]("index_id") < 10000L, "right side must be the index")
    }
    val planted = rows.count(r =>
      r.getAs[Long]("new_id") - 10000L == r.getAs[Long]("index_id"))
    val expected = Tables(spark, sf).documents
      .filter(col("doc_id") % 10 === 0).count()
    // 8-hash estimates are noisy; the v2 tail edit barely moves Jaccard,
    // so banding should recover nearly every planted re-crawl pair
    assert(planted >= expected * 8 / 10,
      s"incremental LSH recovered $planted of $expected planted pairs")
  }

  test("a9_weighted_median: matches a driver-side exact weighted median") {
    val rows = run("a9_weighted_median").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("w_median_qty"))
      .toMap
    val li = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
    li.groupBy(_.getString(0)).foreach { case (flag, rs) =>
      // brute-force reference: sort by qty, walk cumulative exact-cent
      // weights to the first qty reaching half the total
      val byQty = rs.map(r => (r.getDouble(1), math.round(r.getDouble(2) * 100)))
        .sortBy(_._1)
      val total = byQty.map(_._2).sum
      var cum = 0L
      val ref = byQty.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      assert(rows(flag) == ref, s"flag $flag: got ${rows(flag)}, want $ref")
    }
  }

  test("j16_band_join: every pair inside the band, no self-pairs") {
    val rows = run("j16_band_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("probe_id") != r.getAs[Long]("match_id"))
      assert(r.getAs[Double]("dv") <= 0.05)
    }
  }

  test("g6_label_prop: total assignment, labels are node ids, communities merge") {
    val rows = run("g6_label_prop").collect()
    val corpus = Tables(spark, sf).documents.count()
    assert(rows.length == corpus, "every node must get exactly one label")
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
    val valid = ids.toSet
    rows.foreach(r => assert(valid(r.getAs[Long]("community")),
      "a community label must be a real node id"))
    // on a connected 4-out random-ish graph, 3 rounds of propagation must
    // actually merge labels — strictly fewer communities than nodes
    assert(rows.map(_.getAs[Long]("community")).distinct.length < corpus)
  }

  test("w11_streak: streak bounded by active days, active days match a recount") {
    val rows = run("w11_streak").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") >= 1L)
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("n_active_days"))
    }
    val recount = Tables(spark, sf).events
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct().groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("n_active_days") == recount(r.getAs[Long]("user_id"))))
  }

  test("d8_retention_gc: manifest is history minus the two kept versions") {
    val rows = run("d8_retention_gc").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("filename")).foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("n_versions")
      assert(rs.length == n - 2, "expire everything but the last 2")
      val latest = rs.head.getAs[Int]("latest")
      rs.foreach(r => assert(r.getAs[Int]("version") < latest,
        "the surviving latest version must never be in the deletion manifest"))
    }
  }

  test("d9_pipeline_incremental: each planted slice lands in its branch") {
    val rows = run("d9_pipeline_incremental").collect()
    assert(rows.nonEmpty)
    val bySlice = rows.groupBy(r => r.getAs[Long]("doc_id") / 10000L)
    // verbatim re-uploads: every one an exact dup, with no near-dup probe
    bySlice(3L).foreach { r =>
      assert(r.getAs[String]("status") == "dup_exact")
      assert(r.isNullAt(r.fieldIndex("best_match")),
        "exact dups short-circuit before the LSH stage")
    }
    // tail-edited re-crawls: overwhelmingly near-dups of their source
    val recrawl = bySlice(1L)
    val matched = recrawl.count(r => r.getAs[String]("status") == "near_dup" &&
      !r.isNullAt(r.fieldIndex("best_match")) &&
      r.getAs[Long]("best_match") == r.getAs[Long]("doc_id") - 10000L)
    assert(matched >= recrawl.length * 8 / 10,
      s"only $matched/${recrawl.length} re-crawls matched their source")
    // token-reversed docs: shingles destroyed, overwhelmingly admitted
    val reversed = bySlice(2L)
    val admitted = reversed.count(_.getAs[String]("status") == "admitted")
    assert(admitted >= reversed.length * 9 / 10,
      s"only $admitted/${reversed.length} reversed docs were admitted")
  }

  test("t19_funnel_windowed: deadlines only ever lower the unbounded depth") {
    val t10 = run("t10_funnel").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
    val rows = run("t19_funnel_windowed").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Int]("depth")
      assert(d >= 1 && d <= 3)
      // a conversion window can only disqualify conversions, never mint them
      assert(d <= t10(r.getAs[Long]("user_id")))
      // shared stage 1: the first view is deadline-free, so it must agree
      assert(r.getAs[String]("view_ts") != null)
    }
    assert(rows.length == t10.size, "stage 1 is identical, so user sets match")
  }

  test("d6_knn_graph: no self-edges, ranks dense 1..k, neighbors share the cluster") {
    val rows = run("d6_knn_graph").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("vec_id") != r.getAs[Long]("nn_id")))
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.head == 1L && ranks.last == ranks.length.toLong && ranks.length <= 3)
      // sims are non-increasing with rank
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("w13_lorenz: Lorenz curve convex to the diagonal, gini consistent") {
    val rows = run("w13_lorenz").collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    val cum = rows.map(_.getAs[Double]("cum_share"))
    // cumulative shares climb to 1 and never exceed the diagonal's end
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a })
    assert(math.abs(cum.last - 1.0) < 1e-6)
    // deciles are ascending-spend, so each share is >= the previous
    // (Lorenz convexity) and the curve sits under the equality diagonal
    val shares = rows.map(_.getAs[Double]("spend_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a - 1e-9 })
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("cum_share") <= (i + 1) / 10.0 + 1e-6)
    }
    val gini = rows.head.getAs[Double]("gini")
    assert(gini >= 0.0 && gini < 1.0)
    // gini == 1 - 2 * area under the Lorenz curve (trapezoid over the
    // decile grid approximates it; loose tolerance for within-decile
    // variation at sf0.001)
    val area = (0.0 +: cum).sliding(2).map(p => (p(0) + p(1)) / 20.0).sum
    assert(math.abs(gini - (1.0 - 2.0 * area)) < 0.05)
  }

  test("t20_time_to_convert: ordered stats, only real latencies") {
    val r = run("t20_time_to_convert").collect().head
    val (n, mn, p50, p90, mx) = (r.getAs[Long]("n_converted"),
      r.getAs[Long]("min_s"), r.getAs[Long]("p50_s"),
      r.getAs[Long]("p90_s"), r.getAs[Long]("max_s"))
    assert(n > 0)
    assert(mn >= 0 && mn <= p50 && p50 <= p90 && p90 <= mx)
  }

  test("d4_chunk_dedup: fractions bounded, gate matches the integer rule") {
    val rows = run("d4_chunk_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chunks"); val d = r.getAs[Long]("dup_chunks")
      assert(n > 0 && d >= 0 && d <= n)
      assert((r.getAs[Int]("keep") == 1) == (d * 10 <= n * 3))
    }
    // sub-document granularity actually fires at sf0.001 (corpus-wide
    // chunk collisions exist) — the gradient the gate thresholds on
    assert(rows.exists(_.getAs[Long]("dup_chunks") > 0))
  }

  test("d5_dedup_yield_curve: yield is antitone in the threshold") {
    val rows = run("d5_dedup_yield_curve").collect().sortBy(_.getAs[Int]("t10"))
    assert(rows.length == 7 && rows.head.getAs[Int]("t10") == 3)
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val docs = rows.map(_.getAs[Long]("n_docs_removed"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => b <= a })
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a })
    // removed docs are bounded by surviving pairs (each pair drops <= 1)
    rows.foreach(r => assert(
      r.getAs[Long]("n_docs_removed") <= r.getAs[Long]("n_pairs")))
  }

  test("t24_ab_test: counts, rates, and z match a driver-side recompute") {
    val r = run("t24_ab_test").collect().head
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), col("value")).collect()
    def bucket(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val users = ev.map(_.getAs[Long]("user_id")).distinct
    val conv = ev.filter(x => x.getAs[String]("event_type") == "purchase" &&
      x.getAs[Double]("value") >= 150).map(_.getAs[Long]("user_id")).toSet
    val (a, b) = users.partition(bucket(_) == 0)
    assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    val (ca, cb) = (a.count(conv), b.count(conv))
    assert(r.getAs[Long]("conv_a") == ca && r.getAs[Long]("conv_b") == cb)
    val (pa, pb) = (ca * 1.0 / a.length, cb * 1.0 / b.length)
    val pp = (ca + cb) * 1.0 / (a.length + b.length)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / a.length + 1.0 / b.length))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
  }

  test("t25_gap_fill: grid complete per user; activity and spend conserved") {
    val rows = run("t25_gap_fill").collect()
    val ev = Tables(spark, sf).events.collect()
    val days = ev.map(r => r.getAs[java.sql.Timestamp]("ts").getTime / 86400000L)
    val span = (days.max - days.min + 1).toInt
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    // every user present with exactly one row per day of the corpus span
    assert(byUser.size == ev.map(_.getAs[Long]("user_id")).distinct.length)
    byUser.foreach { case (u, rs) =>
      assert(rs.length == span, s"user $u grid incomplete")
      // zero-fill conserves the user's true purchase count
      assert(rs.map(_.getAs[Long]("n")).sum ==
        purchases.count(_.getAs[Long]("user_id") == u))
      val sorted = rs.sortBy(_.getAs[Long]("day_idx"))
      // forward-filled cumulative is monotone and ends at the total
      val cums = sorted.map(_.getAs[Double]("cum_spend"))
      assert(cums.zip(cums.tail).forall { case (x, y) => y >= x - 1e-9 })
      // days_since_active: null before first activity, else gap since
      // the most recent active day
      var lastActive = Option.empty[Long]
      sorted.foreach { rr =>
        val d = rr.getAs[Long]("day_idx")
        if (rr.getAs[Long]("n") > 0) lastActive = Some(d)
        val got = Option(rr.getAs[java.lang.Long]("days_since_active")).map(_.toLong)
        assert(got == lastActive.map(d - _))
      }
    }
  }

  test("t26_cusum: scaled excursion matches recompute; peak is the argmax") {
    val rows = run("t26_cusum").collect().sortBy(_.getAs[Long]("day_idx"))
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n"))
    val tot = ns.sum; val nd = rows.length.toLong
    var cum = 0L
    val expected = ns.zipWithIndex.map { case (n, i) =>
      cum += n; cum * nd - (i + 1) * tot
    }
    assert(rows.map(_.getAs[Long]("s_scaled")).toSeq == expected.toSeq)
    // S_D is identically zero: the deviations sum out over the full span
    assert(expected.last == 0L)
    val mx = expected.map(math.abs).max
    rows.zip(expected).foreach { case (r, s) =>
      assert((r.getAs[Int]("is_peak") == 1) == (math.abs(s) == mx))
    }
  }

  test("a11_assoc_rules: support and lift symmetric; confidence gate holds") {
    val rows = run("a11_assoc_rules").collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getAs[String]("antecedent"),
      r.getAs[String]("consequent")) -> r).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("antecedent"), r.getAs[String]("consequent"))
      // the mirror rule survives the gate at sf0.001's dense co-occurrence;
      // support counts pairs, lift is symmetric by construction
      byPair.get((b, a)).foreach { m =>
        assert(m.getAs[Long]("support_n") == r.getAs[Long]("support_n"))
        assert(m.getAs[Double]("lift") == r.getAs[Double]("lift"))
      }
      assert(r.getAs[Double]("confidence") >= 0.05 - 1e-9)
      assert(r.getAs[Double]("confidence") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("lift") > 0)
    }
  }

  test("a9_trimmed_mean: matches a driver-side sort-and-trim recompute") {
    val rows = run("a9_trimmed_mean").collect()
    val li = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    assert(rows.length == li.size)
    rows.foreach { r =>
      val prices = li(r.getAs[String]("flag"))
        .map(x => BigDecimal(x.getAs[Double]("l_extendedprice")).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sorted
      val k = prices.length / 10
      val kept = prices.slice(k, prices.length - k)
      assert(r.getAs[Long]("n") == prices.length)
      assert(r.getAs[Long]("kept_n") == kept.length)
      assert(math.abs(r.getAs[Double]("kept_sum") - kept.sum.toDouble) < 1e-6)
      val mean = (kept.sum / kept.length).toDouble
      assert(math.abs(r.getAs[Double]("trimmed_mean") - mean) < 1e-3)
    }
  }

  test("t27_path_regex: symbol paths and pattern counts match a driver recompute") {
    val rows = run("t27_path_regex").collect()
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
    val symOf = Map("view" -> 'v', "click" -> 'c', "purchase" -> 'p',
      "signup" -> 's').withDefaultValue('e')
    val paths = ev.groupBy(_.getAs[Long]("user_id")).map { case (u, es) =>
      u -> es.sortBy(e => (e.getAs[java.sql.Timestamp]("ts").getTime,
        e.getAs[Long]("event_id")))
        .map(e => symOf(e.getAs[String]("event_type"))).mkString
    }
    assert(rows.length == paths.size)
    rows.foreach { r =>
      val p = paths(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("path_len") == p.length)
      assert(r.getAs[String]("prefix5") == p.take(5))
      assert(r.getAs[Long]("n_vc") == "vc".r.findAllIn(p).length)
      assert(r.getAs[Long]("n_conv") == "vc*p".r.findAllIn(p).length)
    }
  }

  test("a12_mode: winner is the max-count value with min-value tiebreak") {
    val rows = run("a12_mode").collect()
    val counts = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_quantity").cast("long")).collect()
      .groupBy(r => (r.getAs[String]("l_returnflag"), r.getLong(1)))
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      // toSeq first: collect on a Map would rebuild a Map keyed by n and
      // silently collapse tied counts
      val best = counts.toSeq.collect { case ((f, q), n) if f == flag => (n, -q) }.max
      assert(r.getAs[Long]("n") == best._1)
      assert(r.getAs[Long]("mode_qty") == -best._2)
    }
  }

  test("o5_keyset_page: every row is past the cursor; page equals the sorted head") {
    val rows = run("o5_keyset_page").collect()
    assert(rows.length == 50)
    val cursor = "1996-06-01 00:00:00"
    rows.foreach { r =>
      val d = r.getAs[String]("odate")
      assert(d > cursor || (d == cursor && r.getAs[Long]("o_orderkey") > 3000))
    }
    // the page IS the first 50 of the keyset-filtered sort — no gaps
    // (format the date engine-side: the parquet flavor may surface as NTZ)
    val expected = Tables(spark, sf).orders
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("d"),
        col("o_orderkey"))
      .collect()
      .map(o => (o.getAs[String]("d"), o.getAs[Long]("o_orderkey")))
      .filter { case (d, k) => d > cursor || (d == cursor && k > 3000) }
      .sorted.take(50).map(_._2).toSet
    assert(rows.map(_.getAs[Long]("o_orderkey")).toSet == expected)
  }

  test("d3_boolean: results contain both terms and never the negated term") {
    val rows = run("d3_boolean").collect()
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(d => d.getAs[Long]("doc_id") ->
        d.getAs[String]("text").trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .toMap
    val hits = rows.map(_.getAs[Long]("doc_id")).toSet
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("tf_spark") == toks.count(_ == "spark"))
      assert(r.getAs[Long]("tf_join") == toks.count(_ == "join"))
      assert(!toks.contains("slow"))
    }
    // completeness: every qualifying doc is in the result
    docs.foreach { case (id, toks) =>
      val qualifies = toks.contains("spark") && toks.contains("join") &&
        !toks.contains("slow")
      assert(hits.contains(id) == qualifies)
    }
  }

  test("w15_rolling_slope: closed form matches a driver-side recompute") {
    val rows = run("w15_rolling_slope").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day_idx"))
      val series = sorted.map(r => (r.getAs[Long]("day_idx"), r.getAs[Long]("n_events")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = series.slice(math.max(0, i - 6), i + 1)
        val n = win.length.toLong
        val sx = win.map(_._1).sum; val sy = win.map(_._2).sum
        val sxy = win.map(p => p._1 * p._2).sum
        val sxx = win.map(p => p._1 * p._1).sum
        val denom = n * sxx - sx * sx
        val got = Option(r.getAs[java.lang.Double]("slope")).map(_.toDouble)
        if (denom == 0) assert(got.isEmpty)
        else {
          val slope = (n * sxy - sx * sy) * 1.0 / denom
          assert(math.abs(got.get - slope) < 1e-3)
        }
      }
    }
  }

  test("s15_fd_profile: key FDs hold, non-key candidates are violated") {
    val rows = run("s15_fd_profile").collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    assert(rows.size == 4)
    // p_partkey is the PK of part: the FD to any attribute must hold
    assert(rows("part: p_partkey->p_brand").getAs[Int]("fd_holds") == 1)
    // a customer with >1 order violates custkey->orderkey
    assert(rows("orders: o_custkey->o_orderkey").getAs[Int]("fd_holds") == 0)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("violating") <= r.getAs[Long]("n_groups"))
      assert((r.getAs[Int]("fd_holds") == 1) == (r.getAs[Long]("violating") == 0L))
    }
  }

  test("s16_ri_audit: the TPC-H star is referentially intact; counts conserve") {
    val rows = run("s16_ri_audit").collect()
    assert(rows.length == 4)
    val t = Tables(spark, sf)
    val expectRows = Map(
      "lineitem.l_orderkey->orders" -> t.lineitem.count(),
      "orders.o_custkey->customer" -> t.orders.count(),
      "lineitem.l_partkey->part" -> t.lineitem.count(),
      "customer.c_nationkey->nation" -> t.customer.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == expectRows(r.getAs[String]("edge")))
      assert(r.getAs[Long]("n_orphans") == 0L)
      assert(r.getAs[Int]("intact") == 1)
    }
  }

  test("t28_hysteresis: window formulation equals a sequential state fold") {
    val rows = run("t28_hysteresis").collect().sortBy(_.getAs[Long]("day_idx"))
    assert(rows.nonEmpty)
    var state = 0
    rows.foreach { r =>
      Option(r.getAs[java.lang.Integer]("gate")).map(_.toInt) match {
        case Some(g) => state = g
        case None    => () // carry
      }
      assert(r.getAs[Int]("alert") == state,
        s"day ${r.getAs[Long]("day_idx")}: window state != sequential fold")
    }
    // hysteresis actually exercises the carry branch on this corpus
    assert(rows.exists(r => r.getAs[java.lang.Integer]("gate") == null))
  }

  test("d2_vocab_coverage: coverage is monotone in k and conserves the total") {
    val rows = run("d2_vocab_coverage").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(10L, 50L, 100L, 500L))
    val totals = rows.map(_.getAs[Long]("total")).distinct
    assert(totals.length == 1)
    val covered = rows.map(_.getAs[Long]("covered"))
    assert(covered.zip(covered.tail).forall { case (a, b) => b >= a })
    assert(covered.forall(c => c >= 0 && c <= totals.head))
    rows.foreach(r => assert(math.abs(r.getAs[Double]("coverage") -
      r.getAs[Long]("covered").toDouble / r.getAs[Long]("total")) < 1e-3))
  }

  test("d9_source_report: volumes conserve; dup flags match a text-group recompute") {
    val rows = run("d9_source_report").collect()
    val docs = Tables(spark, sf).documents
      .select(col("source"), col("lang"), col("text")).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val dupTexts = docs.groupBy(_.getAs[String]("text"))
      .filter(_._2.length > 1).values.flatten.toSeq
    assert(rows.map(_.getAs[Long]("n_dup_docs")).sum == dupTexts.length)
    rows.foreach { r =>
      val src = docs.filter(_.getAs[String]("source") == r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == src.length)
      assert(r.getAs[Long]("n_en") == src.count(_.getAs[String]("lang") == "en"))
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("d7_boilerplate: every reported gram really spans the claimed sources") {
    val rows = run("d7_boilerplate").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val docs = Tables(spark, sf).documents
      .select(col("source"), col("text")).collect()
      .map(d => (d.getAs[String]("source"),
        d.getAs[String]("text").trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    def spread(gram: String): (Long, Long) = {
      val parts = gram.split(" ")
      val hits = docs.flatMap { case (src, toks) =>
        toks.sliding(3).filter(_.sameElements(parts)).map(_ => src)
      }
      (hits.distinct.length.toLong, hits.length.toLong)
    }
    rows.foreach { r =>
      val (ns, n) = spread(r.getAs[String]("gram"))
      assert(r.getAs[Long]("n_sources") == ns && ns >= 5)
      assert(r.getAs[Long]("n") == n)
    }
    // ranking is by spread first
    val spreads = rows.map(_.getAs[Long]("n_sources"))
    assert(spreads.zip(spreads.tail).forall { case (a, b) => a >= b })
  }

  test("d8_merge_cdc: merge conserves rows (base - deletes + inserts)") {
    val rows = run("d8_merge_cdc").collect()
      .map(r => r.getAs[String]("action") -> r.getAs[Long]("n")).toMap
    val base = Tables(spark, sf).orders
      .select(col("o_orderkey").as("k")).collect().map(_.getLong(0))
    assert(rows("D") == base.count(_ % 10 == 0))
    assert(rows("U") == base.count(_ % 10 == 1))
    assert(rows("I") == base.count(_ % 10 == 3))
    assert(rows("KEEP") == base.length - rows("D") - rows("U"))
    assert(rows.values.sum == base.length + rows("I"))
  }

  test("d12_source_overlap: full pair matrix with bounded symmetric Jaccard") {
    val rows = run("d12_source_overlap").collect()
    val nSources = Tables(spark, sf).documents
      .select(col("source")).distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val (inter, n1, n2) = (r.getAs[Long]("inter"),
        r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"))
      assert(inter >= 0 && inter <= math.min(n1, n2))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0 && j <= 1)
      assert(math.abs(j - inter.toDouble / (n1 + n2 - inter)) < 1e-3)
    }
  }

  test("t29_interarrival: percentiles ordered; gap count conserves sequences") {
    val rows = run("t29_interarrival").collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type")).collect()
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("p50_s") <= r.getAs[Long]("p90_s"))
      assert(r.getAs[Long]("p90_s") <= r.getAs[Long]("max_s"))
      // each (user, type) sequence of length n contributes n-1 gaps
      val seqs = ev.filter(_.getAs[String]("event_type") == et)
        .groupBy(_.getAs[Long]("user_id")).values.map(_.length - 1)
        .filter(_ > 0).sum
      assert(r.getAs[Long]("n_gaps") == seqs)
    }
  }

  test("t30_autocorrelation: matches a driver recompute; |r| bounded by 1") {
    val rows = run("t30_autocorrelation").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == (1L to 10L))
    val days = Tables(spark, sf).events
      .select(expr("unix_micros(ts) DIV 86400000000").as("d")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val nd = days.length.toLong; val tot = days.map(_._2).sum
    val dev = days.map { case (d, n) => d -> (n * nd - tot) }.toMap
    val den = dev.values.map(v => v * v).sum
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val pairs = dev.toSeq.flatMap { case (d, a) => dev.get(d + k).map(a -> _) }
      assert(r.getAs[Long]("n_pairs") == pairs.length)
      val num = pairs.map { case (a, b) => a * b }.sum
      assert(r.getAs[Long]("num") == num && r.getAs[Long]("den") == den)
      assert(math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-9)
    }
  }

  test("t31_binseg: both levels match a sequential driver recompute") {
    val rows = run("t31_binseg").collect()
    assert(rows.length == 3)
    val days = Tables(spark, sf).events
      .filter(col("event_type") === "error")
      .select(expr("unix_micros(ts) DIV 86400000000").as("d")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    def argmax(series: Seq[(Long, Long)]): (Long, Long) = {
      // (day, excursion) of the scaled CUSUM peak with min-day tiebreak
      val nd = series.length.toLong; val tot = series.map(_._2).sum
      var cum = 0L
      val excs = series.zipWithIndex.map { case ((d, n), i) =>
        cum += n; (d, cum * nd - (i + 1) * tot)
      }
      excs.minBy { case (d, e) => (-math.abs(e), d) }
    }
    val (d1, e1) = argmax(days)
    val level1 = rows.find(_.getAs[Int]("level") == 1).get
    assert(level1.getAs[Long]("day_idx") == d1 &&
      level1.getAs[Long]("excursion") == e1)
    val splitIdx = days.indexWhere(_._1 == d1)
    val expect = Map(
      "left" -> argmax(days.take(splitIdx + 1)),
      "right" -> argmax(days.drop(splitIdx + 1)))
    rows.filter(_.getAs[Int]("level") == 2).foreach { r =>
      val (d, e) = expect(r.getAs[String]("seg"))
      assert(r.getAs[Long]("day_idx") == d && r.getAs[Long]("excursion") == e,
        s"${r.getAs[String]("seg")}: got (${r.getAs[Long]("day_idx")}, " +
          s"${r.getAs[Long]("excursion")}), want ($d, $e)")
    }
  }

  test("d6_cluster_quality: margins non-negative; sizes match the assignment") {
    val rows = run("d6_cluster_quality").collect()
    assert(rows.nonEmpty)
    val nVecs = Tables(spark, sf).embeddings.count()
    assert(rows.map(_.getAs[Long]("n")).sum == nVecs)
    // cluster sizes must agree with the oracle-checked assignment query
    val assignSizes = run("d6_ivf_assign").collect()
      .groupBy(_.getAs[Int]("cluster")).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == assignSizes(r.getAs[Int]("cluster")))
      // own centroid is the argmax, so every margin is >= 0
      assert(r.getAs[Double]("min_margin") >= 0)
      assert(r.getAs[Double]("min_margin") <= r.getAs[Double]("mean_margin") + 1e-9)
    }
  }

  test("sc_benford: digit counts conserve the row count; chi terms non-negative") {
    val rows = run("sc_benford").collect()
    val n = Tables(spark, sf).lineitem.count()
    assert(rows.map(_.getAs[Long]("obs")).sum == n)
    assert(rows.forall(r => r.getAs[Long]("digit") >= 1 && r.getAs[Long]("digit") <= 9))
    // expected counts follow Benford mass and sum back to ~n
    assert(math.abs(rows.map(_.getAs[Double]("expected")).sum - n) < 1.0)
    assert(rows.forall(_.getAs[Double]("chi_term") >= 0))
  }
}
