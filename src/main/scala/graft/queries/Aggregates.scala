package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Canon._
import graft.sources.Tables
import graft.Materialize.{CutSyntax, Shared}

/** Aggregations — SURVEY.md §2.4 (A1–A9).
  *
  * All group-bys are single-shuffle hash aggregates with map-side partials
  * (HashAggregateExec partial/final). Money sums go through
  * DECIMAL(18,2|4) so the result is order-independent and bit-identical to
  * the oracle; averages divide the exact decimal sum by the count in
  * double space so both engines perform the same single fp division.
  *
  * Reference semantics: A1 is `get_lastest_version` (DMS.py:385-392) with
  * the numeric-max fix; A2 is `get_file_version` (DMS.py:368-383).
  */
object Aggregates {

  val all: Seq[Q] = Seq(
    Q(
      "a1_max_per_group",
      Some("""SELECT o_custkey, max(o_orderkey) AS latest_key,
             strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS latest_date
             FROM orders GROUP BY o_custkey ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .groupBy(col("o_custkey"))
            .agg(
              max(col("o_orderkey")).as("latest_key"),
              tstr(max(col("o_orderdate"))).as("latest_date")
            )
        )
      }
    ),
    Q(
      "a2_group_collect",
      // "all versions of a file" as a deterministic sorted list
      Some("""SELECT o_custkey,
             string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
             FROM orders WHERE o_custkey < 50 GROUP BY o_custkey
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .filter(col("o_custkey") < 50L)
            .groupBy(col("o_custkey"))
            .agg(
              array_join(
                transform(sort_array(collect_list(col("o_orderkey"))), _.cast("string")),
                ","
              ).as("order_keys")
            )
        )
      }
    ),
    Q(
      "a3_count_exists",
      Some("""SELECT count(*) AS n_rows,
             count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
             count(DISTINCT o_custkey) AS n_cust
             FROM orders"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders.agg(
          count(lit(1)).as("n_rows"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          countDistinct(col("o_custkey")).as("n_cust")
        )
      }
    ),
    Q(
      "a4_hash_agg_q1",
      // the TPC-H Q1 shape: the canonical partial+final hash aggregate
      Some("""SELECT l_returnflag, l_linestatus,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_qty,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_base,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))), 4) AS DOUBLE) AS sum_disc,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2))) * (1 + CAST(l_tax AS DECIMAL(8,2)))), 4) AS DOUBLE) AS sum_charge,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
             round(CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
             count(*) AS n
             FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
             GROUP BY l_returnflag, l_linestatus ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val qty  = col("l_quantity").cast("decimal(18,2)")
        val px   = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(8,2)")
        val tax  = col("l_tax").cast("decimal(8,2)")
        ordered(
          t.lineitem
            .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(
              round(sum(qty), 4).cast("double").as("sum_qty"),
              round(sum(px), 4).cast("double").as("sum_base"),
              round(sum(px * (lit(1) - disc)), 4).cast("double").as("sum_disc"),
              round(sum(px * (lit(1) - disc) * (lit(1) + tax)), 4).cast("double").as("sum_charge"),
              round(sum(qty).cast("double") / count(lit(1)), 4).as("avg_qty"),
              round(sum(disc).cast("double") / count(lit(1)), 4).as("avg_disc"),
              count(lit(1)).as("n")
            )
        )
      }
    ),
    Q(
      "a4_min_max",
      Some("""SELECT l_returnflag,
             min(l_extendedprice) AS min_px, max(l_extendedprice) AS max_px,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
             FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .groupBy(col("l_returnflag"))
            .agg(
              min(col("l_extendedprice")).as("min_px"),
              max(col("l_extendedprice")).as("max_px"),
              min(col("l_quantity")).as("min_qty"),
              max(col("l_quantity")).as("max_qty")
            )
        )
      }
    ),
    Q(
      "a13_bitmap_distinct",
      // EXACT distinct count via BITMAP chunks (the roaring-bitmap /
      // bitmap-index pattern, SQL-shaped): user ids bucket to 64-wide
      // words (id DIV 63; 63 bits per word keeps the shift off the sign
      // bit in both engines), each word ORs the member bits (1 << id % 63),
      // and the distinct count is the popcount sum — EXACT, fully
      // mergeable (OR is commutative/associative, so partial/final
      // aggregation over any partitioning is exact by construction), and
      // each group's state is its occupied words, never a hash set of
      // values. The third distinct strategy next to A5's hash-distinct
      // (exact, value-sized state) and A6's HLL (approximate, constant
      // state): exact at bounded state when the key domain is dense —
      // ids, days, positions. The query carries count(DISTINCT) beside
      // it so the identity is IN the hash-checked result. 100 TB shape:
      // one (type, word) hash aggregate with map-side partial ORs, then
      // a per-type popcount rollup; no value-set shuffle.
      Some("""WITH w AS (
             |  SELECT event_type, user_id // 63 AS word,
             |         bit_or(1::BIGINT << CAST(user_id % 63 AS INTEGER)) AS bits
             |  FROM events GROUP BY 1, 2
             |),
             |b AS (
             |  SELECT event_type, CAST(sum(bit_count(bits)) AS BIGINT)
             |           AS n_distinct_bitmap,
             |         CAST(count(*) AS BIGINT) AS n_words
             |  FROM w GROUP BY 1
             |),
             |d AS (
             |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
             |           AS n_distinct_exact
             |  FROM events GROUP BY 1
             |)
             |SELECT b.event_type, b.n_distinct_bitmap, d.n_distinct_exact,
             |       b.n_words
             |FROM b JOIN d USING (event_type)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val ev = t.events.select(col("event_type"), col("user_id"))
        val w = ev
          .groupBy(col("event_type"), expr("user_id DIV 63").as("word"))
          .agg(expr("bit_or(shiftleft(1L, cast(user_id % 63 as int)))").as("bits"))
        val b = w.groupBy(col("event_type"))
          .agg(sum(bit_count(col("bits"))).cast("long").as("n_distinct_bitmap"),
            count(lit(1)).as("n_words"))
        val d = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_distinct_exact"))
        ordered(
          b.join(d, Seq("event_type"))
            .select(col("event_type"), col("n_distinct_bitmap"),
              col("n_distinct_exact"), col("n_words")))
      }
    ),
    Q(
      "a5_distinct_agg",
      Some("""SELECT l_returnflag,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part
             FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .groupBy(col("l_returnflag"))
            .agg(
              countDistinct(col("l_suppkey")).as("n_supp"),
              countDistinct(col("l_partkey")).as("n_part")
            )
        )
      }
    ),
    Q(
      "a5_distinct_rows",
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(t.orders.select(col("o_orderstatus"), col("o_orderpriority")).distinct())
      }
    ),
    Q(
      "a6_approx_distinct",
      // HLL++: tested as a bounded-error property vs the exact count, not
      // hash-equality (approx results are engine-specific). rsd=0.01 on
      // ~1.5k distinct keys keeps |approx/exact - 1| well under 0.05.
      //
      // Shape matters: countDistinct and approx_count_distinct in ONE agg
      // makes Catalyst's distinct-agg rewrite group by the key and build a
      // full rsd-sized HLL buffer (1639 words at 0.01) PER DISTINCT KEY —
      // gigabytes of aggregation state shuffled for nothing. HLL is
      // duplicate-insensitive, so distinct first, then one tiny global
      // aggregate over the keys gives the identical estimate.
      None,
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders.select(col("o_custkey")).distinct()
          .agg(
            approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"),
            count(lit(1)).as("exact_cust"))
          .withColumn(
            "within_5pct",
            (abs(col("approx_cust").cast("double") / col("exact_cust") - 1.0) < 0.05)
          )
      }
    ),
    Q(
      "a9_approx_quantiles",
      // the 100 TB percentile path, made EXACT-HASH-CHECKABLE by the GK
      // error-bound law (the Misra-Gries recount discipline applied to
      // quantiles): pass 1 builds the fixed-memory GK sketch
      // (percentile_approx, accuracy 10000 => rank error <= n/10000) and
      // reads band edges at q -/+ 0.001 — by the bound, the true discrete
      // quantile's value is INSIDE [lo, hi] and the band holds ~0.2% of
      // the group. Pass 2 is one more scan: an exact strictly-below-lo
      // count plus a rank window over the tiny band extract the exact
      // order statistic at rank ceil(q*n) — a raw data value, identical
      // in any engine, so the final answer hash-matches DuckDB's direct
      // rank selection. If the sketch ever violated its bound the pick
      // rank would fall outside the band and the row would vanish —
      // a loud hash failure, never a silent approximation. ceil(q*n)
      // is the same IEEE product in both engines. 100 TB shape: pass 1
      // is one hash aggregate with mergeable sketch partials; pass 2 is
      // one scan against the broadcast 3-row stats with map-side partial
      // counts; the rank window rides band-sized partitions.
      Some("""WITH v AS (
             |  SELECT l_returnflag AS flag, l_extendedprice AS x FROM lineitem
             |),
             |n AS (SELECT flag, count(*) AS n FROM v GROUP BY 1),
             |r AS (SELECT flag, x,
             |             row_number() OVER (PARTITION BY flag ORDER BY x) AS rn
             |      FROM v)
             |SELECT r.flag,
             |       min(CASE WHEN rn = CAST(ceil(0.5 * n.n) AS BIGINT)
             |                THEN x END) AS p50,
             |       min(CASE WHEN rn = CAST(ceil(0.95 * n.n) AS BIGINT)
             |                THEN x END) AS p95
             |FROM r JOIN n USING (flag)
             |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val li = t.lineitem
          .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"))
        // pass 1: group sizes + GK band edges (3-row driver-held stats)
        val stats = graft.functions.Bounded.local(
          li.groupBy(col("flag")).agg(
            count(lit(1)).as("n"),
            percentile_approx(col("x"), lit(0.499), lit(10000)).as("lo50"),
            percentile_approx(col("x"), lit(0.501), lit(10000)).as("hi50"),
            percentile_approx(col("x"), lit(0.949), lit(10000)).as("lo95"),
            percentile_approx(col("x"), lit(0.951), lit(10000)).as("hi95")))
        // pass 2: each row fans out to the (<= 2) quantile specs it serves
        val spec = li.join(broadcast(stats), Seq("flag"))
          .select(col("flag"), col("x"),
            explode(array(
              struct(lit(50).as("q"), col("lo50").as("lo"), col("hi50").as("hi"),
                ceil(lit(0.5) * col("n")).cast("long").as("k")),
              struct(lit(95).as("q"), col("lo95").as("lo"), col("hi95").as("hi"),
                ceil(lit(0.95) * col("n")).cast("long").as("k")))).as("s"))
          .select(col("flag"), col("x"), col("s.q").as("q"),
            col("s.lo").as("lo"), col("s.hi").as("hi"), col("s.k").as("k"))
        val cntLt = spec.groupBy(col("flag"), col("q"))
          .agg(sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("cnt_lt"))
        val band = spec.filter(col("x") >= col("lo") && col("x") <= col("hi"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("flag"), col("q")).orderBy(col("x"))))
        val picked = band.join(cntLt, Seq("flag", "q"))
          .filter(col("cnt_lt") + col("rn") === col("k"))
        ordered(
          picked.groupBy(col("flag"))
            .agg(min(when(col("q") === 50, col("x"))).as("p50"),
              min(when(col("q") === 95, col("x"))).as("p95")))
      }
    ),
    Q(
      "a7_rollup",
      Some("""SELECT COALESCE(r.r_name, 'ALL') AS region_name,
             COALESCE(n.n_name, 'ALL') AS nation_name,
             count(*) AS n_cust
             FROM customer c
             JOIN nation n ON c.c_nationkey = n.n_nationkey
             JOIN region r ON n.n_regionkey = r.r_regionkey
             GROUP BY ROLLUP (r.r_name, n.n_name) ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.customer
            .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
            .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
            .rollup(col("r_name"), col("n_name"))
            .agg(count(lit(1)).as("n_cust"))
            .select(
              coalesce(col("r_name"), lit("ALL")).as("region_name"),
              coalesce(col("n_name"), lit("ALL")).as("nation_name"),
              col("n_cust")
            )
        )
      }
    ),
    Q(
      "a7_cube",
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             count(*) AS n
             FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .cube(col("o_orderstatus"), col("o_orderpriority"))
            .agg(count(lit(1)).as("n"))
            .select(
              coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n")
            )
        )
      }
    ),
    Q(
      "a9_stats",
      // percentile over integer-valued doubles: exact interpolation math is
      // identical in both engines; stddev via the exact decimal-sum identity
      Some("""SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
             round(sqrt(greatest(
               (CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
               / (count(*) - 1), 0)), 4) AS sd_qty
             FROM lineitem GROUP BY l_returnflag ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val qd = col("l_quantity").cast("decimal(18,2)")
        ordered(
          t.lineitem
            .groupBy(col("l_returnflag"))
            .agg(
              round(percentile(col("l_quantity"), lit(0.5)), 4).as("median_qty"),
              round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
              round(
                sqrt(
                  greatest(
                    (sum(qd * qd).cast("double")
                      - sum(qd).cast("double") * sum(qd).cast("double") / count(lit(1)))
                      / (count(lit(1)) - 1),
                    lit(0.0)
                  )
                ),
                4
              ).as("sd_qty")
            )
        )
      }
    )
    ,
    Q(
      "a7_pivot",
      // PIVOT: long-to-wide reshaping with an explicit value list (the
      // only scale-safe form — inferring pivot values needs an extra
      // collect pass). Oracle = conditional aggregation, the portable
      // spelling of the same result.
      Some("""SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
             CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
             FROM orders GROUP BY o_orderpriority
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .groupBy(col("o_orderpriority"))
            .pivot("o_orderstatus", Seq("O", "F", "P"))
            .agg(count(lit(1)))
            .na.fill(0L, Seq("O", "F", "P"))
        )
      }
    ),
    Q(
      "a7_grouping_sets",
      // explicit GROUPING SETS with grouping_id disambiguation (A7) —
      // Spark's grouping_id bit order matches DuckDB's GROUPING(...)
      Some("""SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus, o_orderpriority) AS gid, count(*) AS n
             FROM orders
             GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders.createOrReplaceTempView("orders_gs")
        ordered(
          spark.sql(
            """SELECT o_orderstatus, o_orderpriority,
              |       grouping_id(o_orderstatus, o_orderpriority) AS gid, count(*) AS n
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
              |""".stripMargin)
        )
      }
    )
    ,
    Q(
      "a9_corr",
      // Pearson correlation (A9): corr over co-movement of price and
      // quantity per return flag; both engines compute the same
      // sample-covariance formula in double
      Some("""SELECT l_returnflag,
             round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
             count(*) AS n
             FROM lineitem GROUP BY l_returnflag
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .groupBy(col("l_returnflag"))
            .agg(round(corr(col("l_extendedprice"), col("l_quantity")), 4).as("corr_pq"),
              count(lit(1)).as("n"))
        )
      }
    ),
    Q(
      "a9_median_disc",
      // EXACT discrete percentiles: percentile_disc returns an actual
      // element of the group (no interpolation), so unlike quantile_cont
      // there is no float formula to diverge on — both engines run the
      // same ANSI WITHIN GROUP clause and must return the same element
      Some("""SELECT l_returnflag,
             |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
             |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .groupBy(col("l_returnflag"))
            .agg(
              expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50_qty"),
              expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90_qty"))
        )
      }
    ),
    Q(
      "a9_weighted_median",
      // EXACT weighted median — the revenue-weighted "typical quantity"
      // per return flag: the smallest qty whose cumulative weight reaches
      // half the group's total. All weight sums are exact DECIMAL(18,4)
      // money arithmetic and the half-total test is the integer-scaled
      // compare cum*2 >= total — no division, no IEEE threshold, so the
      // chosen element is engine-independent. 100 TB shape: one
      // (flag, qty) hash aggregate with map-side partials, then windows
      // over the GROUPED relation (flags x distinct quantities —
      // bounded), never over raw lineitem.
      Some("""WITH g AS (
             |  SELECT l_returnflag AS flag, l_quantity AS qty,
             |         sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS w
             |  FROM lineitem GROUP BY 1, 2
             |),
             |c AS (
             |  SELECT flag, qty,
             |         sum(w) OVER (PARTITION BY flag ORDER BY qty) AS cum,
             |         sum(w) OVER (PARTITION BY flag) AS tot
             |  FROM g
             |)
             |SELECT flag AS l_returnflag, min(qty) AS w_median_qty
             |FROM c WHERE cum * 2 >= tot
             |GROUP BY flag
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val g = t.lineitem
          .groupBy(col("l_returnflag").as("flag"), col("l_quantity").as("qty"))
          .agg(sum(money(col("l_extendedprice"))).as("w"))
        val wc = Window.partitionBy(col("flag")).orderBy(col("qty"))
        val wt = Window.partitionBy(col("flag"))
        ordered(
          g.select(col("flag"), col("qty"),
              sum(col("w")).over(wc).as("cum"),
              sum(col("w")).over(wt).as("tot"))
            .filter(col("cum") * 2 >= col("tot"))
            .groupBy(col("flag"))
            .agg(min(col("qty")).as("w_median_qty"))
            .select(col("flag").as("l_returnflag"), col("w_median_qty")))
      }
    ),
    Q(
      "a6_hll_merge",
      // mergeable sketches — the 100 TB distinct-count pattern: per-source
      // HLL sketches (Datasketches) built independently, then UNIONED to a
      // global estimate without rescanning anything. rows-only (sketch
      // internals have no DuckDB oracle); FunctionsSpec pins the accuracy
      // envelope and union-vs-direct agreement.
      None,
      (spark, dir) => {
        val t = Tables(spark, dir)
        val perSource = t.documents.groupBy(col("source"))
          .agg(hll_sketch_agg(col("doc_id")).as("sk"),
            count(lit(1)).as("n_rows"))
        ordered(
          perSource.agg(
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_distinct_docs"),
            sum(col("n_rows")).as("n_rows"))
        )
      }
    ),
    Q(
      "a6_hll_intersect",
      // sketch SET ALGEBRA: HLL unions compose, intersections don't — the
      // standard workaround is inclusion-exclusion over mergeable
      // sketches, est(A) + est(B) − est(A∪B), here estimating customers
      // active in BOTH 1995 and 1996 without ever materializing either
      // key set. Error compounds through the subtraction (union error is
      // relative to the BIGGER set), which is exactly why the query
      // carries its own exact-intersection audit column and self-asserts
      // the 10% envelope — the honest contract for sketch algebra.
      // rows-only (sketch internals are engine-specific); FunctionsSpec
      // pins the assertion. One fact scan builds both year sketches;
      // the exact audit is a per-customer two-flag aggregate that a real
      // deployment would drop.
      None,
      (spark, dir) => {
        val t = Tables(spark, dir)
        val o = t.orders.select(col("o_custkey"),
          year(col("o_orderdate")).as("y"))
        val sk = o.agg(
          hll_sketch_agg(when(col("y") === 1995, col("o_custkey")), lit(14)).as("sa"),
          hll_sketch_agg(when(col("y") === 1996, col("o_custkey")), lit(14)).as("sb"))
        val per = o.groupBy(col("o_custkey"))
          .agg(max(when(col("y") === 1995, 1).otherwise(0)).as("a"),
            max(when(col("y") === 1996, 1).otherwise(0)).as("b"))
          .agg(sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
            .as("exact_both"))
        ordered(
          sk.crossJoin(per) // two 1-row aggregates
            .select(
              hll_sketch_estimate(col("sa")).as("est_1995"),
              hll_sketch_estimate(col("sb")).as("est_1996"),
              hll_sketch_estimate(hll_union(col("sa"), col("sb"))).as("est_union"),
              (hll_sketch_estimate(col("sa")) + hll_sketch_estimate(col("sb")) -
                hll_sketch_estimate(hll_union(col("sa"), col("sb")))).as("est_both"),
              col("exact_both"))
            .withColumn("within_10pct",
              abs(col("est_both").cast("double") / col("exact_both") - 1.0) < 0.10)
        )
      }
    ),
    Q(
      "tpch_q3",
      // TPC-H Q3 shape (shipping priority): selective dim filter ->
      // fact join -> decimal revenue aggregate -> global top-10. The
      // filtered customer segment broadcasts; revenue is an exact
      // decimal sum (order-independent) cast to double once at the end.
      Some("""SELECT * FROM (
             |  SELECT l_orderkey,
             |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                   * (1 - CAST(l_discount AS DECIMAL(8,2)))), 4)
             |         AS DOUBLE) AS revenue,
             |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
             |    o_orderpriority
             |  FROM customer
             |  JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON l_orderkey = o_orderkey
             |  WHERE c_mktsegment = 'BUILDING'
             |    AND o_orderdate < TIMESTAMP '1996-06-30 00:00:00'
             |    AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
             |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |  ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
             |  LIMIT 10)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val px   = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(8,2)")
        val cutoff = to_timestamp(lit("1996-06-30 00:00:00"))
        ordered(
          t.customer.filter(col("c_mktsegment") === "BUILDING")
            .join(t.orders, col("c_custkey") === col("o_custkey"))
            .filter(col("o_orderdate") < cutoff)
            .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
            .filter(col("l_shipdate") > cutoff)
            .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
            .agg(round(sum(px * (lit(1) - disc)), 4).cast("double").as("revenue"))
            .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
            .limit(10)
            .select(col("l_orderkey"), col("revenue"),
              tstr(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
        )
      }
    ),
    Q(
      "tpch_q6",
      // TPC-H Q6 shape (forecast revenue): pure scan-filter-aggregate —
      // every predicate reaches the parquet scan, one partial/final agg,
      // no shuffle beyond the single-row final
      Some("""SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                     * CAST(l_discount AS DECIMAL(8,2))), 4)
             |            AS DOUBLE) AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
            .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")
                * col("l_discount").cast("decimal(8,2)")), 4)
                .cast("double").as("revenue"),
              count(lit(1)).as("n"))
        )
      }
    ),
    Q(
      "tpch_q10",
      // TPC-H Q10 shape (returned-item reporting): fact filter on the
      // return flag -> order window filter -> customer/nation broadcast
      // -> revenue per customer -> global top-20
      Some("""SELECT * FROM (
             |  SELECT c_custkey, c_name, n_name,
             |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                   * (1 - CAST(l_discount AS DECIMAL(8,2)))), 4)
             |         AS DOUBLE) AS revenue
             |  FROM customer
             |  JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON l_orderkey = o_orderkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  WHERE l_returnflag = 'R'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             |  GROUP BY c_custkey, c_name, n_name
             |  ORDER BY revenue DESC, c_custkey ASC
             |  LIMIT 20)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val px   = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(8,2)")
        ordered(
          t.customer
            .join(t.orders, col("c_custkey") === col("o_custkey"))
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
            .join(t.lineitem.filter(col("l_returnflag") === "R"),
              col("o_orderkey") === col("l_orderkey"))
            .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
            .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
            .agg(round(sum(px * (lit(1) - disc)), 4).cast("double").as("revenue"))
            .orderBy(col("revenue").desc, col("c_custkey").asc)
            .limit(20)
        )
      }
    ),
    Q(
      "tpch_q18",
      // TPC-H Q18 shape (large-volume customers): the canonical
      // aggregate -> semi-join-back -> top-k pattern. The HAVING
      // subquery is one map-side-partial hash aggregate over lineitem;
      // its survivors semi-join orders ON THE SAME KEY as the fact join
      // (o_orderkey), so AQE reuses one exchange for both; customer
      // broadcasts; the global top-100 is TakeOrderedAndProject, never
      // a full sort. o_orderkey in the sort makes the order total.
      Some("""SELECT * FROM (
             |  SELECT c_name, c_custkey, o_orderkey,
             |         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
             |         o_totalprice, sum(l_quantity) AS sum_qty
             |  FROM customer
             |  JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON o_orderkey = l_orderkey
             |  WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
             |                       GROUP BY l_orderkey
             |                       HAVING sum(l_quantity) > 300)
             |  GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
             |  ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
             |  LIMIT 100)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val big = t.lineitem.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 300)
          .select(col("l_orderkey").as("bigkey"))
        ordered(
          t.orders
            .join(big, col("o_orderkey") === col("bigkey"), "left_semi")
            .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
            .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
            .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"))
            .agg(sum(col("l_quantity")).as("sum_qty"))
            .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
              col("o_orderkey").asc)
            .limit(100)
            .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              tstr(col("o_orderdate")).as("o_orderdate"),
              col("o_totalprice"), col("sum_qty"))
        )
      }
    ),
    Q(
      "tpch_q5",
      // TPC-H Q5 shape (local-supplier revenue): six-way join where the
      // region/nation/supplier dims broadcast and the extra
      // c_nationkey = s_nationkey condition rides the supplier join
      Some("""SELECT n_name,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                 * (1 - CAST(l_discount AS DECIMAL(8,2)))), 4)
             |       AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val px   = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(8,2)")
        ordered(
          t.customer
            .join(t.orders, col("c_custkey") === col("o_custkey"))
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
            .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
            .join(broadcast(t.supplier),
              col("l_suppkey") === col("s_suppkey") &&
                col("c_nationkey") === col("s_nationkey"))
            .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
            .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "ASIA")
            .groupBy(col("n_name"))
            .agg(round(sum(px * (lit(1) - disc)), 4).cast("double").as("revenue"))
        )
      }
    ),
    Q(
      "tpch_q7",
      // TPC-H Q7 shape (volume shipping between two nations): the
      // nation-pair filters are applied to the DIM sides before any fact
      // shuffle — supplier and customer are each pre-pruned to 2/25 of
      // their rows by a broadcast nation join, so the lineitem->orders
      // and orders->customer shuffles carry only qualifying rows; the
      // residual pair predicate (exclude same-nation) runs last on the
      // already-tiny result. Exact decimal revenue, grouped by year.
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS INT) AS l_year,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                 * (1 - CAST(l_discount AS DECIMAL(8,2)))), 4)
             |       AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
             |    OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2'))
             |GROUP BY 1, 2, 3
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val px   = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(8,2)")
        val names = Seq("NATION_2", "NATION_3")
        // dims pruned BEFORE the fact joins: only the two nations' rows
        // ever ride a shuffle
        val sup = t.supplier
          .join(broadcast(t.nation.filter(col("n_name").isin(names: _*))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = t.customer
          .join(broadcast(t.nation.filter(col("n_name").isin(names: _*))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        ordered(
          t.lineitem
            .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
            .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
            .join(t.orders, col("l_orderkey") === col("o_orderkey"))
            .join(cust, col("o_custkey") === col("c_custkey"))
            .filter(col("supp_nation") =!= col("cust_nation"))
            .groupBy(col("supp_nation"), col("cust_nation"),
              year(col("l_shipdate")).as("l_year"))
            .agg(round(sum(px * (lit(1) - disc)), 4).cast("double").as("revenue"))
        )
      }
    ),
    Q(
      "tpch_q8",
      // TPC-H Q8 shape (national market share): revenue share of one
      // supplier nation within a region's market for one part type.
      // Customers are pre-pruned to the region via broadcast nation+region
      // joins; the part-type filter prunes the fact before its first
      // shuffle. Numerator and denominator are EXACT decimal sums cast to
      // double only for the final division (one IEEE op both engines
      // reproduce bit-for-bit).
      Some("""WITH vol AS (
             |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             |         CAST(l_extendedprice AS DECIMAL(18,2))
             |           * (1 - CAST(l_discount AS DECIMAL(8,2))) AS volume,
             |         n2.n_name AS supp_nation
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |)
             |SELECT o_year,
             |  CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
             |                           THEN volume ELSE 0 END) AS DOUBLE)
             |             / CAST(sum(volume) AS DOUBLE), 4) AS DOUBLE) AS mkt_share
             |FROM vol GROUP BY o_year
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val volume = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(8,2)"))
        // region-pruned customers: broadcast joins against 25/5-row dims
        val cust = t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("c_custkey"))
        val sup = t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        ordered(
          t.lineitem
            .join(t.part.filter(col("p_type") === "ECONOMY")
              .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
            .join(t.orders
              .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))),
              col("l_orderkey") === col("o_orderkey"))
            .join(cust, col("o_custkey") === col("c_custkey"))
            .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
            .groupBy(year(col("o_orderdate")).as("o_year"))
            .agg(round(
              sum(when(col("supp_nation") === "NATION_3", volume)
                .otherwise(lit(0))).cast("double") /
                sum(volume).cast("double"), 4).cast("double").as("mkt_share"))
        )
      }
    ),
    Q(
      "tpch_q13",
      // TPC-H Q13 shape (customer order-count distribution): the join
      // predicate's extra filter lives ON the outer join, not in WHERE —
      // customers whose only orders are urgent must survive with count 0.
      // Two stacked aggregates; the second groups ~50 distinct counts, so
      // the big shuffle is the first one on c_custkey only.
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey
             |)
             |GROUP BY c_count
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.customer
            .join(t.orders,
              col("c_custkey") === col("o_custkey") &&
                col("o_orderpriority") =!= "1-URGENT", "left")
            .groupBy(col("c_custkey"))
            .agg(count(col("o_orderkey")).as("c_count"))
            .groupBy(col("c_count"))
            .agg(count(lit(1)).as("custdist"))
        )
      }
    ),
    Q(
      "tpch_q22",
      // TPC-H Q22 shape (global-customer sales opportunity): a scalar
      // aggregate (positive-balance average) gates the fact filter, and
      // customers with no URGENT orders survive an anti-join. The average is
      // compared CROSS-MULTIPLIED in exact decimal (bal * n > sum) — no
      // float division anywhere near the predicate, so the boundary is
      // bit-identical in both engines.
      Some("""WITH pos AS (
             |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s,
             |         count(*) AS n
             |  FROM customer WHERE c_acctbal > 0.0
             |)
             |SELECT c_nationkey AS cntry, count(*) AS numcust,
             |       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 4) AS DOUBLE)
             |         AS totacctbal
             |FROM customer CROSS JOIN pos
             |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
             |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
             |                        WHERE o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val bal = col("c_acctbal").cast("decimal(18,2)")
        val pos = t.customer.filter(col("c_acctbal") > 0.0)
          .agg(sum(bal).cast("decimal(38,2)").as("s"), count(lit(1)).as("n"))
        ordered(
          t.customer.crossJoin(broadcast(pos)) // 1-row scalar subquery
            .filter(bal * col("n") > col("s"))
            .join(t.orders.filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey").as("c_custkey")),
              Seq("c_custkey"), "left_anti")
            .groupBy(col("c_nationkey"))
            .agg(count(lit(1)).as("numcust"),
              round(sum(bal), 4).cast("double").as("totacctbal"))
            .select(col("c_nationkey").as("cntry"), col("numcust"),
              col("totacctbal"))
        )
      }
    ),
    Q(
      "tpch_q14",
      // TPC-H Q14 shape (promotion effect): one month of lineitem joined
      // to part, conditional-over-total revenue ratio. The date filter is
      // pushed to the fact scan; part carries only (p_partkey, p_type)
      // through its join. Both sums exact decimal; one double division +
      // multiply at the end, in the same order in both engines.
      Some("""SELECT
             |  CAST(round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
             |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
             |           * (1 - CAST(l_discount AS DECIMAL(8,2)))
             |      ELSE 0 END) AS DOUBLE)
             |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |               * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE), 4)
             |    AS DOUBLE) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val volume = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(8,2)"))
        t.lineitem
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-09-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-10-01 00:00:00")))
          .join(t.part.select(col("p_partkey"), col("p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", volume).otherwise(lit(0)))
              .cast("double") /
            sum(volume).cast("double"), 4).cast("double").as("promo_revenue"))
      }
    ),
    Q(
      "a11_assoc_rules",
      // MARKET-BASKET ASSOCIATION RULES — the classic Apriori pair pass
      // (Agrawal & Srikant 1994) at brand granularity: which brands
      // co-occur in the same order, with directional confidence and lift?
      // All supports are exact integers; the confidence floor is an
      // INTEGER-ONLY gate (100·c_ab >= 5·c_a) so rule admission never
      // touches an IEEE threshold; confidence and lift are single
      // rounded divisions over exact BIGINT products (< 2^53). 100 TB
      // shape: the fact enters once into a distinct (order, brand) hash
      // aggregate; the pair self-join is on the ORDER key so candidates
      // ride basket-size², never item-count²; brand marginals live on
      // the 25-row brand-TYPE relation and broadcast back, as does the
      // 1-row order-count scalar.
      Some("""WITH items AS (
             |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |),
             |nt AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
             |m AS (SELECT brand, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY 1),
             |pr AS (
             |  SELECT i1.brand AS a, i2.brand AS b, CAST(count(*) AS BIGINT) AS c_ab
             |  FROM items i1 JOIN items i2 ON i1.ok = i2.ok AND i1.brand <> i2.brand
             |  GROUP BY 1, 2
             |)
             |SELECT pr.a AS antecedent, pr.b AS consequent, pr.c_ab AS support_n,
             |       round(pr.c_ab * 1.0 / ma.cnt, 4) AS confidence,
             |       round(CAST(pr.c_ab * nt.n_orders AS DOUBLE) /
             |             CAST(ma.cnt * mb.cnt AS DOUBLE), 4) AS lift
             |FROM pr JOIN m ma ON pr.a = ma.brand JOIN m mb ON pr.b = mb.brand
             |CROSS JOIN nt
             |WHERE pr.c_ab * 100 >= ma.cnt * 5
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        // materialize the distinct item set ONCE: it feeds both pair-join
        // sides, both marginals, and the order count — without this the
        // fact⋈part join re-runs five times (observed 10 scans in the
        // executed plan)
        val items = t.lineitem.select(col("l_orderkey").as("ok"), col("l_partkey"))
          .join(t.part.select(col("p_partkey"), col("p_brand").as("brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("ok"), col("brand")).distinct()
          .cut(Shared)
        val nt = items.agg(countDistinct(col("ok")).as("n_orders"))
        val m = items.groupBy(col("brand")).agg(count(lit(1)).as("cnt"))
        val pr = items.as("i1")
          .join(items.as("i2"),
            col("i1.ok") === col("i2.ok") && col("i1.brand") =!= col("i2.brand"))
          .groupBy(col("i1.brand").as("a"), col("i2.brand").as("b"))
          .agg(count(lit(1)).as("c_ab"))
        ordered(
          pr.join(broadcast(m.select(col("brand").as("ma_b"), col("cnt").as("ma_cnt"))),
              col("a") === col("ma_b"))
            .join(broadcast(m.select(col("brand").as("mb_b"), col("cnt").as("mb_cnt"))),
              col("b") === col("mb_b"))
            .crossJoin(broadcast(nt)) // 1-row order-count scalar
            .filter(col("c_ab") * 100 >= col("ma_cnt") * 5)
            .select(col("a").as("antecedent"), col("b").as("consequent"),
              col("c_ab").as("support_n"),
              round(col("c_ab") * lit(1.0) / col("ma_cnt"), 4).as("confidence"),
              round((col("c_ab") * col("n_orders")).cast("double") /
                (col("ma_cnt") * col("mb_cnt")).cast("double"), 4).as("lift")))
      }
    ),
    Q(
      "a12_mode",
      // DETERMINISTIC MODE PER GROUP — most frequent quantity per return
      // flag, ties to the smallest value. Deliberately NOT a window: the
      // winner comes from max(struct(count, −qty)) over the (flag, qty)
      // count relation — two hash aggregates with map-side partials and
      // no per-flag sort, the g6 vote-winner shape. Engine-independent by
      // construction: the struct compare is pure integer lexicographic.
      // 100 TB shape: the fact collapses immediately to the value-TYPE
      // relation (flags × distinct quantities, bounded); everything after
      // rides that.
      Some("""WITH c AS (
             |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem GROUP BY 1, 2
             |),
             |w AS (
             |  SELECT flag, qty, n,
             |         row_number() OVER (PARTITION BY flag
             |                            ORDER BY n DESC, qty ASC) AS rn
             |  FROM c
             |)
             |SELECT flag, qty AS mode_qty, n
             |FROM w WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val c = t.lineitem
          .groupBy(col("l_returnflag").as("flag"),
            col("l_quantity").cast("long").as("qty"))
          .agg(count(lit(1)).as("n"))
        ordered(
          c.groupBy(col("flag"))
            .agg(max(struct(col("n"), (-col("qty")).as("neg"))).as("win"))
            .select(col("flag"), (-col("win.neg")).as("mode_qty"),
              col("win.n").as("n")))
      }
    ),
    Q(
      "a9_trimmed_mean",
      // 10% TWO-SIDED TRIMMED MEAN — the outlier-robust location estimate
      // between the mean and the median: per return flag, drop the lowest
      // and highest floor(n/10) prices by rank and average the middle.
      // Row_number ties among equal prices are arbitrary, but the KEPT
      // MULTISET depends only on per-value counts, so both engines keep
      // identical values; the kept sum rides exact DECIMAL and the mean
      // is one rounded division. The oracle keeps the window spelling —
      // it IS the semantic spec. The engine side implements the 100 TB
      // form (the round-12 audit finding: a window PARTITIONed on the
      // 3-value flag domain pushes a third of the corpus through one
      // sort task): GK sketches bracket both trim boundaries per flag,
      // ONE exact grouped pass counts rows below/at each bracket
      // endpoint, tie arithmetic places each boundary value (inside a
      // tie run or strictly between — the ExactNtile discipline), an
      // eps-bounded band refine finds in-between boundary values, and
      // the result is ONE filtered exact-DECIMAL aggregate plus
      // driver-held boundary-run corrections. Bounded passes, zero
      // fact-table windows; a broken sketch bracket fails a loud
      // require(), never a silent mis-trim.
      Some("""WITH r AS (
             |  SELECT l_returnflag AS flag,
             |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             |         row_number() OVER (PARTITION BY l_returnflag
             |                            ORDER BY l_extendedprice) AS rn,
             |         count(*) OVER (PARTITION BY l_returnflag) AS c
             |  FROM lineitem
             |)
             |SELECT flag, CAST(max(c) AS BIGINT) AS n,
             |       CAST(count(*) AS BIGINT) AS kept_n,
             |       CAST(CAST(sum(price) AS DECIMAL(18,2)) AS DOUBLE) AS kept_sum,
             |       round(CAST(sum(price) AS DOUBLE) / count(*), 4) AS trimmed_mean
             |FROM r
             |WHERE rn > c // 10 AND rn <= c - c // 10
             |GROUP BY flag
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        // multi-consumed per-flag fact projection (count, sketch, exact
        // counts, band refine, final filtered aggregate)
        val li = t.lineitem.select(
          col("l_returnflag").as("flag"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"),
          // the rank order column: raw 2-decimal doubles, so equality
          // and ordering are exact
          col("l_extendedprice").as("pd"))
          .cut(Shared)
        // pass 0: per-flag n (the flag domain is a literal 3-value grid)
        val ns: Map[String, Long] = li.groupBy(col("flag"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        require(ns.nonEmpty, "a9_trimmed_mean: empty lineitem")
        // trim ranks per flag: drop floor(n/10) per side — keep (kLo, kHi]
        val kLoM = ns.map { case (f, n) => f -> n / 10 }
        val kHiM = ns.map { case (f, n) => f -> (n - n / 10) }
        // pass 1: GK brackets for BOTH boundaries, all flags in one
        // grouped sketch (common eps-widened fractions cover each
        // flag's exact kLo/n, which floor-deviates from 0.1 by < 1/n)
        val eps = 0.002
        val nmin = ns.values.min.toDouble
        def cl(q: Double) = math.min(1.0, math.max(0.0, q))
        val fr = Seq(cl(0.1 - eps - 1 / nmin), cl(0.1 + eps),
          cl(0.9 - eps), cl(0.9 + eps + 1 / nmin))
        val sk: Map[String, Seq[Double]] = li.groupBy(col("flag"))
          .agg(percentile_approx(col("pd"), array(fr.map(lit): _*),
            lit(10000)).as("b"))
          .collect()
          .map(r => r.getString(0) ->
            r.getAs[scala.collection.Seq[Double]]("b").toSeq).toMap
        // pass 2: exact tie-aware counts at all 4 bracket endpoints per
        // flag — one 1-row conditional-sum fold (24 cells)
        val cntCols = sk.toSeq.sortBy(_._1).flatMap { case (f, bs) =>
          bs.zipWithIndex.flatMap { case (b, j) => Seq(
            sum(when(col("flag") === f && col("pd") < b, 1L).otherwise(0L))
              .as(s"clt_${f}_$j"),
            sum(when(col("flag") === f && col("pd") === b, 1L).otherwise(0L))
              .as(s"ceq_${f}_$j"))
          }
        }
        val cnt = li.agg(cntCols.head, cntCols.tail: _*).collect()(0)
        def g(n: String): Long = cnt.getAs[Long](n)
        // classification: where does the rank-k boundary value live?
        // (value, cumlt, cnt) when resolved; Left(band) when strictly
        // between the bracket endpoints
        sealed trait Loc
        case class At(v: Double, cumlt: Long, m: Long) extends Loc
        case class Refine(lo: Double, hi: Double, offset: Long, kb: Long)
          extends Loc
        def locate(f: String, k: Long, jLo: Int, jHi: Int): Option[Loc] = {
          if (k <= 0) None // no trim on this side
          else {
            val (a1, a2) = (sk(f)(jLo), sk(f)(jHi))
            val (clt1, ceq1) = (g(s"clt_${f}_$jLo"), g(s"ceq_${f}_$jLo"))
            val (clt2, ceq2) = (g(s"clt_${f}_$jHi"), g(s"ceq_${f}_$jHi"))
            require(k > clt1 && k <= clt2 + ceq2,
              s"a9_trimmed_mean: rank $k of flag $f escaped the GK bracket")
            if (k <= clt1 + ceq1) Some(At(a1, clt1, ceq1))
            else if (k > clt2) Some(At(a2, clt2, ceq2))
            else Some(Refine(a1, a2, clt1 + ceq1, k - clt1 - ceq1))
          }
        }
        val lo0 = ns.keys.toSeq.sorted
          .map(f => (f, "lo", locate(f, kLoM(f), 0, 1)))
        val hi0 = ns.keys.toSeq.sorted
          // kLo == 0 (n < 10) means kHi == n: no upper trim either —
          // the bracket only covers interior ranks
          .map(f => (f, "hi", locate(f, if (kLoM(f) == 0) 0 else kHiM(f), 2, 3)))
        // pass 3 (only when some boundary is strictly inside its
        // bracket): rank the eps-bounded band's per-VALUE counts and
        // pick the run covering the in-band rank — never a fact window
        val refines = (lo0 ++ hi0).collect {
          case (f, w, Some(r: Refine)) => (f, w, r)
        }
        val refined: Map[(String, String), At] =
          if (refines.isEmpty) Map.empty
          else {
            val bandRel = li.select(col("pd"), explode(array(refines.map {
              case (f, w, r) =>
                struct(lit(f).as("f"), lit(w).as("w"), lit(r.kb).as("kb"),
                  lit(r.offset).as("off"),
                  (col("flag") === f && col("pd") > r.lo && col("pd") < r.hi)
                    .as("in"))
            }: _*)).as("e"))
              .filter(col("e.in"))
              .groupBy(col("e.f").as("f"), col("e.w").as("w"),
                col("e.kb").as("kb"), col("e.off").as("off"), col("pd"))
              .agg(count(lit(1)).as("m"))
              .withColumn("cum", sum(col("m")).over(
                Window.partitionBy(col("f"), col("w")).orderBy(col("pd"))
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
              .filter(col("cum") >= col("kb") &&
                col("cum") - col("m") < col("kb"))
              .collect()
            require(bandRel.length == refines.length,
              s"a9_trimmed_mean: expected ${refines.length} band picks, " +
                s"got ${bandRel.length}")
            bandRel.map { r =>
              (r.getString(0), r.getString(1)) -> At(
                r.getDouble(4),
                r.getAs[Long]("off") + r.getAs[Long]("cum") - r.getAs[Long]("m"),
                r.getAs[Long]("m"))
            }.toMap
          }
        val bound: Map[(String, String), Option[At]] = (lo0 ++ hi0).map {
          case (f, w, Some(a: At)) => (f, w) -> Some(a)
          case (f, w, Some(_: Refine)) => (f, w) -> Some(refined((f, w)))
          case (f, w, None) => (f, w) -> None
        }.toMap
        // driver-held boundary-run corrections: a run (v, cumlt, m)
        // overlapping the kept rank interval (kLo, kHi] keeps
        // min(cumlt+m, kHi) − max(cumlt, kLo) rows of value v; when both
        // cuts land in ONE run the formula counts it once (loV == hiV)
        def kept(a: At, kLo: Long, kHi: Long): Long =
          math.max(0L, math.min(a.cumlt + a.m, kHi) - math.max(a.cumlt, kLo))
        case class Corr(flag: String, addN: Long, addSum: java.math.BigDecimal,
            loV: Option[Double], hiV: Option[Double])
        val corrs: Seq[Corr] = ns.keys.toSeq.sorted.map { f =>
          val (kLo, kHi) = (kLoM(f), kHiM(f))
          val lo = bound((f, "lo")); val hi = bound((f, "hi"))
          val runs = (lo.toSeq ++ hi.toSeq).distinct // loV == hiV → once
          val addN = runs.map(kept(_, kLo, kHi)).sum
          val addSum = runs.map { a =>
            java.math.BigDecimal.valueOf(a.v).setScale(2)
              .multiply(java.math.BigDecimal.valueOf(kept(a, kLo, kHi)))
          }.foldLeft(java.math.BigDecimal.ZERO.setScale(2))(_.add(_))
          Corr(f, addN, addSum, lo.map(_.v), hi.map(_.v))
        }
        // pass 4: ONE filtered exact-DECIMAL aggregate over the strictly-
        // between rows + per-flag literal corrections — no window anywhere
        val betweenCond = corrs.foldLeft(lit(false)) { (acc, c) =>
          val inside = (c.loV, c.hiV) match {
            case (Some(l), Some(h)) => col("pd") > l && col("pd") < h
            case (Some(l), None)    => col("pd") > l
            case (None, Some(h))    => col("pd") < h
            case (None, None)       => lit(true)
          }
          when(col("flag") === c.flag, inside).otherwise(acc)
        }
        def chainL(f: Corr => Long) = corrs.foldLeft(lit(0L)) { (acc, c) =>
          when(col("flag") === c.flag, lit(f(c))).otherwise(acc)
        }
        val addSumCol = corrs.foldLeft(lit(java.math.BigDecimal.ZERO)
            .cast("decimal(18,2)")) { (acc, c) =>
          when(col("flag") === c.flag,
            lit(c.addSum).cast("decimal(18,2)")).otherwise(acc)
        }
        // conditional aggregate (not a filter) so a flag whose kept
        // interior is empty still emits its row
        val bt = li.groupBy(col("flag")).agg(
          count(when(betweenCond, 1)).as("bc"),
          coalesce(sum(when(betweenCond, col("price"))),
            lit(0).cast("decimal(18,2)")).as("bs"))
        ordered(
          bt.select(col("flag"),
            chainL(c => ns(c.flag)).as("n"),
            (col("bc") + chainL(_.addN)).as("kept_n"),
            (col("bs") + addSumCol).cast("decimal(18,2)").cast("double")
              .as("kept_sum"),
            round((col("bs") + addSumCol).cast("double")
                / (col("bc") + chainL(_.addN)), 4).as("trimmed_mean")))
      }
    ),
    Q(
      "a7_unpivot",
      // UNPIVOT / melt — the inverse of a7_pivot and the wide-to-long
      // reshape every feature table goes through before a generic
      // per-(entity, measure) aggregation. Spark plans it as a single
      // Expand node: one pass, rows x measures output, NO shuffle and no
      // per-measure scan — at 100 TB that beats the UNION-ALL spelling
      // (which would scan the table once per measure). The oracle IS the
      // UNION-ALL spelling, proving the Expand path equivalent.
      Some("""SELECT p_partkey, 'size' AS measure, CAST(p_size AS BIGINT) AS value
             |FROM part
             |UNION ALL
             |SELECT p_partkey, 'name_len', CAST(length(p_name) AS BIGINT) FROM part
             |UNION ALL
             |SELECT p_partkey, 'type_len', CAST(length(p_type) AS BIGINT) FROM part
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.part
            .select(col("p_partkey"),
              col("p_size").cast("long").as("size"),
              length(col("p_name")).cast("long").as("name_len"),
              length(col("p_type")).cast("long").as("type_len"))
            .unpivot(
              Array(col("p_partkey")),
              Array(col("size"), col("name_len"), col("type_len")),
              "measure", "value")
        )
      }
    ),
    Q(
      "s18_join_size_estimate",
      // JOIN-SIZE ESTIMATION via count-min inner products (the AMS/CMS
      // sketch technique a cost-based planner uses to size a join before
      // running it): exact |A ⋈_u B| = Σ_u cntA(u)·cntB(u); the estimate
      // is min over d=4 hash rows of the 64-bucket sketch dot product —
      // one-sided (est ≥ exact, colliding keys only ADD mass), mergeable,
      // and O(d·w) state per relation regardless of key cardinality. The
      // same portable md5 bucketing as a6_cms_estimate makes the sketch
      // bit-identical in DuckDB, so estimate AND exact are both in the
      // hash-checked result. 100 TB shape: sketches are 256-cell
      // aggregates with map-side partials — the planner pass touches each
      // relation once and joins k-row sketches, never the data.
      Some("""WITH cnt AS (
             |  SELECT event_type, user_id, count(*) AS c
             |  FROM events GROUP BY 1, 2
             |),
             |ex AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |         CAST(sum(a.c * b.c) AS BIGINT) AS exact_size
             |  FROM cnt a JOIN cnt b
             |    ON a.user_id = b.user_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2
             |),
             |seeds AS (SELECT unnest(range(0, 4)) AS seed),
             |sk AS (
             |  SELECT event_type, seed,
             |         ('0x' || substring(md5(CAST(seed AS VARCHAR) || ':' ||
             |                                CAST(user_id AS VARCHAR)), 1, 15))
             |           ::BIGINT % 64 AS bucket,
             |         CAST(sum(c) AS BIGINT) AS tot
             |  FROM cnt CROSS JOIN seeds GROUP BY 1, 2, 3
             |),
             |ip AS (
             |  SELECT x.event_type AS type_a, y.event_type AS type_b, x.seed,
             |         sum(x.tot * y.tot) AS dot
             |  FROM sk x JOIN sk y
             |    ON x.seed = y.seed AND x.bucket = y.bucket
             |   AND x.event_type < y.event_type
             |  GROUP BY 1, 2, 3
             |)
             |SELECT type_a, type_b, exact_size,
             |       CAST(min(dot) AS BIGINT) AS cms_est
             |FROM ex JOIN ip USING (type_a, type_b)
             |GROUP BY 1, 2, 3
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        def bucket(seed: org.apache.spark.sql.Column,
            key: org.apache.spark.sql.Column) =
          pmod(conv(substring(md5(concat(seed.cast("string"), lit(":"),
            key.cast("string"))), 1, 15), 16, 10).cast("long"), lit(64L))
        val cnt = t.events
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("c"))
        val ex = cnt.select(col("event_type").as("type_a"),
            col("user_id").as("ua"), col("c").as("ca"))
          .join(cnt.select(col("event_type").as("type_b"),
            col("user_id").as("ub"), col("c").as("cb")),
            col("ua") === col("ub") && col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(sum(col("ca") * col("cb")).as("exact_size"))
        val seeds = spark.range(0, 4).select(col("id").cast("int").as("seed"))
        val sk = cnt.crossJoin(broadcast(seeds))
          .groupBy(col("event_type"), col("seed"),
            bucket(col("seed"), col("user_id")).as("bucket"))
          .agg(sum(col("c")).as("tot"))
        val ip = sk.select(col("event_type").as("type_a"), col("seed"),
            col("bucket"), col("tot").as("ta"))
          .join(sk.select(col("event_type").as("type_b"),
            col("seed").as("s2"), col("bucket").as("b2"), col("tot").as("tb")),
            col("seed") === col("s2") && col("bucket") === col("b2") &&
              col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"), col("seed"))
          .agg(sum(col("ta") * col("tb")).as("dot"))
        ordered(
          ex.join(ip, Seq("type_a", "type_b"))
            .groupBy(col("type_a"), col("type_b"), col("exact_size"))
            .agg(min(col("dot")).as("cms_est")))
      }
    ),
    Q(
      "a14_chi2_independence",
      // PEARSON CHI-SQUARE INDEPENDENCE TEST on the lang × source
      // contingency table — the categorical-drift sibling of t16's PSI
      // and t17's KS: "is language distribution independent of source?"
      // is the first question asked when a crawl source goes stale.
      // Uses the algebraic identity chi2 = n·Σ o²/(r·c) − n, which
      // needs only the OBSERVED cells (empty cells contribute zero to
      // the sum), so the R×C grid is never materialized — at web scale
      // the cell relation rides the observed (lang, source) pairs, not
      // the cross product. Each per-cell rational o²/(r·c) is rounded
      // to 12 decimals and summed as DECIMAL (the d7_source_kl
      // discipline: order-independent exact decimal addition keeps the
      // float-sum's order sensitivity out of the hash); margins are
      // broadcast k-row relations. One corpus scan feeds all three
      // aggregates.
      Some("""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
             |      FROM documents GROUP BY 1, 2),
             |r AS (SELECT lang, CAST(count(*) AS BIGINT) AS r
             |      FROM documents GROUP BY 1),
             |c AS (SELECT source, CAST(count(*) AS BIGINT) AS c
             |      FROM documents GROUP BY 1),
             |s AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
             |         sum(CAST(round(o.o * o.o * 1.0 / (r.r * c.c), 12)
             |                  AS DECIMAL(28,12))) AS s
             |  FROM o JOIN r USING (lang) JOIN c USING (source)
             |)
             |SELECT (SELECT count(*) FROM r) - 1 AS dof_rows,
             |       (SELECT count(*) FROM c) - 1 AS dof_cols,
             |       s.n_cells,
             |       round(CAST(s.s AS DOUBLE) * nn.n - nn.n, 4) AS chi2
             |FROM s CROSS JOIN nn
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val d = t.documents.select(col("lang"), col("source"))
        val o = d.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
        val r = d.groupBy(col("lang")).agg(count(lit(1)).as("r"))
        val c = d.groupBy(col("source")).agg(count(lit(1)).as("c"))
        val nn = d.agg(count(lit(1)).as("n"))
        val s = o.join(broadcast(r), Seq("lang"))
          .join(broadcast(c), Seq("source"))
          .agg(count(lit(1)).as("n_cells"),
            // cast(... as double): expr-parsed 1.0 is DECIMAL and Spark's
            // decimal division truncates at scale 6; DuckDB divides as
            // DOUBLE — both engines must round the SAME double quotient
            sum(expr("cast(round(cast(o * o as double) / (r * c), 12) as decimal(28,12))"))
              .as("s"))
        val dofR = r.agg((count(lit(1)) - 1).as("dof_rows"))
        val dofC = c.agg((count(lit(1)) - 1).as("dof_cols"))
        ordered(
          dofR.crossJoin(broadcast(dofC)).crossJoin(broadcast(s))
            .crossJoin(broadcast(nn))
            .select(col("dof_rows"), col("dof_cols"), col("n_cells"),
              round(col("s").cast("double") * col("n") - col("n"), 4)
                .as("chi2")))
      }
    ),
    Q(
      "a15_theil_decomposition",
      // THEIL T INEQUALITY DECOMPOSITION of document length by source —
      // w13's Lorenz/Gini tells you HOW unequal the corpus is; Theil
      // tells you WHERE: T_total = Σ_g share_g·T_within_g + T_between
      // holds exactly (the property Gini lacks), so a corpus team can
      // attribute length inequality to "one source is internally wild"
      // vs "sources differ from each other". Per-row ln(x·n_g/S_g)
      // terms are rounded to 12 decimals and summed as DECIMAL (the
      // d7_source_kl discipline) weighted by the exact integer x;
      // between-group terms are one ln per source — k rows, no
      // summation-order hazard. 100 TB shape: one corpus scan feeds the
      // per-source (count, sum) margins and the weighted ln fold (both
      // map-side-partial hash aggregates keyed by source); the 1-row
      // grand totals broadcast onto the k-row source relation.
      Some("""WITH x AS (SELECT source, n_chars AS x FROM documents WHERE n_chars > 0),
             |g AS (SELECT source, CAST(count(*) AS BIGINT) AS ng,
             |             CAST(sum(x) AS BIGINT) AS sg
             |      FROM x GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS s FROM x),
             |w AS (
             |  SELECT x.source,
             |         sum(x.x * CAST(round(ln(x.x * 1.0 * g.ng / g.sg), 12)
             |                        AS DECIMAL(28,12))) AS num
             |  FROM x JOIN g USING (source) GROUP BY 1
             |)
             |SELECT g.source, g.ng AS n_docs, g.sg AS sum_chars,
             |       round(g.sg * 1.0 / tot.s, 6) AS share_chars,
             |       round(CAST(w.num AS DOUBLE) / g.sg, 6) AS theil_within,
             |       round((g.sg * 1.0 / tot.s) *
             |             ln(g.sg * 1.0 * tot.n / (g.ng * 1.0 * tot.s)), 6)
             |         AS between_term
             |FROM g JOIN w USING (source) CROSS JOIN tot
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val x = t.documents.filter(col("n_chars") > 0)
          .select(col("source"), col("n_chars").as("x"))
        val g = x.groupBy(col("source"))
          .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
        val tot = x.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        val w = x.join(broadcast(g), Seq("source"))
          .groupBy(col("source"))
          .agg(sum(col("x") *
            // cast(x as double): expr-parsed 1.0 is DECIMAL and Spark's
            // decimal division truncates at scale 6 (observed: the ln
            // argument planned as DecimalType(38,6)); DuckDB divides as
            // DOUBLE, so the double path is the shared semantics
            expr("cast(round(ln(cast(x as double) * ng / sg), 12) as decimal(28,12))"))
            .as("num"))
        ordered(
          g.join(broadcast(w), Seq("source")).crossJoin(broadcast(tot))
            .select(col("source"), col("ng").as("n_docs"),
              col("sg").as("sum_chars"),
              round(col("sg") * 1.0 / col("s"), 6).as("share_chars"),
              round(col("num").cast("double") / col("sg"), 6)
                .as("theil_within"),
              round((col("sg") * 1.0 / col("s")) *
                log(col("sg") * 1.0 * col("n") / (col("ng") * 1.0 * col("s"))),
                6).as("between_term")))
      }
    ),
    Q(
      "a16_hhi",
      // HERFINDAHL-HIRSCHMAN CONCENTRATION INDEX of corpus sources —
      // the one-number "is this corpus dominated by a few sources?"
      // governance metric (a15's Theil measures inequality of lengths;
      // HHI measures concentration of volume), with the effective
      // source count 1/HHI beside it — "20 sources behaving like 12".
      // Completely transcendental-free: HHI = Σ c_g² / n² is a ratio of
      // exact BIGINTs (token-weighted by characters), so unlike the
      // ln/sqrt family there is NOT ONE libm call — two rounded
      // divisions of exact integers end to end. 100 TB shape: one
      // corpus scan to the k-row per-source volume aggregate
      // (map-side partials), one k-row fold, a 1-row output.
      Some("""WITH g AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS c
             |           FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             |               CAST(count(*) AS BIGINT) AS n_sources,
             |               CAST(sum(c*c) AS BIGINT) AS scc,
             |               CAST(max(c) AS BIGINT) AS cmax
             |        FROM g)
             |SELECT n_sources, n AS total_chars,
             |       round(scc * 1.0 / n / n, 6) AS hhi,
             |       round(n * 1.0 * n / scc, 4) AS effective_sources,
             |       round(cmax * 1.0 / n, 6) AS top_share
             |FROM tot ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val g = t.documents.groupBy(col("source"))
          .agg(sum(col("n_chars")).as("c"))
        val tot = g.agg(sum(col("c")).as("n"), count(lit(1)).as("n_sources"),
          sum(col("c") * col("c")).as("scc"), max(col("c")).as("cmax"))
        ordered(
          tot.select(col("n_sources"), col("n").as("total_chars"),
            // two sequential divisions, never an n² BIGINT — n² overflows
            // int64 at real corpus scale while scc/n/n stays finite
            round(col("scc") * 1.0 / col("n") / col("n"), 6).as("hhi"),
            round(col("n") * 1.0 * col("n") / col("scc"), 4)
              .as("effective_sources"),
            round(col("cmax") * 1.0 / col("n"), 6).as("top_share")))
      }
    ),
    Q(
      "a17_mann_whitney",
      // MANN-WHITNEY U RANK-SUM TEST — the nonparametric two-sample
      // test completing the battery (t24 z-test assumes proportions,
      // t17 KS needs the full CDF; U asks only "does one group
      // stochastically dominate?"), here click vs purchase event
      // values. Engine-exact through ties without any float ranks: the
      // tie-averaged rank is rmin + (c−1)/2, so DOUBLED rank sums
      // 2·R_A = Σ(2·rmin + c − 1) stay pure BIGINT, 2·U follows as
      // 2R_A − n1(n1+1), and z = (2U − n1·n2)/√(n1·n2·(n+1)/3) costs
      // one sqrt + one rounded division (plain normal approximation,
      // no tie-variance correction — values are continuous doubles, so
      // ties are measure-zero; the exact 2U beside z keeps the check
      // honest either way). 100 TB shape: NO corpus-wide rank window —
      // the fact collapses first to a per-DISTINCT-VALUE aggregate
      // (map-side partials), rmin is a prefix sum over that reduced
      // relation (rmin = cum − c + 1), and the doubled click rank sum
      // folds per value as n1c·(2·cum − c + 1); one 1-row fold ends it.
      // Because the values are CONTINUOUS, the per-value aggregate is
      // still ~n rows — so the prefix sum itself is range-bucketed
      // (graft.functions.PrefixSum): GK boundary sketch, driver-held
      // exclusive offsets, cumulative window PARTITIONED by bucket —
      // never one empty-partition WindowExec task (the round-12 audit
      // finding); ScaleShapeSpec's tightened fence verifies the shape.
      Some("""WITH u AS (
             |  SELECT event_type, value FROM events
             |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
             |),
             |rk AS (
             |  SELECT event_type,
             |         rank() OVER (ORDER BY value) AS rmin,
             |         count(*) OVER (PARTITION BY value) AS c
             |  FROM u
             |),
             |s AS (
             |  SELECT CAST(sum(CASE WHEN event_type = 'click'
             |                       THEN 2*rmin + c - 1 ELSE 0 END) AS BIGINT) AS r2a,
             |         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
             |         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n2
             |  FROM rk
             |)
             |SELECT n1, n2, r2a - n1*(n1+1) AS u_times_2,
             |       round((r2a - n1*(n1+1) - n1*n2) /
             |             sqrt(CAST(n1*n2*(n1+n2+1) AS DOUBLE) / 3), 4) AS z
             |FROM s ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val u = t.events
          .filter(col("event_type").isin("click", "purchase") &&
            col("value").isNotNull)
          .select(col("event_type"), col("value"))
        // per-distinct-value counts first (map-side partials), THEN the
        // prefix sum over the reduced relation: rank(v) = cum(v) − c(v) + 1,
        // so Σ_click (2·rmin + c − 1) = Σ_v n1c(v)·(2·cum(v) − c(v) + 1).
        // The values are continuous doubles, so the per-value aggregate
        // barely shrinks the relation (ties are measure-zero) — the
        // prefix sum must NOT be one empty-partition window. PrefixSum
        // range-buckets by GK boundaries, holds the B exclusive offsets
        // on the driver, and runs the cumulative window partitioned by
        // bucket — the distributed-sort cost envelope, bit-identical to
        // the single-window spelling (PrefixSumSpec).
        val g = u.groupBy(col("value")).agg(
          count(lit(1)).as("c"),
          count(when(col("event_type") === "click", 1)).as("n1c"),
          count(when(col("event_type") === "purchase", 1)).as("n2c"))
        val cum = graft.functions.PrefixSum
          .cumOverDistinct(g, "value", "c", "cum")
        val s = cum.agg(
          sum(col("n1c") * (lit(2) * col("cum") - col("c") + 1)).as("r2a"),
          sum(col("n1c")).as("n1"),
          sum(col("n2c")).as("n2"))
        val u2 = col("r2a") - col("n1") * (col("n1") + 1)
        ordered(
          s.select(col("n1"), col("n2"), u2.as("u_times_2"),
            round((u2 - col("n1") * col("n2")) /
              sqrt((col("n1") * col("n2") * (col("n1") + col("n2") + 1))
                .cast("double") / 3), 4).as("z")))
      }
    ),
    Q(
      "a18_poisson_bootstrap",
      // POISSON BOOTSTRAP CONFIDENCE INTERVAL — the distributed
      // bootstrap (the only one that works at 100 TB): classic
      // resampling needs n draws WITH replacement per replicate — a
      // shuffle per replicate — but giving each row an independent
      // ~Poisson(1) weight per replicate is equivalent as n→∞ and needs
      // ONE scan: 50 weighted sums with map-side partials, no resample
      // shuffle ever. Weights are a DETERMINISTIC mean-exactly-1
      // quantized Poisson from the portable md5 family (buckets 0-15 →
      // {0:6, 1:5, 2:4, 3:1}/16), so both engines draw the identical
      // "random" weights; money values ride DECIMAL(18,2) so each
      // replicate's weighted sum is order-independent and exact, with
      // ONE double division per replicate. The CI is the exact order
      // statistic [3rd, 48th] of the 50 replicate means — no percentile
      // interpolation to disagree on. 100 TB shape: the explode is a
      // per-row ×50 Generate feeding one hash aggregate keyed by
      // replicate id; everything after is 50-row arithmetic.
      Some("""WITH v AS (
             |  SELECT event_id, CAST(value AS DECIMAL(18,2)) AS x
             |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
             |),
             |r AS (
             |  SELECT b, x,
             |         CASE WHEN h < 6 THEN 0 WHEN h < 11 THEN 1
             |              WHEN h < 15 THEN 2 ELSE 3 END AS w
             |  FROM (
             |    SELECT v.x, bs.b,
             |           (('0x' || substring(md5(v.event_id || ':' || bs.b), 1, 15))
             |             ::BIGINT % 16) AS h
             |    FROM v CROSS JOIN (SELECT unnest(range(0, 50)) AS b) bs
             |  )
             |),
             |m AS (SELECT b, sum(w * x) AS sx, CAST(sum(w) AS BIGINT) AS sw
             |      FROM r GROUP BY b),
             |means AS (SELECT b, CAST(sx AS DOUBLE) / sw AS mb FROM m WHERE sw > 0),
             |rk AS (SELECT mb, row_number() OVER (ORDER BY mb, b) AS rn FROM means),
             |ci AS (SELECT CAST(count(*) AS BIGINT) AS n_resamples,
             |              round(min(CASE WHEN rn = 3 THEN mb END), 4) AS ci_lo,
             |              round(min(CASE WHEN rn = 48 THEN mb END), 4) AS ci_hi
             |       FROM rk),
             |f AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |             round(CAST(sum(x) AS DOUBLE) / count(*), 4) AS mean_full
             |      FROM v)
             |SELECT f.n_rows, f.mean_full, ci.n_resamples, ci.ci_lo, ci.ci_hi
             |FROM f CROSS JOIN ci
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val v = t.events
          .filter(col("event_type") === "purchase" && col("value").isNotNull)
          .select(col("event_id"), col("value").cast("decimal(18,2)").as("x"))
        val h = pmod(conv(substring(md5(concat(col("event_id").cast("string"),
          lit(":"), col("b").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(16))
        val r = v.select(col("event_id"), col("x"),
            explode(sequence(lit(0), lit(49))).as("b"))
          .select(col("b"), col("x"),
            when(h < 6, 0).when(h < 11, 1).when(h < 15, 2).otherwise(3).as("w"))
        val m = r.groupBy(col("b"))
          .agg(sum(col("w") * col("x")).as("sx"), sum(col("w")).as("sw"))
        val means = m.filter(col("sw") > 0)
          .select(col("b"), (col("sx").cast("double") / col("sw")).as("mb"))
        val rk = means.select(col("mb"),
          row_number().over(Window.orderBy(col("mb"), col("b"))).as("rn"))
        val ci = rk.agg(count(lit(1)).as("n_resamples"),
          round(min(when(col("rn") === 3, col("mb"))), 4).as("ci_lo"),
          round(min(when(col("rn") === 48, col("mb"))), 4).as("ci_hi"))
        val f = v.agg(count(lit(1)).as("n_rows"),
          round(sum(col("x")).cast("double") / count(lit(1)), 4).as("mean_full"))
        ordered(
          f.crossJoin(broadcast(ci))
            .select(col("n_rows"), col("mean_full"), col("n_resamples"),
              col("ci_lo"), col("ci_hi")))
      }
    )
  )
}
