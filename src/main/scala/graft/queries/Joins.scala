package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Canon._
import graft.sources.Tables

/** The full join surface — SURVEY.md §2.3 (J1–J10).
  *
  * Strategy discipline for 100 TB: dimension tables (region, nation,
  * supplier, customer at this ratio) are explicitly `broadcast()`; the big
  * fact-fact joins (lineitem ⋈ orders) shuffle on their equi-keys and rely
  * on AQE for skew split; non-equi joins keep the small side broadcastable
  * so they plan as BroadcastNestedLoopJoin instead of a cartesian shuffle.
  */
object Joins {

  val all: Seq[Q] = Seq(
    Q(
      "j1_inner_equi",
      Some("""SELECT c.c_mktsegment, count(*) AS n_orders,
             CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total
             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             GROUP BY c.c_mktsegment ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .join(t.customer, t.orders("o_custkey") === t.customer("c_custkey"), "inner")
            .groupBy(col("c_mktsegment"))
            .agg(
              count(lit(1)).as("n_orders"),
              round(sum(col("o_totalprice").cast("decimal(18,2)")), 4).cast("double").as("total")
            )
        )
      }
    ),
    Q(
      "j2_broadcast_dims",
      Some("""SELECT r.r_name, n.n_name, count(*) AS n_cust
             FROM customer c
             JOIN nation n ON c.c_nationkey = n.n_nationkey
             JOIN region r ON n.n_regionkey = r.r_regionkey
             GROUP BY r.r_name, n.n_name ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.customer
            .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
            .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
            .groupBy(col("r_name"), col("n_name"))
            .agg(count(lit(1)).as("n_cust"))
        )
      }
    ),
    Q(
      "j3_left_outer",
      Some("""SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
             FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             GROUP BY c.c_custkey ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.customer
            .join(t.orders, t.orders("o_custkey") === t.customer("c_custkey"), "left_outer")
            .groupBy(col("c_custkey"))
            .agg(count(col("o_orderkey")).as("n_orders"))
        )
      }
    ),
    Q(
      "j3_full_outer",
      Some("""SELECT COALESCE(a.k, b.k) AS k, a.n_c AS n_cust, b.n_s AS n_supp FROM
               (SELECT c_nationkey AS k, count(*) AS n_c FROM customer GROUP BY 1) a
               FULL OUTER JOIN
               (SELECT s_nationkey AS k, count(*) AS n_s FROM supplier WHERE s_nationkey < 10 GROUP BY 1) b
               ON a.k = b.k
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val a = t.customer.groupBy(col("c_nationkey").as("ka")).agg(count(lit(1)).as("n_cust"))
        val b = t.supplier.filter(col("s_nationkey") < 10)
          .groupBy(col("s_nationkey").as("kb")).agg(count(lit(1)).as("n_supp"))
        ordered(
          a.join(b, a("ka") === b("kb"), "full_outer")
            .select(coalesce(col("ka"), col("kb")).as("k"), col("n_cust"), col("n_supp"))
        )
      }
    ),
    Q(
      "j3_right_outer",
      // right outer: every supplier nation row survives, customer side
      // nullable — completes the J3 left/right/full triad
      Some("""SELECT b.k, a.n_c AS n_cust FROM
               (SELECT c_nationkey AS k, count(*) AS n_c FROM customer
                WHERE c_nationkey < 10 GROUP BY 1) a
               RIGHT OUTER JOIN
               (SELECT s_nationkey AS k, count(*) AS n_s FROM supplier GROUP BY 1) b
               ON a.k = b.k
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val a = t.customer.filter(col("c_nationkey") < 10)
          .groupBy(col("c_nationkey").as("ka")).agg(count(lit(1)).as("n_cust"))
        val b = t.supplier.groupBy(col("s_nationkey").as("k")).agg(count(lit(1)).as("n_s"))
        ordered(
          a.join(b, a("ka") === b("k"), "right_outer")
            .select(col("k"), col("n_cust"))
        )
      }
    ),
    Q(
      "j4_left_semi",
      Some("""SELECT c_custkey, c_name FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val big = t.orders.filter(col("o_totalprice") > 400000.0)
        ordered(
          t.customer
            .join(big, t.customer("c_custkey") === big("o_custkey"), "left_semi")
            .select(col("c_custkey"), col("c_name"))
        )
      }
    ),
    Q(
      "j5_left_anti",
      Some("""SELECT c_custkey, c_name FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val big = t.orders.filter(col("o_totalprice") > 350000.0)
        ordered(
          t.customer
            .join(big, t.customer("c_custkey") === big("o_custkey"), "left_anti")
            .select(col("c_custkey"), col("c_name"))
        )
      }
    ),
    Q(
      "j6_cross",
      Some("""SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(t.region.crossJoin(t.nation).select(col("r_name"), col("n_name")))
      }
    ),
    Q(
      "j7_theta_range",
      // pure non-equi: plans as BroadcastNestedLoopJoin (both sides tiny;
      // at scale the small side must stay broadcastable)
      Some("""SELECT n.n_name, r.r_name FROM nation n JOIN region r
             ON n.n_regionkey < r.r_regionkey
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.nation
            .join(broadcast(t.region), col("n_regionkey") < col("r_regionkey"))
            .select(col("n_name"), col("r_name"))
        )
      }
    ),
    Q(
      "j8_asof",
      // As-of join: for each purchase, the latest error by the same user at
      // ts <= purchase ts. Union + last(ignoreNulls) over an event-time
      // window — one shuffle on user_id, no range explosion. SURVEY §2.3 J8.
      Some("""WITH u AS (
               SELECT user_id, ts, event_id, NULL::BIGINT AS err_id, 0 AS is_q
               FROM events WHERE event_type = 'error'
               UNION ALL
               SELECT user_id, ts, NULL::BIGINT, NULL::BIGINT, 1
               FROM events WHERE event_type = 'purchase'
             ), m AS (
               SELECT user_id, ts, is_q,
                 last_value(CASE WHEN is_q = 0 THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, is_q, event_id ASC NULLS LAST
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_id
               FROM u
             )
             SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, last_error_id
             FROM m WHERE is_q = 1 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val ev = t.events
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(null).cast("long").as("err_id"), lit(0).as("is_q"))
        val queries = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
            lit(null).cast("long").as("err_id"), lit(1).as("is_q"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_q"), col("event_id").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val merged = errors.unionByName(queries)
          .withColumn("last_error_id",
            last(when(col("is_q") === 0, col("event_id")), ignoreNulls = true).over(w))
        ordered(
          merged.filter(col("is_q") === 1)
            .select(col("user_id"), tstr(col("ts")).as("ts_s"), col("last_error_id"))
        )
      }
    ),
    Q(
      "j8_asof_nearest",
      // As-of join, NEAREST direction (pandas merge_asof direction=
      // 'nearest'): for each purchase, the error by the same user with
      // the smallest |Δt| on EITHER side, ties preferring the backward
      // match. Same union + event-time-window shape as j8 run in both
      // directions — one shuffle on user_id total, the forward pass is
      // the mirrored frame over the SAME sorted partition, no second
      // exchange (the sort order serves both frames). Δt compares in
      // exact integer microseconds (unix_micros/epoch_us), never float
      // seconds. Frame boundaries pin the tie semantics: equal-ts
      // errors sort before the purchase row, so they are backward
      // matches (Δt = 0), and the forward frame is strictly after.
      Some("""WITH u AS (
               SELECT user_id, ts, event_id, 0 AS is_q
               FROM events WHERE event_type = 'error'
               UNION ALL
               SELECT user_id, ts, NULL::BIGINT, 1
               FROM events WHERE event_type = 'purchase'
             ), m AS (
               SELECT user_id, ts, is_q,
                 last_value(CASE WHEN is_q = 0 THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, is_q, event_id ASC NULLS LAST
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_id,
                 last_value(CASE WHEN is_q = 0 THEN epoch_us(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, is_q, event_id ASC NULLS LAST
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_us,
                 first_value(CASE WHEN is_q = 0 THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, is_q, event_id ASC NULLS LAST
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_id,
                 first_value(CASE WHEN is_q = 0 THEN epoch_us(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, is_q, event_id ASC NULLS LAST
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_us
               FROM u
             )
             SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               CASE WHEN back_id IS NULL AND fwd_id IS NULL THEN NULL
                    WHEN fwd_id IS NULL THEN back_id
                    WHEN back_id IS NULL THEN fwd_id
                    WHEN epoch_us(ts) - back_us <= fwd_us - epoch_us(ts) THEN back_id
                    ELSE fwd_id END AS nearest_error_id,
               CASE WHEN back_id IS NULL AND fwd_id IS NULL THEN NULL
                    WHEN fwd_id IS NULL THEN 'b'
                    WHEN back_id IS NULL THEN 'f'
                    WHEN epoch_us(ts) - back_us <= fwd_us - epoch_us(ts) THEN 'b'
                    ELSE 'f' END AS direction
             FROM m WHERE is_q = 1 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val ev = t.events
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_q"))
        val queries = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
            lit(1).as("is_q"))
        val ord = Seq(col("ts"), col("is_q"), col("event_id").asc_nulls_last)
        val wb = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy(col("user_id")).orderBy(ord: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val errId = when(col("is_q") === 0, col("event_id"))
        val errUs = when(col("is_q") === 0, unix_micros(col("ts")))
        val m = errors.unionByName(queries)
          .withColumn("back_id", last(errId, ignoreNulls = true).over(wb))
          .withColumn("back_us", last(errUs, ignoreNulls = true).over(wb))
          .withColumn("fwd_id", first(errId, ignoreNulls = true).over(wf))
          .withColumn("fwd_us", first(errUs, ignoreNulls = true).over(wf))
        val pUs = unix_micros(col("ts"))
        val backWins = pUs - col("back_us") <= col("fwd_us") - pUs
        ordered(
          m.filter(col("is_q") === 1)
            .select(col("user_id"), tstr(col("ts")).as("ts_s"),
              when(col("back_id").isNull && col("fwd_id").isNull, lit(null).cast("long"))
                .when(col("fwd_id").isNull, col("back_id"))
                .when(col("back_id").isNull, col("fwd_id"))
                .when(backWins, col("back_id"))
                .otherwise(col("fwd_id")).as("nearest_error_id"),
              when(col("back_id").isNull && col("fwd_id").isNull, lit(null).cast("string"))
                .when(col("fwd_id").isNull, lit("b"))
                .when(col("back_id").isNull, lit("f"))
                .when(backWins, lit("b"))
                .otherwise(lit("f")).as("direction"))
        )
      }
    ),
    Q(
      "j15_rel_division",
      // Relational DIVISION — the classic operator the basic algebra
      // can't express directly ("users who did EVERY event type"):
      // implemented as the count-distinct reformulation, one hash
      // aggregate per user compared against the 1-row universe size —
      // never the naive double-NOT-EXISTS correlated scan. 100 TB
      // shape: per-user distinct ride a (user_id, type) dedup with
      // map-side partials; the universe count is a broadcast scalar.
      Some("""WITH uni AS (SELECT count(DISTINCT event_type) AS nt FROM events),
             |per AS (
             |  SELECT user_id, count(DISTINCT event_type) AS nt_user
             |  FROM events GROUP BY 1
             |)
             |SELECT p.user_id, p.nt_user
             |FROM per p CROSS JOIN uni u
             |WHERE p.nt_user = u.nt
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val uni = t.events.agg(countDistinct(col("event_type")).as("nt"))
        val per = t.events.groupBy(col("user_id"))
          .agg(countDistinct(col("event_type")).as("nt_user"))
        ordered(
          per.crossJoin(broadcast(uni))
            .filter(col("nt_user") === col("nt"))
            .select(col("user_id"), col("nt_user")))
      }
    ),
    Q(
      "j9_interval_overlap",
      // interval-overlap join: order "activity windows" overlapping a fixed
      // probe window; conjunctive range predicate on a broadcast side
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d
             FROM orders
             WHERE o_orderdate < TIMESTAMP '1995-03-01 00:00:00' + INTERVAL 30 DAY
               AND o_orderdate + INTERVAL 7 DAY > TIMESTAMP '1995-03-01 00:00:00'
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val probeLo = to_timestamp(lit("1995-03-01 00:00:00"))
        ordered(
          t.orders
            .filter(
              col("o_orderdate") < probeLo + expr("INTERVAL 30 DAYS") &&
                col("o_orderdate") + expr("INTERVAL 7 DAYS") > probeLo
            )
            .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        )
      }
    ),
    Q(
      "j17_interval_bucket_join",
      // SCALABLE interval-overlap join — the scale path for J9's theta
      // join (which plans as a nested loop and is fenced to small sides):
      // both interval sets explode to fixed-width CELLS (width = the max
      // interval length, so each side covers <= 2 cells), the join is a
      // hash EQUI-join on the cell, each overlapping pair is counted
      // exactly once by keeping only the cell containing the overlap's
      // start (max of the two starts — provably covered by both sides),
      // and the original overlap predicate stays as a residual filter so
      // correctness never depends on the bucket math. Urgent order
      // windows [d, d+7) of a customer slice vs low-priority windows
      // [d, d+3): per urgent window, how many low windows overlap.
      // Hash-matching DuckDB's DIRECT theta-join oracle proves the
      // bucketing lossless. 100 TB shape: candidates ride cell occupancy
      // (active intervals per week), never |A|x|B|; the left join back
      // zero-fills urgent windows with no overlaps.
      Some("""WITH a AS (
             |  SELECT o_orderkey AS a_id,
             |         epoch_us(o_orderdate) // 86400000000 AS a_s,
             |         epoch_us(o_orderdate) // 86400000000 + 7 AS a_e
             |  FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_custkey % 100 = 0
             |),
             |b AS (
             |  SELECT o_orderkey AS b_id,
             |         epoch_us(o_orderdate) // 86400000000 AS b_s,
             |         epoch_us(o_orderdate) // 86400000000 + 3 AS b_e
             |  FROM orders
             |  WHERE o_orderpriority = '5-LOW'
             |)
             |SELECT a.a_id, CAST(count(b.b_id) AS BIGINT) AS n_overlap,
             |       coalesce(min(b.b_id), CAST(-1 AS BIGINT)) AS first_b
             |FROM a LEFT JOIN b ON a.a_s < b.b_e AND b.b_s < a.a_e
             |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = 7L // cell width = max interval length => <= 2 cells/side
        // NTZ -> LTZ cast is a relabel under the pinned UTC session zone
        val day = expr("unix_micros(cast(o_orderdate as timestamp)) DIV 86400000000")
        val a = t.orders
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_custkey") % 100 === 0)
          .select(col("o_orderkey").as("a_id"), day.as("a_s"), (day + 7).as("a_e"))
        val b = t.orders
          .filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_orderkey").as("b_id"), day.as("b_s"), (day + 3).as("b_e"))
        def cells(s: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
          explode(sequence(floor(s / w).cast("long"), floor((e - 1) / w).cast("long")))
        val ax = a.select(col("a_id"), col("a_s"), col("a_e"),
          cells(col("a_s"), col("a_e")).as("cell"))
        val bx = b.select(col("b_id"), col("b_s"), col("b_e"),
          cells(col("b_s"), col("b_e")).as("cell"))
        val pairs = ax.join(bx, Seq("cell"))
          // dedup: only the cell holding the overlap start emits the pair
          .filter(col("cell") === floor(greatest(col("a_s"), col("b_s")) / w).cast("long"))
          // residual: the REAL overlap predicate — bucket math is only a prefilter
          .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
          .groupBy(col("a_id"))
          .agg(count(col("b_id")).as("n_overlap"), min(col("b_id")).as("mb"))
        ordered(
          a.select(col("a_id")).join(pairs, Seq("a_id"), "left")
            .select(col("a_id"),
              coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
              coalesce(col("mb"), lit(-1L)).as("first_b")))
      }
    ),
    Q(
      "j10_self_join_pairs",
      // near-dup-pair shape: same-key self-join, a.id < b.id kills mirrors
      Some("""SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2
             FROM orders a JOIN orders b
               ON a.o_custkey = b.o_custkey
              AND a.o_orderdate = b.o_orderdate
              AND a.o_orderkey < b.o_orderkey
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val a = t.orders.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")).alias("a")
        val b = t.orders.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")).alias("b")
        ordered(
          a.join(
              b,
              col("a.o_custkey") === col("b.o_custkey") &&
                col("a.o_orderdate") === col("b.o_orderdate") &&
                col("a.o_orderkey") < col("b.o_orderkey")
            )
            .select(
              col("a.o_custkey").as("custkey"),
              col("a.o_orderkey").as("k1"),
              col("b.o_orderkey").as("k2")
            )
        )
      }
    ),
    Q(
      "j11_salted_skew_join",
      // Salted equi-join (J11): the MANUAL skew remedy for when AQE's
      // runtime skew split can't help (e.g. a first-stage shuffle whose
      // skew is known up front, or a non-AQE engine). Result is
      // IDENTICAL to the plain join — the oracle runs the unsalted SQL —
      // but the physical join key is (key, salt), so one hot key's rows
      // spread over `salts` reducers instead of melting one. The salt is
      // deterministic per fact row (hash of the row's own line id), and
      // the dim side replicates `salts`× via explode — dim replication
      // is the price, bounded by salts × |dim|.
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                 * (1 - CAST(l_discount AS DECIMAL(8,2)))), 4)
             |       AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          graft.functions.SkewJoin.saltedInnerJoin(
              t.lineitem,
              t.orders.select(col("o_orderkey").as("l_orderkey"),
                col("o_orderpriority")),
              key = "l_orderkey",
              leftSaltSource = struct(col("l_orderkey"), col("l_linenumber")),
              buckets = 8)
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n"),
              round(sum(col("l_extendedprice").cast("decimal(18,2)") *
                (lit(1) - col("l_discount").cast("decimal(8,2)"))), 4)
                .cast("double").as("revenue"))
        )
      }
    ),
    Q(
      "j12_bloom_join_reduction",
      // Bloom-filter SEMI-JOIN REDUCTION — the canonical big-big join
      // valve at 100 TB: a selective predicate keeps ~3% of orders, so the
      // fact side is pre-filtered by a Bloom filter of the selected keys
      // BEFORE it ever reaches the join shuffle. The filter folds to 512
      // longs (4 KB — fixed size no matter how big the build side grows)
      // collected once and inlined as an array literal, so the probe is a
      // pure per-row xxhash64 expression inside the fact scan's codegen
      // stage — no second join, no broadcast relation, nothing new on the
      // shuffle. No false negatives means the exact join downstream
      // removes the ~5% false positives and the result is IDENTICAL to
      // the plain join — which is exactly what the oracle checks. The
      // shuffle_hash hint depicts the intended big-big plan (at real
      // scale neither side broadcasts).
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 4)
             |       AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995
             |GROUP BY l_returnflag
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val sel = t.orders.filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1995)
        ordered(
          t.lineitem
            .filter(graft.functions.BloomLite.mightContain(
              graft.functions.BloomLite.build(
                sel.select(col("o_orderkey")), "o_orderkey"),
              col("l_orderkey")))
            .join(sel.select(col("o_orderkey")).hint("shuffle_hash"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("l_returnflag"))
            .agg(count(lit(1)).as("n_rows"),
              round(sum(col("l_extendedprice").cast("decimal(18,2)")), 4)
                .cast("double").as("revenue"))
        )
      }
    ),
    Q(
      "j13_jw_blocked_er",
      // Blocked entity resolution with the native Jaro-Winkler expression
      // (graft.plans.JaroWinkler — the fuzzy-name metric Spark lacks;
      // DuckDB's built-in jaro_winkler_similarity is the oracle, so the
      // hash-match proves numeric identity of the whole algorithm:
      // match window, integer half-transpositions, 0.7-gated prefix
      // boost). Candidates are BLOCKED on the name's first token — the
      // classic ER move that keeps the quadratic term confined to
      // same-block pairs instead of the full cross product; the metric
      // runs inside whole-stage codegen (static-call shape, like Spark's
      // own levenshtein). Threshold compares the ROUNDED score so a
      // last-ulp disagreement cannot flip a borderline row.
      Some("""WITH names AS (SELECT DISTINCT p_name AS name FROM part),
             |cand AS (
             |  SELECT a.name AS name_a, b.name AS name_b
             |  FROM names a JOIN names b
             |    ON string_split(a.name, ' ')[1] = string_split(b.name, ' ')[1]
             |   AND a.name < b.name
             |)
             |SELECT name_a, name_b,
             |       round(jaro_winkler_similarity(name_a, name_b), 4) AS jw
             |FROM cand
             |WHERE round(jaro_winkler_similarity(name_a, name_b), 4) >= 0.88
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val names = t.part.select(col("p_name").as("name")).distinct()
          .withColumn("blk", split(col("name"), " ").getItem(0))
        ordered(
          names.as("a")
            .join(names.as("b"),
              col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
            .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
              round(graft.functions.Text.jaroWinkler(col("a.name"), col("b.name")), 4)
                .as("jw"))
            .filter(col("jw") >= 0.88)
        )
      }
    ),
    Q(
      "j16_band_join",
      // EPSILON-BAND JOIN as a quantized EQUI-join — the scalable plan for
      // |a.v - b.v| <= eps similarity joins (sensor alignment, price
      // matching, numeric blocking): bucket both sides by floor(v/eps) and
      // have the probe side fan out to its 5 surrounding buckets, turning
      // the range predicate into a hash join + residual filter. The
      // hash-match against DuckDB's native range join (IEJoin) proves the
      // quantization LOSSLESS — +/-2 buckets absorbs any IEEE edge of the
      // separately-computed quotients at band boundaries. 100 TB shape:
      // candidates ride bucket occupancy (n·k/buckets), never the n·m
      // cross product; the probe side is the small relation by
      // construction and its 5x fan-out is free.
      Some("""SELECT p.event_id AS probe_id, t.event_id AS match_id,
             |       round(abs(p.value - t.value), 4) AS dv
             |FROM (SELECT event_id, value FROM events WHERE event_id % 997 = 0) p
             |JOIN events t
             |  ON t.event_id <> p.event_id
             | AND abs(p.value - t.value) <= 0.05
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val eps = 0.05
        val ev = t.events.select(col("event_id"), col("value"))
        val targets = ev.select(col("event_id").as("match_id"),
          col("value").as("tv"),
          floor(col("value") / eps).cast("long").as("bkt"))
        val probes = ev.filter(col("event_id") % 997 === 0)
          .select(col("event_id").as("probe_id"), col("value").as("pv"),
            explode(sequence(
              floor(col("value") / eps).cast("long") - 2,
              floor(col("value") / eps).cast("long") + 2)).as("bkt"))
        ordered(
          probes.join(targets, "bkt")
            .filter(col("probe_id") =!= col("match_id") &&
              abs(col("pv") - col("tv")) <= eps)
            .select(col("probe_id"), col("match_id"),
              r4(abs(col("pv") - col("tv"))).as("dv")))
      }
    ),
    Q(
      "j16_band_join_auto",
      // the SAME band join written NAIVELY — a bare abs-distance
      // predicate that would plan as BroadcastNestedLoopJoin — relying on
      // [[graft.plans.BandJoinRewrite]] (injected via GraftExtensions) to
      // derive the quantized equi-join automatically. Hash-matching the
      // identical DuckDB oracle as the hand-written j16_band_join proves
      // the optimizer rule is semantics-preserving end-to-end;
      // ScaleShapeSpec's no-cartesian sweep proves the nested loop is
      // actually gone from the executed plan.
      Some("""SELECT p.event_id AS probe_id, t.event_id AS match_id,
             |       round(abs(p.value - t.value), 4) AS dv
             |FROM (SELECT event_id, value FROM events WHERE event_id % 997 = 0) p
             |JOIN events t
             |  ON t.event_id <> p.event_id
             | AND abs(p.value - t.value) <= 0.05
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val ev = t.events.select(col("event_id"), col("value"))
        val probes = ev.filter(col("event_id") % 997 === 0)
          .select(col("event_id").as("probe_id"), col("value").as("pv"))
        val targets = ev.select(col("event_id").as("match_id"),
          col("value").as("tv"))
        ordered(
          probes.join(targets,
              col("probe_id") =!= col("match_id") &&
                abs(col("pv") - col("tv")) <= 0.05)
            .select(col("probe_id"), col("match_id"),
              r4(abs(col("pv") - col("tv"))).as("dv")))
      }
    ),
    Q(
      "j14_bucketed_colocated",
      // Bucketed co-located join — the shuffle-ELISION path for the
      // repeated fact-to-fact join a warehouse runs daily. Both sides are
      // written once as bucketed+sorted external tables (8 buckets on the
      // join key); Spark's bucketing metadata then satisfies the join's
      // distribution requirement outright, so the SortMergeJoin plans with
      // ZERO Exchange on either side (asserted in ScaleShapeSpec) — at
      // 100 TB that turns the dominant nightly shuffle into a bucket-wise
      // local merge, and the bucket count (picked per cluster: ~2-3x
      // cores) caps task count independent of file count. The merge hint
      // pins SMJ so the evidence doesn't silently degrade to a broadcast.
      // Hash-matching the plain-join oracle proves the bucketed write +
      // bucket-pruned read path loses nothing.
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |         AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val base = java.nio.file.Paths
          .get(System.getProperty("java.io.tmpdir"), "graft_bucketed")
          .toString
        t.orders.select(col("o_custkey"), col("o_totalprice"))
          .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$base/orders_b").saveAsTable("graft_orders_b")
        t.customer.select(col("c_custkey"), col("c_mktsegment"))
          .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$base/customer_b").saveAsTable("graft_customer_b")
        val j = spark.table("graft_orders_b").hint("merge")
          .join(spark.table("graft_customer_b"),
            col("o_custkey") === col("c_custkey"))
        ordered(
          j.groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n_orders"),
              sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
                .as("revenue")))
      }
    ),
    Q(
      "j19_grid_spatial_join",
      // SPATIAL GRID JOIN — all point pairs within euclidean radius r,
      // the geo twin of the band/interval joins: bucket the plane into
      // r-sized cells, explode ONE side to its 3x3 cell neighborhood
      // (any pair within r sits in adjacent cells), hash equi-join on the
      // cell, keep the EXACT integer squared-distance predicate as a
      // residual. Candidates ride cell occupancy, never |A|x|B|; each
      // qualifying pair is found exactly once because the probe side
      // keys by its OWN cell, which is unique. Coordinates are synthesized
      // integers, so dist² is exact in both engines; the oracle runs the
      // direct theta join — hash equality proves the 3x3 bucketing
      // lossless. 100 TB shape: two scans + one equi-join shuffle on the
      // cell key; skewed cells (urban hotspots) split by AQE like any
      // hash join.
      Some("""WITH p AS (
             |  SELECT event_id AS id, (event_id * 37) % 1200 AS x,
             |         (event_id * 91 + 13) % 1200 AS y
             |  FROM events WHERE event_id % 73 = 0
             |)
             |SELECT a.id AS id1, b.id AS id2,
             |       CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT)
             |         AS dist_sq
             |FROM p a JOIN p b
             |  ON a.id < b.id
             | AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 40000
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val pts = t.events
          .filter(col("event_id") % 73 === 0)
          .select(col("event_id").as("id"),
            (col("event_id") * 37 % 1200).as("x"),
            ((col("event_id") * 91 + 13) % 1200).as("y"))
        // cell size = r = 200: a pair within r spans adjacent cells only
        val probe = pts.select(col("id").as("id2"), col("x").as("x2"),
          col("y").as("y2"), expr("x DIV 200").as("cx"), expr("y DIV 200").as("cy"))
        val build = pts
          .select(col("id").as("id1"), col("x").as("x1"), col("y").as("y1"),
            explode(expr(
              """flatten(transform(sequence(-1, 1), dx ->
                |  transform(sequence(-1, 1), dy ->
                |    struct(x DIV 200 + dx AS cx, y DIV 200 + dy AS cy))))"""
                .stripMargin)).as("cell"))
          .select(col("id1"), col("x1"), col("y1"),
            col("cell.cx").as("cx"), col("cell.cy").as("cy"))
        val d2 = (col("x1") - col("x2")) * (col("x1") - col("x2")) +
          (col("y1") - col("y2")) * (col("y1") - col("y2"))
        ordered(
          build.join(probe, Seq("cx", "cy"))
            .filter(col("id1") < col("id2") && d2 <= 40000)
            .select(col("id1"), col("id2"), d2.cast("long").as("dist_sq")))
      }
    ),
    Q(
      "j21_nearest_within_r",
      // NEAREST-NEIGHBOR JOIN (k=1, radius-bounded) on the j19 grid
      // backbone: for every point, its closest other point within r —
      // the spatial argmin a record-linkage or sensor-fusion pipeline
      // runs after blocking. Same 3x3 cell equi-join; the per-point
      // winner is ONE hash aggregate via min(struct(dist², id)) — minimum
      // distance, smallest id on ties — never a per-point sort. The
      // oracle packs the same argmin as dist²·10⁶ + id over the direct
      // theta join, so hash equality pins both the candidate set and the
      // tiebreak. Points with no neighbor within r drop out (radius-
      // bounded semantics). 100 TB shape: identical to j19 plus one
      // map-side-partial aggregate on the point id.
      Some("""WITH p AS (
             |  SELECT event_id AS id, (event_id * 37) % 1200 AS x,
             |         (event_id * 91 + 13) % 1200 AS y
             |  FROM events WHERE event_id % 73 = 0
             |),
             |pairs AS (
             |  SELECT a.id AS id1, b.id AS id2,
             |         (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
             |  FROM p a JOIN p b
             |    ON a.id <> b.id
             |   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 40000
             |),
             |best AS (SELECT id1, min(d2 * 1000000 + id2) AS pk
             |         FROM pairs GROUP BY 1)
             |SELECT id1 AS id, CAST(pk % 1000000 AS BIGINT) AS nearest_id,
             |       CAST(pk // 1000000 AS BIGINT) AS dist_sq
             |FROM best ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val pts = t.events
          .filter(col("event_id") % 73 === 0)
          .select(col("event_id").as("id"),
            (col("event_id") * 37 % 1200).as("x"),
            ((col("event_id") * 91 + 13) % 1200).as("y"))
        val probe = pts.select(col("id").as("id2"), col("x").as("x2"),
          col("y").as("y2"), expr("x DIV 200").as("cx"), expr("y DIV 200").as("cy"))
        val build = pts
          .select(col("id").as("id1"), col("x").as("x1"), col("y").as("y1"),
            explode(expr(
              """flatten(transform(sequence(-1, 1), dx ->
                |  transform(sequence(-1, 1), dy ->
                |    struct(x DIV 200 + dx AS cx, y DIV 200 + dy AS cy))))"""
                .stripMargin)).as("cell"))
          .select(col("id1"), col("x1"), col("y1"),
            col("cell.cx").as("cx"), col("cell.cy").as("cy"))
        val d2 = (col("x1") - col("x2")) * (col("x1") - col("x2")) +
          (col("y1") - col("y2")) * (col("y1") - col("y2"))
        ordered(
          build.join(probe, Seq("cx", "cy"))
            .filter(col("id1") =!= col("id2") && d2 <= 40000)
            .select(col("id1"), col("id2"), d2.as("d2"))
            .groupBy(col("id1").as("id"))
            .agg(min(struct(col("d2"), col("id2"))).as("w"))
            .select(col("id"), col("w.id2").cast("long").as("nearest_id"),
              col("w.d2").cast("long").as("dist_sq")))
      }
    ),
    Q(
      "j19_grid_auto",
      // The NAIVE spelling of j19: a plain theta join on the squared
      // radius — written the way a user would write it, relying on
      // [[graft.plans.SpatialJoinRewrite]] (injected via GraftExtensions)
      // to derive the 3x3 grid-cell equi-join automatically. Hash-matching
      // the identical DuckDB oracle as the hand-written j19 proves the
      // optimizer rule semantics-preserving end-to-end; ScaleShapeSpec
      // asserts the nested loop is actually gone from the executed plan.
      Some("""WITH p AS (
             |  SELECT event_id AS id, (event_id * 37) % 1200 AS x,
             |         (event_id * 91 + 13) % 1200 AS y
             |  FROM events WHERE event_id % 73 = 0
             |)
             |SELECT a.id AS id1, b.id AS id2,
             |       CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT)
             |         AS dist_sq
             |FROM p a JOIN p b
             |  ON a.id < b.id
             | AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 40000
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val pts = t.events
          .filter(col("event_id") % 73 === 0)
          .select(col("event_id").as("id"),
            (col("event_id") * 37 % 1200).as("x"),
            ((col("event_id") * 91 + 13) % 1200).as("y"))
        val a = pts.select(col("id").as("id1"), col("x").as("x1"),
          col("y").as("y1"))
        val b = pts.select(col("id").as("id2"), col("x").as("x2"),
          col("y").as("y2"))
        val d2 = (col("x1") - col("x2")) * (col("x1") - col("x2")) +
          (col("y1") - col("y2")) * (col("y1") - col("y2"))
        ordered(
          a.join(b, col("id1") < col("id2") && d2 <= 40000)
            .select(col("id1"), col("id2"), d2.cast("long").as("dist_sq")))
      }
    ),
    Q(
      "s18_cbo_broadcast",
      // SKETCH-DRIVEN JOIN STRATEGY, broadcast leg — the s18 CMS join-size
      // estimate promoted to an actual plan decision ([[SketchCbo.plan]]):
      // one sketch pass per side, then the driver picks
      // broadcast/salt/shuffle from the cell arithmetic. Here the sketch
      // sees supplier's tiny row count and must choose `broadcast`; the
      // require() pins the decision inside the hash-checked query, and
      // ScaleShapeSpec proves the hint (not Spark's size estimate) plants
      // the BroadcastHashJoin by re-planning with autoBroadcast disabled.
      // The oracle is the PLAIN join — the strategy may never change rows.
      Some("""SELECT s.s_nationkey, count(*) AS n_items,
             |CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE) AS total_qty
             |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |GROUP BY s.s_nationkey ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val planned = graft.plans.SketchCbo.plan(
          t.lineitem.withColumnRenamed("l_suppkey", "suppkey"),
          t.supplier.withColumnRenamed("s_suppkey", "suppkey"),
          "suppkey")
        require(planned.est.strategy == "broadcast",
          s"CBO mis-planned the dim join: ${planned.est}")
        ordered(
          planned.df
            .groupBy(col("s_nationkey"))
            .agg(count(lit(1)).as("n_items"),
              round(sum(col("l_quantity").cast("decimal(18,2)")), 4)
                .cast("double").as("total_qty")))
      }
    ),
    Q(
      "s18_cbo_shuffle",
      // SKETCH-DRIVEN JOIN STRATEGY, shuffle leg: with the broadcast row
      // budget turned down (the deployment dial a real cluster sets from
      // executor memory), neither lineitem nor orders qualifies and the
      // CMS output estimate (~|lineitem|, each item matches exactly one
      // order) stays under the salt fan-out — the sketch must pick the
      // honest big⋈big shuffle (SMJ under AQE). Same result contract:
      // the oracle is the plain join, so all three strategies hash alike.
      Some("""SELECT o.o_orderpriority, count(*) AS n_items,
             |CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total_price
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |GROUP BY o.o_orderpriority ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val planned = graft.plans.SketchCbo.plan(
          t.lineitem.withColumnRenamed("l_orderkey", "orderkey"),
          t.orders.withColumnRenamed("o_orderkey", "orderkey"),
          "orderkey",
          broadcastRowLimit = 1000)
        require(planned.est.strategy == "shuffle",
          s"CBO mis-planned the fact-fact join: ${planned.est}")
        ordered(
          planned.df
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n_items"),
              round(sum(col("l_extendedprice").cast("decimal(18,2)")), 4)
                .cast("double").as("total_price")))
      }
    ),
    Q(
      "s18_cbo_salt",
      // SKETCH-DRIVEN JOIN STRATEGY, salt leg — the third decision pinned
      // in the hash-checked surface (ScaleShapeSpec proves it on planted
      // synthetic skew; this proves it through the oracle on derived
      // skew): 90% of events collapse onto key 777 and the dim fans out
      // 10 rows per key, so the CMS output estimate (collision-corrected
      // ~10x the fact) exceeds the fan-out threshold and the sketch must
      // pick the salted equi-join — the hot key spreads over 8 reducers
      // instead of one straggler. The oracle is the plain join: salting
      // may never change rows, and the hash proves it on real inputs.
      Some("""WITH f AS (
             |  SELECT CASE WHEN event_id % 10 <> 0 THEN CAST(777 AS BIGINT)
             |              ELSE event_id % 50 END AS k
             |  FROM events
             |),
             |d AS (
             |  SELECT CASE WHEN i // 10 = 50 THEN CAST(777 AS BIGINT)
             |              ELSE i // 10 END AS k,
             |         i % 10 AS v
             |  FROM (SELECT unnest(range(0, 510)) AS i)
             |)
             |SELECT f.k, count(*) AS n_rows, CAST(sum(d.v) AS BIGINT) AS v_sum
             |FROM f JOIN d USING (k)
             |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val fact = t.events.select(
          when(col("event_id") % 10 =!= 0, lit(777L))
            .otherwise(col("event_id") % 50).as("k"),
          col("event_id"))
        val dim = spark.range(0, 510).select(
          when(expr("id DIV 10") === 50, lit(777L))
            .otherwise(expr("id DIV 10")).as("k"),
          (col("id") % 10).as("v"))
        val planned = graft.plans.SketchCbo.plan(fact, dim, "k",
          broadcastRowLimit = 100, saltFanout = 4.0, saltBuckets = 8,
          leftSaltSource = Some(col("event_id")))
        require(planned.est.strategy == "salt",
          s"CBO missed the planted fan-out skew: ${planned.est}")
        ordered(
          planned.df
            .groupBy(col("k"))
            .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("v_sum")))
      }
    ),
    Q(
      "s18_cbo_persisted",
      // SKETCH-DRIVEN JOIN STRATEGY, persisted-sketch leg — the
      // production path the other three legs only promise in prose: the
      // per-table CMS cell tables are written at INGEST (one scan each,
      // ≤1 KB of parquet), and plan time reads those 1 KB relations
      // instead of re-scanning either join side — the whole decision
      // costs two tiny file reads plus driver arithmetic, which is what
      // lets a 100 TB deployment afford a sketch-CBO per join. The
      // decision arithmetic is the same code path as the live-scan legs
      // (SketchCbo.planFromCells, pinned by ScaleShapeSpec), so the
      // require() here proves the persisted cells carry enough signal to
      // reproduce the decision. The oracle is the PLAIN join — the
      // strategy may never change rows.
      Some("""SELECT p.p_brand, count(*) AS n_items,
             |CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total_price
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY p.p_brand ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val fact = t.lineitem.withColumnRenamed("l_partkey", "partkey")
        val dim = t.part.withColumnRenamed("p_partkey", "partkey")
        // "ingest": one sketch pass per table, persisted as tiny parquet
        val skDir = java.nio.file.Files
          .createTempDirectory("graft-sketch-").toString
        graft.plans.SketchCbo.writeSketch(fact, col("partkey"), s"$skDir/lineitem")
        graft.plans.SketchCbo.writeSketch(dim, col("partkey"), s"$skDir/part")
        // "plan": two ≤1024-row cell-table reads; neither side re-scanned
        val planned = graft.plans.SketchCbo.planFromSketches(
          fact, dim, "partkey",
          spark.read.parquet(s"$skDir/lineitem"),
          spark.read.parquet(s"$skDir/part"))
        require(planned.est.strategy == "broadcast",
          s"persisted-sketch CBO mis-planned the dim join: ${planned.est}")
        ordered(
          planned.df
            .groupBy(col("p_brand"))
            .agg(count(lit(1)).as("n_items"),
              round(sum(col("l_extendedprice").cast("decimal(18,2)")), 4)
                .cast("double").as("total_price")))
      }
    )
  )
}
