package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Canon._
import graft.sources.Tables
import graft.Materialize.{CutSyntax, Shared}

/** Window functions — SURVEY.md §2.5 (W1–W5).
  *
  * W1 is the engine's flagship: the reference's `get_lastest_version`
  * (DMS.py:385-392) generalized to every key as a single ranking window —
  * one shuffle on the partition key, no per-key rescans (the reference
  * rescans the table per lookup, DMS.py:373-375).
  *
  * Every window ORDER BY below is a total order within its partition
  * (explicit tie-break columns), otherwise rank/lag results are
  * nondeterministic across engines.
  */
object Windows {

  /** Shared by w2_ranking (the operator demo) and w2_ranking_bucketed
    * (its scale-safe grouped-prefix-sum twin): one oracle text
    * hash-checks both legs. */
  private val w2RankingOracle: Option[String] =
    Some("""SELECT c_nationkey, c_custkey,
           rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
           ORDER BY ALL NULLS FIRST""")

  val all: Seq[Q] = Seq(
    Q(
      "w1_latest_per_key",
      Some("""SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_totalprice
             FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
             WHERE rn = 1 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        ordered(
          t.orders
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(
              col("o_custkey"),
              col("o_orderkey"),
              tstr(col("o_orderdate")).as("o_orderdate"),
              col("o_totalprice")
            )
        )
      }
    ),
    Q(
      "w2_ranking",
      w2RankingOracle,
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        ordered(
          t.customer.select(
            col("c_nationkey"),
            col("c_custkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile")
          )
        )
      }
    ),
    Q(
      "w2_ranking_bucketed",
      // THE SCALE-SAFE TWIN of the W2 operator demo above (round 14 —
      // the same oracle text hash-checks BOTH legs): w2_ranking's
      // windows partition only by c_nationkey, a 25-value literal
      // domain, so each sort task carries customers/25 at 100 TB (the
      // fence exempts the demo by name because rank/dense_rank/ntile
      // ARE its semantics). This spelling computes identical output
      // with no window below (nation, range-bucket): the per-nation
      // position rides the GROUPED range-bucketed prefix sum over
      // per-(nation, acctbal) counts (tie ranks from
      // (nation, acctbal)-partitioned windows — tie-group-sized), and
      // because the demo's ordering (acctbal DESC, custkey ASC) is
      // UNIQUE, rank = dense_rank = that position; ntile(4) is then
      // pure integer arithmetic on (position, nation size): the first
      // ns mod 4 quartiles take (ns div 4)+1 rows, the rest ns div 4 —
      // the standard NTILE law both engines implement.
      w2RankingOracle,
      (spark, dir) => {
        val t = Tables(spark, dir)
        val c = t.customer
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
          .cut(Shared) // consumed by per-value counts, tie ranks, sizes
        val perVal = c.groupBy(col("c_nationkey"), col("c_acctbal"))
          .agg(count(lit(1)).as("cnt"))
          // PrefixSum orders ascending; DESC acctbal = ASC negation
          // (exact for decimals)
          .withColumn("negbal", -col("c_acctbal"))
        val cum = graft.functions.PrefixSum
          .cumOverDistinctBy(perVal, Seq("c_nationkey"), "negbal", "cnt", "cum")
          .drop("negbal")
        val ns = c.groupBy(col("c_nationkey")).agg(count(lit(1)).as("ns"))
        val ranked = c
          .withColumn("tierk", row_number().over(
            Window.partitionBy(col("c_nationkey"), col("c_acctbal"))
              .orderBy(col("c_custkey"))))
          .join(cum, Seq("c_nationkey", "c_acctbal"))
          .withColumn("rn", (col("cum") - col("cnt") + col("tierk")).cast("int"))
          .join(broadcast(ns), Seq("c_nationkey")) // 25-row literal domain
        ordered(
          ranked.select(
            col("c_nationkey"),
            col("c_custkey"),
            col("rn").as("rnk"),
            col("rn").as("drnk"),
            expr("""CAST(CASE
                   |  WHEN rn <= (ns % 4) * ((ns div 4) + 1)
                   |    THEN (rn - 1) div ((ns div 4) + 1) + 1
                   |  ELSE (ns % 4) + ((rn - (ns % 4) * ((ns div 4) + 1)) - 1)
                   |         div (ns div 4) + 1
                   |END AS INT)""".stripMargin).as("quartile")
          )
        )
      }
    ),
    Q(
      "w3_lag_lead",
      Some("""SELECT user_id, event_id,
             lag(event_id, 1) OVER w AS prev_id,
             lead(event_id, 1) OVER w AS next_id,
             first_value(event_id) OVER w AS first_id
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        ordered(
          t.events.select(
            col("user_id"),
            col("event_id"),
            lag(col("event_id"), 1).over(w).as("prev_id"),
            lead(col("event_id"), 1).over(w).as("next_id"),
            first(col("event_id")).over(w).as("first_id")
          )
        )
      }
    ),
    Q(
      "w4_row_frames",
      // running sum + trailing moving average over an exact decimal view
      Some("""SELECT user_id, event_id,
             CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_v,
             CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS trail4_sum
             FROM events ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val base = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        val vdec = col("value").cast("decimal(18,2)")
        ordered(
          t.events.select(
            col("user_id"),
            col("event_id"),
            round(sum(vdec).over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
              .cast("double").as("running_v"),
            round(sum(vdec).over(base.rowsBetween(-3, Window.currentRow)), 4)
              .cast("double").as("trail4_sum")
          )
        )
      }
    ),
    Q(
      "w5_range_frames",
      // range frame over a numeric ordering: all orders within ±10000 of
      // this order's totalprice for the same status
      Some("""SELECT o_orderstatus, o_orderkey,
             count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_near
             FROM orders WHERE o_custkey < 100 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
          .rangeBetween(-10000L, 10000L)
        ordered(
          t.orders
            .filter(col("o_custkey") < 100L)
            .select(
              col("o_orderstatus"),
              col("o_orderkey"),
              count(lit(1)).over(w).as("n_near")
            )
        )
      }
    ),
    Q(
      "w7_rolling_median",
      // Centered 7-slot rolling MEDIAN over the daily per-type event
      // series — the robust smoother (a single spike day moves a rolling
      // mean but not the median). Spark has no native windowed median,
      // so the frame is materialized per row (collect_list over ROWS
      // ±3 → sort_array → middle element(s)) — exact, and cheap because
      // the window rides the days × types relation the daily aggregate
      // already reduced to, NOT the event stream; DuckDB's native
      // windowed median is the oracle, so the even-frame
      // average-of-middles convention is pinned too. Edge days simply
      // have smaller frames (both engines agree). 100 TB shape: one
      // event-scan aggregate with map-side partials, then the window
      // runs on the tiny daily relation partitioned by type.
      Some("""WITH daily AS (
             |  SELECT event_type,
             |         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
             |         count(*) AS n
             |  FROM events GROUP BY 1, 2
             |)
             |SELECT event_type, day, n,
             |       CAST(median(n) OVER (PARTITION BY event_type ORDER BY day
             |              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
             |         AS roll_median
             |FROM daily
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val daily = t.events
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-3, 3)
        ordered(
          daily
            .withColumn("arr", sort_array(collect_list(col("n")).over(w)))
            .withColumn("m", size(col("arr")))
            .select(col("event_type"), col("day"), col("n"),
              when(pmod(col("m"), lit(2)) === 1,
                element_at(col("arr"), expr("cast((m + 1) div 2 as int)")).cast("double"))
                .otherwise((element_at(col("arr"), expr("cast(m div 2 as int)"))
                  + element_at(col("arr"), expr("cast(m div 2 + 1 as int)"))) / lit(2.0))
                .as("roll_median"))
        )
      }
    ),
    Q(
      "o3_topk_per_key",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice
             FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
             WHERE rn <= 3 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        ordered(
          t.orders
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 3)
            .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        )
      }
    ),
    Q(
      "w17_rolling_corr",
      // ROLLING CORRELATION — the co-movement monitor between two metric
      // series (here click vs purchase daily counts) over a trailing
      // 7-day window. Made engine-exact the w15/a9 way: every moment
      // (Σx, Σy, Σxy, Σx², Σy²) is an exact INTEGER window sum, the
      // Pearson numerator/denominator are exact integer-valued doubles
      // (< 2^53), and the only inexact steps are one sqrt of an exact
      // value (correctly rounded IEEE — identical in both engines) and
      // one final rounded division. Zero-variance windows yield NULL via
      // a guard on the exact integer denominators. 100 TB shape: events
      // collapse to one (day) aggregate; the day grid is output-sized;
      // five window sums share ONE day ordering.
      Some("""WITH c AS (
             |  SELECT epoch_us(ts) // 86400000000 AS d,
             |         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
             |         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
             |  FROM events GROUP BY 1
             |),
             |w AS (
             |  SELECT d, x, y,
             |         sum(x) OVER win AS sx, sum(y) OVER win AS sy,
             |         sum(x*y) OVER win AS sxy,
             |         sum(x*x) OVER win AS sxx, sum(y*y) OVER win AS syy,
             |         row_number() OVER (ORDER BY d) AS rn
             |  FROM c
             |  WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             |)
             |SELECT d AS day, x AS clicks, y AS purchases,
             |       CASE WHEN (7*sxx - sx*sx) > 0 AND (7*syy - sy*sy) > 0
             |            THEN round((7*sxy - sx*sy) /
             |                       sqrt(CAST((7*sxx - sx*sx) * (7*syy - sy*sy)
             |                                 AS DOUBLE)), 4)
             |            END AS corr7
             |FROM w WHERE rn >= 7
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val c = t.events
          .groupBy(expr("unix_micros(ts) DIV 86400000000").as("d"))
          .agg(count(when(col("event_type") === "click", 1)).as("x"),
            count(when(col("event_type") === "purchase", 1)).as("y"))
        val win = Window.orderBy(col("d")).rowsBetween(-6, Window.currentRow)
        val seq = Window.orderBy(col("d"))
        val den = (lit(7) * col("sxx") - col("sx") * col("sx")) *
          (lit(7) * col("syy") - col("sy") * col("sy"))
        ordered(
          c.select(col("d"), col("x"), col("y"),
              sum(col("x")).over(win).as("sx"),
              sum(col("y")).over(win).as("sy"),
              sum(col("x") * col("y")).over(win).as("sxy"),
              sum(col("x") * col("x")).over(win).as("sxx"),
              sum(col("y") * col("y")).over(win).as("syy"),
              row_number().over(seq).as("rn"))
            .filter(col("rn") >= 7)
            .select(col("d").as("day"), col("x").as("clicks"),
              col("y").as("purchases"),
              when((lit(7) * col("sxx") - col("sx") * col("sx")) > 0 &&
                (lit(7) * col("syy") - col("sy") * col("sy")) > 0,
                round((lit(7) * col("sxy") - col("sx") * col("sy")) /
                  sqrt(den.cast("double")), 4)).as("corr7")))
      }
    ),
    Q(
      "w18_rolling_moments",
      // ROLLING SKEWNESS + KURTOSIS — the higher-moment shape monitor
      // over each event type's trailing-7-day daily counts (heavy-tail
      // onset shows in kurtosis long before the mean moves; burst
      // asymmetry shows in skew). w17's exactness discipline lifted to
      // moments 3 and 4: all four power sums S1..S4 are exact BIGINT
      // window sums sharing one per-type day ordering; the centered
      // numerators are cross-multiplied into pure integers
      // (C = 343·S3 − 147·S2·S1 + 14·S1³ = n³·Σ(y−μ)³ and
      // A = 2401·S4 − 1372·S3·S1 + 294·S2·S1² − 21·S1⁴ = n⁴·Σ(y−μ)⁴
      // with B = 7·S2 − S1² = n·Σ(y−μ)²), so skew g1 = C/(7B·√B) and
      // kurtosis m4/m2² = A/(7B²) each cost exactly one sqrt of an
      // exact value plus one rounded division — bit-identical across
      // engines. Zero-variance guard on the integer B. 100 TB shape:
      // events collapse to one (type, day) aggregate; four window sums
      // ride one sort; output is day-grid-sized.
      Some("""WITH c AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
             |         CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2
             |),
             |w AS (
             |  SELECT event_type, d, y,
             |         sum(y) OVER win AS s1, sum(y*y) OVER win AS s2,
             |         sum(y*y*y) OVER win AS s3,
             |         sum(y*y*y*y) OVER win AS s4,
             |         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
             |  FROM c
             |  WINDOW win AS (PARTITION BY event_type ORDER BY d
             |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             |)
             |SELECT event_type, d AS day, y,
             |       CASE WHEN (7*s2 - s1*s1) > 0 THEN
             |         round(CAST(343*s3 - 147*s2*s1 + 14*s1*s1*s1 AS DOUBLE) /
             |               (CAST(7*(7*s2 - s1*s1) AS DOUBLE) *
             |                sqrt(CAST(7*s2 - s1*s1 AS DOUBLE))), 4)
             |       END AS skew7,
             |       CASE WHEN (7*s2 - s1*s1) > 0 THEN
             |         round(CAST(2401*s4 - 1372*s3*s1 + 294*s2*s1*s1
             |                    - 21*s1*s1*s1*s1 AS DOUBLE) /
             |               CAST(7*(7*s2 - s1*s1)*(7*s2 - s1*s1) AS DOUBLE), 4)
             |       END AS kurt7
             |FROM w WHERE rn >= 7
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val c = t.events
          .groupBy(col("event_type"),
            expr("unix_micros(ts) DIV 86400000000").as("d"))
          .agg(count(lit(1)).as("y"))
        val win = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rowsBetween(-6, Window.currentRow)
        val seq = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val b = lit(7) * col("s2") - col("s1") * col("s1")
        val cNum = lit(343) * col("s3") - lit(147) * col("s2") * col("s1") +
          lit(14) * col("s1") * col("s1") * col("s1")
        val aNum = lit(2401) * col("s4") - lit(1372) * col("s3") * col("s1") +
          lit(294) * col("s2") * col("s1") * col("s1") -
          lit(21) * col("s1") * col("s1") * col("s1") * col("s1")
        ordered(
          c.select(col("event_type"), col("d"), col("y"),
              sum(col("y")).over(win).as("s1"),
              sum(col("y") * col("y")).over(win).as("s2"),
              sum(col("y") * col("y") * col("y")).over(win).as("s3"),
              sum(col("y") * col("y") * col("y") * col("y")).over(win).as("s4"),
              row_number().over(seq).as("rn"))
            .filter(col("rn") >= 7)
            .select(col("event_type"), col("d").as("day"), col("y"),
              when(b > 0,
                round(cNum.cast("double") /
                  ((lit(7) * b).cast("double") * sqrt(b.cast("double"))), 4))
                .as("skew7"),
              when(b > 0,
                round(aNum.cast("double") /
                  (lit(7) * b * b).cast("double"), 4)).as("kurt7")))
      }
    ),
    Q(
      "w19_bollinger",
      // BOLLINGER BANDS + %B — the volatility envelope monitor (mean ±
      // 2σ over the trailing week) on each event type's daily counts,
      // with the band-breach flag every alerting pipeline derives from
      // it. w17's exactness discipline again: S1/S2 are exact BIGINT
      // window sums, σ√(n... is carried as √B with B = 7·S2 − S1²
      // (= 49·variance, integer), the band edges and %B each cost one
      // sqrt of an exact value + one rounded division — and the breach
      // flags NEVER touch a float: 7y > S1 + 2√B ⟺ (7y − S1)² > 4B
      // (given 7y > S1) is pure BIGINT comparison, so the flag column
      // is immune to last-ulp drift by construction. 100 TB shape: one
      // (type, day) aggregate, two window sums on one per-type day
      // ordering, output day-grid-sized.
      Some("""WITH c AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
             |         CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2
             |),
             |w AS (
             |  SELECT event_type, d, y,
             |         sum(y) OVER win AS s1, sum(y*y) OVER win AS s2,
             |         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
             |  FROM c
             |  WINDOW win AS (PARTITION BY event_type ORDER BY d
             |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             |)
             |SELECT event_type, d AS day, y,
             |       round(s1 / 7.0, 4) AS ma7,
             |       CASE WHEN 7*s2 - s1*s1 > 0 THEN
             |         round((s1 + 2*sqrt(CAST(7*s2 - s1*s1 AS DOUBLE))) / 7, 4)
             |       END AS upper_band,
             |       CASE WHEN 7*s2 - s1*s1 > 0 THEN
             |         round((s1 - 2*sqrt(CAST(7*s2 - s1*s1 AS DOUBLE))) / 7, 4)
             |       END AS lower_band,
             |       CASE WHEN 7*s2 - s1*s1 > 0 THEN
             |         round((7*y - s1 + 2*sqrt(CAST(7*s2 - s1*s1 AS DOUBLE)))
             |               / (4*sqrt(CAST(7*s2 - s1*s1 AS DOUBLE))), 4)
             |       END AS pct_b,
             |       CASE WHEN 7*y > s1 AND (7*y - s1)*(7*y - s1) > 4*(7*s2 - s1*s1)
             |            THEN 1 ELSE 0 END AS breach_up,
             |       CASE WHEN 7*y < s1 AND (7*y - s1)*(7*y - s1) > 4*(7*s2 - s1*s1)
             |            THEN 1 ELSE 0 END AS breach_down
             |FROM w WHERE rn >= 7
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val c = t.events
          .groupBy(col("event_type"),
            expr("unix_micros(ts) DIV 86400000000").as("d"))
          .agg(count(lit(1)).as("y"))
        val win = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rowsBetween(-6, Window.currentRow)
        val seq = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val b = lit(7) * col("s2") - col("s1") * col("s1")
        val dev = lit(7) * col("y") - col("s1")
        val sq = sqrt(b.cast("double"))
        ordered(
          c.select(col("event_type"), col("d"), col("y"),
              sum(col("y")).over(win).as("s1"),
              sum(col("y") * col("y")).over(win).as("s2"),
              row_number().over(seq).as("rn"))
            .filter(col("rn") >= 7)
            .select(col("event_type"), col("d").as("day"), col("y"),
              round(col("s1") / 7.0, 4).as("ma7"),
              when(b > 0, round((col("s1") + lit(2) * sq) / lit(7), 4))
                .as("upper_band"),
              when(b > 0, round((col("s1") - lit(2) * sq) / lit(7), 4))
                .as("lower_band"),
              when(b > 0, round((dev + lit(2) * sq) / (lit(4) * sq), 4))
                .as("pct_b"),
              when(dev > 0 && dev * dev > lit(4) * b, 1).otherwise(0)
                .as("breach_up"),
              when(dev < 0 && dev * dev > lit(4) * b, 1).otherwise(0)
                .as("breach_down")))
      }
    ),
    Q(
      "o3_topk_ties",
      // TOP-K WITH TIES (O3's rank() twin): row_number() caps each group
      // at exactly k rows, silently dropping tied peers — for "top 3
      // priorities by quantity INCLUDING ties" the cutoff must be rank(),
      // which admits every row equal to the k-th. l_quantity is coarse
      // (50 distinct values), so ties are dense and the two semantics
      // genuinely diverge — the hash check would catch a row_number
      // regression immediately. Same WindowGroupLimit pushdown shape as
      // o3_topk_per_key: per-partition candidates are pre-pruned to the
      // top slice before the shuffle.
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
             |FROM (SELECT *, rank() OVER (PARTITION BY l_returnflag
             |        ORDER BY l_quantity DESC) AS rk FROM lineitem)
             |WHERE rk <= 3 ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_quantity").desc)
        ordered(
          t.lineitem
            .withColumn("rk", rank().over(w))
            .filter(col("rk") <= 3)
            .select(col("l_returnflag"), col("l_orderkey"),
              col("l_linenumber"), col("l_quantity"))
        )
      }
    ),
    Q(
      "w2_pct_rank",
      // percent_rank + cume_dist over a deterministic total order (W2)
      Some("""SELECT o_orderkey,
             round(percent_rank() OVER w, 4) AS pr,
             round(cume_dist() OVER w, 4) AS cd
             FROM orders WHERE o_custkey < 50
             WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        ordered(
          t.orders.filter(col("o_custkey") < 50)
            .select(col("o_orderkey"),
              round(percent_rank().over(w), 4).as("pr"),
              round(cume_dist().over(w), 4).as("cd"))
        )
      }
    ),
    Q(
      "w2_ntile",
      // ntile bucketing over a deterministic total order (W2) — the
      // quartile/decile assignment every stats pipeline wants
      Some("""SELECT o_orderkey,
             ntile(4) OVER w AS quartile,
             ntile(10) OVER w AS decile
             FROM orders WHERE o_custkey < 100
             WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
        ordered(
          t.orders.filter(col("o_custkey") < 100)
            .select(col("o_orderkey"),
              ntile(4).over(w).as("quartile"),
              ntile(10).over(w).as("decile"))
        )
      }
    ),
    Q(
      "w3_first_last_nth",
      // first_value / last_value / nth_value over explicit frames (W3):
      // last_value needs the full-partition frame, or it reads only up to
      // the current row — the classic window-frame trap, pinned here
      Some("""SELECT o_orderkey,
             first_value(o_totalprice) OVER w AS cheapest,
             last_value(o_totalprice) OVER w AS priciest,
             nth_value(o_totalprice, 2) OVER w AS second_cheapest
             FROM orders WHERE o_custkey < 50
             WINDOW w AS (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ordered(
          t.orders.filter(col("o_custkey") < 50)
            .select(col("o_orderkey"),
              first(col("o_totalprice")).over(w).as("cheapest"),
              last(col("o_totalprice")).over(w).as("priciest"),
              nth_value(col("o_totalprice"), 2).over(w).as("second_cheapest"))
        )
      }
    ),
    Q(
      "w6_ewma_decay",
      // Exponentially-decayed running state (EWMA with λ = 1/2): the
      // freshness-weighted per-user activity feature — each event halves
      // everything before it. A sequential left fold is the semantics, so
      // both engines run the IDENTICAL fold: values ordered by event_id,
      // acc/2 (an exponent shift — exact) + value, giving bit-equal IEEE
      // doubles with no rounding anywhere. 100 TB shape: one hash
      // aggregate per user; the fold is array-local. For unbounded
      // per-user histories the same recurrence runs incrementally as T5
      // custom state — this is the batch/backfill form.
      Some("""WITH ov AS (
             |  SELECT user_id, list(value ORDER BY event_id) AS vals,
             |         count(*) AS n
             |  FROM events GROUP BY user_id
             |)
             |SELECT user_id, n AS n_events,
             |       list_reduce(list_prepend(0.0, vals),
             |                   (acc, x) -> acc/2 + x) AS ewma
             |FROM ov ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.events
            .groupBy(col("user_id"))
            .agg(
              sort_array(collect_list(struct(col("event_id"), col("value"))))
                .as("evs"),
              count(lit(1)).as("n_events"))
            .select(col("user_id"), col("n_events"),
              aggregate(transform(col("evs"), e => e("value")),
                lit(0.0), (acc, x) => acc / 2 + x).as("ewma"))
        )
      }
    ),
    Q(
      "o4_skyline",
      // SKYLINE (Pareto frontier): customers not dominated on
      // (total spend, order count) — the multi-criteria "best documents"
      // operator (e.g. quality × length frontiers in corpus curation).
      // 2-D skyline reduces to ONE window: sort by (spend desc, n desc,
      // id), keep rows whose n exceeds the running max over all
      // strictly-earlier rows (equal-(x,y) duplicates keep the first id).
      // The distributed form is TWO-PHASE: a per-bucket local frontier
      // first (same window partitioned by a hash bucket — map-side-style
      // pruning that drops the interior of each partition's point cloud,
      // the skyline analogue of a partial aggregate), then the global
      // window over local survivors only. Local pruning is lossless — a
      // locally dominated point is dominated by its own dominator
      // globally — so the oracle checks the two-phase result against the
      // direct one-window SQL. At 100 TB the global pass sees |buckets| ×
      // |frontier| points, not the corpus.
      Some("""WITH pts AS (
             |  SELECT o_custkey AS cust,
             |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |              AS DECIMAL(18,2)) AS spend,
             |         count(*) AS n_orders
             |  FROM orders GROUP BY o_custkey
             |),
             |w AS (
             |  SELECT cust, spend, n_orders,
             |         max(n_orders) OVER (
             |           ORDER BY spend DESC, n_orders DESC, cust
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             |  FROM pts
             |)
             |SELECT cust, CAST(round(spend, 4) AS DOUBLE) AS spend, n_orders
             |FROM w WHERE pm IS NULL OR n_orders > pm
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val pts = t.orders
          .groupBy(col("o_custkey").as("cust"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("decimal(18,2)").as("spend"),
            count(lit(1)).as("n_orders"))
        ordered(skyline2d(pts, "spend", "n_orders", "cust")
          .select(col("cust"), round(col("spend"), 4).cast("double").as("spend"),
            col("n_orders")))
      }
    ),
    Q(
      "w12_ratio_to_report",
      // RATIO-TO-REPORT (percent-of-parent at two levels): each order's
      // share of its customer's spend, and the customer's share of the
      // grand total — the contribution-analysis window every BI layer
      // ships. NOT an unpartitioned window over the fact table: the
      // per-customer total is a window partitioned by customer, and the
      // grand total is a 1-row aggregate of the per-customer relation
      // broadcast back — so nothing corpus-sized ever moves to a single
      // partition. All sums are exact DECIMAL(18,4); each share is one
      // IEEE division of exact decimals, rounded once.
      Some("""WITH o AS (
             |  SELECT o_custkey, o_orderkey,
             |         CAST(o_totalprice AS DECIMAL(18,4)) AS p
             |  FROM orders
             |),
             |g AS (SELECT o_custkey, sum(p) AS cust_tot FROM o GROUP BY 1),
             |t AS (SELECT sum(cust_tot) AS grand FROM g)
             |SELECT o.o_custkey, o.o_orderkey,
             |       round(CAST(o.p AS DOUBLE) / CAST(g.cust_tot AS DOUBLE), 4)
             |         AS share_of_customer,
             |       round(CAST(g.cust_tot AS DOUBLE) / CAST(t.grand AS DOUBLE), 4)
             |         AS customer_share
             |FROM o JOIN g USING (o_custkey) CROSS JOIN t
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val o = t.orders.select(col("o_custkey"), col("o_orderkey"),
          money(col("o_totalprice")).as("p"))
        val g = o.groupBy(col("o_custkey")).agg(sum(col("p")).as("cust_tot"))
        val grand = g.agg(sum(col("cust_tot")).as("grand"))
        ordered(
          o.join(g, "o_custkey")
            .crossJoin(broadcast(grand)) // 1-row grand-total scalar
            .select(col("o_custkey"), col("o_orderkey"),
              round(col("p").cast("double") / col("cust_tot").cast("double"), 4)
                .as("share_of_customer"),
              round(col("cust_tot").cast("double") / col("grand").cast("double"), 4)
                .as("customer_share")))
      }
    ),
    Q(
      "w13_lorenz",
      // Lorenz curve + exact Gini of customer spend concentration — the
      // inequality profile every marketplace/revenue dashboard carries.
      // Gini via the rank formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n
      // over spend sorted ascending (tie-broken by custkey; tied spends
      // give rank-permutation-invariant sums, so the tiebreak only pins
      // engine agreement, not the value). 100 TB shape: the raw fact
      // collapses to ONE per-customer hash aggregate (map-side partials);
      // the per-customer relation is still corpus-entity-sized, so
      // NOTHING after it is a global window (the round-12 audit finding,
      // fixed round 13): deciles come from ExactNtile GK-band boundary
      // keys applied as a per-row scalar (bit-identical to ntile — the
      // t23 recipe), and the exact rank-formula Σ rn·s decomposes over
      // per-DISTINCT-value tie runs whose cumulative count rides the
      // range-bucketed distributed prefix sum (PrefixSum: GK range
      // boundaries, driver-held offsets, window partitioned by bucket —
      // the distributed-sort cost envelope). All spend sums are exact
      // DECIMAL; doubles appear only in the final share/gini divisions,
      // rounded once. The oracle keeps the window spelling — it IS the
      // semantic spec the scale shape must reproduce bit-for-bit.
      Some("""WITH spend AS (
             |  SELECT o_custkey,
             |         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS s
             |  FROM orders GROUP BY 1
             |),
             |ranked AS (
             |  SELECT s,
             |         row_number() OVER (ORDER BY s, o_custkey) AS rn,
             |         ntile(10)    OVER (ORDER BY s, o_custkey) AS decile
             |  FROM spend
             |),
             |g AS (
             |  SELECT round(CAST(2 * sum(rn * s) AS DOUBLE)
             |               / (count(*) * CAST(sum(s) AS DOUBLE))
             |               - (count(*) + 1.0) / count(*), 4) AS gini,
             |         sum(s) AS tot
             |  FROM ranked
             |),
             |d AS (
             |  SELECT decile, count(*) AS n_customers, sum(s) AS ds
             |  FROM ranked GROUP BY 1
             |)
             |SELECT d.decile, d.n_customers,
             |       round(CAST(d.ds AS DOUBLE) / CAST(g.tot AS DOUBLE), 4)
             |         AS spend_share,
             |       round(CAST(sum(d.ds) OVER (ORDER BY d.decile) AS DOUBLE)
             |             / CAST(g.tot AS DOUBLE), 4) AS cum_share,
             |       g.gini
             |FROM d CROSS JOIN g
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        // multi-consumed per-customer relation (ExactNtile's bounded
        // passes + the per-value gini aggregate + the final select)
        val spend = t.orders
          .groupBy(col("o_custkey"))
          .agg(sum(money(col("o_totalprice"))).as("s"))
          // monotone sort key for the GK machinery: 4-decimal money
          // sums are double-exact (scaled < 2^53), so (sd, custkey)
          // ordering == (s, custkey) ordering bit-for-bit
          .withColumn("sd", col("s").cast("double"))
          .cut(Shared)
        val n = spend.count()
        // deciles WITHOUT the global window: exact ntile(10) boundary
        // keys via GK-band refinement (graft.functions.ExactNtile — the
        // t23 recipe), then a pure per-row bucket scalar
        val cuts = graft.functions.ExactNtile.ntileCuts(n, 10)
        val bnd = graft.functions.ExactNtile.boundaries(spend,
          graft.functions.ExactNtile.bands(spend, Seq("sd"), "o_custkey",
            cuts, n),
          "o_custkey")
        val withDec = spend.withColumn("decile",
          graft.functions.ExactNtile.bucket("sd", "o_custkey", bnd("sd"))
            .cast("int"))
        // exact rank-formula gini WITHOUT the global row_number: a tie
        // run of m customers at spend s holds consecutive ranks
        // rmin..rmin+m−1 (rmin = cum − m + 1), so Σ rn·s decomposes per
        // DISTINCT value as s·(m·rmin + m(m−1)/2) — all-BIGINT factors,
        // exact decimal products; cum rides the range-bucketed
        // distributed prefix sum (graft.functions.PrefixSum), never one
        // empty-partition WindowExec task
        val byVal = spend.groupBy(col("s")).agg(count(lit(1)).as("m"))
        val cum = graft.functions.PrefixSum
          .cumOverDistinct(byVal, "s", "m", "cum")
        val rw = col("m") * (col("cum") - col("m") + 1) +
          expr("m * (m - 1) DIV 2")
        val g = cum.agg(
          round((lit(2) * sum(rw * col("s"))).cast("double")
              / (sum(col("m")) * sum(col("m") * col("s")).cast("double"))
              - (sum(col("m")) + lit(1.0)) / sum(col("m")), 4).as("gini"),
          sum(col("m") * col("s")).as("tot"))
        val d = withDec.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_customers"), sum(col("s")).as("ds"))
        val wCum = Window.orderBy(col("decile"))
        ordered(
          d.crossJoin(broadcast(g)) // 1-row gini/total scalar
            .select(col("decile"), col("n_customers"),
              round(col("ds").cast("double") / col("tot").cast("double"), 4)
                .as("spend_share"),
              round(sum(col("ds")).over(wCum).cast("double")
                  / col("tot").cast("double"), 4).as("cum_share"),
              col("gini")))
      }
    ),
    Q(
      "w14_reset_cumsum",
      // Conditionally-resetting running total — spend accumulated per user
      // since (exclusive of nothing, inclusive of) the last 'purchase'
      // event: the classic sessionized-accumulator shape (budget burn-down,
      // retry back-off, bonus-meter) that plain SUM OVER can't express
      // without the two-window trick. Window 1 numbers the segment: count
      // of purchases in STRICTLY PRECEDING rows (so a purchase row closes
      // its own segment and the next row starts fresh); window 2 runs the
      // cumulative sum inside (user, segment). Both windows share the same
      // user_id hash partitioning — one shuffle, one sort, two frames.
      // Sums are exact DECIMAL (event values are 2-decimal doubles), so the
      // running total is order-independent within ties and bit-identical
      // across engines; the single double conversion happens at output.
      // 100 TB shape: per-user partitions are user-history-sized; nothing
      // global, no join, the fact is scanned once.
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CAST(value AS DECIMAL(18,4)) AS v
             |  FROM events
             |),
             |seg AS (
             |  SELECT user_id, event_id, ts, v,
             |         count(*) FILTER (WHERE event_type = 'purchase')
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |           AS segment
             |  FROM e
             |)
             |SELECT user_id, event_id,
             |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, segment,
             |       round(CAST(sum(v) OVER (PARTITION BY user_id, segment
             |                               ORDER BY ts, event_id
             |                               ROWS BETWEEN UNBOUNDED PRECEDING
             |                               AND CURRENT ROW) AS DOUBLE), 4)
             |         AS run_sum
             |FROM seg
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val seg = t.events
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"), money(col("value")).as("v"))
          .withColumn("segment",
            count(when(col("event_type") === "purchase", lit(1)))
              .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
        val bySeg = Window.partitionBy(col("user_id"), col("segment"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ordered(
          seg.select(col("user_id"), col("event_id"),
            tstr(col("ts")).as("ts"), col("segment"),
            round(sum(col("v")).over(bySeg).cast("double"), 4).as("run_sum"))
        )
      }
    )
  )

  /** Two-phase distributed 2-D skyline over (x, y, id) — maximal points
    * under (≥, ≥) domination, equal-(x,y) duplicates keep the smallest id.
    * Phase 1 runs the running-max frontier window inside each hash bucket
    * (lossless interior pruning — a locally dominated point's dominator
    * dominates it globally too); phase 2 runs the same window over local
    * survivors only. PropertySpec pins soundness + completeness against a
    * brute-force dominator scan. */
  def skyline2d(pts: org.apache.spark.sql.DataFrame, x: String, y: String,
      id: String): org.apache.spark.sql.DataFrame = {
    def frontier(df: org.apache.spark.sql.DataFrame,
        part: Seq[org.apache.spark.sql.Column]) = {
      val w = (if (part.isEmpty) Window.partitionBy()
               else Window.partitionBy(part: _*))
        .orderBy(col(x).desc, col(y).desc, col(id))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("__pm", max(col(y)).over(w))
        .filter(col("__pm").isNull || col(y) > col("__pm"))
        .drop("__pm")
    }
    val local = frontier(
      pts.withColumn("__bucket", pmod(crc32(col(id).cast("string")), lit(32))),
      Seq(col("__bucket"))).drop("__bucket")
    frontier(local, Seq.empty)
  }
}
