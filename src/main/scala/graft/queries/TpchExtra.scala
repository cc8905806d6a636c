package graft.queries

import org.apache.spark.sql.functions._
import graft.Canon._
import graft.sources.Tables
import graft.Materialize.{CutSyntax, Shared}

/** The remaining TPC-H query SHAPES (q2, q4, q9, q11, q12, q15, q16, q17,
  * q19, q20, q21), adapted to the testdata schema: there is no `partsupp`
  * table and no `l_shipmode`/`l_commitdate`/`l_receiptdate`/`p_container`
  * columns, so each query keeps its defining plan shape (correlated min,
  * EXISTS/NOT-EXISTS, scalar-subquery threshold, disjunctive pushdown,
  * nested correlated aggregate) over the columns that do exist. What is
  * exercised per query:
  *
  *  - q2: per-group correlated MIN (cheapest supplier per part)
  *  - q4: EXISTS → left-semi with a non-equi date condition
  *  - q9: multi-join profit rollup by (nation, year), exact decimals
  *  - q11: HAVING against a scalar-subquery fraction of the total
  *  - q12: computed bucket dimension + conditional counts
  *  - q15: scalar-subquery MAX over an aggregated view (top supplier)
  *  - q16: NOT IN → broadcast anti-join + count(DISTINCT)
  *  - q17: correlated per-part AVG threshold (small-quantity revenue)
  *  - q19: three-branch disjunctive predicate over a fact-dim join
  *  - q20: nested correlated SUM threshold feeding a semi-join chain
  *  - q21: EXISTS + NOT-EXISTS pair on the same fact (latest shipper)
  *
  * All money math is exact decimal (order-independent sums), cast to
  * double once after the final round(4) — the established oracle-parity
  * discipline ([[graft.Canon]]).
  */
object TpchExtra {

  private val px   = col("l_extendedprice").cast("decimal(18,2)")
  private val disc = col("l_discount").cast("decimal(8,2)")

  val all: Seq[Q] = Seq(
    Q(
      "tpch_q2",
      // Q2 shape (min-cost supplier): the per-(part, supplier) unit cost
      // comes from lineitem (no partsupp table); the correlated min is a
      // second tiny aggregate joined back on partkey. Dims broadcast;
      // the only wide shuffle is the (part, supplier) cost aggregate.
      Some("""WITH ps AS (
             |  SELECT l_partkey, l_suppkey,
             |         min(l_extendedprice / l_quantity) AS unit_cost
             |  FROM lineitem GROUP BY l_partkey, l_suppkey
             |)
             |SELECT * FROM (
             |  SELECT s_acctbal, s_name, n_name, p_partkey,
             |         round(unit_cost, 4) AS unit_cost
             |  FROM ps
             |  JOIN part ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE p_size <= 10 AND r_name = 'EUROPE'
             |    AND unit_cost = (SELECT min(unit_cost) FROM ps ps2
             |                     WHERE ps2.l_partkey = ps.l_partkey)
             |  ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
             |  LIMIT 100)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val ps = t.lineitem
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        // correlated min as a window over the SAME partkey partitioning —
        // one pass over the aggregate, no second scan or materialization
        val wMin = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
        val eurSupp = t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
        ordered(
          ps.withColumn("min_uc", min(col("unit_cost")).over(wMin))
            .filter(col("unit_cost") === col("min_uc"))
            .join(broadcast(t.part.filter(col("p_size") <= 10)),
              col("l_partkey") === col("p_partkey"))
            .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
            .orderBy(col("s_acctbal").desc, col("n_name").asc,
              col("s_name").asc, col("p_partkey").asc)
            .limit(100)
            .select(col("s_acctbal"), col("s_name"), col("n_name"),
              col("p_partkey"), r4(col("unit_cost")).as("unit_cost"))
        )
      }
    ),
    Q(
      "tpch_q4",
      // Q4 shape (order-priority checking): EXISTS over the fact becomes a
      // LEFT SEMI join with an extra non-equi condition (shipped >60 days
      // after order date — the schema has no commit/receipt dates).
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1996-10-01 00:00:00")))
            .join(t.lineitem.select(col("l_orderkey"), col("l_shipdate")),
              col("o_orderkey") === col("l_orderkey") &&
                col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
              "left_semi")
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("order_count"))
        )
      }
    ),
    Q(
      "tpch_q9",
      // Q9 shape (product-type profit): red parts' profit per (supplier
      // nation, order year). Cost side uses p_retailprice * qty / 10 as
      // the supply-cost proxy (no partsupp) — all exact decimal so the
      // big sum is order-independent. part/supplier/nation broadcast; the
      // only wide work is lineitem ⋈ orders and the final rollup.
      Some("""SELECT n_name AS nation,
             |       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                      * (1 - CAST(l_discount AS DECIMAL(8,2)))
             |                    - CAST(p_retailprice AS DECIMAL(18,2))
             |                      * CAST(l_quantity AS DECIMAL(12,2))
             |                      * CAST(0.1 AS DECIMAL(2,1))), 4)
             |            AS DOUBLE) AS sum_profit
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON o_orderkey = l_orderkey
             |WHERE p_name LIKE '%red%'
             |-- group by the base column: the alias `nation` would resolve
             |-- to the nation TABLE (row-struct) in DuckDB, not the alias
             |GROUP BY n_name, o_year
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val profit = px * (lit(1) - disc) -
          col("p_retailprice").cast("decimal(18,2)") *
            col("l_quantity").cast("decimal(12,2)") * lit(0.1).cast("decimal(2,1)")
        ordered(
          t.lineitem
            .join(broadcast(t.part.filter(col("p_name").like("%red%"))
              .select(col("p_partkey"), col("p_retailprice"))),
              col("l_partkey") === col("p_partkey"))
            .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
              col("l_suppkey") === col("s_suppkey"))
            .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
            .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
            .agg(round(sum(profit), 4).cast("double").as("sum_profit"))
        )
      }
    ),
    Q(
      "tpch_q11",
      // Q11 shape (important stock): per-part value from one region's
      // suppliers, kept only if above a FRACTION OF THE GLOBAL TOTAL —
      // the scalar subquery becomes a broadcast of one row; both sides
      // exact decimal so the threshold comparison is engine-stable.
      Some("""WITH v AS (
             |  SELECT l_partkey,
             |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |             * CAST(l_quantity AS DECIMAL(12,2))) AS value
             |  FROM lineitem
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'ASIA'
             |  GROUP BY l_partkey
             |)
             |SELECT l_partkey, CAST(round(value, 4) AS DOUBLE) AS value
             |FROM v
             |WHERE value > (SELECT sum(value) * CAST(0.001 AS DECIMAL(4,3)) FROM v)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val v = t.lineitem
          .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(px * col("l_quantity").cast("decimal(12,2)")).as("value"))
          .cut(Shared) // feeds both the rows and the global total
        val thresh = v.agg(
          (sum(col("value")) * lit(0.001).cast("decimal(4,3)")).as("thresh"))
        ordered(
          v.join(broadcast(thresh))
            .filter(col("value") > col("thresh"))
            .select(col("l_partkey"), r4(col("value")).cast("double").as("value"))
        )
      }
    ),
    Q(
      "tpch_q12",
      // Q12 shape (shipping buckets): the schema has no l_shipmode, so the
      // bucket dimension is COMPUTED from the ship delay; high/low priority
      // counts are conditional sums. One fact join + one tiny rollup.
      Some("""SELECT
             |  CASE WHEN datediff('day', o_orderdate, l_shipdate) >= 90 THEN 'slow'
             |       WHEN datediff('day', o_orderdate, l_shipdate) >= 30 THEN 'medium'
             |       ELSE 'fast' END AS delay_bucket,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY delay_bucket
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val dd = datediff(col("l_shipdate"), col("o_orderdate"))
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        ordered(
          t.lineitem
            .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
            .join(t.orders.select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
            .groupBy(when(dd >= 90, "slow").when(dd >= 30, "medium")
              .otherwise("fast").as("delay_bucket"))
            .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
              sum(when(!high, 1).otherwise(0)).as("low_line_count"))
        )
      }
    ),
    Q(
      "tpch_q15",
      // Q15 shape (top supplier): quarterly revenue per supplier, then an
      // equality against the scalar MAX — exact decimal on both sides, so
      // "the" top supplier is engine-stable even under revenue ties.
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |             * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS total
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY l_suppkey
             |)
             |SELECT s_suppkey, s_name,
             |       CAST(round(total, 4) AS DOUBLE) AS total_revenue
             |FROM rev JOIN supplier ON s_suppkey = l_suppkey
             |WHERE total = (SELECT max(total) FROM rev)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val rev = t.lineitem
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey"))
          .agg(sum(px * (lit(1) - disc)).as("total"))
          .cut(Shared) // feeds both the rows and the scalar max
        val top = rev.agg(max(col("total")).as("mx"))
        ordered(
          rev.join(broadcast(top)).filter(col("total") === col("mx"))
            .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
            .select(col("s_suppkey"), col("s_name"),
              r4(col("total")).cast("double").as("total_revenue"))
        )
      }
    ),
    Q(
      "tpch_q16",
      // Q16 shape (supplier counts by part attribute): NOT IN becomes a
      // broadcast LEFT ANTI join against the excluded (negative-balance)
      // suppliers; count(DISTINCT) rides one hash aggregate.
      Some("""SELECT p_brand, p_type, p_size,
             |       count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#5'
             |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 49)
             |  AND l_suppkey NOT IN
             |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .join(broadcast(t.supplier.filter(col("s_acctbal") < 0)
              .select(col("s_suppkey"))),
              col("l_suppkey") === col("s_suppkey"), "left_anti")
            .join(broadcast(t.part.filter(col("p_brand") =!= "Brand#5" &&
              col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 49))),
              col("l_partkey") === col("p_partkey"))
            .groupBy(col("p_brand"), col("p_type"), col("p_size"))
            .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        )
      }
    ),
    Q(
      "tpch_q17",
      // Q17 shape (small-quantity revenue): the correlated per-part AVG is
      // one extra aggregate over the SAME part-restricted lineitem slice,
      // joined back on partkey. Integer-valued quantities sum exactly in
      // double, so the 0.2*avg threshold is bit-identical across engines.
      Some("""SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
             |                       AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#23' AND p_size <= 10
             |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
             |                    WHERE l2.l_partkey = p_partkey)""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val li = t.lineitem
          .join(broadcast(t.part.filter(col("p_brand") === "Brand#23" &&
            col("p_size") <= 10).select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .cut(Shared) // the slice feeds both the avg and the sum
        val avgq = li.groupBy(col("p_partkey").as("ap"))
          .agg(avg(col("l_quantity")).as("aq"))
        li.join(broadcast(avgq), col("l_partkey") === col("ap"))
          .filter(col("l_quantity") < lit(0.2) * col("aq"))
          .agg((round(sum(px).cast("double") / 7.0, 4))
            .cast("double").as("avg_yearly"))
      }
    ),
    Q(
      "tpch_q19",
      // Q19 shape (discounted revenue): a three-branch disjunction over
      // joined part+lineitem attributes — the classic test that OR'd
      // multi-table predicates still evaluate post-join without a plan
      // explosion. Single scan each side, broadcast dim.
      Some("""SELECT
             |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                 * (1 - CAST(l_discount AS DECIMAL(8,2)))), 4)
             |       AS DOUBLE) AS revenue,
             |  count(*) AS n
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val cond =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        t.lineitem
          .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"),
            col("p_size"))), col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(round(sum(px * (lit(1) - disc)), 4).cast("double").as("revenue"),
            count(lit(1)).as("n"))
      }
    ),
    Q(
      "tpch_q20",
      // Q20 shape (part promotion): the nested correlated aggregate —
      // suppliers who moved >30 units of some red part in 1997 — becomes
      // a grouped HAVING feeding a LEFT SEMI join; region dims broadcast.
      Some("""SELECT s_name, s_acctbal
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND s_suppkey IN (
             |    SELECT l_suppkey FROM lineitem
             |    JOIN part ON p_partkey = l_partkey
             |    WHERE p_name LIKE '%red%'
             |      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |    GROUP BY l_suppkey, l_partkey
             |    HAVING sum(l_quantity) > 30)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val movers = t.lineitem
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(broadcast(t.part.filter(col("p_name").like("%red%"))
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 30)
          .select(col("l_suppkey"))
        ordered(
          t.supplier
            .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
            .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
            .select(col("s_name"), col("s_acctbal"))
        )
      }
    ),
    Q(
      "tpch_q21",
      // Q21 shape (suppliers who kept orders waiting): the EXISTS /
      // NOT-EXISTS pair on the same fact — some OTHER supplier is on the
      // finished order, but NO other supplier shipped later — maps to a
      // left-semi then left-anti join with non-equi ship-date conditions.
      Some("""SELECT * FROM (
             |  SELECT s_name, count(*) AS numwait
             |  FROM lineitem l1
             |  JOIN orders ON o_orderkey = l1.l_orderkey
             |  JOIN supplier ON s_suppkey = l1.l_suppkey
             |  WHERE o_orderstatus = 'F'
             |    AND EXISTS (SELECT 1 FROM lineitem l2
             |                WHERE l2.l_orderkey = l1.l_orderkey
             |                  AND l2.l_suppkey <> l1.l_suppkey)
             |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                    WHERE l3.l_orderkey = l1.l_orderkey
             |                      AND l3.l_suppkey <> l1.l_suppkey
             |                      AND l3.l_shipdate > l1.l_shipdate)
             |  GROUP BY s_name
             |  ORDER BY numwait DESC, s_name ASC
             |  LIMIT 20)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val l1 = t.lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val l2 = t.lineitem.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        val l3 = t.lineitem.select(col("l_orderkey").as("o3"),
          col("l_suppkey").as("s3"), col("l_shipdate").as("d3"))
        ordered(
          l1.join(t.orders.filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
            .join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
              "left_semi")
            .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3") &&
              col("d3") > col("l_shipdate"), "left_anti")
            .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
              col("l_suppkey") === col("s_suppkey"))
            .groupBy(col("s_name"))
            .agg(count(lit(1)).as("numwait"))
            .orderBy(col("numwait").desc, col("s_name").asc)
            .limit(20)
        )
      }
    )
  )
}
