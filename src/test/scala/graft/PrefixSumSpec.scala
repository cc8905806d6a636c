package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PrefixSum

/** The range-bucketed distributed prefix sum, pinned in isolation:
  * bit-parity with the single-window spelling on BIGINT and DECIMAL
  * sum columns, plan shape (no empty-partition window — the cumulative
  * window must be partitioned by the range bucket), and the degenerate
  * regimes (tiny domains where most GK boundaries collapse, one
  * bucket, skewed distributions).
  */
class PrefixSumSpec extends AnyFunSuite {
  import SharedSpark._

  /** The semantics being reproduced: one global cumulative window. */
  private def truth(df: DataFrame, orderCol: String, sumCol: String)
      : Map[Double, BigDecimal] =
    df.withColumn("cum", sum(col(sumCol)).over(Window.orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect()
      .map(r => r.getAs[Number](orderCol).doubleValue() ->
        BigDecimal(r.getAs[Any]("cum").toString)).toMap

  private def got(df: DataFrame, orderCol: String, sumCol: String,
      buckets: Int): Map[Double, BigDecimal] =
    PrefixSum.cumOverDistinct(df, orderCol, sumCol, "cum", buckets)
      .collect()
      .map(r => r.getAs[Number](orderCol).doubleValue() ->
        BigDecimal(r.getAs[Any]("cum").toString)).toMap

  test("bigint sums: bit-parity with the global window, many buckets") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 37 % 5000).toDouble, (i % 7 + 1).toLong))
      .toDF("v", "c")
    assert(got(df, "v", "c", 32) == truth(df, "v", "c"))
  }

  test("decimal sums: exact parity, money-typed") {
    import spark.implicits._
    val df = (1 to 3000)
      .map(i => ((i * 13 % 3000).toDouble, BigDecimal(i).setScale(4) / 100))
      .toDF("v", "m")
      .select(col("v"), col("m").cast("decimal(18,4)").as("m"))
    assert(got(df, "v", "m", 16) == truth(df, "v", "m"))
  }

  test("tiny domain (fewer distinct values than buckets): boundaries collapse, still exact") {
    import spark.implicits._
    val df = (1 to 5).map(i => (i.toDouble, i.toLong * 10)).toDF("v", "c")
    assert(got(df, "v", "c", 32) == truth(df, "v", "c"))
  }

  test("single bucket degenerates to the plain window") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, 1L)).toDF("v", "c")
    assert(got(df, "v", "c", 1) == truth(df, "v", "c"))
  }

  test("skew (99% of mass in one narrow range): exact") {
    import spark.implicits._
    val df = ((1 to 990).map(i => (1.0 + i * 1e-6, i.toLong)) ++
      (1 to 10).map(i => (1000.0 + i, 5L))).toDF("v", "c")
    assert(got(df, "v", "c", 8) == truth(df, "v", "c"))
  }

  test("past the when-chain cap (B>128): offsets arrive by broadcast join, bit-parity held") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 37 % 5000).toDouble, (i % 7 + 1).toLong))
      .toDF("v", "c")
    // the join path must be bit-identical to the when-chain path
    assert(got(df, "v", "c", 200) == got(df, "v", "c", 32))
    assert(got(df, "v", "c", 200) == truth(df, "v", "c"))
    // and it must actually BE the join plan (a when-chain of 200 terms
    // would blow codegen at a cluster-sized shuffle-partition dial)
    val out = PrefixSum.cumOverDistinct(df, "v", "c", "cum", 200)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"B=200 did not choose the broadcast-join offset path:\n$plan")
  }

  test("all-null sum slice: zero offset, no driver NPE (ADVICE r13)") {
    import spark.implicits._
    // every row in the low range has a NULL sum value — its bucket's
    // total must fold to 0, not crash BigDecimal(null.toString)
    val df = ((1 to 500).map(i => (i.toDouble, None: Option[Long])) ++
      (501 to 1000).map(i => (i.toDouble, Some(1L)))).toDF("v", "c")
    val out = PrefixSum.cumOverDistinct(df, "v", "c", "cum", 8)
      .collect().map(r => r.getDouble(0) -> Option(r.get(2))).toMap
    assert(out(1.0).isEmpty || out(1.0).contains(0L)) // sum over nulls
    assert(out(1000.0).contains(500L))
  }

  /** Grouped truth: one cumulative window per group. */
  private def truthBy(df: DataFrame, part: String, orderCol: String,
      sumCol: String): Map[(String, Double), BigDecimal] =
    df.withColumn("cum", sum(col(sumCol)).over(
        Window.partitionBy(col(part)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect()
      .map(r => (r.getAs[String](part),
        r.getAs[Number](orderCol).doubleValue()) ->
        BigDecimal(r.getAs[Any]("cum").toString)).toMap

  test("grouped form: per-group bit-parity with the partitioned window, ties across groups") {
    import spark.implicits._
    // the same order value appears in MULTIPLE groups (distinct only
    // within a group — the documented contract) and group sizes are
    // skewed 10:1
    val df = ((1 to 3000).map(i => ("a", (i % 300).toDouble, (i % 5 + 1).toLong)) ++
      (1 to 300).map(i => ("b", (i % 300).toDouble, 2L)))
      .toDF("g", "v", "c")
      .groupBy("g", "v").agg(sum("c").as("c"))
    val gotBy = PrefixSum
      .cumOverDistinctBy(df, Seq("g"), "v", "c", "cum")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Number]("v").doubleValue()) ->
        BigDecimal(r.getAs[Any]("cum").toString)).toMap
    assert(gotBy == truthBy(df, "g", "v", "c"))
  }

  test("grouped form: no window partitioned solely by the group key in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 2000).map(i => (s"s${i % 4}", i.toDouble, 1L)).toDF("g", "v", "c")
    val out = PrefixSum.cumOverDistinctBy(df, Seq("g"), "v", "c", "cum")
    val groupOnly = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.nonEmpty &&
        w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet == Set("g") => w
    }
    assert(groupOnly.isEmpty,
      "grouped PrefixSum leaked a window partitioned only by the literal-domain group " +
        "— each partition would be corpus/|groups| at 100 TB")
  }

  test("plan shape: the cumulative window is PARTITIONED by the range bucket") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 2000).map(i => (i.toDouble, 1L)).toDF("v", "c")
    val out = PrefixSum.cumOverDistinct(df, "v", "c", "cum", 16)
    val emptySpec = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(emptySpec.isEmpty,
      "PrefixSum leaked an empty-partition window — the single-task shape it exists to remove")
  }
}
