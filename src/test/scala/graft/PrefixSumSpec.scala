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
