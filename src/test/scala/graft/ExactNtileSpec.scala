package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ExactNtile

/** The t23 quintile machinery, pinned in isolation: exact ntile parity
  * on every tie regime, and — the round-10 caveat, now implemented —
  * the guarantee that NO refine band exceeds a small row bound even
  * when most rows share one sort value (the single-partition hazard
  * the GK-band rewrite exists to remove).
  */
class ExactNtileSpec extends AnyFunSuite {
  import SharedSpark._

  private val K = 5

  /** Brute-force ntile(K) with the (v, id) tie-break — the semantics
    * ExactNtile must reproduce bit-for-bit. */
  private def ntileTruth(df: DataFrame): Map[Long, Int] =
    df.withColumn("nt", ntile(K).over(Window.orderBy(col("v"), col("id"))))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("nt")).toMap

  private def viaExactNtile(df: DataFrame, n: Long,
      tieRefine: Long = 1024): (Map[Long, Int], Seq[(ExactNtile.Band, Long)]) = {
    val cuts = ExactNtile.ntileCuts(n, K)
    val bands = ExactNtile.bands(df, Seq("v"), "id", cuts, n,
      tieRefine = tieRefine)
    val sizes = bands.map(b => b -> df.filter(b.cond).count())
    val keys = ExactNtile.boundaries(df, bands, "id")("v")
    val got = df.withColumn("nt", ExactNtile.bucket("v", "id", keys))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("nt")).toMap
    (got, sizes)
  }

  private def mkDf(rows: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("distinct values: exact ntile parity, bands ~2·eps·n") {
    val n = 5000L
    val df = mkDf((1L to n).map(i => (i, (i * 37 % n).toDouble)))
    val (got, sizes) = viaExactNtile(df, n)
    assert(got == ntileTruth(df))
    // strictly-inside/tie bands: ≤ 2·eps·n + GK error + endpoint rows
    val bound = (2 * 0.001 * n + 2 * n / 10000.0 + 8).toLong
    sizes.foreach { case (b, s) =>
      assert(s <= bound, s"band ${b.measure}/${b.idx} holds $s rows > $bound")
    }
  }

  test("tie-dominated (90% of rows share one value): parity AND bounded bands") {
    val n = 5000L
    // ids 1..4500 all have v=1.0 (the freq=1 regime); the rest spread
    val df = mkDf((1L to n).map(i => (i, if (i <= 4500) 1.0 else i.toDouble)))
    val (got, sizes) = viaExactNtile(df, n)
    assert(got == ntileTruth(df))
    // pre-fix behavior: the lo==hi band at the cuts inside the tie run
    // held all 4500 tied rows in ONE rank partition. Now the id
    // re-bracketing caps every band near 2·eps·m.
    val bound = (2 * 0.001 * n + 2 * n / 10000.0 + 8).toLong
    sizes.foreach { case (b, s) =>
      assert(s <= bound, s"band ${b.measure}/${b.idx} holds $s rows > $bound " +
        "(heavy-tie band not re-bracketed)")
    }
  }

  test("ALL rows one value: every cut in the tie run, still exact and bounded") {
    val n = 3000L
    val df = mkDf((1L to n).map(i => (i, 7.0)))
    val (got, sizes) = viaExactNtile(df, n)
    assert(got == ntileTruth(df))
    val bound = (2 * 0.001 * n + 2 * n / 10000.0 + 8).toLong
    sizes.foreach { case (b, s) => assert(s <= bound) }
  }

  test("small tie runs skip the id re-bracket but stay exact") {
    val n = 1000L
    // runs of 9 duplicates — under the tieRefine threshold, so the tie
    // run itself is the band (tiny), no extra passes
    val df = mkDf((1L to n).map(i => (i, (i / 9).toDouble)))
    val (got, sizes) = viaExactNtile(df, n)
    assert(got == ntileTruth(df))
    sizes.foreach { case (_, s) => assert(s <= 16) }
  }

  test("low threshold forces the id re-bracket path on modest ties") {
    val n = 1000L
    val df = mkDf((1L to n).map(i => (i, if (i <= 600) 2.0 else i.toDouble)))
    // tieRefine=32 forces the heavy-tie path for the 600-row run
    val (got, sizes) = viaExactNtile(df, n, tieRefine = 32)
    assert(got == ntileTruth(df))
    sizes.foreach { case (b, s) =>
      assert(s <= 32, s"band ${b.measure}/${b.idx}: $s rows — id band did not engage")
    }
  }
}
