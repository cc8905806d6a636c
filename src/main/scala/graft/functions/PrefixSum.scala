package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.{CutSyntax, Shared}

/** EXACT distributed prefix sum without an unpartitioned window — the
  * range-partitioned-sort discipline (the plan Spark itself uses for a
  * global ORDER BY) applied to cumulative aggregation, so rank-formula
  * statistics (Mann-Whitney rank sums, Gini Σ rn·s, CDF positions)
  * never funnel an entity-sized relation through ONE WindowExec task.
  *
  * `Window.orderBy(value)` with an empty partition spec moves every row
  * to a single task; on a per-DISTINCT-VALUE relation over a continuous
  * measure that is still ~n rows (ties are measure-zero — grouping by
  * the value "reduces" nothing), which is the round-12 audit finding
  * this helper retires. The scale shape instead:
  *
  *   1. a GK sketch brackets B−1 range boundaries over the order
  *      column (ONE 1-row driver fold — the ExactNtile pass-1 trick;
  *      boundaries need not be exact, only deterministic: any monotone
  *      bucketing composes correctly);
  *   2. each row gets a bucket id by a pure per-row scalar against the
  *      driver-held boundaries (monotone in the order column);
  *   3. per-bucket totals — B rows, one hash aggregate with map-side
  *      partials — collect to DRIVER-HELD exclusive prefix offsets;
  *   4. the cumulative window runs PARTITIONED BY bucket (each bucket
  *      ~n/B rows — the same per-task slice a distributed sort gives)
  *      and the offset is added back as a per-row scalar.
  *
  * With B = spark.sql.shuffle.partitions the cost envelope equals a
  * distributed sort — the theoretical floor for any exact prefix sum —
  * and B grows with the cluster, not the data. Sums stay in their
  * native exact type (BIGINT counts, DECIMAL money): offsets are
  * carried as BigDecimal on the driver and cast back, so the result is
  * bit-identical to the single-window spelling (PrefixSumSpec pins
  * this on both long and decimal columns, ties included).
  */
object PrefixSum {

  /** Adds `cumName` = running sum of `sumCol` over rows ordered by
    * `orderCol` ascending. Rows must have DISTINCT non-null `orderCol`
    * values (callers aggregate per value first — that is what makes a
    * prefix sum over the relation well-defined without a tiebreak).
    * The input is multi-consumed (boundary sketch, bucket totals,
    * final plan) and is cut(Shared) here — pass it uncut. */
  def cumOverDistinct(
      df: DataFrame,
      orderCol: String,
      sumCol: String,
      cumName: String,
      buckets: Int = 0
  ): DataFrame =
    cumOverDistinct(df, orderCol, Seq(sumCol -> cumName), buckets)

  /** Multi-column form: several running sums over ONE shared bucket
    * assignment and offset pass (a KS test wants both half-CDFs; the
    * sketch, bucket scalar and totals aggregate are paid once). */
  def cumOverDistinct(
      df: DataFrame,
      orderCol: String,
      sums: Seq[(String, String)],
      buckets0: Int
  ): DataFrame = {
    // buckets <= 0 → auto: ride the session's shuffle-partition dial
    // (the knob that already grows with the cluster — Graft.session /
    // SPARK_GRAFT_SHUFFLE), capped where the per-row boundary/offset
    // scalars stop being cheap codegen; past the cap the offsets would
    // become a broadcast join on the bucket id (same plan, wider dial)
    val buckets =
      if (buckets0 > 0) buckets0
      else math.min(
        df.sparkSession.sessionState.conf.numShufflePartitions, 128)
    require(buckets >= 1, s"PrefixSum: buckets must be >= 1, got $buckets")
    require(sums.nonEmpty, "PrefixSum: no sum columns given")
    val base = df.cut(Shared)
    val od = col(orderCol).cast("double") // monotone bucket key
    val bounds: Seq[Double] =
      if (buckets == 1) Seq.empty
      else {
        val fracs = (1 until buckets).map(i => i.toDouble / buckets)
        base
          .agg(percentile_approx(od, array(fracs.map(lit): _*), lit(10000))
            .as("bs"))
          .collect()(0)
          .getAs[scala.collection.Seq[Double]]("bs").toSeq
      }
    // bucket id: #{boundaries strictly below} — duplicate boundary
    // values (heavy ties / tiny domains) just leave empty buckets
    val bucketCol = bounds
      .foldLeft(lit(0)) { (acc, b) => acc + when(od > b, 1).otherwise(0) }
    val withB = base.withColumn("__psb", bucketCol)
    // per-bucket totals -> driver-held EXCLUSIVE prefix offsets (B rows;
    // BigDecimal carries both BIGINT and DECIMAL sums exactly)
    val totalsDf = withB.groupBy(col("__psb"))
      .agg(sum(col(sums.head._1)).as("__t0"),
        sums.tail.zipWithIndex.map { case ((s, _), i) =>
          sum(col(s)).as(s"__t${i + 1}")
        }: _*)
    val sumTypes = sums.indices.map(i => totalsDf.schema(s"__t$i").dataType)
    val totalRows = totalsDf.collect()
      .map(r => (r.getInt(0),
        sums.indices.map(i => BigDecimal(r.get(i + 1).toString))))
      .sortBy(_._1)
    val accs = Array.fill(sums.length)(BigDecimal(0))
    val offsets: Seq[(Int, Seq[BigDecimal])] = totalRows.toSeq.map {
      case (b, ts) =>
        val o = (b, accs.toSeq)
        ts.zipWithIndex.foreach { case (t, i) => accs(i) += t }
        o
    }
    val wIn = Window.partitionBy(col("__psb")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCums = sums.zipWithIndex.foldLeft(withB) {
      case (acc0, ((sumCol, cumName), i)) =>
        val st = sumTypes(i)
        val offCol = offsets
          .foldLeft(lit(null).cast(st.sql)) { case (acc, (b, offs)) =>
            when(col("__psb") === b, lit(offs(i).underlying).cast(st.sql))
              .otherwise(acc)
          }
        acc0.withColumn(cumName,
          (coalesce(offCol, lit(0).cast(st.sql)) +
            sum(col(sumCol)).over(wIn)).cast(st.sql))
    }
    withCums.drop("__psb")
  }
}
