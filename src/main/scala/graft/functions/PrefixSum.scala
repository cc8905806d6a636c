package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
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
  *
  * Offsets reach the rows one of two ways: a codegen'd when-chain for
  * the ungrouped ≤128-bucket case (no join, no shuffle — the common
  * dial), or a BROADCAST JOIN on the bucket key past that cap and for
  * every GROUPED call (the offset table is |groups|×B rows — still a
  * driver-held grid, but a when-chain of that width would blow codegen;
  * the broadcast join is the same plan with a wider dial —
  * PrefixSumSpec pins bit-parity across both paths).
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
  ): DataFrame =
    cumOverDistinctBy(df, Seq.empty, orderCol, sums, buckets0)

  /** GROUPED form: `cumName` = running sum of `sumCol` over rows
    * ordered by `orderCol` ascending WITHIN each `partCols` group (the
    * per-source CDF of d7_quantile_norm; per-cohort rank statistics).
    * Rows must have distinct non-null `orderCol` values per group.
    *
    * Shape: boundaries stay GLOBAL over the order column (one GK fold —
    * a monotone bucketing composes under any grouping), buckets become
    * (group, range-bucket) — each holding ~n/(|groups|·B) rows — and
    * the driver holds |groups|×B exclusive offsets keyed by group,
    * applied back via a broadcast join. The driver grid requires
    * |groups| bounded (a literal code domain: source, lang, variant) —
    * exactly the case where a plain Window.partitionBy(group) would
    * push corpus/|groups| rows through each sort task at 100 TB. For
    * entity-keyed groups (millions of small groups) use the plain
    * window: its partitions are already fine-grained there. */
  def cumOverDistinctBy(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      sumCol: String,
      cumName: String
  ): DataFrame =
    cumOverDistinctBy(df, partCols, orderCol, Seq(sumCol -> cumName), 0)

  def cumOverDistinctBy(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      sums: Seq[(String, String)],
      buckets0: Int
  ): DataFrame = {
    // buckets <= 0 → auto: ride the session's shuffle-partition dial
    // (the knob that already grows with the cluster — Graft.session /
    // SPARK_GRAFT_SHUFFLE). No hard cap: past 128 the offsets switch
    // from the codegen when-chain to the broadcast join below, so a
    // cluster-sized dial widens the plan instead of blowing codegen.
    val buckets =
      if (buckets0 > 0) buckets0
      else df.sparkSession.sessionState.conf.numShufflePartitions
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
    // per-(group, bucket) totals -> driver-held EXCLUSIVE prefix
    // offsets per group (|groups|×B rows; BigDecimal carries both
    // BIGINT and DECIMAL sums exactly). coalesce: an all-null sumCol
    // slice must yield a ZERO total, not a driver NPE (ADVICE r13) —
    // matching the window side, where sum over nulls adds nothing.
    val keyCols = partCols.map(col) :+ col("__psb")
    val totalsDf = withB.groupBy(keyCols: _*)
      .agg(coalesce(sum(col(sums.head._1)), lit(0)).as("__t0"),
        sums.tail.zipWithIndex.map { case ((s, _), i) =>
          coalesce(sum(col(s)), lit(0)).as(s"__t${i + 1}")
        }: _*)
    val g = partCols.length
    val sumTypes = sums.indices.map(i => totalsDf.schema(s"__t$i").dataType)
    val totalRows = totalsDf.collect()
      .map(r => (partCols.indices.map(r.get).toSeq, r.getInt(g),
        sums.indices.map(i => BigDecimal(r.get(g + 1 + i).toString))))
      .sortBy(_._2)
    // exclusive running offsets WITHIN each group, in bucket order
    val accByGroup =
      scala.collection.mutable.Map.empty[Seq[Any], Array[BigDecimal]]
    val offsets: Seq[(Seq[Any], Int, Seq[BigDecimal])] = totalRows.toSeq.map {
      case (grp, b, ts) =>
        val accs =
          accByGroup.getOrElseUpdate(grp, Array.fill(sums.length)(BigDecimal(0)))
        val o = (grp, b, accs.toSeq)
        ts.zipWithIndex.foreach { case (t, i) => accs(i) += t }
        o
    }
    val wIn = Window.partitionBy(keyCols: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOffsets: DataFrame =
      if (partCols.isEmpty && offsets.size <= 128) {
        // codegen when-chain: no join, offsets inlined as literals —
        // the original path, kept so common plans stay digest-stable
        sums.indices.foldLeft(withB) { (acc0, i) =>
          val st = sumTypes(i)
          val offCol = offsets
            .foldLeft(lit(null).cast(st.sql)) { case (acc, (_, b, offs)) =>
              when(col("__psb") === b, lit(offs(i).underlying).cast(st.sql))
                .otherwise(acc)
            }
          acc0.withColumn(s"__pso$i", offCol)
        }
      } else {
        // broadcast join on (group, bucket): the offsets relation is a
        // driver-held grid (|groups|×B rows) re-planted as a
        // LocalRelation (the Bounded.local discipline — no upstream
        // lineage, broadcasts naturally, survives executor loss);
        // offsets travel as exact decimal STRINGS and cast back to the
        // native sum type, so the join path is bit-identical to the
        // when-chain
        val spark = df.sparkSession
        val offSchema = StructType(
          partCols.map(c => totalsDf.schema(c)) ++
            (StructField("__psb", IntegerType) +:
              sums.indices.map(i =>
                StructField(s"__psos$i", org.apache.spark.sql.types.StringType))))
        val offRows: java.util.List[Row] = java.util.Arrays.asList(
          offsets.map { case (grp, b, offs) =>
            Row.fromSeq(grp ++ (b +: offs.map(_.underlying.toPlainString)))
          }: _*)
        val offDf = spark.createDataFrame(offRows, offSchema)
          .select((partCols.map(col) :+ col("__psb")) ++
            sums.indices.map(i =>
              col(s"__psos$i").cast(sumTypes(i).sql).as(s"__pso$i")): _*)
        // eqNullSafe: a null GROUP value is a legitimate group key
        val cond = (partCols :+ "__psb")
          .map(c => withB(c) <=> offDf(c))
          .reduce(_ && _)
        partCols.foldLeft(
          withB.join(broadcast(offDf), cond).drop(offDf("__psb"))) {
          (d, c) => d.drop(offDf(c))
        }
      }
    val withCums = sums.zipWithIndex.foldLeft(withOffsets) {
      case (acc0, ((sumCol, cumName), i)) =>
        val st = sumTypes(i)
        acc0.withColumn(cumName,
          (coalesce(col(s"__pso$i"), lit(0).cast(st.sql)) +
            sum(col(sumCol)).over(wIn)).cast(st.sql))
    }
    withCums.drop("__psb").drop(sums.indices.map(i => s"__pso$i"): _*)
  }
}
