package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SkewJoin

/** Sketch-driven join strategy: the `s18_join_size_estimate` CMS machinery
  * promoted from a diagnostic query to an actual plan decision — the same
  * plan↔reality loop `d5_lsh_recall_measured` closes for LSH banding.
  *
  * One scan per side builds a depth×width count-min sketch of the join-key
  * frequencies (map-side combine into ≤ depth·width cells, so the shuffle
  * carries ≤ 256 rows per task regardless of input size) and the exact row
  * count rides the same pass for free. From the two sketches the driver
  * derives:
  *
  *   - per-side row counts (the seed-0 marginal),
  *   - the join OUTPUT estimate: min over seeds of the cell dot product
  *     (AMS/CMS inner product — one-sided, est ≥ exact, collisions only
  *     add mass).
  *
  * `plan()` then picks the physical strategy the way a cost-based
  * optimizer would, and expresses it through Spark's own hint surface so
  * Catalyst/AQE still own the execution:
  *
  *   - `broadcast`: the smaller side fits the row budget → `broadcast()`
  *     hint (row count is the sketch-visible proxy for bytes; the byte
  *     budget is a deployment dial).
  *   - `salt`: output estimate ≫ input volume means hot keys would pile
  *     onto single reducers → salted equi-join (SkewJoin), the manual
  *     valve for when AQE's skew split can't see the skew up front.
  *   - `shuffle`: honest big⋈big → plain equi-join (SMJ under AQE).
  *
  * All three strategies are row-identical by construction — the decision
  * picks a PLAN, never a result — and `SqlParity`/oracle checks pin that.
  * 100 TB shape: the sketch pass touches each relation once (or never:
  * a production deployment persists per-table sketches at ingest and the
  * planner joins 256-cell tables); the decision itself is driver-side
  * arithmetic on ≤ 2·depth·width longs.
  */
object SketchCbo {

  val Depth = 4
  // wider than the s18 diagnostic's 64: the decision below subtracts the
  // expected collision mass rowsL·rowsR/Width, and the residual noise
  // shrinks as 1/Width — 4×256 longs is still nothing to collect
  val Width = 256

  /** xxhash64 bucketing, NOT the portable-md5 discipline of
    * `s18_join_size_estimate`: nothing replays these cells in an oracle
    * (correctness is pinned on the JOIN RESULT, which is
    * strategy-invariant), so the sketch pass gets the codegen'd
    * integer hash — an order of magnitude cheaper per row than md5
    * string hashing, which matters when the pass scans the full fact. */
  private def bucket(seed: Column, key: Column): Column =
    pmod(xxhash64(seed, key), lit(Width.toLong))

  /** One scan: the depth×width frequency sketch of `key`. Null keys are
    * excluded: xxhash64 skips null arguments, so without the filter every
    * null-key row would collapse into one bucket per seed, inflating both
    * the row counts and the output estimate with rows an inner join drops
    * — on null-heavy keys that mis-steers the decision (spurious salt,
    * missed broadcast). With the filter, `rowsL`/`rowsR` (the seed-0
    * marginal) count exactly the joinable rows. */
  /** The sketch as a relation: ≤ Depth·Width rows of (seed, bucket, tot).
    * This is what a production deployment persists per table at ingest —
    * the planner then joins 1 KB cell tables instead of re-scanning the
    * corpus (see [[writeSketch]]/[[planFromSketches]]). */
  def sketchTable(df: DataFrame, key: Column): DataFrame =
    df.filter(key.isNotNull)
      .select(explode(array((0 until Depth).map { s =>
        struct(lit(s).as("seed"), bucket(lit(s), key).as("bucket"))
      }: _*)).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("tot"))

  /** Persist the per-table sketch at ingest time (one scan, 1 KB out). */
  def writeSketch(df: DataFrame, key: Column, path: String): Unit =
    sketchTable(df, key).coalesce(1).write.mode("overwrite").parquet(path)

  /** Materialize a sketch relation (live or read back from parquet) into
    * the dense cell array the decision arithmetic runs on. */
  def toCells(sketch: DataFrame): Array[Array[Long]] = {
    val out = Array.fill(Depth, Width)(0L)
    sketch.select(col("seed").cast("int"), col("bucket").cast("int"),
        col("tot").cast("long"))
      .collect()
      .foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    out
  }

  private def cells(df: DataFrame, key: Column): Array[Array[Long]] =
    toCells(sketchTable(df, key))

  final case class JoinEstimate(
      rowsLeft: Long,
      rowsRight: Long,
      estOutput: BigInt,
      estCorrected: BigInt,
      strategy: String)

  /** Sketch both sides and estimate |left ⋈ right| on the key. */
  def estimate(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column): (Array[Array[Long]], Array[Array[Long]], BigInt) = {
    val l = cells(left, leftKey)
    val r = cells(right, rightKey)
    // BigInt: two hot cells of ~2^31 each already overflow a Long product sum
    val est = (0 until Depth).map { s =>
      (0 until Width).map(b => BigInt(l(s)(b)) * BigInt(r(s)(b))).sum
    }.min
    (l, r, est)
  }

  final case class Planned(df: DataFrame, est: JoinEstimate)

  /** Inner equi-join with the physical strategy chosen from the sketches.
    *
    * @param broadcastRowLimit a side at or under this many rows gets the
    *   `broadcast()` hint (the row-count stand-in for the byte budget —
    *   on a cluster this is executor-memory / avg-row-size).
    * @param saltFanout when estOutput exceeds `saltFanout × max(rows)`,
    *   hot keys dominate and the join is salted `saltBuckets` ways.
    * @param leftSaltSource deterministic per-row column for the salt
    *   (SkewJoin's discipline: retries and speculative tasks must agree).
    */
  def plan(
      left: DataFrame,
      right: DataFrame,
      key: String,
      broadcastRowLimit: Long = 500000,
      saltFanout: Double = 4.0,
      saltBuckets: Int = 8,
      leftSaltSource: Option[Column] = None): Planned = {
    val (l, r, _) = estimate(left, right, col(key), col(key))
    planFromCells(left, right, key, l, r,
      broadcastRowLimit, saltFanout, saltBuckets, leftSaltSource)
  }

  /** [[plan]] but from PERSISTED sketches — the production path: the
    * cell tables were written at ingest ([[writeSketch]]), so planning
    * reads two ≤1 KB parquet files and never scans either join side.
    * Decision arithmetic is byte-identical to the live path (both call
    * [[planFromCells]]), which `ScaleShapeSpec` pins. */
  def planFromSketches(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftSketch: DataFrame,
      rightSketch: DataFrame,
      broadcastRowLimit: Long = 500000,
      saltFanout: Double = 4.0,
      saltBuckets: Int = 8,
      leftSaltSource: Option[Column] = None): Planned =
    planFromCells(left, right, key, toCells(leftSketch), toCells(rightSketch),
      broadcastRowLimit, saltFanout, saltBuckets, leftSaltSource)

  private def planFromCells(
      left: DataFrame,
      right: DataFrame,
      key: String,
      l: Array[Array[Long]],
      r: Array[Array[Long]],
      broadcastRowLimit: Long,
      saltFanout: Double,
      saltBuckets: Int,
      leftSaltSource: Option[Column]): Planned = {
    // BigInt: two hot cells of ~2^31 each already overflow a Long product sum
    val est = (0 until Depth).map { s =>
      (0 until Width).map(b => BigInt(l(s)(b)) * BigInt(r(s)(b))).sum
    }.min
    val rowsL = l(0).sum
    val rowsR = r(0).sum
    // the raw min-dot is one-sided (est >= exact) but carries an expected
    // collision mass of rowsL·rowsR/Width under the hash family; subtract
    // it for the DECISION (an F2-style bias correction) while reporting
    // the honest one-sided figure in estOutput
    val corrected = (est - BigInt(rowsL) * BigInt(rowsR) / Width).max(BigInt(0))
    val strategy =
      if (math.min(rowsL, rowsR) <= broadcastRowLimit) "broadcast"
      else if (corrected > BigInt((saltFanout * math.max(rowsL, rowsR)).toLong)) "salt"
      else "shuffle"
    val joined = strategy match {
      case "broadcast" =>
        if (rowsR <= rowsL) left.join(broadcast(right), key)
        else broadcast(left).join(right, key)
      case "salt" =>
        // replicate the smaller side saltBuckets ways, salt the bigger.
        // `leftSaltSource` is a column OF `left`, so it is honored only
        // when `left` is the salted (bigger) side; when the sides swap,
        // fall back to the xxhash64-of-all-columns default — resolving a
        // left-rooted column against `right` would throw at plan time,
        // or worse, a same-named right column would silently salt by an
        // unrelated value
        if (rowsR <= rowsL)
          SkewJoin.saltedInnerJoin(left, right, key,
            leftSaltSource.getOrElse(
              xxhash64(left.columns.map(col).toIndexedSeq: _*)),
            saltBuckets)
        else
          SkewJoin.saltedInnerJoin(right, left, key,
            xxhash64(right.columns.map(col).toIndexedSeq: _*), saltBuckets)
      case _ => left.join(right, key)
    }
    Planned(joined, JoinEstimate(rowsL, rowsR, est, corrected, strategy))
  }
}
