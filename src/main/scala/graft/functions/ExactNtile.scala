package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT ntile-boundary keys without a global window — the
  * a9_approx_quantiles discipline generalized (extracted from
  * t23_rfm_segmentation, now with the tie special-case its round-10
  * caveat prescribed).
  *
  * Given a per-key relation with uniform-ASC double sort columns and a
  * unique Long tie-break id, ntile(k)'s bucket edges are the exact
  * order-statistic KEYS (sort value, id) at the k−1 cut ranks. Finding
  * each key costs bounded passes instead of one all-rows window:
  *
  *   1. a GK sketch brackets each cut's value in [lo, hi]
  *      (`percentile_approx` at the cut fraction ∓ eps);
  *   2. ONE exact pass counts, per cut, the rows strictly below lo,
  *      equal to lo, strictly below hi, and equal to hi;
  *   3. arithmetic on those counts decides WHERE the boundary row
  *      lives — inside the lo-tie run, inside the hi-tie run, or
  *      strictly between — and builds a refine band that is bounded in
  *      EVERY tie regime:
  *        - strictly-inside: ≤ ~2·eps·n rows by the GK rank bound
  *          (tie masses at the endpoints are EXCLUDED — this was the
  *          unhandled hazard: an inclusive [lo, hi] band swallows the
  *          whole endpoint tie run);
  *        - tie run ≤ `tieRefine` rows: the run itself is the band;
  *        - tie run > `tieRefine` rows (e.g. most users sharing
  *          freq=1): the SAME sketch→count→band trick applied to the
  *          unique id WITHIN the run (ids are unique, so no recursion)
  *          — two more bounded passes, only paid when a heavy tie
  *          actually straddles a cut;
  *   4. a rank window over the union of all bands — each a ~2·eps
  *      fraction partition — picks the exact keys.
  *
  * Bucket assignment is then a pure per-row scalar against the k−1
  * driver-held keys (rank > cut ⟺ key > boundary key, keys unique by
  * the id tie-break) — bit-identical to ntile, zero global windows.
  */
object ExactNtile {

  /** One refine band: rows matching `cond` ranked by (measure, id);
    * the `pick`-th is the boundary key for (`measure`, cut `idx`). */
  final case class Band(measure: String, idx: Int, cond: Column, pick: Long)

  private def clamp(d: Double): Double = math.min(1.0, math.max(0.0, d))

  /** Passes 1–2 (+ tie refinement when needed): one Band per
    * (measure, cut rank). `cuts` are global ranks (1-based) shared by
    * every measure; `base` must hold `measures` as double columns and
    * `idCol` as a unique Long. */
  def bands(
      base: DataFrame,
      measures: Seq[String],
      idCol: String,
      cuts: Seq[Long],
      n: Long,
      accuracy: Int = 10000,
      eps: Double = 0.001,
      tieRefine: Long = 1024
  ): Seq[Band] = {
    val qs = cuts.map(k => k.toDouble / n)
    // pass 1: GK sketch brackets every cut's value
    val skCols = measures.flatMap(c => Seq(
      percentile_approx(col(c),
        array(qs.map(q => lit(clamp(q - eps))): _*), lit(accuracy))
        .as(s"lo_$c"),
      percentile_approx(col(c),
        array(qs.map(q => lit(clamp(q + eps))): _*), lit(accuracy))
        .as(s"hi_$c")))
    val sk = base.agg(skCols.head, skCols.tail: _*).collect()(0)
    val bracket: Seq[(String, Int, Double, Double)] = measures.flatMap { c =>
      val lo = sk.getAs[scala.collection.Seq[Double]](s"lo_$c")
      val hi = sk.getAs[scala.collection.Seq[Double]](s"hi_$c")
      lo.zip(hi).zipWithIndex.map { case ((l, h), i) => (c, i, l, h) }
    }
    // pass 2: exact tie-aware counts around both endpoints, one job
    val cntCols = bracket.flatMap { case (c, i, lo, hi) => Seq(
      sum(when(col(c) < lo, 1L).otherwise(0L)).as(s"clt_${c}_$i"),
      sum(when(col(c) === lo, 1L).otherwise(0L)).as(s"ceqlo_${c}_$i"),
      sum(when(col(c) < hi, 1L).otherwise(0L)).as(s"clthi_${c}_$i"),
      sum(when(col(c) === hi, 1L).otherwise(0L)).as(s"ceqhi_${c}_$i"))
    }
    val cnt = base.agg(cntCols.head, cntCols.tail: _*).collect()(0)
    def g(name: String): Long = cnt.getAs[Long](name)

    // arithmetic classification: where does the boundary row live?
    sealed trait Loc
    case class InTie(value: Double, innerPick: Long, tieSize: Long) extends Loc
    case class Between(lo: Double, hi: Double, pick: Long) extends Loc
    val located: Seq[(String, Int, Loc)] = bracket.map { case (c, i, lo, hi) =>
      val pick = cuts(i)
      val clt = g(s"clt_${c}_$i"); val ceqLo = g(s"ceqlo_${c}_$i")
      val cltHi = g(s"clthi_${c}_$i"); val ceqHi = g(s"ceqhi_${c}_$i")
      val loc =
        if (pick <= clt + ceqLo) InTie(lo, pick - clt, ceqLo)
        else if (pick > cltHi) InTie(hi, pick - cltHi, ceqHi)
        else Between(lo, hi, pick - clt - ceqLo)
      // the GK bound guarantees the rank-`pick` value is inside [lo,hi];
      // if the sketch contract ever broke, the band would miss the key
      // and the caller's arity require() fails loudly — but catch the
      // arithmetic variant here too
      loc match {
        case InTie(_, p, m) => require(p >= 1 && p <= m,
          s"ExactNtile: cut $i of $c fell outside the GK bracket")
        case _ => ()
      }
      (c, i, loc)
    }

    // heavy tie runs straddling a cut: bracket the id within the run
    // (passes 2b/2c — only when the hazard is real)
    val heavy = located.collect {
      case (c, i, t @ InTie(_, _, m)) if m > tieRefine => (c, i, t)
    }
    val idBands: Map[(String, Int), (Long, Long, Long)] =
      if (heavy.isEmpty) Map.empty
      else {
        val sketchCols = heavy.flatMap { case (c, i, InTie(v, p, m)) =>
          val q = p.toDouble / m
          Seq(
            percentile_approx(when(col(c) === v, col(idCol)),
              lit(clamp(q - eps)), lit(accuracy)).as(s"ulo_${c}_$i"),
            percentile_approx(when(col(c) === v, col(idCol)),
              lit(clamp(q + eps)), lit(accuracy)).as(s"uhi_${c}_$i"))
        }
        val usk = base.agg(sketchCols.head, sketchCols.tail: _*).collect()(0)
        def uget(r: Row, name: String): Long = r.getAs[Number](name).longValue()
        val belowCols = heavy.map { case (c, i, InTie(v, _, _)) =>
          sum(when(col(c) === v && col(idCol) < uget(usk, s"ulo_${c}_$i"), 1L)
            .otherwise(0L)).as(s"cu_${c}_$i")
        }
        val cb = base.agg(belowCols.head, belowCols.tail: _*).collect()(0)
        heavy.map { case (c, i, _) =>
          (c, i) -> (uget(usk, s"ulo_${c}_$i"), uget(usk, s"uhi_${c}_$i"),
            cb.getAs[Long](s"cu_${c}_$i"))
        }.toMap
      }

    located.map {
      case (c, i, InTie(v, p, m)) if m > tieRefine =>
        val (ulo, uhi, cu) = idBands((c, i))
        Band(c, i, col(c) === v && col(idCol) >= ulo && col(idCol) <= uhi,
          p - cu)
      case (c, i, InTie(v, p, _)) =>
        Band(c, i, col(c) === v, p)
      case (c, i, Between(lo, hi, p)) =>
        Band(c, i, col(c) > lo && col(c) < hi, p)
    }
  }

  /** Pass 4: rank inside each band, pick the exact boundary keys.
    * Returns measure -> cut-ordered (value, id) keys; `require`s one
    * key per band (the loud-failure contract: a broken sketch bound
    * can never silently mis-bucket). */
  def boundaries(
      base: DataFrame,
      bands: Seq[Band],
      idCol: String
  ): Map[String, Seq[(Double, Long)]] = {
    val picked = base.select(col(idCol) +: bands.map(_.measure).distinct
        .map(col): _*)
      .select(col(idCol), explode(array(
        bands.map { b =>
          struct(lit(b.measure).as("mm"), lit(b.idx).as("b"),
            col(b.measure).as("s"), b.cond.as("in"), lit(b.pick).as("pick"))
        }: _*)).as("e"))
      .select(col(idCol), col("e.*"))
      .filter(col("in"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("mm"), col("b"))
          .orderBy(col("s"), col(idCol))).cast("long"))
      .filter(col("rn") === col("pick"))
      .select(col("mm"), col("b"), col("s"), col(idCol)).collect()
    require(picked.length == bands.length,
      s"ExactNtile: expected ${bands.length} boundary keys, got ${picked.length}")
    picked.groupBy(_.getString(0)).map { case (c, rows) =>
      c -> rows.sortBy(_.getInt(1)).map(r => (r.getDouble(2), r.getLong(3))).toSeq
    }
  }

  /** ntile(k) cut ranks for n rows: first (n mod k) buckets hold
    * ceil(n/k) rows. */
  def ntileCuts(n: Long, k: Int): Seq[Long] =
    (1 until k).map(i => i * (n / k) + math.min(i.toLong, n % k))

  /** Bucket assignment scalar: 1 + #{boundary keys strictly before this
    * row's key} — bit-identical to ntile, no window, no join. */
  def bucket(measure: String, idCol: String,
             keys: Seq[(Double, Long)]): Column =
    keys.foldLeft(lit(1)) { case (acc, (bs, bu)) =>
      acc + when(col(measure) > bs ||
        (col(measure) === bs && col(idCol) > bu), 1).otherwise(0)
    }
}
