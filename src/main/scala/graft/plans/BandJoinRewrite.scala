package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: epsilon-band joins as quantized equi-joins.
  *
  * A join whose only cross-side predicate is `abs(l - r) <= eps` plans as
  * a BroadcastNestedLoopJoin (or a cartesian) — the O(n·m) shape that
  * cannot survive 100 TB. But the band predicate implies the two values'
  * `floor(v / eps)` buckets differ by at most 1 (±2 with IEEE slack on
  * separately-computed quotients), so the join is equivalent to a hash
  * EQUI-join on a bucket key with the left side fanned out to its five
  * surrounding buckets and the original predicate kept as a residual
  * filter — candidates ride bucket occupancy, never the cross product.
  *
  * `j16_band_join` writes that plan by hand; this rule derives it
  * AUTOMATICALLY for the naive formulation, so any user query with an
  * abs-distance band condition gets the scalable plan for free.
  * `j16_band_join_auto` is the end-to-end proof: the naive DataFrame
  * code, hash-matched against the same DuckDB range-join oracle, with
  * ScaleShapeSpec asserting no nested-loop join survives in its plan.
  *
  * Fires only when: inner join, a conjunct matches `abs(x − y) <= lit`
  * (or `<`) with one side's references wholly from each input, the
  * epsilon literal is a positive double, and NO cross-side equality
  * conjunct exists yet (if one does, the join already has a hash key and
  * the rewrite would only add fan-out). The rewrite keeps every original
  * conjunct — including the band predicate as the residual — so
  * correctness never depends on the bucket math; idempotent because the
  * injected equality conjunct disables the guard on the next pass.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (leftValueExpr, rightValueExpr, eps) if the conjunct is an
    * abs-distance band between the two inputs. */
  private def matchBand(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def sides(x: Expression, y: Expression, eps: Double) =
      if (x.references.subsetOf(left.outputSet) &&
        y.references.subsetOf(right.outputSet)) Some((x, y, eps))
      else if (y.references.subsetOf(left.outputSet) &&
        x.references.subsetOf(right.outputSet)) Some((y, x, eps))
      else None
    conjunct match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(eps: Double, DoubleType))
          if eps > 0 => sides(x, y, eps)
      case LessThan(Abs(Subtract(x, y, _), _), Literal(eps: Double, DoubleType))
          if eps > 0 => sides(x, y, eps)
      case _ => None
    }
  }

  private def isCrossEquality(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = conjunct match {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    case _ => false
  }

  private def bucket(v: Expression, eps: Double): Expression =
    Floor(Divide(Cast(v, DoubleType), Literal(eps, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val band = conjuncts.iterator.flatMap(matchBand(_, left, right)).buffered
      if (band.hasNext && !conjuncts.exists(isCrossEquality(_, left, right))) {
        val (lv, rv, eps) = band.head
        // left side fans out to its +/-2 surrounding buckets via explode;
        // the attribute is constructed resolved (the optimizer runs
        // post-analysis)
        val lBkt = AttributeReference("__band_bkt", LongType)()
        val offsets = CreateArray((-2 to 2).map(o =>
          Add(bucket(lv, eps), Literal(o.toLong))))
        val lPlan = Generate(Explode(offsets), Nil, outer = false, None,
          Seq(lBkt), left)
        val rBktAlias = Alias(bucket(rv, eps), "__band_bkt_r")()
        val rPlan = Project(right.output :+ rBktAlias, right)
        val newCond = (EqualTo(lBkt, rBktAlias.toAttribute) +: conjuncts)
          .reduce(And)
        // restore the original output: the helper bucket columns must not
        // leak into the join's consumers
        Project(j.output, Join(lPlan, rPlan, Inner, Some(newCond), hint))
      } else j
  }
}
