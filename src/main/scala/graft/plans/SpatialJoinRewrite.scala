package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Optimizer rule: planar radius joins as 3x3 grid equi-joins —
  * [[BandJoinRewrite]]'s two-dimensional sibling.
  *
  * A join whose only cross-side predicate is the squared-distance test
  * `(x1-x2)*(x1-x2) + (y1-y2)*(y1-y2) <= r2` plans as a
  * BroadcastNestedLoopJoin — O(n·m), unusable at scale. But any pair
  * within radius r sits in the same or adjacent r-sized grid cells, so
  * the join is equivalent to a hash EQUI-join on the (cx, cy) cell with
  * the left side fanned out to its 3x3 neighborhood and the original
  * predicate kept as a residual — exactly the plan `j19_grid_spatial_join`
  * writes by hand; this rule derives it automatically for the naive
  * formulation (`j19_grid_auto` is the end-to-end hash-checked proof).
  *
  * Fires only when: inner join, a conjunct matches the squared-distance
  * pattern with each coordinate pair split across the two inputs, the
  * radius² literal is positive, and NO cross-side equality conjunct
  * exists yet. The rewrite keeps every original conjunct — correctness
  * never depends on the cell math — and is idempotent because the
  * injected cell equality disables the guard on the next pass.
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `(e1 - e2) * (e1 - e2)` with both factors semantically equal →
    * the (e1, e2) difference pair. */
  private def matchSqDiff(e: Expression): Option[(Expression, Expression)] =
    e match {
      case Multiply(a @ Subtract(x1, x2, _), b, _) if a.semanticEquals(b) =>
        Some((x1, x2))
      case _ => None
    }

  /** (lx, ly, rx, ry, r2) if the conjunct is a cross-side squared-distance
    * radius test. */
  private def matchRadius(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Expression, Double)] = {
    def litVal(l: Literal): Option[Double] = l.value match {
      case d: Double => Some(d)
      case i: Int => Some(i.toDouble)
      case n: Long => Some(n.toDouble)
      case d: java.math.BigDecimal => Some(d.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    // one coordinate pair, oriented left → right
    def orient(p: (Expression, Expression)): Option[(Expression, Expression)] = {
      val (a, b) = p
      if (a.references.subsetOf(left.outputSet) && a.references.nonEmpty &&
        b.references.subsetOf(right.outputSet) && b.references.nonEmpty)
        Some((a, b))
      else if (b.references.subsetOf(left.outputSet) && b.references.nonEmpty &&
        a.references.subsetOf(right.outputSet) && a.references.nonEmpty)
        Some((b, a))
      else None
    }
    conjunct match {
      case LessThanOrEqual(Add(mx, my, _), l: Literal) =>
        for {
          r2 <- litVal(l) if r2 > 0
          px <- matchSqDiff(mx)
          py <- matchSqDiff(my)
          (lx, rx) <- orient(px)
          (ly, ry) <- orient(py)
        } yield (lx, ly, rx, ry, r2)
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

  /** floor(v / cell) with cell = r (the radius): adjacency captures every
    * within-r pair. */
  private def bucket(v: Expression, cell: Double): Expression =
    Floor(Divide(Cast(v, DoubleType), Literal(cell, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val radius = conjuncts.iterator
        .flatMap(matchRadius(_, left, right)).buffered
      if (radius.hasNext && !conjuncts.exists(isCrossEquality(_, left, right))) {
        val (lx, ly, rx, ry, r2) = radius.head
        val cell = math.sqrt(r2)
        val cellType = StructType(Seq(
          StructField("col1", LongType), StructField("col2", LongType)))
        val lCell = AttributeReference("__grid_cell", cellType)()
        val offsets = CreateArray(for {
          dx <- -1L to 1L; dy <- -1L to 1L
        } yield CreateStruct(Seq(
          Add(bucket(lx, cell), Literal(dx)),
          Add(bucket(ly, cell), Literal(dy)))))
        val lPlan = Generate(Explode(offsets), Nil, outer = false, None,
          Seq(lCell), left)
        val rCellAlias = Alias(CreateStruct(Seq(
          bucket(rx, cell), bucket(ry, cell))), "__grid_cell_r")()
        val rPlan = Project(right.output :+ rCellAlias, right)
        val newCond = (EqualTo(lCell, rCellAlias.toAttribute) +: conjuncts)
          .reduce(And)
        Project(j.output, Join(lPlan, rPlan, Inner, Some(newCond), hint))
      } else j
  }
}
