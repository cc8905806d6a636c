package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * so they are usable from SQL (`vec_cosine_f32(a, b)`) as well as the
  * Column API. Wire up with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot_f32"),
      info(classOf[DotF32], "vec_dot_f32",
        "vec_dot_f32(a, b) - dot product of two float vectors in double."),
      ((args: Seq[Expression]) => DotF32(args(0), args(1))): FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine_f32"),
      info(classOf[CosineF32], "vec_cosine_f32",
        "vec_cosine_f32(a, b) - cosine similarity of two float vectors."),
      ((args: Seq[Expression]) => CosineF32(args(0), args(1))): FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info(classOf[JaroWinkler], "jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings."),
      ((args: Seq[Expression]) => JaroWinkler(args(0), args(1))): FunctionRegistry.FunctionBuilder))
    // epsilon-band joins: abs(l - r) <= eps rewritten to a quantized
    // equi-join so the naive formulation never plans a nested loop
    ext.injectOptimizerRule(_ => BandJoinRewrite)
    // planar radius joins: (x1-x2)² + (y1-y2)² <= r² rewritten to the
    // 3x3 grid-cell equi-join — BandJoinRewrite's 2D sibling
    ext.injectOptimizerRule(_ => SpatialJoinRewrite)
  }
}
