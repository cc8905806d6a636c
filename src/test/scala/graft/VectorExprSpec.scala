package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vectors
import graft.sources.Tables

/** Native codegen'd vector expressions (graft.plans.DotF32/CosineF32):
  * bit-parity with the higher-order-function formulation, SQL-callable
  * via GraftExtensions, null behavior.
  */
class VectorExprSpec extends AnyFunSuite {
  import SharedSpark._

  test("cosineFast is bit-identical to the HOF cosine over real embeddings") {
    import spark.implicits._
    val e = Tables(spark, sf).embeddings.limit(100)
    val both = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(
        Vectors.cosine(col("x.embedding"), col("y.embedding")).as("hof"),
        Vectors.cosineFast(col("x.embedding"), col("y.embedding")).as("native"))
    val diff = both.filter(col("hof") =!= col("native")).count()
    assert(diff == 0)
    // not trivially zero rows
    assert(both.count() > 1000)
  }

  test("dotFast matches the HOF dot bit-for-bit") {
    import spark.implicits._
    val e = Tables(spark, sf).embeddings.limit(50)
    val both = e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(Vectors.dot(col("x.embedding"), col("y.embedding")).as("hof"),
        Vectors.dotFast(col("x.embedding"), col("y.embedding")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).isEmpty)
  }

  test("vec_cosine_f32 / vec_dot_f32 are registered SQL functions") {
    import spark.implicits._
    val row = spark.sql(
      """SELECT vec_cosine_f32(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       vec_dot_f32(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       vec_cosine_f32(array(0.0F, 0.0F), array(1.0F, 0.0F)) AS z
        |""".stripMargin).as[(Double, Double, Double)].head()
    assert(row == ((1.0, 11.0, 0.0)))
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT vec_dot_f32(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))").head()
    assert(r.isNullAt(0))
  }
}
