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

  test("ragged lengths and null elements yield NULL, matching zip_with") {
    // the HOF formulation returns NULL for both cases (zip_with pads the
    // shorter side with null); the native expressions must agree, not
    // silently truncate to min(length)
    val rows = spark.sql(
      """SELECT vec_dot_f32(array(1.0F, 2.0F), array(1.0F)) AS ragged_dot,
        |       vec_cosine_f32(array(1.0F, 2.0F), array(1.0F)) AS ragged_cos,
        |       vec_dot_f32(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) AS nullel_dot,
        |       vec_cosine_f32(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) AS nullel_cos
        |""".stripMargin).head()
    (0 until 4).foreach(i => assert(rows.isNullAt(i), s"col $i should be NULL"))
    // and the HOF versions agree on the same inputs
    import spark.implicits._
    val hof = Seq((Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("d"),
        Vectors.cosine(col("a"), col("b")).as("c"))
      .head()
    assert(hof.isNullAt(0) && hof.isNullAt(1))
  }

  test("DESCRIBE FUNCTION exposes the right class and usage per function") {
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED vec_cosine_f32")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("CosineF32"))
    assert(desc.contains("cosine similarity"))
    val desc2 = spark.sql("DESCRIBE FUNCTION EXTENDED vec_dot_f32")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc2.contains("DotF32"))
    assert(desc2.contains("dot product"))
  }
}
