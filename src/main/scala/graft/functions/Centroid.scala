package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed centroid aggregator over embedding vectors — SURVEY.md §2.4 A10 /
  * §2.11. Buffer = (per-dimension double sums, count); merge is
  * element-wise, so the aggregate is a proper partial/final pair and
  * shuffles one fixed-width buffer per group, not the vectors themselves —
  * the shape that survives 100 TB.
  *
  * Register with `functions.udaf(Centroid)` and call like any built-in.
  */
object Centroid extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val out = new Array[Double](a._1.length)
      var i = 0
      while (i < out.length) { out(i) = a._1(i) + b._1(i); i += 1 }
      (out, a._2 + b._2)
    }
  }

  def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray else r._1.map(_ / r._2)

  def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelper.doubleArray
}

/** Encoder helper: the implicit machinery for primitive-array encoders
  * lives in SQLImplicits; expose the one we need without a session. */
object ExpressionEncoderHelper {
  val doubleArray: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
