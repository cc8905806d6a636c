package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeability per
  * Agarwal et al. 2012, "Mergeable Summaries") as a typed Spark aggregate.
  *
  * Fixed budget of `k` counters per partial; the decrement step subtracts
  * the (k+1)-th largest count from every counter and drops the non-positive
  * ones. The classic guarantee survives arbitrary partial/merge order:
  * every item with true frequency > n/(k+1) is present in the final
  * candidate set (counts are UNDER-estimates by at most n/(k+1); an item
  * above that bar cannot be decremented to zero in every partial it
  * touches). There are false POSITIVES but never false negatives — which
  * is exactly what makes the two-pass heavy-hitters query exact: pass 1
  * sketches candidates in fixed memory, pass 2 recounts ONLY the candidate
  * set exactly and filters by the true threshold. At 100 TB pass 1 shuffles
  * one k-entry buffer per partition instead of the token stream, and pass 2
  * is a broadcast semi-join + ordinary count.
  *
  * Register with `functions.udaf(new MisraGries(k), Encoders.STRING)`.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Array[String]] {

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(b: mutable.HashMap[String, Long], tok: String): mutable.HashMap[String, Long] = {
    if (tok != null) {
      b.update(tok, b.getOrElse(tok, 0L) + 1L)
      if (b.size > k) shrink(b)
    }
    b
  }

  /** Batch decrement: subtract the (k+1)-th largest count everywhere and
    * drop exhausted counters — removes at least one key, keeps ≤ k, and
    * discards the same total mass from every surviving counter (the MG
    * error accounting). */
  private def shrink(b: mutable.HashMap[String, Long]): Unit = {
    val counts = b.values.toArray
    java.util.Arrays.sort(counts)
    val dec = counts(counts.length - 1 - k) // (k+1)-th largest
    b.mapValuesInPlace((_, v) => v - dec)
    b.filterInPlace((_, v) => v > 0L)
  }

  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]):
      mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) shrink(a)
    a
  }

  /** Candidate keys, sorted for determinism of the exploded output. */
  def finish(b: mutable.HashMap[String, Long]): Array[String] =
    b.keys.toArray.sorted

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.javaSerialization[mutable.HashMap[String, Long]]

  def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
