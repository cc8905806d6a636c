package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE's
  * skew-join split isn't available (e.g. the skewed side feeds a
  * co-partitioned downstream op) or the skew is known up front.
  *
  * Left side: each row gets a random-but-deterministic salt in
  * [0, buckets) derived from a stable column (no rand(): retries and
  * speculative tasks must agree). Right side: replicated `buckets` times.
  * Join on (key, salt) — a hot key's rows now spread over `buckets`
  * reducers instead of one straggler.
  *
  * Cost model: replicates the right side x buckets, so use it when
  * right is small-ish but too big (or too hot) to broadcast outright.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted `buckets`
    * ways. `leftSaltSource` must be a deterministic per-row column (an id,
    * xxhash64 of the row key set, ...). */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftSaltSource: Column,
      buckets: Int
  ): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("__salt", pmod(xxhash64(leftSaltSource), lit(buckets)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
