package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Literal-inlined Bloom filter for semi-join reduction.
  *
  * [[graft.dedup.Dedup]]'s Bloom keeps the filter AS DATA (a words
  * DataFrame joined via broadcast) because its ingest gates run inside
  * streaming micro-batches. For JOIN REDUCTION the filter is better off as
  * a LITERAL: `build` folds the selected keys down to `words` longs with
  * one map-side-partial aggregate and collects them (fixed 4 KB on the
  * driver regardless of build-side row count — the same contract as
  * Spark's own InjectRuntimeFilter), and `mightContain` compiles the probe
  * into a pure per-row expression — k seeded xxhash64s against an inlined
  * array — that runs inside the fact scan's whole-stage codegen. The fact
  * side is pruned BEFORE its shuffle; nothing new rides the exchange.
  *
  * No false negatives by construction (every set bit of every key is
  * OR-ed in), so filter-then-exact-join returns exactly the plain join's
  * rows; false positives only cost wasted shuffle rows (~(1-e^(-kn/m))^k).
  *
  * Reference capability: the HBase-backed reference scans the full row
  * space per lookup (`/root/reference/src/DMS.py:373-375`); this is the
  * scale-path replacement for key-selective joins.
  */
object BloomLite {

  final case class Filter(words: Array[Long], numHashes: Int) {
    def mBits: Long = words.length * 62L
  }

  private def pos(key: Column, seed: Int, mBits: Long): Column =
    pmod(xxhash64(lit(seed), key), lit(mBits))

  /** Fold `keys[keyCol]` into a `words`-long Bloom filter. One aggregate
    * (map-side partial → `words` rows max on the shuffle), one fixed-size
    * collect. */
  def build(keys: DataFrame, keyCol: String, words: Int = 512,
      numHashes: Int = 3): Filter = {
    val mBits = words * 62L
    val rows = keys
      .select(explode(array((0 until numHashes).map(s =>
        pos(col(keyCol), s, mBits)): _*)).as("p"))
      .select(expr("p DIV 62").as("word"), (col("p") % 62).cast("int").as("bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), bit))").as("bits"))
      .collect()
    val arr = new Array[Long](words)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    Filter(arr, numHashes)
  }

  /** Pure-expression probe: true iff all k seeded positions are set. */
  def mightContain(f: Filter, key: Column): Column = {
    val lits = lit(f.words)
    (0 until f.numHashes).map { s =>
      val p = pos(key, s, f.mBits)
      val bit = pmod(p, lit(62L))
      // (p - bit) is an exact multiple of 62 ≤ mBits, so the double
      // division is exact and the cast is the true integer quotient
      val word = ((p - bit) / lit(62L)).cast("int")
      element_at(lits, word + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), bit.cast("int"))) =!= 0L
    }.reduce(_ && _)
  }
}
