package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for the LLM-pipeline mandate (SURVEY.md §2.9
  * D4/D5 + BASELINE.json north_star).
  *
  * Scale design: every variant is shuffle-shaped (groupBy / band-join),
  * never a driver-side loop. Exact dedup is one hash aggregate. MinHash
  * is explode → per-(doc, seed) min → band-key join, so candidate
  * generation touches only docs sharing a band bucket — the classic
  * LSH trick that turns O(n²) pair comparison into O(n·bands + matches).
  * All hash seeds are fixed, so results are deterministic and
  * oracle-reproducible (min over md5 hex strings, identical in DuckDB).
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct content, keeper =
    * min id (deterministic, unlike dropDuplicates' arbitrary row). */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(sha2(text, 256).as("content_sha"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Survivors of exact dedup: the keeper row per distinct content. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, col(idCol), col(textCol))
      .select(col("keeper_id").as(idCol))
    df.join(keep, idCol)
  }

  /** Per-(doc, seed) MinHash signature rows over word shingles.
    * Signature component = lexicographic min of md5(seed || '|' || shingle)
    * — a string-domain minwise hash both engines compute identically. */
  def minhashSignatures(
      docs: DataFrame, // (doc_id, text)
      shingleWidth: Int,
      numHashes: Int
  ): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(Text.shingles(Text.tokenize(col("text")), shingleWidth)).as("shingle"))
      .distinct()
    val seeds = (0 until numHashes).map(lit(_))
    sh.select(col("doc_id"), col("shingle"), explode(array(seeds: _*)).as("seed"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit("|"), col("shingle")))).as("sig"))
  }

  /** MinHash+LSH near-dup candidate pairs with their estimated Jaccard
    * (fraction of agreeing signature components). Bands of `rowsPerBand`
    * signature rows are concatenated into one bucket key; docs sharing
    * any bucket become candidates; the estimate then filters.
    */
  def minhashPairs(
      docs: DataFrame,
      shingleWidth: Int = 3,
      numHashes: Int = 16,
      rowsPerBand: Int = 2,
      minEstJaccard: Double = 0.5
  ): DataFrame = {
    val sigs = minhashSignatures(docs, shingleWidth, numHashes)
    // band key: seed DIV rowsPerBand + ordered concat of the band's sigs
    val bands = sigs
      .groupBy(col("doc_id"), (col("seed") / rowsPerBand).cast("int").as("band"))
      .agg(concat_ws("", sort_array(collect_list(col("sig")))).as("band_key"))
    val cands = bands.as("x")
      .join(bands.as("y"), col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // estimated Jaccard = matching signature components / numHashes
    val sx = sigs.select(col("doc_id").as("a"), col("seed"), col("sig").as("sig_a"))
    val sy = sigs.select(col("doc_id").as("b"), col("seed"), col("sig").as("sig_b"))
    cands
      .join(sx, "a")
      .join(sy, Seq("b", "seed"))
      .groupBy(col("a"), col("b"))
      .agg((sum(when(col("sig_a") === col("sig_b"), 1).otherwise(0)) / numHashes.toDouble).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Exact n-gram Jaccard for doc pairs that share at least one shingle
    * (inverted-index join, no cross product). */
  def ngramJaccardPairs(
      docs: DataFrame,
      shingleWidth: Int = 3,
      minJaccard: Double = 0.5
  ): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(Text.shingles(Text.tokenize(col("text")), shingleWidth)).as("shingle"))
      .distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x")
      .join(sh.as("y"), col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), "b")
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 32-bit SimHash over tokens: per-bit majority vote of token hashes,
    * where token bit i comes from the i-th nibble-derived bit of
    * md5(token) — string-domain bit extraction both engines share. */
  def simhash32(tokens: Column): Column = {
    // bit i of token t = (hex digit at position i of md5(t)) & 1,
    // implemented over the token array with aggregate per bit
    val contributions: Seq[Column] = (0 until 32).map { i =>
      val votes = aggregate(
        tokens,
        lit(0L),
        (acc, t) =>
          acc + when(
            (instr(lit("0123456789abcdef"), substring(md5(t), i + 1, 1)) - 1) % 2 === 1,
            1L
          ).otherwise(-1L)
      )
      when(votes >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    contributions.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (popcount of XOR). */
  def hamming32(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
