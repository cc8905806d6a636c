package graft

import org.apache.spark.sql.functions._

/** Candidate-volume recount for the PPJoin+ filters (SCALING.md's
  * measured-not-assumed discipline): prices what each LOSSLESS prune —
  * length, position — removes from the prefix self-join's output at a
  * given scale factor, using exactly the production code
  * (`Dedup.prefixIndex` / `prefixPostings` / `ppjoinCond`). The counts
  * are pre-`distinct` pair volumes, i.e. the rows the exchange feeding
  * the candidate distinct actually carries — the sf10 sweep's
  * shuffle-spill driver.
  *
  * Usage: `tools/run.sh graft.CandCount <sfDir>`
  * Prints one JSON line: postings, pairs with no/length/both filters,
  * distinct candidates, and verified output pairs.
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(master = s"local[${Graft.defaultCpus}]",
      appName = "graft-candcount")
    val docs = sources.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val t = 0.5 // d5_jaccard_prefix's threshold
    val perDoc = dedup.Dedup.prefixIndex(docs, shingleWidth = 3, minJaccard = t)
    val prefix = dedup.Dedup.prefixPostings(perDoc).cache()
    val postings = prefix.count()
    def pairs(len: Boolean, pos: Boolean): Long =
      prefix.as("x").join(prefix.as("y"),
        dedup.Dedup.ppjoinCond(t, lengthFilter = len, positionFilter = pos))
        .count()
    val raw = pairs(len = false, pos = false)
    val withLen = pairs(len = true, pos = false)
    val withBoth = pairs(len = true, pos = true)
    val distinctCands = prefix.as("x").join(prefix.as("y"),
        dedup.Dedup.ppjoinCond(t))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    val out = dedup.Dedup.jaccardPairsPrefix(docs, 3, t).count()
    println(s"""{"sf":"$dir","prefix_postings":$postings,""" +
      s""""pairs_no_filters":$raw,"pairs_length":$withLen,""" +
      s""""pairs_length_position":$withBoth,""" +
      s""""distinct_candidates":$distinctCands,"verified_pairs":$out}""")
    spark.stop()
  }
}
