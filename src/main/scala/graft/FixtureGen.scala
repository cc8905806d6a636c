package graft

import org.apache.spark.sql.functions._

/** One-off generator for committed fixtures under `fixtures/`.
  *
  * `fixtures/ivf_centroids.parquet`: 8 IVF coarse centroids trained on the
  * sf0.01 embeddings ([[graft.functions.Ivf.train]], k=8, 2 Lloyd
  * iterations), stored as `(cluster int, centroid array<float>)`. Training
  * sums floats across a shuffle, so it is run-reproducible only up to
  * merge order — the snapshot is FROZEN here precisely so the assignment
  * and probe/rerank paths become exact-hash-checkable against DuckDB over
  * the same file (`d6_ivf_assign`, `d6_ivf_search`); the index/search
  * math over a fixed centroid relation is fully deterministic.
  *
  * `fixtures/pq_centroids.parquet`: the PQ codebook — 16 sub-centroids per
  * subspace for m=8 subspaces ([[graft.functions.Pq.train]], 2 Lloyd
  * iterations on the sf0.01 embeddings), stored as
  * `(sub int, cluster int, centroid array<float>)`. Frozen for the same
  * reason as the IVF fixture: with a fixed codebook the encode (argmin)
  * and ADC search paths are exact integer/decimal math both engines
  * reproduce (`d6_pq_assign`, `d6_pq_search`).
  *
  * Usage: `tools/run.sh graft.FixtureGen /root/testdata/sf0.01`
  */
object FixtureGen {
  /** Write `df` as ONE parquet file at `dest` (committed fixtures are
    * single stable files, not part-directories). NO-OP if `dest` already
    * exists: fixtures are FROZEN — training floats merge in shuffle order,
    * so regenerating would silently re-freeze every oracle that reads the
    * file. Delete the file first to intentionally re-freeze. */
  private def writeOne(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(dest))) {
      println(s"[fixture] $dest exists — frozen, skipping"); return
    }
    val tmp = java.nio.file.Files.createTempDirectory("fixture").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.copy(part, java.nio.file.Paths.get(dest),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Graft.session(appName = "graft-fixture-gen")
    val e = graft.sources.Tables(spark, sfDir).embeddings
    writeOne(
      graft.functions.Ivf.train(e, k = 8, iters = 2)
        .select(col("cluster"), col("centroid").cast("array<float>").as("centroid")),
      "fixtures/ivf_centroids.parquet")
    writeOne(
      graft.functions.Pq.train(e, m = 8, ksub = 16, iters = 2, dim = 64)
        .select(col("sub"), col("cluster"),
          col("centroid").cast("array<float>").as("centroid")),
      "fixtures/pq_centroids.parquet")
    spark.stop()
  }
}
