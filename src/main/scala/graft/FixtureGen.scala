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
  * Usage: `tools/run.sh graft.FixtureGen /root/testdata/sf0.01`
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Graft.session(appName = "graft-fixture-gen")
    val e = graft.sources.Tables(spark, sfDir).embeddings
    val cents = graft.functions.Ivf.train(e, k = 8, iters = 2)
      .select(col("cluster"), col("centroid").cast("array<float>").as("centroid"))
    // flatten the single-part output to one stable committed file
    val tmp = java.nio.file.Files.createTempDirectory("ivf_cents").toString
    cents.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.copy(part,
      java.nio.file.Paths.get("fixtures/ivf_centroids.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.stop()
  }
}
