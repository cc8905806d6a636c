package graft

/** Diagnostic main (like [[Explain]]/[[DialectProbe]]): times the
  * FROM-INDEX legs of the persisted artifacts ALONE — the registered
  * persisted queries price write+query together (the honest demo
  * convention), so the scale recounts in SCALING.md need this probe to
  * show what a production query pays AFTER ingest has amortized the
  * write. Requires the per-SF indexes to exist (run the persisted
  * queries via Bench first — they write to the fixed
  * [[IndexPaths.forSf]] locations this probe reads).
  *
  * Usage: SPARK_GRAFT_SHUFFLE=256 tools/run.sh graft.IndexProbe <sfDir>
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-index-probe")

    // two timed passes per leg: the first carries JVM/codegen warmup
    // (Bench amortizes it across the sweep); the warm pass is the
    // steady-state production cost
    for (pass <- Seq("cold", "warm")) {
      val t0 = System.nanoTime
      val bm25 = graft.functions.TextIndex.bm25(
        spark, IndexPaths.forSf("text", dir),
        Seq("spark", "window", "shuffle"))
      bm25.write.format("noop").mode("overwrite").save()
      println(f"bm25_from_index_${pass}_sec=${(System.nanoTime - t0) / 1e9}%.3f")
      if (pass == "warm")
        bm25.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("In(term"))
          .take(2).foreach(l => println("PUSH " + l.trim.take(200)))
    }
    for (pass <- Seq("cold", "warm")) {
      val t1 = System.nanoTime
      val pairs = graft.dedup.Dedup.minhashPairsFromSignatures(
        spark.read.parquet(IndexPaths.forSf("lsh", dir) + "/signatures"),
        numHashes = 8, rowsPerBand = 2, minEstJaccard = 0.5)
      pairs.write.format("noop").mode("overwrite").save()
      println(f"lsh_from_index_${pass}_sec=${(System.nanoTime - t1) / 1e9}%.3f")
    }
    // ANN: IVF-PQ search FROM the persisted index (the round-14 decade
    // recount) — probe + ADC + shortlist rerank, zero corpus encoding;
    // the embeddings-scan count pins that the float corpus serves only
    // the query side and the shortlist rerank at any SF
    {
      import org.apache.spark.sql.functions.col
      val e = graft.sources.Tables(spark, dir).embeddings
      val corpus = e.filter(col("vec_id") >= 20)
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      for (pass <- Seq("cold", "warm")) {
        val t2 = System.nanoTime
        val ann = graft.functions.AnnIndex.ivfpqSearch(
          spark, IndexPaths.forSf("ann", dir), queries, corpus,
          nProbe = 2, shortlist = 20, topK = 5)
        ann.write.format("noop").mode("overwrite").save()
        println(f"ann_from_index_${pass}_sec=${(System.nanoTime - t2) / 1e9}%.3f")
        if (pass == "warm") {
          val plan = ann.queryExecution.executedPlan.toString
          println("ANN_EMB_SCANS " + plan.linesIterator.count(l =>
            l.contains("Scan parquet") && l.contains("embeddings")))
        }
      }
    }
    spark.stop()
  }
}
