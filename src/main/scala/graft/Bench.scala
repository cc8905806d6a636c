package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall-clock seconds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Graft.defaultCpus
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-bench")
    // force FULL materialization of every column — under count() Catalyst
    // prunes sorts and projections, understating the verified query
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // JIT + parquet-footer warmup so per-query numbers measure the plan,
    // not first-touch class loading
    SparkEntry.queries.get("w1_latest_per_key").foreach { fn =>
      try run(fn) catch { case _: Throwable => () }
    }
    // optional comma-separated subset (freezing BASELINE/SCALING rows for
    // newly added queries without re-running the whole surface)
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(kv => s(kv._1)))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // failures are marked with a NEGATIVE duration so a crashed query
      // can never masquerade as a fast success in BASELINE/SCALING rows
      name -> (if (ok) dt else -dt)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ > 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
