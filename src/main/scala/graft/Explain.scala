package graft

/** Plan-inspection main: runs one registered query and prints its final
  * (AQE-resolved) physical plan, plus a one-line summary of scan /
  * exchange / reuse counts. Usage:
  *   tools/run.sh graft.Explain <query> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Graft.session(master = "local[4]", shufflePartitions = 4,
      appName = "graft-explain")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println(p)
    println("summary: scans=" + p.linesIterator.count(_.contains("Scan parquet")) +
      " reusedExchanges=" + p.linesIterator.count(_.contains("ReusedExchange")) +
      " exchanges=" + p.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Reused")) +
      " wscg=" + p.linesIterator.count(_.contains("WholeStageCodegen")))
    spark.stop()
  }
}
