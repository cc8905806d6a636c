package graft

/** Plan-inspection main: prints the formatted executed plan of one or
  * more registered queries, plus scan/shuffle/aggregate counts — the
  * "is this the plan I'd want at 100 TB" feedback loop.
  *
  * Usage: tools/run.sh graft.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = Graft.session(master = "local[8]", shufflePartitions = 8,
      appName = "graft-explain")
    val targets =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else names.toSeq
    targets.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT REGISTERED")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.executedPlan.toString
          def n(pat: String) = pat.r.findAllIn(plan).length
          println(s"== $name: scans=${n("Scan parquet|Scan csv|Scan json")} " +
            s"exchanges=${n("Exchange")} hashAggs=${n("HashAggregate")} " +
            s"sortAggs=${n("SortAggregate")} sorts=${n("\\bSort\\b")} " +
            s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
            s"bnlj=${n("BroadcastNestedLoopJoin")} " +
            // "*(k)" operator prefixes mark whole-stage-codegen span k
            s"codegenSpans=${plan.split("\\*\\(").drop(1).map(_.takeWhile(_.isDigit)).distinct.length}")
          if (sys.env.get("EXPLAIN_FULL").contains("1")) {
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          }
      }
    }
    spark.stop()
  }
}
