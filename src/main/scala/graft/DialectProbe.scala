package graft

import scala.util.{Failure, Success, Try}
import graft.sources.Tables

/** Diagnostic main (like [[Plans]]/[[Explain]]): classifies every oracle
  * text by whether Spark's parser+analyzer accepts it — raw, and after
  * the [[graft.plans.DuckDialect]] rewrite — and prints the first error
  * line for the remainder. Drives the SqlParitySpec widening work: the
  * rewrite table grows until the ANSI-translatable tranche is exhausted.
  *
  * Usage: tools/run.sh graft.DialectProbe /root/testdata/sf0.01 [raw]
  */
object DialectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val raw = args.lift(1).contains("raw")
    args.lift(1).filter(_ == "dump").foreach { _ =>
      val name = args(2)
      println(graft.plans.DuckDialect
        .toSpark(SparkEntry.oracleSql(name)).getOrElse("NO-RW"))
      return
    }
    val exec = args.lift(1).contains("exec")
    val spark = Graft.session(appName = "graft-dialect-probe")
    val t = Tables(spark, dir)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => t.table(n).createOrReplaceTempView(n))
    t.events.createOrReplaceTempView("events")

    if (exec) {
      val name = args(2)
      val rw = graft.plans.DuckDialect.toSpark(SparkEntry.oracleSql(name)).get
      println(rw)
      val viaSql = spark.sql(rw).collect().map(_.toString).sorted
      val viaDf = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted
      println(s"sql=${viaSql.length} df=${viaDf.length}")
      viaSql.diff(viaDf).take(5).foreach(r => println(s"SQL-ONLY $r"))
      viaDf.diff(viaSql).take(5).foreach(r => println(s"DF-ONLY  $r"))
      spark.stop(); return
    }
    // `full` mode: also EXECUTE each rewritten text (the spec's actual
    // gate) so analyzed-but-crashing texts surface with their error
    val full = args.lift(1).contains("full")
    var ok, rewrittenOk, failed = 0
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, text) =>
      Try(spark.sql(text).queryExecution.analyzed) match {
        case Success(_) if full =>
          Try(spark.sql(text).collect()) match {
            case Success(_) => ok += 1
            case Failure(e) =>
              failed += 1
              println(s"RAW-EXEC-FAIL $name: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(160)}")
          }
        case Success(_) => ok += 1
        case Failure(_) if raw =>
          failed += 1
          println(s"RAW-FAIL $name")
        case Failure(e0) =>
          graft.plans.DuckDialect.toSpark(text) match {
            case Some(rw) =>
              Try {
                spark.sql(rw).queryExecution.analyzed
                if (full) spark.sql(rw).collect()
              } match {
                case Success(_) => rewrittenOk += 1
                case Failure(e) =>
                  failed += 1
                  val msg = Option(e.getMessage).getOrElse("").linesIterator
                    .take(2).mkString(" | ").take(200)
                  println(s"RW-FAIL $name: $msg")
              }
            case None =>
              failed += 1
              val msg = Option(e0.getMessage).getOrElse("").linesIterator
                .take(2).mkString(" | ").take(160)
              println(s"NO-RW $name: $msg")
          }
      }
    }
    println(s"[probe] raw-ok=$ok rewritten-ok=$rewrittenOk failed=$failed")
    spark.stop()
  }
}
