package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The data generator has shipped `events.ts` in three parquet flavors across
  * regens: TIMESTAMP(NANOS) (read as a raw long under
  * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS,
  * isAdjustedToUTC=true) (TimestampType), and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (TimestampNTZType — which `unix_micros` rejects at
  * analysis time). [[Tables.events]] must normalize all three to one
  * session-zoned TimestampType so a regen can never again break epoch
  * extractors silently. This spec writes each flavor and runs representative
  * epoch-consuming queries end-to-end against all of them.
  */
class TimestampFlavorSpec extends AnyFunSuite {
  import SharedSpark._

  // events-only queries that extract epochs (the exact set the NTZ regen broke)
  private val eventsOnlyQueries =
    Seq("t5_sessions_gaps_islands", "t6_dedup_first_event", "w9_max_gap",
      "j8_asof_nearest", "sc_zorder")

  private lazy val flavors: Map[String, String] = {
    val base = Tables(spark, sf).events.localCheckpoint()
    val root = Files.createTempDirectory("graft_tsflavor").toString
    val ltz = s"$root/ltz"
    base.withColumn("ts", col("ts").cast(TimestampType))
      .write.parquet(s"$ltz/events.parquet")
    val ntz = s"$root/ntz"
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$ntz/events.parquet")
    // TIMESTAMP(NANOS) surfaces as LongType under nanosAsLong — writing the
    // long directly reproduces what Tables sees from such a file
    val nanos = s"$root/nanos"
    base.withColumn("ts", (unix_micros(col("ts")) * 1000L).as("ts"))
      .write.parquet(s"$nanos/events.parquet")
    Map("ltz" -> ltz, "ntz" -> ntz, "nanos" -> nanos)
  }

  test("Tables.events normalizes every parquet timestamp flavor to TimestampType") {
    flavors.foreach { case (name, dir) =>
      val ev = Tables(spark, dir).events
      assert(ev.schema("ts").dataType == TimestampType,
        s"flavor $name not normalized: ${ev.schema("ts").dataType}")
      assert(ev.count() > 0)
    }
  }

  test("all three flavors yield identical epoch values") {
    val sums = flavors.map { case (name, dir) =>
      name -> Tables(spark, dir).events
        .agg(sum(unix_micros(col("ts")))).head.getLong(0)
    }
    assert(sums.values.toSet.size == 1, s"epoch sums diverge: $sums")
  }

  test("epoch-extracting queries run identically on every flavor") {
    eventsOnlyQueries.foreach { q =>
      val results = flavors.map { case (name, dir) =>
        name -> SparkEntry.queries(q)(spark, dir).collect().toSeq
      }
      val distinct = results.values.toSet
      assert(distinct.size == 1,
        s"$q diverges across flavors: rows ${results.view.mapValues(_.size).toMap}")
      assert(results("ltz").nonEmpty, s"$q empty on fixture")
    }
  }
}
