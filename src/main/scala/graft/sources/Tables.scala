package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness tables (TESTDATA.md): one parquet dataset per
  * relation under a scale-factor directory.
  *
  * All access goes through `spark.read.parquet` so Catalyst gets the full
  * pushdown surface (column pruning, predicate pushdown, partition pruning
  * when the layout is partitioned). Nothing is cached here — callers decide
  * lifetime; at 100 TB an unconditional cache is a liability.
  */
final case class Tables(spark: SparkSession, dir: String) {

  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame   = table("region")
  lazy val nation: DataFrame   = table("nation")
  lazy val customer: DataFrame = table("customer")
  lazy val supplier: DataFrame = table("supplier")
  lazy val part: DataFrame     = table("part")
  lazy val orders: DataFrame   = table("orders")
  lazy val lineitem: DataFrame = table("lineitem")
  lazy val documents: DataFrame  = table("documents")
  lazy val embeddings: DataFrame = table("embeddings")

  /** `events.ts` arrives in whatever parquet flavor the data generator chose
    * for that run — observed so far: TIMESTAMP(NANOS) (which Spark reads as a
    * raw long under `spark.sql.legacy.parquet.nanosAsLong`) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark reads as
    * TIMESTAMP_NTZ). Normalize every flavor to a session-zoned TimestampType
    * here, once, so downstream epoch extractors (`unix_micros` rejects NTZ at
    * analysis time), windows, and watermarks all see one type. The session
    * time zone is pinned to UTC (Graft.scala), so the NTZ→LTZ cast is a
    * relabel with no wall-clock shift.
    */
  lazy val events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer DIV: a double intermediate would lose precision on
        // nanosecond-scale epoch values (2^63 ≫ 2^53)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
