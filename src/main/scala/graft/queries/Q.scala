package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked engine query (SURVEY.md §2 row).
  *
  * @param name   stable id, prefixed with the §2 operator id it covers
  * @param oracle ANSI SQL for DuckDB over the same parquet tables; None for
  *               ops the oracle can't express (driver falls back to a
  *               rows-only check)
  * @param fn     the Spark-side implementation: (session, sfDir) => result
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame
)

object Q {
  /** All registered query modules, assembled for SparkEntry. */
  def registry: Seq[Q] =
    Relational.all ++ Joins.all ++ Aggregates.all ++ TpchExtra.all ++
      Windows.all ++ Scalars.all ++ TextOps.all ++ DedupOps.all ++
      VectorOps.all ++ EventOps.all ++ DmsOps.all ++ SampleOps.all ++
      GraphOps.all
}
