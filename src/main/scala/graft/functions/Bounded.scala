package graft.functions

import org.apache.spark.sql.DataFrame

/** Driver-held materialization for k-row relations.
  *
  * `localCheckpoint()` pins blocks to specific executors: it is not
  * fault-tolerant (executor loss kills the job instead of recomputing)
  * and the blocks are never auto-freed. For relations that are genuinely
  * codebook-sized — k centroids, a 10-row bucket table, a (cluster, dim)
  * mean matrix — collecting to the driver and re-planting as a
  * LocalRelation is strictly better on a real cluster: the data survives
  * executor loss (it lives in the driver / the plan), it broadcasts
  * naturally into every consumer, and lineage is cut just as flat as a
  * checkpoint would cut it (a LocalRelation has no upstream). This is the
  * same state-holding discipline as distributed Lloyd's: the driver keeps
  * the k×dim codebook between rounds, never the corpus.
  *
  * Only for relations whose size is bounded by a CONSTANT (k, bucket
  * count, dimensionality) — never by the corpus. Corpus-derived
  * multi-consumed relations (posting lists, signatures, edge sets) stay
  * on executors via localCheckpoint locally / persisted tables on a
  * cluster.
  */
object Bounded {

  /** Collect `df` (must be constant-bounded, k rows) and re-plant it as a
    * driver-held LocalRelation with the identical schema. Values round-trip
    * exactly — collect hands back the very objects the executors produced. */
  def local(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}
