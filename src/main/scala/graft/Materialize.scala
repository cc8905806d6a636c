package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The single materialization / lineage-cut point for every query.
  *
  * Local development and the bench gate run on `local[32]`, where
  * `localCheckpoint()` is the right cut: an eager in-memory+disk block
  * write with truncated lineage and zero external dependencies. On a
  * real cluster `localCheckpoint` is a liability — its blocks live only
  * on the executors that wrote them, so ONE lost executor kills the job
  * instead of recomputing (DEPLOY.md §2). The runbook's one-line swap is
  * now executable: `SPARK_GRAFT_RELIABLE=1` (or system property
  * `graft.reliable=1`, which tests use) routes every cut through the
  * cluster-safe path instead:
  *
  *   - [[Shared]] — class (a): a multi-consumed corpus-derived relation
  *     (signatures, postings, vocab/edge tables). Reliable path:
  *     `persist(DISK_ONLY_2)` — 2-replica disk blocks survive a single
  *     executor loss and recompute from lineage on a double loss. At
  *     ingest these become written-once parquet tables.
  *   - [[Iter]] — class (b): an iterative lineage cut (CC rounds,
  *     large/small-star, BPE merges, k-core peels, Lloyd assignment).
  *     Reliable path: `checkpoint()` to the job's fault-tolerant
  *     checkpoint dir — lineage MUST truncate or the plan grows with the
  *     round count, so persist alone is not a substitute.
  *   - [[Barrier]] — class (c): the relation feeds a write that
  *     OVERWRITES one of its own input paths (DocStore.uploadBatch's
  *     idempotent batch replay reads the store root it then
  *     dynamic-partition-overwrites). Lineage must sever EAGERLY in
  *     both modes or Spark throws "Cannot overwrite a path that is also
  *     being read from" — so the reliable path is `checkpoint()` (an
  *     eager fault-tolerant materialization), never a lazy persist.
  *
  * Both paths are proven hash-identical on a full dedup chain
  * (`MaterializeSpec`: `d5_dedup_clusters` under the flag). The audit in
  * BASELINE.md (`AUDIT:materialize`, machine-checked by `AuditSpec`)
  * counts every cut site per file and class; raw `.localCheckpoint()`
  * calls outside this object are a build failure.
  */
object Materialize {

  sealed trait Kind
  /** Class (a): multi-consumed corpus-derived relation. */
  case object Shared extends Kind
  /** Class (b): iterative lineage cut. */
  case object Iter extends Kind
  /** Class (c): feeds a write that overwrites its own input path —
    * must sever eagerly in both modes. */
  case object Barrier extends Kind

  /** Cluster-safe mode: env `SPARK_GRAFT_RELIABLE=1` for jobs, system
    * property `graft.reliable=1` for in-JVM tests (env is immutable). */
  def reliable: Boolean =
    sys.props.get("graft.reliable").orElse(sys.env.get("SPARK_GRAFT_RELIABLE"))
      .contains("1")

  def cut(df: DataFrame, kind: Kind): DataFrame =
    if (!reliable) df.localCheckpoint()
    else kind match {
      case Shared => df.persist(StorageLevel.DISK_ONLY_2)
      case Iter | Barrier =>
        val sc = df.sparkSession.sparkContext
        // idempotent: first cut of the job picks the dir (HDFS on a
        // cluster via SPARK_GRAFT_CHECKPOINT_DIR; local target/ in tests)
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(sys.env.getOrElse(
            "SPARK_GRAFT_CHECKPOINT_DIR", "target/checkpoints"))
        // eager: Barrier sites overwrite a path they read, so the blocks
        // must exist BEFORE the write job plans; Iter sites need the
        // truncated lineage for the next round either way
        df.checkpoint()
    }

  /** Postfix spelling so call sites read like the `localCheckpoint()`
    * they replace: `relation.cut(Shared)`. */
  implicit class CutSyntax(private val df: DataFrame) extends AnyVal {
    def cut(kind: Kind): DataFrame = Materialize.cut(df, kind)
  }
}
