package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Canon._
import graft.functions.Metadata
import graft.sources.Tables
import graft.Materialize.{CutSyntax, Shared}

/** The DMS-native surface — SURVEY.md §2.9: versioned upsert (D8, fixing
  * the reference's string-sorted versions, DMS.py:391), row-level delete
  * as an anti-join rewrite (S8, DMS.py:279-311), truncate-by-predicate
  * (S9, DMS.py:407-419 — split on the FIRST dot only, fixing the
  * filename-truncation bug), and metadata extraction (D1, DMS.py:70-91).
  *
  * The versioned-corpus view derives deterministically from documents:
  * filename = "doc" || (doc_id % 50), version = doc_id / 50 + 1 — 50
  * files x 10 versions, enough to exercise every versioning path.
  */
object DmsOps {

  /** Shared closed-form dHash pipeline for the mm_dhash* queries: one
    * 5×3 multiplicative-pattern BMP per doc (channel byte k of pixel
    * stream = (s·(k+3) + brightness) mod 256; twins (2i, 2i+1) share s
    * and differ by +1 brightness), really decoded + resampled + hashed by
    * [[graft.multimodal.Multimodal.dHash]]. Emits non-negative 32-bit
    * halves (hi, lo) so every downstream op stays in portable BIGINT. */
  private def dhashFrame(spark: org.apache.spark.sql.SparkSession,
      dir: String, png: Boolean = false): DataFrame = {
    val t = Tables(spark, dir)
    val mm = graft.multimodal.Multimodal
    val content =
      if (png) mm.synthPngMulUdf(expr("(doc_id div 2) * 31 + 7"),
        (col("doc_id") % 2).cast("int"), lit(5), lit(3))
      else mm.synthBmpMulUdf(expr("(doc_id div 2) * 31 + 7"),
        (col("doc_id") % 2).cast("int"), lit(5), lit(3))
    t.documents.select(
        col("doc_id").as("media_id"), content.as("content"))
      .select(col("media_id"), mm.dHashAnyUdf(col("content")).as("h"))
      .select(col("media_id"),
        shiftrightunsigned(col("h"), 32).as("hi"),
        col("h").bitwiseAND(lit(0xFFFFFFFFL)).as("lo"))
  }

  /** DuckDB twin of [[dhashFrame]]: the same 64 comparison bits from the
    * closed-form pixel values (w=5 ⇒ 15 row bytes; sx = x·5/9, sy = y·3/8;
    * channel offsets +3/+4/+5 are k+3 for c = 0,1,2). */
  private val dhashCte =
    """k AS (SELECT unnest(range(0, 64)) AS k),
      |p AS (SELECT doc_id, (doc_id // 2) * 31 + 7 AS s, doc_id % 2 AS br
      |      FROM documents),
      |bits AS (
      |  SELECT doc_id, k,
      |    CASE WHEN
      |      ((s*(((k//8)*3//8)*15 + ((k%8)*5//9)*3 + 3) + br) % 256
      |     + (s*(((k//8)*3//8)*15 + ((k%8)*5//9)*3 + 4) + br) % 256
      |     + (s*(((k//8)*3//8)*15 + ((k%8)*5//9)*3 + 5) + br) % 256) // 3
      |      >
      |      ((s*(((k//8)*3//8)*15 + ((k%8+1)*5//9)*3 + 3) + br) % 256
      |     + (s*(((k//8)*3//8)*15 + ((k%8+1)*5//9)*3 + 4) + br) % 256
      |     + (s*(((k//8)*3//8)*15 + ((k%8+1)*5//9)*3 + 5) + br) % 256) // 3
      |    THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM p CROSS JOIN k
      |),
      |hashes AS (
      |  SELECT doc_id AS media_id,
      |    CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
      |             ELSE 0 END) AS BIGINT) AS hash_hi,
      |    CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
      |             ELSE 0 END) AS BIGINT) AS hash_lo
      |  FROM bits GROUP BY doc_id
      |)""".stripMargin

  /** The versioned view: (filename, version, doc_id, text). */
  private def versioned(t: Tables): DataFrame =
    t.documents.select(
      concat(lit("doc"), (col("doc_id") % 50).cast("string")).as("filename"),
      (col("doc_id") / 50).cast("int").plus(1).as("version"),
      col("doc_id"),
      col("text")
    )

  private val versionedCte =
    """v AS (
      |  SELECT concat('doc', CAST(doc_id % 50 AS VARCHAR)) AS filename,
      |         CAST(doc_id // 50 AS INT) + 1 AS version,
      |         doc_id, text
      |  FROM documents
      |)""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "d8_merge_cdc",
      // MERGE INTO semantics — apply one CDC batch (inserts, updates,
      // deletes) to a snapshot in a single pass: the lakehouse primitive
      // under every `MERGE WHEN MATCHED / NOT MATCHED` statement. The
      // change batch is synthesized DETERMINISTICALLY from the snapshot
      // itself (key mod 10: 0→delete, 1→update price +1, 3→insert with a
      // shifted key), so both engines derive the identical batch with no
      // fixture. Applied as ONE full-outer equi-join on the key +
      // per-row case analysis — never a per-op loop; the output summary
      // proves row conservation and exact DECIMAL money movement. 100 TB
      // shape: one shuffle on the merge key (or zero with a bucketed
      // base table), map-side partial counts after.
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_orderstatus AS status,
             |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
             |  FROM orders
             |),
             |cdc AS (
             |  SELECT k, 'D' AS op, NULL AS new_status,
             |         CAST(NULL AS DECIMAL(18,2)) AS new_price
             |  FROM base WHERE k % 10 = 0
             |  UNION ALL
             |  SELECT k, 'U', 'U2', price + 1 FROM base WHERE k % 10 = 1
             |  UNION ALL
             |  SELECT k + 100000000, 'I', 'NEW', CAST(1.50 AS DECIMAL(18,2))
             |  FROM base WHERE k % 10 = 3
             |),
             |merged AS (
             |  SELECT coalesce(c.k, b.k) AS k,
             |         CASE WHEN c.op = 'D' THEN NULL
             |              WHEN c.op IN ('U', 'I') THEN c.new_status
             |              ELSE b.status END AS status,
             |         CASE WHEN c.op = 'D' THEN NULL
             |              WHEN c.op IN ('U', 'I') THEN c.new_price
             |              ELSE b.price END AS price,
             |         CASE WHEN c.op IS NULL THEN 'KEEP' ELSE c.op END AS action
             |  FROM base b FULL OUTER JOIN cdc c ON b.k = c.k
             |)
             |SELECT action, CAST(count(*) AS BIGINT) AS n,
             |       CAST(CAST(sum(price) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
             |FROM merged GROUP BY action
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val base = t.orders.select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        val cdc = base.filter(col("k") % 10 === 0)
          .select(col("k"), lit("D").as("op"),
            lit(null).cast("string").as("new_status"),
            lit(null).cast("decimal(18,2)").as("new_price"))
          .unionAll(base.filter(col("k") % 10 === 1)
            .select(col("k"), lit("U"), lit("U2"),
              (col("price") + 1).cast("decimal(18,2)")))
          .unionAll(base.filter(col("k") % 10 === 3)
            .select((col("k") + 100000000L).as("k"), lit("I"), lit("NEW"),
              lit(1.50).cast("decimal(18,2)")))
        val m = base.as("b").join(cdc.as("c"), col("b.k") === col("c.k"), "full_outer")
          .select(
            coalesce(col("c.k"), col("b.k")).as("k"),
            when(col("c.op") === "D", lit(null))
              .when(col("c.op").isin("U", "I"), col("c.new_status"))
              .otherwise(col("b.status")).as("status"),
            when(col("c.op") === "D", lit(null).cast("decimal(18,2)"))
              .when(col("c.op").isin("U", "I"), col("c.new_price"))
              .otherwise(col("b.price")).as("price"),
            when(col("c.op").isNull, "KEEP").otherwise(col("c.op")).as("action"))
        ordered(
          m.groupBy(col("action"))
            .agg(count(lit(1)).as("n"),
              sum(col("price")).cast("decimal(18,2)").cast("double")
                .as("total_price")))
      }
    ),
    Q(
      "d8_next_version",
      // upload()'s version assignment (DMS.py:113-117) as one aggregate:
      // next = coalesce(max(version), 0) + 1, NUMERIC max (v10 > v2)
      Some(s"""WITH $versionedCte
              |SELECT filename, max(version) + 1 AS next_version
              |FROM v GROUP BY filename
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          versioned(t)
            .groupBy(col("filename"))
            .agg((max(col("version")) + 1).as("next_version"))
        )
      }
    ),
    Q(
      "d8_retention_gc",
      // VERSION-RETENTION GC PLANNER — the VACUUM / expire-snapshots pass
      // every versioned store runs: keep the LAST 2 versions of every
      // file, emit the deletion manifest for the rest (version, storage
      // row id, surviving latest, history depth). The manifest is the
      // AUDITABLE artifact a 100 TB store wants before destructive GC —
      // plan first, delete from the plan (the s8 anti-join executes it).
      // One window family over the per-file version history; partitions
      // are history-depth-sized, never corpus-sized.
      Some(s"""WITH $versionedCte,
              |r AS (
              |  SELECT filename, version, doc_id,
              |         row_number() OVER (PARTITION BY filename
              |                 ORDER BY version DESC, doc_id DESC) AS rn,
              |         count(*) OVER (PARTITION BY filename) AS n_versions,
              |         max(version) OVER (PARTITION BY filename) AS latest
              |  FROM v
              |)
              |SELECT filename, version, doc_id, latest,
              |       CAST(n_versions AS BIGINT) AS n_versions
              |FROM r WHERE rn > 2
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("filename"))
        val wr = w.orderBy(col("version").desc, col("doc_id").desc)
        ordered(
          versioned(t)
            .select(col("filename"), col("version"), col("doc_id"),
              row_number().over(wr).as("rn"),
              count(lit(1)).over(w).as("n_versions"),
              max(col("version")).over(w).as("latest"))
            .filter(col("rn") > 2)
            .select(col("filename"), col("version"), col("doc_id"),
              col("latest"), col("n_versions")))
      }
    ),
    Q(
      "d8_upsert_latest",
      // append a new batch for doc0..doc4 at next_version, then ask for
      // the latest version of every file — the upsert round-trip
      Some(s"""WITH $versionedCte,
              |nxt AS (
              |  SELECT filename, max(version) + 1 AS version FROM v
              |  WHERE filename IN ('doc0','doc1','doc2','doc3','doc4')
              |  GROUP BY filename
              |),
              |u AS (
              |  SELECT filename, version FROM v
              |  UNION ALL SELECT filename, version FROM nxt
              |)
              |SELECT filename, max(version) AS latest
              |FROM u GROUP BY filename
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val v = versioned(t).select(col("filename"), col("version"))
        val batch = Seq("doc0", "doc1", "doc2", "doc3", "doc4")
        val nxt = v.filter(col("filename").isin(batch: _*))
          .groupBy(col("filename"))
          .agg((max(col("version")) + 1).as("version"))
        ordered(
          v.unionByName(nxt)
            .groupBy(col("filename"))
            .agg(max(col("version")).as("latest"))
        )
      }
    ),
    Q(
      "d8_snapshot_asof",
      // time travel over the versioned store: the corpus exactly as it
      // stood when version 7 was the newest write — per filename, the
      // largest version <= 7. Generalizes the reference's
      // download(file, version) point read (DMS.py:174-200) to a
      // whole-corpus snapshot; one ranking window, no self-join.
      Some(s"""WITH $versionedCte,
              |ranked AS (
              |  SELECT filename, version, doc_id,
              |         row_number() OVER (PARTITION BY filename
              |                            ORDER BY version DESC, doc_id DESC) AS rn
              |  FROM v WHERE version <= 7
              |)
              |SELECT filename, version AS asof_version, doc_id
              |FROM ranked WHERE rn = 1
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("filename"))
          .orderBy(col("version").desc, col("doc_id").desc)
        ordered(
          versioned(t).filter(col("version") <= 7)
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("filename"), col("version").as("asof_version"), col("doc_id"))
        )
      }
    ),
    Q(
      "d8_snapshot_diff",
      // CDC between two time-travel snapshots: the corpus as-of version 4
      // vs as-of version 8, with doc3/doc4 created after t1, doc7
      // deleted before t2 and doc9 frozen at t1's version (fenced in the
      // snapshot predicates, so all four verdicts occur). One ranking
      // window per side + a full-outer join on filename classifies every
      // file added / removed / changed / unchanged — the delta a
      // downstream consumer needs to incrementally refresh from a
      // versioned store, without replaying the log. Both windows and the
      // join hash on the same key (filename), so the join adds no third
      // exchange on top of the two snapshot windows.
      Some(s"""WITH $versionedCte,
              |s1 AS (
              |  SELECT filename, version, doc_id,
              |         row_number() OVER (PARTITION BY filename
              |                            ORDER BY version DESC, doc_id DESC) AS rn
              |  FROM v WHERE version <= 4 AND filename NOT IN ('doc3', 'doc4')
              |),
              |s2 AS (
              |  SELECT filename, version, doc_id,
              |         row_number() OVER (PARTITION BY filename
              |                            ORDER BY version DESC, doc_id DESC) AS rn
              |  FROM v WHERE version <= (CASE WHEN filename = 'doc9' THEN 4 ELSE 8 END)
              |        AND filename <> 'doc7'
              |),
              |t1 AS (SELECT filename, version AS v1, doc_id AS id1 FROM s1 WHERE rn = 1),
              |t2 AS (SELECT filename, version AS v2, doc_id AS id2 FROM s2 WHERE rn = 1)
              |SELECT COALESCE(t1.filename, t2.filename) AS filename, v1, id1, v2, id2,
              |       CASE WHEN v1 IS NULL THEN 'added'
              |            WHEN v2 IS NULL THEN 'removed'
              |            WHEN id1 <> id2 THEN 'changed'
              |            ELSE 'unchanged' END AS status
              |FROM t1 FULL JOIN t2 ON t1.filename = t2.filename
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("filename"))
          .orderBy(col("version").desc, col("doc_id").desc)
        def snap(pred: Column, v: String, id: String) =
          versioned(t).filter(pred)
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("filename"), col("version").as(v), col("doc_id").as(id))
        val t1 = snap(col("version") <= 4 && !col("filename").isin("doc3", "doc4"),
          "v1", "id1")
        val t2 = snap(
          col("version") <= when(col("filename") === "doc9", 4).otherwise(8) &&
            col("filename") =!= "doc7",
          "v2", "id2")
        ordered(
          t1.join(t2, Seq("filename"), "full_outer")
            .select(col("filename"), col("v1"), col("id1"), col("v2"), col("id2"),
              when(col("v1").isNull, "added")
                .when(col("v2").isNull, "removed")
                .when(col("id1") =!= col("id2"), "changed")
                .otherwise("unchanged").as("status"))
        )
      }
    ),
    Q(
      "d8_incremental_agg",
      // Incremental aggregate maintenance — the materialized-view refresh
      // law, hash-PROVEN exact: a per-group aggregate (docs grouped by
      // length(text) % 5, counting docs + total chars) at snapshot t2 is
      // computed as base(t1) ⊎ delta, where the delta contributes
      // -old for every removed/changed file and +new for every
      // added/changed file (group MIGRATION on update falls out of the
      // ± pair). The oracle aggregates the t2 snapshot directly, so the
      // hash match proves base + delta == full recompute. 100 TB shape:
      // the base aggregate is a tiny materialized relation (group
      // cardinality, not corpus), the delta rides the snapshot-diff
      // relation (changed files only) — refresh cost is O(delta), the
      // corpus is never rescanned. Same t1/t2 fences as d8_snapshot_diff
      // so all of added/removed/changed/unchanged are exercised.
      Some(s"""WITH $versionedCte,
              |s2 AS (
              |  SELECT filename, doc_id, text,
              |         row_number() OVER (PARTITION BY filename
              |                            ORDER BY version DESC, doc_id DESC) AS rn
              |  FROM v WHERE version <= (CASE WHEN filename = 'doc9' THEN 4 ELSE 8 END)
              |        AND filename <> 'doc7'
              |)
              |SELECT CAST(length(text) % 5 AS INT) AS grp,
              |       count(*) AS n_docs,
              |       CAST(sum(length(text)) AS BIGINT) AS total_chars
              |FROM s2 WHERE rn = 1
              |GROUP BY 1
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("filename"))
          .orderBy(col("version").desc, col("doc_id").desc)
        def snap(pred: Column) = versioned(t).filter(pred)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("filename"), col("doc_id"), col("text"))
        val s1 = snap(col("version") <= 4 && !col("filename").isin("doc3", "doc4"))
        val s2 = snap(
          col("version") <= when(col("filename") === "doc9", 4).otherwise(8) &&
            col("filename") =!= "doc7")
        // the "materialized view" as of t1 (in production this relation
        // is stored, not recomputed — its size is group cardinality)
        val base = s1
          .select((length(col("text")) % 5).cast("int").as("grp"),
            length(col("text")).cast("long").as("chars"))
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("total_chars"))
        val diff = s1.as("a").join(s2.as("b"), Seq("filename"), "full_outer")
        val removedOrOld = diff
          .filter(col("a.doc_id").isNotNull &&
            (col("b.doc_id").isNull || col("a.doc_id") =!= col("b.doc_id")))
          .select((length(col("a.text")) % 5).cast("int").as("grp"),
            lit(-1L).as("n_docs"),
            (-length(col("a.text"))).cast("long").as("total_chars"))
        val addedOrNew = diff
          .filter(col("b.doc_id").isNotNull &&
            (col("a.doc_id").isNull || col("a.doc_id") =!= col("b.doc_id")))
          .select((length(col("b.text")) % 5).cast("int").as("grp"),
            lit(1L).as("n_docs"),
            length(col("b.text")).cast("long").as("total_chars"))
        ordered(
          base.unionByName(removedOrOld).unionByName(addedOrNew)
            .groupBy(col("grp"))
            .agg(sum(col("n_docs")).as("n_docs"),
              sum(col("total_chars")).as("total_chars"))
            .filter(col("n_docs") > 0)
        )
      }
    ),
    Q(
      "s8_delete_antijoin",
      // delete() (DMS.py:279-311) as rewrite-on-delete: anti-join the
      // tombstone set, survivors keep their counts
      Some(s"""WITH $versionedCte,
              |del AS (
              |  SELECT filename, version FROM v
              |  WHERE filename = 'doc7' OR (filename = 'doc3' AND version <= 5)
              |)
              |SELECT v.filename, count(*) AS n_versions
              |FROM v ANTI JOIN del
              |  ON v.filename = del.filename AND v.version = del.version
              |GROUP BY v.filename
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val v = versioned(t)
        val del = v.filter(col("filename") === "doc7" ||
            (col("filename") === "doc3" && col("version") <= 5))
          .select(col("filename"), col("version"))
        ordered(
          v.join(del, Seq("filename", "version"), "left_anti")
            .groupBy(col("filename"))
            .agg(count(lit(1)).as("n_versions"))
        )
      }
    ),
    Q(
      "s9_row_key_roundtrip",
      // the reference's composite row key, split on the FIRST dot only
      // (fixing delete_all's key.split('.')[1] truncation, DMS.py:413):
      // synthesize v{version}.{filename}, parse it back, prove lossless
      Some(s"""WITH $versionedCte,
              |keys AS (
              |  SELECT concat('v', CAST(version AS VARCHAR), '.', filename) AS row_key,
              |         filename, version FROM v
              |)
              |SELECT row_key,
              |       CAST(regexp_extract(row_key, '^v(\\d+)\\.', 1) AS INT) AS parsed_version,
              |       regexp_extract(row_key, '^v\\d+\\.(.*)$$', 1) AS parsed_filename,
              |       (regexp_extract(row_key, '^v\\d+\\.(.*)$$', 1) = filename
              |        AND CAST(regexp_extract(row_key, '^v(\\d+)\\.', 1) AS INT) = version)
              |         AS lossless
              |FROM keys
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val keys = versioned(t).select(
          concat(lit("v"), col("version").cast("string"), lit("."), col("filename"))
            .as("row_key"),
          col("filename"), col("version"))
        ordered(
          keys.select(
            col("row_key"),
            regexp_extract(col("row_key"), "^v(\\d+)\\.", 1).cast("int").as("parsed_version"),
            regexp_extract(col("row_key"), "^v\\d+\\.(.*)$", 1).as("parsed_filename"),
            (regexp_extract(col("row_key"), "^v\\d+\\.(.*)$", 1) === col("filename") &&
              regexp_extract(col("row_key"), "^v(\\d+)\\.", 1).cast("int") === col("version"))
              .as("lossless")
          )
        )
      }
    ),
    Q(
      "mm_media_features",
      // Multimodal plumbing end-to-end, HASH-checked since round 9 (the
      // d7_compression_golden trick): three LITERAL media rows built by
      // the same SQL in both engines run the REAL chain — ingest header
      // sniff -> partition-local decode (the stub codec seam) -> typed
      // feature rows. The oracle genuinely recomputes raw_len and the
      // stub's n_frames law (video: 1 + bytes % 16) from the literals;
      // the feature-vector abs-sums are GOLDEN CONSTANTS (the stub is a
      // pure splitmix mix over (media_id, Arrays.hashCode(content)) —
      // spec-pinned JVM arithmetic, frozen forever), pinning the decode
      // seam byte-for-byte. Corpus-independent by design; the corpus-
      // scale run of the same pipeline stays hash-checked via
      // mm_frame_sample and the real-codec mm_decode_* family.
      Some("""WITH t AS (
             |  SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), 'image',
             |     repeat('the quick brown fox jumps over the lazy dog. ', 10)),
             |    (CAST(2 AS BIGINT), 'audio',
             |     repeat('sphinx of black quartz judge my vow. ', 8)),
             |    (CAST(3 AS BIGINT), 'video',
             |     repeat('pack my box with five dozen liquor jugs. ', 6))
             |  ) AS v(media_id, kind, txt)
             |),
             |g AS (
             |  SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), CAST(7.3135 AS DOUBLE)),
             |    (CAST(2 AS BIGINT), CAST(9.0843 AS DOUBLE)),
             |    (CAST(3 AS BIGINT), CAST(8.302 AS DOUBLE))
             |  ) AS w(media_id, abs_feat_sum)
             |)
             |SELECT t.media_id, t.kind,
             |       CAST(octet_length(encode(t.txt)) AS BIGINT) AS raw_len,
             |       CAST(-1 AS INT) AS width, CAST(-1 AS INT) AS height,
             |       CAST(CASE WHEN t.kind = 'video'
             |                 THEN 1 + octet_length(encode(t.txt)) % 16
             |                 ELSE 1 END AS INT) AS n_frames,
             |       g.abs_feat_sum
             |FROM t JOIN g USING (media_id)
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val raw = spark.range(1).select(explode(array(
          struct(lit(1L).as("media_id"), lit("image").as("kind"),
            encode(expr("repeat('the quick brown fox jumps over the lazy dog. ', 10)"),
              "UTF-8").as("content")),
          struct(lit(2L).as("media_id"), lit("audio").as("kind"),
            encode(expr("repeat('sphinx of black quartz judge my vow. ', 8)"),
              "UTF-8").as("content")),
          struct(lit(3L).as("media_id"), lit("video").as("kind"),
            encode(expr("repeat('pack my box with five dozen liquor jugs. ', 6)"),
              "UTF-8").as("content"))
        )).as("s")).select(col("s.media_id").as("media_id"),
          col("s.kind").as("kind"), col("s.content").as("content"))
        val lens = raw.select(col("media_id"),
          length(col("content")).cast("long").as("raw_len"))
        val feats = graft.multimodal.Multimodal.pipeline(spark, raw).toDF()
        ordered(
          feats.join(lens, "media_id")
            .select(col("media_id"), col("kind"), col("raw_len"),
              col("width"), col("height"), col("n_frames"),
              r4(aggregate(col("features"), lit(0.0),
                (acc, x) => acc + abs(x))).as("abs_feat_sum")))
      }
    ),
    Q(
      "mm_frame_sample",
      // frame-sampling plumbing, HASH-checked: the full multimodal chain
      // (ingest header-sniff -> partition-local stub decode -> every-4th
      // frame explode) runs for real; the stub's deterministic frame
      // count (1 + byte_length % 16 for video) is SQL-mirrorable, so the
      // oracle checks the operator chain even though the codec is a seam.
      Some("""SELECT doc_id AS media_id,
             |       unnest(range(0, 1 + octet_length(encode(text)) % 16, 4))
             |         AS frame_idx
             |FROM documents WHERE doc_id % 3 = 2
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val raw = t.documents
          .select(
            col("doc_id").as("media_id"),
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (col("doc_id") % 3 + 1).cast("int")).as("kind"),
            encode(col("text"), "UTF-8").as("content"))
        val feats = graft.multimodal.Multimodal.pipeline(spark, raw)
        ordered(
          graft.multimodal.Multimodal.sampleFrames(feats, everyN = 4)
            .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
        )
      }
    ),
    Q(
      "mm_decode_bmp",
      // REAL image decode, exact-hash-checked: deterministic 24-bit BMPs
      // (width 3..5 so row padding varies, bottom-up rows) are synthesized
      // per doc, sniffed by ingest, then decoded pixel-by-pixel by
      // decodeBmp. Channel byte k has value (seed + k) % 256 by
      // construction, so DuckDB recomputes the exact sums the decoder must
      // extract from the binary — padding or row-order bugs break the hash.
      Some("""WITH k AS (SELECT unnest(range(0, 45)) AS k)
             |SELECT doc_id AS media_id,
             |       'image/bmp' AS mime,
             |       CAST(3 + doc_id % 3 AS INT) AS width,
             |       3 AS height,
             |       CAST((3 + doc_id % 3) * 3 AS BIGINT) AS n_px,
             |       CAST(sum((doc_id * 31 + k) % 256) AS BIGINT) AS pix_sum,
             |       CAST(sum(((doc_id * 31 + k) % 256) * ((doc_id * 31 + k) % 256)) AS BIGINT)
             |         AS pix_sq_sum,
             |       CAST((doc_id * 31) % 256 + (doc_id * 31 + 1) % 256
             |            + (doc_id * 31 + 2) % 256 AS BIGINT) AS first_px
             |FROM documents CROSS JOIN k
             |WHERE k < (3 + doc_id % 3) * 9
             |GROUP BY doc_id
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"), lit("image").as("kind"),
          mm.synthBmpUdf(col("doc_id") * 31,
            (col("doc_id") % 3 + 3).cast("int"), lit(3)).as("content"))
        val m = mm.ingest(raw) // mime must sniff as image/bmp from real magic bytes
          .withColumn("s", mm.bmpStatsUdf(col("content")))
        ordered(
          m.select(col("media_id"), col("mime"),
            col("s.width").as("width"), col("s.height").as("height"),
            col("s.n_px").as("n_px"), col("s.pix_sum").as("pix_sum"),
            col("s.pix_sq_sum").as("pix_sq_sum"), col("s.first_px").as("first_px"))
        )
      }
    ),
    Q(
      "mm_resize_bmp",
      // REAL image resize, exact-hash-checked: nearest-neighbor resample
      // of actual decoded pixels into a new BMP, then decode of the
      // RESIZED binary. Target pixel (px,py) channel c comes from source
      // pixel (px*w//2, py*3//2), whose value is closed-form, so DuckDB
      // recomputes the resized image's exact pixel sums. k enumerates the
      // 12 channel bytes of the 2x2 target: py=k//6, px=(k//3)%2, c=k%3.
      Some("""WITH k AS (SELECT unnest(range(0, 12)) AS k)
             |SELECT doc_id AS media_id,
             |       2 AS width, 2 AS height,
             |       CAST(sum((doc_id * 31
             |                 + ((k // 6) * (3 + doc_id % 3)
             |                    + ((k // 3) % 2) * (3 + doc_id % 3) // 2) * 3
             |                 + k % 3) % 256) AS BIGINT) AS pix_sum,
             |       CAST(sum(((doc_id * 31
             |                  + ((k // 6) * (3 + doc_id % 3)
             |                     + ((k // 3) % 2) * (3 + doc_id % 3) // 2) * 3
             |                  + k % 3) % 256)
             |                * ((doc_id * 31
             |                    + ((k // 6) * (3 + doc_id % 3)
             |                       + ((k // 3) % 2) * (3 + doc_id % 3) // 2) * 3
             |                    + k % 3) % 256)) AS BIGINT) AS pix_sq_sum,
             |       CAST((doc_id * 31) % 256 + (doc_id * 31 + 1) % 256
             |            + (doc_id * 31 + 2) % 256 AS BIGINT) AS first_px
             |FROM documents CROSS JOIN k
             |GROUP BY doc_id
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"),
          mm.synthBmpUdf(col("doc_id") * 31,
            (col("doc_id") % 3 + 3).cast("int"), lit(3)).as("content"))
        val resized = raw.select(col("media_id"),
          mm.resizeBmpUdf(col("content"), lit(2), lit(2)).as("content"))
        val s = mm.bmpStatsUdf(col("content")).as("s")
        ordered(
          resized.select(col("media_id"), s)
            .select(col("media_id"),
              col("s.width").as("width"), col("s.height").as("height"),
              col("s.pix_sum").as("pix_sum"), col("s.pix_sq_sum").as("pix_sq_sum"),
              col("s.first_px").as("first_px"))
        )
      }
    ),
    Q(
      "mm_dhash",
      // Perceptual image fingerprint (dHash), exact-hash-checked through
      // the REAL pixel path: synth BMP (multiplicative pattern, so hashes
      // genuinely vary per image) -> nearest-neighbor 9x8 resample ->
      // integer grayscale -> 64 adjacent-pixel comparison bits. Doc pairs
      // (2i, 2i+1) share a seed and differ by +1 global brightness — the
      // canonical near-duplicate. DuckDB recomputes every bit from the
      // closed-form pixel values — resample, grayscale or bit-order bugs
      // all break the hash. Emitted as (hi, lo) 32-bit halves to stay in
      // portable non-negative BIGINT space.
      Some(s"""WITH $dhashCte
              |SELECT media_id, hash_hi, hash_lo FROM hashes
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        ordered(dhashFrame(spark, dir)
          .select(col("media_id"), col("hi").as("hash_hi"), col("lo").as("hash_lo")))
      }
    ),
    Q(
      "mm_dhash_png",
      // The SAME perceptual hashes, but through the COMPRESSED codec:
      // each image is a real PNG (zlib-deflated, scanline-filtered) of
      // the identical multiplicative pixel content, decoded by the real
      // inflate+unfilter path and transcoded to the canonical pixel
      // space before hashing. The oracle is mm_dhash's closed-form bit
      // arithmetic UNCHANGED — a hash match proves container invariance:
      // decode → canonical pixels → hash gives bit-identical fingerprints
      // from either codec, through the compression layer.
      Some(s"""WITH $dhashCte
              |SELECT media_id, hash_hi, hash_lo FROM hashes
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        ordered(dhashFrame(spark, dir, png = true)
          .select(col("media_id"), col("hi").as("hash_hi"), col("lo").as("hash_lo")))
      }
    ),
    Q(
      "mm_dhash_neardup",
      // Near-duplicate IMAGE detection — the visual twin of the SimHash
      // text path: 16-bit band keys from the dHash, equi-join on
      // (band, key) for candidates (never all-pairs), exact hamming <= 6
      // filter on the candidates. The planted brightness twins differ by
      // only boundary bits, so they band-collide and survive the filter;
      // the whole candidate->verdict pipeline is exact integer math DuckDB
      // reproduces bit-for-bit.
      Some(s"""WITH $dhashCte,
              |bands AS (
              |  SELECT media_id, hash_hi, hash_lo, t.b,
              |    CASE t.b WHEN 0 THEN hash_lo & 65535
              |             WHEN 1 THEN (hash_lo >> 16) & 65535
              |             WHEN 2 THEN hash_hi & 65535
              |             ELSE (hash_hi >> 16) & 65535 END AS bkey
              |  FROM hashes CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t
              |),
              |cand AS (
              |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
              |    bit_count(xor(a.hash_hi, b.hash_hi))
              |      + bit_count(xor(a.hash_lo, b.hash_lo)) AS hamming
              |  FROM bands a
              |  JOIN bands b ON a.b = b.b AND a.bkey = b.bkey
              |             AND a.media_id < b.media_id
              |)
              |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 6
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val hs = dhashFrame(spark, dir).cut(Shared) // both join sides
        val bands = hs.select(col("media_id"), col("hi"), col("lo"),
          posexplode(array(
            col("lo").bitwiseAND(lit(65535L)),
            shiftrightunsigned(col("lo"), 16).bitwiseAND(lit(65535L)),
            col("hi").bitwiseAND(lit(65535L)),
            shiftrightunsigned(col("hi"), 16).bitwiseAND(lit(65535L))))
            .as(Seq("b", "bkey")))
        val a = bands.select(col("media_id").as("id_a"), col("hi").as("hia"),
          col("lo").as("loa"), col("b"), col("bkey"))
        val bb = bands.select(col("media_id").as("id_b"), col("hi").as("hib"),
          col("lo").as("lob"), col("b"), col("bkey"))
        ordered(
          a.join(bb, Seq("b", "bkey"))
            .filter(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"),
              expr("bit_count(hia ^ hib) + bit_count(loa ^ lob)").as("hamming"))
            .distinct()
            .filter(col("hamming") <= 6)
        )
      }
    ),
    Q(
      "mm_decode_png",
      // REAL compressed-image decode, exact-hash-checked: deterministic
      // 8-bit RGB PNGs (width 3..5, height 6 — scanline y carries filter
      // type y % 5, so None/Sub/Up/Average/Paeth ALL run) are synthesized
      // per doc, zlib-inflated and unfiltered by decodePng. Reconstructed
      // channel byte k has value (seed + k) % 256 by construction, so
      // DuckDB recomputes the exact sums the decoder must reconstruct
      // through the compression layer — any inflate or filter-math bug
      // breaks the hash.
      Some("""WITH k AS (SELECT unnest(range(0, 90)) AS k)
             |SELECT doc_id AS media_id,
             |       'image/png' AS mime,
             |       CAST(3 + doc_id % 3 AS INT) AS width,
             |       6 AS height,
             |       CAST((3 + doc_id % 3) * 6 AS BIGINT) AS n_px,
             |       CAST(sum((doc_id * 17 + k) % 256) AS BIGINT) AS pix_sum,
             |       CAST(sum(((doc_id * 17 + k) % 256) * ((doc_id * 17 + k) % 256)) AS BIGINT)
             |         AS pix_sq_sum,
             |       CAST((doc_id * 17) % 256 + (doc_id * 17 + 1) % 256
             |            + (doc_id * 17 + 2) % 256 AS BIGINT) AS first_px
             |FROM documents CROSS JOIN k
             |WHERE k < (3 + doc_id % 3) * 18
             |GROUP BY doc_id
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"), lit("image").as("kind"),
          mm.synthPngUdf(col("doc_id") * 17,
            (col("doc_id") % 3 + 3).cast("int"), lit(6)).as("content"))
        val m = mm.ingest(raw) // mime must sniff as image/png from real magic bytes
          .withColumn("s", mm.pngStatsUdf(col("content")))
        ordered(
          m.select(col("media_id"), col("mime"),
            col("s.width").as("width"), col("s.height").as("height"),
            col("s.n_px").as("n_px"), col("s.pix_sum").as("pix_sum"),
            col("s.pix_sq_sum").as("pix_sq_sum"), col("s.first_px").as("first_px"))
        )
      }
    ),
    Q(
      "mm_decode_avi",
      // REAL video-CONTAINER decode, exact-hash-checked: deterministic
      // AVI files (RIFF envelope, hdrl/strl headers, movi LIST of 2-3
      // uncompressed bottom-up DIB frames with row padding) are
      // synthesized per doc and walked by decodeAvi — one output row per
      // (media, frame). Visual channel byte k of frame f is
      // (seed + f·w·3·h + k) % 256 by construction, so DuckDB recomputes
      // each frame's exact pixel sums THROUGH the container walk: a
      // chunk-size, padding, row-order or frame-offset bug breaks the
      // hash. The MJPEG ('00dc' via the JDK codec) path of the same
      // walk is cross-validated in MultimodalSpec.
      Some("""WITH f AS (SELECT unnest(range(0, 3)) AS f),
             |k AS (SELECT unnest(range(0, 45)) AS k)
             |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
             |       CAST(3 + doc_id % 3 AS INT) AS width,
             |       3 AS height,
             |       CAST((3 + doc_id % 3) * 3 AS BIGINT) AS n_px,
             |       CAST(sum((doc_id * 17 + f * (3 + doc_id % 3) * 9 + k) % 256)
             |            AS BIGINT) AS pix_sum,
             |       CAST(sum(((doc_id * 17 + f * (3 + doc_id % 3) * 9 + k) % 256)
             |                * ((doc_id * 17 + f * (3 + doc_id % 3) * 9 + k) % 256))
             |            AS BIGINT) AS pix_sq_sum,
             |       CAST((doc_id * 17 + f * (3 + doc_id % 3) * 9) % 256
             |            + (doc_id * 17 + f * (3 + doc_id % 3) * 9 + 1) % 256
             |            + (doc_id * 17 + f * (3 + doc_id % 3) * 9 + 2) % 256
             |            AS BIGINT) AS first_px
             |FROM documents CROSS JOIN f CROSS JOIN k
             |WHERE f < 2 + doc_id % 2 AND k < (3 + doc_id % 3) * 9
             |GROUP BY doc_id, f
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"),
          mm.synthAviUdf(col("doc_id") * 17,
            (col("doc_id") % 3 + 3).cast("int"), lit(3),
            (col("doc_id") % 2 + 2).cast("int")).as("content"))
        ordered(
          raw.select(col("media_id"),
            explode(mm.aviFramesUdf(col("content"))).as("s"))
            .select(col("media_id"), col("s.frame_idx").as("frame_idx"),
              col("s.width").as("width"), col("s.height").as("height"),
              col("s.n_px").as("n_px"), col("s.pix_sum").as("pix_sum"),
              col("s.pix_sq_sum").as("pix_sq_sum"), col("s.first_px").as("first_px"))
        )
      }
    ),
    Q(
      "mm_decode_mp4",
      // REAL ISO-BMFF container decode, exact-hash-checked: deterministic
      // MP4s (ftyp brand, moov sample tables — 'raw ' VisualSampleEntry
      // stsd, stts durations, a two-chunk stsc/stco split so the
      // sample-to-chunk reconstruction actually runs — mdat of top-down
      // RGB24 frames) are synthesized per doc and walked by decodeMp4.
      // Byte k of frame f is (seed + f·w·h·3 + k) % 256 and every
      // sample's stts delta is 30 + doc_id % 5, so DuckDB recomputes each
      // sample's exact pixel sums AND duration THROUGH the box walk: a
      // big-endian/size-inclusion, stsc-run, chunk-offset or stts bug
      // breaks the hash. Closes the non-RIFF video-container seam next
      // to mm_decode_avi.
      Some("""WITH f AS (SELECT unnest(range(0, 3)) AS f),
             |k AS (SELECT unnest(range(0, 45)) AS k)
             |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
             |       CAST(3 + doc_id % 3 AS INT) AS width,
             |       3 AS height,
             |       CAST((3 + doc_id % 3) * 3 AS BIGINT) AS n_px,
             |       CAST(sum((doc_id * 19 + f * (3 + doc_id % 3) * 9 + k) % 256)
             |            AS BIGINT) AS pix_sum,
             |       CAST(sum(((doc_id * 19 + f * (3 + doc_id % 3) * 9 + k) % 256)
             |                * ((doc_id * 19 + f * (3 + doc_id % 3) * 9 + k) % 256))
             |            AS BIGINT) AS pix_sq_sum,
             |       CAST((doc_id * 19 + f * (3 + doc_id % 3) * 9) % 256
             |            + (doc_id * 19 + f * (3 + doc_id % 3) * 9 + 1) % 256
             |            + (doc_id * 19 + f * (3 + doc_id % 3) * 9 + 2) % 256
             |            AS BIGINT) AS first_px,
             |       CAST(30 + doc_id % 5 AS INT) AS dur_ticks
             |FROM documents CROSS JOIN f CROSS JOIN k
             |WHERE f < 2 + doc_id % 2 AND k < (3 + doc_id % 3) * 9
             |GROUP BY doc_id, f
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"),
          mm.synthMp4Udf(col("doc_id") * 19,
            (col("doc_id") % 3 + 3).cast("int"), lit(3),
            (col("doc_id") % 2 + 2).cast("int"),
            (col("doc_id") % 5 + 30).cast("int")).as("content"))
        ordered(
          raw.select(col("media_id"),
            explode(mm.mp4FramesUdf(col("content"))).as("s"))
            .select(col("media_id"), col("s.frame_idx").as("frame_idx"),
              col("s.width").as("width"), col("s.height").as("height"),
              col("s.n_px").as("n_px"), col("s.pix_sum").as("pix_sum"),
              col("s.pix_sq_sum").as("pix_sq_sum"), col("s.first_px").as("first_px"),
              col("s.dur_ticks").as("dur_ticks"))
        )
      }
    ),
    Q(
      "mm_decode_mkv",
      // REAL EBML/Matroska container decode, exact-hash-checked: per-doc
      // MKVs (EBML header, Segment → Info/Tracks with a V_UNCOMPRESSED
      // video TrackEntry, two Clusters of SimpleBlocks carrying signed
      // relative timestamps) are synthesized and walked by decodeMkv.
      // Byte k of frame f is (seed + f·w·h·3 + k) % 256 and frame f's
      // absolute timestamp is f·(30 + doc_id % 5) ms, so DuckDB
      // recomputes each block's exact pixel sums AND timestamp THROUGH
      // the walk: a varint-width, unknown-size, cluster/block-timestamp
      // or lacing bug breaks the hash. With RIFF (AVI), ISO-BMFF (MP4)
      // and EBML (MKV) all walked for real, every major video container
      // family is off the stub seam.
      Some("""WITH f AS (SELECT unnest(range(0, 3)) AS f),
             |k AS (SELECT unnest(range(0, 45)) AS k)
             |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
             |       CAST(3 + doc_id % 3 AS INT) AS width,
             |       3 AS height,
             |       CAST((3 + doc_id % 3) * 3 AS BIGINT) AS n_px,
             |       CAST(sum((doc_id * 23 + f * (3 + doc_id % 3) * 9 + k) % 256)
             |            AS BIGINT) AS pix_sum,
             |       CAST(sum(((doc_id * 23 + f * (3 + doc_id % 3) * 9 + k) % 256)
             |                * ((doc_id * 23 + f * (3 + doc_id % 3) * 9 + k) % 256))
             |            AS BIGINT) AS pix_sq_sum,
             |       CAST((doc_id * 23 + f * (3 + doc_id % 3) * 9) % 256
             |            + (doc_id * 23 + f * (3 + doc_id % 3) * 9 + 1) % 256
             |            + (doc_id * 23 + f * (3 + doc_id % 3) * 9 + 2) % 256
             |            AS BIGINT) AS first_px,
             |       CAST(f * (30 + doc_id % 5) AS BIGINT) AS ts_ms
             |FROM documents CROSS JOIN f CROSS JOIN k
             |WHERE f < 2 + doc_id % 2 AND k < (3 + doc_id % 3) * 9
             |GROUP BY doc_id, f
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"),
          mm.synthMkvUdf(col("doc_id") * 23,
            (col("doc_id") % 3 + 3).cast("int"), lit(3),
            (col("doc_id") % 2 + 2).cast("int"),
            (col("doc_id") % 5 + 30).cast("int")).as("content"))
        ordered(
          raw.select(col("media_id"),
            explode(mm.mkvFramesUdf(col("content"))).as("s"))
            .select(col("media_id"), col("s.frame_idx").as("frame_idx"),
              col("s.width").as("width"), col("s.height").as("height"),
              col("s.n_px").as("n_px"), col("s.pix_sum").as("pix_sum"),
              col("s.pix_sq_sum").as("pix_sq_sum"), col("s.first_px").as("first_px"),
              col("s.ts_ms").as("ts_ms"))
        )
      }
    ),
    Q(
      "mm_decode_gif",
      // REAL video-path decode, exact-hash-checked: deterministic animated
      // GIFs (2..4 full-size frames, 256-gray palette, real LZW streams)
      // are synthesized per doc and decoded frame by frame — one output
      // row per (media, frame), i.e. the actual frame explosion of the
      // multimodal pipeline, not a stub formula. Pixel index at
      // (frame f, pos k) is (seed + 997f + k) % 256 with a grayscale
      // palette, so DuckDB recomputes each frame's exact channel sums;
      // any LZW dictionary/bit-packing bug breaks the hash.
      Some("""WITH f AS (SELECT unnest(range(0, 4)) AS f),
             |k AS (SELECT unnest(range(0, 20)) AS k)
             |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
             |       CAST(3 + doc_id % 3 AS INT) AS width,
             |       4 AS height,
             |       CAST(3 * sum((doc_id * 13 + 997 * f + k) % 256) AS BIGINT) AS px_sum,
             |       CAST(3 * sum(((doc_id * 13 + 997 * f + k) % 256)
             |                    * ((doc_id * 13 + 997 * f + k) % 256)) AS BIGINT)
             |         AS px_sq_sum,
             |       CAST(3 * ((doc_id * 13 + 997 * f) % 256) AS BIGINT) AS first_px
             |FROM documents CROSS JOIN f CROSS JOIN k
             |WHERE f < 2 + doc_id % 3 AND k < (3 + doc_id % 3) * 4
             |GROUP BY doc_id, f
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"),
          mm.synthGifUdf(col("doc_id") * 13,
            (col("doc_id") % 3 + 3).cast("int"), lit(4),
            (col("doc_id") % 3 + 2).cast("int")).as("content"))
        ordered(
          raw.select(col("media_id"),
            explode(mm.gifFramesUdf(col("content"))).as("s"))
            .select(col("media_id"), col("s.frame_idx").as("frame_idx"),
              col("s.width").as("width"), col("s.height").as("height"),
              col("s.px_sum").as("px_sum"), col("s.px_sq_sum").as("px_sq_sum"),
              col("s.first_px").as("first_px"))
        )
      }
    ),
    Q(
      "mm_scene_cuts",
      // REAL shot-boundary detection over decoded video frames,
      // exact-hash-checked: consecutive-frame mean-intensity deltas on
      // the mm_decode_gif frame sequences, a cut declared where the mean
      // shifts by > 64 gray levels. The synth pattern's +997/frame pixel
      // walk wraps mod 256 at varying phase, so ~10% of transitions
      // genuinely cross the threshold — a real gradient, not all-cuts.
      // The cut test is the integer cross-multiply |Δpx_sum| > 64·3·npx
      // (no float mean), and DuckDB predicts every Δ in closed form, so
      // any LZW decode bug still breaks the hash. 100 TB shape: decode
      // is a per-row scan UDF at ingest; the transition lag rides a
      // per-media window partitioned by media_id whose partitions are
      // frame-count-sized — the standard video-pipeline explode.
      Some("""WITH f AS (SELECT unnest(range(0, 4)) AS f),
             |k AS (SELECT unnest(range(0, 20)) AS k),
             |fr AS (
             |  SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
             |         (3 + doc_id % 3) * 4 AS npx,
             |         CAST(3 * sum((doc_id * 13 + 997 * f + k) % 256)
             |              AS BIGINT) AS px_sum
             |  FROM documents CROSS JOIN f CROSS JOIN k
             |  WHERE f < 2 + doc_id % 3 AND k < (3 + doc_id % 3) * 4
             |  GROUP BY doc_id, f
             |),
             |tr AS (
             |  SELECT media_id, frame_idx, npx, px_sum,
             |         lag(px_sum) OVER (PARTITION BY media_id
             |                           ORDER BY frame_idx) AS prev
             |  FROM fr
             |)
             |SELECT media_id, frame_idx,
             |       CAST(abs(px_sum - prev) AS BIGINT) AS delta_sum,
             |       CAST(abs(px_sum - prev) > 64 * 3 * npx AS INT) AS is_cut
             |FROM tr WHERE prev IS NOT NULL
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val frames = t.documents.select(
            col("doc_id").as("media_id"),
            mm.synthGifUdf(col("doc_id") * 13,
              (col("doc_id") % 3 + 3).cast("int"), lit(4),
              (col("doc_id") % 3 + 2).cast("int")).as("content"))
          .select(col("media_id"),
            explode(mm.gifFramesUdf(col("content"))).as("s"))
          .select(col("media_id"), col("s.frame_idx").as("frame_idx"),
            (col("s.width") * col("s.height")).as("npx"),
            col("s.px_sum").as("px_sum"))
        val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
        ordered(
          frames
            .withColumn("prev", lag(col("px_sum"), 1).over(w))
            .filter(col("prev").isNotNull)
            .select(col("media_id"), col("frame_idx"),
              abs(col("px_sum") - col("prev")).as("delta_sum"),
              (abs(col("px_sum") - col("prev")) > lit(64) * 3 * col("npx"))
                .cast("int").as("is_cut")))
      }
    ),
    Q(
      "mm_audio_spectrum",
      // REAL spectral analysis, exact-hash-checked: square-wave WAVs of
      // period 8/16/32 samples are synthesized per doc and pushed through
      // an actual radix-2 FFT (Multimodal.fft); the dominant non-DC bin
      // of a period-p square wave at N=256 is N/p in closed form, so
      // DuckDB predicts the exact integer the FFT must produce — a
      // butterfly/bit-reversal/twiddle bug lands on the wrong bin and
      // breaks the hash.
      Some("""SELECT doc_id AS media_id,
             |       CAST(8 * (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) AS INT)
             |         AS period,
             |       CAST(32 / (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) AS INT)
             |         AS dominant_bin
             |FROM documents
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val period = expr("cast(8 * shiftleft(1, cast(doc_id % 3 as int)) as int)")
        ordered(
          t.documents.select(
            col("doc_id").as("media_id"),
            period.as("period"),
            mm.synthWavSquareUdf(period, lit(256)).as("content"))
            .select(col("media_id"), col("period"),
              mm.dominantBinUdf(col("content"), lit(256)).as("dominant_bin"))
        )
      }
    ),
    Q(
      "mm_decode_wav",
      // REAL audio decode, exact-hash-checked: deterministic mono 16-bit
      // PCM WAVs (64..127 samples, sample i = (seed + 13i) % 65536 - 32768)
      // are synthesized per doc; sample_rate/duration_ms come from the
      // header sniff (RIFF chunk walk) and the sums from decoding the
      // actual little-endian samples. DuckDB recomputes both closed-form.
      Some("""WITH k AS (SELECT unnest(range(0, 128)) AS k)
             |SELECT doc_id AS media_id,
             |       'audio/wav' AS mime,
             |       8000 AS sample_rate,
             |       CAST((64 + doc_id % 64) // 8 AS BIGINT) AS duration_ms,
             |       CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
             |       CAST(sum((doc_id * 7 + k * 13) % 65536 - 32768) AS BIGINT) AS smp_sum,
             |       CAST(sum(((doc_id * 7 + k * 13) % 65536 - 32768)
             |                * ((doc_id * 7 + k * 13) % 65536 - 32768)) AS BIGINT)
             |         AS smp_sq_sum
             |FROM documents CROSS JOIN k
             |WHERE k < 64 + doc_id % 64
             |GROUP BY doc_id
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val raw = t.documents.select(
          col("doc_id").as("media_id"), lit("audio").as("kind"),
          mm.synthWavUdf(col("doc_id") * 7,
            (col("doc_id") % 64 + 64).cast("int")).as("content"))
        val m = mm.ingest(raw) // sample_rate + duration_ms from the real header walk
          .withColumn("s", mm.wavStatsUdf(col("content")))
        ordered(
          m.select(col("media_id"), col("mime"), col("sample_rate"),
            col("duration_ms"),
            col("s.n_samples").as("n_samples"), col("s.smp_sum").as("smp_sum"),
            col("s.smp_sq_sum").as("smp_sq_sum"))
        )
      }
    ),
    Q(
      "d8_incremental_join_view",
      // INCREMENTAL JOIN-VIEW MAINTENANCE — d8_incremental_agg's sibling
      // for ENRICHMENT views (V = A ⋈ dims): yesterday's view is a STORED
      // parquet relation (written and read back here, exactly as a
      // nightly ETL would keep it), and the refresh appends only
      // ΔA ⋈ dims. The oracle joins the full fact table directly, so the
      // hash match proves stored-base ∪ delta-join == full recompute —
      // the algebraic identity incremental ETL rests on. 100 TB shape:
      // refresh cost rides the DELTA (today's partition) against
      // broadcastable dims; the historical fact table is never rescanned,
      // and the stored view is append-only.
      Some("""SELECT o_orderkey, c_mktsegment,
             |       CAST(o_totalprice AS DOUBLE) AS price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val basePath = java.nio.file.Paths
          .get(System.getProperty("java.io.tmpdir"), "graft_join_view").toString
        val cust = t.customer.select(col("c_custkey"), col("c_mktsegment"))
        def enrich(o: org.apache.spark.sql.DataFrame) =
          o.join(cust, col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), col("c_mktsegment"),
              col("o_totalprice").cast("double").as("price"))
        // yesterday's stored view: all history except today's batch
        enrich(t.orders.filter(col("o_orderkey") % 7 =!= 0))
          .write.mode("overwrite").parquet(basePath)
        val delta = enrich(t.orders.filter(col("o_orderkey") % 7 === 0))
        ordered(spark.read.parquet(basePath).unionByName(delta))
      }
    ),
    Q(
      "mm_wav_vad",
      // VOICE-ACTIVITY SEGMENTATION over REAL decoded PCM — the audio
      // twin of mm_scene_cuts: deterministic burst-gated WAVs (32-sample
      // voiced/silence blocks, amplitude bands separated 4000x) are
      // synthesized per doc, the engine decodes the actual little-endian
      // samples (RIFF walk), computes windowed absolute energy with
      // higher-order functions, thresholds to an activity mask, and
      // counts voiced windows / contiguous voiced segments / voiced
      // milliseconds. The oracle predicts all three closed-form from the
      // synthesis rule, so a decode offset, window misalignment, or
      // run-boundary bug breaks the hash. 100 TB shape: pure per-row
      // ingest-time compute (decode + fixed-size HOF fold), no shuffle
      // before the final ordering; state per row is one window mask.
      Some("""WITH j AS (SELECT unnest(range(0, 11)) AS j),
             |b AS (
             |  SELECT doc_id, 6 + doc_id % 5 AS nb
             |  FROM documents WHERE doc_id < 300
             |),
             |w AS (
             |  SELECT doc_id, nb, j.j AS j,
             |         CASE WHEN (doc_id + j.j) % 3 <> 0 THEN 1 ELSE 0 END AS act,
             |         CASE WHEN (doc_id + j.j) % 3 <> 0
             |              AND (j.j = 0 OR (doc_id + j.j - 1) % 3 = 0)
             |              THEN 1 ELSE 0 END AS seg_start
             |  FROM b JOIN j ON j.j < b.nb
             |)
             |SELECT doc_id, CAST(nb AS BIGINT) AS n_blocks,
             |       CAST(sum(act) AS BIGINT) AS n_active,
             |       CAST(sum(seg_start) AS BIGINT) AS n_segments,
             |       CAST(sum(act) * 4 AS BIGINT) AS voiced_ms
             |FROM w GROUP BY doc_id, nb
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val mm = graft.multimodal.Multimodal
        val nb = (lit(6) + col("doc_id") % 5).cast("int")
        val df = t.documents
          .filter(col("doc_id") < 300L)
          .select(col("doc_id"), nb.as("nb"),
            mm.synthWavBurstsUdf(col("doc_id"), nb).as("content"))
          .withColumn("samples", mm.wavSamplesUdf(col("content"), lit(352)))
          // 32-sample windowed absolute energy from the DECODED samples,
          // thresholded mid-band (silence ≤ 64, voiced ≥ 256000)
          .withColumn("act", expr(
            """transform(sequence(0, nb - 1), j ->
              |  aggregate(slice(samples, j * 32 + 1, 32), 0D,
              |            (a, x) -> a + abs(x)) > 128000D)""".stripMargin))
        val nActive = expr("size(filter(act, a -> a))")
        ordered(
          df.select(col("doc_id"), col("nb").cast("long").as("n_blocks"),
            nActive.cast("long").as("n_active"),
            expr("""size(filter(sequence(0, nb - 1),
                   |  j -> act[j] AND (j = 0 OR NOT act[j - 1])))""".stripMargin)
              .cast("long").as("n_segments"),
            (nActive * 4).cast("long").as("voiced_ms")))
      }
    ),
    Q(
      "d1_metadata_sniff",
      // D1 over the corpus: text bytes sniff as text/plain with exact byte
      // length; image-header parsing is covered by MetadataSpec goldens
      Some("""SELECT doc_id,
             |       'text/plain' AS mime,
             |       CAST(octet_length(encode(text)) AS VARCHAR) AS byte_length
             |FROM documents
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val meta = Metadata.sniffUdf(encode(col("text"), "UTF-8"))
        ordered(
          t.documents
            .select(col("doc_id"), meta.as("meta"))
            .select(
              col("doc_id"),
              element_at(col("meta"), "mime").as("mime"),
              element_at(col("meta"), "length").as("byte_length")
            )
        )
      }
    ),
    Q(
      "j22_scd2_temporal_join",
      // TEMPORAL (AS-OF) JOIN TO AN SCD2 DIMENSION — the warehouse
      // classic d8_scd2_history exists to serve: each shipment line finds
      // the customer-status version that was valid AT ITS SHIP DATE.
      // Spelled as the j8 as-of shape — equi-join on custkey restricted
      // to valid_from <= ship_ts, then one per-fact argmax (latest
      // valid_from, version tiebreak) via a row_number window — instead
      // of a valid_to range residual: no interval bookkeeping, and the
      // candidate volume rides facts × per-customer version count (the
      // dimension churn, bounded), never the fact square. Both engines
      // run the identical island build + window, so the whole path
      // hash-matches. 100 TB shape: the SCD2 build is one custkey
      // shuffle (d8_scd2_history); the join + argmax share the fact's
      // order-line partitioning.
      Some("""WITH h AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
             |                                  ORDER BY o_orderdate, o_orderkey)
             |           AS prev
             |  FROM orders
             |),
             |seg AS (
             |  SELECT *,
             |         count(*) FILTER (WHERE prev IS NULL OR prev <> o_orderstatus)
             |           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                 ROWS UNBOUNDED PRECEDING) AS island
             |  FROM h
             |),
             |islands AS (
             |  SELECT o_custkey AS custkey, island AS version,
             |         min(o_orderstatus) AS status,
             |         min(o_orderdate) AS valid_from
             |  FROM seg GROUP BY 1, 2
             |),
             |f AS (
             |  -- (orderkey, linenumber) is NOT unique in the synthetic
             |  -- lineitem; distinct pins one fact row per (line, ship ts)
             |  SELECT DISTINCT l.l_orderkey, l.l_linenumber,
             |         o.o_custkey AS custkey, l.l_shipdate AS ts
             |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |  WHERE l.l_orderkey < 2000
             |),
             |cand AS (
             |  SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.ts,
             |         i.status, i.valid_from,
             |         row_number() OVER (PARTITION BY f.l_orderkey, f.l_linenumber,
             |                                         f.ts
             |                            ORDER BY i.valid_from DESC, i.version DESC)
             |           AS rn
             |  FROM f JOIN islands i
             |    ON i.custkey = f.custkey AND i.valid_from <= f.ts
             |)
             |SELECT l_orderkey, l_linenumber, custkey,
             |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ship_ts,
             |       status AS status_at_ship,
             |       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS status_since
             |FROM cand WHERE rn = 1
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val byCust = Window.partitionBy(col("custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val h = t.orders
          .select(col("o_custkey").as("custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_orderstatus"))
          .withColumn("prev", lag(col("o_orderstatus"), 1).over(byCust))
        val islands = h
          .withColumn("island",
            count(when(col("prev").isNull ||
              col("prev") =!= col("o_orderstatus"), lit(1)))
              .over(byCust.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)))
          .groupBy(col("custkey"), col("island").as("version"))
          .agg(min(col("o_orderstatus")).as("status"),
            min(col("o_orderdate")).as("valid_from"))
        val f = t.lineitem.filter(col("l_orderkey") < 2000L)
          .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("o_custkey").as("fcust"), col("l_shipdate").as("ts"))
          .distinct() // (orderkey, linenumber) not unique in the testdata
        val wAsof = Window
          .partitionBy(col("l_orderkey"), col("l_linenumber"), col("ts"))
          .orderBy(col("valid_from").desc, col("version").desc)
        ordered(
          f.join(islands,
              col("custkey") === col("fcust") && col("valid_from") <= col("ts"))
            .withColumn("rn", row_number().over(wAsof))
            .filter(col("rn") === 1)
            .select(col("l_orderkey"), col("l_linenumber"),
              col("custkey"), tstr(col("ts")).as("ship_ts"),
              col("status").as("status_at_ship"),
              tstr(col("valid_from")).as("status_since")))
      }
    ),
    Q(
      "d8_scd2_history",
      // Slowly-Changing-Dimension Type-2 build — the warehouse twin of the
      // doc store's version chain: collapse each customer's order-status
      // timeline into validity intervals [valid_from, valid_to) with an
      // is_current flag. Gaps-and-islands: lag detects a status change,
      // a running count of changes numbers the island, islands group to
      // intervals, lead supplies the closing bound. All three windows and
      // the final aggregate share ONE o_custkey hash partitioning — a
      // single shuffle whose partitions are customer-history-sized, so the
      // build scales with the dimension churn, not the fact. This is the
      // MERGE-free SCD2 derivation: append-only order log in, versioned
      // dimension out, recomputable incrementally per d8_incremental_agg.
      Some("""WITH h AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
             |                                  ORDER BY o_orderdate, o_orderkey)
             |           AS prev
             |  FROM orders
             |),
             |seg AS (
             |  SELECT *,
             |         count(*) FILTER (WHERE prev IS NULL OR prev <> o_orderstatus)
             |           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                 ROWS UNBOUNDED PRECEDING) AS island
             |  FROM h
             |),
             |islands AS (
             |  SELECT o_custkey AS custkey, island AS version,
             |         min(o_orderstatus) AS status,
             |         min(o_orderdate) AS valid_from,
             |         count(*) AS n_orders
             |  FROM seg GROUP BY 1, 2
             |)
             |SELECT custkey, version, status,
             |       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
             |       strftime(lead(valid_from) OVER (PARTITION BY custkey
             |                                       ORDER BY version),
             |                '%Y-%m-%d %H:%M:%S') AS valid_to,
             |       CASE WHEN lead(valid_from) OVER (PARTITION BY custkey
             |                                        ORDER BY version) IS NULL
             |            THEN 1 ELSE 0 END AS is_current,
             |       n_orders
             |FROM islands
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val byCust = Window.partitionBy(col("custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val h = t.orders
          .select(col("o_custkey").as("custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_orderstatus"))
          .withColumn("prev", lag(col("o_orderstatus"), 1).over(byCust))
        val seg = h.withColumn("island",
          count(when(col("prev").isNull ||
            col("prev") =!= col("o_orderstatus"), lit(1)))
            .over(byCust.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
        val islands = seg.groupBy(col("custkey"), col("island").as("version"))
          .agg(min(col("o_orderstatus")).as("status"),
            min(col("o_orderdate")).as("valid_from"),
            count(lit(1)).as("n_orders"))
        val byVersion = Window.partitionBy(col("custkey"))
          .orderBy(col("version"))
        ordered(
          islands
            .withColumn("next_from", lead(col("valid_from"), 1).over(byVersion))
            .select(col("custkey"), col("version"), col("status"),
              tstr(col("valid_from")).as("valid_from"),
              tstr(col("next_from")).as("valid_to"),
              when(col("next_from").isNull, lit(1)).otherwise(lit(0))
                .as("is_current"),
              col("n_orders"))
        )
      }
    )
  )
}
