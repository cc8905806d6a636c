package graft.queries

import org.apache.spark.sql.functions._
import graft.Canon._
import graft.sources.Tables
import graft.Materialize.{CutSyntax, Shared}

/** Corpus sampling / domain mixing — the curation step every
  * training-data pipeline runs between filtering and tokenization:
  * down-sample over-represented sources to a target mixture, stratified
  * by a deterministic per-row bucket.
  *
  * Scale design: sampling is a pure per-row predicate on a hash bucket —
  * no shuffle, no RNG state, reproducible across engines and re-runs
  * (Spark's sample()/sampleBy() RNG is engine-private, so a pipeline
  * that must be auditable uses hash buckets instead). The mix plan is a
  * tiny per-source aggregate broadcast back onto the corpus.
  */
object SampleOps {

  /** Deterministic bucket in [0, 100): first 60 bits of md5(doc_id) mod
    * 100 — the engine-portable uniform hash (oracle-parity-proven
    * pattern: conv/substring in Spark == ('0x' || ...)::BIGINT in
    * DuckDB). */
  private def bucket100(id: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"), lit(100L))

  private val bucketSql =
    "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100)"

  val all: Seq[Q] = Seq(
    Q(
      "d11_stratified_sample",
      // per-source sampling rates (over-represented sources down-sampled
      // hard, high-quality ones kept): keep a row iff its bucket < the source's rate.
      // The achieved per-source counts land within the bucket
      // granularity of the targets — asserted by the oracle itself.
      Some(s"""WITH rates AS (
              |  SELECT * FROM (VALUES
              |    ('src0', 20), ('src1', 80), ('src2', 100),
              |    ('src3', 50), ('src4', 40), ('src5', 10),
              |    ('src6', 65), ('src7', 95)
              |  ) AS v(source, pct)
              |),
              |kept AS (
              |  SELECT d.doc_id, d.source
              |  FROM documents d JOIN rates r USING (source)
              |  WHERE $bucketSql < r.pct
              |)
              |SELECT source, count(*) AS n_kept,
              |       CAST(min(doc_id) AS BIGINT) AS first_id,
              |       CAST(max(doc_id) AS BIGINT) AS last_id
              |FROM kept GROUP BY source
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val rates = Seq(("src0", 20), ("src1", 80), ("src2", 100),
          ("src3", 50), ("src4", 40), ("src5", 10),
          ("src6", 65), ("src7", 95))
        import spark.implicits._
        val rdf = rates.toDF("source", "pct")
        ordered(
          t.documents
            .join(broadcast(rdf), "source")
            .filter(bucket100(col("doc_id")) < col("pct"))
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_kept"),
              min(col("doc_id")).cast("long").as("first_id"),
              max(col("doc_id")).cast("long").as("last_id"))
        )
      }
    ),
    Q(
      "d11_domain_mix",
      // up-sampling side of domain mixing: repeat each kept doc
      // `epochs(source)` times (src2 seen 3x per epoch, src0 once),
      // emitting (doc_id, copy) training rows. The explode is the only
      // row-multiplier; at scale this is the last step before sharding
      // to the tokenizer.
      Some("""WITH epochs AS (
             |  SELECT * FROM (VALUES
             |    ('src0', 1), ('src1', 2), ('src2', 3), ('src3', 2), ('src4', 1)
             |  ) AS v(source, n)
             |),
             |expanded AS (
             |  SELECT d.doc_id, d.source, unnest(range(e.n)) AS copy
             |  FROM documents d JOIN epochs e USING (source)
             |  WHERE d.doc_id < 200
             |)
             |SELECT source, count(*) AS n_rows,
             |       count(DISTINCT doc_id) AS n_docs,
             |       CAST(max(copy) AS BIGINT) AS max_copy
             |FROM expanded GROUP BY source
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        import spark.implicits._
        val epochs = Seq(("src0", 1), ("src1", 2), ("src2", 3),
          ("src3", 2), ("src4", 1)).toDF("source", "n")
        ordered(
          t.documents
            .filter(col("doc_id") < 200)
            .join(broadcast(epochs), "source")
            .select(col("doc_id"), col("source"),
              explode(sequence(lit(0L), col("n").cast("long") - 1L)).as("copy"))
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_rows"),
              countDistinct(col("doc_id")).as("n_docs"),
              max(col("copy")).as("max_copy"))
        )
      }
    ),
    Q(
      "d11_train_val_test",
      // deterministic 3-way split (80/10/10) from the same auditable hash
      // bucket: a doc's split NEVER changes as the corpus grows (no RNG,
      // no global sort), and the three sets are disjoint by construction.
      // Output proves proportions AND per-split id checksums.
      Some(s"""WITH tagged AS (
              |  SELECT doc_id, source,
              |         CASE WHEN $bucketSql < 80 THEN 'train'
              |              WHEN $bucketSql < 90 THEN 'val'
              |              ELSE 'test' END AS split
              |  FROM documents
              |)
              |SELECT split, count(*) AS n,
              |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
              |       count(DISTINCT source) AS n_sources
              |FROM tagged GROUP BY split
              |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val b = bucket100(col("doc_id"))
        ordered(
          t.documents
            .select(col("doc_id"), col("source"),
              when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
            .groupBy(col("split"))
            .agg(count(lit(1)).as("n"),
              sum(col("doc_id")).as("id_sum"),
              countDistinct(col("source")).as("n_sources"))
        )
      }
    ),
    Q(
      "d10_pack_shards",
      // greedy sequence packing: documents stream into fixed-budget
      // training shards (4096 tokens) in deterministic doc_id order per
      // source — shard id = floor(running-token-cumsum / budget), one
      // window cumsum, no driver loop. The per-shard stats prove both
      // engines assigned identical shard boundaries.
      Some("""WITH sized AS (
             |  SELECT doc_id, source,
             |         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |             x -> x <> '')) AS n_tok
             |  FROM documents
             |),
             |packed AS (
             |  SELECT doc_id, source, n_tok,
             |         CAST((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             |                                ROWS UNBOUNDED PRECEDING) - n_tok)
             |              // 4096 AS BIGINT) AS shard
             |  FROM sized
             |)
             |SELECT source, shard, count(*) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
             |       CAST(min(doc_id) AS BIGINT) AS first_doc,
             |       CAST(max(doc_id) AS BIGINT) AS last_doc
             |FROM packed GROUP BY source, shard
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val sized = t.documents
          .select(col("doc_id"), col("source"),
            graft.functions.Text.tokenCount(col("text")).cast("long").as("n_tok"))
        // per-source running cumsum via the GROUPED range-bucketed
        // prefix sum (round 14): a window PARTITIONed only by `source`
        // (a 20-value literal domain) would push corpus/20 rows through
        // one sort task at 100 TB — the a9_trimmed_mean shape. doc_id
        // is unique per source, so the distinct-orderCol contract holds;
        // the driver carries |sources|×B offsets and every sort task
        // sees a (source, doc_id-range) slice.
        // shard = floor(tokens-before-this-doc / budget): a doc starts
        // in the shard its predecessor left open (greedy packing)
        ordered(
          graft.functions.PrefixSum
            .cumOverDistinctBy(sized, Seq("source"), "doc_id", "n_tok", "cum")
            .withColumn("shard",
              floor((col("cum") - col("n_tok")) / lit(4096L)))
            .groupBy(col("source"), col("shard"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_tok")).as("shard_tokens"),
              min(col("doc_id")).as("first_doc"),
              max(col("doc_id")).as("last_doc"))
        )
      }
    ),
    Q(
      "d11_temperature_mix",
      // temperature-flattened mixture (the multilingual-pretraining
      // p_s ∝ n_s^α sampling, α = 1/2): over-represented sources are
      // down-weighted toward sqrt(n), so rare domains keep presence in a
      // fixed 200-doc budget. Quotas use ONLY engine-exact math — IEEE
      // sqrt floored to bigint, then integer div — so both engines pick
      // identical per-source cutoffs; membership is the deterministic
      // md5 rank within each source (auditable, no RNG state).
      // Scale shape: counts+quotas are a tiny broadcast; ranking is a
      // per-source window (partitioned sort, no global order).
      Some("""WITH counts AS (
             |  SELECT source, count(*) AS n FROM documents GROUP BY source
             |),
             |w AS (
             |  SELECT source, CAST(floor(sqrt(n)) AS BIGINT) AS wt FROM counts
             |),
             |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
             |quota AS (
             |  SELECT source, CAST((200 * wt) // tw AS BIGINT) AS m
             |  FROM w CROSS JOIN tot
             |),
             |ranked AS (
             |  SELECT doc_id, source,
             |         row_number() OVER (
             |           PARTITION BY source
             |           ORDER BY md5('tmix:' || CAST(doc_id AS VARCHAR)), doc_id
             |         ) AS rk
             |  FROM documents
             |)
             |SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk
             |FROM ranked r JOIN quota q ON r.source = q.source
             |WHERE r.rk <= q.m
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val counts = t.documents.groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
        val wts = counts.select(col("source"),
          floor(sqrt(col("n"))).cast("long").as("wt"))
        val tot = wts.agg(sum(col("wt")).as("tw"))
        // `div` = exact integral division (DuckDB `//`): no float quotient
        // near a quota boundary can diverge between engines
        val quota = wts.crossJoin(broadcast(tot))
          .select(col("source"), expr("(200 * wt) div tw").as("m"))
        val rk = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(md5(concat(lit("tmix:"), col("doc_id").cast("string"))).asc,
            col("doc_id").asc)
        ordered(
          t.documents
            .select(col("doc_id"), col("source"))
            .withColumn("rk0", row_number().over(rk))
            // the 200-doc TOTAL budget is a LITERAL cap on every
            // per-source quota (m = 200·wt div tw ≤ 200), so filtering
            // on it first turns the per-source ranking into a
            // WindowGroupLimit plan (round 14): each map task pre-prunes
            // to its local top-200 per source BEFORE the shuffle, so the
            // sort task sees ≤ 200·|map tasks| rows, not corpus/20
            .filter(col("rk0") <= 200)
            .join(broadcast(quota), Seq("source"))
            .filter(col("rk0") <= col("m"))
            .select(col("doc_id"), col("source"),
              col("rk0").cast("long").as("rk"))
        )
      }
    ),
    Q(
      "d11_mixture_planner",
      // MIXTURE / EPOCH PLANNER — the budgeting pass a training run does
      // BEFORE touching data (the DoReMi-style reweighting's bookkeeping
      // half): given per-source token inventories and target mixture
      // weights, how many tokens does each source owe (quota), how many
      // epochs of its inventory is that (x100, integer), does it exceed
      // the 4-epoch repetition cap (the data-constrained-LM rule of
      // thumb), and how many tokens are actually achievable under the
      // cap. Target weights derive deterministically from the source id
      // (idx % 5 + 1) so the plan is reproducible; every quantity is
      // integer arithmetic (quota = T*w div W, epochs_x100 = quota*100
      // div n) — no float planning boundary. 100 TB shape: one token
      // aggregate per source (map-side partials), then everything rides
      // the source-TYPE relation with the 1-row grand totals broadcast;
      // output is source-count rows.
      Some("""WITH toks AS (
             |  SELECT source,
             |         CAST(sum(len(list_filter(
             |           string_split_regex(lower(trim(text)), '\s+'),
             |           x -> x <> ''))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1
             |),
             |w AS (
             |  SELECT source, n_tokens,
             |         CAST(CAST(substring(source, 4) AS BIGINT) % 5 + 1
             |              AS BIGINT) AS wt
             |  FROM toks
             |),
             |tot AS (
             |  SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
             |         CAST(sum(wt) AS BIGINT) AS tw
             |  FROM w
             |)
             |SELECT w.source, w.n_tokens, w.wt,
             |       (tot.t * w.wt) // tot.tw AS quota_tokens,
             |       ((tot.t * w.wt) // tot.tw) * 100 // w.n_tokens AS epochs_x100,
             |       CASE WHEN ((tot.t * w.wt) // tot.tw) * 100 // w.n_tokens > 400
             |            THEN 1 ELSE 0 END AS capped,
             |       least((tot.t * w.wt) // tot.tw, 4 * w.n_tokens)
             |         AS achievable_tokens
             |FROM w CROSS JOIN tot
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val toks = t.documents
          .groupBy(col("source"))
          .agg(sum(size(graft.functions.Text.tokenize(col("text"))))
            .cast("long").as("n_tokens"))
        val w = toks.select(col("source"), col("n_tokens"),
          (expr("cast(substring(source, 4) as bigint)") % 5 + 1).as("wt"))
        val tot = w.agg(sum(col("n_tokens")).as("t"), sum(col("wt")).as("tw"))
        val quota = expr("(t * wt) div tw")
        val epochs = expr("((t * wt) div tw) * 100 div n_tokens")
        ordered(
          w.crossJoin(broadcast(tot)) // 1-row grand totals
            .select(col("source"), col("n_tokens"), col("wt"),
              quota.as("quota_tokens"),
              epochs.as("epochs_x100"),
              when(epochs > 400, 1).otherwise(0).as("capped"),
              least(quota, col("n_tokens") * 4).as("achievable_tokens")))
      }
    ),
    Q(
      "d11_weighted_sample",
      // WEIGHTED sampling without replacement (Efraimidis–Spirakis A-ES):
      // doc i gets priority -ln(u_i)/w_i — an Exp(w_i) draw — and the k
      // smallest priorities are the sample, giving P ∝ weight exactly.
      // Deterministic and engine-portable: u_i comes from 48 bits of
      // md5("ws:" || doc_id) ((h+1)/(2^48+1) — all doubles exact), ln is
      // rounded to 12 before the one IEEE division by the weight
      // (n_chars — longer docs sampled more often, the quality-weighted
      // corpus-sampling primitive). No RNG state, fully auditable, and
      // the k-smallest select plans as TakeOrderedAndProject — the
      // distributed top-k, never a global sort, at any corpus scale.
      Some("""WITH pr AS (
             |  SELECT doc_id, n_chars,
             |         round(-ln((CAST(('0x' || substring(md5('ws:' || doc_id), 1, 12))
             |                         AS BIGINT) + 1) / 281474976710657.0), 12)
             |           / n_chars AS priority
             |  FROM documents
             |),
             |topk AS (
             |  SELECT doc_id, n_chars, priority
             |  FROM pr QUALIFY row_number() OVER (ORDER BY priority, doc_id) <= 50
             |)
             |SELECT doc_id, n_chars, priority FROM topk
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val u = (conv(substring(md5(concat(lit("ws:"), col("doc_id"))), 1, 12),
          16, 10).cast("long") + 1) / lit(281474976710657.0) // (0, 1], 2^48+1
        ordered(
          t.documents
            .select(col("doc_id"), col("n_chars"),
              (round(-log(u), 12) / col("n_chars")).as("priority"))
            .orderBy(col("priority"), col("doc_id"))
            .limit(50)
        )
      }
    ),
    Q(
      "d11_dsir_select",
      // DSIR (Data Selection via Importance Resampling, Xie et al. 2023):
      // score every raw document by how target-like its hashed-n-gram
      // feature profile is. Features are bigrams hashed into 256 buckets
      // (portable md5, so both engines reproduce the bucketing
      // bit-for-bit); the target slice is lang='en'. Per-bucket
      // importance log-ratio lr(b) = ln((c_t+1)(N_r+256) / ((c_r+1)(N_t+256)))
      // — add-one-smoothed target vs raw bucket distributions, the ln
      // argument a ratio of exact BIGINT products (< 2^53, doubles
      // exact) — is rounded to DECIMAL(20,12) BEFORE the per-doc
      // weighted sum, so the doc weight is an exact decimal sum:
      // order-independent and hash-checkable (the d7_source_kl
      // discipline). selected = weight > 0 compares the EXACT decimal,
      // not the rounded double. 100 TB shape: one corpus scan to the
      // (doc, bucket) aggregate; everything downstream is bounded by
      // docs x 256 buckets; the lr table (256 rows) and the one
      // corpus-totals row are broadcast — no shuffle carries anything
      // wider than (doc_id, bucket, count).
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |                     x -> x <> '') AS tokens
             |  FROM documents
             |),
             |big AS (
             |  SELECT doc_id, lang, tokens[i] || ' ' || tokens[i+1] AS bg
             |  FROM toks CROSS JOIN UNNEST(range(1, len(tokens))) AS t(i)
             |),
             |db AS (
             |  SELECT doc_id, lang,
             |         (('0x' || substring(md5(bg), 1, 15))::BIGINT % 256) AS b,
             |         count(*) AS n_db
             |  FROM big GROUP BY 1, 2, 3
             |),
             |raw AS (SELECT b, sum(n_db) AS c_r FROM db GROUP BY b),
             |tgt AS (SELECT b, sum(n_db) AS c_t FROM db WHERE lang = 'en' GROUP BY b),
             |tot AS (
             |  SELECT sum(n_db) AS n_r,
             |         sum(CASE WHEN lang = 'en' THEN n_db ELSE 0 END) AS n_t
             |  FROM db
             |),
             |lrt AS (
             |  SELECT raw.b,
             |         CAST(round(ln(CAST((COALESCE(c_t, 0) + 1) * (n_r + 256) AS DOUBLE)
             |                       / CAST((c_r + 1) * (n_t + 256) AS DOUBLE)), 12)
             |              AS DECIMAL(20,12)) AS lr
             |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
             |),
             |w AS (
             |  SELECT doc_id, lang, CAST(sum(n_db) AS BIGINT) AS n_feats,
             |         sum(lr * n_db) AS wsum
             |  FROM db JOIN lrt USING (b)
             |  GROUP BY doc_id, lang
             |)
             |SELECT doc_id, lang, n_feats,
             |       round(CAST(wsum AS DOUBLE), 4) AS weight,
             |       CAST(wsum > 0 AS INTEGER) AS selected
             |FROM w
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val toks = t.documents.select(col("doc_id"), col("lang"),
          graft.functions.Text.tokenize(col("text")).as("tokens"))
        val big = toks.select(col("doc_id"), col("lang"),
          explode(expr("""transform(sequence(1, size(tokens) - 1),
            i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1)))"""))
            .as("bg"))
        // ONE corpus scan down to the (doc, bucket) aggregate; the raw and
        // target marginals, the totals row and the per-doc weights all roll
        // up from this relation (localCheckpoint — the three consumers
        // prune different columns, so plain exchange reuse can't fire)
        val db = big
          .select(col("doc_id"), col("lang"),
            pmod(conv(substring(md5(col("bg")), 1, 15), 16, 10).cast("long"),
              lit(256L)).as("b"))
          .groupBy(col("doc_id"), col("lang"), col("b"))
          .agg(count(lit(1)).as("n_db"))
          .cut(Shared)
        val raw = db.groupBy(col("b")).agg(sum(col("n_db")).as("c_r"))
        val tgt = db.filter(col("lang") === "en")
          .groupBy(col("b")).agg(sum(col("n_db")).as("c_t"))
        val tot = db.agg(sum(col("n_db")).as("n_r"),
          sum(when(col("lang") === "en", col("n_db")).otherwise(0L)).as("n_t"))
        val lr = round(
          log(((coalesce(col("c_t"), lit(0L)) + 1L) * (col("n_r") + 256L)).cast("double") /
            ((col("c_r") + 1L) * (col("n_t") + 256L)).cast("double")), 12)
          .cast("decimal(20,12)")
        val lrt = raw.join(tgt, Seq("b"), "left")
          .crossJoin(broadcast(tot)) // 1-row corpus-totals scalar
          .select(col("b"), lr.as("lr"))
        ordered(
          db.join(broadcast(lrt), Seq("b")) // 256-row importance table
            .groupBy(col("doc_id"), col("lang"))
            .agg(sum(col("n_db")).as("n_feats"),
              sum(col("lr") * col("n_db")).as("wsum"))
            .select(col("doc_id"), col("lang"), col("n_feats"),
              round(col("wsum").cast("double"), 4).as("weight"),
              (col("wsum") > 0).cast("int").as("selected"))
        )
      }
    ),
    Q(
      "d11_epoch_shuffle",
      // Deterministic EPOCH SHUFFLE — the "global shuffle before
      // training" step: every doc gets a seeded hash key, the key's low
      // bits pick one of 16 output shards, and the within-shard position
      // is the rank by (key, doc_id). Seed in, permutation out — the
      // same epoch is byte-reproducible on any cluster size, no RNG
      // state, no global sort. 100 TB shape: shard assignment is one
      // md5 per row; the window is EXACTLY the physical plan you want —
      // hash-repartition by shard + sort within partitions — so the
      // only exchange is the one the training job needs anyway (each
      // shard = one output file sequence). Changing the seed string
      // re-deals the whole permutation.
      Some("""WITH keyed AS (
             |  SELECT doc_id,
             |         ('0x' || substring(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
             |  FROM documents
             |)
             |SELECT doc_id, CAST(k % 16 AS INT) AS shard,
             |       CAST(row_number() OVER (PARTITION BY k % 16
             |                               ORDER BY k, doc_id) AS BIGINT) AS pos
             |FROM keyed
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val keyed = t.documents.select(col("doc_id"),
          conv(substring(md5(concat(lit("epoch7:"), col("doc_id").cast("string"))),
            1, 15), 16, 10).cast("long").as("k"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("k"), lit(16L)))
          .orderBy(col("k"), col("doc_id"))
        ordered(
          keyed.select(col("doc_id"),
            pmod(col("k"), lit(16L)).cast("int").as("shard"),
            row_number().over(w).cast("long").as("pos")))
      }
    ),
    Q(
      "d11_curriculum",
      // Curriculum-phase construction — order the corpus easy→hard (length
      // as the difficulty proxy; swap in d7_readability at will) and cut
      // it into four quartile phases, reporting each phase's doc count,
      // difficulty range, token budget, and share of the corpus tokens —
      // the schedule a curriculum-learning run consumes phase by phase.
      // ntile over (difficulty, doc_id) is a deterministic total order;
      // token sums are exact BIGINTs and the share divides them once.
      // 100 TB shape: one scan derives (doc, difficulty, n_tokens); the
      // quartile edges are NOT a global window — they are the three
      // exact order-statistic keys at the ntile(4) cut ranks, found by
      // the GK-sketch→exact-refine discipline (graft.functions
      // .ExactNtile, the same machinery t23 rides): bounded passes,
      // band partitions ≤ ~2·eps·n rows in any tie regime, bucket
      // assignment a pure per-row scalar against 3 driver-held keys —
      // bit-identical to ntile, zero corpus-wide single-partition
      // sorts. Everything after rides the 4-row phase relation.
      Some("""WITH toks AS (
             |  SELECT doc_id, n_chars,
             |         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |             x -> x <> '')) AS n_tokens
             |  FROM documents
             |),
             |phased AS (
             |  SELECT *, ntile(4) OVER (ORDER BY n_chars, doc_id) AS phase
             |  FROM toks
             |),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM toks)
             |SELECT phase, count(*) AS n_docs,
             |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             |       CAST(sum(n_tokens) AS BIGINT) AS phase_tokens,
             |       round(CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE)
             |             / min(tot.t), 4) AS token_share
             |FROM phased CROSS JOIN tot
             |GROUP BY phase
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        // corpus-derived relation consumed by five passes (count,
        // sketch, tie counts, band refine, final agg) → one cut
        val toks = t.documents
          .select(col("doc_id"), col("n_chars"),
            size(graft.functions.Text.tokenize(col("text"))).cast("long")
              .as("n_tokens"))
          .withColumn("sc", col("n_chars").cast("double"))
          .cut(Shared)
        val n = toks.count()
        // exact ntile(4) boundary keys without a global window: GK
        // bracket → exact tie-aware counts → bounded band refine
        // (graft.functions.ExactNtile; bit-identical to ntile, bounds
        // spec'd by ExactNtileSpec, loud require() on sketch breach)
        val cuts = graft.functions.ExactNtile.ntileCuts(n, 4)
        val bandSpecs = graft.functions.ExactNtile.bands(
          toks, Seq("sc"), "doc_id", cuts, n)
        val keys = graft.functions.ExactNtile.boundaries(
          toks, bandSpecs, "doc_id")("sc")
        val phased = toks.withColumn("phase",
          graft.functions.ExactNtile.bucket("sc", "doc_id", keys).cast("int"))
        val tot = toks.agg(sum(col("n_tokens")).as("t"))
        ordered(
          phased.crossJoin(broadcast(tot)) // 1-row corpus-token scalar
            .groupBy(col("phase"))
            .agg(count(lit(1)).as("n_docs"),
              min(col("n_chars")).as("min_chars"),
              max(col("n_chars")).as("max_chars"),
              sum(col("n_tokens")).as("phase_tokens"),
              round(sum(col("n_tokens")).cast("double") / min(col("t")), 4)
                .as("token_share"))
        )
      }
    )
  )
}
