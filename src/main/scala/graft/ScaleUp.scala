package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic scale-up of a testdata directory — the 10×
  * growth step SCALING.md uses to validate the shuffle-bound claims with
  * a REAL measurement instead of plan-shape extrapolation.
  *
  * `ScaleUp src out [factor]` writes `factor` remapped copies of every
  * scaling table (copy 0 is the original bytes):
  *
  *  - fact/dim keys shift by a per-copy offset chosen far above the
  *    source key ranges, so each copy is a self-consistent star and the
  *    join fan-outs match a genuinely larger corpus;
  *  - `events` user/event ids shift per copy (10× users at the same time
  *    range — per-user analytics see 10× keys, per-day windows see 10×
  *    volume);
  *  - `documents` texts are token-salted per copy (every token gets the
  *    copy digit appended, copy 0 untouched): each copy reproduces the
  *    source's exact df/shingle statistics on a DISJOINT vocabulary, so
  *    posting/dedup work grows linearly with volume instead of
  *    quadratically through cross-copy duplicate pairs that a plain
  *    replication would plant — replicating text verbatim would make
  *    every doc a 10-way near-dup family and measure the (already
  *    fenced) quadratic, not growth;
  *  - `embeddings` replicate with shifted vec_ids (identical vectors:
  *    the cluster-quadratic queries are excluded from the growth sweep
  *    because their cost law is cluster-size-squared by design — at real
  *    scale k grows with the corpus, but the fixture codebook is frozen);
  *  - `region`/`nation` stay as-is (dimension tables do not scale).
  *
  * Everything is deterministic — no RNG — so two runs produce
  * byte-identical datasets and growth numbers are reproducible.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Graft.session(appName = "graft-scaleup")
    val t = graft.sources.Tables(spark, src)

    def copies(df: DataFrame)(remap: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(c => remap(df, c)).reduce(_.unionByName(_))
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] wrote $name")
    }

    // key offsets an order of magnitude above the sf0.1 ranges
    val KO = 100000000L // orderkey
    val KP = 10000000L  // partkey
    val KS = 1000000L   // suppkey
    val KC = 10000000L  // custkey
    val KE = 1000000000L // event_id
    val KU = 10000000L  // user_id
    val KD = 1000000L   // doc_id
    val KV = 1000000L   // vec_id

    write(t.region, "region")
    write(t.nation, "nation")
    write(copies(t.customer) { (d, c) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(c * KC))
    }, "customer")
    write(copies(t.supplier) { (d, c) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(c * KS))
    }, "supplier")
    write(copies(t.part) { (d, c) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(c * KP))
    }, "part")
    write(copies(t.orders) { (d, c) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(c * KO))
        .withColumn("o_custkey", col("o_custkey") + lit(c * KC))
    }, "orders")
    write(copies(t.lineitem) { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c * KO))
        .withColumn("l_partkey", col("l_partkey") + lit(c * KP))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * KS))
    }, "lineitem")
    write(copies(t.events) { (d, c) =>
      d.withColumn("event_id", col("event_id") + lit(c * KE))
        .withColumn("user_id", col("user_id") + lit(c * KU))
    }, "events")
    write(copies(t.documents) { (d, c) =>
      val salted =
        if (c == 0) d
        else d.withColumn("text",
          concat_ws(" ", transform(
            filter(split(col("text"), "\\s+"), x => x =!= ""),
            x => concat(x, lit(c.toString)))))
      salted.withColumn("doc_id", col("doc_id") + lit(c * KD))
        .withColumn("n_chars", length(col("text")))
    }, "documents")
    write(copies(t.embeddings) { (d, c) =>
      d.withColumn("vec_id", col("vec_id") + lit(c * KV))
    }, "embeddings")

    spark.stop()
  }
}
