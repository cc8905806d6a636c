package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink surface — SURVEY.md §2.1: CSV/JSON with explicit schemas
  * (S4), binary-file source (S5), parquet append/overwrite sinks (S6/S7),
  * truncate (S9). Each test is a write -> read-back round trip.
  */
class SourcesSpec extends AnyFunSuite {
  import SharedSpark._

  private def tmp(): String = Files.createTempDirectory("graft_src").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("S4: CSV round trip with explicit schema (header, no inference)") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq((1L, "a", 1.5), (2L, "b,with,commas", 2.5), (3L, null, 3.5))
      .toDF("id", "name", "score")
    df.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.schema == schema)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("S4: JSON round trip with explicit schema") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq((1L, "x", 0.1), (2L, "y", 0.2)).toDF("id", "name", "score")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("S3: parquet schema evolution — mergeSchema unions old and new columns") {
    import spark.implicits._
    // the 100 TB reality: years of appends where later writers added
    // columns. Old files must read as null for new columns, not fail.
    val dir = tmp() + "/t"
    Seq((1L, "a")).toDF("k", "v").write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("k", "v", "score").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("k", "score", "v"))
    val rows = merged.select("k", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).contains(9.5))
  }

  test("S4: ORC round trip with predicate pushdown") {
    import spark.implicits._
    val dir = tmp() + "/t"
    (1L to 100L).map(i => (i, s"row$i", i * 0.5)).toDF("id", "name", "score")
      .write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter($"id" === 42L)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,42)"),
      s"ORC filter not pushed:\n$plan")
    assert(back.select("name").as[String].head() == "row42")
  }

  test("U1: unionByName with allowMissingColumns handles schema drift") {
    import spark.implicits._
    // two generations of the same feed, later one added a column; union
    // must align by NAME (not position) and null-fill the missing column
    val v1 = Seq((1L, "a")).toDF("k", "v")
    val v2 = Seq(("b", 2L, 0.5)).toDF("v", "k", "score") // reordered + extra
    val u = v1.unionByName(v2, allowMissingColumns = true)
    assert(u.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    val rows = u.orderBy("k").as[(Long, String, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(0.5))))
  }

  test("S5: binaryFile source reads content + length + path metadata") {
    val dir = tmp()
    val payload = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    Files.write(java.nio.file.Paths.get(dir, "blob.bin"), payload)
    val df = spark.read.format("binaryFile").load(dir)
    val row = df.select("length", "content").head()
    assert(row.getLong(0) == payload.length)
    assert(row.getAs[Array[Byte]](1).sameElements(payload))
  }

  test("S6: parquet append sink accumulates batches") {
    import spark.implicits._
    val dir = tmp() + "/t"
    Seq((1L, "v1")).toDF("k", "v").write.mode("append").parquet(dir)
    Seq((2L, "v2")).toDF("k", "v").write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("S7: dynamic partition overwrite replaces only touched partitions") {
    import spark.implicits._
    val dir = tmp() + "/t"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "a"), (2L, "b")).toDF("k", "part").write
        .partitionBy("part").mode("overwrite").parquet(dir)
      // overwrite only part=a; part=b must survive
      Seq((9L, "a")).toDF("k", "part").write
        .partitionBy("part").mode("overwrite").parquet(dir)
      val got = spark.read.parquet(dir).select("k", "part")
        .as[(Long, String)].collect().toSet
      assert(got == Set((9L, "a"), (2L, "b")))
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("S9: truncate = overwrite with empty frame of same schema") {
    import spark.implicits._
    val dir = tmp() + "/t"
    Seq((1L, "x")).toDF("k", "v").write.parquet(dir)
    spark.read.parquet(dir).limit(0).write.mode("overwrite").parquet(dir + "2")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      spark.read.parquet(dir).schema).write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).isEmpty)
    assert(spark.read.parquet(dir).schema.fieldNames.sameElements(Array("k", "v")))
  }

  test("S3 schema evolution: mergeSchema unions columns across parquet generations") {
    // the 100 TB reality: a long-lived dataset's early files lack columns
    // added later; the reader must union schemas and null-fill, with
    // column pruning still reaching the scan
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "gamma", "en"), (4L, "delta", "fr")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/gen=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet == Set("doc_id", "text", "lang", "gen"))
    assert(df.count() == 4)
    // old-generation rows surface the new column as null, new rows keep it
    assert(df.filter(col("gen") === 1 && col("lang").isNull).count() == 2)
    assert(df.filter(col("gen") === 2).select("lang").as[String].collect().sorted
      .sameElements(Array("en", "fr")))
    // pruning: a doc_id-only projection reads just that column
    val scan = df.select("doc_id").queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint>"), scan)
  }

  test("A10: centroid aggregator merges partials correctly across partitions") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)), (1, Array(10.0f, 20.0f))
    ).toDF("label", "embedding").repartition(3)
    val centroid = udaf(graft.functions.Centroid)
    val got = df.groupBy("label").agg(centroid(col("embedding")).as("c"))
      .as[(Int, Array[Double])].collect().toMap
    assert(got(0).sameElements(Array(2.0, 4.0)))
    assert(got(1).sameElements(Array(10.0, 20.0)))
  }

  test("S3: hive-partitioned layout prunes partitions at the scan") {
    import spark.implicits._
    // the 100 TB data-skipping lever: a day-partitioned table read with a
    // day filter must touch ONLY the matching partition directories —
    // visible as PartitionFilters on the scan and a pruned partition count
    val dir = tmp()
    (0 until 1000).map(i => (i.toLong, i % 10, s"v$i"))
      .toDF("id", "day", "v")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("day") === 3)
    assert(read.count() == 100)
    val scan = read.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.nonEmpty,
      "day predicate must reach the scan as a partition filter")
    // selectedPartitions is lazy-evaluated metadata: 1 of 10 directories
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
  }
}
