package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.dms.DocStore

/** End-to-end facade test: the reference's DMS surface (upload/download/
  * update/delete/versions/metadata/search) over the snapshot-generation
  * store, including the reference bugs we fixed (numeric version order,
  * update content, exact-filename delete).
  */
class DocStoreSpec extends AnyFunSuite {
  import SharedSpark._

  private def newStore() =
    new DocStore(spark, Files.createTempDirectory("graft_dms").toString)

  test("upload assigns 1..n and survives past v10 (numeric, not string, order)") {
    val s = newStore()
    // the reference string-sorted versions, so v10 < v2; prove 11 > 10 > 2
    val versions = (1 to 11).map(i => s.upload("a.txt", s"alpha beta v$i".getBytes))
    assert(versions == (1 to 11))
    assert(s.latestVersion("a.txt").contains(11))
    assert(s.versions("a.txt") == (1 to 11))
  }

  test("vacuum deletes superseded generations, keeps live + window") {
    val s = newStore()
    (1 to 3).foreach(i => s.upload("a.txt", s"content v$i".getBytes))
    // updates rewrite into fresh generations (copy-on-write), leaving
    // superseded generation dirs behind — what vacuum reclaims
    (1 to 3).foreach(i => s.update("a.txt", s"updated $i".getBytes))
    val before = s.all.count()
    val deleted = s.vacuum(keep = 1)
    assert(deleted.nonEmpty)
    // live data unaffected, all versions still readable
    assert(s.all.count() == before)
    assert(s.versions("a.txt") == (1 to 3))
    assert(new String(s.download("a.txt").get) == "updated 3")
    // idempotent: second vacuum deletes nothing more
    assert(s.vacuum(keep = 1).isEmpty)
  }

  test("compact collapses per-ingest batch partitions; content byte-identical") {
    val s = newStore()
    // every upload is its own batch partition (the idempotent-replay
    // layout), so 12 uploads leave >= 12 data files behind
    (1 to 6).foreach(i => s.upload("a.txt", s"alpha $i".getBytes))
    (1 to 6).foreach(i => s.upload(s"f$i.txt", s"doc $i body".getBytes))
    val filesBefore = s.dataFileCount()
    assert(filesBefore >= 12, s"expected >=12 files, got $filesBefore")
    val contentBefore = s.all
      .select("filename", "version", "content").collect()
      .map(r => (r.getString(0), r.getInt(1),
        new String(r.getAs[Array[Byte]](2)))).toSet
    s.compact()
    // fewer, denser files; every (file, version, content) byte-identical
    val filesAfter = s.dataFileCount()
    assert(filesAfter < filesBefore, s"$filesAfter !< $filesBefore")
    val contentAfter = s.all
      .select("filename", "version", "content").collect()
      .map(r => (r.getString(0), r.getInt(1),
        new String(r.getAs[Array[Byte]](2)))).toSet
    assert(contentAfter == contentBefore)
    // versioning continues seamlessly after compaction
    assert(s.upload("a.txt", "alpha 7".getBytes) == 7)
  }

  test("stats reports files, versions, bytes in one scan") {
    val s = newStore()
    s.upload("a.txt", "12345".getBytes)
    s.upload("a.txt", "123".getBytes)
    s.upload("b.txt", "1234567".getBytes)
    val r = s.stats().collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 3L, 15L))
  }

  test("snapshotAsOf reads the store as of an old version boundary") {
    val s = newStore()
    s.upload("a.txt", "a v1".getBytes); s.upload("a.txt", "a v2".getBytes)
    s.upload("a.txt", "a v3".getBytes)
    s.upload("b.txt", "b v1".getBytes)
    // c.txt first appears at v3 of the store's life — absent at asof 2
    val snap = s.snapshotAsOf(2).select("filename", "version").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(snap == Set(("a.txt", 2), ("b.txt", 1)))
    // full time travel: asof 3 sees a.txt v3
    assert(s.snapshotAsOf(3)
      .filter(org.apache.spark.sql.functions.col("filename") === "a.txt")
      .select("version").collect().head.getInt(0) == 3)
  }

  test("download returns latest content; update replaces content in place") {
    val s = newStore()
    s.upload("doc.txt", "first version".getBytes)
    s.upload("doc.txt", "second version".getBytes)
    assert(new String(s.download("doc.txt").get) == "second version")
    // reference update() wrote the FILENAME string as content (DMS.py:225)
    // and then crashed; ours replaces the latest version's bytes
    assert(s.update("doc.txt", "patched".getBytes))
    assert(new String(s.download("doc.txt").get) == "patched")
    assert(s.latestVersion("doc.txt").contains(2)) // no new version minted
    assert(new String(s.content("doc.txt", 1).get) == "first version")
    assert(!s.update("missing.txt", "x".getBytes))
  }

  test("delete is exact-match; dotted filenames survive (key-parse bug fixed)") {
    val s = newStore()
    s.upload("a.txt", "one".getBytes)
    s.upload("bad-a.txt", "two".getBytes)
    s.upload("v1.my.doc.txt", "three".getBytes)
    // reference's regex match would have hit bad-a.txt too (DMS.py:373)
    s.deleteAllVersions("a.txt")
    assert(s.all.count() == 2)
    assert(s.download("bad-a.txt").isDefined)
    assert(s.download("v1.my.doc.txt").isDefined)
    s.upload("b.txt", "x1".getBytes); s.upload("b.txt", "x2".getBytes)
    s.delete("b.txt", 1)
    assert(s.versions("b.txt") == Seq(2))
  }

  test("metadata extraction lands in the meta map (hachoir replacement)") {
    val s = newStore()
    val png = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(800).putInt(600)
      b.array()
    }
    s.upload("pic.png", png)
    val m = s.metadata("pic.png", 1).get
    assert(m("mime") == "image/png" && m("width") == "800" && m("height") == "600")
    assert(m("length") == png.length.toString)
  }

  test("hdfs_status struct is populated on upload (FileStatus subset, DMS.py:145-155)") {
    val s = newStore()
    s.upload("st.txt", "twelve bytes".getBytes)
    val row = s.all.filter(org.apache.spark.sql.functions.col("filename") === "st.txt")
      .select("hdfs_status.length", "hdfs_status.owner",
        "hdfs_status.modification_time", "hdfs_status.permission")
      .collect().head
    assert(row.getLong(0) == "twelve bytes".getBytes.length.toLong)
    assert(row.getString(1).nonEmpty)
    assert(row.getTimestamp(2) != null)
    assert(row.getString(3) == "rw-r--r--")
    // update refreshes the status in place
    s.update("st.txt", "longer replacement bytes".getBytes)
    val len2 = s.all.filter(org.apache.spark.sql.functions.col("filename") === "st.txt")
      .select("hdfs_status.length").collect().head.getLong(0)
    assert(len2 == "longer replacement bytes".getBytes.length.toLong)
  }

  test("search ranks by TF-IDF over latest versions only") {
    val s = newStore()
    s.upload("hit.txt", "spark spark spark window".getBytes)
    s.upload("meh.txt", "window table row".getBytes)
    s.upload("old.txt", "spark spark spark spark".getBytes)
    s.upload("old.txt", "nothing relevant here".getBytes) // v2 shadows v1
    val got = s.search("spark").collect().map(_.getString(0))
    assert(got.headOption.contains("hit.txt"))
    assert(!got.contains("old.txt")) // latest version has no 'spark'
  }

  test("persisted index: searchIndexed matches search, reads only query terms, goes stale until rebuilt") {
    val s = newStore()
    s.upload("hit.txt", "spark spark spark window".getBytes)
    s.upload("meh.txt", "window table row".getBytes)
    s.buildIndex()
    val live = s.search("spark window").collect().map(r => (r.getString(0), r.getDouble(2)))
    val idx = s.searchIndexed("spark window").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(idx.toSeq == live.toSeq)
    // the term predicate reaches the postings parquet scan as a real
    // data-source In filter ("term" merely appearing in the read schema
    // would pass a looser contains check even with PushedFilters: [])
    val plan = s.searchIndexed("spark").queryExecution.executedPlan.toString
    assert(plan.contains("In(term") || plan.contains("EqualTo(term"),
      s"term In-filter not pushed to the postings scan:\n$plan")
    // index is a snapshot: a new upload is invisible until rebuild
    s.upload("new.txt", "spark spark spark spark spark".getBytes)
    assert(!s.searchIndexed("spark").collect().map(_.getString(0)).contains("new.txt"))
    s.buildIndex()
    assert(s.searchIndexed("spark").collect().map(_.getString(0)).headOption.contains("new.txt"))
  }

  test("phrase search: adjacent positions only, multi-term, counts hits") {
    val s = newStore()
    s.upload("a.txt", "spark window functions beat spark window hacks".getBytes)
    s.upload("b.txt", "window spark is reversed here".getBytes)
    s.upload("c.txt", "spark alone and window alone".getBytes)
    s.buildIndex()
    // bigram: both occurrences in a.txt count; b.txt is reversed, c.txt split
    val hits = s.searchPhrase("spark window").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(hits.toSeq == Seq(("a.txt", 2L)))
    // trigram spans the first occurrence only
    val tri = s.searchPhrase("spark window functions").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(tri.toSeq == Seq(("a.txt", 1L)))
    assert(s.searchPhrase("window hacks beat").isEmpty)
  }

  test("near-dup index: findNearDups ranks the overlapping doc, skips others") {
    val s = newStore()
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    s.upload("orig.txt", base.getBytes)
    s.upload("other.txt", (100 to 130).map(i => s"z$i").mkString(" ").getBytes)
    s.buildNearDupIndex()
    val probe = ((1 to 28).map(i => s"tok$i") ++ Seq("xx", "yy")).mkString(" ")
    val got = s.findNearDups(probe).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == Seq("orig.txt"))
    assert(got.head._2 >= 0.5)
    // an unrelated probe matches nothing
    assert(s.findNearDups("totally different words here entirely").isEmpty)
  }

  test("dedupClusters groups transitively; duplicatedSpanReport flags shared runs") {
    import spark.implicits._
    val s = newStore()
    val run = (1 to 20).map(i => s"tok$i").mkString(" ") // 20-token shared run
    // a~b and b~c are near-identical but a,c differ at BOTH ends -> the
    // cluster still closes transitively through b
    s.upload("a.txt", s"alpha $run".getBytes)
    s.upload("b.txt", s"$run".getBytes)
    s.upload("c.txt", s"$run zulu".getBytes)
    s.upload("solo.txt", "entirely different words nothing shared here at all ok".getBytes)
    for (logStar <- Seq(false, true)) {
      val cl = s.dedupClusters(minEstJaccard = 0.3, logStar = logStar)
        .select("filename", "cluster_id", "is_keeper")
        .as[(String, String, Boolean)].collect().toSet
      assert(cl == Set(
        ("a.txt", "a.txt", true), ("b.txt", "a.txt", false),
        ("c.txt", "a.txt", false), ("solo.txt", "solo.txt", true)),
        s"logStar=$logStar")
    }
    // every sharer reports the duplicated run; solo.txt reports nothing
    val rep = s.duplicatedSpanReport(n = 8)
      .select("filename", "dup_tokens").as[(String, Long)].collect().toMap
    assert(rep.keySet == Set("a.txt", "b.txt", "c.txt"))
    // the shared 12-token prefix is one island of >= 12 tokens
    assert(rep.values.forall(_ >= 12))
  }

  test("point lookups prune to one shard partition directory") {
    val s = newStore()
    (0 until 20).foreach(i => s.upload(s"file$i.txt", s"content $i".getBytes))
    // the lookup plan must carry a shard partition filter
    val plan = s.all.filter(org.apache.spark.sql.functions.col("shard") ===
        s.shardOf("file3.txt") &&
        org.apache.spark.sql.functions.col("filename") === "file3.txt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"no shard partition filter:\n$plan")
    // and the lookup itself still answers correctly
    assert(new String(s.download("file3.txt").get) == "content 3")
    assert(s.versions("file3.txt") == Seq(1))
  }

  test("scanRegex is the explicit regex operator; truncate empties the store") {
    val s = newStore()
    s.upload("report_2024.txt", "x".getBytes)
    s.upload("report_2025.txt", "y".getBytes)
    s.upload("notes.md", "z".getBytes)
    assert(s.scanRegex("^report_\\d+").count() == 2)
    s.truncate()
    assert(s.all.isEmpty)
    // store stays usable after truncate
    assert(s.upload("fresh.txt", "w".getBytes) == 1)
    assert(s.all.count() == 1)
  }
}
