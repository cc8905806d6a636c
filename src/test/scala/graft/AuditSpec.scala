package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Self-verifying engineering audits. The `localCheckpoint` audit note in
  * BASELINE.md was hand-counted wrong two rounds running (~26 vs 60, then
  * 55+2 vs 60), so the table is now machine-readable (the
  * `AUDIT:localCheckpoint` block) and this spec recounts the truth from
  * source: the note and the code may not disagree. Every NEW call site
  * therefore forces a conscious table edit — i.e. a written justification
  * under class (a) multi-consumed corpus relation or (b) iterative lineage
  * cut — before the build goes green again.
  */
class AuditSpec extends AnyFunSuite {

  private val repo = {
    // sbt runs tests with cwd = project root; fall back to the absolute
    // path so the spec also works when forked elsewhere
    val cand = Seq(Paths.get("").toAbsolutePath, Paths.get("/root/repo"))
    cand.find(p => Files.exists(p.resolve("BASELINE.md"))).get
  }

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  /** Non-comment `localCheckpoint()` call sites per file, keyed by the
    * path relative to `src/main/scala/graft/`.
    */
  private def sourceCounts(): Map[String, Int] = {
    val root = repo.resolve("src/main/scala/graft")
    scalaFiles(root).flatMap { p =>
      val n = Files.readAllLines(p).asScala.iterator
        .map(_.trim)
        .filterNot(s => s.startsWith("//") || s.startsWith("*") || s.startsWith("/*"))
        // match `.localCheckpoint(` — any arg list, so the eager-flag
        // overload `localCheckpoint(true/false)` cannot escape the audit
        .map(s => "\\.localCheckpoint\\(".r.findAllIn(s).length)
        .sum
      if (n > 0) Some(root.relativize(p).toString -> n) else None
    }.toMap
  }

  private def auditedCounts(): Map[String, (Int, String)] = {
    val text = new String(Files.readAllBytes(repo.resolve("BASELINE.md")), "UTF-8")
    val block = text.split("<!-- AUDIT:localCheckpoint")(1).split("AUDIT:end")(0)
    block.linesIterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val Array(file, n, cls) = line.split("\\s+")
      file -> (n.toInt, cls)
    }.toMap
  }

  test("BASELINE.md localCheckpoint audit table matches the source exactly") {
    val truth = sourceCounts()
    val note = auditedCounts()
    val missing = truth.keySet -- note.keySet
    val stale = note.keySet -- truth.keySet
    val wrong = truth.keySet.intersect(note.keySet)
      .filter(k => truth(k) != note(k)._1)
      .map(k => s"$k: source ${truth(k)} vs table ${note(k)._1}")
    assert(missing.isEmpty && stale.isEmpty && wrong.isEmpty,
      s"""localCheckpoint audit drift —
         |  uncounted files: ${missing.toSeq.sorted.mkString(", ")}
         |  stale table rows: ${stale.toSeq.sorted.mkString(", ")}
         |  wrong counts: ${wrong.toSeq.sorted.mkString("; ")}
         |Update the AUDIT:localCheckpoint block in BASELINE.md WITH a
         |class (a)/(b) justification for each new site.""".stripMargin)
    // every row carries a justification class
    note.foreach { case (f, (_, cls)) =>
      assert(Set("a", "b", "a+b").contains(cls), s"$f: unknown class '$cls'")
    }
  }

  test("no unjustified driver materialization outside the audited files") {
    // .checkpoint() (reliable) is never used in local mode — it would
    // require a checkpoint dir and silently write to disk; the audit
    // covers localCheckpoint() only, so pin the invariant here
    val root = repo.resolve("src/main/scala/graft")
    val offenders = scalaFiles(root).filter { p =>
      Files.readAllLines(p).asScala.iterator
        .map(_.trim)
        .filterNot(s => s.startsWith("//") || s.startsWith("*") || s.startsWith("/*"))
        .exists(s => s.contains(".checkpoint()"))
    }
    assert(offenders.isEmpty,
      s"reliable .checkpoint() in main (use localCheckpoint + audit): $offenders")
  }
}
