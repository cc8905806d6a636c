package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Per-query implementation digests — the machine check that kills the
  * stale-freeze class (a BASELINE.md row pricing a plan that no longer
  * exists, as `t23_rfm_segmentation`'s 0.40 s ntile-era row did for two
  * rounds after the GK-band rewrite).
  *
  * A query's digest is the SHA-1 of its registration slice: from its
  * `Q(` up to the next `Q(` in the same file (or EOF). Editing ANY line
  * of a query's implementation changes its digest; `AuditSpec` then
  * fails until `freeze_digests.tsv` is regenerated — which is the
  * conscious moment to re-freeze the query's BASELINE row (or record in
  * the round notes why the frozen number still prices the new code).
  * Helper edits outside the Q block (shared functions, plan rules) are
  * not detected — those are covered by the bench sweep's 2x gate.
  *
  * Regenerate: `tools/run.sh graft.FreezeDigests > freeze_digests.tsv`
  */
object FreezeDigests {

  private val QName = "Q\\(\\s*\"([a-z0-9_]+)\"".r

  private def sha1(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def digests(root: Path): Map[String, String] =
    Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val text = new String(Files.readAllBytes(p), "UTF-8")
        val ms = QName.findAllMatchIn(text).toList
        val ends = ms.drop(1).map(_.start) :+ text.length
        ms.zip(ends).map { case (m, end) =>
          m.group(1) -> sha1(text.substring(m.start, end))
        }
      }.toMap

  def main(args: Array[String]): Unit = {
    val root = Paths.get(args.headOption.getOrElse("src/main/scala/graft"))
    digests(root).toSeq.sortBy(_._1)
      .foreach { case (n, d) => println(s"$n\t$d") }
  }
}
