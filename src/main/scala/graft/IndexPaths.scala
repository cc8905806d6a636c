package graft

/** Fixed per-SF locations for ingest-time artifacts (LSH signatures,
  * text postings, ANN codes). One directory per (artifact kind, SF
  * dir), derived from the CANONICAL SF path string — never from
  * `hashCode` (round-12 ADVICE: a hashCode collision across different
  * SF dirs would silently share an index, and the hex value says
  * nothing in a directory listing). Writers `overwrite`, so repeated
  * bench/verify sweeps reuse one directory instead of leaking temp
  * dirs.
  *
  * Single-writer assumption: the driver runs verify and bench
  * sequentially, and a production ingest owns its index directory; two
  * concurrent processes overwriting the same SF's artifact would race
  * (parquet overwrite is not atomic across the sidecar files). If
  * concurrent sweeps are ever expected, stage to a fresh directory and
  * swap a pointer file — the standard publish protocol — rather than
  * locking.
  */
object IndexPaths {

  /** e.g. forSf("lsh", "/root/testdata/sf0.01") →
    * /tmp/graft_lsh_idx_root_testdata_sf0.01_a1b2c3d4
    *
    * The readable name alone is NOT injective (the sanitizer collapses
    * every non-alphanumeric run to '_', so /root/test_data/sf0.1 and
    * /root/test/data/sf0.1 would share a name — ADVICE r13); a short
    * SHA-1 of the UNsanitized canonical path is appended so distinct
    * SF dirs can never silently share an index, while the prefix stays
    * human-readable in a directory listing. */
  def forSf(kind: String, sfDir: String): String = {
    val canonPath = java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize
      .toString
    val canon = canonPath
      .replaceAll("[^A-Za-z0-9.]+", "_")
      .replaceAll("^_+|_+$", "")
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest(canonPath.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_${kind}_idx_${canon}_$sha").toString
  }
}
