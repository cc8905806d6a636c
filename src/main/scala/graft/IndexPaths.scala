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
    * /tmp/graft_lsh_idx_root_testdata_sf0.01 */
  def forSf(kind: String, sfDir: String): String = {
    val canon = java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize
      .toString
      .replaceAll("[^A-Za-z0-9.]+", "_")
      .replaceAll("^_+|_+$", "")
    java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_${kind}_idx_$canon").toString
  }
}
