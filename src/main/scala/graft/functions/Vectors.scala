package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions (no UDFs) — SURVEY.md §2.9 D6.
  *
  * Determinism contract: every reduction is a strict left fold in DOUBLE
  * (`aggregate` with a 0.0 seed), so a result is bit-identical across
  * engines/runs for the same element order — this is what lets cosine
  * scores hash-match a DuckDB `list_reduce` oracle.
  */
object Vectors {

  /** Exact widening of a float vector to double. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** dot(a, b) as a strict left fold over pairwise products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Native codegen'd cosine ([[graft.plans.CosineF32]]): bit-identical to
    * [[cosine]] (same per-accumulator fold order) but a tight primitive
    * loop instead of interpreted lambdas — the ANN rerank hot path. */
  def cosineFast(a: Column, b: Column): Column =
    ColumnBridge.column(graft.plans.CosineF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native codegen'd dot product ([[graft.plans.DotF32]]). */
  def dotFast(a: Column, b: Column): Column =
    ColumnBridge.column(graft.plans.DotF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2-normalized copy of a vector (all zeros when the norm is zero).
    *
    * The `transform(array(...), v => ...)` wrappers bind the widened
    * array and its norm ONCE per row — element lambdas referencing a
    * derived column directly would make Catalyst inline (re-evaluate)
    * the whole upstream expression per element (see Text.shingles).
    */
  def normalized(v: Column): Column =
    flatten(transform(array(toDouble(v)), dv =>
      flatten(transform(
        array(sqrt(aggregate(transform(dv, x => x * x), lit(0.0), (acc, x) => acc + x))),
        n => transform(dv, x => when(n === 0.0, lit(0.0)).otherwise(x / n))))))

  /** Per-vector symmetric int8 quantization:
    * q_i = floor(x_i * 127 / max|x| + 0.5) in [-127, 127].
    *
    * The 100 TB storage/IO codec for similarity search: 4x smaller than
    * float32 on disk and over the shuffle, integer dot products for
    * candidate generation (SIMD-friendly, no FP rounding drift), exact
    * vectors re-fetched by id only for the final rerank. floor(x + 0.5)
    * rather than round(): both engines floor identically on IEEE
    * doubles, while round() diverges at .5 boundaries (BigDecimal vs fp).
    */
  def quantizeInt8(v: Column): Column =
    flatten(transform(array(toDouble(v)), dv =>
      flatten(transform(array(array_max(transform(dv, x => abs(x)))), m =>
        transform(dv, x => when(m === 0.0, lit(0L))
          .otherwise(floor(x * 127.0 / m + 0.5)))))))

  /** max|x_i| / 127 — the dequantization scale paired with
    * [[quantizeInt8]] (x_i ≈ q_i * scale). */
  def quantScale(v: Column): Column =
    array_max(transform(toDouble(v), x => abs(x))) / 127.0

  /** Integer dot product of two quantized (long) vectors — exact BIGINT
    * arithmetic, reproducible digit-for-digit in any engine. */
  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** md5-derived hyperplane coefficient for (plane, dimension d):
    * uniform in [-1, 1) from the top 60 bits of `md5("plane:d")` — the
    * engine-portable hash family (same pattern as SampleOps.bucket100).
    * DuckDB reproduces it bit-for-bit as
    * `('0x' || substring(md5(plane || ':' || d), 1, 15))::BIGINT
    *    / 1152921504606846976.0 * 2 - 1`
    * (long→double is IEEE round-to-nearest in both engines; the divisor
    * is a power of two, so the scaling is exact).
    *
    * Planes are data-independent constants, so they are computed ONCE
    * driver-side and shipped as literal arrays — zero per-row hashing,
    * and the projection stays a plain codegen'd fold.
    */
  def planeCoef(plane: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / (1L << 60).toDouble * 2.0 - 1.0
  }

  /** Multi-table sign-LSH keys: `nTables` independent tables of
    * `planesPerTable` hyperplanes each, every key tagged with its table id
    * (`table * 2^k + bucket`) so keys from different tables never join.
    * Explode + equi-join on the key, then rerank candidates exactly.
    *
    * This is the actual 100 TB ANN path: single-table recall decays with
    * bucket count, but P(miss) = (1 - p^k)^L decays exponentially in L, so
    * recall is a dial (more tables) that costs linear work, not quadratic.
    *
    * Coefficients come from [[planeCoef]], so the identical bucket
    * assignment is expressible in ANSI SQL — the whole candidate → rerank
    * pipeline is exact-hash-checkable against DuckDB.
    */
  def lshTables(v: Column, planesPerTable: Int, nTables: Int, dim: Int = 64): Column = {
    val dv = toDouble(v)
    val keys: Seq[Column] = (0 until nTables).map { t =>
      val bits: Seq[Column] = (0 until planesPerTable).map { p =>
        val plane = t * planesPerTable + p
        val coefs = typedlit((0 until dim).map(d => planeCoef(plane, d)))
        val proj = aggregate(zip_with(dv, coefs, (x, c) => x * c),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _) + lit(t.toLong * (1L << planesPerTable))
    }
    array(keys: _*)
  }
}
