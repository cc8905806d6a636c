package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline mandate (SURVEY.md §2.9):
  * tokenization, shingling, language-ID heuristic, quality scoring, token
  * counting, document fingerprinting. All pure Column expressions
  * (codegen'd built-ins) — no UDFs, so the whole surface stays inside
  * whole-stage codegen and is reproducible in the DuckDB oracle.
  */
object Text {

  /** Whitespace tokenizer: lowercase, trim, split, drop empties.
    * (The reference delegates tokenization to Solr out-of-band,
    * DMS.py:345-356; this is the in-engine equivalent.) */
  def tokenize(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Word n-gram shingles over a token array: positions i..i+n-1 joined by
    * a single space. Docs shorter than n tokens yield an empty array.
    *
    * The `transform(array(tokens), ts => ...)` wrapper is load-bearing:
    * it binds the token expression to a lambda variable evaluated ONCE per
    * row. Referencing `tokens` directly in each element_at would make
    * Catalyst inline (and re-evaluate) the whole upstream expression —
    * e.g. a full split+filter of the text — n times per shingle. */
  def shingles(tokens: Column, n: Int): Column =
    flatten(transform(array(tokens), ts =>
      // guard: Spark's sequence(1, 0) counts DOWN, so short docs must
      // short-circuit to an empty array instead
      when(size(ts) >= n,
        transform(
          sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(ts, i + k)): _*)
        )
      ).otherwise(array().cast("array<string>"))))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokenize(text))

  /** BPE-ish subword count: alnum runs + single non-space punctuation —
    * a cheap proxy for a real tokenizer's piece count. RE2-compatible
    * pattern (no lookarounds) so the DuckDB oracle can reproduce it. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"))

  /** Small per-language marker vocabularies for the n-gram/stopword
    * language-ID heuristic. Deterministic, dependency-free. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "los", "que", "de"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Language-ID: the language whose marker words hit the most tokens;
    * 'und' (undetermined) when nothing matches. Ties break by language
    * code ascending for determinism. */
  def langId(tokens: Column): Column = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val n = langs.size
    // bind the token array once (see shingles for why)
    element_at(transform(array(tokens), ts => {
      val scored = langs.zipWithIndex.map { case ((lang, markers), i) =>
        val score = size(filter(ts, t => t.isin(markers.map(m => lit(m)): _*)))
        // tie-break ascending by language code: greatest() picks the max
        // struct, so rank codes in reverse-alphabetical index order
        struct(score.as("score"), lit(n - 1 - i).as("idx"), lit(lang).as("lang"))
      }
      val best = greatest(scored: _*)
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    }), 1)
  }

  /** Quality score in [0,1]: mean-word-length band + alpha ratio +
    * repetition penalty (distinct/total tokens). The shape every
    * training-data pipeline wants; every term is an exact expression. */
  def qualityScore(text: Column): Column =
    // bind the token array once (see shingles for why)
    element_at(transform(array(tokenize(text)), toks => {
      val nTok     = size(toks).cast("double")
      val meanLen  = when(nTok > 0, length(concat_ws("", toks)).cast("double") / nTok).otherwise(0.0)
      val alphaRatio = when(
        length(text) > 0,
        (length(text) - length(regexp_replace(text, "[a-zA-Z ]", ""))).cast("double") / length(text)
      ).otherwise(0.0)
      val distinctRatio = when(nTok > 0, size(array_distinct(toks)).cast("double") / nTok).otherwise(0.0)
      val lenBand = when(meanLen >= 3.0 && meanLen <= 10.0, 1.0).otherwise(0.5)
      (lenBand * 0.3 + alphaRatio * 0.4 + distinctRatio * 0.3)
    }), 1)

  /** C4-style text normalization: strip control characters, collapse
    * whitespace runs to one space, trim, lowercase. Every step is an
    * RE2-safe regexp_replace, so the DuckDB oracle reproduces it
    * byte-for-byte (no ICU/NFC dependency). */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),
      "\\s+", " ")))

  /** Karp–Rabin document fingerprint: strict left fold of
    * `acc*31 + ascii(char) mod 1e9+7` over the characters. Identical
    * `list_reduce` in DuckDB. */
  def fingerprint(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => c =!= ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch), lit(1000000007L))
    )

  /** Jaro-Winkler similarity via the native codegen'd expression
    * ([[graft.plans.JaroWinkler]]) — numerically identical to DuckDB's
    * `jaro_winkler_similarity`. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Deflate-compressed byte length of the UTF-8 text (zlib level 9,
    * default strategy) — the RefinedWeb/Gopher-style compressibility
    * quality signal: near-duplicate boilerplate and template spam
    * compress far below natural text. Deterministic for a given JDK
    * zlib. */
  def deflatedLen(text: Column): Column = deflatedLenUdf(text)

  private lazy val deflatedLenUdf =
    org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) 0L
      else {
        val d = new java.util.zip.Deflater(9)
        try {
          d.setInput(s.getBytes("UTF-8")); d.finish()
          val buf = new Array[Byte](8192)
          var total = 0L
          while (!d.finished()) total += d.deflate(buf)
          total
        } finally d.end()
      }
    }
}
