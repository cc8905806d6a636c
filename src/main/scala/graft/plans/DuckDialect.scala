package graft.plans

/** DuckDB→Spark SQL dialect rewrite — the mechanical spelling deltas
  * between the oracle corpus (authored in DuckDB's dialect) and Spark's
  * ANSI parser, so `SqlParitySpec` can push the DuckDB-only tranche of
  * oracle texts through `spark.sql` and close the three-way
  * DataFrame/Spark-SQL/DuckDB triangle on far more of the surface.
  *
  * Strictly textual and conservative: every rule either preserves
  * semantics on the construct it rewrites or leaves the text unchanged
  * (an unparseable remainder simply stays skipped — the parity test
  * fails loudly on any rewrite that parses but diverges, so a wrong
  * rule cannot hide). The rules, in application order:
  *
  *   1. `range(a, b)` → `sequence((a), (b) - 1)` (DuckDB's end-exclusive
  *      list vs Spark's inclusive; 1-arg `range(n)` → `sequence(0, n-1)`;
  *      3-arg stepped ranges are left alone)
  *   2. `string_split(s, 'sep')` → `split(s, '<regex-escaped sep>')`
  *      (DuckDB splits on a literal, Spark on a regex — metacharacters
  *      in a literal separator are escaped; non-literal separators are
  *      left alone)
  *   3. `strftime(x, '%…')` → `date_format(x, 'y…')` and
  *      `strptime(s, '%…')` → `to_timestamp(s, 'y…')` via the %-code
  *      table below (texts using an unmapped code are left alone)
  *   4. `list_slice(x, a, b)` → `slice(x, (a), (b) - (a) + 1)` (both
  *      1-based, DuckDB takes an inclusive end index, Spark a length)
  *   5. word renames outside string literals: `list_transform` →
  *      `transform`, `list_filter` → `filter`, `list_distinct` →
  *      `array_distinct`, `list_contains` → `array_contains`,
  *      `list_value` → `array`, `list_concat` → `concat`, `list_sort` →
  *      `array_sort`, `unnest` → `explode`, `epoch` → `unix_timestamp`
  *      (lambda syntax `x -> …` is shared by both dialects and passes
  *      through untouched)
  *   6. `//` → ` DIV ` (integer division; DuckDB's float `//` would
  *      surface as a parity diff, not silent corruption)
  *   7. list literals `[a, b, …]` → `array(a, b, …)` — only in literal
  *      position (start of expression), never after an identifier/`)`
  *      where `[` is subscripting: DuckDB and Spark disagree on
  *      subscript base (1 vs 0), so subscripts are left for the parser
  *      to reject rather than silently shifted
  *
  * Recursive CTEs with distinct UNION (round 13): Spark's native
  * recursive CTE is UNION ALL only — a converged min-label/reach
  * iteration re-emits the same rows forever, so no DIRECT translation
  * terminates. The front-door spelling is [[recursiveUnroll]]: K
  * accumulate-DISTINCT rounds as ordinary chained CTEs
  * (r_{i+1} = DISTINCT(r_i ∪ step(r_i))), monotone in i, equal to
  * DuckDB's fixpoint for every K ≥ rounds-to-converge — and the parity
  * gate HASH-COMPARES the unrolled text against the DataFrame program,
  * so an insufficient K fails loudly, never silently. (The engine
  * itself never runs this shape: its CC is convergence-counted
  * large/small-star — the unroll exists to give the ORACLE TEXT a
  * front-door spelling.)
  *
  * `read_csv`/`read_json` table functions (round 14 — the last two
  * ledgered texts): Spark SQL's file-format table syntax
  * (`csv.`path``/`json.`path``) takes no options, so the option map
  * is COMPILED INTO a casting subquery instead — `columns = {...}`
  * becomes one `CAST(col AS type) AS name` per field (struct types
  * recursively as `STRUCT<...>`), csv `header = true` becomes a
  * null-safe filter dropping the row whose first column equals the
  * first field's name (the header line — a data row can only collide
  * if its first field literally holds the column name, impossible for
  * the non-string key columns these sources key on), and json
  * `format = 'newline_delimited'` is Spark's json default. Any other
  * option, a non-literal path, or an unmapped type leaves the text
  * unchanged (conservative), and the parity gate hash-compares the
  * rewrite against the DataFrame reader program, so a wrong spelling
  * fails loudly.
  */
object DuckDialect {

  /** Rewrite `sql`; None if no rule applied (text already ANSI or
    * untranslatable without one of the rules firing). */
  def toSpark(sql: String): Option[String] = {
    val sql0 = recursiveUnroll(sql)
    toSparkInner(sql0) match {
      case some @ Some(_)         => some
      case None if sql0 != sql    => Some(sql0)
      case None                   => None
    }
  }

  private def toSparkInner(sql: String): Option[String] = {
    // DuckDB single-quoted literals are verbatim (backslash is a plain
    // character); Spark's default parser treats backslash as an escape.
    // Double every in-literal backslash FIRST so '\s+' still means the
    // regex \s+ after Spark's un-escaping — every later rule then
    // operates on (and generates) Spark-escaped text.
    var s = mapInString(sql, _.replace("\\", "\\\\"))
    // reader table functions first: their `columns = {...}` option map
    // must be consumed whole before the brace/bracket literal passes
    // could misread it
    s = readerTables(s, "read_csv")
    s = readerTables(s, "read_json")
    // `FROM range(a, b)` is a Spark table-valued function with DuckDB's
    // exact end-exclusive semantics — only rewrite range() in expression
    // position, where DuckDB yields a LIST and Spark needs sequence()
    s = rewriteCalls(s, "range", rangeToSequence,
      allow = (txt, at) => {
        val w = lastWordBefore(txt, at)
        !w.equalsIgnoreCase("FROM") && !w.equalsIgnoreCase("JOIN")
      })
    s = rewriteCalls(s, "string_split", stringSplit)
    s = rewriteCalls(s, "str_split", stringSplit)
    s = rewriteCalls(s, "strftime", timeFormat("date_format"))
    s = rewriteCalls(s, "strptime", timeFormat("to_timestamp"))
    s = rewriteCalls(s, "list_slice", listSlice)
    s = rewriteCalls(s, "datediff", dateDiffDay)
    s = rewriteCalls(s, "date_diff", dateDiffDay)
    s = rewriteCalls(s, "time_bucket", timeBucket)
    s = rewriteCalls(s, "string_agg", orderedStringAgg)
    s = rewriteCalls(s, "sha256",
      { case a :: Nil => Some(s"sha2($a, 256)"); case _ => None })
    s = rewriteCalls(s, "xor",
      { case a :: b :: Nil => Some(s"(($a) ^ ($b))"); case _ => None })
    s = rewriteCalls(s, "regexp_matches", // partial match on both engines
      { case a :: b :: Nil => Some(s"(($a) RLIKE ($b))"); case _ => None })
    s = rewriteCalls(s, "encode", // DuckDB's 1-arg utf8 string→blob
      { case a :: Nil => Some(s"encode($a, 'UTF-8')"); case _ => None })
    s = rewriteCalls(s, "epoch_us", // CAST lifts DATE args like DuckDB does
      { case a :: Nil => Some(s"unix_micros(CAST($a AS TIMESTAMP))"); case _ => None })
    s = rewriteCalls(s, "regexp_replace", // DuckDB backrefs are \1;
      // Spark's (Java's) are $1 — a literal "\1" replacement silently
      // substitutes the CHARACTER 1 (caught by d2_bpe parity). Only a
      // quoted replacement literal is touched. Backslashes were doubled
      // by the in-literal escape pass above, hence the \\\\ match.
      { case a :: b :: c :: rest if c.trim.startsWith("'") &&
            "\\\\\\\\[0-9]".r.findFirstIn(c).isDefined =>
          val fixed = c.replaceAll("\\\\\\\\([0-9])", "\\$$1")
          Some(s"regexp_replace($a,$b,$fixed${rest.map("," + _).mkString})")
        case _ => None })
    s = rewriteCalls(s, "regexp_replace", // DuckDB 'g' flag = Spark default
      { case a :: b :: c :: g :: Nil if g.trim.equalsIgnoreCase("'g'") =>
          Some(s"regexp_replace($a,$b,$c)")
        case _ => None })
    s = rewriteCalls(s, "median", // exact interpolated median on both
      { case a :: Nil => Some(s"percentile(($a), 0.5)"); case _ => None })
    // `FROM range(a,b)` is a Spark TVF already, but its column is `id`
    // where DuckDB's is `range` — re-alias so bare-`range` references bind
    s = rewriteCalls(s, "range",
      { case a :: b :: Nil =>
          Some(s"(SELECT id AS range FROM range(($a), ($b)))")
        case _ => None },
      allow = (txt, at) => {
        val w = lastWordBefore(txt, at)
        w.equalsIgnoreCase("FROM") || w.equalsIgnoreCase("JOIN")
      })
    s = rewriteCalls(s, "decode", // DuckDB's 1-arg utf8 blob→string
      { case a :: Nil => Some(s"decode($a, 'UTF-8')"); case _ => None })
    s = unionAllByName(s)
    s = mapBraceLiteral(s)
    s = rewriteCalls(s, "map", // DuckDB's two-LIST map constructor; only
      // fires on bracket-literal args so Spark's own variadic map(k, v, …)
      // spelling can never match
      { case a :: b :: Nil
          if a.trim.startsWith("[") && b.trim.startsWith("[") =>
          Some(s"map_from_arrays($a, $b)")
        case _ => None })
    s = rewriteCalls(s, "map_from_entries", // DuckDB entries are ROW
      // tuples `(k, v)`; Spark wants structs with UNIFORM field names
      // (array() compares struct types including names)
      { case l :: Nil if l.trim.startsWith("[") && l.trim.endsWith("]") =>
          val inner = l.trim.drop(1).dropRight(1)
          splitArgs("(" + inner + ")", 0).flatMap { case (_, elems) =>
            val pairs = elems.map { e =>
              val t = e.trim
              if (t.startsWith("(") && t.endsWith(")"))
                splitArgs(t, 0).collect {
                  case (end, a :: b :: Nil) if t.substring(end).trim.isEmpty =>
                    s"struct(($a) AS k, ($b) AS v)"
                }
              else None
            }
            if (pairs.nonEmpty && pairs.forall(_.isDefined))
              Some(s"map_from_entries(array(${pairs.flatten.mkString(", ")}))")
            else None
          }
        case _ => None })
    s = rewriteCalls(s, "struct_pack", // named-struct constructor:
      // `struct_pack(k := v, …)` → named_struct('k', v, …)
      { case args if args.nonEmpty =>
          val kv = args.map(_.trim).map { a =>
            val m = StructPackArg.findFirstMatchIn(a)
            m.map(x => s"'${x.group(1)}', ${x.group(2)}")
          }
          if (kv.forall(_.isDefined)) Some(s"named_struct(${kv.flatten.mkString(", ")})")
          else None
        case _ => None })
    s = rewriteCalls(s, "struct_extract", // POSITIONAL struct field (int
      // literal, 1-based): the corpus uses it on list_zip structs, whose
      // Spark (arrays_zip) fields are named "0","1",… — so N maps to the
      // backticked field `N-1`. Named extraction parses on both engines
      // and never reaches this rule.
      { case a :: n :: Nil if n.trim.matches("\\d+") =>
          Some(s"($a).`${n.trim.toInt - 1}`")
        case _ => None })
    s = rewriteCalls(s, "list_reduce", // the SEEDED-fold idiom
      // list_reduce(list_prepend(Z, L), F): the prepended zero makes
      // DuckDB's first-element seed explicit — Spark's 3-arg aggregate()
      // takes the zero directly, so L is emitted ONCE. (The generic rule
      // below triplicates L, which garbles the deeply nested
      // comprehension folds in the LSH/cosine oracle texts.)
      // Only an explicitly-typed zero (the corpus's CAST(… AS DOUBLE))
      // qualifies: a bare 0.0 parses as DECIMAL in Spark and aggregate()
      // then rejects a double-typed merge lambda — those fall through to
      // the generic first-element-seed rule below.
      { case l :: f :: Nil if l.trim.toLowerCase.startsWith("list_prepend") =>
          val t = l.trim
          splitArgs(t, "list_prepend".length) match {
            case Some((end, z :: inner :: Nil))
                if t.substring(end).trim.isEmpty &&
                   z.trim.toUpperCase.startsWith("CAST(") =>
              Some(s"aggregate(($inner), ($z), $f)")
            case _ => None
          }
        case _ => None })
    s = rewriteCalls(s, "list_prepend",
      { case e :: l :: Nil => Some(s"concat(array($e), $l)"); case _ => None })
    s = rewriteCalls(s, "list_reduce", // DuckDB seeds with the first element
      { case l :: f :: Nil =>
          Some(s"reduce(slice(($l), 2, size($l)), element_at(($l), 1), $f)")
        case _ => None })
    s = lateralUnnest(s)
    s = rewriteCalls(s, "len", // DuckDB len() covers strings AND lists;
      // Spark splits size/length. String-typed shapes the corpus uses —
      // an array_to_string() result or the documents.text column — go to
      // length(); everything else falls through to the size() rename.
      { case a :: Nil
          if a.trim.toLowerCase.startsWith("array_to_string(") ||
             a.trim.toLowerCase.startsWith("regexp_replace(") ||
             a.trim.equalsIgnoreCase("text") || a.trim.equalsIgnoreCase("trim(text)") =>
          Some(s"length($a)")
        case _ => None })
    s = rewriteCalls(s, "dayofweek", // DuckDB: Sunday=0; Spark: Sunday=1
      { case a :: Nil => Some(s"(dayofweek($a) - 1)"); case _ => None })
    s = rewriteCalls(s, "log", // DuckDB 1-arg log() is log10; Spark's is ln
      { case a :: Nil => Some(s"log10($a)"); case _ => None })
    s = rewriteCalls(s, "list_sum", // parity catches any int-vs-double skew
      { case l :: Nil =>
          Some(s"aggregate(($l), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
        case _ => None })
    // the ZIPPED-generator idiom: DuckDB zips `generate_subscripts(x,1)-1`
    // and `unnest(x)` positionally in one select — Spark's posexplode is
    // that exact pair. Columns between the two stay put (the parity
    // harness compares columns by NAME, so reordering is safe); the
    // in-between group is identifier/comma-only so the match can never
    // jump a subquery boundary.
    s = mapNonString(s, SubscriptsUnnest.replaceAllIn(_, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"${m.group(3)}posexplode(${m.group(1)}) AS (${m.group(2)}, ${m.group(4)})")))
    s = rewriteCalls(s, "generate_subscripts",
      { case a :: d :: Nil if d.trim == "1" => Some(s"sequence(1, size($a))")
        case _ => None })
    s = mapNonString(s, _.replaceAll("(?i)\\bHUGEINT\\b", "BIGINT"))
    // the minhash LCG multiplier: DuckDB promotes INTEGER products to
    // BIGINT silently; Spark ANSI throws on the 32-bit overflow of
    // (2*seed+1) * 1103515245 — pin the constant wide
    s = mapNonString(s, _.replaceAll("\\b1103515245\\b", "CAST(1103515245 AS BIGINT)"))
    s = rewriteCalls(s, "list", orderedList)
    s = rewriteCalls(s, "quantile_cont", // DuckDB's interpolated quantile
      // == Spark's exact percentile (both linear-interpolate)
      { case x :: q :: Nil => Some(s"percentile(($x), ($q))"); case _ => None })
    s = rewriteCalls(s, "grouping", // multi-arg GROUPING bitmask: DuckDB's
      // GROUPING(a,b) == Spark's grouping_id(a,b) (same bit order,
      // rightmost arg = LSB); 1-arg grouping() parses natively
      { case args if args.size >= 2 =>
          Some(s"grouping_id(${args.mkString(",")})")
        case _ => None })
    s = hexCastToConv(s)
    s = rewriteCalls(s, "regexp_extract_all", // DuckDB's 2-arg form
      // returns FULL matches (group 0); Spark's defaults to group 1 and
      // throws on group-free patterns — pin the group explicitly
      { case a :: p :: Nil => Some(s"regexp_extract_all($a, $p, 0)")
        case _ => None })
    s = filterOverToCase(s)
    s = qualifyTopN(s)
    // DuckDB reads parquet straight from a quoted path; Spark spells it
    // with the format-qualified backtick identifier
    s = s.replaceAll("(?i)\\b(FROM|JOIN)\\s+'([^']+[.]parquet)'", "$1 parquet.`$2`")
    // the promote-to-fraction idiom `x * 1.0 / y`: DuckDB's `/` is true
    // (double) division, Spark's DECIMAL literal 1.0 forces decimal
    // division whose bounded scale truncates — keep it double
    s = mapNonString(s, _.replaceAll("\\*\\s*1\\.0\\s*/", "* CAST(1.0 AS DOUBLE) /"))
    // DuckDB puts IGNORE NULLS inside the call parens; Spark after them
    s = mapNonString(s, _.replaceAll("(?i)\\s+IGNORE\\s+NULLS\\s*\\)", ") IGNORE NULLS"))
    // ANSI double-quoted IDENTIFIERS in alias position: Spark spells
    // them with backticks ("O" would parse as a string literal or not
    // at all). Alias position only — a bare "x" elsewhere stays put.
    s = mapNonString(s, _.replaceAll("(?i)\\bAS\\s+\"([^\"]+)\"", "AS `$1`"))
    s = mapNonString(s, renamesAndDiv)
    s = rewriteBrackets(s)
    // AFTER rewriteBrackets (which spells v[r.range] as
    // try_element_at(v, nullif(range, 0))): the FROM range(...) TVF
    // column is BIGINT, Spark's element_at demands INT ordinals. Only a
    // column literally NAMED range is cast — a map key must NOT be.
    // The subscript reaches here already wrapped in the 0→NULL guard,
    // so the matcher must look THROUGH nullif(<ident>, 0).
    // DuckDB map subscripts yield a LIST of values (keys may repeat), so
    // the corpus spells "the value" as m['k'][1]. Spark's element_at on a
    // map returns the value directly — collapse the [1] layer. Only fires
    // when the inner subscript key is a string literal (which implies a
    // MAP base: a string subscript on a list is invalid DuckDB).
    s = rewriteCalls(s, "try_element_at",
      { case a :: b :: Nil
          if b.trim == "nullif(1, 0)" &&
             a.trim.toLowerCase.startsWith("try_element_at") =>
          splitArgs(a.trim, "try_element_at".length) match {
            case Some((end, _ :: key :: Nil))
                if a.trim.substring(end).trim.isEmpty &&
                   key.trim.startsWith("'") && key.trim.endsWith("'") =>
              Some(a.trim)
            case _ => None
          }
        case _ => None })
    for (fn <- Seq("element_at", "try_element_at"))
      s = rewriteCalls(s, fn,
        { case a :: b :: Nil =>
            val bare = b.trim match {
              case NullifIdent(x) => x
              case other          => other
            }
            if (bare.equalsIgnoreCase("range") ||
                bare.toLowerCase.endsWith(".range"))
              Some(s"$fn(($a), CAST(($b) AS INT))")
            else None
          case _ => None })
    if (s == sql) None else Some(s)
  }

  /** `WITH RECURSIVE … name(n, r) AS ( SELECT x, x FROM T  UNION
    * SELECT name.n, a.d FROM name JOIN rel a ON a.s = name.r ) …` →
    * K rounds of MIN-LABEL PROPAGATION over self-loop-augmented edges
    * (see the object Scaladoc) — the engine's own CC round, spelled as
    * ordinary chained CTEs.
    *
    * WHY not a literal accumulate-DISTINCT unroll: each such round
    * references the previous round TWICE (carry + extend), and Spark
    * inlines deterministic CTE references — the plan tree doubles per
    * round (measured: 290 → 2 306 explain lines from K=5 to K=8 on a
    * toy base; the real shingle chain OOMs the driver at K=10). The
    * label-propagation round references its predecessor ONCE, so the
    * inlined plan is a LINEAR chain of K join+min-aggregates over a
    * |V|-row relation — and it computes the same thing the recursion's
    * only consumer asks for:
    *
    * lab_0(v) = v;  lab_{i+1}(v) = min(lab_i(u) : u ∈ succ(v) ∪ {v})
    *           = min label reachable from v in ≤ i+1 steps,
    *
    * which equals min(r) GROUP BY n over the reachability closure for
    * every K ≥ diameter. The rewrite therefore fires ONLY when the
    * closure is consumed exactly that way: the sole reference to
    * `name` outside its definition must be a `SELECT n [AS …],
    * min(r) AS … FROM name GROUP BY n` block (the `comp` shape all
    * five CC oracles share). Any other consumer → no rewrite (stay
    * ledgered: a path-multiset consumer would need the true closure).
    * K = 10 covers any dup-family diameter by orders of magnitude;
    * the parity gate's hash compare is the loud check on K. */
  private def recursiveUnroll(sql: String, rounds: Int = 10): String = {
    if ("(?i)\\bWITH\\s+RECURSIVE\\b".r.findFirstIn(sql).isEmpty) return sql
    val RecDef = "(?s)\\b([A-Za-z_]\\w*)\\s*\\(([^()]*)\\)\\s+(?i:AS)\\s*\\(".r
    val q = java.util.regex.Pattern.quote(_: String)
    val hit = RecDef.findAllMatchIn(sql).flatMap { m =>
      val name = m.group(1)
      matchParen(sql, m.end - 1).flatMap { case (body, closeAt) =>
        val selfRef = ("(?i)\\b" + q(name) + "\\b").r.findFirstIn(body).isDefined
        val u = topLevelKw(body, "UNION", 0)
        val unionAll = u >= 0 &&
          body.substring(u + 5).trim.toUpperCase.startsWith("ALL")
        if (selfRef && u >= 0 && !unionAll)
          Some((name, m.group(2).trim, body, m.start, closeAt, u))
        else None
      }
    }.toList.headOption
    hit match {
      case None => sql
      case Some((name, cols, body, defStart, closeAt, u)) =>
        val colNames = cols.split(",").map(_.trim)
        if (colNames.length != 2) return sql
        val Seq(c1, c2) = colNames.toSeq
        val base = body.substring(0, u).trim
        val step = body.substring(u + 5).trim
        // base must seed every node with ITS OWN id: SELECT x, x FROM T
        val BaseRe = "(?is)^SELECT\\s+(\\w+)\\s*,\\s*\\1\\s+FROM\\s+(\\w+)$".r
        // step must extend the label column along one edge relation:
        // SELECT name.c1, a.d FROM name JOIN rel a ON a.s = name.c2
        val StepRe = ("(?is)^SELECT\\s+" + q(name) + "\\.(\\w+)\\s*,\\s*" +
          "(\\w+)\\.(\\w+)\\s+FROM\\s+" + q(name) +
          "\\s+JOIN\\s+(\\w+)\\s+(\\w+)\\s+ON\\s+" +
          "(\\w+)\\.(\\w+)\\s*=\\s*" + q(name) + "\\.(\\w+)$").r
        (BaseRe.findFirstMatchIn(base), StepRe.findFirstMatchIn(step)) match {
          case (Some(b), Some(s))
              if s.group(1) == c1 && s.group(8) == c2 &&
                s.group(2) == s.group(5) && s.group(5) == s.group(6) =>
            val seedCol = b.group(1); val seedTab = b.group(2)
            val rel = s.group(4); val dCol = s.group(3); val sCol = s.group(7)
            // the sole external consumer must be min(c2) per c1
            val remainder = sql.substring(0, defStart) +
              sql.substring(closeAt + 1)
            val refs = ("(?i)\\b" + q(name) + "\\b").r
              .findAllMatchIn(remainder).size
            val MinUse = ("(?is)SELECT\\s+" + q(c1) +
              "(?:\\s+AS\\s+\\w+)?\\s*,\\s*min\\(" + q(c2) +
              "\\)\\s+AS\\s+\\w+\\s+FROM\\s+" + q(name) +
              "\\s+GROUP\\s+BY\\s+" + q(c1)).r
            if (refs != 1 || MinUse.findFirstIn(remainder).isEmpty) return sql
            val sb = new StringBuilder
            sb ++= s"${name}__rel AS (SELECT $sCol AS __src, $dCol AS __dst " +
              s"FROM $rel UNION ALL SELECT $seedCol AS __src, " +
              s"$seedCol AS __dst FROM $seedTab)"
            sb ++= s", ${name}__r0 AS (SELECT $seedCol AS $c1, " +
              s"$seedCol AS $c2 FROM $seedTab)"
            for (i <- 1 to rounds)
              sb ++= s", ${name}__r$i AS (SELECT __e.__src AS $c1, " +
                s"min(__p.$c2) AS $c2 FROM ${name}__r${i - 1} __p " +
                s"JOIN ${name}__rel __e ON __e.__dst = __p.$c1 " +
                s"GROUP BY __e.__src)"
            sb ++= s", $name AS (SELECT $c1, $c2 FROM ${name}__r$rounds)"
            val out = sql.substring(0, defStart) + sb.result() +
              sql.substring(closeAt + 1)
            out.replaceAll("(?i)\\bWITH\\s+RECURSIVE\\b", "WITH")
          case _ => sql
        }
    }
  }

  /** Matching ')' for the '(' at offset `at`: (inner text, close index);
    * string-literal aware. */
  private def matchParen(sql: String, at: Int): Option[(String, Int)] = {
    var i = at + 1
    var depth = 1
    var inStr = false
    val inner = new StringBuilder
    while (i < sql.length && depth > 0) {
      val c = sql(i)
      if (inStr) { inner += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inner += c; inStr = true
        case '('  => depth += 1; inner += c
        case ')'  => depth -= 1; if (depth > 0) inner += c
        case _    => inner += c
      }
      i += 1
    }
    if (depth == 0) Some((inner.result(), i - 1)) else None
  }

  /** The last identifier/keyword ending directly before offset `at`
    * (skipping whitespace); empty if none. */
  private def lastWordBefore(txt: String, at: Int): String = {
    var j = at - 1
    while (j >= 0 && txt(j).isWhitespace) j -= 1
    val end = j + 1
    while (j >= 0 && (txt(j).isLetterOrDigit || txt(j) == '_')) j -= 1
    txt.substring(j + 1, end)
  }

  // ---- reader table functions (read_csv / read_json) ---------------------

  /** Split on top-level commas: quotes, parens and braces all shield. */
  private def splitTopArgs(inner: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    inner.foreach { c =>
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\''              => cur += c; inStr = true
        case '(' | '{' | '['  => depth += 1; cur += c
        case ')' | '}' | ']'  => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case _                 => cur += c
      }
    }
    out += cur.result()
    out.toList
  }

  /** DuckDB type name → Spark SQL type text; None = unmapped (leave the
    * whole reader call alone). STRUCT(a T, b U) recurses to
    * STRUCT<`a`: T', `b`: U'>. */
  private def sparkTypeOf(t: String): Option[String] = {
    val tt = t.trim
    val up = tt.toUpperCase
    if (up.startsWith("STRUCT(") && tt.endsWith(")")) {
      val fields = splitTopArgs(tt.substring(7, tt.length - 1)).map { f =>
        val ft = f.trim
        val sp = ft.indexOf(' ')
        if (sp < 0) return None
        sparkTypeOf(ft.substring(sp + 1)) match {
          case Some(st) => s"`${ft.substring(0, sp).trim}`: $st"
          case None     => return None
        }
      }
      Some(s"STRUCT<${fields.mkString(", ")}>")
    } else up match {
      case "INTEGER" | "INT" | "INT4"    => Some("INT")
      case "BIGINT" | "INT8"             => Some("BIGINT")
      case "SMALLINT" | "INT2"           => Some("SMALLINT")
      case "TINYINT" | "INT1"            => Some("TINYINT")
      case "VARCHAR" | "TEXT" | "STRING" => Some("STRING")
      case "DOUBLE" | "FLOAT8"           => Some("DOUBLE")
      case "FLOAT" | "REAL" | "FLOAT4"   => Some("FLOAT")
      case "BOOLEAN" | "BOOL"            => Some("BOOLEAN")
      case "DATE"                        => Some("DATE")
      case "TIMESTAMP"                   => Some("TIMESTAMP")
      case d if d.startsWith("DECIMAL")  => Some(d)
      case _                             => None
    }
  }

  private val ColPair = """(?s)^\s*'([^']*)'\s*:\s*'([^']*)'\s*$""".r

  /** One `read_csv`/`read_json` occurrence → the casting subquery
    * described in the scaladoc; unchanged if any part is outside the
    * conservative grammar. Recurses over later occurrences. */
  private def readerTables(sql: String, fn: String): String = {
    val lower = sql.toLowerCase
    var from = 0
    var at = -1
    // first occurrence at a word boundary, outside string literals
    // (cheap scan: reader calls never appear inside the corpus' quoted
    // literals, and a quoted hit just fails matchParen's grammar below)
    while (at < 0 && { at = lower.indexOf(fn + "(", from); at >= 0 } &&
        at > 0 && (sql(at - 1).isLetterOrDigit || sql(at - 1) == '_')) {
      from = at + 1; at = -1
    }
    if (at < 0) return sql
    matchParen(sql, at + fn.length) match {
      case None => sql
      case Some((inner, close)) =>
        val tail = readerTables(sql.substring(close + 1), fn)
        rewriteReader(fn, inner) match {
          case Some(rw) => sql.substring(0, at) + rw + tail
          case None     => sql.substring(0, close + 1) + tail
        }
    }
  }

  private def rewriteReader(fn: String, inner: String): Option[String] = {
    val args = splitTopArgs(inner).map(_.trim)
    if (args.isEmpty) return None
    val path = args.head match {
      case p if p.length >= 2 && p.head == '\'' && p.last == '\'' &&
          !p.substring(1, p.length - 1).contains('\'') =>
        p.substring(1, p.length - 1)
      case _ => return None
    }
    var header = false
    var ndjson = false
    var cols: Option[List[(String, String)]] = None
    args.tail.foreach { opt =>
      val eq = opt.indexOf('=')
      if (eq < 0) return None
      val key = opt.substring(0, eq).trim.toLowerCase
      val v = opt.substring(eq + 1).trim
      key match {
        case "header" if v.equalsIgnoreCase("true") => header = true
        case "format" if v.equalsIgnoreCase("'newline_delimited'") =>
          ndjson = true
        case "columns" if v.startsWith("{") && v.endsWith("}") =>
          val pairs = splitTopArgs(v.substring(1, v.length - 1)).map {
            case ColPair(n, t) => sparkTypeOf(t) match {
              case Some(st) => (n, st)
              case None     => return None
            }
            case _ => return None
          }
          if (pairs.isEmpty) return None
          cols = Some(pairs)
        case _ => return None // unknown option: stay conservative
      }
    }
    cols.map { fields =>
      if (fn == "read_csv") {
        val sel = fields.zipWithIndex
          .map { case ((n, st), i) => s"CAST(_c$i AS $st) AS `$n`" }
          .mkString(", ")
        val where =
          if (header) s" WHERE NOT (_c0 <=> '${fields.head._1}')" else ""
        s"(SELECT $sel FROM csv.`$path`$where)"
      } else { // read_json: Spark's json source is NDJSON by default,
        // matching format = 'newline_delimited' (and absent-format)
        val _ = ndjson
        val sel = fields
          .map { case (n, st) => s"CAST(`$n` AS $st) AS `$n`" }
          .mkString(", ")
        s"(SELECT $sel FROM json.`$path`)"
      }
    }
  }

  // ---- rule bodies -------------------------------------------------------

  private val PosIntLit = """^\s*(\d+)\s*$""".r

  /** `generate_subscripts(X, 1) - 1 AS d, …, unnest(X) AS v` — the two
    * positionally-zipped generators DuckDB allows in one select list;
    * rewritten as one `posexplode(X) AS (d, v)`. The in-between group
    * admits only bare column refs/commas/whitespace. */
  private val SubscriptsUnnest =
    ("""(?is)generate_subscripts\(\s*([A-Za-z_][\w.]*)\s*,\s*1\s*\)\s*-\s*1""" +
      """\s+AS\s+(\w+)\s*,([\s\w,.]*?)unnest\(\s*\1\s*\)\s+AS\s+(\w+)""").r

  /** The rewriteBrackets 0→NULL guard around a bare (dotted) identifier:
    * `nullif(r.range, 0)` → `r.range`. Conservative — anything else
    * (expressions, nested calls) stays opaque. */
  private val NullifIdent =
    """(?i)^nullif\(\s*([A-Za-z_][A-Za-z0-9_.]*)\s*,\s*0\s*\)$""".r

  private def rangeToSequence(args: List[String]): Option[String] = args match {
    case a :: Nil      => Some(s"sequence(0, ($a) - 1)")
    case a :: b :: Nil => Some(s"sequence(($a), ($b) - 1)")
    case a :: b :: PosIntLit(st) :: Nil =>
      // positive literal step: largest element ≤ b-1 in steps of st from a
      // — identical to DuckDB's end-exclusive stepped range
      Some(s"sequence(($a), ($b) - 1, $st)")
    case _ => None // negative/non-literal step: bound direction unknown
  }

  private val RegexMeta = "\\^$.|?*+()[]{}".toSet

  private def stringSplit(args: List[String]): Option[String] = args match {
    case s :: sep :: Nil =>
      val t = sep.trim
      if (t.length >= 2 && t.head == '\'' && t.last == '\'' && !t.drop(1).dropRight(1).contains('\'')) {
        val lit = t.drop(1).dropRight(1)
        // regex-escape the literal separator; backslash is doubled again
        // for Spark's string-literal escaping ('\\.' parses to \.)
        val esc = lit.flatMap(c => if (RegexMeta(c)) s"\\\\$c" else c.toString)
        Some(s"split($s, '$esc')")
      } else t match {
        // chr(N) separator: the produced char reaches Spark's split as a
        // regex — safe verbatim iff that codepoint is not a regex
        // metacharacter (control chars like the chr(1) BPE joiner are)
        case ChrCall(n) if n.toInt < 128 && !RegexMeta(n.toInt.toChar) =>
          Some(s"split($s, $t)")
        case _ => None // non-literal separator: can't regex-escape textually
      }
    case _ => None
  }

  private val ChrCall = """(?i)^chr\(\s*(\d+)\s*\)$""".r

  /** strftime %-codes → java.time pattern letters (the subset the corpus
    * uses; an unmapped % code vetoes the rewrite). */
  private val PctCodes = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'H' -> "HH",
    'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'j' -> "DDD", 'a' -> "EEE",
    'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM", 'p' -> "a", '%' -> "%",
    'f' -> "SSSSSS") // DuckDB %f = 6-digit microseconds, zero-padded

  private def timeFormat(target: String)(args: List[String]): Option[String] =
    args match {
      case x :: fmt :: Nil =>
        val t = fmt.trim
        if (t.length >= 2 && t.head == '\'' && t.last == '\'') {
          val lit = t.drop(1).dropRight(1)
          val out = new StringBuilder
          var i = 0
          var ok = true
          while (i < lit.length && ok) {
            if (lit(i) == '%' && i + 1 < lit.length) {
              PctCodes.get(lit(i + 1)) match {
                case Some(p) => out ++= p; i += 2
                case None    => ok = false
              }
            } else if (lit(i).isLetter) {
              // bare letters are literals in strftime but pattern letters
              // in java.time — quote them
              out ++= s"'${lit(i)}'"; i += 1
            } else { out += lit(i); i += 1 }
          }
          if (ok) Some(s"$target($x, '${out.result()}')") else None
        } else None
      case _ => None
    }

  private def listSlice(args: List[String]): Option[String] = args match {
    case x :: a :: b :: Nil => Some(s"slice($x, ($a), ($b) - ($a) + 1)")
    case _                  => None
  }

  /** DuckDB datediff/date_diff('day', start, end) → Spark's 2-arg
    * datediff(end, start) — both count day-boundary crossings on DATE
    * inputs. Only the 'day' unit appears in the corpus; other units
    * (where boundary-count vs complete-period semantics diverge
    * between the engines) veto the rewrite. */
  private def dateDiffDay(args: List[String]): Option[String] = args match {
    case u :: a :: b :: Nil if u.trim.equalsIgnoreCase("'day'") =>
      Some(s"datediff(($b), ($a))")
    case _ => None
  }

  private val IntervalLit = """(?i)^\s*INTERVAL\s+'?(\d+)'?\s+(\w+?)S?\s*$""".r

  /** DuckDB time_bucket(INTERVAL n unit, ts) → epoch-floor arithmetic:
    * timestamp_micros((unix_micros(ts) DIV P) * P). DuckDB's bucket
    * origin is 2000-01-01, which sits on an exact hour/minute/second/day
    * boundary of the unix epoch, so for these units the two origins
    * yield identical buckets (month-based intervals don't, and veto). */
  private def timeBucket(args: List[String]): Option[String] = args match {
    case iv :: ts :: Nil =>
      iv.trim match {
        case IntervalLit(n, unit) =>
          val perUnit: Option[Long] = unit.toLowerCase match {
            case "second" => Some(1000000L)
            case "minute" => Some(60L * 1000000L)
            case "hour"   => Some(3600L * 1000000L)
            case "day"    => Some(86400L * 1000000L)
            case _        => None
          }
          perUnit.map { u =>
            val p = n.toLong * u
            s"timestamp_micros((unix_micros($ts) DIV ${p}L) * ${p}L)"
          }
        case _ => None
      }
    case _ => None
  }

  private val OrderBy = "(?i)\\bORDER\\s+BY\\b".r

  /** DuckDB's in-call ordered aggregate `string_agg(x, sep ORDER BY o)`
    * → Spark 4's `string_agg(x, sep) WITHIN GROUP (ORDER BY o)`.
    * Unordered string_agg is left alone: it parses on both engines but
    * the concatenation order is nondeterministic, so parity would be
    * noise, not signal. */
  private def orderedStringAgg(args: List[String]): Option[String] = {
    val joined = args.mkString(",")
    OrderBy.findFirstMatchIn(joined).map { m =>
      val before = joined.substring(0, m.start).trim
      val order = joined.substring(m.end).trim
      s"string_agg($before) WITHIN GROUP (ORDER BY $order)"
    }
  }

  /** DuckDB's ordered list aggregate `list(x ORDER BY k1, k2)` → sort an
    * array of (keys…, value) structs and project the value back out:
    * `transform(array_sort(array_agg(named_struct('k0', k1, …, 'v', x))),
    * s -> s.v)` — array_sort on structs compares fields in declaration
    * order, which IS the ORDER BY. DESC keys and unordered `list()`
    * (nondeterministic concat order — parity would be noise) veto. */
  private def orderedList(args: List[String]): Option[String] = {
    val joined = args.mkString(",")
    OrderBy.findFirstMatchIn(joined).flatMap { m =>
      val value = joined.substring(0, m.start).trim
      val keys = joined.substring(m.end).split(",").map(_.trim).toList
      if (keys.exists(_.toUpperCase.endsWith(" DESC")) ||
          value.toUpperCase.contains(" ORDER ")) None
      else {
        val kvs = keys.zipWithIndex
          .map { case (k, i) => s"'k$i', ($k)" }.mkString(", ")
        Some(s"transform(array_sort(array_agg(named_struct($kvs, 'v', ($value)))), s -> s.v)")
      }
    }
  }

  private val QualifyRn =
    """(?is)FROM\s+(\w+)\s+QUALIFY\s+(row_number\(\)\s+OVER\s*\([^)]*\))\s*<=\s*(\d+)""".r

  /** The one QUALIFY shape the corpus uses — `FROM t QUALIFY
    * row_number() OVER (…) <= n` — becomes the standard subquery
    * spelling (Spark has no QUALIFY clause). */
  /** DuckDB's md5-prefix integerization `('0x' || hex)::BIGINT` (and the
    * `CAST(… AS BIGINT)` spelling): Spark's CAST rejects 0x-prefixed
    * strings at runtime, but `conv(hex, 16, 10)` is its native base-16
    * read — exact up to 2^64, and the corpus's 15-hex-digit (60-bit)
    * md5 prefixes are well inside that. */
  private val Hex0x = """\(\s*'0x'\s*\|\|""".r
  private def hexCastToConv(sql: String): String = {
    val ms = Hex0x.findAllMatchIn(sql).toList
    ms.reverse.foldLeft(sql) { (s, m) =>
      splitArgs(s, m.start) match {
        case Some((end, arg :: Nil)) =>
          val expr = arg.trim.stripPrefix("'0x'").trim.stripPrefix("||")
          var j = end
          while (j < s.length && s(j).isWhitespace) j += 1
          if (s.regionMatches(true, j, "::BIGINT", 0, 8))
            s.substring(0, m.start) +
              s"CAST(conv($expr, 16, 10) AS BIGINT)" + s.substring(j + 8)
          else if (s.regionMatches(true, j, "AS BIGINT", 0, 9)) {
            // the CAST(('0x' || E) AS BIGINT) spelling: verify the inner
            // group is CAST's own argument, then swap the whole CAST
            var k = m.start - 1
            while (k >= 0 && s(k).isWhitespace) k -= 1
            if (k >= 0 && s(k) == '(') {
              var c = k - 1
              while (c >= 0 && s(c).isWhitespace) c -= 1
              if (c >= 3 && s.regionMatches(true, c - 3, "CAST", 0, 4)) {
                var e2 = j + 9
                while (e2 < s.length && s(e2).isWhitespace) e2 += 1
                if (e2 < s.length && s(e2) == ')')
                  s.substring(0, c - 3) +
                    s"CAST(conv($expr, 16, 10) AS BIGINT)" +
                    s.substring(e2 + 1)
                else s
              } else s
            } else s
          } else s
        case _ => s
      }
    }
  }

  /** `AGG(args) FILTER (WHERE cond) OVER …` → `AGG(CASE WHEN cond THEN
    * args END) OVER …`. Spark's SQL supports the FILTER clause on plain
    * aggregates but rejects it on WINDOW aggregates ("Window aggregate
    * function with filter predicate is not supported yet"); the CASE
    * form is the standard equivalent — the aggregate sees exactly the
    * qualifying rows (count(*) counts a non-null marker). Non-window
    * FILTER is left alone. Allow-listed aggregates only; any shape the
    * backward call scan can't prove is left unchanged. */
  private def filterOverToCase(sql: String): String = {
    val aggs = Set("count", "sum", "avg", "min", "max")
    callSites(sql, "FILTER").sortBy(-(_: Int)).foldLeft(sql) { (s, at) =>
      splitArgs(s, at + "FILTER".length) match {
        case Some((fEnd, fArgs)) if fArgs.nonEmpty &&
            fArgs.mkString(",").trim.toUpperCase.startsWith("WHERE") =>
          val cond = fArgs.mkString(",").trim.drop(5)
          var j = fEnd
          while (j < s.length && s(j).isWhitespace) j += 1
          if (!s.regionMatches(true, j, "OVER", 0, 4)) s
          else {
            // backward: ... name ( args ) FILTER — balance the call parens
            var k = at - 1
            while (k >= 0 && s(k).isWhitespace) k -= 1
            if (k < 0 || s(k) != ')') s
            else {
              var depth = 0; var m = k
              while (m >= 0 && {
                val c = s(m)
                if (c == ')') depth += 1 else if (c == '(') depth -= 1
                depth != 0
              }) m -= 1
              if (m < 0) s
              else {
                val argStr = s.substring(m + 1, k)
                var e = m - 1
                while (e >= 0 && s(e).isWhitespace) e -= 1
                var b = e
                while (b >= 0 && (s(b).isLetterOrDigit || s(b) == '_')) b -= 1
                val fname = s.substring(b + 1, e + 1).toLowerCase
                if (!aggs(fname)) s
                else {
                  val newArg =
                    if (fname == "count" && argStr.trim == "*")
                      s"CASE WHEN $cond THEN 1 END"
                    else s"CASE WHEN $cond THEN $argStr END"
                  s.substring(0, b + 1) + s"$fname($newArg)" + s.substring(fEnd)
                }
              }
            }
          }
        case _ => s
      }
    }
  }

  private def qualifyTopN(sql: String): String =
    QualifyRn.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"FROM (SELECT *, ${m.group(2)} AS __qrn FROM ${m.group(1)}) WHERE __qrn <= ${m.group(3)}"))

  /** Function renames, applied only in call position (`name(`) so a
    * column that happens to share a short name (`len`, `epoch`) is never
    * touched. */
  private val CallRenames = List(
    "list_zip" -> "arrays_zip",      // zipped structs; fields "0","1" —
                                     // positional struct_extract maps onto
                                     // them (rule in toSpark)
    "list_transform" -> "transform",
    "list_filter" -> "filter",
    "list_distinct" -> "array_distinct",
    "list_contains" -> "array_contains",
    "list_value" -> "array",
    "list_append" -> "array_append",
    "list_concat" -> "concat",
    "list_sort" -> "array_sort",
    "unnest" -> "explode",
    "epoch" -> "unix_timestamp",
    "json_extract_string" -> "get_json_object",
    "string_split_regex" -> "split", // both take a regex separator
    "strpos" -> "instr",             // 1-based, 0 when absent, on both
    "to_base64" -> "base64",
    "from_base64" -> "unbase64",
    "round_even" -> "bround",        // half-even rounding on both
    "array_to_string" -> "array_join",
    "list_intersect" -> "array_intersect",
    "list_position" -> "array_position", // 1-based on both when found
    "list_max" -> "array_max",
    "list_min" -> "array_min",
    "list_reverse" -> "reverse",
    "jaro_winkler_similarity" -> "jaro_winkler", // the injected Graft fn
    "len" -> "size")

  private def renamesAndDiv(seg: String): String = {
    var s = seg.replace("//", " DIV ")
    CallRenames.foreach { case (from, to) =>
      s = s.replaceAll(s"(?i)\\b$from(\\s*\\()", s"$to$$1")
    }
    // sized-type-only in Spark: CAST(x AS VARCHAR) — DuckDB's unsized
    // spelling — becomes STRING (same type, no length cap)
    s.replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING")
  }

  /** `[a, b]` → `array(a, b)` in literal position only. A `[` directly
    * after an identifier, `)`, `]` or a string literal is a subscript
    * (1-based in DuckDB, 0-based in Spark) and is left untouched so the
    * parser rejects it instead of silently shifting indices. Works on a
    * non-string segment, so quote states don't occur here. */
  private val CrossJoinUnnest = "(?i)\\bCROSS\\s+JOIN\\s+UNNEST\\s*\\(".r
  private val AsAlias = "(?i)^\\s*AS\\s+(\\w+)\\s*\\(\\s*(\\w+)\\s*\\)".r

  /** DuckDB's lateral `CROSS JOIN UNNEST(expr) AS t(c)` → Spark's
    * `LATERAL VIEW explode(expr) t AS c` (same row-multiplying lateral
    * semantics; Spark's parser only accepts the LATERAL VIEW spelling
    * and binds the preceding relations' columns in `expr` either way). */
  private def lateralUnnest(sql: String): String = {
    val ms = CrossJoinUnnest.findAllMatchIn(sql).toList
    ms.reverse.foldLeft(sql) { (s, m) =>
      splitArgs(s, s.indexOf('(', m.start)) match {
        case Some((argEnd, expr :: Nil)) =>
          AsAlias.findFirstMatchIn(s.substring(argEnd)) match {
            case Some(a) =>
              s.substring(0, m.start) +
                s"LATERAL VIEW explode($expr) ${a.group(1)} AS ${a.group(2)}" +
                s.substring(argEnd + a.end)
            case None => s
          }
        case _ => s
      }
    }
  }

  /** Index of the single top-level `:` in a bracket body, if any
    * (outside quotes/parens/brackets); two or more colons veto. */
  private def topLevelColon(inner: String): Option[Int] = {
    var i = 0; var depth = 0; var inStr = false
    var found = List.empty[Int]
    while (i < inner.length) {
      val c = inner(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\''             => inStr = true
        case '(' | '['        => depth += 1
        case ')' | ']'        => depth -= 1
        case ':' if depth == 0 => found ::= i
        case _                =>
      }
      i += 1
    }
    found match { case one :: Nil => Some(one); case _ => None }
  }

  /** Words after which a `[` is a literal, not a subscript, even though
    * they end in an identifier character. */
  private val PreBracketKeywords = Set(
    "IN", "THEN", "ELSE", "WHEN", "SELECT", "AND", "OR", "NOT", "ON",
    "AS", "BETWEEN", "IS", "LIKE", "VALUES", "DISTINCT", "ALL", "BY",
    "WHERE", "HAVING", "RETURN", "UNION", "EXCEPT", "INTERSECT")

  private val SliceIdx = """^\s*(\d+)\s*:\s*(\d+)\s*$""".r

  private val StructPackArg = """^(\w+)\s*:=\s*((?s).+)$""".r

  /** `SELECT a, b FROM … UNION ALL BY NAME SELECT c, a FROM …` with BARE
    * column-name select lists on both sides → plain UNION ALL with both
    * lists rewritten to the aligned union of names (left order first,
    * right-only names appended; missing names become NULL) — DuckDB's
    * by-name semantics made positional. Anything fancier (expressions,
    * stars, aliases) is left for the parser to reject. */
  private val UnionByName =
    ("""(?is)SELECT\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s+(FROM\s+.*?)\s+""" +
      """UNION\s+ALL\s+BY\s+NAME\s+""" +
      """SELECT\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s+FROM""").r

  private def unionAllByName(sql: String): String =
    UnionByName.replaceAllIn(sql, m => {
      val left = m.group(1).split(",").map(_.trim).toList
      val right = m.group(3).split(",").map(_.trim).toList
      val out = left ++ right.filterNot(left.contains)
      def list(have: List[String]) =
        out.map(c => if (have.contains(c)) c else s"NULL AS $c").mkString(", ")
      scala.util.matching.Regex.quoteReplacement(
        s"SELECT ${list(left)} ${m.group(2)} UNION ALL SELECT ${list(right)} FROM")
    })

  /** DuckDB's struct/map brace literal `MAP {'k': v, …}` → `map('k', v, …)`
    * (string-literal keys only; nested braces or non-literal keys veto). */
  private def mapBraceLiteral(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (inStr) { out += c; if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { out += c; inStr = true; i += 1 }
      else if (sql.regionMatches(true, i, "MAP", 0, 3) &&
          (i == 0 || (!sql(i - 1).isLetterOrDigit && sql(i - 1) != '_'))) {
        var j = i + 3
        while (j < sql.length && sql(j).isWhitespace) j += 1
        if (j < sql.length && sql(j) == '{') {
          // scan to the matching '}' (quote-aware, no nesting support)
          var k = j + 1
          var inS = false
          var ok = true
          val inner = new StringBuilder
          while (k < sql.length && (inS || sql(k) != '}')) {
            val ch = sql(k)
            if (inS) { if (ch == '\'') inS = false }
            else if (ch == '\'') inS = true
            else if (ch == '{') ok = false
            inner += ch
            k += 1
          }
          if (ok && k < sql.length) {
            val entries = splitArgs("(" + inner.result() + ")", 0)
            val kvs = entries.map(_._2.flatMap { e =>
              topLevelKw2(e, ':') match {
                case -1 => Nil
                case at => List(e.substring(0, at).trim, e.substring(at + 1).trim)
              }
            })
            kvs match {
              case Some(parts) if parts.nonEmpty && parts.size % 2 == 0 &&
                  parts.grouped(2).forall(p => p.head.startsWith("'")) =>
                out ++= s"map(${parts.mkString(", ")})"
                i = k + 1
              case _ => out += c; i += 1
            }
          } else { out += c; i += 1 }
        } else { out += c; i += 1 }
      } else { out += c; i += 1 }
    }
    out.result()
  }

  /** First top-level (paren/bracket/quote-aware) occurrence of char `ch`. */
  private def topLevelKw2(txt: String, ch: Char): Int = {
    var i = 0
    var depth = 0
    var inStr = false
    while (i < txt.length) {
      val c = txt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\''      => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case x if x == ch && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** First occurrence of keyword `kw` in `txt` (from `from`) at TOP level
    * — depth 0 w.r.t. both parens and brackets, outside string literals,
    * whitespace-delimited. -1 if none. */
  private def topLevelKw(txt: String, kw: String, from: Int): Int = {
    var i = math.max(from, 0)
    var depth = 0
    var inStr = false
    while (i < txt.length) {
      val c = txt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else c match {
        case '\''       => inStr = true; i += 1
        case '(' | '['  => depth += 1; i += 1
        case ')' | ']'  => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && txt.regionMatches(true, i, kw, 0, kw.length) &&
              i > 0 && txt(i - 1).isWhitespace &&
              i + kw.length < txt.length && txt(i + kw.length).isWhitespace)
            return i
          i += 1
      }
    }
    -1
  }

  /** Parse a bracket's inner text as the DuckDB list comprehension
    * `expr FOR v IN list [IF cond]`. The FOR/IN/IF keywords must sit at
    * top level — the lazy regex alone would grab a NESTED comprehension's
    * FOR when the bracket is really a list LITERAL whose elements contain
    * comprehensions (the LSH plane-fold texts), splicing garbage. */
  private def parseComprehension(
      inner: String): Option[(String, String, String, Option[String])] = {
    val f = topLevelKw(inner, "FOR", 0)
    if (f < 0) return None
    val at = topLevelKw(inner, "IN", f + 3)
    if (at < 0) return None
    val expr = inner.substring(0, f).trim
    val v = inner.substring(f + 3, at).trim
    if (expr.isEmpty || !v.matches("[A-Za-z_]\\w*")) return None
    val rest = inner.substring(at + 2)
    topLevelKw(rest, "IF", 0) match {
      case -1 => Some((expr, v, rest.trim, None))
      case c  => Some((expr, v, rest.substring(0, c).trim,
                       Some(rest.substring(c + 2).trim)))
    }
  }

  /** Bracket constructs, in one quote-aware pass over the whole text
    * (a list literal's `[` and `]` may straddle string elements, so this
    * cannot run segment-wise):
    *
    *   - literal position `[a, b]` → `array(a, b)`
    *   - `ident[lo:hi]` (digit bounds) → `slice(ident, lo, hi-lo+1)` —
    *     DuckDB slices are 1-based with inclusive end, Spark's slice is
    *     1-based with a length
    *   - `ident[k]` → `element_at(ident, k)` — 1-based on both engines
    *     (Spark's raw `[k]` subscript is 0-based, so it is never kept)
    *   - any other subscript shape is left untouched for the parser
    */
  private def rewriteBrackets(sql: String): String = {
    val out = new StringBuilder
    var stack = List.empty[Boolean] // true: '[' became array( → close with ')'
    var i = 0
    var inStr = false
    def lastNonSpace: Char = {
      var j = out.length - 1
      while (j >= 0 && out(j).isWhitespace) j -= 1
      if (j >= 0) out(j) else ' '
    }
    // start of the trailing subscriptable base in `out`: a simple
    // (possibly dotted) identifier, optionally with ONE trailing balanced
    // call-argument group — so both `tokens[i]` and
    // `string_split(a.name, ' ')[1]` resolve (a paren-ended base left
    // unresolved would fall through as Spark's 0-based raw subscript:
    // a silent off-by-one, the one thing this pass must never produce)
    def identStart: Int = {
      var j = out.length - 1
      if (j >= 0 && out(j) == ')') {
        var depth = 1
        var inS = false
        j -= 1
        while (j >= 0 && depth > 0) {
          val ch = out(j)
          if (inS) { if (ch == '\'') inS = false }
          else ch match {
            case '\'' => inS = true
            case ')'  => depth += 1
            case '('  => depth -= 1
            case _    =>
          }
          j -= 1
        }
        if (depth > 0) return out.length // unbalanced: no safe base
      }
      while (j >= 0 && (out(j).isLetterOrDigit || out(j) == '_' || out(j) == '.')) j -= 1
      j + 1
    }
    while (i < sql.length) {
      val c = sql(i)
      if (inStr) { out += c; if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { out += c; inStr = true; i += 1 }
      else c match {
        case '[' =>
          val kw = PreBracketKeywords.contains(
            lastWordBefore(out.result(), out.length).toUpperCase)
          val prev = lastNonSpace
          val subscript = !kw && (prev.isLetterOrDigit || prev == '_' ||
            prev == ')' || prev == ']' || prev == '\'')
          if (!subscript) {
            // DuckDB list comprehension [expr FOR x IN list [IF cond]]
            matchBracket(sql, i) match {
              case Some((inner, end)) if parseComprehension(inner).isDefined =>
                val (expr, v, list, cond) = parseComprehension(inner).get
                val src = cond match {
                  case None => rewriteBrackets(list)
                  case Some(c) =>
                    s"filter(${rewriteBrackets(list)}, $v -> ${rewriteBrackets(c)})"
                }
                out ++= s"transform($src, $v -> ${rewriteBrackets(expr)})"
                i = end + 1
              case _ => out ++= "array("; stack ::= true; i += 1
            }
          }
          else matchBracket(sql, i) match {
            case Some((inner, end))
                if identStart < out.length && !inner.contains('[') =>
              val b = identStart
              val base = out.substring(b)
              (inner, topLevelColon(inner)) match {
                case (SliceIdx(lo, hi), _) =>
                  out.setLength(b)
                  out ++= s"slice($base, $lo, ${hi.toInt - lo.toInt + 1})"
                case (_, Some(c)) =>
                  // expr slice a:b — 1-based inclusive end on DuckDB,
                  // 1-based start+length on Spark; DuckDB's open ends
                  // ([a:] = to end, [:b] = from start) map to
                  // size(base) / start 1
                  val (lo0, hi0) = (inner.substring(0, c), inner.substring(c + 1))
                  val lo = if (lo0.trim.isEmpty) "1" else lo0
                  out.setLength(b)
                  if (hi0.trim.isEmpty)
                    out ++= s"slice($base, ($lo), size($base))"
                  else
                    out ++= s"slice($base, ($lo), ($hi0) - ($lo) + 1)"
                case _ =>
                  // try_element_at: DuckDB subscripts yield NULL out of
                  // bounds AND at index 0; Spark throws for both, and
                  // try_element_at still throws on literal 0 — a NULLIF
                  // guard restores DuckDB's 0→NULL (string map keys keep
                  // the bare form: NULLIF('k', 0) would not type-check)
                  out.setLength(b)
                  val idx = if (inner.trim.startsWith("'")) inner
                            else s"nullif($inner, 0)"
                  out ++= s"try_element_at($base, $idx)"
              }
              i = end + 1
            case _ => out += '['; stack ::= false; i += 1
          }
        case ']' if stack.nonEmpty =>
          out += (if (stack.head) ')' else ']'); stack = stack.tail; i += 1
        case _ => out += c; i += 1
      }
    }
    out.result()
  }

  /** From `sql(at) == '['`, the bracket's inner text and the index of the
    * matching `]` (quote- and nesting-aware). */
  private def matchBracket(sql: String, at: Int): Option[(String, Int)] = {
    var i = at + 1
    var depth = 1
    var inStr = false
    val inner = new StringBuilder
    while (i < sql.length && depth > 0) {
      val c = sql(i)
      if (inStr) { inner += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inner += c; inStr = true
        case '['  => depth += 1; inner += c
        case ']'  => depth -= 1; if (depth > 0) inner += c
        case _    => inner += c
      }
      i += 1
    }
    if (depth == 0) Some((inner.result(), i - 1)) else None
  }

  // ---- quote/paren-aware machinery --------------------------------------

  /** Apply `f` to the CONTENT of each single-quoted string literal
    * ('' escapes are preserved as-is and not passed through `f`). */
  private def mapInString(sql: String, f: String => String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (!inStr && c == '\'') { out += c; inStr = true }
      else if (inStr && c == '\'') {
        if (i + 1 < sql.length && sql(i + 1) == '\'') { lit ++= "''"; i += 1 }
        else { out ++= f(lit.result()); lit.clear(); out += c; inStr = false }
      } else if (inStr) lit += c
      else out += c
      i += 1
    }
    out ++= lit.result() // unterminated literal: emit as-is
    out.result()
  }

  /** Apply `f` to the text outside single-quoted string literals,
    * segment by segment ('' escapes stay inside their literal). */
  private def mapNonString(sql: String, f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (!inStr && c == '\'') {
        out ++= f(seg.result()); seg.clear()
        out += c; inStr = true
      } else if (inStr && c == '\'') {
        out += c
        if (i + 1 < sql.length && sql(i + 1) == '\'') { out += '\''; i += 1 }
        else inStr = false
      } else if (inStr) out += c
      else seg += c
      i += 1
    }
    out ++= f(seg.result())
    out.result()
  }

  /** Rewrite every call of `name` (matched outside string literals, word
    * boundary on the left) whose argument list `rule` accepts; balanced
    * parens and quoted commas are respected. Rightmost-first so earlier
    * indices stay valid, which also handles nesting (inner calls were
    * already rewritten by an earlier rule pass). */
  private def rewriteCalls(sql: String, name: String,
      rule: List[String] => Option[String],
      allow: (String, Int) => Boolean = (_, _) => true): String = {
    val starts = callSites(sql, name)
    starts.sortBy(-_).foldLeft(sql) { (s, at) =>
      splitArgs(s, at + name.length) match {
        case Some((argEnd, args)) if allow(s, at) =>
          rule(args) match {
            case Some(repl) => s.substring(0, at) + repl + s.substring(argEnd)
            case None       => s
          }
        case _ => s
      }
    }
  }

  /** Offsets of `name` immediately followed by `(` (ignoring spaces),
    * outside string literals, not preceded by an identifier char. */
  private def callSites(sql: String, name: String): List[Int] = {
    val found = List.newBuilder[Int]
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (sql.regionMatches(true, i, name, 0, name.length) &&
          (i == 0 || (!sql(i - 1).isLetterOrDigit && sql(i - 1) != '_'))) {
        var j = i + name.length
        while (j < sql.length && sql(j).isWhitespace) j += 1
        if (j < sql.length && sql(j) == '(') found += i
        i += name.length
      } else i += 1
    }
    found.result()
  }

  /** From the first `(` at/after `from`, return (index after the closing
    * `)`, top-level comma-split args). */
  private def splitArgs(sql: String, from: Int): Option[(Int, List[String])] = {
    var i = from
    while (i < sql.length && sql(i).isWhitespace) i += 1
    if (i >= sql.length || sql(i) != '(') return None
    i += 1
    val args = List.newBuilder[String]
    val cur = new StringBuilder
    var depth = 1
    var bdepth = 0 // list-literal brackets also protect their commas
    var inStr = false
    while (i < sql.length && depth > 0) {
      val c = sql(i)
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => cur += c; inStr = true
        case '('  => depth += 1; cur += c
        case ')'  => depth -= 1; if (depth > 0) cur += c
        case '['  => bdepth += 1; cur += c
        case ']'  => bdepth -= 1; cur += c
        case ','  if depth == 1 && bdepth == 0 => args += cur.result(); cur.clear()
        case _    => cur += c
      }
      i += 1
    }
    if (depth != 0) None
    else {
      val tail = cur.result()
      val all = if (tail.trim.isEmpty && args.result().isEmpty) Nil
                else args.result() :+ tail
      Some((i, all))
    }
  }
}
