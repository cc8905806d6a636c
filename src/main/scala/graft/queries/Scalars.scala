package graft.queries

import org.apache.spark.sql.functions._
import graft.Canon._
import graft.sources.Tables

/** Scalar function surface — SURVEY.md §2.8.
  *
  * The reference's entire "expression language" is string splitting and
  * concatenation over row keys and metadata (DMS.py:83-85, 102, 379,
  * 413-414); here each function group gets a codegen'd built-in (no UDFs
  * anywhere in the hot path).
  */
object Scalars {

  val all: Seq[Q] = Seq(
    Q(
      "sc_string",
      Some("""SELECT c_custkey,
             concat('k#', CAST(c_custkey AS VARCHAR)) AS key_synth,
             string_split(c_name, '#')[2] AS cust_num,
             regexp_replace(c_name, '0+', '0') AS squeezed,
             lower(c_mktsegment) AS seg_lower,
             upper(substr(c_name, 1, 8)) AS head_up,
             length(c_name) AS name_len,
             strpos(c_name, '#') AS hash_pos,
             lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nk_pad,
             trim(concat('  ', c_mktsegment, ' ')) AS trimmed
             FROM customer WHERE c_custkey < 100 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.customer
            .filter(col("c_custkey") < 100L)
            .select(
              col("c_custkey"),
              concat(lit("k#"), col("c_custkey").cast("string")).as("key_synth"),
              element_at(split(col("c_name"), "#"), 2).as("cust_num"),
              regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
              lower(col("c_mktsegment")).as("seg_lower"),
              upper(substring(col("c_name"), 1, 8)).as("head_up"),
              length(col("c_name")).as("name_len"),
              instr(col("c_name"), "#").as("hash_pos"),
              lpad(col("c_nationkey").cast("string"), 4, "0").as("nk_pad"),
              trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed")
            )
        )
      }
    ),
    Q(
      "sc_datetime",
      Some("""SELECT o_orderkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
             year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
             date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
             strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS due_date,
             CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
             FROM orders WHERE o_orderkey < 200 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .filter(col("o_orderkey") < 200L)
            .select(
              col("o_orderkey"),
              tstr(date_trunc("month", col("o_orderdate"))).as("month_start"),
              year(col("o_orderdate")).as("y"),
              month(col("o_orderdate")).as("m"),
              dayofmonth(col("o_orderdate")).as("d"),
              datediff(col("o_orderdate"), to_timestamp(lit("1995-01-01 00:00:00")))
                .as("days_since_epoch_start"),
              tstr(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
              unix_timestamp(col("o_orderdate")).as("unix_ts")
            )
        )
      }
    ),
    Q(
      "sc_datetime2",
      // date/time breadth: calendar navigation + week numbering. DuckDB
      // dayofweek is 0-based from Sunday, Spark's is 1-based — the +1
      // pins the alignment; both engines' weekofyear is ISO.
      Some("""SELECT o_orderkey,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus_3m,
             dayofweek(o_orderdate) + 1 AS dow,
             weekofyear(o_orderdate) AS iso_week,
             quarter(o_orderdate) AS q,
             dayofyear(o_orderdate) AS doy
             FROM orders WHERE o_orderkey < 200 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .filter(col("o_orderkey") < 200L)
            .select(
              col("o_orderkey"),
              date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
              date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus_3m"),
              dayofweek(col("o_orderdate")).as("dow"),
              weekofyear(col("o_orderdate")).as("iso_week"),
              quarter(col("o_orderdate")).as("q"),
              dayofyear(col("o_orderdate")).as("doy"))
        )
      }
    ),
    Q(
      "sc_math",
      Some("""SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * l_discount, 4) AS disc_amt,
             abs(l_quantity - 25) AS dist_from_25,
             CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS px_bucket,
             CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decade,
             round(pow(l_quantity, 2), 4) AS qty_sq,
             round(sqrt(l_extendedprice), 4) AS px_root,
             round(ln(l_extendedprice + 1), 4) AS px_ln,
             ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS key_mod,
             greatest(l_quantity, 10.0) AS qty_floor10,
             least(l_quantity, 40.0) AS qty_cap40
             FROM lineitem WHERE l_orderkey < 100 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .filter(col("l_orderkey") < 100L)
            .select(
              col("l_orderkey"),
              col("l_linenumber"),
              round(col("l_extendedprice") * col("l_discount"), 4).as("disc_amt"),
              abs(col("l_quantity") - 25).as("dist_from_25"),
              ceil(col("l_extendedprice") / 1000).as("px_bucket"),
              floor(col("l_quantity") / 10).as("qty_decade"),
              round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
              round(sqrt(col("l_extendedprice")), 4).as("px_root"),
              round(log(col("l_extendedprice") + 1), 4).as("px_ln"),
              pmod(col("l_orderkey"), lit(7L)).as("key_mod"),
              greatest(col("l_quantity"), lit(10.0)).as("qty_floor10"),
              least(col("l_quantity"), lit(40.0)).as("qty_cap40")
            )
        )
      }
    ),
    Q(
      "sc_conditional",
      Some("""SELECT o_orderkey,
             CASE WHEN o_totalprice > 300000 THEN 'big'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'small' END AS size_class,
             coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
             FROM orders WHERE o_orderkey < 500 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .filter(col("o_orderkey") < 500L)
            .select(
              col("o_orderkey"),
              when(col("o_totalprice") > 300000.0, "big")
                .when(col("o_totalprice") > 100000.0, "mid")
                .otherwise("small").as("size_class"),
              coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
              when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("is_urgent")
            )
        )
      }
    ),
    Q(
      "sc_array",
      // higher-order functions over tokenized text: transform / filter /
      // aggregate are the same primitives D6 uses for vector math
      Some("""WITH toks AS (
               SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                          x -> x <> '') AS tok
               FROM documents WHERE doc_id < 50
             )
             SELECT doc_id,
               len(tok) AS n_tok,
               array_to_string(list_sort(list_distinct(tok)), ' ') AS vocab,
               CAST(list_contains(tok, 'spark') AS INT) AS has_spark,
               array_to_string(list_slice(tok, 1, 5), ' ') AS head5,
               len(list_filter(tok, x -> length(x) > 4)) AS n_long,
               CAST(list_sum(list_transform(tok, x -> length(x))) AS INT) AS total_chars
             FROM toks ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val tok = filter(split(trim(col("text")), "\\s+"), _ =!= "")
        ordered(
          t.documents
            .filter(col("doc_id") < 50L)
            .withColumn("tok", tok)
            .select(
              col("doc_id"),
              size(col("tok")).as("n_tok"),
              array_join(sort_array(array_distinct(col("tok"))), " ").as("vocab"),
              array_contains(col("tok"), "spark").cast("int").as("has_spark"),
              array_join(slice(col("tok"), 1, 5), " ").as("head5"),
              size(filter(col("tok"), x => length(x) > 4)).as("n_long"),
              aggregate(col("tok"), lit(0), (acc, x) => acc + length(x)).as("total_chars")
            )
        )
      }
    ),
    Q(
      "sc_map",
      // the `meta` MapType surface (§1.2): build a per-row map, read it back
      Some("""SELECT doc_id, lang AS meta_lang, source AS meta_source,
             'lang,source' AS meta_keys, CAST(n_chars AS VARCHAR) AS meta_chars
             FROM documents WHERE doc_id < 30 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.documents
            .filter(col("doc_id") < 30L)
            .withColumn(
              "meta",
              map(
                lit("lang"), col("lang"),
                lit("source"), col("source"),
                lit("chars"), col("n_chars").cast("string")
              )
            )
            .select(
              col("doc_id"),
              element_at(col("meta"), "lang").as("meta_lang"),
              element_at(col("meta"), "source").as("meta_source"),
              array_join(sort_array(map_keys(map(lit("lang"), col("lang"), lit("source"), col("source")))), ",")
                .as("meta_keys"),
              element_at(col("meta"), "chars").as("meta_chars")
            )
        )
      }
    ),
    Q(
      "sc_json",
      Some("""SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
             FROM events WHERE event_id < 200 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.events
            .filter(col("event_id") < 200L)
            .select(
              col("event_id"),
              get_json_object(col("props"), "$.k").as("k_str"),
              get_json_object(col("props"), "$.k").cast("long").as("k_num")
            )
        )
      }
    ),
    Q(
      "sc_array_setops",
      // array set algebra (§2.8): intersect/union/except/position/flatten.
      // Result ORDER of intersect/union is engine-specific, so every set
      // result is sorted before comparison; docs are filtered to >= 9
      // tokens so both slices are full-width.
      Some("""WITH toks AS (
               SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                          x -> x <> '') AS tok
               FROM documents WHERE doc_id < 40
             ),
             ab AS (
               SELECT doc_id, tok[1:6] AS a, tok[4:9] AS b
               FROM toks WHERE len(tok) >= 9
             )
             SELECT doc_id,
               array_to_string(list_sort(list_intersect(a, b)), ' ') AS inter_sorted,
               array_to_string(list_sort(list_distinct(a || b)), ' ') AS union_sorted,
               array_to_string(list_sort(list_filter(list_distinct(a),
                 x -> NOT list_contains(b, x))), ' ') AS except_sorted,
               coalesce(list_position(a, b[1]), 0) AS b1_pos_in_a,
               len(flatten([a, b])) AS n_flat
             FROM ab ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val tok = filter(split(lower(trim(col("text"))), "\\s+"), _ =!= "")
        ordered(
          t.documents
            .filter(col("doc_id") < 40L)
            .withColumn("tok", tok)
            .filter(size(col("tok")) >= 9)
            .select(col("doc_id"),
              slice(col("tok"), 1, 6).as("a"), slice(col("tok"), 4, 6).as("b"))
            .select(col("doc_id"),
              array_join(sort_array(array_intersect(col("a"), col("b"))), " ")
                .as("inter_sorted"),
              array_join(sort_array(array_union(col("a"), col("b"))), " ")
                .as("union_sorted"),
              array_join(sort_array(array_except(col("a"), col("b"))), " ")
                .as("except_sorted"),
              array_position(col("a"), element_at(col("b"), 1)).as("b1_pos_in_a"),
              size(flatten(array(col("a"), col("b")))).as("n_flat"))
        )
      }
    ),
    Q(
      "sc_trig",
      // trigonometry / transcendentals (§2.8 math breadth). Both engines
      // use IEEE doubles but different libm builds can differ in the last
      // ulp, so every value goes through the floor(x*1e4+0.5)/1e4 form
      // (pure IEEE ops, proven identical — see d7_quality_score).
      Some("""SELECT l_orderkey, l_linenumber,
             floor(sin(l_quantity) * 10000 + 0.5) / 10000 AS sin_q,
             floor(cos(l_quantity) * 10000 + 0.5) / 10000 AS cos_q,
             floor(atan2(l_quantity, l_linenumber) * 10000 + 0.5) / 10000 AS angle,
             floor(degrees(atan2(l_quantity, l_linenumber)) * 10000 + 0.5) / 10000 AS angle_deg,
             floor(exp(l_discount) * 10000 + 0.5) / 10000 AS exp_disc,
             floor(log10(l_extendedprice) * 10000 + 0.5) / 10000 AS px_log10
             FROM lineitem WHERE l_orderkey < 100
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        def r4f(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
        ordered(
          t.lineitem
            .filter(col("l_orderkey") < 100L)
            .select(
              col("l_orderkey"), col("l_linenumber"),
              r4f(sin(col("l_quantity"))).as("sin_q"),
              r4f(cos(col("l_quantity"))).as("cos_q"),
              r4f(atan2(col("l_quantity"), col("l_linenumber"))).as("angle"),
              r4f(degrees(atan2(col("l_quantity"), col("l_linenumber")))).as("angle_deg"),
              r4f(exp(col("l_discount"))).as("exp_disc"),
              r4f(log10(col("l_extendedprice"))).as("px_log10"))
        )
      }
    ),
    Q(
      "sc_map_transform",
      // map transformation HOFs (§2.8): transform_keys / transform_values
      // / map_filter. Raw map columns render differently per engine, so
      // every transformed map is canonicalized to a sorted k=v string.
      Some("""WITH m AS (
             |  SELECT o_orderkey,
             |         MAP {'status': o_orderstatus, 'prio': o_orderpriority} AS props
             |  FROM orders WHERE o_orderkey < 100
             |)
             |SELECT o_orderkey,
             |  array_to_string(list_sort([upper(e.key) || '=' || e.value
             |    FOR e IN map_entries(props)]), ',') AS upper_keys,
             |  array_to_string(list_sort([e.key || '=' || substring(e.value, 1, 1)
             |    FOR e IN map_entries(props)]), ',') AS first_char_vals,
             |  array_to_string(list_sort([e.key || '=' || e.value
             |    FOR e IN map_entries(props) IF e.value <> 'O']), ',') AS no_open
             |FROM m ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        def render(m: org.apache.spark.sql.Column) =
          array_join(sort_array(transform(map_entries(m),
            e => concat(e.getField("key"), lit("="), e.getField("value")))), ",")
        ordered(
          t.orders
            .filter(col("o_orderkey") < 100L)
            .withColumn("props",
              map(lit("status"), col("o_orderstatus"),
                lit("prio"), col("o_orderpriority")))
            .select(col("o_orderkey"),
              render(transform_keys(col("props"), (k, _) => upper(k))).as("upper_keys"),
              render(transform_values(col("props"), (_, v) => substring(v, 1, 1)))
                .as("first_char_vals"),
              render(map_filter(col("props"), (_, v) => v =!= "O")).as("no_open"))
        )
      }
    ),
    Q(
      "sc_encode",
      // binary encodings over the content surface (§2.8): utf-8 encode,
      // base64/hex render, and a base64 round trip back to text — the
      // transforms a BinaryType content column actually goes through
      Some("""SELECT doc_id,
             to_base64(encode(substring(text, 1, 24))) AS b64,
             hex(encode(substring(text, 1, 12))) AS hx,
             octet_length(encode(text)) AS n_bytes,
             decode(from_base64(to_base64(encode(substring(text, 1, 24))))) AS round_trip
             FROM documents WHERE doc_id < 60
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.documents
            .filter(col("doc_id") < 60L)
            .select(col("doc_id"),
              base64(encode(substring(col("text"), 1, 24), "UTF-8")).as("b64"),
              hex(encode(substring(col("text"), 1, 12), "UTF-8")).as("hx"),
              length(encode(col("text"), "UTF-8")).as("n_bytes"),
              decode(unbase64(base64(encode(substring(col("text"), 1, 24), "UTF-8"))),
                "UTF-8").as("round_trip"))
        )
      }
    ),
    Q(
      "sc_regex_extract",
      // capture-group extraction (§2.8 string/regex breadth): pull the
      // numeric id and segment out of structured-ish name strings, count
      // pattern occurrences. Patterns stay in the Java/RE2 common subset.
      Some("""SELECT c_custkey,
             regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS cust_num,
             CAST(regexp_extract(c_name, '([0-9]{3})$', 1) AS BIGINT) AS last3,
             length(regexp_replace(c_name, '[0-9]', '', 'g')) AS n_nondigit,
             CASE WHEN regexp_matches(c_mktsegment, '^(AUTO|BUIL)') THEN 1 ELSE 0 END
               AS seg_prefix
             FROM customer WHERE c_custkey < 200
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.customer
            .filter(col("c_custkey") < 200L)
            .select(col("c_custkey"),
              regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).as("cust_num"),
              regexp_extract(col("c_name"), "([0-9]{3})$", 1).cast("long").as("last3"),
              length(regexp_replace(col("c_name"), "[0-9]", "")).as("n_nondigit"),
              when(col("c_mktsegment").rlike("^(AUTO|BUIL)"), 1).otherwise(0)
                .as("seg_prefix"))
        )
      }
    ),
    Q(
      "sc_try_safe",
      // ANSI-safe ingest surface: try_cast / try_divide / try_to_number
      // return NULL instead of failing the job on malformed rows — the
      // difference between a 100 TB load that finishes and one that dies
      // at hour nine. Malformed inputs are synthesized deterministically.
      Some("""WITH raw AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
             |              ELSE CAST(o_orderkey AS VARCHAR) END AS numish,
             |         (o_orderkey % 5) AS denom
             |  FROM orders WHERE o_orderkey < 300
             |)
             |SELECT o_orderkey,
             |       TRY_CAST(numish AS BIGINT) AS parsed,
             |       CASE WHEN denom = 0 THEN NULL
             |            ELSE o_orderkey * 1.0 / denom END AS ratio,
             |       (TRY_CAST(numish AS BIGINT) IS NULL) AS is_bad
             |FROM raw
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders
            .filter(col("o_orderkey") < 300L)
            .select(col("o_orderkey"),
              when(col("o_orderkey") % 3 === 0, lit("not-a-number"))
                .otherwise(col("o_orderkey").cast("string")).as("numish"),
              (col("o_orderkey") % 5).as("denom"))
            .select(col("o_orderkey"),
              expr("try_cast(numish AS BIGINT)").as("parsed"),
              // 1.0D: Spark SQL parses a bare 1.0 as a DECIMAL literal,
              // which would make ratio a decimal, not the oracle's double
              expr("try_divide(o_orderkey * 1.0D, denom)").as("ratio"),
              expr("try_cast(numish AS BIGINT) IS NULL").as("is_bad"))
        )
      }
    ),
    Q(
      "sc_bitwise",
      // bitwise surface (§2.8): and/or/xor/shifts/popcount — the
      // primitives the simhash/LSH pipelines build on
      Some("""SELECT l_orderkey, l_linenumber,
             (l_orderkey & 255) AS low_byte,
             (l_orderkey | 4096) AS with_flag,
             xor(l_orderkey, l_partkey) AS key_mix,
             (l_orderkey << 3) AS shifted_up,
             (l_orderkey >> 2) AS shifted_down,
             bit_count(l_orderkey) AS popcount
             FROM lineitem WHERE l_orderkey < 200
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .filter(col("l_orderkey") < 200L)
            .select(
              col("l_orderkey"), col("l_linenumber"),
              col("l_orderkey").bitwiseAND(lit(255L)).as("low_byte"),
              col("l_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
              col("l_orderkey").bitwiseXOR(col("l_partkey")).as("key_mix"),
              shiftleft(col("l_orderkey"), 3).as("shifted_up"),
              shiftright(col("l_orderkey"), 2).as("shifted_down"),
              bit_count(col("l_orderkey")).as("popcount"))
        )
      }
    ),
    Q(
      "sc_hash",
      Some("""SELECT doc_id,
             md5(text) AS text_md5,
             sha256(text) AS text_sha
             FROM documents WHERE doc_id < 50 ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.documents
            .filter(col("doc_id") < 50L)
            .select(
              col("doc_id"),
              md5(col("text")).as("text_md5"),
              sha2(col("text"), 256).as("text_sha")
            )
        )
      }
    ),
    Q(
      "sc_hash_native",
      // xxhash64 / crc32: Spark-native 64-bit hashes (exact-dedup keys,
      // partitioners); no cross-engine oracle — rows-only check
      None,
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.documents
            .filter(col("doc_id") < 50L)
            .select(
              col("doc_id"),
              xxhash64(col("text")).as("text_xx64"),
              crc32(col("text")).as("text_crc"),
              hash(col("text")).as("text_murmur")
            )
        )
      }
    )
    ,
    Q(
      "sc_string2",
      // format_string/translate/substring_index/reverse/repeat/bround —
      // the 2.8 stragglers; bround inputs are exact eighths so the
      // half-even boundary is deterministic in both engines
      Some("""SELECT o_orderkey,
             printf('%s-%05d', o_orderstatus, o_orderkey) AS tag,
             translate(o_orderpriority, '-', '_') AS pri,
             split_part(o_orderpriority, '-', 1) AS pri_code,
             reverse(o_orderstatus) AS rev,
             repeat(o_orderstatus, 3) AS rep,
             round_even(o_orderkey * 0.125, 2) AS br
             FROM orders WHERE o_custkey < 30
             ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.orders.filter(col("o_custkey") < 30)
            .select(col("o_orderkey"),
              format_string("%s-%05d", col("o_orderstatus"), col("o_orderkey")).as("tag"),
              translate(col("o_orderpriority"), "-", "_").as("pri"),
              substring_index(col("o_orderpriority"), "-", 1).as("pri_code"),
              reverse(col("o_orderstatus")).as("rev"),
              repeat(col("o_orderstatus"), 3).as("rep"),
              bround(col("o_orderkey") * 0.125, 2).as("br"))
        )
      }
    ),
    Q(
      "sc_array_map2",
      // arrays_zip + posexplode + map_from_entries/map_concat + to_json
      Some("""WITH base AS (
             SELECT n_nationkey AS k, n_name AS name, n_regionkey AS rk FROM nation
             )
             SELECT k,
             [struct_extract(x, 1) + struct_extract(x, 2) FOR x IN list_zip([k, rk], [rk, k])][1] AS zsum,
             map_from_entries([('nk', k), ('rk', rk)])['nk'][1] AS nk_val,
             map_concat(MAP(['n'],[name]), MAP(['r'],[rk::VARCHAR]))['r'][1] AS r_val,
             to_json(struct_pack(k := k, name := name)) AS js
             FROM base ORDER BY ALL NULLS FIRST"""),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.nation.select(
            col("n_nationkey").as("k"),
            element_at(transform(
              arrays_zip(array(col("n_nationkey"), col("n_regionkey")),
                array(col("n_regionkey"), col("n_nationkey"))),
              x => x.getField("0") + x.getField("1")), 1).as("zsum"),
            element_at(map_from_entries(array(
              struct(lit("nk").as("k"), col("n_nationkey").as("v")),
              struct(lit("rk").as("k"), col("n_regionkey").as("v")))), "nk").as("nk_val"),
            element_at(map_concat(
              map(lit("n"), col("n_name")),
              map(lit("r"), col("n_regionkey").cast("string"))), "r").as("r_val"),
            to_json(struct(col("n_nationkey").as("k"), col("n_name").as("name"))).as("js"))
        )
      }
    ),
    Q(
      "sc_levenshtein",
      // edit distance — the fuzzy-match primitive (near-dup filenames,
      // OCR noise): integer result, identical DP definition both engines
      Some("""SELECT p_partkey,
             |       levenshtein(p_name, 'goldenrod lavender spring') AS dist
             |FROM part
             |WHERE levenshtein(p_name, 'goldenrod lavender spring') <= 20
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.part.select(col("p_partkey"),
              levenshtein(col("p_name"), lit("goldenrod lavender spring")).as("dist"))
            .filter(col("dist") <= 20)
        )
      }
    ),
    Q(
      "sc_zorder",
      // Morton/Z-order layout key over (user_id, hour-of-epoch): one sort
      // key that clusters BOTH dimensions for min/max file skipping. The
      // oracle SQL is GENERATED from the same bit-interleave definition
      // (Layout.zValueSql) so engine and oracle cannot drift.
      Some {
        val unzA = (0 until 16).map(i => s"(((z >> ${2 * i}) & 1) << $i)").mkString(" + ")
        val unzB = (0 until 16).map(i => s"(((z >> ${2 * i + 1}) & 1) << $i)").mkString(" + ")
        s"""WITH h AS (
           |  SELECT event_id, user_id, epoch_us(ts) // 3600000000 AS hr
           |  FROM events
           |),
           |zz AS (
           |  SELECT event_id,
           |         ${graft.functions.Layout.zValueSql("user_id", "hr")} AS z
           |  FROM h
           |)
           |SELECT event_id, z,
           |       $unzA AS user_id_rec,
           |       $unzB AS hour_low16
           |FROM zz
           |ORDER BY ALL NULLS FIRST""".stripMargin
      },
      (spark, dir) => {
        val t = Tables(spark, dir)
        val hour = expr("unix_micros(ts) div 3600000000")
        ordered(
          t.events
            .select(col("event_id"),
              graft.functions.Layout.zValue(col("user_id"), hour, 16).as("z"))
            .select(col("event_id"), col("z"),
              graft.functions.Layout.unzA(col("z"), 16).as("user_id_rec"),
              graft.functions.Layout.unzB(col("z"), 16).as("hour_low16"))
        )
      }
    ),
    Q(
      "sc_bitwise_agg",
      // BITWISE AGGREGATES — the §2.8 family behind bitmap/bloom fold-ins
      // and permission-mask rollups: per return flag, the OR / AND / XOR
      // fold of the quantity bits plus the popcount of the OR mask. All
      // pure integer lattice operations — commutative and associative, so
      // partial/final aggregation over any partitioning is exact by
      // construction (no ordering discipline needed at all).
      Some("""SELECT l_returnflag AS flag,
             |       CAST(bit_or(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_or,
             |       CAST(bit_and(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_and,
             |       CAST(bit_xor(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_xor,
             |       CAST(bit_count(bit_or(CAST(l_quantity AS BIGINT))) AS BIGINT)
             |         AS or_bits
             |FROM lineitem GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        ordered(
          t.lineitem
            .select(col("l_returnflag").as("flag"),
              col("l_quantity").cast("long").as("q"))
            .groupBy(col("flag"))
            .agg(expr("bit_or(q)").as("qty_or"),
              expr("bit_and(q)").as("qty_and"),
              expr("bit_xor(q)").as("qty_xor"),
              expr("CAST(bit_count(bit_or(q)) AS BIGINT)").as("or_bits")))
      }
    ),
    Q(
      "sc_benford",
      // BENFORD FIRST-DIGIT AUDIT — the fraud/synthetic-data smell test:
      // does the leading digit of the money column follow log10(1+1/d)?
      // Digit extraction is EXACT: prices are cents-exact, so
      // round(x·100) is an integer whose decimal rendering both engines
      // agree on, and the first character of that rendering is the first
      // significant digit (shifting by 10² preserves it). Observed counts
      // are integers; expected counts and chi² terms are IEEE expressions
      // with identical shape both sides, each rounded once (the
      // d7_lm_score ln-discipline, applied to log10). 100 TB shape: one
      // scan into a 9-row hash aggregate; all the statistics ride the
      // 9-row digit relation against a broadcast 1-row total.
      Some("""WITH c AS (
             |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem
             |),
             |o AS (
             |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |         CAST(count(*) AS BIGINT) AS obs
             |  FROM c GROUP BY 1
             |),
             |n AS (SELECT CAST(sum(obs) AS BIGINT) AS tot FROM o)
             |SELECT digit, obs,
             |       round(tot * log10(1 + 1.0 / digit), 4) AS expected,
             |       round((obs - tot * log10(1 + 1.0 / digit)) *
             |             (obs - tot * log10(1 + 1.0 / digit)) /
             |             (tot * log10(1 + 1.0 / digit)), 4) AS chi_term
             |FROM o CROSS JOIN n ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val o = t.lineitem
          .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
          .groupBy(substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
          .agg(count(lit(1)).as("obs"))
        val n = o.agg(sum(col("obs")).as("tot"))
        val e = col("tot") * log10(lit(1) + lit(1.0) / col("digit"))
        ordered(
          o.crossJoin(broadcast(n)) // 1-row total scalar
            .select(col("digit"), col("obs"),
              round(e, 4).as("expected"),
              round((col("obs") - e) * (col("obs") - e) / e, 4).as("chi_term")))
      }
    ),
    Q(
      "sc_url",
      // URL parsing (§2.8) — the first structural pass of every web-corpus
      // pipeline (domain-level quality lists, per-host dedup keys, query
      // stripping). URLs are synthesized deterministically from document
      // columns, then decomposed with Spark's codegen'd ParseUrl built-in;
      // the oracle predicts every component closed-form from the same
      // columns, so a parser bug (wrong fragment split, query-param
      // extraction, host boundary) breaks the hash. The registered-domain
      // fold (substring_index on the host) is the per-domain grouping key
      // a crawl pipeline aggregates on. Per-row compute, no shuffle.
      Some("""SELECT doc_id,
             |       'https' AS protocol,
             |       source || '.example.com' AS host,
             |       'example.com' AS domain,
             |       '/' || lang || '/doc-' || doc_id || '.html' AS path,
             |       'lang=' || lang || '&p=' || (doc_id % 7) AS query,
             |       CAST(doc_id % 7 AS VARCHAR) AS page_param,
             |       's-' || (doc_id % 3) AS fragment
             |FROM documents WHERE doc_id < 400
             |ORDER BY ALL NULLS FIRST""".stripMargin),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val urlCol = concat(
          lit("https://"), col("source"), lit(".example.com/"), col("lang"),
          lit("/doc-"), col("doc_id"), lit(".html?lang="), col("lang"),
          lit("&p="), col("doc_id") % 7, lit("#s-"), col("doc_id") % 3)
        ordered(
          t.documents
            .filter(col("doc_id") < 400L)
            .select(col("doc_id"), urlCol.as("url"))
            .select(col("doc_id"),
              parse_url(col("url"), lit("PROTOCOL")).as("protocol"),
              parse_url(col("url"), lit("HOST")).as("host"),
              substring_index(parse_url(col("url"), lit("HOST")), ".", -2)
                .as("domain"),
              parse_url(col("url"), lit("PATH")).as("path"),
              parse_url(col("url"), lit("QUERY")).as("query"),
              parse_url(col("url"), lit("QUERY"), lit("p")).as("page_param"),
              parse_url(col("url"), lit("REF")).as("fragment"))
        )
      }
    ), {
      // SC-GEO: GEOHASH CELL ENCODING — the geospatial grouping key that
      // pairs with j19's grid join: quantize (lat, lon) to 5+5 bits,
      // interleave lon-first into the 10-bit Morton word (the sc_zorder
      // primitive), and render precision-2 base32 geohash strings — the
      // per-cell key a geo pipeline partitions, joins and skips files on.
      // All-integer quantization ((scaled + offset)·2^k DIV span) keeps
      // both engines bit-identical; the bit-interleave and char
      // extraction expressions are GENERATED from one template per engine
      // dialect so they cannot drift. 100 TB shape: per-row compute + one
      // hash aggregate on the cell id (1024 cells max at this precision).
      val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
      def zText(shr: (String, Int) => String): String = {
        val lon = (0 to 4).map(i => s"(${shr("lonq", i)} % 2) * ${1L << (2 * i + 1)}")
        val lat = (0 to 4).map(i => s"(${shr("latq", i)} % 2) * ${1L << (2 * i)}")
        (lon ++ lat).mkString(" + ")
      }
      def ghText(shr: (String, Int) => String): Seq[String] =
        (0 to 1).map(k => s"substring('$alphabet', CAST(${shr("z", 5 - 5 * k)} % 32 AS INT) + 1, 1)")
      val sparkShr = (c: String, i: Int) => s"shiftright($c, $i)"
      val duckShr = (c: String, i: Int) => s"($c >> $i)"
      Q(
        "sc_geohash",
        Some(s"""WITH p AS (
                |  SELECT event_id,
                |         (event_id * 7919) % 1800000 - 900000 AS lat_s,
                |         (event_id * 104729) % 3600000 - 1800000 AS lon_s
                |  FROM events
                |),
                |q AS (
                |  SELECT event_id,
                |         ((lat_s + 900000) * 32) // 1800000 AS latq,
                |         ((lon_s + 1800000) * 32) // 3600000 AS lonq
                |  FROM p
                |),
                |z AS (SELECT event_id, ${zText(duckShr)} AS z FROM q)
                |SELECT CAST(z AS BIGINT) AS cell,
                |       ${ghText(duckShr).mkString(" || ")} AS geohash2,
                |       CAST(count(*) AS BIGINT) AS n_points
                |FROM z GROUP BY z
                |ORDER BY ALL NULLS FIRST""".stripMargin),
        (spark, dir) => {
          val t = Tables(spark, dir)
          ordered(
            t.events
              .select(col("event_id"),
                ((col("event_id") * 7919) % 1800000 - 900000).as("lat_s"),
                ((col("event_id") * 104729) % 3600000 - 1800000).as("lon_s"))
              .select(col("event_id"),
                expr("((lat_s + 900000) * 32) DIV 1800000").as("latq"),
                expr("((lon_s + 1800000) * 32) DIV 3600000").as("lonq"))
              .select(col("event_id"), expr(zText(sparkShr)).as("z"))
              .groupBy(col("z"))
              .agg(count(lit(1)).as("n_points"))
              .select(col("z").cast("long").as("cell"),
                expr(ghText(sparkShr).mkString("concat(", ", ", ")"))
                  .as("geohash2"),
                col("n_points")))
        }
      )
    }
  )
}
