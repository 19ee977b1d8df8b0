"""Tier C8 — scalar function battery: string / date / math / array / JSON.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen.  This module doubles as the native replacement for
the record-shaping the reference delegates to argot (flatten/suffix live
in docpipe; the raw function surface is exercised here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 4) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           LENGTH(p_name) AS name_len,
           REPLACE(p_name, ' ', '_') AS name_snake,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           len(string_split(p_name, ' ')) AS n_words,
           LEFT(p_brand, 5) AS brand_left,
           TRIM('  ' || p_type || ' ') AS type_trim
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, substring, concat, length, replace, regexp
    extraction, split arity, trim."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.substring("p_brand", 1, 5).alias("brand_left"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)::INT AS order_year,
           EXTRACT(quarter FROM o_orderdate)::INT AS order_quarter,
           EXTRACT(month FROM o_orderdate)::INT AS order_month,
           EXTRACT(dow FROM o_orderdate)::INT AS order_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month_start,
           date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_epoch,
           strftime(o_orderdate::DATE + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: extract, trunc, diff, interval add, last_day.
    DOW normalized to DuckDB's 0=Sunday convention."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000.0) AS dist_from_mid,
           ROUND(l_extendedprice, 1) AS price_r1,
           CEIL(l_quantity)::BIGINT AS qty_ceil,
           FLOOR(l_discount * 100)::BIGINT AS disc_pct,
           SQRT(l_extendedprice) AS price_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           (1.0 + l_tax) * (1.0 + l_tax) AS tax_sq,
           l_orderkey % 7 AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions over doubles — all deterministic IEEE ops, identical
    across engines without rounding tricks."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dist_from_mid"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        # ln() is rounded: transcendental libm results differ by ~1 ulp
        # across engines (sqrt is IEEE-exact, ln is not).
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        ((F.lit(1.0) + F.col("l_tax")) * (F.lit(1.0) + F.col("l_tax"))).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_case_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'regular'
                ELSE 'premium' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'SEG_0'), 'OTHER') AS segment_masked,
           (c_acctbal IS NOT DISTINCT FROM 0.0) AS is_exactly_zero,
           CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal END AS even_nation_bal,
           IFNULL(CASE WHEN c_acctbal > 9000 THEN c_acctbal END, -1.0) AS capped
    FROM customer
    """,
)
def scalar_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / COALESCE / NULLIF / null-safe equality / IFNULL."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debtor")
        .when(bal < 5000, "regular")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("SEG_0")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        bal.eqNullSafe(F.lit(0.0)).alias("is_exactly_zero"),
        F.when(F.col("c_nationkey") % 2 == 0, bal).alias("even_nation_bal"),
        F.ifnull(F.when(bal > 9000, bal), F.lit(-1.0)).alias("capped"),
    )


@query(
    "scalar_array_explode",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
    WHERE lang = 'en'
    GROUP BY word
    HAVING COUNT(*) >= 5
    """,
)
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction (split) + explode + re-aggregation: the word
    histogram of English documents.  explode is generate-side (no
    shuffle); only the final count aggregates."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3_sorted
    FROM documents
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: size, element_at (head/tail), contains, distinct,
    sort, slice, join — all codegen'd, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_sorted"
        ),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the ``events.props`` payload — the same
    from_json path the argot replacement uses for Argot ``content``
    records (docpipe.flatten)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "scalar_map_struct",
    oracle="""
    SELECT doc_id,
           lang AS meta_lang,
           source AS meta_source,
           n_chars AS meta_chars,
           lang || ':' || source AS meta_key
    FROM documents
    """,
)
def scalar_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map + struct column, then extract fields back out — the
    round trip exercises MapType/StructType construction and access."""
    d = load_table(spark, sf_dir, "documents")
    withmap = d.select(
        "doc_id",
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
        F.struct(F.col("n_chars").alias("chars"), F.col("lang").alias("l")).alias("st"),
    )
    return withmap.select(
        "doc_id",
        F.col("meta")["lang"].alias("meta_lang"),
        F.col("meta")["source"].alias("meta_source"),
        F.col("st.chars").alias("meta_chars"),
        F.concat(F.col("st.l"), F.lit(":"), F.col("meta")["source"]).alias("meta_key"),
    )


@query(
    "scalar_posexplode",
    oracle="""
    SELECT doc_id, u.pos - 1 AS pos, u.w AS word
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) + 1),
                    i -> {'pos': i, 'w': t[i]})) AS u
      FROM (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id < 50)
    )
    """,
)
def scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: explode with element ordinality (token positions)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "word")


@query(
    "scalar_explode_outer",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(hits) = 0 THEN [NULL] ELSE hits END) AS the_hit
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x = 'the') AS hits
      FROM documents WHERE doc_id < 100
    )
    """,
)
def scalar_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive as NULL (plain
    explode silently drops them — a classic row-loss bug at scale)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    hits = F.filter(F.split("text", " "), lambda x: x == "the")
    return d.select(
        "doc_id", F.explode_outer(hits).alias("the_hit")
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS key_and,
           l_orderkey | 7 AS key_or,
           xor(l_orderkey, l_partkey) AS key_xor,
           l_orderkey << 2 AS key_shl,
           l_orderkey >> 3 AS key_shr,
           ~l_orderkey AS key_not,
           bit_count(l_orderkey) AS key_bits
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator battery (masking, xor-mixing, shifts, popcount) —
    the primitives under every hash/bucket/bloom trick in the engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(7)).alias("key_or"),
        k.bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("key_shl"),
        F.shiftright(k, 3).alias("key_shr"),
        F.bitwise_not(k).alias("key_not"),
        F.bit_count(k).cast("bigint").alias("key_bits"),
    )


@query(
    "filter_regexp",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_matching,
           CAST(SUM(CASE WHEN regexp_matches(text, 'join.*filter|filter.*join')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_join_filter
    FROM documents
    WHERE regexp_matches(text, '^the |spark')
    GROUP BY lang
    """,
)
def filter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp predicates (rlike): anchored and alternation patterns kept
    to the subset Java regex and RE2 interpret identically."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^the |spark")
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_matching"),
        F.sum(
            F.when(F.col("text").rlike("join.*filter|filter.*join"), 1).otherwise(0)
        ).alias("n_join_filter"),
    )


@query(
    "scalar_string_extra",
    oracle="""
    SELECT p_partkey,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
           RPAD(p_brand, 12, '.') AS brand_padded,
           REVERSE(p_name) AS name_reversed,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels_upper,
           REPEAT(LEFT(p_type, 2), 3) AS type_repeat,
           split_part(p_name, ' ', 1) AS name_first_part,
           split_part(p_name, ' ', -1) AS name_last_part,
           POSITION('e' IN p_name) AS first_e_pos,
           CASE WHEN p_name ILIKE '%WIDGET%' THEN 1 ELSE 0 END AS is_widget
    FROM part
    """,
)
def scalar_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: padding, reverse, translate, repeat,
    split_part (positive and negative index), position, ILIKE."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.reverse("p_name").alias("name_reversed"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels_upper"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("type_repeat"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("name_first_part"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(-1)).alias("name_last_part"),
        F.instr("p_name", "e").cast("bigint").alias("first_e_pos"),
        F.when(F.col("p_name").ilike("%WIDGET%"), 1).otherwise(0).alias("is_widget"),
    )


@query(
    "scalar_try_errors",
    oracle="""
    SELECT p_partkey,
           CAST(p_retailprice AS DOUBLE) / NULLIF(p_size, 0) AS price_per_size,
           CASE WHEN regexp_matches(p_name, '^[+-]?[0-9]+$')
                THEN TRY_CAST(p_name AS INTEGER) END AS name_as_int,
           CAST(CASE WHEN regexp_matches(substr(p_name, 1, 10),
                                         '^[0-9]{4}-[0-9]{2}-[0-9]{2}$')
                     THEN TRY_CAST(substr(p_name, 1, 10) AS DATE) END
                AS VARCHAR) AS name_as_date,
           TRY_CAST(p_size AS TINYINT) AS size_tiny,
           COALESCE(TRY_CAST(substr(p_brand, 7, 1) AS INTEGER), -1) AS brand_digit
    FROM part
    """,
)
def scalar_try_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant scalar surface under ANSI mode: Spark 4 runs with
    spark.sql.ansi.enabled=true, where a bad cast or a division by zero
    is a RUNTIME ERROR, not a silent NULL — so a production pipeline
    needs the try_* forms on any column it does not fully trust.  This
    battery exercises try_divide (zero divisors exist in no p_size, but
    the form compiles to the null-safe plan), try_cast to int / date /
    narrow tinyint (overflow → NULL, not wraparound), and the
    COALESCE-over-try_cast default pattern.  All engine-exact: both
    sides define failure as NULL."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.try_divide(
            F.col("p_retailprice").cast("double"),
            F.nullif(F.col("p_size"), F.lit(0)),
        ).alias("price_per_size"),
        # Regex-guarded try_cast on BOTH engines: the bare casts have
        # engine-specific accept sets (DuckDB rounds '12.5' to 13 where
        # Spark NULLs; Spark reads '1994' as a date where DuckDB NULLs;
        # try_to_number's '999999' format rejects signs and >6 digits),
        # so parity would hinge on p_name never starting with digits.
        # Restricting each cast to a pattern both engines parse
        # identically makes the gate robust to testdata changes.
        F.when(
            F.col("p_name").rlike(r"^[+-]?[0-9]+$"),
            F.col("p_name").try_cast("int"),
        ).alias("name_as_int"),
        F.when(
            F.substring("p_name", 1, 10).rlike(
                r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
            ),
            F.substring("p_name", 1, 10).try_cast("date"),
        )
        .cast("string")
        .alias("name_as_date"),
        F.col("p_size").try_cast("tinyint").alias("size_tiny"),
        F.coalesce(
            F.substring("p_brand", 7, 1).try_cast("int"), F.lit(-1)
        ).alias("brand_digit"),
    )
