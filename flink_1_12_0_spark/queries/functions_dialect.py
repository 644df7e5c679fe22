"""Scalar-function dialect coverage.

Reference: 195 SQL operators in FlinkSqlOperatorTable.java with runtime
impls in SqlFunctionUtils.java:62 (strings/math) and SqlDateTimeUtils.java:66
(temporal). Every function used below is the Spark builtin mapped in
SURVEY.md §2.8 — JVM-side, codegen'd, no Python UDFs.

Oracles are written in DuckDB dialect (names differ: date_format→strftime,
get_json_object→json_extract_string, instr→strpos, etc.). Functions DuckDB
1.0 lacks (initcap, overlay, sha1) are emulated in the oracle from string
primitives; engine-side they remain single Spark builtins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.functions.dialect import (
    is_alpha,
    is_decimal,
    is_digit,
    split_index,
)
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


@query(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           length(p_name)                         AS name_len,
           upper(p_brand)                         AS brand_u,
           lower(p_type)                          AS type_l,
           trim(concat('  ', p_brand, ' '))       AS trimmed,
           substring(p_name, 1, 5)                AS name5,
           left(p_name, 3)                        AS l3,
           right(p_name, 3)                       AS r3,
           lpad(p_brand, 12, '*')                 AS padded,
           repeat(p_type, 2)                      AS doubled,
           reverse(p_brand)                       AS rev,
           replace(p_name, ' ', '_')              AS snake,
           strpos(p_name, 'a')                    AS pos_a,
           ascii(p_brand)                         AS first_code,
           chr(65 + CAST(p_partkey % 26 AS INT))  AS letter
    FROM part WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
def fn_string_basic(spark, sf_dir):
    """CHAR_LENGTH UPPER LOWER TRIM SUBSTRING LEFT RIGHT LPAD REPEAT
    REVERSE REPLACE POSITION ASCII CHR."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .where(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.length("p_name").alias("name_len"),
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.expr("left(p_name, 3)").alias("l3"),
            F.expr("right(p_name, 3)").alias("r3"),
            F.lpad("p_brand", 12, "*").alias("padded"),
            F.repeat(F.col("p_type"), 2).alias("doubled"),
            F.reverse("p_brand").alias("rev"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
            F.instr("p_name", "a").alias("pos_a"),
            F.ascii("p_brand").alias("first_code"),
            F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("letter"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_string_regex_split",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 2)                       AS word2,
           regexp_extract(p_type, '^[A-Z]+')                AS type_head,
           regexp_replace(p_name, '[aeiou]', '#', 'g')      AS devowel,
           regexp_matches(p_name, 'ro')                     AS has_ro,
           concat_ws('|', p_brand, p_type)                  AS brand_type,
           (regexp_matches(p_brand, '^[A-Za-z]+$'))         AS brand_alpha,
           (regexp_matches(split_part(p_brand, '#', 2), '^[0-9]+$')) AS brandnum_digit,
           (regexp_matches(CAST(p_retailprice AS VARCHAR),
                '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$')) AS price_decimal
    FROM part WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
def fn_string_regex_split(spark, sf_dir):
    """SPLIT_INDEX REGEXP REGEXP_EXTRACT REGEXP_REPLACE CONCAT_WS
    IS_ALPHA IS_DIGIT IS_DECIMAL (reference SqlFunctionUtils.splitIndex,
    isAlpha, isDigit, isDecimal)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .where(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            split_index("p_name", " ", 1).alias("word2"),
            F.regexp_extract("p_type", "^[A-Z]+", 0).alias("type_head"),
            F.regexp_replace("p_name", "[aeiou]", "#").alias("devowel"),
            F.col("p_name").rlike("ro").alias("has_ro"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            is_alpha("p_brand").alias("brand_alpha"),
            is_digit(split_index("p_brand", "#", 1)).alias("brandnum_digit"),
            is_decimal(F.col("p_retailprice").cast("string")).alias("price_decimal"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_string_encode_hash",
    oracle="""
    SELECT n_nationkey,
           md5(n_name)                                      AS name_md5,
           sha256(n_name)                                   AS name_sha256,
           base64(encode(n_name))                           AS name_b64,
           decode(from_base64(base64(encode(n_name))))      AS roundtrip,
           hex(n_nationkey)                                 AS key_hex,
           bin(n_nationkey)                                 AS key_bin,
           concat(upper(substring(lower(n_name),1,1)), substring(lower(n_name),2)) AS name_initcap,
           concat(substring(n_name,1,1), 'XX', substring(n_name,4)) AS name_overlay
    FROM nation
    ORDER BY n_nationkey
    """,
)
def fn_string_encode_hash(spark, sf_dir):
    """MD5 SHA256 TO_BASE64 FROM_BASE64 HEX BIN INITCAP OVERLAY.
    (DuckDB lacks initcap/overlay → oracle emulates from primitives;
    n_name is single-word in fixture so word-wise INITCAP degenerates.)"""
    t = load_tables(spark, sf_dir)
    return t["nation"].select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2("n_name", 256).alias("name_sha256"),
        F.base64(F.col("n_name").cast("binary")).alias("name_b64"),
        F.unbase64(F.base64(F.col("n_name").cast("binary"))).cast("string").alias("roundtrip"),
        F.upper(F.hex(F.col("n_nationkey"))).alias("key_hex"),
        F.bin("n_nationkey").alias("key_bin"),
        F.initcap(F.lower("n_name")).alias("name_initcap"),
        F.overlay("n_name", F.lit("XX"), 2, 2).alias("name_overlay"),
    ).orderBy("n_nationkey")


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                    AS a,
           CAST(ceil(l_quantity / 7) AS BIGINT)      AS c,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS f,
           round(l_quantity / 7, 2)                  AS r,
           CAST(sign(l_discount - 0.05) AS DOUBLE)   AS sg,
           round(exp(l_discount), 6)                 AS ex,
           round(ln(l_extendedprice), 6)             AS lnp,
           round(log10(l_extendedprice), 6)          AS lg10,
           round(log2(l_quantity + 1), 6)            AS lg2,
           round(power(l_quantity, 2), 6)            AS p2,
           round(sqrt(l_extendedprice), 6)           AS sq,
           round(sin(l_discount) + cos(l_tax) + atan2(l_discount, l_tax + 0.01), 6) AS trig,
           round(degrees(l_discount), 6)             AS deg,
           round(radians(l_quantity), 6)             AS rad,
           CAST(l_orderkey % 7 AS BIGINT)            AS m7,
           round(pi(), 6)                            AS pi_c
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_math(spark, sf_dir):
    """ABS CEIL FLOOR ROUND SIGN EXP LN LOG10 LOG2 POWER SQRT trig
    DEGREES RADIANS MOD PI (reference FlinkSqlOperatorTable math section)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("a"),
            F.ceil(F.col("l_quantity") / 7).alias("c"),
            F.floor(F.col("l_extendedprice") / 1000).alias("f"),
            F.round(F.col("l_quantity") / 7, 2).alias("r"),
            F.signum(F.col("l_discount") - 0.05).alias("sg"),
            F.round(F.exp("l_discount"), 6).alias("ex"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("lnp"),
            F.round(F.log10("l_extendedprice"), 6).alias("lg10"),
            F.round(F.log2(F.col("l_quantity") + 1), 6).alias("lg2"),
            F.round(F.pow("l_quantity", F.lit(2)), 6).alias("p2"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
            F.round(
                F.sin("l_discount") + F.cos("l_tax")
                + F.atan2(F.col("l_discount"), F.col("l_tax") + 0.01),
                6,
            ).alias("trig"),
            F.round(F.degrees("l_discount"), 6).alias("deg"),
            F.round(F.radians("l_quantity"), 6).alias("rad"),
            (F.col("l_orderkey") % 7).alias("m7"),
            F.round(F.lit(3.141592653589793), 6).alias("pi_c"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_temporal",
    oracle="""
    SELECT event_id,
           year(ts)                                          AS y,
           quarter(ts)                                       AS q,
           month(ts)                                         AS mo,
           weekofyear(ts)                                    AS wk,
           dayofyear(ts)                                     AS doy,
           day(ts)                                           AS dom,
           isodow(ts) - 1                                    AS wd,
           hour(ts)                                          AS h,
           minute(ts)                                        AS mi,
           second(ts)                                        AS s,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')  AS hour_bucket,
           strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus90m,
           date_diff('minute', TIMESTAMP '2024-01-01', ts)   AS mins_since_ny,
           CAST(floor(epoch(ts)) AS BIGINT)                  AS unix_s,
           strftime(ts, '%Y-%m-%d %H:%M:%S')                 AS formatted
    FROM events WHERE event_id < 500
    ORDER BY event_id
    """,
)
def fn_temporal(spark, sf_dir):
    """EXTRACT family, CEIL/FLOOR(date)→date_trunc, TIMESTAMPADD,
    TIMESTAMPDIFF, UNIX_TIMESTAMP, DATE_FORMAT (reference
    SqlDateTimeUtils.java:66). Weekday emitted Monday=0 on both engines
    (Spark weekday == DuckDB isodow-1)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("event_id") < 500)
        .select(
            "event_id",
            F.year("ts").alias("y"),
            F.quarter("ts").alias("q"),
            F.month("ts").alias("mo"),
            F.weekofyear("ts").alias("wk"),
            F.dayofyear("ts").alias("doy"),
            F.dayofmonth("ts").alias("dom"),
            F.weekday("ts").alias("wd"),
            F.hour("ts").alias("h"),
            F.minute("ts").alias("mi"),
            F.second("ts").alias("s"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
            F.date_format(F.expr("ts + INTERVAL '90' MINUTE"), "yyyy-MM-dd HH:mm:ss").alias("plus90m"),
            F.expr("timestampdiff(MINUTE, TIMESTAMP '2024-01-01', ts)").alias("mins_since_ny"),
            F.unix_timestamp("ts").alias("unix_s"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT)    AS k_int,
           (json_valid(props))                               AS is_json,
           json_extract_string(props, '$.missing')           AS missing
    FROM events WHERE event_id < 500
    ORDER BY event_id
    """,
)
def fn_json(spark, sf_dir):
    """JSON access: Flink 1.12 exposes only IS JSON predicates natively;
    the engine offers Spark's full json surface (get_json_object /
    from_json) as the documented superset."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("event_id") < 500)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("int").alias("k_int"),
            F.expr("props IS NOT NULL AND isnotnull(from_json(props, 'map<string,string>'))").alias("is_json"),
            F.get_json_object("props", "$.missing").alias("missing"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')   AS seg,
           (c_acctbal BETWEEN 1000 AND 2000)                     AS in_band,
           (c_mktsegment IN ('MACHINERY', 'HOUSEHOLD'))          AS is_mh,
           CASE WHEN c_acctbal IS NOT DISTINCT FROM NULL THEN -1.0 ELSE c_acctbal END AS bal_nn,
           if(c_acctbal > 0, 'pos', 'nonpos')                    AS sign_tag
    FROM customer WHERE c_custkey < 300
    ORDER BY c_custkey
    """,
)
def fn_conditional(spark, sf_dir):
    """CASE NULLIF COALESCE BETWEEN IN IS [NOT] DISTINCT FROM IF."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .where(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("band"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
            F.col("c_acctbal").between(1000, 2000).alias("in_band"),
            F.col("c_mktsegment").isin("MACHINERY", "HOUSEHOLD").alias("is_mh"),
            F.when(F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double")), -1.0)
            .otherwise(F.col("c_acctbal"))
            .alias("bal_nn"),
            F.when(F.col("c_acctbal") > 0, "pos").otherwise("nonpos").alias("sign_tag"),
        )
        .orderBy("c_custkey")
    )


@query(
    "fn_array_lambda",
    oracle="""
    SELECT p_partkey,
           array_to_string(string_split(p_name, ' '), '|')               AS words,
           len(string_split(p_name, ' '))                                AS n_words,
           array_to_string(list_sort(string_split(p_name, ' ')), '|')    AS sorted_words,
           len(list_filter(string_split(p_name, ' '), w -> length(w) > 4)) AS n_long,
           array_to_string(list_transform(string_split(p_name, ' '),
                                          w -> CAST(length(w) AS VARCHAR)), '|') AS word_lens,
           array_contains(string_split(p_name, ' '), 'spark')            AS has_spark,
           string_split(p_name, ' ')[1]                                  AS first_word
    FROM part WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
def fn_array_lambda(spark, sf_dir):
    """ARRAY construction, CARDINALITY, ITEM/AT, ELEMENT + higher-order
    transform/filter (engine superset; Flink 1.12 array surface is
    ARRAY/CARDINALITY/ELEMENT/ITEM).

    Array-valued intermediates stay arrays; the OUTPUT columns are
    stringified with array_join so the driver's canonicalizer (pandas
    sort_values over cells) never sees an unhashable ndarray.
    """
    t = load_tables(spark, sf_dir)
    words = F.split("p_name", " ")
    return (
        t["part"]
        .where(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.array_join(words, "|").alias("words"),
            F.size(words).alias("n_words"),
            F.array_join(F.array_sort(words), "|").alias("sorted_words"),
            F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
            F.array_join(
                F.transform(words, lambda w: F.length(w).cast("string")), "|"
            ).alias("word_lens"),
            F.array_contains(words, "spark").alias("has_spark"),
            words[0].alias("first_word"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_time_type",
    oracle="""
    SELECT event_id,
           CAST(epoch_ms(ts) % 86400000 AS BIGINT) AS tod_ms,
           CAST(hour(ts) AS BIGINT) AS t_hour,
           CAST(minute(ts) AS BIGINT) AS t_min,
           CAST(second(ts) AS BIGINT) AS t_sec,
           strftime(ts, '%H:%M:%S') AS t_str,
           (epoch_ms(ts) % 86400000) >= 43200000 AS after_noon
    FROM events WHERE event_id < 500
    ORDER BY event_id
    """,
)
def fn_time_type(spark, sf_dir):
    """TIME(p) type shim (SURVEY §1.3): time-of-day as millis-of-day BIGINT
    with HOUR/MINUTE/SECOND accessors, HH:mm:ss formatting and a TIME
    literal comparison — the reference's TIME_WITHOUT_TIME_ZONE
    (LogicalTypeRoot.java:52) surface.  All JVM-side arithmetic."""
    from flink_1_12_0_spark.functions.dialect import (
        time_format,
        time_hour,
        time_lit,
        time_minute,
        time_second,
        to_time,
    )

    t = load_tables(spark, sf_dir)
    tod = to_time("ts")
    return (
        t["events"]
        .where(F.col("event_id") < 500)
        .select(
            "event_id",
            tod.alias("tod_ms"),
            time_hour(tod).alias("t_hour"),
            time_minute(tod).alias("t_min"),
            time_second(tod).alias("t_sec"),
            time_format(tod).alias("t_str"),
            (tod >= time_lit("12:00:00")).alias("after_noon"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_bit_ops",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255        AS band,
           p_partkey | 4096       AS bor,
           xor(p_partkey, 255)    AS bxor,
           p_partkey << 3         AS shl,
           p_partkey >> 1         AS shr,
           bit_count(p_partkey)   AS bcount,
           bin(p_partkey)         AS sbin,
           hex(p_partkey)         AS shex
    FROM part WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
def fn_bit_ops(spark, sf_dir):
    """Bit-manipulation family (reference FlinkSqlOperatorTable BITAND/
    BITOR/BITXOR/BITNOT + BIN/HEX in SqlFunctionUtils): all JVM-side
    builtins.  DuckDB's ^ is exponentiation, so the oracle uses xor()."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey,
               p_partkey & 255                AS band,
               p_partkey | 4096               AS bor,
               p_partkey ^ 255                AS bxor,
               shiftleft(p_partkey, 3)        AS shl,
               shiftright(p_partkey, 1)       AS shr,
               bit_count(p_partkey)           AS bcount,
               bin(p_partkey)                 AS sbin,
               hex(p_partkey)                 AS shex
        FROM part WHERE p_partkey < 200
        ORDER BY p_partkey
    """)


@query(
    "fn_url_map",
    oracle="""
    WITH s AS (
      SELECT c_custkey, c_mktsegment, c_nationkey, c_acctbal,
             'https://shop.example.com/seg/' || CAST(c_nationkey AS VARCHAR)
                || '/item?seg=' || c_mktsegment
                || '&id=' || CAST(c_custkey AS VARCHAR)          AS url,
             'seg:' || c_mktsegment || ',nat:' || CAST(c_nationkey AS VARCHAR) AS kv
      FROM customer WHERE c_custkey < 200)
    SELECT c_custkey,
           regexp_extract(url, 'https?://([^/]+)', 1)        AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1)  AS path,
           regexp_extract(url, '[?&]id=([^&]*)', 1)          AS qid,
           regexp_extract(kv, 'nat:([^,]*)', 1)              AS m_nat,
           (c_mktsegment LIKE '%ING')                        AS seg_sim_ing,
           (0.0 < 9999.0 AND 1000.0 < c_acctbal)             AS bal_overlaps
    FROM s ORDER BY c_custkey
    """,
)
def fn_url_map(spark, sf_dir):
    """PARSE_URL STR_TO_MAP SIMILAR_TO OVERLAPS (reference
    SqlFunctionUtils.parseUrl/strToMap, FlinkSqlOperatorTable SIMILAR_TO /
    OVERLAPS).  The oracle recomputes each extraction with plain regexes,
    so the Spark-side functions are what is value-checked; OVERLAPS is the
    standard interval-predicate expansion ((s1,e1) OVERLAPS (s2,e2) —
    here (0, acctbal) vs (1000, 9999))."""
    from flink_1_12_0_spark.functions.dialect import similar_to

    t = load_tables(spark, sf_dir)
    c = t["customer"].where(F.col("c_custkey") < 200)
    url = F.concat(
        F.lit("https://shop.example.com/seg/"),
        F.col("c_nationkey").cast("string"),
        F.lit("/item?seg="),
        F.col("c_mktsegment"),
        F.lit("&id="),
        F.col("c_custkey").cast("string"),
    )
    kv = F.concat(
        F.lit("seg:"), F.col("c_mktsegment"),
        F.lit(",nat:"), F.col("c_nationkey").cast("string"),
    )
    c = c.withColumn("url", url).withColumn("kv", kv)
    return c.select(
        "c_custkey",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY', 'id')").alias("qid"),
        F.expr("str_to_map(kv, ',', ':')['nat']").alias("m_nat"),
        similar_to("c_mktsegment", "%ING").alias("seg_sim_ing"),
        # (0, 9999) OVERLAPS (1000, c_acctbal): s1 < e2 AND s2 < e1
        ((F.lit(0.0) < F.lit(9999.0)) & (F.lit(1000.0) < F.col("c_acctbal"))).alias(
            "bal_overlaps"
        ),
    ).orderBy("c_custkey")


@query(
    "fn_temporal_calendar",
    oracle="""
    SELECT event_id,
           CAST(last_day(CAST(ts AS DATE)) AS STRING)                  AS month_end,
           CAST(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS STRING) AS plus2mo,
           strftime(CAST(ts AS TIMESTAMPTZ) AT TIME ZONE 'America/New_York',
                    '%Y-%m-%d %H:%M:%S')                               AS ny_wall,
           CAST(date_trunc('month', CAST(ts AS DATE)) AS STRING)       AS month_start
    FROM events WHERE event_id < 300
    ORDER BY event_id
    """,
)
def fn_temporal_calendar(spark, sf_dir):
    """Calendar arithmetic + CONVERT_TZ (reference SqlDateTimeUtils.java
    convertTz/lastDay/addMonths): LAST_DAY, month-clamped ADD_MONTHS,
    timezone conversion to a wall-clock string, month bucketing.  Session
    TZ is UTC so the LTZ timestamp's wall time equals its UTC instant on
    both engines; outputs are strings for hash stability."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("event_id") < 300)
        .select(
            "event_id",
            F.last_day(F.col("ts").cast("date")).cast("string").alias("month_end"),
            F.add_months(F.col("ts").cast("date"), 2).cast("string").alias("plus2mo"),
            F.date_format(
                F.expr(
                    "convert_timezone('UTC', 'America/New_York', CAST(ts AS TIMESTAMP_NTZ))"
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("ny_wall"),
            F.date_trunc("month", F.col("ts").cast("date")).cast("date").cast("string").alias("month_start"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_math_hyperbolic_truncate",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sh,
           round((exp(l_tax) + exp(-l_tax)) / 2, 6)           AS ch,
           round((exp(l_discount) - exp(-l_discount))
                 / (exp(l_discount) + exp(-l_discount)), 6)   AS th,
           round(cot(l_discount + 0.01), 6) AS ct,
           sign(l_discount - 0.05) * floor(abs(l_discount - 0.05) * power(10, 1))
               / power(10, 1) AS tr1,
           round(exp(1), 6) AS e_c
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_math_hyperbolic_truncate(spark, sf_dir):
    """SINH COSH TANH COT E() and numeric TRUNCATE(x, d) — the math-tier
    edges (FlinkSqlOperatorTable; SqlFunctionUtils.java truncate is
    toward-zero at scale d, which Spark lacks, so the dialect expands it
    to the sign-preserving floor form).  Exercised through the DIALECT
    string path (translate), not hand-built columns."""
    from flink_1_12_0_spark.plans.dialect_shim import translate

    load_tables(spark, sf_dir)
    return spark.sql(translate("""
        SELECT l_orderkey, l_linenumber,
               round(SINH(l_discount), 6) AS sh,
               round(COSH(l_tax), 6)      AS ch,
               round(TANH(l_discount), 6) AS th,
               round(COT(l_discount + 0.01), 6) AS ct,
               TRUNCATE(l_discount - 0.05, 1) AS tr1,
               round(E(), 6) AS e_c
        FROM lineitem WHERE l_orderkey < 300
        ORDER BY l_orderkey, l_linenumber
    """))


@query(
    "udaf_weighted_avg",
    oracle="""
    SELECT c_mktsegment,
           round(sum(o_totalprice * (1 + o_orderkey % 3))
                 / sum(1 + o_orderkey % 3), 4) AS w_avg
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def udaf_weighted_avg(spark, sf_dir):
    """AggregateFunction surface (reference AggregateFunction.java:194 /
    pyflink udaf): a pandas GROUPED_AGG weighted average per market
    segment — the Arrow-batched accumulate/merge path, value-checked
    against the algebraic oracle."""
    import pandas as pd

    from flink_1_12_0_spark.functions.udf import udaf

    def _w_avg(v, w):
        return float((v * w).sum() / w.sum())

    # the module's `from __future__ import annotations` would stringify
    # inline hints, breaking pandas_udf's GROUPED_AGG inference — attach
    # REAL type objects instead (Series, Series) -> float
    _w_avg.__annotations__ = {"v": pd.Series, "w": pd.Series, "return": float}
    w_avg = udaf(_w_avg, result_type="double")

    t = load_tables(spark, sf_dir)
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return (
        j.withColumn("wt", (F.lit(1) + F.col("o_orderkey") % 3).cast("double"))
        .groupBy("c_mktsegment")
        .agg(F.round(w_avg(F.col("o_totalprice"), F.col("wt")), 4).alias("w_avg"))
        .orderBy("c_mktsegment")
    )
