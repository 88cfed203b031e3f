package graft.operators

import graft.Q
import graft.Dsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.H scalar functions: string / regex / date / math / array / map /
  * json / cast probes.
  *
  * All are codegen'd built-ins (no UDFs) so they stay inside
  * WholeStageCodegen; cross-engine traps (libm last-ulp, double→int cast
  * semantics, regex dialects) are handled per SURVEY.md §7.4: round 4-6 dp,
  * avoid non-integral double→int casts, RE2-safe patterns only.
  */
object Scalars {

  val qStringFuncs = Q(
    "q_string_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS name_up, lower(p_brand) AS brand_lo,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  substr(p_name, 1, 5) AS name_pre,
      |  concat(p_brand, '-', p_type) AS brand_type,
      |  trim(concat(' ', p_name, ' ')) AS name_trim,
      |  replace(p_name, ' ', '_') AS name_us,
      |  lpad(p_brand, 12, '*') AS brand_pad,
      |  split_part(p_type, ' ', 1) AS type_head
      |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin) { (s, d) =>
    t(s, d, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_brand")).as("brand_lo"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        element_at(split(col("p_type"), " "), 1).as("type_head"))
      .orderBy("p_partkey")
      .limit(100)
  }

  val qRegexp = Q(
    "q_regexp",
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
      |  regexp_matches(p_type, '^(PROMO|LARGE)') AS is_promo_large,
      |  regexp_replace(p_name, '[aeiou]', '.', 'g') AS name_masked
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    t(s, d, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast(IntegerType)
          .as("brand_num"),
        col("p_type").rlike("^(PROMO|LARGE)").as("is_promo_large"),
        regexp_replace(col("p_name"), "[aeiou]", ".").as("name_masked"))
      .orderBy("p_partkey")
  }

  val qDateFuncs = Q(
    "q_date_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(month(o_orderdate) AS INT) AS o_month,
      |  CAST(quarter(o_orderdate) AS INT) AS o_quarter,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month_start,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
      |                 CAST(l_shipdate AS DATE)) AS INT) AS ship_days,
      |  CAST(o_orderdate AS DATE) + 30 AS due_date
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY l_orderkey, l_linenumber, ship_days LIMIT 300""".stripMargin) {
    (s, d) =>
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        quarter(col("o_orderdate")).as("o_quarter"),
        date_trunc("month", col("o_orderdate")).cast(DateType)
          .as("o_month_start"),
        datediff(col("l_shipdate").cast(DateType),
          col("o_orderdate").cast(DateType)).as("ship_days"),
        date_add(col("o_orderdate").cast(DateType), 30).as("due_date"))
      .orderBy("l_orderkey", "l_linenumber", "ship_days")
      .limit(300)
  }

  val qMathFuncs = Q(
    "q_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25) AS abs_q,
      |  CAST(floor(l_extendedprice / 100) AS BIGINT) AS floor_p,
      |  CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ceil_p,
      |  ROUND(sqrt(l_quantity), 6) AS sqrt_q,
      |  ROUND(ln(l_extendedprice), 6) AS ln_p,
      |  ROUND(exp(l_discount), 6) AS exp_d,
      |  ROUND(power(l_quantity, 2), 6) AS pow_q,
      |  l_orderkey % 7 AS mod_k,
      |  CAST(sign(l_discount - 0.05) AS INT) AS sign_d
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, ln_p, sqrt_q, exp_d
      |LIMIT 200""".stripMargin) {
    (s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("abs_q"),
          floor(col("l_extendedprice") / 100).as("floor_p"),
          ceil(col("l_extendedprice") / 100).as("ceil_p"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(pow(col("l_quantity"), 2), 6).as("pow_q"),
          (col("l_orderkey") % 7).as("mod_k"),
          signum(col("l_discount") - 0.05).cast(IntegerType).as("sign_d"))
        .orderBy("l_orderkey", "l_linenumber", "ln_p", "sqrt_q", "exp_d")
        .limit(200)
  }

  val qArrayFuncs = Q(
    "q_array_funcs",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS dim,
      |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
      |  ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_val,
      |  ROUND(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS min_val
      |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin) { (s, d) =>
    t(s, d, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast(DoubleType), 6)
          .as("first_val"),
        round(array_max(col("embedding")).cast(DoubleType), 6).as("max_val"),
        round(array_min(col("embedding")).cast(DoubleType), 6).as("min_val"))
      .orderBy("vec_id")
      .limit(100)
  }

  /** Array-manipulation battery (sort/slice/contains/distinct-size —
    * the subset with identical cross-engine semantics; list_distinct
    * ORDER and array_position null-vs-0 differ, so those stay out). */
  val qArrayOps = Q(
    "q_array_ops",
    """SELECT doc_id,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT)
      |    AS n_distinct,
      |  list_contains(string_split(text, ' '), 'the') AS has_the,
      |  list_sort(string_split(text, ' '))[1] AS first_sorted,
      |  array_to_string(string_split(text, ' ')[1:3], ' ') AS head3
      |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    t(s, d, "documents")
      .select(col("doc_id"),
        size(array_distinct(toks)).as("n_distinct"),
        array_contains(toks, "the").as("has_the"),
        element_at(array_sort(toks), 1).as("first_sorted"),
        array_join(slice(toks, 1, 3), " ").as("head3"))
      .orderBy("doc_id")
      .limit(200)
  }

  /** Deterministic date formatting (pattern dialects differ; outputs
    * must not). */
  val qDateFormat = Q(
    "q_date_format",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  strftime(o_orderdate, '%Y-%m-%d') AS ymd
      |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("ymd"))
      .orderBy("o_orderkey")
      .limit(300)
  }

  /** L2 norm via higher-order functions — sequential left fold in both
    * engines; round 4 dp absorbs summation-tree differences. */
  val qArrayHof = Q(
    "q_array_hof",
    """SELECT vec_id,
      |  ROUND(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
      |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin) { (s, d) =>
    t(s, d, "embeddings")
      .select(col("vec_id"),
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))), 4)
          .as("l2_norm"))
      .orderBy("vec_id")
      .limit(100)
  }

  val qJsonFuncs = Q(
    "q_json_funcs",
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
      |  count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .select((get_json_object(col("props"), "$.k").cast(IntegerType) % 10)
        .as("k_bucket"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("k_bucket")
  }

  /** Schema'd JSON parsing (from_json → struct field access) — the typed
    * counterpart of get_json_object path extraction. */
  val qJsonStruct = Q(
    "q_json_struct",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
      |FROM events ORDER BY event_id LIMIT 200""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .select(col("event_id"),
        from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k_val"))
      .orderBy("event_id")
      .limit(200)
  }

  /** VARIANT (Spark 4's open semi-structured type): parse_json into a
    * variant, typed extraction via variant_get — the schema-on-read path
    * for heterogeneous JSON at scale (shredded storage, no per-row schema
    * inference). Values equal the string-path extraction, so the oracle is
    * plain json_extract. */
  val qJsonVariant = Q(
    "q_json_variant",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_variant,
      |  CAST(json_extract_string(props, '$.missing') AS INT) AS absent
      |FROM events ORDER BY event_id LIMIT 200""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k_variant"),
        expr("try_variant_get(parse_json(props), '$.missing', 'int')")
          .as("absent"))
      .orderBy("event_id")
      .limit(200)
  }

  /** MapType construction/access — DuckDB map semantics differ, so no
    * oracle; round-trip covered in ScalaTest. */
  val qMapFuncs = Q.noOracle("q_map_funcs") { (s, d) =>
    t(s, d, "events")
      .select(col("event_id"),
        map(lit("type"), col("event_type"),
          lit("uid"), col("user_id").cast(StringType)).as("m"))
      .select(col("event_id"),
        element_at(col("m"), "type").as("type_from_map"),
        size(map_keys(col("m"))).as("n_keys"))
      .orderBy("event_id")
      .limit(100)
  }

  /** Systematic cast probes — only casts with identical cross-engine
    * semantics (notably NOT non-integral double→int: Spark truncates,
    * DuckDB rounds). */
  val qCastMatrix = Q(
    "q_cast_matrix",
    """SELECT n_nationkey,
      |  CAST(n_nationkey AS VARCHAR) AS k_str,
      |  CAST(CAST(n_nationkey AS VARCHAR) AS INT) AS k_roundtrip,
      |  CAST(n_nationkey AS DOUBLE) AS k_dbl,
      |  CAST(CAST(n_nationkey AS DECIMAL(10,2)) AS VARCHAR) AS k_dec,
      |  CAST(n_nationkey AS BIGINT) AS k_big,
      |  CAST('42' AS INT) AS lit_int,
      |  CAST('3.75' AS DOUBLE) AS lit_dbl,
      |  CAST('2024-06-01' AS DATE) AS lit_date,
      |  CAST(CAST('2024-06-01 12:30:45' AS TIMESTAMP) AS DATE) AS ts_date,
      |  CAST(CAST('2024-06-01' AS DATE) AS VARCHAR) AS date_str
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    t(s, d, "nation")
      .select(col("n_nationkey"),
        col("n_nationkey").cast(StringType).as("k_str"),
        col("n_nationkey").cast(StringType).cast(IntegerType).as("k_roundtrip"),
        col("n_nationkey").cast(DoubleType).as("k_dbl"),
        col("n_nationkey").cast(DecimalType(10, 2)).cast(StringType).as("k_dec"),
        col("n_nationkey").cast(LongType).as("k_big"),
        lit("42").cast(IntegerType).as("lit_int"),
        lit("3.75").cast(DoubleType).as("lit_dbl"),
        lit("2024-06-01").cast(DateType).as("lit_date"),
        lit("2024-06-01 12:30:45").cast(TimestampType).cast(DateType)
          .as("ts_date"),
        lit("2024-06-01").cast(DateType).cast(StringType).as("date_str"))
      .orderBy("n_nationkey")
  }

  /** Error-safe casts: TRY_CAST yields NULL instead of failing — the
    * ingestion-hardening primitive for dirty data at scale. */
  val qTryCast = Q(
    "q_try_cast",
    """SELECT p_partkey,
      |  TRY_CAST(p_type AS INT) AS bad_int,
      |  TRY_CAST(p_size AS TINYINT) AS small_int,
      |  TRY_CAST('2024-13-45' AS DATE) AS bad_date,
      |  TRY_CAST('123' AS INT) AS good_int
      |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin) { (s, d) =>
    t(s, d, "part")
      .selectExpr("p_partkey",
        "TRY_CAST(p_type AS INT) AS bad_int",
        "TRY_CAST(p_size AS TINYINT) AS small_int",
        "TRY_CAST('2024-13-45' AS DATE) AS bad_date",
        "TRY_CAST('123' AS INT) AS good_int")
      .orderBy("p_partkey")
      .limit(100)
  }

  /** Predicate higher-order functions (filter / exists / forall): count,
    * any, all over array elements without exploding. Spark evaluates the
    * native HOFs; the oracle expresses the identical semantics through
    * `list_filter` lengths (DuckDB's equivalents differ in NULL corner
    * cases, filter-length does not). Comparisons stay in float→double
    * promotion, identical both engines. */
  val qArrayPredicates = Q(
    "q_array_predicates",
    """SELECT vec_id,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
      |  CAST(len(list_filter(embedding, x -> abs(x) > 2)) > 0 AS INT)
      |    AS has_big,
      |  CAST(len(list_filter(embedding, x -> abs(x) >= 10)) = 0 AS INT)
      |    AS all_small
      |FROM embeddings ORDER BY vec_id LIMIT 200""".stripMargin) { (s, d) =>
    t(s, d, "embeddings")
      .select(col("vec_id"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        exists(col("embedding"), x => abs(x) > 2)
          .cast(IntegerType).as("has_big"),
        forall(col("embedding"), x => abs(x) < 10)
          .cast(IntegerType).as("all_small"))
      .orderBy("vec_id")
      .limit(200)
  }

  val all: Seq[Q] = Seq(
    qStringFuncs, qRegexp, qDateFuncs, qDateFormat, qMathFuncs, qArrayFuncs,
    qTryCast,
    qArrayOps, qArrayHof, qArrayPredicates, qJsonFuncs, qJsonStruct,
    qJsonVariant, qMapFuncs, qCastMatrix)
}
