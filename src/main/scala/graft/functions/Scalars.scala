package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** SURVEY.md §2 Part B — scalar function families (string / date / math /
  * JSON / array / map), the Redshift-builtin surface reachable through the
  * reference's SQL passthrough (`core.py:84`). Everything is
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd); no UDFs here.
  *
  * Cross-engine numeric notes: transcendentals (ln) are rounded to 6dp
  * because libm implementations may differ in the last ulp; sqrt is IEEE
  * exactly-rounded (safe raw); round() on a double computed by division has
  * no decimal ties, so HALF_UP (Spark) vs away-from-zero (DuckDB) agree.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, Q] = Map(

    "q_fn_string" -> Q(
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_brand) AS lbrand,
        |  substring(p_name, 1, 5) AS name5,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  trim(concat(' ', p_name, ' ')) AS trimmed,
        |  replace(p_name, 'a', '@') AS repl,
        |  length(p_name) AS name_len,
        |  (p_name LIKE '%or%') AS has_or,
        |  (p_type ILIKE 'b%') AS starts_b,
        |  regexp_replace(p_type, '[aeiou]', '_') AS devowel
        |FROM part
        |WHERE p_name LIKE '%o%' AND p_brand SIMILAR TO 'Brand#[0-9]+'
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("%o%") && col("p_brand").rlike("^Brand#[0-9]+$"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          substring(col("p_name"), 1, 5).as("name5"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
          regexp_replace(col("p_name"), "a", "@").as("repl"),
          length(col("p_name")).cast(LongType).as("name_len"),
          col("p_name").like("%or%").as("has_or"),
          col("p_type").ilike("b%").as("starts_b"),
          regexp_replace(col("p_type"), "[aeiou]", "_").as("devowel"))
        .orderBy(col("p_partkey"))
    },

    // Regex family beyond q_fn_string's replace/rlike: extract, match
    // count, split_part, translate. Patterns chosen to be valid in both
    // Java regex (Spark) and RE2 (DuckDB), and guaranteed to match (every
    // c_name is 'Customer#<digits>') so no-match semantics never diverge.
    "q_fn_regex" -> Q(
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)$', 1) AS tail_digits,
        |  regexp_matches(c_name, '00') AS has_00,
        |  cast(len(regexp_extract_all(c_name, '0')) as bigint) AS n_zeros,
        |  split_part(c_name, '#', 2) AS after_hash,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("tail_digits"),
          col("c_name").rlike("00").as("has_00"),
          regexp_count(col("c_name"), lit("0")).cast(LongType).as("n_zeros"),
          split_part(col("c_name"), lit("#"), lit(2)).as("after_hash"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lowvowel"))
        .orderBy(col("c_custkey"))
    },

    // Null-handling family: nullif/coalesce/ifnull plus greatest/least
    // (both engines follow the Postgres rule — nulls are skipped, not
    // propagated). Nulls are MANUFACTURED deterministically via nullif so
    // the null paths are actually exercised on null-free testdata.
    "q_fn_null" -> Q(
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
        |  ifnull(nullif(o_orderpriority, o_orderpriority), 'none') AS always_none,
        |  greatest(o_totalprice, 100000.0) AS at_least,
        |  least(cast(o_orderkey as double), o_totalprice) AS smaller
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
          coalesce(nullif(col("o_orderpriority"), col("o_orderpriority")), lit("none"))
            .as("always_none"),
          greatest(col("o_totalprice"), lit(100000.0)).as("at_least"),
          least(col("o_orderkey").cast(DoubleType), col("o_totalprice")).as("smaller"))
        .orderBy(col("o_orderkey"))
    },

    // Date/time family. DuckDB's dayofweek starts Sunday=0 while Spark's
    // starts Sunday=1, so the portable form is ISO weekday (Spark
    // weekday()+1 == DuckDB isodow).
    "q_fn_date" -> Q(
      """SELECT o_orderkey,
        |  cast(o_orderdate as date) AS odate,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
        |  quarter(o_orderdate) AS qtr,
        |  isodow(o_orderdate) AS iso_dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  cast(o_orderdate as date) + 30 AS plus30,
        |  datediff('day', DATE '1995-01-01', cast(o_orderdate as date)) AS days_since,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("odate"),
          // Spark date parts are INT, DuckDB's are BIGINT — cast for parity.
          year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mo"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
          quarter(col("o_orderdate")).cast(LongType).as("qtr"),
          (weekday(col("o_orderdate")) + 1).cast(LongType).as("iso_dow"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast(DateType), 30).as("plus30"),
          datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
            .cast(LongType).as("days_since"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy(col("o_orderkey"))
    },

    "q_fn_math" -> Q(
      """SELECT p_partkey,
        |  round(p_retailprice / 7.0, 3) AS div_round,
        |  floor(p_retailprice) AS fl, ceil(p_retailprice) AS ce,
        |  abs(p_size - 25) AS dist25,
        |  p_size * p_size AS sq,
        |  sqrt(p_retailprice) AS rt,
        |  round(ln(p_retailprice), 6) AS lnp,
        |  p_partkey % 7 AS m7
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          round(col("p_retailprice") / 7.0, 3).as("div_round"),
          // Spark floor/ceil return LONG, DuckDB return DOUBLE — cast for
          // schema parity with the oracle.
          floor(col("p_retailprice")).cast(DoubleType).as("fl"),
          ceil(col("p_retailprice")).cast(DoubleType).as("ce"),
          abs(col("p_size") - 25).as("dist25"),
          (col("p_size") * col("p_size")).as("sq"),
          sqrt(col("p_retailprice")).as("rt"),
          round(log(col("p_retailprice")), 6).as("lnp"),
          (col("p_partkey") % 7).as("m7"))
        .orderBy(col("p_partkey"))
    },

    // Bitwise family (Redshift &, |, #, ~, <<, >>).
    "q_fn_bitwise" -> Q(
      """SELECT p_partkey,
        |  p_partkey & 255 AS band, p_partkey | 15 AS bor,
        |  xor(p_partkey, 85) AS bxor,
        |  p_partkey << 2 AS shl, p_partkey >> 3 AS shr,
        |  cast(bit_count(p_partkey) as bigint) AS popcount
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          col("p_partkey").bitwiseAND(255).as("band"),
          col("p_partkey").bitwiseOR(15).as("bor"),
          col("p_partkey").bitwiseXOR(85).as("bxor"),
          expr("shiftleft(p_partkey, 2)").as("shl"),
          expr("shiftright(p_partkey, 3)").as("shr"),
          bit_count(col("p_partkey")).cast(LongType).as("popcount"))
        .orderBy(col("p_partkey"))
    },

    // JSON extraction (Redshift json_extract_path_text; events.props is a
    // JSON string). Spark get_json_object ≡ DuckDB json_extract_string.
    "q_fn_json" -> Q(
      """SELECT k % 10 AS k_bucket, count(*) AS n, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT cast(json_extract_string(props, '$.k') as bigint) AS k
        |      FROM events)
        |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("k_bucket"))
    },

    // Semi-structured VARIANT path (round 9; Spark 4's SUPER/VARIANT
    // analogue of Redshift's json_extract_path_text surface): parse the
    // props JSON ONCE into the binary VARIANT encoding, then run typed
    // extractions off it — at scale this is the parse-once/extract-many
    // (and, with shredded parquet variant columns, scan-pruned) path
    // that q_fn_json's per-call string reparse is not. try_variant_get
    // returns NULL on missing/mistyped paths on the engine side exactly
    // where DuckDB's json_extract_string returns NULL, so the aggregate
    // parity is total. All-integer outputs; one map-side-combinable agg.
    "q_variant_agg" -> Q(
      """SELECT event_type,
        |  cast(count(*) as bigint) AS n_events,
        |  cast(count(k) as bigint) AS n_with_k,
        |  cast(sum(k) as bigint) AS sum_k,
        |  cast(count(DISTINCT k) as bigint) AS n_distinct_k,
        |  cast(min(k) as bigint) AS min_k,
        |  cast(max(k) as bigint) AS max_k
        |FROM (SELECT event_type,
        |        cast(json_extract_string(props, '$.k') as bigint) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("try_variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("n_distinct_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },

    // Array family via higher-order functions over embeddings (Redshift
    // has no true arrays — ARRAY is reserved, redshift_reserve_words.txt:9
    // — so this is engine surface beyond the reference).
    "q_fn_array" -> Q(
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(cast(embedding[1] as double), 6) AS e1,
        |  cast(embedding[1] as double) + cast(embedding[2] as double)
        |    + cast(embedding[3] as double) + cast(embedding[4] as double) AS head_sum,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  round(cast(list_aggregate(embedding, 'max') as double), 6) AS vmax,
        |  round(cast(list_aggregate(embedding, 'min') as double), 6) AS vmin
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          // Spark size() is INT, DuckDB len() is BIGINT — cast for parity.
          size(col("embedding")).cast(LongType).as("dim"),
          round(element_at(col("embedding"), 1).cast(DoubleType), 6).as("e1"),
          (element_at(col("embedding"), 1).cast(DoubleType)
            + element_at(col("embedding"), 2).cast(DoubleType)
            + element_at(col("embedding"), 3).cast(DoubleType)
            + element_at(col("embedding"), 4).cast(DoubleType)).as("head_sum"),
          size(filter(col("embedding"), x => x > 0f)).cast(LongType).as("n_pos"),
          round(array_max(col("embedding")).cast(DoubleType), 6).as("vmax"),
          round(array_min(col("embedding")).cast(DoubleType), 6).as("vmin"))
        .orderBy(col("vec_id"))
    },

    // Map construction + lookup (Spark-side extension; the oracle inverts
    // the construction, so lookups must round-trip the source columns).
    "q_fn_map" -> Q(
      """SELECT o_orderkey, o_orderstatus AS status_v, o_orderpriority AS pri_v,
        |  2 AS n_keys
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val m = map_from_arrays(
        array(lit("status"), lit("priority")),
        array(col("o_orderstatus"), col("o_orderpriority")))
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"), m.as("m"))
        .select(
          col("o_orderkey"),
          element_at(col("m"), "status").as("status_v"),
          element_at(col("m"), "priority").as("pri_v"),
          size(map_keys(col("m"))).as("n_keys"))
        .orderBy(col("o_orderkey"))
    }
  )
}
