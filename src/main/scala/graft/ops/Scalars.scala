package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY §2.8): string / regex / date / math /
  * conditional / cast / array / map / json / explode. All built-in
  * `functions._` — fully codegen'd, no UDFs in any hot path. Dialect
  * notes for the DuckDB oracle are inline where names differ.
  */
object Scalars {

  private def q(name: String, oracle: String)(
      df: (SparkSession, String) => DataFrame) = QuerySpec.sql(name, oracle)(df)

  val specs: Seq[QuerySpec] = Seq(

    q("q_str_funcs",
      """SELECT p_partkey,
        |  upper(p_brand) AS up_brand,
        |  lower(p_type) AS low_type,
        |  substring(p_name, 1, 8) AS name8,
        |  trim(concat(' ', p_name, ' ')) AS trimmed,
        |  length(p_name) AS name_len,
        |  replace(p_name, ' ', '_') AS name_us,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part
        |WHERE p_partkey < 500
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          upper(col("p_brand")).as("up_brand"),
          lower(col("p_type")).as("low_type"),
          substring(col("p_name"), 1, 8).as("name8"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("name_us"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          element_at(split(col("p_name"), " "), 1).as("first_word"))
        .orderBy("p_partkey")
    },

    // Regex restricted to the Java-regex ∩ RE2 shared subset; DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all.
    q("q_str_regex",
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  regexp_replace(p_type, '[aeiou]', '*', 'g') AS type_starred
        |FROM part
        |WHERE p_partkey < 500
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2)
            .as("second_word"),
          regexp_replace(col("p_type"), "[aeiou]", "*").as("type_starred"))
        .orderBy("p_partkey")
    },

    // DuckDB year()/date_diff() return BIGINT — cast to INT on that side;
    // Spark date_trunc returns TIMESTAMP so use trunc() (returns DATE).
    q("q_date_funcs",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dy,
        |  date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS d30,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders
        |WHERE o_orderkey < 300
        |ORDER BY o_orderkey""") { (s, d) =>
      val dt = col("o_orderdate").cast("date")
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          dt.as("d"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          trunc(dt, "month").as("month_start"),
          datediff(dt, lit("1995-01-01").cast("date")).as("days_since"),
          date_add(dt, 30).as("d30"),
          last_day(dt).as("month_end"))
        .orderBy("o_orderkey")
    },

    // DuckDB ceil/floor(double) return DOUBLE (Spark: BIGINT) — cast on
    // the DuckDB side. exp/ln/sqrt agree to the ulp on these inputs; the
    // round(…,6) absorbs any residue off the tie boundaries.
    q("q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_discount - 0.05), 6) AS abs_disc,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  round(pow(l_quantity, 2), 2) AS qty_sq,
        |  l_orderkey % 7 AS key_mod,
        |  CAST(sign(l_discount - 0.05) AS INT) AS sign_disc
        |FROM lineitem
        |WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber, ceil_price, abs_disc,
        |  exp_disc, sqrt_qty, ln_price""") { (s, d) =>
      // Output-covering ORDER BY: the synthetic lineitem holds
      // duplicate (orderkey, linenumber) pairs with differing values
      // (see q_scan_prune), so the key-only sort was not total.
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - 0.05), 6).as("abs_disc"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          floor(col("l_extendedprice")).as("floor_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          (col("l_orderkey") % 7).as("key_mod"),
          signum(col("l_discount") - 0.05).cast("int").as("sign_disc"))
        .orderBy("l_orderkey", "l_linenumber", "ceil_price", "abs_disc",
          "exp_disc", "sqrt_qty", "ln_price")
    },

    // Bitwise function family — the workhorses of hash/bucket/bitmask
    // pipelines (band hashing, bloom indexing, flag packing). Spelled
    // with operators where the engines agree (& | << >>) and functions
    // where they differ (Spark `^` is xor, DuckDB `^` is POWER — the
    // DuckDB text uses xor()). Narrow map over a pruned scan.
    q("q_bit_funcs",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS k_and,
        |  o_orderkey | 4096 AS k_or,
        |  xor(o_orderkey, o_custkey) AS k_xor,
        |  o_orderkey << 2 AS k_shl,
        |  o_orderkey >> 3 AS k_shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS k_pop
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          expr("o_orderkey & 255").as("k_and"),
          expr("o_orderkey | 4096").as("k_or"),
          expr("o_orderkey ^ o_custkey").as("k_xor"),
          shiftleft(col("o_orderkey"), 2).as("k_shl"),
          shiftright(col("o_orderkey"), 3).as("k_shr"),
          bit_count(col("o_orderkey")).cast("int").as("k_pop"))
        .orderBy("o_orderkey")
    },

    q("q_cond_expr",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'high'
        |       WHEN o_totalprice > 50000 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x,
        |  round(greatest(o_totalprice, 100000.0), 2) AS hi,
        |  round(least(o_totalprice, 100000.0), 2) AS lo
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 200000, "high")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("low").as("price_band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_x"),
          round(greatest(col("o_totalprice"), lit(100000.0)), 2).as("hi"),
          round(least(col("o_totalprice"), lit(100000.0)), 2).as("lo"))
        .orderBy("o_orderkey")
    },

    // Casts. decimal(18,2) only as an intermediate (cast back to double,
    // §2.13 rule 7) and only on an already-2-decimal column, where the
    // cast is exact — cross-engine decimal rounding of ties differs.
    q("q_cast",
      """SELECT o_orderkey,
        |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(o_totalprice > 100000 AS INT) AS is_big
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("prio_num"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("price_dec"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_orderkey").cast("string").as("key_str"),
          (col("o_totalprice") > 100000).cast("int").as("is_big"))
        .orderBy("o_orderkey")
    },

    // Arrays stay internal; outputs are scalars (§2.13 rule 7).
    q("q_arr_funcs",
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0)) AS n_words,
        |  list_contains(list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0), 'scan') AS has_scan,
        |  list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0)[3] AS third_word,
        |  array_to_string(list_slice(list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0), 1, 3), ',')
        |    AS first3,
        |  list_sort(list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0))[2] AS second_sorted,
        |  len(list_distinct(list_intersect(list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0),
        |    ['scan', 'filter', 'window']))) AS n_common,
        |  len(list_distinct(list_concat(list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0),
        |    ['scan', 'filter', 'window']))) AS n_union
        |FROM documents
        |WHERE doc_id < 200
        |ORDER BY doc_id""") { (s, d) =>
      val words = graft.ops.TextSim.normTokens(col("text"))
      val probe = array(lit("scan"), lit("filter"), lit("window"))
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          size(words).as("n_words"),
          array_contains(words, "scan").as("has_scan"),
          element_at(words, 3).as("third_word"),
          concat_ws(",", slice(words, 1, 3)).as("first3"),
          element_at(array_sort(words), 2).as("second_sorted"),
          size(array_distinct(array_intersect(words, probe))).as("n_common"),
          size(array_union(words, probe)).as("n_union"))
        .orderBy("doc_id")
    },

    // Map built from JSON, exploded to (key, value) rows. DuckDB 1.0.0
    // has no json_each table function — unnest(json_keys()) + extract is
    // the equivalent lateral form.
    q("q_map_funcs",
      """SELECT event_id, key,
        |  CAST(json_extract_string(props, concat('$.', key)) AS INT) AS value
        |FROM events, unnest(json_keys(events.props)) AS u(key)
        |ORDER BY event_id, key""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          explode(from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))))
        .orderBy("event_id", "key")
    },

    q("q_json_funcs",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        |FROM events
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"))
        .orderBy("event_id")
    },

    // Lateral explode: 1 row -> N rows (FileMap's per-line flatMap).
    q("q_explode",
      """SELECT lang, word, count(*) AS n
        |FROM (SELECT lang, unnest(list_filter(regexp_split_to_array(regexp_replace(lower(nfc_normalize(text)), '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), '[^\p{L}\p{N}]+'), x -> len(x) > 0)) AS word
        |      FROM documents) t
        |GROUP BY lang, word
        |ORDER BY lang, word""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(graft.ops.TextSim.normTokens(col("text"))).as("word"))
        .groupBy("lang", "word")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "word")
    }
  )
}
