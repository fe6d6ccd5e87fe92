package graft.ops

import graft.Tables
import graft.functions.TicketFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scalar-function inventory (SURVEY.md §2.8): date/time, JSON, string, and
  * conditional expressions — all codegen'd built-ins, each paired with
  * equivalent DuckDB SQL. */
object Scalars {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val qs: Seq[Q] = Seq(

    // F4/F5 — epoch-seconds → formatted string with the reference's 0→NULL
    // quirk (main.py:234-250). Epochs derived from o_orderdate for fixture
    // input; expression shape identical to the ticket transform.
    Q("f4_epoch_format",
      (s, dir) => {
        val epoch = col("o_orderdate").cast("timestamp_ltz").cast("long")
        t(s, dir, "orders")
          .select(col("o_orderkey"), epoch.as("epoch_s"),
            secondsToReadable(epoch).as("created_dt"),
            secondsToDateOnly(epoch).as("created_d"))
          .filter(col("o_orderkey") <= 500)
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
              CASE WHEN epoch(o_orderdate) = 0 THEN NULL
                   ELSE strftime(epoch_ms(CAST(epoch(o_orderdate) AS BIGINT) * 1000),
                                 '%Y-%m-%d %H:%M:%S') END AS created_dt,
              CASE WHEN epoch(o_orderdate) = 0 THEN NULL
                   ELSE strftime(epoch_ms(CAST(epoch(o_orderdate) AS BIGINT) * 1000),
                                 '%Y-%m-%d') END AS created_d
              FROM orders WHERE o_orderkey <= 500
              ORDER BY o_orderkey ASC NULLS FIRST""")),

    // Date bucketing — month truncation + extraction (engine-native types).
    Q("f_date_trunc",
      (s, dir) => t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("month"),
      Some("""SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY 1 ORDER BY month ASC NULLS FIRST""")),

    Q("f_date_parts",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          quarter(col("o_orderdate")).cast("long").as("q"))
        .filter(col("o_orderkey") <= 300)
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
              CAST(month(o_orderdate) AS BIGINT) AS m,
              CAST(day(o_orderdate) AS BIGINT) AS d,
              CAST(quarter(o_orderdate) AS BIGINT) AS q
              FROM orders WHERE o_orderkey <= 300
              ORDER BY o_orderkey ASC NULLS FIRST""")),

    // F8/F9-adjacent — JSON extraction from events.props ('{"k": 87}').
    Q("f_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .filter(col("event_id") < 500)
        .orderBy("event_id"),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
              FROM events WHERE event_id < 500
              ORDER BY event_id ASC NULLS FIRST""")),

    // JSON aggregation — group by an extracted key bucket.
    Q("f_json_agg",
      (s, dir) => t(s, dir, "events")
        .select((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"))
        .groupBy("k_bucket").agg(count(lit(1)).as("n"))
        .orderBy("k_bucket"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
              count(*) AS n FROM events GROUP BY 1
              ORDER BY k_bucket ASC NULLS FIRST""")),

    // MapType surface: JSON → map<string,string> → key/size/value access.
    Q("f_map_funcs",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")).as("m"))
        .select(col("event_id"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_str"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          element_at(col("m"), "k").cast("long").as("k_val"))
        .filter(col("event_id") < 400)
        .orderBy("event_id"),
      Some("""SELECT event_id,
              array_to_string(list_sort(json_keys(props)), ',') AS keys_str,
              CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
              FROM events WHERE event_id < 400
              ORDER BY event_id ASC NULLS FIRST""")),

    // String functions — upper/lower/substring/length/concat/regexp/trim
    // (F3/F12, main.py:116,122 + f-string concat shapes).
    Q("f_string_funcs",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).cast("long").as("name_len"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("tagged"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("digitless"),
          trim(regexp_replace(col("c_name"), "\\s+", " ")).as("collapsed"))
        .filter(col("c_custkey") <= 400)
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
              substring(c_name, 1, 8) AS prefix,
              CAST(length(c_name) AS BIGINT) AS name_len,
              concat_ws('-', c_mktsegment, c_name) AS tagged,
              regexp_replace(c_name, '[0-9]+', '#', 'g') AS digitless,
              trim(regexp_replace(c_name, '\s+', ' ', 'g')) AS collapsed
              FROM customer WHERE c_custkey <= 400
              ORDER BY c_custkey ASC NULLS FIRST""")),

    // P4/P6/F7 — CASE/COALESCE/NULLIF conditional shapes.
    Q("f_case_null",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") < 50, "low")
            .when(col("value") < 150, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("event_type"), lit("error")), lit("unknown")).as("etype"),
          when(col("value") < 0, lit(null)).otherwise(col("value")).as("clamped"))
        .filter(col("event_id") < 500)
        .orderBy("event_id"),
      Some("""SELECT event_id,
              CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid'
                   ELSE 'high' END AS band,
              coalesce(nullif(event_type, 'error'), 'unknown') AS etype,
              CASE WHEN value < 0 THEN NULL ELSE value END AS clamped
              FROM events WHERE event_id < 500
              ORDER BY event_id ASC NULLS FIRST""")),

    // Math/arithmetic surface: exact modulo/rounded products on BIGINT/DOUBLE.
    Q("f_math",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") % 7).as("mod7"),
          (col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)").cast("double").as("disc_amt"),
          floor(col("l_quantity")).cast("long").as("qty_floor"),
          ceil(col("l_quantity") / 2).cast("long").as("half_up"),
          abs(col("l_discount") - 0.05).cast("decimal(10,6)").cast("double").as("disc_dev"))
        .filter(col("l_orderkey") <= 600)
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_orderkey % 7 AS mod7,
              CAST(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)) AS DOUBLE) AS disc_amt,
              CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
              CAST(ceil(l_quantity / 2) AS BIGINT) AS half_up,
              CAST(CAST(abs(l_discount - 0.05) AS DECIMAL(10,6)) AS DOUBLE) AS disc_dev
              FROM lineitem WHERE l_orderkey <= 600
              ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""))
  )
}
