package graft.queries

import org.apache.spark.sql.functions._

/** Scalar-function surface — SURVEY.md §2.8: string, date, JSON and
  * array built-ins (all codegen'd `functions._`; no UDFs, per the
  * reference-parity policy in §2.10).
  *
  * Derived integers are cast to BIGINT (DuckDB's year()/length()/len()
  * return BIGINT where Spark returns INT — schema parity).
  */
object ScalarQueries {

  val queries: Map[String, QFn] = Map(
    // F5-style parsing: regexp_extract / substr / upper / length.
    "q_string_funcs" -> { (s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          upper(substring(col("p_name"), 1, 5)).as("head5"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy(col("p_partkey"))
    },

    // F2/F3/F4: year/month, weekend flag (Spark dayofweek Sun=1..Sat=7
    // vs DuckDB Sun=0..Sat=6 — mapped explicitly, SURVEY §7.3 rule 6),
    // date_trunc to month.
    "q_date_funcs" -> { (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofweek(col("o_orderdate")).isin(1, 7).as("is_weekend"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"))
        .orderBy(col("o_orderkey"))
    },

    // JSON scalar extraction from the events.props JSON string.
    "q_json_extract" -> { (s, d) =>
      ExtendedQueries.eventProfile(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },

    // Array ops over the 64-dim embedding column. float→double is an
    // exact widening on both engines.
    "q_array_ops" -> { (s, d) =>
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_v"),
          element_at(col("embedding"), 64).cast("double").as("last_v"))
        .orderBy(col("vec_id"))
    },

    // Array statistics: min/max element and a sequential-fold sum of
    // the first 8 elements (rounded — cross-engine fold safety).
    "q_array_stats" -> { (s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(
          col("vec_id"),
          array_max(col("v")).as("amax"),
          array_min(col("v")).as("amin"),
          round(aggregate(slice(col("v"), 1, 8), lit(0.0), (acc, x) => acc + x), 4).as("head8_sum"))
        .orderBy(col("vec_id"))
    },

    // Map functions over JSON-derived maps: from_json to MAP, then
    // map_keys/map_values/element_at (SURVEY §2.8's map row). The
    // fixture props is a single-key object, so key order is trivially
    // stable. Outputs are SCALAR columns (concat_ws over the arrays +
    // the looked-up value): the driver's pandas compare sorts column
    // values and cannot hash ARRAY cells.
    "q_map_ops" -> { (s, d) =>
      ExtendedQueries.eventProfile(s, d)
        .select(col("event_id"),
          expr("from_json(props, 'map<string,bigint>')").as("m"))
        .select(col("event_id"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          concat_ws(",", map_keys(col("m"))).as("ks"),
          concat_ws(",", map_values(col("m")).cast("array<string>")).as("vs"),
          element_at(col("m"), "k").as("k_val"))
        .orderBy(col("event_id"))
    },

    // Date arithmetic: day diff to a pinned date, month addition with
    // end-of-month clamping (identical in Spark add_months and DuckDB
    // interval addition), last_day, quarter truncation.
    "q_date_arith" -> { (s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_98"),
          add_months(col("o_orderdate"), 3).as("plus3m"),
          last_day(col("o_orderdate")).as("eom"),
          date_trunc("quarter", col("o_orderdate")).cast("timestamp_ntz").as("qtr"))
        .orderBy(col("o_orderkey"))
    },
  )

  val sql: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
        |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |       upper(substr(p_name, 1, 5)) AS head5,
        |       length(p_name) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mo,
        |       dayofweek(o_orderdate) IN (0, 6) AS is_weekend,
        |       date_trunc('month', o_orderdate) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_array_ops" ->
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_v,
        |       CAST(embedding[64] AS DOUBLE) AS last_v
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_array_stats" ->
      """SELECT vec_id,
        |       list_max(v) AS amax,
        |       list_min(v) AS amin,
        |       round(list_sum(v[1:8]), 4) AS head8_sum
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |ORDER BY vec_id""".stripMargin,

    "q_map_ops" ->
      """SELECT event_id,
        |       len(json_keys(props)) AS n_keys,
        |       array_to_string(json_keys(props), ',') AS ks,
        |       array_to_string(list_transform(json_keys(props),
        |         k -> json_extract_string(props, '$.' || k)), ',') AS vs,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_date_arith" ->
      """SELECT o_orderkey,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |       last_day(CAST(o_orderdate AS DATE)) AS eom,
        |       date_trunc('quarter', o_orderdate) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
