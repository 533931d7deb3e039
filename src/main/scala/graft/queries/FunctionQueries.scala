package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Builtins

/** Scalar-function inventory — SURVEY.md §2.7 (reference
  * `lib/builtins.ex` [U]). Each exosql builtin exercised at least once,
  * with a DuckDB-expressible oracle. Nondeterministic builtins
  * (`now`, `random`, `randint`) are covered in BuiltinsSpec instead.
  */
object FunctionQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_string" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "customer").select(
        $"c_custkey",
        lower($"c_name").as("lo"),
        upper($"c_name").as("up"),
        trim(concat(lit("  "), $"c_name", lit(" "))).as("tr"),
        substring($"c_name", 1, 8).as("sub8"),
        array_join(split($"c_name", "#"), "-").as("joined"),
        length($"c_name").as("len"),
        concat($"c_name", lit("|"), $"c_mktsegment").as("cat"))
    }),
    "f_levenshtein" -> ((s, d) => {
      import s.implicits._
      // edit distance (fuzzy matching / typo-tolerant dedup): codegen'd
      // built-in in both engines, deterministic ints
      Tables.load(s, d, "customer").select(
        $"c_custkey",
        levenshtein($"c_name", lit("Customer#000000042")).as("d_fixed"),
        levenshtein(lower($"c_mktsegment"), lit("machinery")).as("d_seg"))
    }),
    "f_substr_neg" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "part").select(
        $"p_partkey",
        Builtins.exo_substr($"p_name", -4).as("last4"),
        Builtins.exo_substr($"p_name", 2, 3).as("mid"),
        Builtins.exo_substr($"p_name", -6, 2).as("tail2"),
        Builtins.exo_substr($"p_name", 1).as("whole"))
    }),
    "f_format" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "part").select(
        $"p_partkey",
        Builtins.format("%s [%d] %.2f", $"p_name", $"p_size", $"p_retailprice").as("line"),
        Builtins.format("%08d", $"p_partkey".cast(IntegerType)).as("padded"),
        // exosql format's thousands-separator verb (SURVEY §2.7) — java
        // Formatter's grouping flag, still codegen'd format_string
        Builtins.format("%,d", ($"p_partkey" * 100000L).cast(LongType)).as("grouped"))
    }),
    "f_json_parse" -> ((s, d) => {
      import s.implicits._
      // the json() builtin (ParseJson → VariantType) + typed extraction;
      // jp() covers path extraction over raw text, this gates the parse
      Builtins.registerAll(s)
      Tables.load(s, d, "events").select(
        $"event_id",
        expr("CAST(try_variant_get(json(props), '$.k', 'bigint') AS BIGINT)").as("k_int"),
        expr("CAST(try_variant_get(json(props), '$.k', 'string') AS STRING)").as("k_str"),
        expr("try_variant_get(json(props), '$.nope', 'string')").as("absent"))
    }),
    "f_strftime" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders").select(
        $"o_orderkey",
        Builtins.strftime($"o_orderdate", "%Y-%m-%d").as("ymd"),
        Builtins.strftime($"o_orderdate", "%d/%m/%y %H:%M:%S").as("dmy"),
        Builtins.strftime($"o_orderdate", "%A %B %j").as("names"),
        Builtins.strftime($"o_orderdate", "day %w of week %% done").as("wd"))
    }),
    "f_datetime" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events").select(
        $"event_id",
        Builtins.to_datetime(lit(1700000000L) + $"event_id").as("dt"),
        Builtins.exo_to_timestamp($"ts").as("epoch_s"),
        year($"ts").as("y"), month($"ts").as("mo"), dayofmonth($"ts").as("dom"),
        hour($"ts").as("h"), minute($"ts").as("mi"), second($"ts").as("sec"))
    }),
    "f_datediff" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
      o.join(l, $"o_orderkey" === $"l_orderkey")
        .filter($"o_orderkey" < 100)
        .select($"o_orderkey", $"l_linenumber",
          datediff($"l_shipdate", $"o_orderdate").as("ship_lag_days"))
    }),
    "f_json" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events").select(
        $"event_id",
        Builtins.jp($"props", "k").as("k_str"),
        Builtins.to_number(Builtins.jp($"props", "k")).as("k_num"),
        Builtins.jp($"props", "$.missing").as("absent"))
    }),
    "f_urlparse" -> ((s, d) => {
      import s.implicits._
      val url = concat(lit("https://ex.com/p/"), $"l_orderkey",
        lit("?u="), $"l_suppkey", lit("&v=2"))
      Tables.load(s, d, "lineitem").filter($"l_orderkey" < 200)
        .select($"l_orderkey", $"l_linenumber",
          Builtins.urlparse(url, "host").as("host"),
          Builtins.urlparse(url, "path").as("path"),
          Builtins.urlparse(url, "query").as("q"),
          Builtins.urlparse(url, "query.u").as("q_u"),
          Builtins.urlparse(url, "scheme").as("scheme"))
    }),
    "f_regex" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "part").select(
        $"p_partkey",
        Builtins.regex($"p_name", "[a-z]+").as("word1"),
        Builtins.regex($"p_name", "([a-z]+) ([a-z]+)", 2).as("word2"),
        $"p_name".rlike("^(red|blue)").as("is_colored"),
        element_at(
          Builtins.regex_named($"p_name", lit("(?<first>[a-z]+) (?<second>[a-z]+)")),
          "second").as("named_second"))
    }),
    "f_regex_all" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "documents").select(
        $"doc_id",
        array_join(Builtins.regex_all($"text", "(s[a-z]+)", 1), ",").as("s_words"),
        size(Builtins.regex_all($"text", "(s[a-z]+)", 1)).as("n_s_words"))
    }),
    "f_cast" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "supplier").select(
        $"s_suppkey",
        Builtins.to_string($"s_acctbal").as("bal_str"),
        Builtins.to_number(concat(lit(""), $"s_nationkey")).as("nk_num"),
        Builtins.to_number(lit("not a number")).as("bad"),
        Builtins.to_number(lit("3.25")).as("good"))
    }),
    "f_coalesce" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders").select(
        $"o_orderkey",
        coalesce(nullif($"o_orderstatus", lit("P")), lit("pending")).as("status"),
        nullif($"o_orderpriority", lit("5-LOW")).as("prio_or_null"))
    }),
    "f_round_trunc" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "customer").select(
        $"c_custkey",
        round($"c_acctbal" / 7.0, 4).as("div_round"),
        Builtins.exo_trunc($"c_acctbal").as("trunc_bal"),
        floor($"c_acctbal").as("floor_bal"),
        ceil($"c_acctbal").as("ceil_bal"),
        abs($"c_acctbal").as("abs_bal"))
    }),
    "f_width_bucket" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          width_bucket($"l_quantity", lit(0.0), lit(50.0), lit(10L)).as("bucket"))
    }),
    "f_series_scalar" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "region").select(
        $"r_regionkey",
        expr("array_join(transform(sequence(1, r_regionkey + 1), x -> cast(x as string)), ',')")
          .as("series"))
    })
  )

  def oracle: Map[String, String] = Map(
    "f_string" ->
      """SELECT c_custkey, lower(c_name) AS lo, upper(c_name) AS up,
                trim('  ' || c_name || ' ') AS tr,
                substr(c_name, 1, 8) AS sub8,
                array_to_string(string_split(c_name, '#'), '-') AS joined,
                length(c_name) AS len,
                c_name || '|' || c_mktsegment AS cat
         FROM customer""",
    "f_levenshtein" ->
      """SELECT c_custkey,
                levenshtein(c_name, 'Customer#000000042') AS d_fixed,
                levenshtein(lower(c_mktsegment), 'machinery') AS d_seg
         FROM customer""",
    "f_substr_neg" ->
      """SELECT p_partkey,
                substr(p_name, -4) AS last4,
                substr(p_name, 2, 3) AS mid,
                substr(p_name, -6, 2) AS tail2,
                substr(p_name, 1) AS whole
         FROM part""",
    "f_format" ->
      """SELECT p_partkey,
                printf('%s [%d] %.2f', p_name, p_size, p_retailprice) AS line,
                printf('%08d', CAST(p_partkey AS INTEGER)) AS padded,
                format('{:,}', p_partkey * 100000) AS grouped
         FROM part""",
    "f_json_parse" ->
      """SELECT event_id,
                CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
                CAST(json_extract(props, '$.k') AS VARCHAR) AS k_str,
                CAST(NULL AS VARCHAR) AS absent
         FROM events""",
    "f_strftime" ->
      """SELECT o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS ymd,
                strftime(o_orderdate, '%d/%m/%y %H:%M:%S') AS dmy,
                strftime(o_orderdate, '%A %B %j') AS names,
                strftime(o_orderdate, 'day %w of week %% done') AS wd
         FROM orders""",
    "f_datetime" ->
      """SELECT event_id,
                CAST(to_timestamp(1700000000 + event_id) AS TIMESTAMP) AS dt,
                CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
                CAST(year(ts) AS INTEGER) AS y,
                CAST(month(ts) AS INTEGER) AS mo,
                CAST(day(ts) AS INTEGER) AS dom,
                CAST(hour(ts) AS INTEGER) AS h,
                CAST(minute(ts) AS INTEGER) AS mi,
                CAST(CAST(floor(extract(second FROM ts)) AS BIGINT) AS INTEGER) AS sec
         FROM events""",
    "f_datediff" ->
      """SELECT o_orderkey, l_linenumber,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
                     AS INTEGER) AS ship_lag_days
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey < 100""",
    "f_json" ->
      """SELECT event_id,
                json_extract_string(props, '$.k') AS k_str,
                try_cast(json_extract_string(props, '$.k') AS DOUBLE) AS k_num,
                json_extract_string(props, '$.missing') AS absent
         FROM events""",
    "f_urlparse" ->
      """SELECT l_orderkey, l_linenumber,
                'ex.com' AS host,
                '/p/' || l_orderkey AS path,
                'u=' || l_suppkey || '&v=2' AS q,
                CAST(l_suppkey AS VARCHAR) AS q_u,
                'https' AS scheme
         FROM lineitem WHERE l_orderkey < 200""",
    "f_regex" ->
      """SELECT p_partkey,
                regexp_extract(p_name, '[a-z]+', 0) AS word1,
                regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS word2,
                regexp_matches(p_name, '^(red|blue)') AS is_colored,
                regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS named_second
         FROM part""",
    "f_regex_all" ->
      """SELECT doc_id,
                coalesce(array_to_string(regexp_extract_all(text, '(s[a-z]+)', 1), ','), '') AS s_words,
                CAST(len(regexp_extract_all(text, '(s[a-z]+)', 1)) AS INTEGER) AS n_s_words
         FROM documents""",
    "f_cast" ->
      """SELECT s_suppkey,
                CAST(s_acctbal AS VARCHAR) AS bal_str,
                try_cast('' || s_nationkey AS DOUBLE) AS nk_num,
                try_cast('not a number' AS DOUBLE) AS bad,
                try_cast('3.25' AS DOUBLE) AS good
         FROM supplier""",
    "f_coalesce" ->
      """SELECT o_orderkey,
                coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status,
                nullif(o_orderpriority, '5-LOW') AS prio_or_null
         FROM orders""",
    "f_round_trunc" ->
      """SELECT c_custkey,
                round(c_acctbal / 7.0, 4) AS div_round,
                CAST(trunc(c_acctbal) AS BIGINT) AS trunc_bal,
                CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
                CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
                abs(c_acctbal) AS abs_bal
         FROM customer""",
    "f_width_bucket" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(CASE WHEN l_quantity >= 50.0 THEN 11
                          WHEN l_quantity < 0.0 THEN 0
                          ELSE floor(l_quantity / 5.0) + 1 END AS BIGINT) AS bucket
         FROM lineitem""",
    "f_series_scalar" ->
      """SELECT r_regionkey,
                array_to_string(generate_series(1, r_regionkey + 1), ',') AS series
         FROM region"""
  )
}
