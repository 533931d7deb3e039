package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Core relational operator inventory — SURVEY.md §2.2–§2.6.
  *
  * Each entry pairs a Spark-first DataFrame (or Spark SQL) implementation
  * with a DuckDB oracle statement over the same parquet tables. Reference
  * semantics: serverboards/exosql `lib/executor.ex`, `lib/planner.ex`,
  * `lib/expr.ex` [U] (see SURVEY.md §0 for citation convention).
  *
  * Determinism-vs-oracle notes:
  *  - Money aggregates are accumulated in exact DECIMAL and cast to DOUBLE
  *    at the end: double summation order differs between engines, decimal
  *    sums don't. Per-row double arithmetic is IEEE-deterministic and needs
  *    no such treatment.
  *  - Every LIMIT is preceded by a total ORDER BY (unique tie-break key).
  *  - Window running sums are rounded (DuckDB's segment-tree windowed
  *    aggregation reassociates float adds; inputs are 2-decimal so the true
  *    sum sits on the 0.01 grid, far from any round-half boundary).
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** revenue term: extendedprice * (1 - discount), exact decimal */
  private def revTerm(price: Column, disc: Column): Column =
    dec(price) * (lit(BigDecimal(1)).cast(DecimalType(8, 2)) - disc.cast(DecimalType(8, 2)))

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── §2.2 projection / filter / predicates ─────────────────────────
    "p1_project" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net"))
    }),
    "p2_filter" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .filter($"l_shipdate" < to_timestamp(lit("1998-06-01")) && $"l_quantity" > 25)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
    }),
    "p3_comparisons" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders").select(
        $"o_orderkey",
        ($"o_totalprice" === 144449.04).as("eq"),
        ($"o_totalprice" =!= 144449.04).as("neq"),
        ($"o_totalprice" < 100000.0).as("lt"),
        ($"o_totalprice" <= 100000.0).as("lte"),
        ($"o_totalprice" > 300000.0).as("gt"),
        ($"o_totalprice" >= 300000.0).as("gte"),
        // 3-valued logic: NULL for 'P' rows (exosql lib/expr.ex [U])
        (nullif($"o_orderstatus", lit("P")) === "F").as("tvl"))
    }),
    "p4_boolean" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders").select(
        $"o_orderkey",
        (($"o_orderstatus" === "F") && ($"o_totalprice" > 200000.0)).as("and_c"),
        (($"o_orderstatus" === "P") || ($"o_totalprice" < 50000.0)).as("or_c"),
        (!($"o_orderpriority" === "5-LOW")).as("not_c"),
        ((nullif($"o_orderstatus", lit("P")) === "F") && lit(false)).as("null_and_false"),
        ((nullif($"o_orderstatus", lit("P")) === "F") || lit(true)).as("null_or_true"))
    }),
    "p5_null" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .select(nullif($"o_orderstatus", lit("P")).as("st"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when($"st".isNull, lit(1))).as("n_null"),
          count(when($"st".isNotNull, lit(1))).as("n_not_null"))
    }),
    "p6_in_list" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .filter($"l_returnflag".isin("A", "N"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    }),
    "p7_like" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "part")
        .filter($"p_name".like("%wid%") && $"p_brand".like("Brand#_"))
        .select($"p_partkey", $"p_name", $"p_brand")
    }),
    "p7_ilike" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "region")
        .filter($"r_name".ilike("%africa%") || $"r_name".ilike("%EAST%"))
        .select($"r_regionkey", $"r_name")
    }),
    "p8_case" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .select(when($"o_totalprice" < 100000.0, lit("small"))
          .when($"o_totalprice" < 250000.0, lit("medium"))
          .otherwise(lit("large")).as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
    }),
    "p9_arith" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem").select(
        $"l_orderkey", $"l_linenumber",
        ($"l_quantity" + $"l_tax").as("add_c"),
        ($"l_extendedprice" - $"l_quantity").as("sub_c"),
        ($"l_extendedprice" * $"l_discount").as("mul_c"),
        ($"l_extendedprice" / $"l_quantity").as("div_c"),
        ($"l_orderkey" % lit(7)).as("mod_c"),
        concat($"l_returnflag", lit("-"), $"l_linestatus").as("concat_c"))
    }),

    // ── §2.3 joins ────────────────────────────────────────────────────
    "j1_inner" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
      c.filter($"c_mktsegment" === "BUILDING")
        .join(o, $"c_custkey" === $"o_custkey")
        .join(l, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(sum(revTerm($"l_extendedprice", $"l_discount")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),
    "j2_left" -> ((s, d) => {
      import s.implicits._
      val n = Tables.load(s, d, "nation")
      val c = Tables.load(s, d, "customer").filter($"c_acctbal" > 9000.0)
      n.join(c, $"n_nationkey" === $"c_nationkey", "left")
        .groupBy($"n_name")
        .agg(count($"c_custkey").as("n_cust"))
    }),
    "j3_right" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer").filter($"c_acctbal" < -500.0)
      val n = Tables.load(s, d, "nation")
      c.join(n, $"c_nationkey" === $"n_nationkey", "right")
        .select($"n_nationkey", $"n_name", $"c_custkey", $"c_acctbal")
    }),
    "j4_cross" -> ((s, d) => {
      import s.implicits._
      val r = Tables.load(s, d, "region")
      val n = Tables.load(s, d, "nation").filter($"n_nationkey" < 5)
      r.crossJoin(n).select($"r_name", $"n_name")
    }),
    "j5_lateral" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT n_name, t.top_bal
               FROM nation,
               LATERAL (SELECT max(c_acctbal) AS top_bal
                        FROM customer WHERE c_nationkey = n_nationkey) t""")
    }),
    "j6_semi" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders").filter($"o_totalprice" > 300000.0)
      c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
    }),
    "j6_anti" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders").filter($"o_totalprice" > 400000.0)
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
    }),
    "j_theta" -> ((s, d) => {
      import s.implicits._
      val sup = Tables.load(s, d, "supplier")
      val c = Tables.load(s, d, "customer")
      sup.join(c, $"c_nationkey" === $"s_nationkey" && $"c_acctbal" > $"s_acctbal")
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n_richer"))
    }),

    // ── §2.4 aggregation ──────────────────────────────────────────────
    "a1_groupby" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("2002-09-02")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).cast(DoubleType).as("sum_qty"),
          sum(dec($"l_extendedprice")).cast(DoubleType).as("sum_base_price"),
          sum(revTerm($"l_extendedprice", $"l_discount")).cast(DoubleType).as("sum_disc_price"),
          (sum(dec($"l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum(dec($"l_discount")).cast(DoubleType) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "a2_agg_all" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders").agg(
        count(lit(1)).as("n"),
        sum(dec($"o_totalprice")).cast(DoubleType).as("total"),
        min($"o_totalprice").as("min_p"),
        max($"o_totalprice").as("max_p"))
    }),
    "a4_count_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem").agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey").as("n_part"),
        countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"))
    }),
    "a5_min_max_avg" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          // integer-valued doubles: exact sum, deterministic division
          (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
          min($"l_shipdate").as("first_ship"),
          max($"l_shipdate").as("last_ship"))
    }),
    "a6_having" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec($"o_totalprice")).cast(DoubleType).as("spent"))
        .filter($"n_orders" >= 20)
    }),
    "a7_rollup" -> ((s, d) => {
      import s.implicits._
      val n = Tables.load(s, d, "nation")
      val r = Tables.load(s, d, "region")
      n.join(r, $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n"))
    }),
    "a7_cube" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"))
    }),
    "a8_stats" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "customer")
        .groupBy($"c_mktsegment")
        .agg(
          round(stddev_samp($"c_acctbal"), 4).as("sd_bal"),
          round(var_samp($"c_acctbal"), 4).as("var_bal"),
          round(median($"c_acctbal"), 4).as("med_bal"))
    }),

    "a8_hll" -> ((s, d) => {
      import s.implicits._
      // HLL++ cardinality sketch (the A8 approx-distinct path). The
      // estimate itself is engine-specific, so the gate pins (a) the
      // EXACT ndv both engines agree on and (b) the sketch CONTRACT —
      // the estimate lands within ±5% of exact (rsd 0.01 ⇒ ~1%
      // expected). HLL merge is an exact register union, so the result
      // is partition-layout-invariant and deterministic.
      // exact and sketch run as SEPARATE single-row aggregates joined at
      // the end: mixing count(DISTINCT) with another aggregate plans an
      // Expand, and the HLL then keeps a register buffer PER DISTINCT
      // KEY group instead of one per partition — measured 2.75 s
      // combined vs 0.30 + 0.88 split at sf0.1
      val orders = Tables.load(s, d, "orders")
      val exact = orders.agg(countDistinct($"o_custkey").as("ndv_exact"))
      val sketch = orders.agg(
        approx_count_distinct($"o_custkey", 0.01).as("__hll"))
      exact.crossJoin(broadcast(sketch)).select(
        $"ndv_exact",
        (abs($"__hll" - $"ndv_exact").cast("double") / $"ndv_exact" <= 0.05)
          .as("hll_within_5pct"))
    }),

    "a8_approx_quantile" -> ((s, d) => {
      import s.implicits._
      // GK approximate-quantile sketch (the other workhorse sketch next
      // to a8_hll's HLL++): same gate recipe — pin the EXACT quantiles
      // both engines agree on, attest the sketch CONTRACT (approx
      // within 1% of exact at accuracy 10000). The sketch is mergeable,
      // so the result is partition-layout-invariant.
      val exact = expr("percentile(l_extendedprice, array(0.5, 0.95))")
      val approx = expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)")
      Tables.load(s, d, "lineitem").agg(
        round(element_at(exact, 1), 4).as("p50_exact"),
        round(element_at(exact, 2), 4).as("p95_exact"),
        (abs(element_at(approx, 1) - element_at(exact, 1)) /
          element_at(exact, 1) <= 0.01 &&
          abs(element_at(approx, 2) - element_at(exact, 2)) /
            element_at(exact, 2) <= 0.01).as("gk_within_1pct"))
    }),

    "a8_corr" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("qty_price_corr"),
          round(covar_samp($"l_quantity", $"l_discount"), 6).as("qty_disc_covar"))
    }),

    // ── §2.5 window functions (beyond-parity, free in Spark) ──────────
    "w1_row_number" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.load(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal", $"rn")
    }),
    "w2_lag_lead" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.load(s, d, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          rank().over(w).as("rk"))
    }),
    "w3_running" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "events")
        .select($"user_id", $"event_id",
          round(sum($"value").over(w), 2).as("running_value"))
    }),

    // ── §2.6 sort / limit / set ops / dedup ───────────────────────────
    "o1_order_limit" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", $"o_totalprice")
    }),
    "o2_offset" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(5).limit(10)
        .select($"o_orderkey", $"o_totalprice")
    }),
    "o3_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "customer").select($"c_mktsegment").distinct()
    }),
    "o4_union_all" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer").select($"c_nationkey".as("k"))
      val su = Tables.load(s, d, "supplier").select($"s_nationkey".as("k"))
      c.unionAll(su).groupBy($"k").agg(count(lit(1)).as("n"))
    }),
    "o4_union_distinct" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer").select($"c_nationkey".as("k"))
      val su = Tables.load(s, d, "supplier").select($"s_nationkey".as("k"))
      c.union(su).distinct()
    }),
    "o5_intersect" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer").select($"c_nationkey".as("k"))
      val su = Tables.load(s, d, "supplier").select($"s_nationkey".as("k"))
      c.intersect(su)
    }),
    "o5_except" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
        .filter($"c_acctbal" > 9500.0).select($"c_nationkey".as("k"))
      val su = Tables.load(s, d, "supplier")
        .filter($"s_acctbal" > 8000.0).select($"s_nationkey".as("k"))
      c.except(su)
    }),
    "o6_cte" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                            WHERE o_totalprice > 250000.0)
               SELECT c_nationkey, count(*) AS n_big
               FROM customer JOIN big ON c_custkey = o_custkey
               GROUP BY c_nationkey""")
    }),
    "o7_subquery_scalar" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, c_acctbal FROM customer
               WHERE c_acctbal > 2 * (SELECT avg(c_acctbal) FROM customer)""")
    }),
    "o7_subquery_from" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT t.l_orderkey, t.n_items FROM
                 (SELECT l_orderkey, count(*) AS n_items FROM lineitem
                  GROUP BY l_orderkey) t
               WHERE t.n_items >= 6""")
    }),

    // ── §2.1 S6: table function in FROM ───────────────────────────────
    "o7_correlated" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT n_name,
                      (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
                      (SELECT max(s_acctbal) FROM supplier WHERE s_nationkey = n_nationkey) AS top_supp
               FROM nation""")
    }),
    "o7_exists" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT p_partkey, p_name FROM part
               WHERE EXISTS (SELECT 1 FROM lineitem
                             WHERE l_partkey = p_partkey AND l_quantity >= 49)""")
    }),
    "o8_recursive_cte" -> ((s, d) => {
      Tables.registerAll(s, d)
      // WITH RECURSIVE (Spark 4.x) over a derived 16-ary-tree hierarchy
      // (parent(k) = k div 16): per-depth node counts. Each iteration is
      // a distributed join of the frontier against part — the recursion
      // runs log16(|part|) barriers (5 at sf0.1), never |part|; a wide
      // fan-out is the honest shape for real hierarchies, and each
      // sequential iteration costs a fixed scheduling barrier
      s.sql("""WITH RECURSIVE tree(k, depth) AS (
                 SELECT CAST(1 AS BIGINT), 0
                 UNION ALL
                 SELECT p.p_partkey, t.depth + 1
                 FROM part p JOIN tree t ON p.p_partkey div 16 = t.k
                 WHERE p.p_partkey > 1)
               SELECT depth, count(*) AS n FROM tree GROUP BY depth""")
    }),
    "s6_generate_series" -> ((s, d) => {
      import s.implicits._
      s.range(1, 101).select($"id".as("v"),
        ($"id" * $"id").as("sq"))
    }),
    "s6_unnest" -> ((s, d) => {
      import s.implicits._
      // generator in FROM position (exosql unnest / LATERAL VIEW explode)
      Tables.load(s, d, "documents").filter($"doc_id" < 20)
        .select($"doc_id", explode(split($"text", "[\\t\\n\\x0B\\f\\r ]+")).as("tok"))
    }),
    "s6_series_ts" -> ((s, d) => {
      // generate_series over datetimes (SURVEY §2.7 open question [U];
      // DuckDB supports it, so the engine does too): Catalyst Sequence
      // takes timestamp bounds + a day-time interval step natively
      graft.functions.Builtins.registerAll(s)
      s.sql("""SELECT ts, date_format(ts, 'yyyy-MM-dd HH') AS ts_label
               FROM (SELECT explode(generate_series(
                       timestamp'2024-01-01 00:00:00',
                       timestamp'2024-01-05 00:00:00',
                       interval 6 hours)) AS ts)""")
    }),
    "w4_rank_dist" -> ((s, d) => {
      import s.implicits._
      // the distribution-window family (beyond w1-w3): dense_rank,
      // ntile, percent_rank, cume_dist — deterministic via the unique
      // (price desc, orderkey) tie-break
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.load(s, d, "orders")
        .select($"o_orderkey", $"o_orderpriority",
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
    }),
    "w5_range_frame" -> ((s, d) => {
      import s.implicits._
      // RANGE frame over a time axis: per-user trailing-1-hour event
      // count and decimal value sum — the time-windowed running metric
      // every telemetry pipeline computes. The frame is VALUE-based
      // (epoch micros), so same-timestamp peers aggregate identically
      // in every engine regardless of row order.
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.load(s, d, "events")
        .select($"event_id", $"user_id", $"ts",
          count(lit(1)).over(w).as("n_1h"),
          sum($"value".cast(DecimalType(18, 6))).over(w)
            .cast("double").as("sum_1h"))
    })
  )

  def oracle: Map[String, String] = Map(
    "p1_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net FROM lineitem",
    "p2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1998-06-01' AND l_quantity > 25""",
    "p3_comparisons" ->
      """SELECT o_orderkey,
                o_totalprice = 144449.04 AS eq,
                o_totalprice <> 144449.04 AS neq,
                o_totalprice < 100000.0 AS lt,
                o_totalprice <= 100000.0 AS lte,
                o_totalprice > 300000.0 AS gt,
                o_totalprice >= 300000.0 AS gte,
                nullif(o_orderstatus, 'P') = 'F' AS tvl
         FROM orders""",
    "p4_boolean" ->
      """SELECT o_orderkey,
                (o_orderstatus = 'F' AND o_totalprice > 200000.0) AS and_c,
                (o_orderstatus = 'P' OR o_totalprice < 50000.0) AS or_c,
                NOT (o_orderpriority = '5-LOW') AS not_c,
                (nullif(o_orderstatus,'P') = 'F' AND false) AS null_and_false,
                (nullif(o_orderstatus,'P') = 'F' OR true) AS null_or_true
         FROM orders""",
    "p5_null" ->
      """SELECT count(*) AS n_all,
                count(CASE WHEN st IS NULL THEN 1 END) AS n_null,
                count(CASE WHEN st IS NOT NULL THEN 1 END) AS n_not_null
         FROM (SELECT nullif(o_orderstatus, 'P') AS st FROM orders)""",
    "p6_in_list" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         WHERE l_returnflag IN ('A','N') GROUP BY l_returnflag""",
    "p7_like" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE p_name LIKE '%wid%' AND p_brand LIKE 'Brand#_'""",
    "p7_ilike" ->
      """SELECT r_regionkey, r_name FROM region
         WHERE r_name ILIKE '%africa%' OR r_name ILIKE '%EAST%'""",
    "p8_case" ->
      """SELECT CASE WHEN o_totalprice < 100000.0 THEN 'small'
                     WHEN o_totalprice < 250000.0 THEN 'medium'
                     ELSE 'large' END AS bucket, count(*) AS n
         FROM orders GROUP BY 1""",
    "p9_arith" ->
      """SELECT l_orderkey, l_linenumber,
                l_quantity + l_tax AS add_c,
                l_extendedprice - l_quantity AS sub_c,
                l_extendedprice * l_discount AS mul_c,
                l_extendedprice / l_quantity AS div_c,
                l_orderkey % 7 AS mod_c,
                l_returnflag || '-' || l_linestatus AS concat_c
         FROM lineitem""",
    "j1_inner" ->
      s"""SELECT o_orderkey,
                 CAST(sum($revSql) AS DOUBLE) AS revenue,
                 count(*) AS n_lines
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY o_orderkey""",
    "j2_left" ->
      """SELECT n_name, count(c_custkey) AS n_cust
         FROM nation LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000.0) c
           ON n_nationkey = c_nationkey
         GROUP BY n_name""",
    "j3_right" ->
      """SELECT n_nationkey, n_name, c_custkey, c_acctbal
         FROM (SELECT * FROM customer WHERE c_acctbal < -500.0) c
         RIGHT JOIN nation ON c_nationkey = n_nationkey""",
    "j4_cross" ->
      """SELECT r_name, n_name FROM region
         CROSS JOIN (SELECT * FROM nation WHERE n_nationkey < 5) n""",
    "j5_lateral" ->
      """SELECT n_name, t.top_bal
         FROM nation,
         LATERAL (SELECT max(c_acctbal) AS top_bal
                  FROM customer WHERE c_nationkey = n_nationkey) t""",
    "j6_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)""",
    "j6_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""",
    "j_theta" ->
      """SELECT s_suppkey, count(*) AS n_richer
         FROM supplier JOIN customer
           ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
         GROUP BY s_suppkey""",
    "a1_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                 CAST(sum($revSql) AS DOUBLE) AS sum_disc_price,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                 CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '2002-09-02'
          GROUP BY l_returnflag, l_linestatus""",
    "a2_agg_all" ->
      """SELECT count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                min(o_totalprice) AS min_p,
                max(o_totalprice) AS max_p
         FROM orders""",
    "a4_count_distinct" ->
      """SELECT count(DISTINCT l_suppkey) AS n_supp,
                count(DISTINCT l_partkey) AS n_part,
                count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
         FROM lineitem""",
    "a5_min_max_avg" ->
      """SELECT l_returnflag,
                min(l_quantity) AS min_qty,
                max(l_quantity) AS max_qty,
                sum(l_quantity) / count(*) AS avg_qty,
                min(l_shipdate) AS first_ship,
                max(l_shipdate) AS last_ship
         FROM lineitem GROUP BY l_returnflag""",
    "a6_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
         FROM orders GROUP BY o_custkey HAVING count(*) >= 20""",
    "a7_rollup" ->
      """SELECT r_name, n_name, count(*) AS n
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)""",
    "a7_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "a8_stats" ->
      """SELECT c_mktsegment,
                round(stddev_samp(c_acctbal), 4) AS sd_bal,
                round(var_samp(c_acctbal), 4) AS var_bal,
                round(median(c_acctbal), 4) AS med_bal
         FROM customer GROUP BY c_mktsegment""",
    // the HLL estimate is engine-specific; the oracle pins the exact
    // ndv and the accuracy contract the Spark side must attest to
    "a8_hll" ->
      """SELECT count(DISTINCT o_custkey) AS ndv_exact,
                true AS hll_within_5pct
         FROM orders""",
    // exact interpolated quantiles both engines agree on + the Spark
    // side's attestation that the GK sketch landed within contract
    "a8_approx_quantile" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
                round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
                true AS gk_within_1pct
         FROM lineitem""",
    "a8_corr" ->
      """SELECT l_returnflag,
                round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
                round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar
         FROM lineitem GROUP BY l_returnflag""",
    "w1_row_number" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM
           (SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer)
         WHERE rn <= 2""",
    "w2_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price,
                rank() OVER w AS rk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "w3_running" ->
      """SELECT user_id, event_id,
                round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_value
         FROM events""",
    "o1_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "o2_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5""",
    "o3_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer",
    "o4_union_all" ->
      """SELECT k, count(*) AS n FROM
           (SELECT c_nationkey AS k FROM customer
            UNION ALL
            SELECT s_nationkey AS k FROM supplier)
         GROUP BY k""",
    "o4_union_distinct" ->
      """SELECT c_nationkey AS k FROM customer
         UNION
         SELECT s_nationkey AS k FROM supplier""",
    "o5_intersect" ->
      """SELECT c_nationkey AS k FROM customer
         INTERSECT
         SELECT s_nationkey AS k FROM supplier""",
    "o5_except" ->
      """SELECT DISTINCT c_nationkey AS k FROM customer WHERE c_acctbal > 9500.0
         EXCEPT
         SELECT DISTINCT s_nationkey AS k FROM supplier WHERE s_acctbal > 8000.0""",
    "o6_cte" ->
      """WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                      WHERE o_totalprice > 250000.0)
         SELECT c_nationkey, count(*) AS n_big
         FROM customer JOIN big ON c_custkey = o_custkey
         GROUP BY c_nationkey""",
    "o7_subquery_scalar" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_acctbal > 2 * (SELECT avg(c_acctbal) FROM customer)""",
    "o7_subquery_from" ->
      """SELECT t.l_orderkey, t.n_items FROM
           (SELECT l_orderkey, count(*) AS n_items FROM lineitem
            GROUP BY l_orderkey) t
         WHERE t.n_items >= 6""",
    "o7_correlated" ->
      """SELECT n_name,
                (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
                (SELECT max(s_acctbal) FROM supplier WHERE s_nationkey = n_nationkey) AS top_supp
         FROM nation""",
    "o7_exists" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_partkey = p_partkey AND l_quantity >= 49)""",
    "o8_recursive_cte" ->
      """WITH RECURSIVE tree(k, depth) AS (
           SELECT CAST(1 AS BIGINT), 0
           UNION ALL
           SELECT p.p_partkey, t.depth + 1
           FROM part p JOIN tree t ON p.p_partkey // 16 = t.k
           WHERE p.p_partkey > 1)
         SELECT depth, count(*) AS n FROM tree GROUP BY depth""",
    "s6_generate_series" ->
      "SELECT v, v * v AS sq FROM generate_series(1, 100) t(v)",
    "s6_unnest" ->
      """SELECT doc_id, unnest(string_split_regex(text, '[\t\n\x0B\f\r ]+')) AS tok
         FROM documents WHERE doc_id < 20""",
    "s6_series_ts" ->
      """SELECT ts, strftime(ts, '%Y-%m-%d %H') AS ts_label
         FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                             TIMESTAMP '2024-01-05 00:00:00',
                                             INTERVAL 6 HOUR)) AS ts)""",
    "w4_rank_dist" ->
      """SELECT o_orderkey, o_orderpriority,
                dense_rank() OVER w AS drnk,
                ntile(4) OVER w AS quartile,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey)""",
    "w5_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                count(*) OVER w AS n_1h,
                CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id
                      ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
  )
}
