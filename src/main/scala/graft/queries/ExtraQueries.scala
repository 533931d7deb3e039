package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.AsOf

/** Beyond-parity operator rows (SURVEY.md J7, A7 variants, O4 by-name,
  * flagship): as-of join (vs DuckDB's native ASOF JOIN), interval range
  * join, GROUPING SETS, PIVOT, unionByName, and the flagship TPC-H Q5
  * shape itself under the oracle gate. */
object ExtraQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j7_asof" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"ts", $"user_id", $"value")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id", $"value")
      AsOf.join(purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightCols = Seq("event_id", "value"))
        .select($"event_id", $"user_id", $"value",
          $"r_event_id".as("click_event"), $"r_value".as("click_value"))
    }),
    "j7_range" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
      o.join(l, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 30 DAYS"))
        .groupBy($"o_orderkey").agg(count(lit(1)).as("n_shipped_30d"))
    }),
    "a7_grouping_sets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    }),
    "a9_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "customer")
        .groupBy($"c_nationkey")
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(sum(dec($"c_acctbal")).cast(DoubleType))
    }),
    "o4_union_by_name" -> ((s, d) => {
      import s.implicits._
      val a = Tables.load(s, d, "customer").select($"c_custkey".as("id"), $"c_name".as("nm"))
      val b = Tables.load(s, d, "supplier").select($"s_name".as("nm"), $"s_suppkey".as("id"))
      a.unionByName(b).groupBy(substring($"nm", 1, 4).as("kind"))
        .agg(count(lit(1)).as("n"), max($"id").as("max_id"))
    }),
    "a11_percentile" -> ((s, d) => {
      import s.implicits._
      // exact interpolated percentiles (PostgreSQL percentile_cont
      // semantics; DuckDB quantile_cont oracle). Exact percentile is
      // the small/medium-cardinality tool; at 100 TB the same query
      // shape swaps in approx_percentile (t-digest, partial-aggregable)
      // — SkewAndSketchSpec covers that path.
      Tables.load(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.25)"), 6).as("p25_qty"),
          round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.75)"), 6).as("p75_qty"),
          round(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.95)"), 6).as("p95_price"))
    }),
    "a11_percentile_disc" -> ((s, d) => {
      import s.implicits._
      // discrete percentiles: pick an ACTUAL element (no interpolation)
      // — deterministic across engines by construction
      Tables.load(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE))")
            .as("med_qty"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE))")
            .as("p90_price"))
    }),
    "a12_listagg" -> ((s, d) => {
      import s.implicits._
      // ordered string aggregation (listagg/string_agg): collect_list's
      // arrival order is nondeterministic, so sort before joining — the
      // only engine-reproducible form
      Tables.load(s, d, "nation")
        .join(broadcast(Tables.load(s, d, "region")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"),
          count(lit(1)).as("n_nations"))
    }),
    "ts_resample" -> ((s, d) =>
      graft.operators.TimeSeries.resample(
        Tables.load(s, d, "events"), "ts", "value", unit = "minute")),
    "ts_transitions" -> ((s, d) =>
      // empirical first-order Markov table over per-user event
      // sequences: (from, to, n, conditional p)
      graft.operators.TimeSeries.transitions(Tables.load(s, d, "events"),
        "user_id", "ts", "event_id", "event_type")),
    "ts_sessionize" -> ((s, d) =>
      // gap-based sessions: a >30-minute silence starts a new session;
      // one report row per (user, session) with exact µs durations
      graft.operators.TimeSeries.sessionize(Tables.load(s, d, "events"),
        "user_id", "ts", "event_id", gapSeconds = 1800L)),
    "ts_retention" -> ((s, d) =>
      // weekly cohort retention matrix over the first 8 offsets — the
      // funnel's sibling report
      graft.operators.TimeSeries.retention(Tables.load(s, d, "events"),
        "user_id", "ts", maxOffsetWeeks = 8)),
    "ts_funnel" -> ((s, d) =>
      // sequential-conversion funnel: view → click → purchase, each
      // step strictly after the previous, the whole path within 7 days
      // of the user's FIRST view — the ordered-step analytics verb
      graft.operators.TimeSeries.funnel(Tables.load(s, d, "events"),
        "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"),
        windowSeconds = 604800L)),
    "j8_salted_join" -> ((s, d) => {
      import s.implicits._
      // skew-salted join must produce the PLAIN join's aggregate: the
      // random salt routes hot keys across tasks but cannot change the
      // joined row multiset, so the oracle is the unsalted query
      val (big, small) = graft.operators.Skew.saltedJoinKeys(
        Tables.load(s, d, "lineitem"),
        Tables.load(s, d, "supplier").select($"s_suppkey", $"s_nationkey"),
        keyCol = "s_suppkey", buckets = 8)
      big.join(small, big("l_suppkey") === small("s_suppkey") &&
          big("__salt") === small("__salt"))
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(dec($"l_quantity")).cast(DoubleType).as("total_qty"))
    }),
    "a10_salted_agg" -> ((s, d) => {
      import s.implicits._
      // skew-safe two-phase aggregation must equal the plain form —
      // decimal partials so the oracle compares exactly
      graft.operators.Skew.saltedAgg(
        Tables.load(s, d, "lineitem"), Seq($"l_returnflag"), buckets = 16,
        partial = Seq(sum(dec($"l_quantity")).as("s"), count(lit(1)).as("c")),
        merge = Seq(sum($"s").cast(DoubleType).as("total_qty"), sum($"c").as("n")),
        saltBy = Seq($"l_orderkey", $"l_linenumber"))
    }),
    "q5_flagship" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
      li.join(Tables.load(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.load(s, d, "customer")), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.load(s, d, "supplier")),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.load(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.load(s, d, "region").filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(dec($"l_extendedprice") *
          (lit(BigDecimal(1)).cast(DecimalType(8, 2)) - $"l_discount".cast(DecimalType(8, 2))))
          .cast(DoubleType).as("revenue"))
    })
  )

  def oracle: Map[String, String] = Map(
    "j7_asof" ->
      """SELECT p.event_id, p.user_id, p.value,
                c.event_id AS click_event, c.value AS click_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts""",
    "j7_range" ->
      """SELECT o_orderkey, count(*) AS n_shipped_30d
         FROM orders JOIN lineitem
           ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         GROUP BY o_orderkey""",
    "a7_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "a9_pivot" ->
      """SELECT c_nationkey,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS DOUBLE) AS "AUTOMOBILE",
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE) AS "BUILDING",
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'FURNITURE') AS DOUBLE) AS "FURNITURE",
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS DOUBLE) AS "HOUSEHOLD",
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = 'MACHINERY') AS DOUBLE) AS "MACHINERY"
         FROM customer GROUP BY c_nationkey""",
    "o4_union_by_name" ->
      """SELECT substr(nm, 1, 4) AS kind, count(*) AS n, max(id) AS max_id
         FROM (SELECT c_custkey AS id, c_name AS nm FROM customer
               UNION ALL
               SELECT s_suppkey AS id, s_name AS nm FROM supplier)
         GROUP BY 1""",
    "a11_percentile" ->
      """SELECT l_returnflag,
                round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25_qty,
                round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50_qty,
                round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75_qty,
                round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 6) AS p95_price
         FROM lineitem GROUP BY l_returnflag""",
    "a11_percentile_disc" ->
      """SELECT l_returnflag,
                quantile_disc(CAST(l_quantity AS DOUBLE), 0.5) AS med_qty,
                quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.9) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",
    "a12_listagg" ->
      """SELECT r_name,
                string_agg(n_name, ',' ORDER BY n_name) AS nations,
                count(*) AS n_nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    // transitions: the same (ts, event_id) ordering, lead pairs,
    // count-exact conditional probabilities
    "ts_transitions" ->
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                            event_type FROM events),
          pr AS (SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS to_type
                 FROM ev),
          cnt AS (SELECT from_type, to_type, count(*) AS n FROM pr
                  WHERE to_type IS NOT NULL GROUP BY 1, 2)
          SELECT from_type, to_type, n,
                 round(CAST(n AS DOUBLE) /
                   CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
                   AS p
          FROM cnt ORDER BY from_type, to_type""",
    // sessionize: the same (ts, event_id) ordering, strict-gap
    // boundary, running-sum session ids, exact µs durations
    "ts_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events),
          l AS (SELECT user_id, event_id, ts,
                  lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS pts
                FROM ev),
          f AS (SELECT user_id, event_id, ts,
                  CASE WHEN pts IS NULL
                         OR date_diff('microsecond', pts, ts) > 1800000000
                       THEN 1 ELSE 0 END AS nw
                FROM l),
          s AS (SELECT user_id, ts,
                  sum(nw) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM f)
          SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
                 count(*) AS n_events,
                 min(ts) AS session_start, max(ts) AS session_end,
                 date_diff('microsecond', min(ts), max(ts)) AS duration_us
          FROM s GROUP BY user_id, sid""",
    // retention: ISO-week truncation both sides, day-diff an exact
    // multiple of 7
    "ts_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events),
          fs AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                 FROM ev GROUP BY user_id),
          act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS p
                  FROM ev),
          j AS (SELECT fs.cohort,
                  CAST(date_diff('day', CAST(fs.cohort AS DATE),
                                 CAST(act.p AS DATE)) / 7 AS INT)
                    AS week_offset
                FROM fs JOIN act ON fs.user_id = act.user_id)
          SELECT CAST(cohort AS DATE) AS cohort, week_offset,
                 count(*) AS users
          FROM j WHERE week_offset <= 8
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // funnel: first-touch anchor, strictly-increasing step times, the
    // deadline measured from the anchor — replayed step by step
    "ts_funnel" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                            event_type FROM events),
          s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
                 WHERE event_type = 'view' GROUP BY user_id),
          s2 AS (SELECT e.user_id, s1.t1, min(e.ts) AS tprev
                 FROM ev e JOIN s1 ON e.user_id = s1.user_id
                 WHERE e.event_type = 'click' AND e.ts > s1.t1
                   AND e.ts <= s1.t1 + INTERVAL 604800 SECOND
                 GROUP BY e.user_id, s1.t1),
          s3 AS (SELECT e.user_id, s2.t1, min(e.ts) AS tprev
                 FROM ev e JOIN s2 ON e.user_id = s2.user_id
                 WHERE e.event_type = 'purchase' AND e.ts > s2.tprev
                   AND e.ts <= s2.t1 + INTERVAL 604800 SECOND
                 GROUP BY e.user_id, s2.t1)
          SELECT 1 AS step, 'view' AS event_type, count(*) AS users FROM s1
          UNION ALL SELECT 2, 'click', count(*) FROM s2
          UNION ALL SELECT 3, 'purchase', count(*) FROM s3""",
    "ts_resample" ->
      """WITH b AS (SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS bucket,
                           count(*) AS n_events,
                           sum(CAST(value AS DECIMAL(18,6))) AS sum_dec
                    FROM events GROUP BY 1),
           bounds AS (SELECT date_trunc('minute', min(CAST(ts AS TIMESTAMP))) AS lo,
                             date_trunc('minute', max(CAST(ts AS TIMESTAMP))) AS hi
                      FROM events),
           series AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS bucket
                      FROM bounds),
           dayc AS (SELECT CAST(bucket AS DATE) AS day,
                           max_by(sum_dec, bucket) AS close FROM b GROUP BY 1),
           days AS (SELECT DISTINCT CAST(bucket AS DATE) AS day FROM series),
           carry AS (SELECT days.day,
                            last_value(dayc.close IGNORE NULLS) OVER (
                              ORDER BY days.day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS carry
                     FROM days LEFT JOIN dayc ON dayc.day = days.day)
         SELECT s.bucket,
                coalesce(b.n_events, 0) AS n_events,
                CAST(coalesce(
                       last_value(b.sum_dec IGNORE NULLS) OVER (
                         PARTITION BY CAST(s.bucket AS DATE) ORDER BY s.bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       c.carry) AS DOUBLE)
                  AS filled_value
         FROM series s LEFT JOIN b ON b.bucket = s.bucket
         JOIN carry c ON c.day = CAST(s.bucket AS DATE)""",
    "j8_salted_join" ->
      """SELECT s_nationkey, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey""",
    "a10_salted_agg" ->
      """SELECT l_returnflag,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q5_flagship" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
                  AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name"""
  )
}
