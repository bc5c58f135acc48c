package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Q, Tables}
import graft.core.MrOps

/** Relational coverage of SURVEY.md §2.2 on the driver's star schema:
  * scan/filter/project, equi-joins (the reference's union+collate join idiom,
  * `oink/cc_find.cpp:76-79`), groupBy aggregations (collate+reduce), distinct
  * (`oink/reduce_cull.cpp`), union (`add`, `src/mapreduce.cpp:348-374`),
  * set ops, sorts, top-K (`oink/wordfreq.cpp:65-112`), histogram-of-
  * histograms (`oink/histo.cpp`), window functions (absent in the reference —
  * Spark-native bonus surface), collapse/posting lists.
  *
  * Determinism rules for the DuckDB oracle:
  *  - price sums (doubles) rounded to 2 decimals — sums of 2-decimal values
  *    agree across engines after rounding;
  *  - quantity sums are integral doubles → exact in IEEE754, no rounding;
  *  - averages computed as sum/count (one division), not engine avg();
  *  - every top-K/window has a total-order tiebreaker.
  */
object RelationalQueries {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def supp(s: SparkSession, d: String) = Tables.supplier(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def reg(s: SparkSession, d: String) = Tables.region(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  val all: Seq[Q] = Seq(

    // --- scan / filter / project (map callbacks; parquet pushdown) ---------
    Q("q_scan_project",
      (s, d) => li(s, d)
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
              FROM lineitem WHERE l_quantity >= 45""")),

    Q("q_filter_predicates",
      (s, d) => li(s, d)
        .filter(col("l_returnflag") === "R" &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
              FROM lineitem
              WHERE l_returnflag = 'R' AND l_discount BETWEEN 0.05 AND 0.07
                AND l_shipdate >= TIMESTAMP '1995-01-01'""")),

    // --- aggregation: collate+reduce (TPC-H Q1 shape) ----------------------
    Q("q1_agg",
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty")),
      Some("""SELECT l_returnflag, l_linestatus,
                     sum(l_quantity) AS sum_qty,
                     round(sum(l_extendedprice), 2) AS sum_base,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                     count(*) AS n_rows,
                     round(sum(l_quantity) / count(*), 4) AS avg_qty
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("q_group_minmax",
      (s, d) => ord(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_total"),
          max(col("o_totalprice")).as("max_total"),
          min(col("o_orderdate")).as("first_date")),
      Some("""SELECT o_orderpriority, count(*) AS n,
                     min(o_totalprice) AS min_total,
                     max(o_totalprice) AS max_total,
                     min(o_orderdate) AS first_date
              FROM orders GROUP BY o_orderpriority""")),

    Q("q_count_distinct",
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps")),
      Some("""SELECT l_returnflag,
                     count(DISTINCT l_partkey) AS n_parts,
                     count(DISTINCT l_suppkey) AS n_supps
              FROM lineitem GROUP BY l_returnflag""")),

    // KMV distinct-count sketch (bounded O(k) state per group vs the
    // exact count-distinct's full key shuffle above). The portable-mixer
    // hash makes the ESTIMATE deterministic, so DuckDB replays the whole
    // sketch — k-th smallest distinct hash and all — bit for bit (Spark's
    // own approx_count_distinct HLL++ bytes are engine-private and could
    // only ever get a rows-only check).
    Q("q_approx_distinct_kmv",
      (s, d) => graft.operators.KmvDistinct.approxDistinct(
        li(s, d), col("l_partkey"), Seq(col("l_returnflag")), k = 64),
      Some(s"""WITH h AS (
                 SELECT DISTINCT l_returnflag,
                        ((l_partkey % 1000000007) * 2654435761 + 283521)
                          % 1000000007 AS hv
                 FROM lineitem),
               r AS (
                 SELECT l_returnflag, hv,
                        row_number() OVER (PARTITION BY l_returnflag
                                           ORDER BY hv) AS rn,
                        count(*) OVER (PARTITION BY l_returnflag) AS nd
                 FROM h)
               SELECT l_returnflag,
                      CAST(CASE WHEN nd < 64 THEN nd
                                ELSE (CAST(63 AS BIGINT) * 1000000008) // (hv + 1)
                           END AS BIGINT) AS approx_distinct
               FROM r WHERE rn = least(nd, 64)""")),

    // --- distinct / cull (`oink/reduce_cull.cpp`) --------------------------
    Q("q_distinct",
      (s, d) => li(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // --- set ops: add/union (`src/mapreduce.cpp:348-374`), intersect/except
    Q("q_union",
      (s, d) => MrOps.add(
        cust(s, d).select(col("c_nationkey").as("nk")),
        supp(s, d).select(col("s_nationkey").as("nk"))).distinct(),
      Some("""SELECT c_nationkey AS nk FROM customer
              UNION SELECT s_nationkey AS nk FROM supplier""")),

    Q("q_union_all_count",
      (s, d) => MrOps.add(
        ord(s, d).select(col("o_orderkey").as("k")),
        li(s, d).select(col("l_orderkey").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("n")),
      Some("""SELECT k, count(*) AS n FROM (
                SELECT o_orderkey AS k FROM orders
                UNION ALL SELECT l_orderkey AS k FROM lineitem
              ) GROUP BY k""")),

    Q("q_intersect",
      (s, d) => ord(s, d).select(col("o_custkey").as("k"))
        .intersect(cust(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey"))),
      Some("""SELECT o_custkey AS k FROM orders
              INTERSECT
              SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000""")),

    Q("q_except",
      (s, d) => cust(s, d).select(col("c_custkey").as("k"))
        .except(ord(s, d).select(col("o_custkey"))),
      Some("""SELECT c_custkey AS k FROM customer
              EXCEPT SELECT o_custkey AS k FROM orders""")),

    // --- joins (reference join idiom = add+collate+tagged reduce) ----------
    Q("q_join_agg",
      (s, d) => ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment""")),

    Q("q_join_multi",
      (s, d) => ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(MrOps.broadcastCopy(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(MrOps.broadcastCopy(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders")),
      Some("""SELECT r_name, n_name, count(*) AS n_orders
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name""")),

    Q("q_left_join",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey""")),

    Q("q_semi_join",
      (s, d) => cust(s, d)
        .join(ord(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_totalprice > 100000)""")),

    Q("q_anti_join",
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // --- sorts / top-K -----------------------------------------------------
    Q("q_topk",
      (s, d) => MrOps.topK(
        li(s, d).groupBy(col("l_partkey")).agg(sum(col("l_quantity")).as("qty")),
        10, col("qty").desc, col("l_partkey").asc),
      Some("""SELECT l_partkey, sum(l_quantity) AS qty
              FROM lineitem GROUP BY l_partkey
              ORDER BY qty DESC, l_partkey LIMIT 10""")),

    Q("q_sort_global",
      (s, d) => MrOps.topK(
        ord(s, d).select(col("o_orderkey"), col("o_totalprice")),
        100, col("o_totalprice").desc, col("o_orderkey").asc),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // --- histogram-of-histograms (`oink/histo.cpp`, degree_stats shape) ----
    Q("q_histo",
      (s, d) => ord(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        .groupBy(col("n_orders")).agg(count(lit(1)).as("n_customers")),
      Some("""SELECT n_orders, count(*) AS n_customers FROM (
                SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
              ) GROUP BY n_orders""")),

    // --- collapse / posting list (`src/mapreduce.cpp:681-709`) -------------
    Q("q_collapse_group",
      (s, d) => li(s, d)
        .groupBy(col("l_orderkey"))
        .agg(array_join(
          transform(array_sort(collect_list(col("l_linenumber"))), x => x.cast("string")),
          ",").as("lines")),
      Some("""SELECT l_orderkey,
                     string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
              FROM lineitem GROUP BY l_orderkey""")),

    // --- sort_multivalues descending (flag -n, `doc/sort_keys.txt`) --------
    Q("q_sort_multivalues_desc",
      (s, d) => MrOps.sortedValuesPerKey(li(s, d), col("l_orderkey"),
          col("l_linenumber"), ascending = false)
        .select(col("l_orderkey"),
          array_join(transform(col("values"), x => x.cast("string")), ",")
            .as("lines_desc")),
      Some("""SELECT l_orderkey,
                     string_agg(CAST(l_linenumber AS VARCHAR), ','
                       ORDER BY l_linenumber DESC) AS lines_desc
              FROM lineitem GROUP BY l_orderkey""")),

    // --- sort_multivalues custom comparator (flag 7,
    // `src/mapreduce.cpp:2239-2246`): length-then-lexicographic ------------
    Q("q_sort_multivalues_cmp",
      (s, d) => MrOps.sortedValuesPerKeyWith(cust(s, d), col("c_nationkey"),
          col("c_name")) { (l, r) =>
          when(length(l) < length(r), -1).when(length(l) > length(r), 1)
            .when(l < r, -1).when(l > r, 1).otherwise(0)
        }
        .select(col("c_nationkey"),
          array_join(col("values"), ",").as("names_by_len")),
      Some("""SELECT c_nationkey,
                     string_agg(c_name, ','
                       ORDER BY length(c_name), c_name) AS names_by_len
              FROM customer GROUP BY c_nationkey""")),

    // --- invert (`oink/map_invert.cpp`) ------------------------------------
    Q("q_invert",
      (s, d) => ord(s, d).select(col("o_custkey").as("k"), col("o_orderkey").as("v")),
      Some("SELECT o_custkey AS k, o_orderkey AS v FROM orders")),

    // --- kv_stats (`src/mapreduce.cpp:2937-3006`) --------------------------
    Q("q_kv_stats",
      (s, d) => cust(s, d).agg(
        count(lit(1)).as("n_pairs"),
        sum(length(col("c_name"))).as("name_bytes"),
        countDistinct(col("c_nationkey")).as("n_nations")),
      Some("""SELECT count(*) AS n_pairs,
                     CAST(sum(length(c_name)) AS BIGINT) AS name_bytes,
                     count(DISTINCT c_nationkey) AS n_nations
              FROM customer""")),

    // --- typed Aggregator: bounded per-key top-K in one pass ---------------
    Q("q_topk_per_key",
      (s, d) => ord(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.TopKIdsAggregator.topkIds(3)(
          col("o_totalprice"), col("o_orderkey")).as("top_orders")),
      Some("""SELECT o_orderpriority,
                     string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_orders
              FROM (
                SELECT o_orderpriority, o_orderkey,
                       row_number() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders)
              WHERE rn <= 3 GROUP BY o_orderpriority""")),

    // --- JSON extraction (absent in reference; events.props is JSON) -------
    Q("q_json_extract",
      (s, d) => ev(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), countDistinct(col("k")).as("k_distinct")),
      Some("""SELECT event_type,
                     CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                       AS k_sum,
                     count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS k_distinct
              FROM events GROUP BY event_type""")),

    // --- rollup (absent in reference — Spark-native bonus surface) ---------
    Q("q_rollup",
      (s, d) => ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(MrOps.broadcastCopy(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total")),
      Some("""SELECT n_name, c_mktsegment, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY ROLLUP (n_name, c_mktsegment)""")),

    // --- cube: all grouping-set combinations --------------------------------
    Q("q_cube",
      (s, d) => ord(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // --- window functions (Spark-native surface; absent in reference) ------
    Q("q_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        ord(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders)
              WHERE rn <= 3""")),

    Q("q_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .withColumn("running", round(sum(col("value")).over(w), 2))
          .select(col("event_id"), col("user_id"), col("running"))
      },
      Some("""SELECT event_id, user_id,
                     round(sum(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 2) AS running
              FROM events""")),

    // --- as-of join (operators.AsofJoin): latest signup at or before each
    // purchase, per user — the feature-pipeline operator Spark lacks;
    // DuckDB's native ASOF JOIN is the independent oracle ------------------
    Q("q_asof_join",
      (s, d) => {
        val e = ev(s, d)
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val signups = e.where(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("signup_id"))
        graft.operators.AsofJoin.asof(purchases, signups, "user_id", "ts",
          Seq("signup_id"))
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            col("asof_signup_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                                value
                         FROM events WHERE event_type = 'purchase'),
                   s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                                max(event_id) AS signup_id
                         FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
              SELECT p.event_id, p.user_id, p.ts, p.value,
                     s.signup_id AS asof_signup_id
              FROM p ASOF LEFT JOIN s
                ON p.user_id = s.user_id AND p.ts >= s.ts""")),

    // --- pivot: wide-form aggregation; explicit value list skips the
    // extra distinct-values pass, so it stays one shuffle ------------------
    Q("q_pivot",
      (s, d) => li(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity"))),
      Some("""SELECT l_linestatus,
                     sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS A,
                     sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS N,
                     sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS R
              FROM lineitem GROUP BY 1""")),

    // --- batch sessionization (operators.Sessionize): window-function
    // twin of q_stream_sessions for backfills over at-rest logs ------------
    Q("q_sessionize",
      (s, d) => graft.operators.Sessionize.sessionize(
        ev(s, d).select(col("user_id"), col("event_id"), col("ts")),
        "user_id", "ts", "event_id", gapSec = 1800L),
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                         FROM events),
              g AS (SELECT user_id, event_id, ts,
                      CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS brk
                    FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              s AS (SELECT user_id, ts,
                      CAST(sum(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
                    FROM g)
              SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
                     min(ts) AS t_start, max(ts) AS t_end
              FROM s GROUP BY 1, 2""")),

    // --- event-time bucketing (batch form of the streaming agg) ------------
    Q("q_events_hourly",
      (s, d) => ev(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total")),
      Some("""SELECT date_trunc('hour', ts) AS h, event_type,
                     count(*) AS n, round(sum(value), 2) AS total
              FROM events GROUP BY 1, 2""")),

    // --- range join (operators.RangeJoin): orders placed within a day of
    // a sampled urgent order — BETWEEN predicates plan a nested-loop join
    // natively; the bin rewrite makes it an equi-join (plan-pinned).
    // DuckDB's native inequality join is the independent oracle ------------
    Q("q_range_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val pts = o.select(col("o_orderkey").as("okey"),
          unix_timestamp(col("o_orderdate")).as("t"))
        val iv = o.where(col("o_orderpriority") === "1-URGENT" &&
            pmod(col("o_orderkey"), lit(7L)) === 0L)
          .select(col("o_orderkey").as("anchor"),
            unix_timestamp(col("o_orderdate")).as("lo"))
          .withColumn("hi", col("lo") + lit(86400L))
        graft.operators.RangeJoin.pointInInterval(pts, iv, "t", "lo", "hi",
            binSize = 86400L)
          .where(col("okey") =!= col("anchor"))
          .select(col("anchor"), col("okey"), col("t"))
      },
      Some("""WITH o AS (SELECT o_orderkey,
                       CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
                         AS t,
                       o_orderpriority
                     FROM orders),
              iv AS (SELECT o_orderkey AS anchor, t AS lo, t + 86400 AS hi
                     FROM o
                     WHERE o_orderpriority = '1-URGENT'
                       AND o_orderkey % 7 = 0)
              SELECT iv.anchor, o.o_orderkey AS okey, o.t
              FROM iv JOIN o
                ON o.t >= iv.lo AND o.t <= iv.hi
                   AND o.o_orderkey <> iv.anchor""")),

    // --- interval-overlap join (operators.RangeJoin.intervalOverlap):
    // co-active user pairs — per-user daily activity spans from events,
    // sampled span set × broader span set, overlap = closed-interval
    // intersection; both sides explode to day bins, pairs dedup via the
    // first-shared-bin predicate (no distinct pass). DuckDB's native
    // inequality join is the oracle --------------------------------------
    Q("q_interval_overlap",
      (s, d) => {
        val spans = ev(s, d)
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(unix_timestamp(min(col("ts"))).as("lo"),
            unix_timestamp(max(col("ts"))).as("hi"))
        val a = spans.where(pmod(col("user_id"), lit(500L)) === 0L)
          .select(col("user_id").as("ua"), col("lo").as("lo_a"),
            col("hi").as("hi_a"))
        val b = spans.where(pmod(col("user_id"), lit(50L)) === 0L)
          .select(col("user_id").as("ub"), col("lo").as("lo_b"),
            col("hi").as("hi_b"))
        graft.operators.RangeJoin.intervalOverlap(a, b,
            "lo_a", "hi_a", "lo_b", "hi_b", binSize = 86400L)
          .where(col("ua") =!= col("ub"))
          .select(col("ua"), col("ub"), col("lo_a"), col("lo_b"))
      },
      Some("""WITH spans AS (
                SELECT user_id, date_trunc('day', ts) AS day,
                       CAST(floor(epoch(min(CAST(ts AS TIMESTAMP)))) AS BIGINT)
                         AS lo,
                       CAST(floor(epoch(max(CAST(ts AS TIMESTAMP)))) AS BIGINT)
                         AS hi
                FROM events GROUP BY 1, 2),
              a AS (SELECT user_id AS ua, lo AS lo_a, hi AS hi_a
                    FROM spans WHERE user_id % 500 = 0),
              b AS (SELECT user_id AS ub, lo AS lo_b, hi AS hi_b
                    FROM spans WHERE user_id % 50 = 0)
              SELECT ua, ub, lo_a, lo_b
              FROM a JOIN b
                ON lo_a <= hi_b AND lo_b <= hi_a AND ua <> ub""")),

    // --- ordered-step funnel (operators.Funnel): view → click → purchase
    // conversion, greedy-earliest transitions, one shuffle + a streamed
    // per-key cursor; the oracle runs the equivalent chained-min CTEs ------
    Q("q_funnel",
      (s, d) => graft.operators.Funnel.funnelCounts(ev(s, d),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (SELECT user_id, min(epoch(CAST(ts AS TIMESTAMP))) AS t
                          FROM events WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, min(epoch(CAST(e.ts AS TIMESTAMP))) AS t
                     FROM events e JOIN s1 ON e.user_id = s1.user_id
                       AND epoch(CAST(e.ts AS TIMESTAMP)) > s1.t
                     WHERE e.event_type = 'click' GROUP BY 1),
              s3 AS (SELECT e.user_id, min(epoch(CAST(e.ts AS TIMESTAMP))) AS t
                     FROM events e JOIN s2 ON e.user_id = s2.user_id
                       AND epoch(CAST(e.ts AS TIMESTAMP)) > s2.t
                     WHERE e.event_type = 'purchase' GROUP BY 1)
              SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
                     count(*) AS users FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3""")),

    // same funnel under a per-step SLA: each transition within 24 h of the
    // previous match — the time-bounded conversion readout ------------------
    Q("q_funnel_sla",
      (s, d) => graft.operators.Funnel.funnelCounts(ev(s, d),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        maxStepGapSec = Some(86400L)),
      Some("""WITH s1 AS (SELECT user_id, min(epoch(CAST(ts AS TIMESTAMP))) AS t
                          FROM events WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, min(epoch(CAST(e.ts AS TIMESTAMP))) AS t
                     FROM events e JOIN s1 ON e.user_id = s1.user_id
                       AND epoch(CAST(e.ts AS TIMESTAMP)) > s1.t
                       AND epoch(CAST(e.ts AS TIMESTAMP)) <= s1.t + 86400
                     WHERE e.event_type = 'click' GROUP BY 1),
              s3 AS (SELECT e.user_id, min(epoch(CAST(e.ts AS TIMESTAMP))) AS t
                     FROM events e JOIN s2 ON e.user_id = s2.user_id
                       AND epoch(CAST(e.ts AS TIMESTAMP)) > s2.t
                       AND epoch(CAST(e.ts AS TIMESTAMP)) <= s2.t + 86400
                     WHERE e.event_type = 'purchase' GROUP BY 1)
              SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
                     count(*) AS users FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3""")),

    // --- event-type transition matrix (operators.Funnel): first-order
    // Markov counts + row-normalized probabilities over per-user paths --
    Q("q_event_transitions",
      (s, d) => graft.operators.Funnel.transitionCounts(ev(s, d),
        "user_id", "ts", "event_type", "event_id"),
      Some("""WITH t AS (
                SELECT event_type AS from_type,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS to_type
                FROM events),
              c AS (SELECT from_type, to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
              SELECT from_type, to_type, n,
                     round(CAST(n AS DOUBLE) /
                       CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
                       6) AS p
              FROM c""")),

    // --- bucketed-count anomaly detection (operators.Anomaly): hourly
    // per-type volumes z-scored against the type's own distribution ------
    Q("q_event_anomaly",
      (s, d) => graft.operators.Anomaly.countAnomalies(ev(s, d),
          "event_type", "ts", bucket = "hour", threshold = 3.0)
        .withColumnRenamed("key", "event_type"),
      Some("""WITH c AS (SELECT event_type, date_trunc('hour', ts) AS h,
                     CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2),
              st AS (SELECT event_type,
                       CAST(count(*) AS BIGINT) AS nb,
                       CAST(sum(n) AS BIGINT) AS s,
                       CAST(sum(n * n) AS BIGINT) AS ss
                     FROM c GROUP BY 1)
              SELECT c.event_type, c.h, c.n,
                     CASE WHEN CAST(ss AS DOUBLE) / nb
                               - (CAST(s AS DOUBLE) / nb)
                               * (CAST(s AS DOUBLE) / nb) > 0
                       THEN round((c.n - CAST(s AS DOUBLE) / nb)
                              / sqrt(CAST(ss AS DOUBLE) / nb
                                - (CAST(s AS DOUBLE) / nb)
                                * (CAST(s AS DOUBLE) / nb)), 4)
                     END AS z,
                     CAST(CASE WHEN CAST(ss AS DOUBLE) / nb
                                    - (CAST(s AS DOUBLE) / nb)
                                    * (CAST(s AS DOUBLE) / nb) > 0
                                AND abs((c.n - CAST(s AS DOUBLE) / nb)
                                  / sqrt(CAST(ss AS DOUBLE) / nb
                                    - (CAST(s AS DOUBLE) / nb)
                                    * (CAST(s AS DOUBLE) / nb))) > 3.0
                       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
              FROM c JOIN st USING (event_type)""")),

    // --- cohort retention (operators.Retention): epoch-week cohorts by
    // first activity, distinct-active counts per offset week ----------------
    Q("q_retention",
      (s, d) => graft.operators.Retention.cohortRetention(ev(s, d),
        "user_id", "ts"),
      Some("""WITH f AS (SELECT user_id,
                     CAST(floor(epoch(min(CAST(ts AS TIMESTAMP))) / 604800)
                       AS BIGINT) AS cohort
                     FROM events GROUP BY 1),
              a AS (SELECT DISTINCT user_id,
                     CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800)
                       AS BIGINT) AS wk
                    FROM events),
              c AS (SELECT f.cohort, a.wk - f.cohort AS week_offset,
                           count(DISTINCT f.user_id) AS active_users
                    FROM f JOIN a ON f.user_id = a.user_id
                    GROUP BY 1, 2)
              SELECT cohort, week_offset, active_users,
                     round(active_users * 1.0 /
                       max(CASE WHEN week_offset = 0 THEN active_users END)
                         OVER (PARTITION BY cohort), 4) AS retention_pct
              FROM c"""))
  )
}
