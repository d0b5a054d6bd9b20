package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/**
 * Relational operator coverage over the TPC-H-ish star schema — the
 * "what the reference can express by pushing SQL to PostgreSQL/BigQuery"
 * surface (SURVEY §2.5, §2.6, §2.10 dispositions), all Spark built-ins.
 *
 * Determinism rules (FIXTURES.md §3): computed integer columns are cast to
 * BIGINT on both sides (Spark `length`/`row_number` are INT, DuckDB's are
 * BIGINT); orderings that feed LIMIT/rank carry explicit key tiebreaks;
 * float columns are compared as stored values or simple per-row IEEE ops
 * (deterministic), with order-dependent float reductions confined to the
 * same aggregates the driver's own example uses.
 */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2-style full aggregation (TPC-H Q1 shape): hash agg with map-side
    // partial aggregation; one shuffle on the two low-cardinality keys.
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // J1 inner join + group: revenue per nation (broadcast the dims).
    "q_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J2 left outer join: customer count per nation, including empty nations.
    "q_join_left" -> ((s, dir) =>
      t(s, dir, "nation")
        .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"))),

    // J3 left-semi join (EXISTS): customers holding at least one F-status order.
    "q_join_semi" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),

    // Left-anti join (NOT EXISTS): customers with no F-status orders.
    // (Every customer in the fixture has at least one order, so the anti
    // join is against the filtered F-status set to return real rows.)
    "q_join_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // Sort + limit (top-k): ordering on stored doubles with key tiebreak.
    "q_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(20)),

    // W-style analytic window: top-2 orders per customer.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // Lag/lead analytic: previous order date per customer.
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderdate"), 1).over(w).as("prev_orderdate"))
    }),

    // Set ops: INTERSECT / EXCEPT / UNION ALL.
    "q_intersect" -> ((s, dir) =>
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .intersect(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))),
    "q_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")))),
    "q_union_all" -> ((s, dir) =>
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .union(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")))),

    // Grouping sets: ROLLUP and CUBE over nation x segment.
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))),
    "q_cube" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))),

    // Distinct aggregates.
    "q_distinct" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))),

    // Scalar string functions (P-category surface).
    "q_string_fns" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        substring(col("p_name"), 1, 10).as("name10"),
        length(col("p_name")).cast(LongType).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))),

    // Date functions: truncation + per-month stats (min/max are exact).
    "q_date_trunc" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))),

    // Math + CASE: per-row IEEE ops are engine-exact.
    "q_case_math" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice") / lit(1000.0)).as("price_k_ceil"),
        when(col("o_totalprice") > 150000.0, lit("big"))
          .when(col("o_totalprice") > 50000.0, lit("mid"))
          .otherwise(lit("small")).as("bucket"))),

    // Theta-ish range predicate + between.
    "q_range_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity").between(10, 20) && col("l_discount") >= 0.05)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), max(col("l_extendedprice")).as("max_price"))),

    // LIKE pattern predicate ('%AR%' matches STANDARD + LARGE in the
    // fixture's p_type domain — non-degenerate at every SF).
    "q_like_filter" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_type").like("%AR%"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))),

    // IN-list predicate.
    "q_in_list" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderdate")).as("first_order"))),

    // HAVING: post-aggregation filter.
    "q_having" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 10)),

    // Filtered aggregates (FILTER clause / conditional count).
    "q_filtered_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(when(col("value") > 100, 1)).as("n_big"),
          count(when(col("user_id") % 2 === 0, 1)).as("n_even_user"),
          count(lit(1)).as("n"))),

    // Tumbling event-time windows in batch mode (the analytic window
    // surface the reference lacks, SURVEY §2.10): epoch-aligned 6h buckets.
    "q_time_bucket" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("win.start").as("window_start"), col("event_type"), col("n"))),

    // Regexp extraction (simple patterns: Java regex == RE2 semantics).
    "q_regexp_extract" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        regexp_extract(col("text"), "[a-z]+", 0).as("first_word"))),

    // Cross join (cartesian of two small dims).
    "q_cross_join" -> ((s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_pairs"))),

    // UNION DISTINCT (vs the UNION ALL above).
    "q_union_distinct" -> ((s, dir) =>
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .union(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")))
        .distinct()),

    // Exact interpolated percentiles (both engines implement type-7).
    "q_percentile" -> ((s, dir) =>
      // array form: ONE value buffer per group serves both quantiles —
      // two scalar percentile() aggregates each collect their own copy
      // of every group's values. Measured on an idle session at sf0.1
      // (Scratch pctl, 6 reps): array 1.0-1.4 s warm vs scalar
      // 1.5-2.0 s. The round-7 bench's 5.4 s warm for this row was
      // session cache pressure (value-buffering aggregates are the
      // allocation pattern most sensitive to heap competition), fixed
      // by Bench's phase-scoped cache release — not the formulation.
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("__p"))
        .select(col("l_returnflag"),
          col("__p").getItem(0).as("median_price"),
          col("__p").getItem(1).as("p90_price"))),

    // GROUPED sketch-envelope gate (oracle-checked — closed the last
    // rows-only sketch row): per return flag, the HLL++ distinct and the
    // KLL quantile estimates must land within their documented error
    // envelopes of DuckDB-recomputable exact values. Distinct from the
    // global `q_sketch_accuracy` row on two axes: the groupBy exercises
    // the sketch MERGE path (partial sketches combined across shuffle
    // partitions per group), and the p99 covers the tail quantile. The
    // estimates are deterministic given the data (no RNG in HLL++/KLL),
    // so the envelope booleans are stable across runs and engines.
    // Formulation: the DISTINCT aggregates and the value-buffering
    // quantile aggregates run as SEPARATE grouped aggregations joined on
    // the 3-row group key — one agg mixing them plans an Expand that
    // pushes every row twice through the percentile buffers (measured
    // 4.3 s warm mixed vs ~2 s split at sf0.1; same Expand economics as
    // the `Scratch sketch` shoot-out on the global form).
    "q_approx_sketch" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val distincts = li.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("n_parts_exact"),
        approx_count_distinct(col("l_partkey")).as("__n_approx"))
      val quantiles = li.groupBy(col("l_returnflag")).agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("__p50"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("__p99"),
        expr("percentile(l_extendedprice, array(0.5, 0.99))").as("__px"))
      // Envelope widths: HLL's default rsd 5% is ONE standard deviation,
      // and this row places three per-group bets on it (plus a tail
      // quantile) — a 2-3 sigma envelope keeps the gate deterministic
      // across fixture regenerations and Spark sketch-impl changes,
      // while any real sketch bug (wrong merge, wrong buffer) misses by
      // orders of magnitude, not percent. The tighter 1-sigma bet stays
      // on the single-estimate global q_sketch_accuracy row.
      distincts.join(quantiles, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_parts_exact"),
          (abs(col("__n_approx") - col("n_parts_exact")).cast("double")
            / col("n_parts_exact") <= 0.10).as("hll_within_10pct"),
          (abs(col("__p50") - col("__px").getItem(0)) / col("__px").getItem(0)
            <= 0.02).as("p50_within_2pct"),
          (abs(col("__p99") - col("__px").getItem(1)) / col("__px").getItem(1)
            <= 0.05).as("p99_within_5pct"))
    }),

    // Sketch accuracy gate (derived oracle for the sketch surface): the
    // exact distinct count is DuckDB-recomputable, and the HLL++/KLL
    // estimates must land within their documented error envelopes (HLL
    // default rsd 5%; quantile sketch at accuracy 1000 on this value
    // distribution well inside 2%) — a broken sketch fails hard, while
    // the envelope makes the row deterministic across engines.
    // Formulation: DISTINCT aggregate split from the value-buffering
    // aggregates and cross-joined (both single-row) — the mixed one-agg
    // form plans an Expand that pushes every row twice through the
    // percentile buffers (`Scratch sketch` at sf0.1: split 1.9 s warm /
    // 2.0 s cold vs mixed 2.1 s / 4.4 s; same economics as the grouped
    // q_approx_sketch split).
    "q_sketch_accuracy" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val exact = li.agg(countDistinct(col("l_partkey")).as("n_exact"))
      val rest = li.agg(
        approx_count_distinct(col("l_partkey")).as("__n_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("__p50_approx"),
        expr("percentile(l_extendedprice, 0.5)").as("__p50_exact"))
      exact.crossJoin(rest)
        .select(col("n_exact"),
          (abs(col("__n_approx") - col("n_exact")).cast("double") / col("n_exact")
            <= 0.05).as("hll_within_5pct"),
          (abs(col("__p50_approx") - col("__p50_exact")) / col("__p50_exact")
            <= 0.02).as("p50_within_2pct"))
    }),

    // Scalar subquery: planned as a ScalarSubquery node feeding the filter
    // (the subquery runs once, its result broadcast into the predicate).
    "q_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_acctbal FROM customer
              |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)""".stripMargin)
    }),

    // IN (subquery): rewritten by Catalyst to a left-semi join.
    "q_in_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              |WHERE o_custkey IN
              |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin)
    }),

    // Correlated NOT EXISTS: the null-aware anti-join surface.
    // Round-7's warm(2.67s) > cold(1.25s) inversion does not reproduce
    // on an idle session (Scratch repeat, 8 reps at sf0.1: 6.1 s first
    // touch, then 0.8-1.1 s steady) — it was scheduling variance under
    // the pre-phasing bench's session-wide cache pinning.
    "q_not_exists" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_name FROM customer c
              |WHERE NOT EXISTS
              |  (SELECT 1 FROM orders o
              |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin)
    }),

    // Running-total window frame (ROWS UNBOUNDED PRECEDING..CURRENT) with
    // a unique ordering so cumulative sums are engine-reproducible.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice")).over(w).as("running_total"))
    }),

    // Boolean/conditional aggregates: count_if, bool_or, bool_and.
    "q_bool_agg" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderpriority")).agg(
        count_if(col("o_totalprice") > 100000.0).as("n_big"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        bool_and(col("o_totalprice") > 0.0).as("all_pos"))))

  val oracles: Map[String, String] = Map(
    "q_approx_sketch" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts_exact,
        | TRUE AS hll_within_10pct, TRUE AS p50_within_2pct,
        | TRUE AS p99_within_5pct
        | FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_sketch_accuracy" ->
      """SELECT count(DISTINCT l_partkey) AS n_exact,
        | TRUE AS hll_within_5pct, TRUE AS p50_within_2pct
        | FROM lineitem""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        | WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)""".stripMargin,
    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | WHERE o_custkey IN
        |   (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin,
    "q_not_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
        | FROM orders""".stripMargin,
    "q_bool_agg" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        | bool_or(o_orderstatus = 'F') AS any_f,
        | bool_and(o_totalprice > 0.0) AS all_pos
        | FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | sum(l_extendedprice) AS sum_base_price,
        | sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        | avg(l_quantity) AS avg_qty, avg(l_discount) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_revenue" ->
      """SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue,
        | count(*) AS n_items
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name""".stripMargin,
    "q_join_left" ->
      """SELECT n_name, count(c_custkey) AS n_customers
        | FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        | GROUP BY n_name""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders
        |               WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders
        |                   WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        | FROM orders) x WHERE rn <= 2""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderdate
        | FROM orders""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT SELECT o_custkey AS c_custkey FROM orders""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer
        | EXCEPT SELECT o_custkey AS c_custkey FROM orders
        |        WHERE o_orderstatus = 'F'""".stripMargin,
    "q_union_all" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION ALL SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin,
    "q_cube" ->
      """SELECT n_name, c_mktsegment, count(*) AS n
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY CUBE (n_name, c_mktsegment)""".stripMargin,
    "q_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        | count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n_orders
        | FROM orders""".stripMargin,
    "q_string_fns" ->
      """SELECT p_partkey, upper(p_brand) AS brand_up,
        | substring(p_name, 1, 10) AS name10,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | p_brand || '#' || p_type AS brand_type
        | FROM part""".stripMargin,
    "q_date_trunc" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month, count(*) AS n,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        | FROM orders GROUP BY 1""".stripMargin,
    "q_case_math" ->
      """SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        | CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
        | CASE WHEN o_totalprice > 150000.0 THEN 'big'
        |      WHEN o_totalprice > 50000.0 THEN 'mid'
        |      ELSE 'small' END AS bucket
        | FROM orders""".stripMargin,
    "q_range_filter" ->
      """SELECT l_returnflag, count(*) AS n, max(l_extendedprice) AS max_price
        | FROM lineitem
        | WHERE l_quantity BETWEEN 10 AND 20 AND l_discount >= 0.05
        | GROUP BY l_returnflag""".stripMargin,
    "q_like_filter" ->
      """SELECT p_brand, count(*) AS n FROM part
        | WHERE p_type LIKE '%AR%' GROUP BY p_brand""".stripMargin,
    "q_in_list" ->
      """SELECT o_orderstatus, count(*) AS n, min(o_orderdate) AS first_order
        | FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        | GROUP BY o_orderstatus""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders
        | GROUP BY o_custkey HAVING count(*) >= 10""".stripMargin,
    "q_filtered_agg" ->
      """SELECT event_type,
        | count(*) FILTER (WHERE value > 100) AS n_big,
        | count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
        | count(*) AS n
        | FROM events GROUP BY event_type""".stripMargin,
    "q_time_bucket" ->
      """SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS window_start,
        | event_type, count(*) AS n
        | FROM events GROUP BY 1, 2""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS median_price,
        | quantile_cont(l_extendedprice, 0.9) AS p90_price
        | FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_regexp_extract" ->
      """SELECT doc_id,
        | regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        | regexp_extract(text, '[a-z]+', 0) AS first_word
        | FROM documents""".stripMargin,
    "q_cross_join" ->
      """SELECT r_name, count(*) AS n_pairs
        | FROM region CROSS JOIN nation GROUP BY r_name""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)
}
