package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.catalog.Tables

/** Relational core: the operator classes of SURVEY.md §2 exercised against
  * the driver's TPC-H-ish tables, each with a DuckDB-oracle SQL twin.
  *
  * Design rules (scale-first):
  *  - filters/projections are plain `Column` expressions so Catalyst pushes
  *    them into the parquet scan (verified via explain in the test suite);
  *  - dimension joins (`region`, `nation`, `customer`, `supplier`, `part`)
  *    are explicitly `broadcast()` — at 100 TB the fact side never shuffles
  *    for those joins;
  *  - aggregates on doubles are `round(_, 2)` on BOTH sides so the oracle
  *    hash-compare is immune to FP addition order;
  *  - every LIMIT query carries a total tie-break order so both engines
  *    select identical rows.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans + aggregation (SURVEY §2.6) ---
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // --- selective filter w/ pushdown (SURVEY §2.3) ---
    "q6_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    // --- fact⋈fact join + agg + top-N (SURVEY §2.4, §2.8) ---
    "q3_join_topn" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // --- multi-way broadcast join (SURVEY §2.4) ---
    "q5_multi_join" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // --- semi / anti joins (EXISTS / NOT EXISTS; SURVEY §2.4/§2.5 minus) ---
    "q_semi_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    }),
    "q_anti_join" -> ((s, dir) => {
      val ord = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // --- set operations (SURVEY §2.5) ---
    "q_union_dedup" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      val b = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      a.union(b).distinct()
    }),
    "q_intersect" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val b = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      a.intersect(b)
    }),
    "q_except" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey"))
      val b = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      a.except(b)
    }),

    // --- window functions (SURVEY §2.7 analog) ---
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("rn"))
    }),

    // cumulative sum per key — integer cents so the sequential fold is
    // engine-exact (windowed double sums associate differently across
    // engines)
    "q_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("cents")).over(w).as("run_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // lead/lag: seconds since the customer's previous order (null first)
    "q_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (unix_timestamp(col("o_orderdate")) -
            lag(unix_timestamp(col("o_orderdate")), 1).over(w)).as("gap_secs"))
    }),

    // exact interpolated percentiles over integer quantities (the
    // interpolation arithmetic is IEEE-exact on small ints)
    "q_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("q1"),
          expr("percentile(l_quantity, 0.5)").as("med"),
          expr("percentile(l_quantity, 0.75)").as("q3"))
    }),

    // --- sort + offset + limit (SURVEY §2.8 skip/limit) ---
    "q_skip_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .offset(100).limit(10)
    }),

    // --- distinct aggregation ---
    "q_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // --- group-by + having ---
    "q_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 1500)
    }),

    // --- rollup (multi-level aggregation in one pass; Spark expands
    // grouping sets before the hash aggregate — still a single shuffle) ---
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("qty"))
    }),

    // --- cube (all grouping-set combinations, still one shuffle) ---
    "q_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(avg(col("l_discount")), 4).as("avg_disc"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("avg_disc"))
    }),

    // --- RANGE-frame window (value-based frame over epoch seconds —
    // the trailing-window analytic, distinct from the ROWS running sum;
    // order-free aggregates (count/max) so frames hash identically) ---
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_30d"),
        round(max(col("o_totalprice")).over(w), 2).as("max_price_30d"))
    }),

    // --- SQL surface: correlated EXISTS (Catalyst rewrites to a semi
    // join — `.explain` shows the same plan as q_semi_join, proving the
    // SQL text a reference user types reaches the identical strategy) ---
    "q_exists_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      s.sql(
        """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
          |FROM g_orders WHERE EXISTS (
          |  SELECT 1 FROM g_lineitem
          |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin)
    }),

    // --- SQL surface: uncorrelated scalar subquery (one extra scalar
    // job, folded into the filter; avg of integer-valued quantities is
    // an exact sum / count — engine-identical) ---
    "q_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      s.sql(
        """SELECT l_returnflag, count(*) AS n FROM g_lineitem
          |WHERE l_quantity > (SELECT avg(l_quantity) FROM g_lineitem)
          |GROUP BY l_returnflag""".stripMargin)
    }),

    // --- SQL surface: correlated scalar aggregate subquery (rewritten to
    // an aggregated left join; integer-valued sums so the correlated
    // scalar is order-free) ---
    "q_corr_scalar" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      s.sql(
        """SELECT o_orderkey, round(o_totalprice, 2) AS tp FROM g_orders o
          |WHERE 100 < (SELECT coalesce(sum(l_quantity), 0) FROM g_lineitem l
          |             WHERE l.l_orderkey = o.o_orderkey)""".stripMargin)
    }),

    // --- salted skew join: the deterministic hot-key fallback when even
    // AQE's runtime skew splitting can't spread one key; same rows as the
    // plain join (the oracle IS the plain join), hot key spread over 16
    // salt streams ---
    "q_skew_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_quantity"), col("l_extendedprice"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.operators.Skew.saltedJoin(li, sup, "suppkey", nSalts = 16)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
    }),

    // --- arbitrary grouping sets (beyond cube/rollup: a hand-picked
    // subset lattice, one shuffle via the Expand operator) ---
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("revenue"))
    }),

    // --- pivot (wide aggregation; fixed pivot domain so the schema is
    // static and both engines emit identical columns) ---
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .na.fill(0.0, Seq("F", "O"))
    }),

    // --- scalar date/string functions + CASE ---
    "q_scalar_date" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),
    "q_case_expr" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 300000, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
    }),

    // --- events: time-bucketed aggregation + JSON extraction ---
    "q_events_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy((floor(unix_timestamp(col("ts")) / 3600) * 3600).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }),
    "q_events_json" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(get_json_object(col("props"), "$.k").cast("long") > 50)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")), 2).as("avg_value"))
    }),

    // as-of join: each purchase matched to the user's most recent click at
    // or before it (graft.operators.AsOfJoin — one keyed window, no range
    // explosion); clicks pre-deduped per (user, µs) so ties have a defined
    // "latest". Times as epoch micros on both engines (events.ts is
    // TIMESTAMP(NANOS); Spark truncates to µs on load, the oracle divides).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("us"))
        .agg(max(col("event_id")).as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "us")
        .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
          col("r_click_id").as("click_id"), (col("us") - col("r_us")).as("gap_us"))
    }),

    // tolerance arm of the as-of join, on the raw TIMESTAMP ordering
    // column (exercises the time-typed tolerance path: micros under the
    // hood): clicks more than 24h before the purchase don't match
    "q_asof_join_tol" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
          tolerance = Some(86400000000L)) // 24h in µs
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("r_click_id").as("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("r_ts"))).as("gap_us"))
    }),

    // interval join via RangeJoin's bin equi-join (no nested-loop shape):
    // shipment timestamps against keyed order-date windows of varying
    // width; 32-day bins ≈ the max window length
    "q_range_join" -> ((s, dir) => {
      val iv = t(s, dir, "orders").filter(col("o_orderkey") % 200 === 0)
        .select(col("o_orderkey").as("win_id"),
          (col("o_custkey") % 10).as("grp"),
          col("o_orderdate").as("lo"),
          expr("timestampadd(DAY, cast(o_orderkey % 30 + 1 as int), o_orderdate)").as("hi"))
      val pts = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          (col("l_suppkey") % 10).as("grp"), col("l_shipdate").as("p"))
      graft.operators.RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi",
          keys = Seq("grp"), binWidth = 86400000000L * 32)
        .select(col("l_orderkey"), col("l_linenumber"), col("grp"),
          unix_micros(col("p").cast("timestamp")).as("p_us"),
          col("r_win_id").as("win_id"),
          unix_micros(col("r_lo").cast("timestamp")).as("lo_us"),
          unix_micros(col("r_hi").cast("timestamp")).as("hi_us"))
    }))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_join_topn" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q_union_dedup" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn <= 2""".stripMargin,
    "q_skip_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 10 OFFSET 100""".stripMargin,
    "q_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  epoch(o_orderdate)::BIGINT - lag(epoch(o_orderdate)::BIGINT, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap_secs
        |FROM orders""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q1,
        |  quantile_cont(l_quantity, 0.5) AS med,
        |  quantile_cont(l_quantity, 0.75) AS q3
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_having" ->
      """SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY l_suppkey HAVING round(sum(l_quantity), 2) > 1500""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS n, round(avg(l_discount), 4) AS avg_disc
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER w AS n_30d,
        |  round(max(o_totalprice) OVER w, 2) AS max_price_30d
        |FROM orders WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY epoch(o_orderdate)
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_exists_subquery" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,
    "q_corr_scalar" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS tp FROM orders o
        |WHERE 100 < (SELECT coalesce(sum(l_quantity), 0) FROM lineitem l
        |             WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,
    "q_skew_join" ->
      """SELECT s_nationkey, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag AS rflag,
        |  coalesce(round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2), 0) AS "F",
        |  coalesce(round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2), 0) AS "O"
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_scalar_date" ->
      """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_case_expr" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |            WHEN o_totalprice < 300000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       o_orderstatus, count(*) AS n
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_events_window" ->
      """SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS hour_epoch, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n, round(avg(value), 2) AS avg_value
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |GROUP BY event_type""".stripMargin,
    "q_asof_join" ->
      """WITH c AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.us AS purchase_us, c.click_id,
        |       p.us - c.us AS gap_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us >= c.us""".stripMargin,
    "q_asof_join_tol" ->
      """WITH c AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.us AS purchase_us, c.click_id,
        |       p.us - c.us AS gap_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us >= c.us
        |WHERE p.us - c.us <= 86400000000""".stripMargin,
    "q_range_join" ->
      """WITH iv AS (SELECT o_orderkey AS win_id, o_custkey % 10 AS grp,
        |  o_orderdate AS lo,
        |  o_orderdate + INTERVAL ((o_orderkey % 30) + 1) DAY AS hi
        |  FROM orders WHERE o_orderkey % 200 = 0),
        |pts AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_suppkey % 10 AS grp, l_shipdate AS p FROM lineitem)
        |SELECT l_orderkey, l_linenumber, grp, epoch_ns(p) // 1000 AS p_us,
        |  win_id, epoch_ns(lo) // 1000 AS lo_us, epoch_ns(hi) // 1000 AS hi_us
        |FROM pts JOIN iv USING (grp) WHERE p BETWEEN lo AND hi""".stripMargin)
}
