package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Tables, Num}

/** Relational operator library.
  *
  * The reference's user-operator surface is flatMap-shaped Python executables
  * (reference src/Streaming/framework.py:11-70): regex filter
  * (tests/sample1_op1.py:8-13), projection (tests/sample1_op2.py:7-16),
  * equality filter (tests/sample2_op1.py:8-16), stateful count-by-key
  * (tests/sample2_op2.py:6-20). Here each shape is a declarative DataFrame
  * transform so Catalyst gets pushdown, pruning, join selection and
  * whole-stage codegen — none of which the reference has (SURVEY.md §4).
  *
  * Scale notes (100 TB):
  *  - filters/projections reach the parquet scan (PushedFilters/ReadSchema);
  *  - aggregations are partial (map-side combine) before the exchange;
  *  - small-dimension joins are explicitly `broadcast()` so the fact table
  *    never shuffles;
  *  - top-k is `TakeOrderedAndProject` (no global sort);
  *  - AQE (enabled in the session) re-plans skew and coalesces partitions.
  */
object Relational {

  import Num._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: the canonical "aggregate after scan" — partial agg on
    // 6 groups means virtually no shuffle at any scale.
    "q01_pricing_summary" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Filter + projection: both reach the parquet scan (PushedFilters).
    "q02_filter_project" -> ((s, d) => {
      Tables(s, d, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Top-k: orderBy+limit compiles to TakeOrderedAndProject — per-partition
    // heaps + driver merge, no global sort at 100 TB. Unique tie-break on
    // o_orderkey keeps the result deterministic across engines.
    "q03_topk_orders" -> ((s, d) => {
      Tables(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // Shuffle join on the orders side; customer is small → broadcast, so
    // only one side ever moves.
    "q04_join_agg" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    }),

    // Broadcast dimension join: part is tiny relative to lineitem at every
    // scale factor; the filter on p_size prunes before the join.
    "q05_broadcast_join" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
      val p = Tables(s, d, "part").filter(col("p_size") < 15)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("total_price"))
    }),

    // Semi join (EXISTS): never materializes order columns.
    "q06_semi_join" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // Anti join (NOT EXISTS): customers that never had a finished order.
    "q07_anti_join" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // Ranking window: first order per customer. Window shuffles once on
    // o_custkey; deterministic via the (date, key) composite order.
    "q08_window_first_order" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("first_order_date"))
    }),

    // Rollup over a two-table join: grouping-set machinery the reference
    // lacks entirely (SURVEY.md §2.3 "absent").
    "q09_rollup" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Distinct = shuffle on the key; trivially small output.
    "q10_distinct" -> ((s, d) =>
      Tables(s, d, "events").select(col("event_type")).distinct()),

    // Set algebra (absent in the reference, SURVEY.md §2.4): customers with
    // finished orders but no open orders.
    "q11_set_ops" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      f.distinct().except(open.distinct())
    }),

    // Event-time tumbling day aggregate (batch twin of the streaming
    // windowed agg in graft.streaming).
    "q12_events_daily" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    }),

    // Cube (also absent in the reference).
    "q13_cube" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
    }),

    // Window aggregate + filter: orders above their customer's average.
    "q14_above_avg_orders" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
      Tables(s, d, "orders")
        .withColumn("cavg",
          sum(Num.scaledLong(col("o_totalprice"), 2))
            .over(w).cast("double") / 100.0
            / count(lit(1)).over(w))
        .filter(col("o_totalprice") > col("cavg"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_above_avg"))
    }),

    // Multi-way join through the star schema with two broadcast dims.
    "q15_star_join" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      val r = Tables(s, d, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum4("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
         |  ${sqlDsum("l_discount")} / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O'""".stripMargin,

    "q03_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q04_join_agg" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin,

    "q05_broadcast_join" ->
      s"""SELECT p_brand, COUNT(*) AS n_items,
         |  ${sqlDsum("l_extendedprice")} AS total_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size < 15 GROUP BY p_brand""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_nationkey""".stripMargin,

    "q08_window_first_order" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS first_order_date
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,

    "q09_rollup" ->
      """SELECT n_name, o_orderpriority, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin,

    "q10_distinct" -> "SELECT DISTINCT event_type FROM events",

    "q11_set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "q12_events_daily" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         |  COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q13_cube" ->
      s"""SELECT l_returnflag, l_linestatus, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q14_above_avg_orders" ->
      """SELECT o_orderstatus, COUNT(*) AS n_above_avg FROM (
        |  SELECT o_orderstatus, o_totalprice,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
        |      (PARTITION BY o_custkey) AS DOUBLE) / 100
        |      / COUNT(*) OVER (PARTITION BY o_custkey) AS cavg
        |  FROM orders)
        |WHERE o_totalprice > cavg GROUP BY o_orderstatus""".stripMargin,

    "q15_star_join" ->
      s"""SELECT r_name,
         |  ${sqlDsum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin
  )
}
