package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General relational query surface over the driver testdata — exercises the
  * engine layers every RIB query is built from (scan → filter → join → agg →
  * window → sort/limit) and doubles as the bench headline set.
  *
  * Output discipline for the DuckDB oracle: only BIGINT / STRING columns,
  * explicit ORDER BY on every query (both sides), and money/double sums
  * scaled to integer cents per row before aggregation so floating-point
  * summation order cannot flip a hash compare.
  */
object RelationalQueries {

  /** Per-row exact cents: round(x*100) as BIGINT — deterministic on both
    * engines for 2-decimal generated data. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-flavored pricing summary: partial-agg friendly single pass;
    // shuffles only the 4-group key space.
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Join + agg + top-k: orders ⨝ customer ⨝ nation, revenue by nation.
    // customer/nation are broadcast (dims ≪ fact at every SF).
    "q_join_revenue" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("o_totalprice"))).as("revenue_c"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // Window ranking: top order per customer by total price (dedup-rank
    // pattern; single shuffle on o_custkey).
    "q_window_toporder" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("totalprice_c"))
        .orderBy(col("o_custkey"))
    }),

    // Semi-join (EXISTS) + anti-join (NOT EXISTS) counts in one output row.
    "q_semi_anti" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").select(col("l_orderkey")).distinct()
      val o = Tables(s, dir, "orders")
      val withLi = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi").count()
      val withoutLi = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti").count()
      val s2 = s
      import s2.implicits._
      Seq((withLi, withoutLi)).toDF("n_with_lineitems", "n_without_lineitems")
    }),

    // Event-time tumbling-window aggregation (daily) per event type — the
    // batch view of the streaming ST1 aggregation; partition-prunable by day.
    "q_events_daily" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(date_trunc("DAY", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("value_c"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_millis(col("day").cast("timestamp")).as("day_ms"), col("event_type"),
          col("n"), col("value_c"), col("n_users"))
        .orderBy(col("day_ms"), col("event_type"))
    }),

    // Gap-based sessionization (round 12): 30-minute-gap sessions per
    // user over the event stream, rolled up to per-session stats — one
    // keyed exchange serves the boundary lag, the running session index
    // and the rollup; the oracle replays the identical window logic.
    // per-user daily rate anomalies (round 12): exact integer z-score —
    // the cross-multiplied inequality (x·n − s)²·10⁶ ≥ z²·(n·ss − s²)
    // replayed verbatim by the oracle; zero-variance users flag nothing
    "q_events_anomalies" -> ((s, dir) =>
      graft.operators.Temporal.rateAnomalies(
        Tables(s, dir, "events"), "user_id", "ts", zX1000 = 2000L)
        .select(col("user_id"),
          unix_millis(col("day").cast("timestamp")).as("day_ms"),
          col("n_events"), col("n_days"))
        .orderBy(col("user_id"), col("day_ms"))),
    "q_events_sessions" -> ((s, dir) => {
      graft.operators.Temporal.sessionize(
        Tables(s, dir, "events"), "user_id", "ts",
        gapMs = 1800000L, tieCol = "event_id")
        .groupBy(col("user_id"), col("session"))
        .agg(count(lit(1)).as("n_events"),
          unix_millis(min(col("ts"))).as("start_ms"),
          unix_millis(max(col("ts"))).as("end_ms"),
          sum(cents(col("value"))).as("value_c"))
        .orderBy(col("user_id"), col("session"))
    }),

    // Fact⨝dim join + group + top-k: revenue by part brand, top 10 —
    // part is broadcast; TakeOrderedAndProject caps the sort at k.
    "q_join_parts_topn" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_c"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue_c").desc, col("p_brand"))
        .limit(10)
    }),

    // Scan-dominant date-range + projection: the pushdown showcase — the
    // predicate and the 2-column read schema both reach the Parquet scan.
    "q_filter_pushdown" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_c"),
          count(lit(1)).as("n_rows"))),

    // Pagination contract (Q4): deterministic order + offset/limit — page 3
    // of orders by (date, key). orderBy+offset+limit plans as a single
    // TakeOrderedAndProject (per-partition top-k heaps), not a global window.
    "q_pagination" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .offset(200).limit(100)
        .select(col("o_orderkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
          cents(col("o_totalprice")).as("totalprice_c"))
        .orderBy(col("o_orderkey"))))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_toporder" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c
        |FROM (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn=1 ORDER BY o_custkey""".stripMargin,
    "q_semi_anti" ->
      """SELECT
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)) AS n_with_lineitems,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)) AS n_without_lineitems""".stripMargin,
    "q_events_daily" ->
      """SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_events_anomalies" ->
      """WITH daily AS (
        |  SELECT user_id,
        |    CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_events) AS BIGINT) AS s,
        |    SUM(CAST(n_events AS HUGEINT) * n_events) AS ss
        |  FROM daily GROUP BY 1
        |)
        |SELECT d.user_id, d.day_ms, d.n_events, st.n AS n_days
        |FROM daily d JOIN st USING (user_id)
        |WHERE st.n >= 2 AND (st.n * st.ss - CAST(st.s AS HUGEINT) * st.s) > 0
        |  AND CAST(d.n_events * st.n - st.s AS HUGEINT)
        |        * (d.n_events * st.n - st.s)
        |      >= (4000000 * (st.n * st.ss - CAST(st.s AS HUGEINT) * st.s)
        |          + 999999) // 1000000
        |ORDER BY 1, 2""".stripMargin,
    "q_events_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |      OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |      THEN 1 ELSE 0 END AS b
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    SUM(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        |  FROM o
        |)
        |SELECT user_id, CAST(session AS BIGINT) AS session,
        |  COUNT(*) AS n_events,
        |  CAST(epoch_ms(MIN(ts)) AS BIGINT) AS start_ms,
        |  CAST(epoch_ms(MAX(ts)) AS BIGINT) AS end_ms,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_join_parts_topn" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |GROUP BY 1 ORDER BY revenue_c DESC, p_brand LIMIT 10""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT
        |  CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q_pagination" ->
      """SELECT o_orderkey, CAST(epoch_ms(o_orderdate) AS BIGINT) AS odate_ms,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_c
        |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn > 200 AND rn <= 300 ORDER BY o_orderkey""".stripMargin)
}
