package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Relational query pack over the TESTDATA tables: scans, filters, joins
  * (broadcast/semi/anti), aggregations, window functions, sorts, limits, set
  * ops — the Spark-side surface SURVEY.md §2.1–§2.5 maps the reference's
  * storage procedures onto.
  *
  * Oracle determinism: every float-valued output is derived from exact
  * DECIMAL arithmetic (then cast to double), is a raw column passthrough, or
  * is an exact-integer-derived ratio — so Spark and DuckDB hash-match
  * bit-for-bit regardless of aggregation order. Timestamps are emitted as
  * epoch millis (bigint).
  */
object RelationalQueries {
  private val D = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(D)
  private def one: Column = lit(1).cast(D)

  /** TPC-H Q1-style pricing summary (group agg with exact decimal math).
    * Scale: single shuffle on the 6-value group key with map-side partial
    * aggregation; scan is column-pruned to 7 columns.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val discPrice =
      (dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).cast(DecimalType(18, 4))
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        sum(discPrice * (one + dec(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
  }

  val q1Sql: String =
    """WITH t AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |         AS DECIMAL(18,4)) AS disc_price,
      |    CAST(l_tax AS DECIMAL(18,2)) AS tax
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      |SELECT l_returnflag, l_linestatus,
      |  CAST(sum(qty) AS DOUBLE) AS sum_qty,
      |  CAST(sum(price) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(disc_price) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(disc_price * (CAST(1 AS DECIMAL(18,2)) + tax)) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order,
      |  CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(price) AS DOUBLE) / count(*) AS avg_price
      |FROM t GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join + group + global top-10.
    * Scale: orders/customer filtered before the join; top-10 via
    * TakeOrderedAndProject (no global sort materialization).
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1995-03-15 00:00:00").cast(TimestampType)
    val cust = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = Tables(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    val revenue = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast(DecimalType(18, 4))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"))
      // o_orderdate is TIMESTAMP_NTZ; session tz is UTC, so NTZ→TZ cast
      // yields the same wall-clock epoch millis DuckDB's epoch_ms computes.
      .select(col("o_orderkey"), col("revenue"),
        unix_millis(col("o_orderdate").cast(TimestampType)).as("o_orderdate_ms"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q3Sql: String =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  epoch_ms(o_orderdate) AS o_orderdate_ms
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style multi-join through the region/nation dimension chain.
    * Scale: the dimension tables (region, nation, supplier) are explicitly
    * broadcast; only the lineitem⋈orders join shuffles on orderkey.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(spark, dir, "nation")
    val supp = Tables(spark, dir, "supplier")
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val revenue = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast(DecimalType(18, 4))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  /** Point lookup (reference LSM `Get`, SURVEY S3): predicate pushdown +
    * parquet row-group stats replace the memtable/SSTable/bloom pipeline.
    */
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") === 42)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))

  val pointLookupSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem WHERE l_orderkey = 42""".stripMargin

  /** Global top-k by sort key (SURVEY A1's sort+truncate as a relational op);
    * plans as TakeOrderedAndProject — per-partition heaps, no full sort.
    */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  val topkOrdersSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Anti join (NOT EXISTS): customers that never placed an order. */
  def customerNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val customerNoOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin

  /** Outer join with null-handling: per-order lineitem count and quantity,
    * zero for orders with no lineitems (coalesce over the null side).
    */
  def ordersLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"), sum(dec(col("l_quantity"))).as("qty"))
    ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .select(
        col("o_orderkey"),
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        coalesce(col("qty").cast(DoubleType), lit(0.0)).as("sum_qty"))
  }

  val ordersLeftJoinSql: String =
    """SELECT o_orderkey,
      |  coalesce(n_items, 0) AS n_items,
      |  coalesce(CAST(qty AS DOUBLE), 0.0) AS sum_qty
      |FROM orders LEFT JOIN (
      |  SELECT l_orderkey, count(*) AS n_items,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem GROUP BY l_orderkey) t
      |ON o_orderkey = l_orderkey""".stripMargin

  /** Set op: UNION (with dedup) of two key sets. */
  def unionNationKeys(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = Tables(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.union(s).distinct()
  }

  val unionNationKeysSql: String =
    "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier"

  /** Last-write-wins dedup — the reference's compaction semantics
    * (`tree_compact.go:109-130`: newer SSTables overwrite older) expressed as
    * a window group-limit: latest event per user. This is the same plan shape
    * DocStore.compact uses. Scale: WindowGroupLimit prunes to 1 row per
    * (user, partition) before the shuffle.
    */
  /** events with `ts` normalized to int64 nanos since epoch (Tables.events
    * handles the driver's parquet encodings); all ts math below is exact
    * int64 nanos, so ordering/truncation agree with DuckDB's epoch clock.
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  def lwwLatestEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
  }

  val lwwLatestEventsSql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  /** Tumbling-window aggregation over the event stream table (hourly): the
    * batch shape of the Structured Streaming ingest path. Exact decimal sums.
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.groupBy(
        (expr("ts div 3600000000000") * 3600000L).as("hour_ms"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
  }

  // hour bucket = truncating ns-tick division on both sides (Spark `div` ≡
  // DuckDB integer `//`), not date_trunc — date_trunc floors and diverges
  // on pre-epoch timestamps (see AnalyticsQueries.retentionCohorts).
  val eventsHourlySql: String =
    """SELECT epoch_ns(ts) // 3600000000000 * 3600000 AS hour_ms, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** TPC-H Q6-style scan-only aggregation: tight filters + one global sum —
    * the shape where pushdown does all the work (no shuffle but the final
    * single-row combine).
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1994-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1995-01-01 00:00:00").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** ROLLUP grouping-set hierarchy (beyond-reference relational surface). */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"))
  }

  val rollupRevenueSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Exact distinct aggregation (count(distinct) expands to a two-phase
    * plan; HLL sketches are the approximate variant, not oracle-able).
    */
  def eventsUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  val eventsUsersSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** Analytic window functions: running sum (exact decimal), lag, rank. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    ev.select(
      col("user_id"), col("event_id"),
      sum(col("value").cast(DecimalType(18, 6))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(DoubleType).as("running_value"),
      lag(col("event_id"), 1).over(w).as("prev_event_id"),
      rank().over(w).cast("long").as("rnk"))
  }

  val windowRunningSql: String =
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
      |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_event_id,
      |  CAST(rank() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS rnk
      |FROM events""".stripMargin

  /** Q4-style: semi join + date arithmetic — orders (by priority) having at
    * least one lineitem shipped more than 30 days after the order date.
    */
  def q4LatePriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select(col("o_orderkey").as("late_key")).distinct()
    ord.join(late, col("o_orderkey") === col("late_key"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o.o_orderkey
      |    AND l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** String-function surface: LIKE filter, substring, upper, length. */
  def partTypeStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_type").like("%M%")) // MEDIUM, SMALL, PROMO
      .groupBy(
        upper(substring(col("p_brand"), 1, 5)).as("brand5"),
        length(col("p_type")).cast("long").as("type_len"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("p_retailprice"))).cast(DoubleType).as("sum_price"))

  val partTypeStatsSql: String =
    """SELECT upper(substring(p_brand, 1, 5)) AS brand5,
      |  CAST(length(p_type) AS BIGINT) AS type_len,
      |  count(*) AS n,
      |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM part WHERE p_type LIKE '%M%'
      |GROUP BY 1, 2""".stripMargin

  /** Batch sessionization: inactivity-gap sessions (30 min) via
    * lag + running conditional sum — the oracle-checked batch twin of the
    * streaming `Sessionize` operator (same gap semantics; streaming adds the
    * watermark-timeout close). ts is nanos (nanosAsLong); boundaries emit as
    * epoch millis. Scale: two window passes over the same (user, ts)
    * ordering — one shuffle, both windows share it.
    */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapNs = 30L * 60L * 1000000000L
    // explicit key-spread: the session windows are per-row compute over few
    // bytes, which AQE's byte-based coalescing serializes onto one task at
    // small inputs (see Skew.spreadByKey); the windows and the session
    // aggregation below all reuse this one exchange
    graft.operators.Skew.spreadByKey(
        ev.select(col("user_id"), col("event_id"), col("ts"), col("value")),
        Seq("user_id"))
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts") - col("__prev") > gapNs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        expr("min(ts) div 1000000").as("start_ms"),
        expr("max(ts) div 1000000").as("end_ms"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
  }

  val sessionizeBatchSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, ts, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, value,
      |    -- nanosecond arithmetic, matching Spark's nanos-long comparison
      |    -- (interval comparison would truncate sub-microsecond gaps)
      |    sum(CASE WHEN prev IS NULL OR epoch_ns(ts) - epoch_ns(prev) > 1800000000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM o)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_idx""".stripMargin

  /** TPC-H Q10-style returned-item report: revenue lost to returns per
    * customer, 4-way join through the nation dimension, global top-20.
    * Scale: lineitem pre-filtered to returns before the join; nation
    * broadcast; top-20 via TakeOrderedAndProject.
    */
  def q10ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val revenue = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast(DecimalType(18, 4))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  /** TPC-H Q12-style priority classification: conditional CASE-sum counts
    * per return flag (Q12's shipmode column doesn't exist in this schema;
    * the conditional-aggregation shape is what's exercised). Scale: one
    * equi-join shuffle + map-side-combined conditional sums.
    */
  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        // when(IN, 0).otherwise(1) — NOT when(NOT IN, 1) — so a NULL
        // priority lands in the otherwise branch exactly like the oracle's
        // CASE WHEN ... THEN 0 ELSE 1 (NOT IN on NULL would yield 0/0)
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_returnflag""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: conditional LEFT
    * join (the join predicate filters the right side, not the result), then
    * a two-level aggregation. Scale: one custkey shuffle for the join+count,
    * one (tiny) shuffle on the count value for the distribution.
    */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    cust.join(ord,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q14-style promo-revenue share: join + two conditional decimal
    * sums, ONE double division at the end (exact-decimal numerator and
    * denominator → the ratio is bit-deterministic in any engine). Scale:
    * part is the small side (broadcast); lineitem pre-filtered by shipdate
    * before the join.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(
      col("l_shipdate") >= lit("1995-09-01 00:00:00").cast(TimestampType) &&
      col("l_shipdate") < lit("1995-10-01 00:00:00").cast(TimestampType))
    val part = Tables(spark, dir, "part")
    val revenue = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast(DecimalType(18, 4))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0).cast(DecimalType(18, 4))))
          .as("__promo"),
        sum(revenue).as("__total"))
      .select(
        col("__promo").cast(DoubleType).as("promo_revenue"),
        col("__total").cast(DoubleType).as("total_revenue"),
        (col("__promo").cast(DoubleType) / col("__total").cast(DoubleType) * lit(100.0))
          .as("promo_pct"))
  }

  val q14Sql: String =
    """WITH t AS (
      |  SELECT p_type,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |         AS DECIMAL(18,4)) AS rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00')
      |SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(sum(rev) AS DOUBLE) AS total_revenue,
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE) * 100.0 AS promo_pct
      |FROM t""".stripMargin

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, then the
    * supplier(s) achieving the maximum. The max comparison runs on the EXACT
    * decimal sums (a double compare could disagree across engines on ties).
    * Scale: revenue is one suppkey shuffle; the max is a single-row
    * broadcast back against it — no second scan of lineitem.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(
      col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
      col("l_shipdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
    val revenue = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast(DecimalType(18, 4))
    val rev = li.groupBy(col("l_suppkey")).agg(sum(revenue).as("__r"))
    val top = rev.agg(max(col("__r")).as("__rmax"))
    rev.crossJoin(broadcast(top))
      .filter(col("__r") === col("__rmax"))
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__r").cast(DoubleType).as("total_revenue"))
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        AS DECIMAL(18,4))) AS r
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE r = (SELECT max(r) FROM rev)""".stripMargin

  /** TPC-H Q17-style small-quantity revenue: rows whose quantity is below
    * 20% of their part's average. The correlated AVG subquery becomes one
    * per-part aggregation joined back; the 0.2·avg comparison is kept in
    * EXACT integer/decimal form (5·qty·n < sum_qty) so no float rounding
    * decides membership. Scale: two partkey shuffles (agg + join), part
    * broadcast; the avg side never rescans lineitem.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part").filter(col("p_brand") === "Brand#11")
    val perPart = li.groupBy(col("l_partkey").as("__pk"))
      .agg(sum(dec(col("l_quantity"))).as("__sq"), count(lit(1)).as("__n"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("__pk"))
      .filter(dec(col("l_quantity")) * lit(5) * col("__n") < col("__sq"))
      .agg(
        sum(dec(col("l_extendedprice"))).as("__se"),
        count(lit(1)).as("n"))
      .select(
        (col("__se").cast(DoubleType) / lit(7.0)).as("avg_yearly"),
        col("n"))
  }

  val q17Sql: String =
    """WITH agg AS (
      |  SELECT l_partkey AS pk,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq, count(*) AS n
      |  FROM lineitem GROUP BY 1)
      |SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN agg ON pk = l_partkey
      |WHERE p_brand = 'Brand#11'
      |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sq""".stripMargin

  /** TPC-H Q18-style large orders: orders whose total quantity exceeds 300,
    * with customer detail. The HAVING side aggregates lineitem FIRST (the
    * group-filter result is tiny), then joins orders/customer — never the
    * other way around. Scale: one orderkey shuffle; the filtered key set
    * rides a broadcast join.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("__qty"))
      .filter(col("__qty") > lit(300).cast(D))
    Tables(spark, dir, "orders")
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast(TimestampType)).as("o_orderdate_ms"),
        col("o_totalprice"),
        col("__qty").cast(DoubleType).as("sum_qty"))
  }

  val q18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  epoch_ms(o_orderdate) AS o_orderdate_ms, o_totalprice,
      |  CAST(qty AS DOUBLE) AS sum_qty
      |FROM (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** TPC-H Q19-style OR-of-ANDs revenue: three brand/size/quantity predicate
    * branches OR'd together. The disjunction references BOTH sides of the
    * join, so only the common conjuncts (join key) push below it — the shape
    * that exercises CNF extraction. Scale: part broadcast; lineitem scans
    * once.
    */
  def q19Discounted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    val revenue = (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast(DecimalType(18, 4))
    val branch = (
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#20" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30)))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(sum(revenue).cast(DoubleType).as("revenue"), count(lit(1)).as("n"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_order_distribution" -> (q13OrderDistribution(_, _)),
    "q14_promo_revenue" -> (q14PromoRevenue(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q17_small_quantity" -> (q17SmallQuantity(_, _)),
    "q18_large_orders" -> (q18LargeOrders(_, _)),
    "q19_discounted" -> (q19Discounted(_, _)),
    "q10_returned_revenue" -> (q10ReturnedRevenue(_, _)),
    "q12_priority_class" -> (q12PriorityClass(_, _)),
    "sessionize_batch" -> (sessionizeBatch(_, _)),
    "q4_late_priority" -> (q4LatePriority(_, _)),
    "part_type_stats" -> (partTypeStats(_, _)),
    "q6_forecast" -> (q6Forecast(_, _)),
    "rollup_revenue" -> (rollupRevenue(_, _)),
    "events_users" -> (eventsUsers(_, _)),
    "window_running" -> (windowRunning(_, _)),
    "q1_pricing_summary" -> (q1PricingSummary(_, _)),
    "q3_shipping_priority" -> (q3ShippingPriority(_, _)),
    "q5_local_supplier" -> (q5LocalSupplier(_, _)),
    "point_lookup" -> (pointLookup(_, _)),
    "topk_orders" -> (topkOrders(_, _)),
    "customer_no_orders" -> (customerNoOrders(_, _)),
    "orders_left_join" -> (ordersLeftJoin(_, _)),
    "union_nation_keys" -> (unionNationKeys(_, _)),
    "lww_latest_events" -> (lwwLatestEvents(_, _)),
    "events_hourly" -> (eventsHourly(_, _)))

  val oracles: Map[String, String] = Map(
    "q13_order_distribution" -> q13Sql,
    "q14_promo_revenue" -> q14Sql,
    "q15_top_supplier" -> q15Sql,
    "q17_small_quantity" -> q17Sql,
    "q18_large_orders" -> q18Sql,
    "q19_discounted" -> q19Sql,
    "q10_returned_revenue" -> q10Sql,
    "q12_priority_class" -> q12Sql,
    "sessionize_batch" -> sessionizeBatchSql,
    "q4_late_priority" -> q4Sql,
    "part_type_stats" -> partTypeStatsSql,
    "q6_forecast" -> q6Sql,
    "rollup_revenue" -> rollupRevenueSql,
    "events_users" -> eventsUsersSql,
    "window_running" -> windowRunningSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "point_lookup" -> pointLookupSql,
    "topk_orders" -> topkOrdersSql,
    "customer_no_orders" -> customerNoOrdersSql,
    "orders_left_join" -> ordersLeftJoinSql,
    "union_nation_keys" -> unionNationKeysSql,
    "lww_latest_events" -> lwwLatestEventsSql,
    "events_hourly" -> eventsHourlySql)
}
