package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** The remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q16/Q20/Q21/Q22),
  * adapted to the TESTDATA schema — together with `RelationalQueries` this
  * covers all 22 TPC-H queries' plan shapes. The schema has no `partsupp`
  * table and fewer columns (no shipmode/receiptdate/phone), so the queries
  * that need them are re-expressed over `lineitem` with the SAME relational
  * skeleton: Q2's correlated-min + dimension chain, Q11's
  * fraction-of-total HAVING, Q16's NOT-IN + count(distinct), Q20's
  * nested-aggregate semi join, Q21's multi-supplier exists/not-exists,
  * Q22's above-average anti-join.
  *
  * Oracle determinism: every float output is either an exact-decimal
  * aggregate cast to double, a raw column passthrough, or ONE double
  * division of two exact decimals. Threshold comparisons (Q11, Q17-style
  * 0.2·avg, Q20's half-of-total, Q22's above-average) are kept in exact
  * integer/decimal cross-multiplied form so no float rounding decides row
  * membership.
  */
object TpchQueries {
  private val D = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(D)
  private def one: Column = lit(1).cast(D)
  private def revenue: Column =
    (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast(DecimalType(18, 4))
  private val revSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    AS DECIMAL(18,4))""".stripMargin

  /** TPC-H Q2 shape — minimum-cost supplier: for each qualifying part, the
    * supplier(s) selling it at the part's MINIMUM price, restricted to one
    * region (partsupp's min(ps_supplycost) correlated subquery re-expressed
    * over lineitem prices). The min comparison runs on exact decimals.
    * Scale: the filtered part set and the per-part min frame are both tiny
    * relative to lineitem — they ride broadcasts; lineitem shuffles once
    * (the min aggregation); supplier/nation/region broadcast; top-100 via
    * TakeOrderedAndProject.
    */
  def q2MinCostSupp(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables(spark, dir, "part")
      .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_brand"))
    val li = Tables(spark, dir, "lineitem")
    val mn = li.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey").as("__pk"))
      .agg(min(dec(col("l_extendedprice"))).as("__mn"))
    val win = li.join(broadcast(mn), col("l_partkey") === col("__pk"))
      .filter(dec(col("l_extendedprice")) === col("__mn"))
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"), col("__mn"))
      .distinct()
    win
      .join(broadcast(Tables(spark, dir, "supplier")), col("sk") === col("s_suppkey"))
      .join(broadcast(Tables(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(pf), col("pk") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("pk").as("p_partkey"), col("p_brand"),
        col("__mn").cast(DoubleType).as("min_price"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  val q2Sql: String =
    s"""WITH pf AS (
      |  SELECT p_partkey, p_brand FROM part
      |  WHERE p_size <= 10 AND p_type = 'STANDARD'),
      |mn AS (
      |  SELECT l_partkey AS pk, min(CAST(l_extendedprice AS DECIMAL(18,2))) AS mn
      |  FROM lineitem JOIN pf ON l_partkey = p_partkey GROUP BY 1),
      |win AS (
      |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk, mn
      |  FROM lineitem JOIN mn ON l_partkey = pk
      |  WHERE CAST(l_extendedprice AS DECIMAL(18,2)) = mn)
      |SELECT s_acctbal, s_name, n_name, pk AS p_partkey, p_brand,
      |  CAST(mn AS DOUBLE) AS min_price
      |FROM win
      |JOIN supplier ON sk = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN pf ON pk = p_partkey
      |WHERE r_name = 'EUROPE'
      |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
      |LIMIT 100""".stripMargin

  /** TPC-H Q7 — volume shipping between two nations, by year. The nation
    * restriction is pushed to BOTH join inputs (supplier side and customer
    * side each pre-filter to the two nations) before the big
    * lineitem⋈orders shuffle; the cross-pair predicate then runs on the
    * reduced frame. Dimensions broadcast.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables(spark, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables(spark, dir, "customer")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables(spark, dir, "lineitem").filter(
      col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
      col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(revenue).cast(DoubleType).as("revenue"))
  }

  val q7Sql: String =
    s"""SELECT supp_nation, cust_nation, yr, CAST(sum(rev) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS yr,
      |    $revSql AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') t
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 — national market share: one supplier nation's fraction of
    * PROMO revenue sold into one region, by order year. Numerator and
    * denominator are exact decimal sums; the share is ONE double division.
    * Scale: customers pre-restricted to the region (broadcast
    * nation⋈region), part filter broadcast, supplier nation broadcast —
    * the only big shuffles are lineitem⋈orders and ⋈customer.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaCust = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")
          .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
          .select(col("n_nationkey").as("__snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("__snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val promo = Tables(spark, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val ord = Tables(spark, dir, "orders").filter(
      col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
      col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
    val zero = lit(0).cast(DecimalType(18, 4))
    Tables(spark, dir, "lineitem")
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(
        sum(when(col("supp_nation") === "NATION_11", revenue).otherwise(zero))
          .as("__num"),
        sum(revenue).as("__den"))
      .select(col("yr"),
        col("__num").cast(DoubleType).as("nation_revenue"),
        col("__den").cast(DoubleType).as("total_revenue"),
        (col("__num").cast(DoubleType) / col("__den").cast(DoubleType))
          .as("mkt_share"))
  }

  val q8Sql: String =
    s"""WITH t AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    $revSql AS rev,
      |    n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |SELECT yr,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_11' THEN rev
      |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_revenue,
      |  CAST(sum(rev) AS DOUBLE) AS total_revenue,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_11' THEN rev
      |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE) AS mkt_share
      |FROM t GROUP BY yr""".stripMargin

  /** TPC-H Q9 — product-line profit by supplier nation and year. partsupp's
    * ps_supplycost is re-expressed as a 10%-of-retail unit cost (exact
    * decimal: 2+2+1 fractional digits, no rounding), keeping Q9's
    * revenue-minus-cost aggregate over a name-LIKE part filter. Scale: all
    * dimensions broadcast; lineitem scans once, one group shuffle.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val red = Tables(spark, dir, "part").filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val cost = (dec(col("p_retailprice")) * dec(col("l_quantity")) *
      lit(new java.math.BigDecimal("0.1"))).cast(DecimalType(18, 6))
    Tables(spark, dir, "lineitem")
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(revenue - cost).cast(DoubleType).as("profit"))
  }

  val q9Sql: String =
    s"""SELECT nation, yr, CAST(sum(amount) AS DOUBLE) AS profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS yr,
      |    $revSql
      |    - CAST(CAST(p_retailprice AS DECIMAL(18,2))
      |      * CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(0.1 AS DECIMAL(2,1)) AS DECIMAL(18,6)) AS amount
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%') t
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11 — important parts: per-part revenue from a nation subset's
    * suppliers, keeping parts whose share exceeds 3× the mean (the original
    * fixed fraction doesn't survive scale changes: per-part share shrinks
    * as the part count grows, so the threshold is mean-relative). The
    * comparison `val·n > 3·total` stays in exact decimal×integer form.
    * Scale: one partkey shuffle; the grand total is a single-row broadcast.
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_7"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables(spark, dir, "lineitem")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("__val"))
    val tot = v.agg(sum(col("__val")).as("__t"), count(lit(1)).as("__n"))
    v.crossJoin(broadcast(tot))
      .filter(col("__val") * col("__n") > col("__t") * lit(3))
      .select(col("p_partkey"), col("__val").cast(DoubleType).as("value"))
  }

  val q11Sql: String =
    """WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_3', 'NATION_7')
      |  GROUP BY 1),
      |tot AS (SELECT sum(val) AS t, count(*) AS n FROM v)
      |SELECT p_partkey, CAST(val AS DOUBLE) AS value
      |FROM v, tot WHERE val * n > t * 3""".stripMargin

  /** TPC-H Q16 — supplier counts by part attributes, excluding one brand,
    * one type, a size set, and suppliers with negative balances (the
    * complaints NOT-IN). The NOT IN is a broadcast anti join (keys
    * non-null); count(distinct) expands to Spark's two-phase distinct
    * aggregation. Scale: part filter broadcast; one expand shuffle.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables(spark, dir, "part").filter(
      col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
      col("p_size").isin(1, 4, 7, 10, 15, 20, 25, 30))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = Tables(spark, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q20 — dominant suppliers: suppliers shipping more than half of
    * some 'red'-part's 1996 volume (partsupp's availqty>half-of-shipped
    * re-expressed as share-of-part-total). The half comparison is exact
    * (2·sq > total). Scale: the (supp, part) aggregate reuses its shuffle
    * for the per-part total (partial agg over the same rows); supplier and
    * nation broadcast.
    */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val red = Tables(spark, dir, "part").filter(col("p_name").like("red %"))
      .select(col("p_partkey"))
    val sp = Tables(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
      .agg(sum(dec(col("l_quantity"))).as("__sq"))
    // per-part totals derive from sp itself (already partitioned by a key
    // set containing pk's hash inputs — the window re-shuffles on pk only)
    val w = Window.partitionBy(col("pk"))
    sp.withColumn("__tot", sum(col("__sq")).over(w))
      .filter(col("__sq") * lit(2) > col("__tot"))
      .select(col("sk")).distinct()
      .join(broadcast(Tables(spark, dir, "supplier")), col("sk") === col("s_suppkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  val q20Sql: String =
    """WITH sp AS (
      |  SELECT l_suppkey AS sk, l_partkey AS pk,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red %'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |ptot AS (SELECT pk, sum(sq) AS tot FROM sp GROUP BY 1)
      |SELECT DISTINCT s_suppkey, s_name, n_name
      |FROM sp
      |JOIN ptot USING (pk)
      |JOIN supplier ON sk = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE sq * 2 > tot""".stripMargin

  /** TPC-H Q21 — suppliers who kept orders waiting: on multi-supplier 'F'
    * orders, the UNIQUE supplier that shipped >60 days after the order date
    * (receiptdate/commitdate re-expressed via shipdate lateness). The
    * exists/not-exists pair becomes per-order supplier and late-supplier
    * counts in ONE window pass over the (order, supplier) aggregate.
    * Scale: one orderkey join shuffle, one (order,supplier) agg, one
    * window shuffle on orderkey; top-20 via TakeOrderedAndProject.
    */
  def q21WaitingSupp(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables(spark, dir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max(when(
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
        .otherwise(0L)).as("late"))
    val w = Window.partitionBy(col("ok"))
    l.withColumn("__nsupp", count(lit(1)).over(w))
      .withColumn("__nlate", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("__nsupp") > 1 && col("__nlate") === 1)
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables(spark, dir, "supplier")), col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  val q21Sql: String =
    """WITH l AS (
      |  SELECT l_orderkey AS ok, l_suppkey AS sk,
      |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |             THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY 1, 2),
      |o AS (SELECT ok, count(*) AS nsupp, sum(late) AS nlate FROM l GROUP BY 1)
      |SELECT s_name, count(*) AS numwait
      |FROM l JOIN o USING (ok) JOIN supplier ON sk = s_suppkey
      |WHERE late = 1 AND nsupp > 1 AND nlate = 1
      |GROUP BY 1
      |ORDER BY numwait DESC, s_name ASC
      |LIMIT 20""".stripMargin

  /** TPC-H Q22 — idle wealthy customers: customers above the average
    * positive balance with no RECENT orders (every testdata customer has
    * orders, so the original no-orders NOT EXISTS gets a date cutoff),
    * grouped by nation (no phone column — nationkey is the country code).
    * The above-average test is exact (bal·n > sum). Scale: the global
    * average is a single-row broadcast; the NOT EXISTS is an anti join
    * shuffled on custkey against the date-filtered orders.
    */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("__s"), count(lit(1)).as("__n"))
    val recent = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01 00:00:00").cast(TimestampType))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(pos))
      .filter(dec(col("c_acctbal")) * col("__n") > col("__s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast(DoubleType).as("totacctbal"))
  }

  val q22Sql: String =
    """WITH pos AS (
      |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
      |  FROM customer WHERE c_acctbal > 0),
      |cand AS (
      |  SELECT c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer, pos
      |  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
      |    AND NOT EXISTS (SELECT 1 FROM orders
      |                    WHERE o_custkey = c_custkey
      |                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'))
      |SELECT c_nationkey, count(*) AS numcust,
      |  CAST(sum(bal) AS DOUBLE) AS totacctbal
      |FROM cand GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supp" -> (q2MinCostSupp(_, _)),
    "q7_volume_shipping" -> (q7VolumeShipping(_, _)),
    "q8_market_share" -> (q8MarketShare(_, _)),
    "q9_product_profit" -> (q9ProductProfit(_, _)),
    "q11_important_parts" -> (q11ImportantParts(_, _)),
    "q16_supplier_cnt" -> (q16SupplierCnt(_, _)),
    "q20_excess_suppliers" -> (q20ExcessSuppliers(_, _)),
    "q21_waiting_supp" -> (q21WaitingSupp(_, _)),
    "q22_idle_customers" -> (q22IdleCustomers(_, _)))

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supp" -> q2Sql,
    "q7_volume_shipping" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q9_product_profit" -> q9Sql,
    "q11_important_parts" -> q11Sql,
    "q16_supplier_cnt" -> q16Sql,
    "q20_excess_suppliers" -> q20Sql,
    "q21_waiting_supp" -> q21Sql,
    "q22_idle_customers" -> q22Sql)
}
