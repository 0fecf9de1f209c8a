package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.sources.Tables
import graft.syntax._

/** Relational extension queries over the TPC-H-ish tables (SURVEY.md §2.7:
  * joins are absent from the reference and enter via the north-star
  * extension surface; the testdata star schema is the correctness vehicle).
  *
  * Scale design: dimension tables (region/nation/supplier, and customer at
  * any realistic ratio) are broadcast — no shuffle of the fact side;
  * fact-fact joins (lineitem⋈orders) shuffle on the join key once, and
  * AQE handles skew at the 100 TB end. Money aggregates go through
  * DECIMAL so partial/final aggregation is order-exact.
  */
object RelationalOps {

  /** Exact money sum, bit-identical across engines: decimal sum (exact,
    * order-independent), re-scaled to DECIMAL(24,4) so the scaled integer
    * stays < 2^53 and the final double conversion is a single correctly-
    * rounded operation on both engines (DuckDB's int128-scaled decimals
    * double-round on direct conversion — bitten at sf0.1).
    */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast(DecimalType(24, 4)).cast("double")

  /** Exact integer cents of a ≤2dp double column (for exact averages). */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  /** TPC-H Q1-style pricing summary over lineitem. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        moneySum($"l_quantity").as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
          .cast(DecimalType(24, 4)).cast("double").as("sum_disc_price"),
        (sum(cents($"l_quantity")).cast("double") / 100.0 / count(lit(1))).as("avg_qty"),
        (sum(cents($"l_extendedprice")).cast("double") / 100.0 / count(lit(1))).as("avg_price"),
        count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag", $"l_linestatus")

  def ops: Seq[Op] = Seq(

    Op("q1_pricing",
      (s, d) => pricingSummary(s, d),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 / count(*) AS avg_price,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Fact⋈fact shuffle join + top-N by exact revenue (TPC-H Q3 shape).
    Op("q3_top_orders",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
          .cast(DecimalType(24, 4)).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10),
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),

    // Broadcast-dimension join: orders⋈customer⋈nation, revenue per nation.
    Op("join_rev_nation",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("num_orders"),
          moneySum($"o_totalprice").as("total_rev"))
        .orderBy($"n_name"),
      """SELECT n_name, count(*) AS num_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS total_rev
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // Five-way join down the region→nation→customer→orders→lineitem spine
    // (TPC-H Q5 shape): broadcast the dimension chain, shuffle facts once.
    Op("q5_region_rev",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .where($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
          .cast(DecimalType(24, 4)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name"),
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    // Hierarchical rollup: revenue by (region, nation) with subtotals —
    // GROUPING SETS exercise over the broadcast dimension chain.
    Op("rollup_revenue",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("num_orders"), moneySum($"o_totalprice").as("total_rev"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first),
      """SELECT r_name, n_name, count(*) AS num_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS total_rev
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin),

    // Semi-join + distinct count: customers with high-value orders per segment.
    Op("segment_stats",
      (s, d) => {
        val highOrders = Tables.orders(s, d).where($"o_totalprice" > 100000.0)
        Tables.customer(s, d)
          .join(highOrders, $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            (sum(cents($"c_acctbal")).cast("double") / 100.0 / count(lit(1)))
              .as("avg_acctbal"))
          .orderBy($"c_mktsegment")
      },
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 / count(*) AS avg_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a
    // MIXED equi + non-equi condition (late-shipping lineitems). Catalyst
    // keeps the equi key as the hash-join key and evaluates the date
    // predicate as a join filter — one shuffle, no cartesian, and the
    // semi join short-circuits on first match per order (no fact-side
    // count inflation at 100 TB).
    Op("q4_late_ship",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate"),
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority"),
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // TPC-H Q6 shape: the pure scan-pushdown microbenchmark — every
    // predicate reaches the parquet reader (PushedFilters), the projection
    // prunes to 4 columns, and the single global agg has a map-side
    // partial. Revenue through DECIMAL for order-exact partials.
    Op("q6_forecast",
      (s, d) => Tables.lineitem(s, d)
        .where($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00"))
          && $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00"))
          && $"l_discount" >= 0.02 && $"l_discount" <= 0.04
          && $"l_quantity" < 24.0)
        .agg(sum(($"l_extendedprice" * $"l_discount").cast(DecimalType(18, 8)))
          .cast(DecimalType(24, 4)).cast("double").as("revenue"),
          count(lit(1)).as("n_rows")),
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04
        |  AND l_quantity < 24.0""".stripMargin),

    // Anti-join: customers with NO order above the threshold — NOT EXISTS
    // as a left-anti hash join (the NULL-safe form; NOT IN would need the
    // null-aware single-column variant). Broadcast the filtered orders
    // side at any realistic selectivity.
    Op("customers_no_big_orders",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).where($"o_totalprice" > 250000.0)
          .select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment"),
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // TPC-H Q17 shape: correlated scalar subquery (per-part average) as a
    // fact-side pre-aggregation joined back to the fact — the per-part
    // averages are PART-dimension-sized, so the join back is a broadcast
    // at any realistic fact:dim ratio; the fact table shuffles once (the
    // avg groupBy), never twice. Exactness: the average is the integer-
    // cents recipe, so the 0.5×avg comparison operand is bit-identical on
    // both engines and the row set agrees exactly.
    Op("q17_small_qty_rev",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val partAvg = li.groupBy($"l_partkey").agg(
          (sum(cents($"l_quantity")).cast("double") / 100.0 / count(lit(1)))
            .as("avg_qty"))
        li.join(broadcast(partAvg), Seq("l_partkey"))
          .where($"l_quantity" < lit(0.5) * $"avg_qty")
          .agg(moneySum($"l_extendedprice").as("small_qty_revenue"),
            count(lit(1)).as("n_small"))
      },
      """WITH pa AS (
        |  SELECT l_partkey,
        |         CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS DOUBLE)
        |           / 100.0 / count(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS small_qty_revenue,
        |  count(*) AS n_small
        |FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
        |WHERE l.l_quantity < 0.5 * pa.avg_qty""".stripMargin),

    // TPC-H Q13 shape: distribution of counts — LEFT OUTER join with a
    // predicate INSIDE the join condition (customers with zero qualifying
    // orders must survive with count 0), then a second aggregation over
    // the first's result. Both aggregations shuffle key-sized data;
    // the distribution output is O(max orders per customer).
    Op("q13_order_distribution",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).where($"o_orderpriority" =!= "1-URGENT")
        c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // TPC-H Q21 shape: DOUBLE-correlated subqueries on the same table —
    // suppliers whose line was the ONLY late one in a multi-supplier
    // order ("late" = shipped after a cutoff; this lineitem has no
    // commit/receipt dates). The semi ("another supplier exists") and
    // anti ("no OTHER supplier was late") correlations both become
    // shuffle joins on l_orderkey; the supplier dimension broadcasts.
    // Three passes over lineitem, each pruned to 3 columns — the plan a
    // 100 TB run wants (no cartesian, no driver loop, one join key).
    Op("q21_sole_late_supplier",
      (s, d) => {
        val late = $"l_shipdate" > to_timestamp(lit("1997-01-01 00:00:00"))
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        val l1 = li.where(late)
        val l2 = li.select($"l_orderkey", $"l_suppkey".as("s2"))
        val l3 = li.where(late).select($"l_orderkey", $"l_suppkey".as("s3"))
        l1.join(l2, l1("l_orderkey") === l2("l_orderkey")
            && $"l_suppkey" =!= $"s2", "left_semi")
          .join(l3, l1("l_orderkey") === l3("l_orderkey")
            && $"l_suppkey" =!= $"s3", "left_anti")
          .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy($"numwait".desc, $"s_name")
          .limit(10)
      },
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_shipdate > TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > TIMESTAMP '1997-01-01')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin)
  )
}
