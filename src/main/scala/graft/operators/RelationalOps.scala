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
  * Scale design: hard `broadcast()` hints appear ONLY on sides whose
  * cardinality is bounded regardless of SF — region/nation (fixed
  * 5/25-row TPC-H dimensions, and frames derived from them) and 1-row
  * scalar aggregates. SF-scaling tables (customer, part, supplier — all
  * grow linearly with the fact side; at sf100k customer is ~15 B rows)
  * carry NO hint: Catalyst's size-based selection broadcasts them at
  * bench scale (plans identical — PlanShapeSpec pins it) and falls back
  * to shuffled hash / sort-merge at cluster scale, where a compulsory
  * broadcast would OOM the driver. A predicate on an SF-scaling table
  * (p_size <= 5, p_brand = X) keeps a constant FRACTION, not a constant
  * COUNT — it does not make the side broadcast-safe. Fact-fact joins
  * (lineitem⋈orders) shuffle on the join key once, and AQE handles skew
  * at the 100 TB end. Money aggregates go through DECIMAL so
  * partial/final aggregation is order-exact.
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
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
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
    // (TPC-H Q5 shape): size-based broadcasts on the dimension chain, one fact shuffle.
    Op("q5_region_rev",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
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
    // GROUPING SETS exercise over the size-broadcast dimension chain.
    Op("rollup_revenue",
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
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

    // TPC-H Q12 shape (ref: trino/duckdb benchmark suite; the synthetic
    // schema has no l_shipmode/commitdate, so l_linestatus plays the
    // ship-mode group and >60-day ship lag plays the late-commit filter):
    // fact-dim equi join + DUAL CONDITIONAL COUNTS in one aggregate pass
    // — the CASE-inside-sum pattern whose map-side partials fold both
    // branches in the same shuffle. BIGINT on both sides (CLAUDE.md).
    Op("q12_priority_shipping",
      (s, d) => Tables.orders(s, d)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .join(Tables.lineitem(s, d)
          .where($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")))
          .select($"l_orderkey", $"l_shipdate", $"l_linestatus"),
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy($"l_linestatus")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy($"l_linestatus"),
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

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
        // per-part average as KEYED window aggregates (partitionBy
        // l_partkey: millions of small groups, never a funnel) — one
        // lineitem scan and one keyed shuffle. The agg-then-join-back
        // formulation scanned lineitem twice and broadcast a
        // PART-cardinality aggregate, which stops fitting in a broadcast
        // long before 100 TB.
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_partkey")
        Tables.lineitem(s, d)
          .withColumn("avg_qty",
            sum(cents($"l_quantity")).over(w).cast("double") / 100.0
              / count(lit(1)).over(w))
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
    // shuffle joins on l_orderkey; the supplier join is size-broadcast at bench scale.
    // Three passes over lineitem, each pruned to 3 columns — the plan a
    // 100 TB run wants (no cartesian, no driver loop, one join key).
    Op("q21_sole_late_supplier",
      (s, d) => {
        val late = $"l_shipdate" > to_timestamp(lit("1997-01-01 00:00:00"))
        // ONE pass over lineitem: per-order supplier sets as keyed window
        // aggregates (partitionBy l_orderkey — suppliers per order is a
        // handful, never a funnel). "Another supplier exists" = ≥2
        // distinct suppliers in the order; "no OTHER supplier was late" =
        // exactly one distinct LATE supplier — and since the row itself
        // is late, that one is this row's supplier. Replaces the
        // 3-scan semi+anti formulation (two l_orderkey shuffle joins).
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_orderkey")
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
          .withColumn("n_supp", size(collect_set($"l_suppkey").over(w)))
          .withColumn("n_late_supp",
            size(collect_set(when(late, $"l_suppkey")).over(w)))
          .where(late && $"n_supp" >= 2 && $"n_late_supp" === 1)
          .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
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
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin),

    // TPC-H Q14 shape: promo revenue share over one ship window — the
    // date predicate pushes to the scan, part joins size-based, and both the
    // numerator and denominator aggregate through DECIMAL so the final
    // percentage is a single double division on bit-identical operands.
    Op("q14_promo_rev",
      (s, d) => {
        val disc = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8))
        val zero = lit(BigDecimal(0)).cast(DecimalType(18, 8))
        Tables.lineitem(s, d)
          .where($"l_shipdate" >= to_timestamp(lit("1997-01-01 00:00:00"))
            && $"l_shipdate" < to_timestamp(lit("1997-03-01 00:00:00")))
          .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
          .agg(
            sum(when($"p_type" === "PROMO", disc).otherwise(zero))
              .cast(DecimalType(24, 4)).cast("double").as("promo_rev"),
            sum(disc).cast(DecimalType(24, 4)).cast("double").as("total_rev"))
          .select((lit(100.0) * $"promo_rev" / $"total_rev").as("promo_pct"),
            $"promo_rev", $"total_rev")
      },
      """SELECT 100.0 * promo_rev / total_rev AS promo_pct, promo_rev, total_rev
        |FROM (
        |  SELECT
        |    CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |                       THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))
        |                       ELSE CAST(0 AS DECIMAL(18,8)) END) AS DECIMAL(24,4)) AS DOUBLE) AS promo_rev,
        |    CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00')""".stripMargin),

    // TPC-H Q18 shape: large-volume orders — the HAVING subquery is the
    // same aggregation the output needs, so it is computed ONCE (group
    // lineitem by order, filter, join back to orders + customer) instead
    // of the literal semi-join-then-reaggregate a naive
    // translation would run. One fact shuffle on l_orderkey.
    Op("q18_large_orders",
      (s, d) => {
        val big = Tables.lineitem(s, d).groupBy($"l_orderkey")
          .agg(moneySum($"l_quantity").as("sum_qty"))
          .where($"sum_qty" > 150.0)
        big.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
            $"o_totalprice", $"sum_qty")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(100)
      },
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM (SELECT l_orderkey,
        |             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey) lq
        |JOIN orders ON lq.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE sum_qty > 150.0
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),

    // TPC-H Q10 shape: returned-item revenue per customer in one order
    // quarter — fact⋈fact shuffle on the order key with BOTH sides
    // pre-filtered (returnflag on lineitem, the date window on orders,
    // each pushed to its scan), then the customer/nation dim joins.
    Op("q10_returned_rev",
      (s, d) => Tables.lineitem(s, d)
        .where($"l_returnflag" === "R")
        .join(Tables.orders(s, d)
          .where($"o_orderdate" >= to_timestamp(lit("1997-01-01 00:00:00"))
            && $"o_orderdate" < to_timestamp(lit("1997-07-01 00:00:00"))),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
          .cast(DecimalType(24, 4)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20),
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),

    // TPC-H Q8 shape: national market share by year — the full 6-table
    // snowflake (fact ⋈ orders shuffle once; part/customer/nation/region/
    // supplier joined size-based, nation twice under different roles). The
    // share is a conditional-sum ratio through DECIMAL, divided once.
    Op("q8_market_share",
      (s, d) => {
        val vol = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8))
        val zero = lit(BigDecimal(0)).cast(DecimalType(18, 8))
        val custNation = Tables.nation(s, d)
          .select($"n_nationkey", $"n_regionkey")
        val suppNation = Tables.nation(s, d)
          .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).where($"p_type" === "PROMO")
            .select($"p_partkey"), $"l_partkey" === $"p_partkey")
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(custNation), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d).where($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(suppNation), $"s_nationkey" === $"sn_key")
          .groupBy(year($"o_orderdate").cast("long").as("o_year"))
          .agg(
            sum(when($"supp_nation" === "NATION_5", vol).otherwise(zero))
              .cast(DecimalType(24, 4)).cast("double").as("nation_vol"),
            sum(vol).cast(DecimalType(24, 4)).cast("double").as("total_vol"))
          .select($"o_year", round($"nation_vol" / $"total_vol", 6).as("mkt_share"),
            $"nation_vol", $"total_vol")
          .orderBy($"o_year")
      },
      """SELECT o_year, round(nation_vol / total_vol, 6) AS mkt_share, nation_vol, total_vol
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
        |                       THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))
        |                       ELSE CAST(0 AS DECIMAL(18,8)) END) AS DECIMAL(24,4)) AS DOUBLE) AS nation_vol,
        |    CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS total_vol
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |  GROUP BY year(o_orderdate))
        |ORDER BY o_year""".stripMargin),

    // Bidirectional nation-pair trade volume (TPC-H Q7 shape): the OR of
    // the two (supp_nation, cust_nation) orientations survives into one
    // fact pass — both nation lookups hint-broadcast (bounded), one shuffle for the agg.
    Op("q7_volume_shipping",
      (s, d) => {
        val vol = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8))
        val suppNation = Tables.nation(s, d)
          .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
        val custNation = Tables.nation(s, d)
          .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
        Tables.lineitem(s, d)
          .where($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00"))
            && $"l_shipdate" < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(suppNation), $"s_nationkey" === $"sn_key")
          .join(broadcast(custNation), $"c_nationkey" === $"cn_key")
          .where(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_8")
            || ($"supp_nation" === "NATION_8" && $"cust_nation" === "NATION_3"))
          .groupBy($"supp_nation", $"cust_nation",
            year($"l_shipdate").cast("long").as("l_year"))
          .agg(sum(vol).cast(DecimalType(24, 4)).cast("double").as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    // Top supplier by quarterly revenue with a scalar-max subquery
    // (TPC-H Q15 shape). The max joins back on the DECIMAL revenue —
    // exact equality, no double ties; the 1-row max is broadcast.
    Op("q15_top_supplier",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .where($"l_shipdate" >= to_timestamp(lit("1997-01-01 00:00:00"))
            && $"l_shipdate" < to_timestamp(lit("1997-04-01 00:00:00")))
          .groupBy($"l_suppkey".as("supplier_no"))
          .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
            .cast(DecimalType(24, 4)).as("total_rev"))
        val top = rev.agg(max($"total_rev").as("max_rev"))
        Tables.supplier(s, d)
          .join(rev, $"s_suppkey" === $"supplier_no")
          .crossJoin(broadcast(top))
          .where($"total_rev" === $"max_rev")
          .select($"s_suppkey", $"s_name", $"total_rev".cast("double").as("total_rev"))
          .orderBy($"s_suppkey")
      },
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin),

    // Disjunctive multi-attribute predicate over a dimension join
    // (TPC-H Q19 shape): the OR-of-ANDs references both sides, so
    // it evaluates post-join — the plan to want is a hash join (broadcast at
    // bench scale via size estimation) with the residual filter fused into
    // the probe, one fact pass.
    Op("q19_disjunctive_rev",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d), $"p_partkey" === $"l_partkey")
        .where(($"p_brand" === "Brand#12" && $"p_size".between(1, 15)
            && $"l_quantity" >= 1 && $"l_quantity" <= 21)
          || ($"p_brand" === "Brand#23" && $"p_size".between(1, 25)
            && $"l_quantity" >= 10 && $"l_quantity" <= 30)
          || ($"p_brand" === "Brand#34" && $"p_size".between(1, 35)
            && $"l_quantity" >= 20 && $"l_quantity" <= 40))
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8)))
            .cast(DecimalType(24, 4)).cast("double").as("revenue"),
          count(lit(1)).as("cnt")),
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)""".stripMargin),

    // Min-cost supplier per part via correlated-min (TPC-H Q2 shape,
    // adapted: unit cost = min observed l_extendedprice/l_quantity since
    // there is no partsupp table). Ranking compares DECIMAL(18,6) unit
    // costs (rounded once at 6 dp under identical IEEE order on both
    // engines) — the min-equality join is exact. Both aggs shuffle on
    // l_partkey; AQE coalesces the tiny dimension joins.
    Op("q2_min_cost_supplier",
      (s, d) => {
        // ONE exchange for agg + window (r14, guide §2.4 "share the
        // exchange"): hash-partition on l_partkey up front — it
        // satisfies the (l_partkey, l_suppkey) aggregate's clustering
        // (subset key) AND the window's, so the plan drops from two
        // exchanges (pairs, then partkey) to one. Partial aggregation
        // lost nothing: (l_partkey, l_suppkey) pairs are ~unique in
        // lineitem (590,973 distinct / 600,000 rows at sf0.1), so the
        // removed map-side agg was shuffling the same row count anyway.
        val cost = Tables.lineitem(s, d)
          .select($"l_partkey", $"l_suppkey",
            round($"l_extendedprice" / $"l_quantity", 6)
              .cast(DecimalType(18, 6)).as("uc"))
          .repartition($"l_partkey")
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(min($"uc").as("unit_cost"))
        // best-per-part as a KEYED window min (partitionBy l_partkey:
        // millions of small groups at scale, never a global funnel) —
        // one lineitem scan; the agg+self-join formulation scanned and
        // aggregated lineitem twice (no exchange reuse across the
        // differing subtrees) for the same tie-keeping semantics
        val bestW = org.apache.spark.sql.expressions.Window.partitionBy($"l_partkey")
        cost.withColumn("best_cost", min($"unit_cost").over(bestW))
          .where($"unit_cost" === $"best_cost")
          .join(Tables.part(s, d).where($"p_size" <= 5),
            $"p_partkey" === $"l_partkey")
          .join(Tables.supplier(s, d), $"s_suppkey" === $"l_suppkey")
          .select($"p_partkey", $"p_brand", $"s_suppkey", $"s_name", $"s_acctbal",
            $"unit_cost".cast("double").as("unit_cost"))
          .orderBy($"s_acctbal".desc, $"p_partkey", $"s_suppkey")
      },
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice / l_quantity, 6) AS DECIMAL(18,6))) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |best AS (SELECT l_partkey, min(unit_cost) AS best_cost FROM cost GROUP BY l_partkey)
        |SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal,
        |  CAST(unit_cost AS DOUBLE) AS unit_cost
        |FROM cost
        |JOIN best ON cost.l_partkey = best.l_partkey AND cost.unit_cost = best.best_cost
        |JOIN part ON p_partkey = cost.l_partkey
        |JOIN supplier ON s_suppkey = cost.l_suppkey
        |WHERE p_size <= 5
        |ORDER BY s_acctbal DESC, p_partkey, s_suppkey""".stripMargin),

    // Product-line profit by supplier nation and year (TPC-H Q9 shape,
    // adapted: cost proxy = 0.6 * p_retailprice * l_quantity — no
    // partsupp supplycost). Both profit terms round into DECIMAL(18,8)
    // from identically-ordered double expressions, so the subtraction
    // and sum are exact on both engines.
    Op("q9_profit_by_nation",
      (s, d) => {
        val revenue = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 8))
        val cost = ($"p_retailprice" * $"l_quantity" * lit(0.6)).cast(DecimalType(18, 8))
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).where($"p_name".contains("gear")),
            $"p_partkey" === $"l_partkey")
          .join(Tables.supplier(s, d), $"s_suppkey" === $"l_suppkey")
          .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
          .join(Tables.orders(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
          .agg(sum(revenue - cost).cast(DecimalType(24, 4)).cast("double").as("profit"))
          .orderBy($"nation", $"o_year".desc)
      },
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))
        |             - CAST(p_retailprice * l_quantity * 0.6 AS DECIMAL(18,8))) AS DECIMAL(24,4)) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin),

    // Parts above a global value-share threshold: HAVING against a
    // scalar subquery (TPC-H Q11 shape). The share test multiplies
    // DECIMALs by integer constants (exact) instead of dividing — no
    // double epsilon at the cut line. Total is a 1-row broadcast.
    Op("q11_important_parts",
      (s, d) => {
        val value = sum($"l_extendedprice".cast(DecimalType(18, 4))).cast(DecimalType(28, 4))
        val v = Tables.lineitem(s, d).groupBy($"l_partkey".as("p_key")).agg(value.as("part_value"))
        val t = Tables.lineitem(s, d).agg(value.as("total_value"))
        v.crossJoin(broadcast(t))
          .where($"part_value" * 10000 > $"total_value" * 7)
          .select($"p_key", $"part_value".cast("double").as("part_value"))
          .orderBy($"part_value".desc, $"p_key")
      },
      """WITH v AS (
        |  SELECT l_partkey AS p_key,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS part_value
        |  FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total_value FROM lineitem)
        |SELECT p_key, CAST(part_value AS DOUBLE) AS part_value
        |FROM v, t
        |WHERE part_value * 10000 > total_value * 7
        |ORDER BY part_value DESC, p_key""".stripMargin),

    // Supplier diversity per part attribute with a NOT-IN exclusion
    // (TPC-H Q16 shape): the complaint-supplier set becomes an
    // anti join (size-broadcast at bench scale); count(DISTINCT) shuffles once on the group keys.
    Op("q16_supplier_count",
      (s, d) => {
        val excluded = Tables.supplier(s, d).where($"s_acctbal" < 0)
          .select($"s_suppkey".as("x_key"))
        Tables.lineitem(s, d)
          .join(Tables.part(s, d)
            .where($"p_type" =!= "PROMO" && $"p_size".isin(1, 9, 14, 19, 23, 36, 45, 49)),
            $"p_partkey" === $"l_partkey")
          .join(excluded, $"l_suppkey" === $"x_key", "left_anti")
          .groupBy($"p_brand", $"p_size")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
      },
      """SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_type <> 'PROMO' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin),

    // Suppliers holding >30% share of a brand's yearly volume (TPC-H Q20
    // shape, adapted to shipped-quantity share — no partsupp availqty).
    // Share test is integer-only (qty*10 > total*3). One fact shuffle on
    // (part, supp); the per-part total is a KEYED window sum over the
    // agg's output (partitionBy pk: millions of small groups, never a
    // funnel) — the agg-then-self-join formulation re-planned the whole
    // scan+agg subtree on both join sides (no exchange reuse).
    Op("q20_share_suppliers",
      (s, d) => {
        val sq = Tables.lineitem(s, d)
          .where($"l_shipdate" >= to_timestamp(lit("1997-01-01 00:00:00"))
            && $"l_shipdate" < to_timestamp(lit("1998-01-01 00:00:00")))
          .groupBy($"l_partkey".as("pk"), $"l_suppkey".as("sk"))
          .agg(sum($"l_quantity".cast("long")).as("qty"))
        val wp = org.apache.spark.sql.expressions.Window.partitionBy($"pk")
        sq.withColumn("tqty", sum($"qty").over(wp))
          .join(Tables.part(s, d).where($"p_brand" === "Brand#12"),
            $"p_partkey" === $"pk")
          .join(Tables.supplier(s, d), $"s_suppkey" === $"sk")
          .where($"qty" * 10 > $"tqty" * 3)
          .select($"s_suppkey", $"s_name").distinct()
          .orderBy($"s_suppkey")
      },
      """WITH sq AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_partkey, l_suppkey),
        |tot AS (SELECT pk, sum(qty) AS tqty FROM sq GROUP BY pk)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM sq JOIN tot USING (pk) JOIN supplier ON s_suppkey = sk
        |JOIN part ON p_partkey = pk
        |WHERE p_brand = 'Brand#12' AND sq.qty * 10 > tot.tqty * 3
        |ORDER BY s_suppkey""".stripMargin),

    // Wealthy-but-dormant customers per nation (TPC-H Q22 shape, adapted:
    // no orders since 1999 — every customer has SOME order in this data).
    // The above-average test is exact integer cents × count (no double
    // average at the cut); the dormant set is an anti join.
    Op("q22_no_order_customers",
      (s, d) => {
        val cents = (($"c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long")
        val avgbal = Tables.customer(s, d).where($"c_acctbal" > 0)
          .agg(sum(cents).as("cents"), count(lit(1)).as("n"))
        val recent = Tables.orders(s, d)
          .where($"o_orderdate" >= to_timestamp(lit("1999-01-01 00:00:00")))
          .select($"o_custkey")
        Tables.customer(s, d)
          .crossJoin(broadcast(avgbal))
          .where(cents * $"n" > $"cents")
          .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum($"c_acctbal".cast(DecimalType(18, 4))).cast(DecimalType(24, 4))
              .cast("double").as("totacctbal"))
          .orderBy($"c_nationkey")
      },
      """WITH avgbal AS (
        |  SELECT CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
        |         count(*) AS n
        |  FROM customer WHERE c_acctbal > 0),
        |cand AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer, avgbal
        |  WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * n > cents
        |    AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'))
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS totacctbal
        |FROM cand GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  )
}
