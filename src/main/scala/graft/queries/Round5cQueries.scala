package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 3: the six TPC-H shapes not yet in the suite — Q2, Q4,
  * Q11, Q12, Q16, Q20 — completing all 22 classic query shapes.
  *
  * The driver's star schema has no `partsupp` table and `lineitem` carries
  * no shipmode/commitdate/receiptdate, so four of these are *shape*
  * adaptations (marked in each comment): the part↔supplier bridge is
  * derived from `lineitem` (distinct pairs / per-pair aggregates), and
  * date/mode predicates use the columns that exist. The JOIN/subquery
  * structure — which is what the shapes exercise — is unchanged from the
  * originals.
  *
  * Decimal choreography matches Round3/Round4: aggregate on DECIMAL
  * (order-independent, engine-exact), one final cast to DOUBLE.
  */
object Round5cQueries {

  private def li(s: SparkSession, dir: String): DataFrame = Tables.lineitem(s, dir)

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q2 (minimum-cost supplier). partsupp.ps_supplycost is emulated
    // as min(l_extendedprice) per (part, supplier) — an exact DECIMAL min,
    // so engine-identical. The correlated min-over-eligible-suppliers is
    // rendered as a window min over p_partkey AFTER the region filter
    // (same semantics, one shuffle); dims (supplier⋈nation⋈region, part
    // subset) all broadcast. Scale: the only wide exchanges are the ps
    // aggregate on (partkey, suppkey) — uniform keys — and the window's
    // hash partition on p_partkey.
    QueryDef(
      "x107_tpch_q2",
      (s, dir) => {
        val ps = li(s, dir)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_extendedprice").cast("decimal(18,6)")).as("supplycost"))
        val eligSupp = Tables.supplier(s, dir)
          .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val parts = Tables.part(s, dir)
          .filter(col("p_type") === "SMALL" && col("p_size") > 40)
          .select("p_partkey", "p_name")
        val w = Window.partitionBy("p_partkey")
        ps.join(broadcast(eligSupp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .withColumn("mincost", min(col("supplycost")).over(w))
          .filter(col("supplycost") === col("mincost"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"),
            col("supplycost").cast("double").as("supplycost"))
          .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
            asc("p_partkey"))
          .limit(100)
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey, l_suppkey,
             |         min(CAST(l_extendedprice AS DECIMAL(18,6))) AS supplycost
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             |       CAST(supplycost AS DOUBLE) AS supplycost
             |FROM part, ps, supplier, nation, region
             |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
             |  AND p_type = 'SMALL' AND p_size > 40
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'EUROPE'
             |  AND supplycost = (
             |    SELECT min(ps2.supplycost)
             |    FROM ps ps2, supplier s2, nation n2, region r2
             |    WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
             |      AND s2.s_nationkey = n2.n_nationkey
             |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // TPC-H Q4 (order priority checking). The original's EXISTS
    // (l_commitdate < l_receiptdate) becomes EXISTS (l_shipdate >
    // o_orderdate + 30 days) — a late-shipment probe on the columns the
    // schema has; the plan shape (quarter-filtered orders, EXISTS → left
    // semi join on the fact-fact edge, tiny grouped count) is Q4's.
    // Scale: the semi join hash-partitions on orderkey; the date filter
    // is pushed to both parquet scans.
    QueryDef(
      "x108_tpch_q4",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
          .filter(expr("o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
            expr("o_orderdate < TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
        val late = li(s, dir).select("l_orderkey", "l_shipdate")
        ord.join(late,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (
             |    SELECT 1 FROM lineitem
             |    WHERE l_orderkey = o_orderkey
             |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q11 (important stock identification). Per-part inventory value
    // from one nation's suppliers, kept when it exceeds 2× the average
    // part's value (the original's fixed 1/2000-of-total fraction is tied
    // to TPC-H's SF-invariant part:supplier ratio; relative-to-average is
    // the same scalar-subquery HAVING shape but stays non-degenerate at
    // every SF — the fixed fraction returned 0 rows at sf0.1). partsupp
    // value is emulated as sum(price × qty) over that nation's lineitems.
    // All arithmetic stays in DECIMAL end-to-end, so the HAVING boundary
    // cannot drift between engines. Scale: one hash agg on l_partkey; the
    // grand total is a second pass over the same grouped result (reused
    // exchange), broadcast back as a 1-row cross join.
    QueryDef(
      "x109_tpch_q11",
      (s, dir) => {
        val natSupp = Tables.supplier(s, dir)
          .join(Tables.nation(s, dir).filter(col("n_name") === "NATION_7"),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        // (19,6) not (18,6): DuckDB multiplies DECIMAL(<=18) operands in
        // int64 and overflows at sf0.01 — width 19 forces HUGEINT (the
        // same fix x34 needed). Spark side: (19,6)×(9,6) → (29,12), exact.
        val value = (col("l_extendedprice").cast("decimal(19,6)") *
          col("l_quantity").cast("decimal(9,6)"))
        val grp = li(s, dir)
          .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey").as("partkey"))
          .agg(sum(value).cast("decimal(28,12)").as("value"))
        val total = grp.agg(
          sum(col("value")).cast("decimal(28,12)").as("total"),
          count(lit(1)).cast("decimal(6,0)").as("n"))
        grp.crossJoin(broadcast(total))
          .filter(col("value") * col("n") >
            col("total") * lit(2).cast("decimal(1,0)"))
          .select(col("partkey"),
            col("value").cast("decimal(28,4)").cast("double").as("value"))
          .orderBy(desc("value"), asc("partkey"))
      },
      Some("""WITH grp AS (
             |  SELECT l_partkey AS partkey,
             |         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6)) *
             |                  CAST(l_quantity AS DECIMAL(9,6)))
             |              AS DECIMAL(28,12)) AS value
             |  FROM lineitem, supplier, nation
             |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             |    AND n_name = 'NATION_7'
             |  GROUP BY 1)
             |SELECT partkey,
             |       CAST(CAST(value AS DECIMAL(28,4)) AS DOUBLE) AS value
             |FROM grp
             |WHERE value * (SELECT CAST(count(*) AS DECIMAL(6,0)) FROM grp) >
             |      (SELECT CAST(sum(value) AS DECIMAL(28,12)) FROM grp) *
             |      CAST(2 AS DECIMAL(1,0))
             |ORDER BY value DESC, partkey""".stripMargin)),

    // TPC-H Q12 (shipping modes and order priority). l_shipmode doesn't
    // exist; l_returnflag plays the mode (same two-level conditional-agg
    // shape), and the original's commit/receipt lateness predicate becomes
    // shipped-after-order. Fact-fact join merge-hinted for the
    // hash-partitioned SMJ a 100 TB run needs; the year filter is pushed
    // to the lineitem scan.
    QueryDef(
      "x110_tpch_q12",
      (s, dir) => {
        val ships = li(s, dir)
          .filter(expr("l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
            expr("l_shipdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
          .select("l_orderkey", "l_returnflag", "l_shipdate")
        val ord = Tables.orders(s, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        ships.hint("merge")
          .join(ord.hint("merge"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"))
          .groupBy(col("l_returnflag").as("mode"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy("mode")
      },
      Some("""SELECT l_returnflag AS mode,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem, orders
             |WHERE l_orderkey = o_orderkey
             |  AND l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > o_orderdate
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)),

    // TPC-H Q16 (parts/supplier relationship). The partsupp bridge is
    // DISTINCT (l_partkey, l_suppkey) from lineitem; "customer complaint"
    // suppliers (the NOT IN subquery) are proxied by a name pattern. Shape
    // preserved: bridge anti-joined against the excluded suppliers
    // (broadcast), part attribute filter, count-distinct suppliers per
    // (brand, type, size). Scale: the distinct and the count-distinct both
    // hash-partition on uniform keys; part and the exclusion list
    // broadcast.
    QueryDef(
      "x111_tpch_q16",
      (s, dir) => {
        val bridge = li(s, dir).select("l_partkey", "l_suppkey").distinct()
        val excl = Tables.supplier(s, dir)
          .filter(col("s_name").like("%7")).select("s_suppkey")
        val parts = Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        bridge
          .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
            asc("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |       count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b, part
             |WHERE p_partkey = l_partkey
             |  AND p_brand <> 'Brand#45' AND p_type <> 'PROMO'
             |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
             |  AND l_suppkey NOT IN
             |      (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // TPC-H Q20 (potential part promotion). ps_availqty is emulated as
    // each (supplier, part)'s all-time shipped quantity; the original's
    // "availqty > ½ × one year's demand" becomes "all-time > 2 × the 1997
    // demand" — same nested-subquery shape (parts by name pattern → pair
    // aggregate with a correlated year sum → suppliers of a nation).
    // DECIMAL sums keep the > boundary engine-exact. Scale: one hash agg
    // on the (suppkey, partkey) pair computes both sums in a single pass
    // (the correlated subquery never re-scans), then a semi join reduces
    // suppliers.
    QueryDef(
      "x112_tpch_q20",
      (s, dir) => {
        val parts = Tables.part(s, dir)
          .filter(col("p_name").like("small%")).select("p_partkey")
        val pair = li(s, dir)
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(
            sum(col("l_quantity").cast("decimal(18,6)")).as("total_qty"),
            sum(when(
              expr("l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
                expr("l_shipdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'"),
              col("l_quantity").cast("decimal(18,6)"))).as("qty97"))
          .filter(col("total_qty") >
            lit(2).cast("decimal(2,0)") * coalesce(col("qty97"),
              lit(0).cast("decimal(18,6)")))
          .select("l_suppkey").distinct()
        Tables.supplier(s, dir)
          .join(Tables.nation(s, dir).filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey"))
          .join(pair, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_name", "s_acctbal")
          .orderBy("s_name")
      },
      Some("""SELECT s_name, s_acctbal
             |FROM supplier, nation
             |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
             |  AND s_suppkey IN (
             |    SELECT l_suppkey FROM (
             |      SELECT l_suppkey, l_partkey,
             |             sum(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty,
             |             sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
             |                       AND l_shipdate < TIMESTAMP '1998-01-01'
             |                      THEN CAST(l_quantity AS DECIMAL(18,6))
             |                      END) AS qty97
             |      FROM lineitem
             |      WHERE l_partkey IN
             |            (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
             |      GROUP BY 1, 2) t
             |    WHERE total_qty > CAST(2 AS DECIMAL(2,0)) *
             |          coalesce(qty97, CAST(0 AS DECIMAL(18,6))))
             |ORDER BY s_name""".stripMargin))
  )
}
