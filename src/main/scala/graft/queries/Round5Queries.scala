package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{dsum, dsumSql}
import org.apache.spark.sql.functions._

/** Round-5 batch 1: the remaining TPC-H query shapes expressible on this
  * star schema (no partsupp table, so Q2/Q11/Q16/Q20 are out of reach;
  * Q17/Q19/Q22 are adapted to the columns that exist). Each exercises a
  * distinct plan family — nation-pair self-joined dims (Q7), conditional
  * market-share aggregation (Q8), outer-join count distribution (Q13),
  * promo ratio (Q14), scalar-subquery max filter (Q15), correlated
  * per-group threshold (Q17), disjunctive multi-table predicate (Q19),
  * and anti-join with a global-average gate (Q22).
  *
  * Decimal choreography is the repo standard: every money aggregate runs
  * in DECIMAL (exact, order-independent), narrows to DECIMAL(28,4)
  * (lossless for these magnitudes), and only then casts to double — so
  * Spark and DuckDB produce bit-identical doubles. Ratio-shaped queries
  * (Q8, Q14) emit numerator and denominator as separate exact columns
  * instead of dividing: decimal-division scale rules differ between
  * engines, and the two-column form is what a 100 TB job should persist
  * anyway (cheap to re-derive the ratio, impossible to re-derive the
  * parts).
  */
object Round5Queries {

  private def revenue: org.apache.spark.sql.Column =
    col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(7,6)") - col("l_discount").cast("decimal(7,6)"))

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(7,6)) - CAST(l_discount AS DECIMAL(7,6)))"

  /** Exact decimal revenue sum → lossless narrow → double (x40 pattern). */
  private def revSum: org.apache.spark.sql.Column =
    sum(revenue).cast("decimal(28,4)").cast("double")

  private def revSumSql(inner: String = revenueSql): String =
    s"CAST(CAST(sum($inner) AS DECIMAL(28,4)) AS DOUBLE)"

  val all: Seq[QueryDef] = Seq(

    // TPC-H Q7 (volume shipping between a nation pair): lineitem joins
    // orders (fact-fact, shuffle on orderkey) plus three broadcastable
    // dims. Scale: the nation dims are pre-filtered to the two names —
    // the IN () predicate pushes to the nation scan, and the join then
    // semi-reduces supplier/customer before they ever reach the facts.
    // The pair-direction filter (supp != cust within the 2-name set) is
    // the only post-join predicate left.
    QueryDef(
      "x93_tpch_q7",
      (s, dir) => {
        val twoNations = Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_10", "NATION_12"))
        val sup = Tables.supplier(s, dir)
          .join(broadcast(twoNations), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(twoNations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, dir)
          .filter(expr("l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            expr("l_shipdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(revSum.as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |       EXTRACT(YEAR FROM l_shipdate) AS l_year,
              |       ${revSumSql()} AS revenue
              |FROM lineitem
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN orders   ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation n1 ON n1.n_nationkey = s_nationkey
              |JOIN nation n2 ON n2.n_nationkey = c_nationkey
              |WHERE n1.n_name IN ('NATION_10','NATION_12')
              |  AND n2.n_name IN ('NATION_10','NATION_12')
              |  AND n1.n_name <> n2.n_name
              |  AND l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate <  TIMESTAMP '1998-01-01'
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q8 (national market share): orders restricted to one region's
    // customers and one part type; per order-year, the volume supplied by
    // one nation vs total. Emits numerator/denominator as exact decimals
    // (see object doc). Scale: part and the region-filtered customer side
    // broadcast; the two fact tables join on orderkey.
    QueryDef(
      "x94_tpch_q8",
      (s, dir) => {
        val europe = Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")
        val cust = Tables.customer(s, dir)
          .join(broadcast(europe), col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey")
        val supNation = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_type") === "PROMO").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir)
            .filter(expr("o_orderdate >= TIMESTAMP_NTZ '1995-01-01 00:00:00'") &&
              expr("o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", revenue)
              .otherwise(lit(0).cast("decimal(18,6)")))
              .cast("decimal(28,4)").cast("double").as("nation_volume"),
            revSum.as("total_volume"))
          .orderBy("o_year")
      },
      Some(s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
              |       CAST(CAST(sum(CASE WHEN n_name = 'NATION_3'
              |                          THEN $revenueSql
              |                          ELSE CAST(0 AS DECIMAL(18,6)) END)
              |            AS DECIMAL(28,4)) AS DOUBLE) AS nation_volume,
              |       ${revSumSql()} AS total_volume
              |FROM lineitem
              |JOIN part     ON p_partkey = l_partkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN nation   ON n_nationkey = s_nationkey
              |JOIN orders   ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |WHERE p_type = 'PROMO'
              |  AND c_nationkey IN (SELECT n_nationkey FROM nation n2
              |                      JOIN region ON r_regionkey = n2.n_regionkey
              |                      WHERE r_name = 'EUROPE')
              |  AND o_orderdate >= TIMESTAMP '1995-01-01'
              |  AND o_orderdate <  TIMESTAMP '1997-01-01'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q13 (customer order-count distribution): LEFT join so
    // customers with zero qualifying orders survive with count 0, then a
    // second aggregation over the counts. Scale: both aggs hash-partition
    // (custkey, then c_count); the second one runs over at most
    // |distinct counts| rows.
    QueryDef(
      "x99_tpch_q13",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey")
        Tables.customer(s, dir).select("c_custkey")
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT JOIN orders
             |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |      GROUP BY 1)
             |GROUP BY 1 ORDER BY 2 DESC, 1 DESC""".stripMargin)),

    // TPC-H Q14 (promo revenue share): one month of lineitem against the
    // part dim; promo and total revenue as separate exact columns. Scale:
    // part broadcasts; the month filter pushes to the lineitem scan.
    QueryDef(
      "x95_tpch_q14",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(expr("l_shipdate >= TIMESTAMP_NTZ '1996-03-01 00:00:00'") &&
          expr("l_shipdate < TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0).cast("decimal(18,6)")))
            .cast("decimal(28,4)").cast("double").as("promo_revenue"),
          revSum.as("total_revenue")),
      Some(s"""SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
              |                         THEN $revenueSql
              |                         ELSE CAST(0 AS DECIMAL(18,6)) END)
              |           AS DECIMAL(28,4)) AS DOUBLE) AS promo_revenue,
              |       ${revSumSql()} AS total_revenue
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              |  AND l_shipdate <  TIMESTAMP '1996-04-01'""".stripMargin)),

    // TPC-H Q15 (top supplier): per-supplier revenue for a quarter, keep
    // the max. The max is a 1-row aggregate broadcast back over the
    // per-supplier revenues — no window over a single global partition.
    // Revenue equality on doubles is safe here because both engines
    // derive the double from the same exact decimal.
    QueryDef(
      "x100_tpch_q15",
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .filter(expr("l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            expr("l_shipdate < TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
          .groupBy("l_suppkey")
          .agg(revSum.as("total_revenue"))
        val top = rev.agg(max(col("total_revenue")).as("mx"))
        rev.join(broadcast(top), col("total_revenue") === col("mx"))
          .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, ${revSumSql()} AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate <  TIMESTAMP '1996-04-01'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, total_revenue
              |FROM rev JOIN supplier ON s_suppkey = l_suppkey
              |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
              |ORDER BY 1""".stripMargin)),

    // TPC-H Q17 shape (small-quantity threshold; adapted: brand+size
    // stands in for the missing container column): revenue from lineitems
    // whose quantity is below 20% of that part's average. The per-part
    // average is computed over lineitems of the filtered parts only
    // (semi-reduction first — the classic Q17 rewrite), and the 0.2*avg
    // comparison is cross-multiplied into exact decimal·integer form
    // (qty*5*cnt < sum) so no engine ever divides. DECIMAL(19,6) forces
    // DuckDB onto the HUGEINT path (the x34 lesson).
    QueryDef(
      "x96_tpch_q17",
      (s, dir) => {
        val parts = Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#3" && col("p_size") < 10)
          .select("p_partkey")
        val li = Tables.lineitem(s, dir)
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .select("l_partkey", "l_quantity", "l_extendedprice")
        val pq = li.groupBy(col("l_partkey").as("agg_pk"))
          .agg(sum(col("l_quantity").cast("decimal(19,6)")).as("sq"),
            count(lit(1)).as("cq"))
        li.join(pq, col("l_partkey") === col("agg_pk"))
          .filter(col("l_quantity").cast("decimal(19,6)") * 5 * col("cq") < col("sq"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,6)"))
            .cast("decimal(28,4)").cast("double").as("total_price"),
            count(lit(1)).as("n"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, l_quantity, l_extendedprice
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_brand = 'Brand#3' AND p_size < 10),
             | pq AS (
             |  SELECT l_partkey AS agg_pk,
             |         sum(CAST(l_quantity AS DECIMAL(19,6))) AS sq,
             |         count(*) AS cq
             |  FROM li GROUP BY 1)
             |SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
             |        AS DECIMAL(28,4)) AS DOUBLE) AS total_price,
             |       count(*) AS n
             |FROM li JOIN pq ON l_partkey = agg_pk
             |WHERE CAST(l_quantity AS DECIMAL(19,6)) * 5 * cq < sq""".stripMargin)),

    // TPC-H Q19 shape (disjunctive predicate spanning two tables;
    // adapted: brand+size+quantity bands for the missing container/
    // shipmode columns). The OR spans lineitem and part columns, so no
    // branch pushes down by itself — the classic rewrite adds the
    // IMPLIED single-table conjuncts (brand IN (...), quantity/size
    // envelope) redundantly so each scan prunes before the join. At
    // 100 TB that redundant envelope is the difference between scanning
    // three brands and scanning the whole fact table.
    QueryDef(
      "x97_tpch_q19",
      (s, dir) => {
        val band1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)
        val band2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)
        val band3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)
        Tables.lineitem(s, dir)
          .filter(col("l_quantity").between(1, 30)) // implied envelope: pushes
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
              col("p_size").between(1, 15)) // implied envelope: pushes
            .select("p_partkey", "p_brand", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .filter(band1 || band2 || band3)
          .agg(revSum.as("revenue"), count(lit(1)).as("n"))
      },
      Some(s"""SELECT ${revSumSql()} AS revenue, count(*) AS n
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
              |        AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
              |        AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
              |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q22 shape (global-average gate + anti join; adapted:
    // custkey%7 stands in for the missing phone country code, and — since
    // every customer in this data has at least one order — "no orders"
    // becomes "no order since 2001", the churn rendering): customers in
    // three "country codes" with above-average balance and no recent
    // order. The average gate is cross-multiplied (bal*cnt > total) so it
    // stays in exact decimal·integer arithmetic; the 1-row (cnt,total)
    // aggregate broadcasts; NOT EXISTS is a left-anti join on custkey
    // whose date predicate pushes to the orders scan.
    QueryDef(
      "x98_tpch_q22",
      (s, dir) => {
        val cc = (col("c_custkey") % 7).as("cntrycode")
        val base = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_acctbal"), cc)
          .filter(col("cntrycode").isin(1, 3, 5))
        val gate = base.filter(col("c_acctbal") > 0)
          .agg(sum(col("c_acctbal").cast("decimal(19,6)")).as("tot"),
            count(lit(1)).as("cnt"))
        base
          .join(broadcast(gate),
            col("c_acctbal").cast("decimal(19,6)") * col("cnt") > col("tot"))
          .join(Tables.orders(s, dir)
            .filter(expr("o_orderdate >= TIMESTAMP_NTZ '2001-01-01 00:00:00'"))
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("cntrycode")
          .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy("cntrycode")
      },
      Some(s"""WITH base AS (
              |  SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
              |  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)),
              | gate AS (
              |  SELECT sum(CAST(c_acctbal AS DECIMAL(19,6))) AS tot,
              |         count(*) AS cnt
              |  FROM base WHERE c_acctbal > 0)
              |SELECT cntrycode, count(*) AS numcust,
              |       ${dsumSql("c_acctbal")} AS totacctbal
              |FROM base, gate
              |WHERE CAST(c_acctbal AS DECIMAL(19,6)) * cnt > tot
              |  AND NOT EXISTS (SELECT 1 FROM orders
              |                  WHERE o_custkey = c_custkey
              |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
              |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
