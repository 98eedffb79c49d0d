package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{dsum, dsumSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational core of SURVEY.md §2.C (Q1–Q16, Q20) — the Spark
  * re-expression of the reference's dataflow operators:
  * map/filter stages (`/root/reference/src/pipeline/builder.rs:202-224`),
  * flattener (`builder.rs:336-364`), fan-in union (`builder.rs:523-525`),
  * stateful-stage aggregation idiom (`/root/reference/src/lib.rs:140-187`),
  * branching router (`builder.rs:251-282`).
  *
  * Every query carries a total ORDER BY for hash determinism, and every
  * computed column is aliased identically in the Spark plan and the DuckDB
  * oracle SQL (driver compares by column name).
  *
  * Scale design notes are per-query; the shared ones:
  *  - filters/projections sit directly on the parquet scan → pushed down;
  *  - dimension joins (nation=25, region=5, customer small vs orders) are
  *    explicitly `broadcast()` so no shuffle of the fact side;
  *  - aggregations are declarative `groupBy.agg` → Catalyst plans
  *    partial (map-side) + final hash aggregation.
  */
object CoreQueries {

  val all: Seq[QueryDef] = Seq(

    // Q1 scan-project (ref R1/R5): pushdown check — ReadSchema must contain
    // only the 4 referenced columns. Sort+limit collapses to a TakeOrdered.
    QueryDef(
      "q01_scan_project",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .orderBy("l_orderkey", "l_linenumber")
          .limit(100)
          .select("l_orderkey", "l_partkey", "l_quantity"),
      Some("""SELECT l_orderkey, l_partkey, l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    // Q2 filter (ref R5 Option-drop): both predicates reach PushedFilters.
    QueryDef(
      "q02_filter",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
          .orderBy("l_orderkey", "l_linenumber")
          .select("l_orderkey", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_extendedprice FROM lineitem
             |WHERE l_discount > 0.05 AND l_quantity < 10
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Q3 map-scalar (ref R5 closure, lib.rs:463): pure codegen'd projection.
    QueryDef(
      "q03_map_scalar",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            upper(col("o_orderpriority")).as("p"),
            // Exact decimal path: double*1.1 then round drifts between
            // engines (Spark rounds the shortest decimal repr, DuckDB the
            // exact binary). decimal(18,2) * decimal 1.1 is exact in both.
            round(col("o_totalprice").cast("decimal(18,2)")
              * lit(new java.math.BigDecimal("1.1")), 2)
              .cast("double").as("t"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, upper(o_orderpriority) AS p,
             |       CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE) AS t
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Q4 flatten (ref R8 flattener, builder.rs:336-364): explode == unnest.
    QueryDef(
      "q04_flatten",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word") =!= "")
          .orderBy("doc_id", "word"),
      Some("""SELECT doc_id, word FROM (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
             |  FROM documents) t
             |WHERE word <> '' ORDER BY doc_id, word""".stripMargin)),

    // Q5 union fan-in (ref R10, multi-writer pipe = bag union, no dedup).
    QueryDef(
      "q05_union_fanin",
      (s, dir) =>
        Tables.orders(s, dir).select(col("o_custkey").as("k"))
          .union(Tables.customer(s, dir).select(col("c_custkey").as("k")))
          .orderBy("k"),
      Some("""SELECT k FROM (
             |  SELECT o_custkey AS k FROM orders
             |  UNION ALL SELECT c_custkey AS k FROM customer) t
             |ORDER BY k""".stripMargin)),

    // Q6 branch-split (ref R6 router, odds/evens example mod.rs:292-329):
    // rendered as one tagged aggregation — no need to materialize branches.
    QueryDef(
      "q06_branch_split",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(when(col("event_id") % 2 === 0, "even").otherwise("odd").as("tag"))
          .agg(count(lit(1)).as("c"), round(dsum(col("value")), 2).as("s"))
          .orderBy("tag"),
      Some(s"""SELECT CASE WHEN event_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tag,
              |       count(*) AS c, round(${dsumSql("value")}, 2) AS s
              |FROM events GROUP BY 1 ORDER BY tag""".stripMargin)),

    // Q7 reduce-sum (ref R12 map/reduce, lib.rs:254-287): integer-exact.
    QueryDef(
      "q07_reduce_sum",
      (s, dir) =>
        Tables.customer(s, dir)
          .agg(sum(length(col("c_name")) + 1).cast("long").as("s")),
      Some("SELECT CAST(sum(length(c_name) + 1) AS BIGINT) AS s FROM customer")),

    // Q8 group-agg (TPC-H Q1 shape; ref R12 generalized). Partial+final hash
    // agg on 2 low-cardinality keys — the canonical scale-out aggregation.
    QueryDef(
      "q08_group_agg",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(dsum(col("l_quantity")), 2).as("sum_qty"),
            round(dsum(col("l_extendedprice")), 2).as("sum_price"),
            round(dsum(col("l_discount")) / count(lit(1)), 4).as("avg_disc"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       round(${dsumSql("l_quantity")}, 2) AS sum_qty,
              |       round(${dsumSql("l_extendedprice")}, 2) AS sum_price,
              |       round(${dsumSql("l_discount")} / count(*), 4) AS avg_disc,
              |       count(*) AS cnt
              |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q9 distinct-agg: exact distinct count (shuffles on o_custkey; at scale
    // prefer approx_count_distinct — provided as x07_approx_distinct).
    QueryDef(
      "q09_distinct_agg",
      (s, dir) =>
        Tables.orders(s, dir)
          .agg(countDistinct(col("o_custkey")).as("cd")),
      Some("SELECT count(DISTINCT o_custkey) AS cd FROM orders")),

    // Q10 broadcast-join (ref stateful-lookup idiom lib.rs:140-187):
    // nation (25 rows) is explicitly broadcast — zero shuffle of customer.
    QueryDef(
      "q10_broadcast_join",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("c"))
          .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS c
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Q11 3-way join: orders⋈customer shuffles on custkey once; nation and
    // region are broadcast so the star arms add no extra exchange.
    QueryDef(
      "q11_join3",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = broadcast(Tables.nation(s, dir))
        val r = broadcast(Tables.region(s, dir))
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(round(dsum(col("o_totalprice"), 2), 2).as("rev"))
          .orderBy("r_name")
      },
      Some(s"""SELECT r_name, round(${dsumSql("o_totalprice", 2)}, 2) AS rev
              |FROM orders o
              |JOIN customer c ON o.o_custkey = c.c_custkey
              |JOIN nation n ON c.c_nationkey = n.n_nationkey
              |JOIN region r ON n.n_regionkey = r.r_regionkey
              |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Q12 semi-join: left_semi never materializes the right payload —
    // at scale the filtered orders side is aggregated to distinct keys by
    // Catalyst before the join.
    QueryDef(
      "q12_semi_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
             |ORDER BY c_custkey""".stripMargin)),

    // Q13 anti-join (o_custkey non-null per FIXTURES.md, so NOT IN ≡ anti).
    // The price filter keeps the result non-degenerate at sf0.01 (every
    // customer has *some* order, so an unfiltered anti-join is empty).
    QueryDef(
      "q13_anti_join",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir).filter(col("o_totalprice") > 350000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
             |ORDER BY c_custkey""".stripMargin)),

    // Q14 running-sum (ref R12 running sum lib.rs:161-185): window frame
    // partitions by user_id → scales out; decimal path keeps the running
    // prefix sums engine-independent.
    QueryDef(
      "q14_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(
            col("event_id"),
            round(sum(col("value").cast("decimal(18,6)")).over(w).cast("double"), 2).as("rs"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS rs
             |FROM events ORDER BY event_id""".stripMargin)),

    // Q15 tumbling-window (batch rendering; streaming twin is
    // x20_stream_tumbling): hour-truncation groupBy == tumbling 1h window.
    QueryDef(
      "q15_tumbling_window",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
          .agg(count(lit(1)).as("c"), round(dsum(col("value")), 2).as("s"))
          .orderBy("w", "event_type"),
      Some(s"""SELECT date_trunc('hour', ts) AS w, event_type,
              |       count(*) AS c, round(${dsumSql("value")}, 2) AS s
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q16 top-k per group: window row_number + filter — Spark pushes a
    // per-partition top-k (WindowGroupLimit) before the shuffle.
    QueryDef(
      "q16_topk",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.customer(s, dir)
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          // BIGINT to match DuckDB's row_number(); cast AFTER the filter so
          // the rank predicate still plans as WindowGroupLimit pushdown.
          .withColumn("rn", col("rn").cast("long"))
          .orderBy("c_mktsegment", "rn")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal,
             |         row_number() OVER (PARTITION BY c_mktsegment
             |           ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
             |  FROM customer) t
             |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin)),

    // Q20 json-extract (ref §2.B scalar json; events.props = {"k": <int>}).
    QueryDef(
      "q20_json_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("v"))
          .orderBy("event_id")
          .limit(1000),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
             |FROM events ORDER BY event_id LIMIT 1000""".stripMargin))
  )
}
