package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{dsum, dsumSql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced temporal/grouping operators: cube, sessionization (the batch
  * rendering of streaming session windows), as-of join, and range join —
  * the operator families the north star names beyond the reference's own
  * surface.
  *
  * Timestamp determinism: all temporal arithmetic happens on integer
  * microseconds (`epoch µs`) — no interval types, no float seconds — so
  * Spark and DuckDB agree bit-for-bit (events.ts is nanos in parquet;
  * truncation to µs is identical in both loaders).
  */
object AdvancedQueries {

  /** events + integer-µs event time, the shared base. */
  private def eventsUs(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("us",
      graft.functions.TimeCols.ntzEpochMicros("ts"))

  private val eventsUsSql =
    "SELECT *, epoch_us(ts) AS us FROM events"

  val all: Seq[QueryDef] = Seq(

    // Timestamp-predicate pushdown: the date filter must reach the parquet
    // scan (PushedFilters shows LessThanOrEqual(l_shipdate,...)) — at 100 TB
    // with date-partitioned data this same predicate prunes partitions.
    QueryDef(
      "x25_date_filter_agg",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(expr("l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("cnt"), round(dsum(col("l_extendedprice")), 2).as("sum_price"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, count(*) AS cnt,
              |       round(${dsumSql("l_extendedprice")}, 2) AS sum_price
              |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Full cube over the two lineitem dimensions (extends x12's rollup to
    // all 2^k grouping sets).
    QueryDef(
      "x18_cube",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), round(dsum(col("l_quantity")), 2).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("cnt"), col("qty"))
          .orderBy("rf", "ls"),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              |       coalesce(l_linestatus, 'ALL') AS ls,
              |       count(*) AS cnt, round(${dsumSql("l_quantity")}, 2) AS qty
              |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              |ORDER BY rf, ls""".stripMargin)),

    // Explicit GROUPING SETS (completes the rollup/cube/grouping-sets
    // triple): per-flag and per-status marginals in one pass — Catalyst
    // expands to a single Expand + aggregation, not two scans.
    QueryDef(
      "x26_grouping_sets",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), round(dsum(col("l_quantity")), 2).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("cnt"), col("qty"))
          .orderBy("rf", "ls"),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              |       coalesce(l_linestatus, 'ALL') AS ls,
              |       count(*) AS cnt, round(${dsumSql("l_quantity")}, 2) AS qty
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
              |ORDER BY rf, ls""".stripMargin)),

    // Sessionization (gaps-and-islands): a new session starts after a
    // >30-minute silence per user. This is the batch rendering of
    // Structured Streaming's session_window — same session boundaries.
    // Scale: two window passes over (user_id)-partitioned data; integer
    // arithmetic only.
    QueryDef(
      "x19_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
        val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        eventsUs(s, dir)
          .withColumn("is_new",
            when(col("us") - lag(col("us"), 1).over(byUser) > 1800000000L, 1)
              .when(lag(col("us"), 1).over(byUser).isNull, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("is_new")).over(runSum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""SELECT user_id, session_id, count(*) AS n_events,
              |       min(event_id) AS first_event,
              |       max(us) - min(us) AS dur_us
              |FROM (
              |  SELECT user_id, event_id, us,
              |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
              |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              |  FROM (
              |    SELECT user_id, event_id, us,
              |           CASE WHEN us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
              |                  THEN 1
              |                WHEN lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
              |                  THEN 1
              |                ELSE 0 END AS is_new
              |    FROM ($eventsUsSql) e) flagged) sessions
              |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    // As-of join (self): for each event, the most recent *purchase* event
    // of the same user strictly before it. Rendered scalably as a single
    // ordered window carry-forward (last_value IGNORE NULLS over an
    // exclusive frame) — O(n log n) per user, no pairwise join at all.
    // This is THE cluster-scale as-of rendering: one shuffle on user_id.
    QueryDef(
      "x20_asof_join",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        eventsUs(s, dir)
          .withColumn("prev_purchase",
            last(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true)
              .over(w))
          .select("event_id", "prev_purchase")
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id,
              |       last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
              |         OVER (PARTITION BY user_id ORDER BY us, event_id
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
              |FROM ($eventsUsSql) e ORDER BY event_id""".stripMargin)),

    // The SAME as-of semantics through the native tier-(c) operator
    // (graft.plans.AsofJoin: custom LogicalPlan + Strategy + SparkPlan,
    // hash-partitioned merge pass) — sharing x20's oracle proves the
    // custom physical operator end-to-end against DuckDB, the way x03
    // proves LSH against x02.
    QueryDef(
      "x55_asof_native",
      (s, dir) => {
        val ev = eventsUs(s, dir).select("user_id", "us", "event_id")
        val purchases = eventsUs(s, dir)
          .filter(col("event_type") === "purchase")
          .select("user_id", "us", "event_id")
        graft.plans.AsofJoin(ev, purchases,
            key = "user_id", time = "us", tie = "event_id",
            value = "event_id", outName = "prev_purchase")
          .select("event_id", "prev_purchase")
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id,
              |       last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
              |         OVER (PARTITION BY user_id ORDER BY us, event_id
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
              |FROM ($eventsUsSql) e ORDER BY event_id""".stripMargin)),

    // Range join: events follow-up count — how many events the same user
    // generates in the hour after each event. Equality on user_id keeps the
    // join hash-partitioned; the range predicate filters inside each
    // user bucket. Scale: bucketize time (join on (user, hour_bucket) ±1)
    // to bound per-key fan-out — noted for the 100 TB path.
    QueryDef(
      "x21_range_join",
      (s, dir) => {
        val e = eventsUs(s, dir).select(col("event_id"), col("user_id"), col("us"))
        e.as("l").join(e.as("r"),
            col("l.user_id") === col("r.user_id") &&
              col("r.us") > col("l.us") &&
              col("r.us") <= col("l.us") + 3600000000L,
            "left_outer")
          .groupBy(col("l.event_id").as("event_id"))
          .agg(count(col("r.event_id")).as("followups"))
          .orderBy("event_id")
      },
      Some(s"""SELECT l.event_id, count(r.event_id) AS followups
              |FROM ($eventsUsSql) l
              |LEFT JOIN ($eventsUsSql) r
              |  ON l.user_id = r.user_id AND r.us > l.us AND r.us <= l.us + 3600000000
              |GROUP BY l.event_id ORDER BY l.event_id""".stripMargin))
  )
}
