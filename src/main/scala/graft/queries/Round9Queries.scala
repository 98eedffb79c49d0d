package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-9 queries: the r8 verdict's documented-but-unshipped scale swaps.
  */
object Round9Queries {

  val all: Seq[QueryDef] = Seq(
    // x164: the HLL swap x124 documents — windowed distinct-count with
    // BOUNDED per-bucket state. x124's exact rendering carries one user
    // SET per (event_type, hour) bucket, unbounded in users-per-hour;
    // here each bucket keeps one fixed-size HLL sketch
    // (hll_sketch_agg), and the trailing-3-bucket distinct is
    // hll_union_agg over the same hour-index range frame — sketch
    // union is exactly the set-union homomorphism, so the window shape
    // is unchanged while the carried state drops from O(users/bucket)
    // to O(1). The estimate itself is engine-specific (DataSketches),
    // so the gate follows the x16/x49 invariant pattern: the query
    // emits the EXACT windowed count plus an in-bound boolean
    // (|hll − exact| ≤ 10%·exact; default lgK=12 gives ~1.6% rsd, so
    // 10% is ~6σ), and the oracle asserts `true` — an out-of-band
    // estimate hash-mismatches instead of hiding behind a rows-only
    // check. At 100 TB the exact column is dropped and the sketches
    // are what a production rollup stores (they also merge across
    // days/regions — the reaggregation property sets lack).
    QueryDef(
      "x164_window_distinct_hll",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"),
            date_trunc("hour", col("ts")).as("h"), col("user_id"))
        val buckets = ev.groupBy("event_type", "h")
          .agg(collect_set(col("user_id")).as("us"),
            hll_sketch_agg(col("user_id")).as("sk"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy((col("h").cast("long") / 3600).cast("long"))
          .rangeBetween(-2, 0)
        buckets
          .withColumn("nd3",
            size(array_distinct(flatten(collect_list(col("us")).over(w))))
              .cast("long"))
          .withColumn("nd3_hll",
            hll_sketch_estimate(hll_union_agg(col("sk")).over(w)))
          .select(col("event_type"), col("h"), col("nd3"),
            (abs(col("nd3_hll") - col("nd3")) <= col("nd3") * lit(0.1))
              .as("within_10pct"))
          .orderBy("event_type", "h")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h, user_id
             |  FROM events),
             | b AS (SELECT DISTINCT event_type, h FROM ev)
             |SELECT b.event_type, b.h,
             |       CAST((SELECT count(DISTINCT user_id) FROM ev e
             |        WHERE e.event_type = b.event_type
             |          AND e.h BETWEEN b.h - INTERVAL 2 HOUR AND b.h)
             |         AS BIGINT) AS nd3,
             |       true AS within_10pct
             |FROM b ORDER BY 1, 2""".stripMargin))
  )
}
