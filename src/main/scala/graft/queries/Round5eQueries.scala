package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 5: warehouse/engine surface — SCD type-2 interval build
  * and the typed cogroup operator (KeyValueGroupedDataset.cogroup, the
  * Dataset API's grouped multi-input primitive).
  */
object Round5eQueries {

  val all: Seq[QueryDef] = Seq(

    // SCD type-2 dimension build: per user, each CHANGE of event_type
    // opens a validity interval [valid_from, valid_to) closed by the next
    // change (null = current). lag detects the change rows, lead closes
    // them — two window passes over the same (user_id, ts) partition
    // order, ONE shuffle. Timestamp/integer-exact. Scale: partitions on
    // user_id; no global window; the dimension born from 100 TB of fact
    // history is |users| × |changes| rows.
    QueryDef(
      "x118_scd2",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val changes = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        changes
          .withColumn("valid_to", lead(col("ts"), 1).over(
            Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
          .select(col("user_id"), col("event_type"),
            col("ts").as("valid_from"), col("valid_to"))
          .orderBy("user_id", "valid_from")
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         lag(event_type) OVER w AS prev_type
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             | changes AS (
             |  SELECT user_id, ts, event_id, event_type FROM ordered
             |  WHERE prev_type IS NULL OR prev_type <> event_type)
             |SELECT user_id, event_type, ts AS valid_from,
             |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |         AS valid_to
             |FROM changes
             |ORDER BY user_id, valid_from""".stripMargin)),

    // Typed cogroup (KeyValueGroupedDataset.cogroup): both inputs grouped
    // on the same key, one function over the two per-key iterators — the
    // Dataset API's multi-input grouped primitive (the reference's
    // branching-input stateful stage in typed form). Here: per-key
    // activity profile across two fact tables. Scale: cogroup
    // co-partitions both sides on the key in one exchange each — same
    // shuffle plan as a join, but the UDF sees grouped iterators instead
    // of a row stream (the escape hatch when per-key logic isn't
    // expressible relationally). The oracle is the relational rendering
    // (full outer join of two aggregates), proving the typed and
    // declarative paths agree.
    QueryDef(
      "x120_cogroup",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id")).as[(Long, Long)]
          .groupByKey(_._1)
        val ord = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey")).as[(Long, Long)]
          .groupByKey(_._1)
        ev.cogroup(ord) { (k, evs, ords) =>
            val ne = evs.size.toLong
            val no = ords.size.toLong
            Iterator((k, ne, no))
          }
          .toDF("user_id", "n_events", "n_orders")
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, count(*) AS n_events
             |          FROM events GROUP BY 1),
             | o AS (SELECT o_custkey AS user_id, count(*) AS n_orders
             |       FROM orders GROUP BY 1)
             |SELECT coalesce(e.user_id, o.user_id) AS user_id,
             |       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
             |       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
             |FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
             |ORDER BY 1""".stripMargin)),

    // Incremental-crawl ingestion dedup: new batches (sources src10+)
    // screened against the EXISTING corpus's exact content fingerprints —
    // the keep-only-novel pass an ongoing crawl runs before anything else
    // touches a new snapshot (whole-corpus re-dedup would be quadratic in
    // crawl count). Per new source: arrivals, novel vs existing corpus
    // (anti semantics), and novel-after-in-batch-dedup (first batch
    // occurrence wins). Scale: fingerprint anti join hash-partitions on
    // md5; the existing-corpus side streams from its fingerprint store —
    // nothing rescans old text.
    QueryDef(
      "x121_incremental_ingest",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("fp", md5(col("text")))
        val isNew = length(col("source")) > lit(4) // src10..src19
        val existing = docs.filter(!isNew).select("fp").distinct()
        val fresh = docs.filter(isNew)
        val novel = fresh.join(existing, Seq("fp"), "left_anti")
        novel
          .groupBy("source")
          .agg(count(lit(1)).as("n_novel"),
            countDistinct(col("fp")).as("n_unique_novel"))
          .join(fresh.groupBy("source").agg(count(lit(1)).as("n_arrived")),
            Seq("source"), "right")
          .select(col("source"), col("n_arrived"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"),
            coalesce(col("n_unique_novel"), lit(0L)).as("n_unique_novel"))
          .orderBy("source")
      },
      Some("""WITH f AS (SELECT source, md5(text) AS fp FROM documents),
             | ex AS (SELECT DISTINCT fp FROM f WHERE length(source) <= 4),
             | nw AS (SELECT * FROM f WHERE length(source) > 4),
             | novel AS (SELECT * FROM nw WHERE fp NOT IN (SELECT fp FROM ex))
             |SELECT nw.source,
             |       count(*) AS n_arrived,
             |       CAST(coalesce(max(nv.n_novel), 0) AS BIGINT) AS n_novel,
             |       CAST(coalesce(max(nv.n_unique_novel), 0) AS BIGINT)
             |         AS n_unique_novel
             |FROM nw LEFT JOIN (
             |  SELECT source, count(*) AS n_novel,
             |         count(DISTINCT fp) AS n_unique_novel
             |  FROM novel GROUP BY 1) nv ON nw.source = nv.source
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Custom DataSourceV2 connector end-to-end: the deterministic
    // producer source (graft.sources.ProducerSource) read through the
    // full connector path — schema inference, 8 split partitions, column
    // pruning, and id-range filter pushdown that narrows generation
    // BEFORE any row exists (plan-audited). The DuckDB oracle replays
    // the same pure function over generate_series, so the gate verifies
    // the connector's row generation, partitioning and pushdown
    // semantics end-to-end.
    QueryDef(
      "x123_custom_source",
      (s, dir) => {
        s.read.format("graft.sources.ProducerSource")
          .option("count", "100000").option("partitions", "8").load()
          .filter(col("id") >= 1000L && col("id") < 50000L)
          .groupBy((col("id") % 7).as("g"))
          .agg(count(lit(1)).as("n"), sum(col("amount")).as("amt"),
            countDistinct(col("label")).as("nl"))
          .orderBy("g")
      },
      Some("""WITH p AS (
             |  SELECT id, (id * 31 + 7) % 1000 AS amount,
             |         'l' || CAST(id % 5 AS VARCHAR) AS label
             |  FROM (SELECT unnest(generate_series(0, 99999)) AS id))
             |SELECT id % 7 AS g, count(*) AS n,
             |       CAST(sum(amount) AS BIGINT) AS amt,
             |       CAST(count(DISTINCT label) AS BIGINT) AS nl
             |FROM p WHERE id >= 1000 AND id < 50000
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact distinct-count over a sliding window — the aggregate Spark's
    // window functions famously refuse (`countDistinct` over a frame):
    // rendered as per-bucket user SETS, then a range-frame union
    // (flatten + array_distinct) over the trailing 3 hourly buckets.
    // Distinctness doesn't decompose into per-bucket counts, so the sets
    // are the minimal carried state for the EXACT answer. When the
    // per-bucket user count itself is cluster-sized, the shipped swap is
    // x164_window_distinct_hll (Round9Queries): same window shape with
    // per-bucket HLL sketches + hll_union_agg over the frame — O(1)
    // state per bucket, error-band-certified. The range frame is on
    // the hour INDEX, so calendar gaps are handled (rowsBetween would
    // silently span them). Oracle: DuckDB's native count(DISTINCT) via
    // correlated interval subqueries.
    QueryDef(
      "x124_window_distinct",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"),
            date_trunc("hour", col("ts")).as("h"), col("user_id"))
        val buckets = ev.groupBy("event_type", "h")
          .agg(collect_set(col("user_id")).as("us"),
            countDistinct(col("user_id")).as("nd"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy((col("h").cast("long") / 3600).cast("long"))
          .rangeBetween(-2, 0)
        buckets
          .withColumn("nd3",
            size(array_distinct(flatten(collect_list(col("us")).over(w))))
              .cast("long"))
          .select("event_type", "h", "nd", "nd3")
          .orderBy("event_type", "h")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h, user_id
             |  FROM events),
             | b AS (SELECT DISTINCT event_type, h FROM ev)
             |SELECT b.event_type, b.h,
             |       (SELECT count(DISTINCT user_id) FROM ev e
             |        WHERE e.event_type = b.event_type AND e.h = b.h) AS nd,
             |       CAST((SELECT count(DISTINCT user_id) FROM ev e
             |        WHERE e.event_type = b.event_type
             |          AND e.h BETWEEN b.h - INTERVAL 2 HOUR AND b.h)
             |         AS BIGINT) AS nd3
             |FROM b ORDER BY 1, 2""".stripMargin)),

    // Deterministic stratified train/val/test split — the dataset-freeze
    // op every training run needs: assignment is a pure function of
    // (doc_id, seed) via an md5-prefix band (~80/10/10), so it is
    // reproducible across runs, partitionings, retries, AND engines
    // (`rand()` is none of those); stratification falls out of the
    // per-source report. Scale: a narrow map plus one aggregate — the
    // split of a 100 TB corpus is the same one-pass predicate, and any
    // doc's split can be recomputed standalone (no global state).
    QueryDef(
      "x125_train_split",
      (s, dir) => {
        val h = md5(concat_ws("|", col("doc_id").cast("string"),
          lit("split-seed-1")))
        val split = when(substring(h, 1, 2) < "cd", "train")
          .when(substring(h, 1, 2) < "e6", "val")
          .otherwise("test")
        Tables.documents(s, dir)
          .withColumn("split", split)
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n"),
            sum(length(col("text")).cast("long")).as("chars"))
          .orderBy("source", "split")
      },
      Some("""SELECT source, split, count(*) AS n,
             |       CAST(sum(length(text)) AS BIGINT) AS chars
             |FROM (
             |  SELECT source, text,
             |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
             |                    'split-seed-1'), 1, 2) < 'cd' THEN 'train'
             |              WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
             |                    'split-seed-1'), 1, 2) < 'e6' THEN 'val'
             |              ELSE 'test' END AS split
             |  FROM documents) t
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
