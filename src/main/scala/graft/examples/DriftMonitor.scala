package graft.examples

import graft.{Sessions, Tables}
import graft.pipeline.PipeGraph
import graft.queries.Round9cQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scheduled data-quality monitor — the recurring health check a
  * production ingest runs per snapshot, composing the round-9 statistics
  * operators end-to-end through the pipeline DSL:
  *
  *   events (30-day fixture)
  *        │ split on the midpoint: reference window vs current window
  *        ├─→ KS drift: per event_type, the two windows' value
  *        │   distributions through [[Round9cQueries.ksStatistic]] —
  *        │   location/scale/shape drift, not just count drift
  *        ├─→ share drift: event-type traffic shares, reference vs
  *        │   current, flagged on >20% relative shift via integer
  *        │   cross-multiplication (no float thresholds)
  *        └─→ quarantine: days whose 'error' share exceeds 20% — the
  *            x131/x154 DLQ shape at day granularity
  *
  * Everything is one pass over events per branch, aggregates only; the
  * KS core's two-phase ECDF keeps the monitor free of unpartitioned
  * windows at any scale. At 100 TB this runs as the post-ingest gate:
  * the three reports are small aggregate tables a scheduler alerts on.
  */
object DriftMonitor {

  /** Fixture midpoint (epoch micros): the 30-day window splits into a
    * 15-day reference and a 15-day current half.
    */
  private def midpointUs(events: DataFrame): Long = {
    val r = events.agg(
      min(graft.functions.TimeCols.ntzEpochMicros("ts")).as("lo"),
      max(graft.functions.TimeCols.ntzEpochMicros("ts")).as("hi")).head()
    (r.getLong(0) + r.getLong(1)) / 2
  }

  /** Per event_type two-sample KS between the window halves. The KS core
    * takes its two samples labeled 'click'/'purchase' — here those are
    * just the side labels (reference = 'click', current = 'purchase').
    */
  def ksByType(events: DataFrame, mid: Long): DataFrame = {
    val labeled = events.select(col("event_type").as("et"),
      round(col("value") * 100).cast("long").as("cents"),
      when(graft.functions.TimeCols.ntzEpochMicros("ts") < mid, "click")
        .otherwise("purchase").as("side"))
    val types = labeled.select("et").distinct().collect().map(_.getString(0))
    types.sorted.map { t =>
      Round9cQueries.ksStatistic(
        labeled.filter(col("et") === t)
          .select(col("cents"), col("side").as("event_type")))
        .withColumn("event_type", lit(t))
        .select("event_type", "at_value", "d_num", "d_den", "n1", "n2",
          "significant")
    }.reduce(_.unionAll(_))
  }

  /** Event-type traffic shares, reference vs current; drifted when the
    * relative share shift exceeds 20%: |cur·totRef − ref·totCur| · 5 >
    * ref·totCur (exact integers).
    */
  def shareDrift(events: DataFrame, mid: Long): DataFrame = {
    val sided = events.select(col("event_type"),
      (graft.functions.TimeCols.ntzEpochMicros("ts") < mid).as("isRef"))
    val grid = sided.groupBy("event_type")
      .agg(sum(when(col("isRef"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(!col("isRef"), 1L).otherwise(0L)).as("cur_n"))
    val tot = grid.agg(sum(col("ref_n")).as("tot_ref"),
      sum(col("cur_n")).as("tot_cur"))
    grid.crossJoin(broadcast(tot))
      .select(col("event_type"), col("ref_n"), col("cur_n"),
        (abs(col("cur_n") * col("tot_ref") - col("ref_n") * col("tot_cur"))
          * 5 > col("ref_n") * col("tot_cur")).as("drifted"))
      .orderBy("event_type")
  }

  /** Days whose 'error' share exceeds 20% (5·errors > total) — the day-level
    * sampling variance around the fixture's ~20% global error share makes
    * the gate non-degenerate: some days trip it, most don't.
    */
  def errorQuarantine(events: DataFrame): DataFrame =
    events
      .select(expr(
        "CAST(" + graft.functions.TimeCols.ntzEpochMicrosExpr("ts") +
          " DIV 86400000000 AS BIGINT)").as("day"),
        col("event_type"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errors"))
      .filter(col("errors") * 5 > col("n"))
      .orderBy("day")

  def build(sfDir: String, outDir: String): PipeGraph =
    PipeGraph.builder
      .producer("events")(s => Tables.events(s, sfDir))
      .branchingStage("events", Seq("ks", "share", "quarantine")) { ev =>
        val mid = midpointUs(ev)
        Seq(ksByType(ev, mid), shareDrift(ev, mid), errorQuarantine(ev))
      }
      .consumer("ks")(_.write.mode("overwrite").parquet(s"$outDir/ks"))
      .consumer("share")(_.write.mode("overwrite")
        .parquet(s"$outDir/share"))
      .consumer("quarantine")(_.write.mode("overwrite")
        .parquet(s"$outDir/quarantine"))
      .build()
      .fold(err => throw new IllegalStateException(err), identity)

  def run(spark: SparkSession, sfDir: String, outDir: String): Unit =
    build(sfDir, outDir).run(spark)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_drift"
    val spark = Sessions.local()
    run(spark, sfDir, outDir)
    val ks = spark.read.parquet(s"$outDir/ks")
    val drifted = spark.read.parquet(s"$outDir/share")
      .filter(col("drifted")).count()
    val quarantined = spark.read.parquet(s"$outDir/quarantine").count()
    println(s"""{"types":${ks.count()},"drifted":$drifted,""" +
      s""""quarantined_days":$quarantined}""")
    spark.stop()
  }
}
