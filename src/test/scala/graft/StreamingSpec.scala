package graft

import graft.streaming.StreamingOps

/** Streaming parity: the Structured-Streaming rendering must produce the
  * same rows as the batch query (the reference's unbounded-producer
  * semantics with deterministic quiescence — SURVEY §2.B streaming row).
  */
class StreamingSpec extends SparkSuite {

  test("streaming tumbling-window equals batch q15 result") {
    val batch = SparkEntry.queries("q15_tumbling_window")(spark, sfDir)
      .collect().toSeq
    val stream = StreamingOps.tumblingHourly(spark, sfDir, "stream_parity_sink")
      .collect().toSeq
    assert(stream == batch)
  }

  test("flatMapGroupsWithState sessionization equals batch x19 on a drained stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = SparkEntry.queries("x19_sessionize")(spark, sfDir).collect().toSeq

    val src = MemoryStream[(Long, Long, Long)]
    val input = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "event_id")
      .as[(Long, Long, Long)].collect().toSeq
    // feed in two chunks to exercise cross-batch state merging
    val (a, b) = input.splitAt(input.length / 2)
    val q = StreamingOps.sessionizeStream(spark, src.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("sessionize_sink").start()
    src.addData(a)
    q.processAllAvailable()
    src.addData(b)
    q.processAllAvailable()
    q.stop()
    // update mode re-emits revised sessions with a state version; keep
    // only each user's latest revision (the drained-stream answer).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, max}
    val sink = spark.table("sessionize_sink")
    val latest = sink.withColumn("maxv",
        max(col("version")).over(Window.partitionBy("user_id")))
      .filter(col("version") === col("maxv"))
    val streamed = latest
      .select("user_id", "session_id", "n_events", "first_event", "dur_us")
      .orderBy("user_id", "session_id").collect().toSeq
    val batch = ev.map(r => org.apache.spark.sql.Row(
      r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(streamed.map(_.toSeq) == batch.map(_.toSeq))
  }

  test("mapGroupsWithState running totals (stateful stage idiom)") {
    import spark.implicits._
    val input = Seq((1L, 2.0), (1L, 3.0), (2L, 10.0)).toDS()
    val out = StreamingOps.runningTotals(spark, input)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(1L -> 5.0, 2L -> 10.0))
  }
}
