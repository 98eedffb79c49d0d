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

  test("mapGroupsWithState running totals (stateful stage idiom)") {
    import spark.implicits._
    val input = Seq((1L, 2.0), (1L, 3.0), (2L, 10.0)).toDS()
    val out = StreamingOps.runningTotals(spark, input)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(1L -> 5.0, 2L -> 10.0))
  }
}
