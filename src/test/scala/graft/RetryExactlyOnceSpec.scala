package graft

import graft.sources.CollectorSink
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retry-level exactly-once: a task that dies MID-WRITE on its first
  * attempt and succeeds on re-attempt must contribute exactly ONE
  * attempt's rows to the committed result — the reference's
  * panic-accounting contract (`/root/reference/src/pipeline/io.rs:65-74`)
  * at Spark's task-retry level rather than its job-abort level (which
  * CollectorSinkSpec already covers).
  *
  * This suite runs in its OWN forked JVM (build.sbt testGrouping): task
  * retries need `master = local[N, maxFailures>1]`, and a JVM holds one
  * SparkContext — the shared suites' local[8] context has retries
  * disabled (maxFailures=1), which is what blocked this spec in earlier
  * rounds.
  */
class RetryExactlyOnceSpec extends AnyFunSuite {

  test("first-attempt task failure + retry commits exactly one attempt's rows") {
    // local[4, 2]: 4 threads, tasks may fail once and re-attempt.
    val spark = Sessions.builder("local[4,2]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val sfDir = "/root/testdata/sf0.001"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .repartition(4)

      // Clean run: the ground-truth count/checksum.
      CollectorSink.clear("retry_clean")
      ev.write.format("graft.sources.CollectorSink")
        .option("name", "retry_clean").mode("append").save()
      val clean = CollectorSink.result("retry_clean").get

      // Pick a row somewhere inside its partition, so the first attempt
      // dies after having already counted some rows — partial state that
      // must NOT leak into the committed totals.
      val failId = ev.select(max("event_id")).head().getLong(0)

      @volatile var failedTasks = 0
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.reason != org.apache.spark.Success) failedTasks += 1
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        CollectorSink.clear("retry_once")
        ev.write.format("graft.sources.CollectorSink")
          .option("name", "retry_once")
          .option("failoncerow", failId.toString)
          .mode("append").save()
      } finally {
        // Listener delivery is async; give the bus a moment to drain.
        val deadline = System.nanoTime() + 10e9.toLong
        while (failedTasks < 1 && System.nanoTime() < deadline)
          Thread.sleep(50)
        spark.sparkContext.removeSparkListener(listener)
      }

      // The injected death really happened (this is not a vacuous pass)…
      assert(failedTasks >= 1, "fault injection never fired")
      // …and the committed result is byte-identical to the clean run:
      // one commit message per partition, no double-counted attempt.
      val r = CollectorSink.result("retry_once").get
      assert(r.rows == clean.rows)
      assert(r.checksum == clean.checksum)
      assert(r.tasks == 4)
    } finally {
      spark.stop()
    }
  }
}
