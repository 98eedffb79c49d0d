package graft

import graft.sources.CollectorSink
import org.apache.spark.sql.functions._

/** DSv2 write path: two-phase commit semantics of the collector sink. */
class CollectorSinkSpec extends SparkSuite {

  private def ev = Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("event_type"))

  test("committed totals match the dataframe, one commit message per partition") {
    CollectorSink.clear("t1")
    val df = ev.repartition(5)
    df.write.format("graft.sources.CollectorSink")
      .option("name", "t1").mode("append").save()
    val r = CollectorSink.result("t1").get
    assert(r.rows == ev.count())
    assert(r.tasks == 5)
  }

  test("checksum is partitioning- and order-independent (commutative commit)") {
    CollectorSink.clear("a"); CollectorSink.clear("b")
    ev.repartition(3).write.format("graft.sources.CollectorSink")
      .option("name", "a").mode("append").save()
    ev.repartition(11, col("user_id")).sortWithinPartitions("event_type")
      .write.format("graft.sources.CollectorSink")
      .option("name", "b").mode("append").save()
    val (a, b) = (CollectorSink.result("a").get, CollectorSink.result("b").get)
    assert(a.checksum == b.checksum && a.rows == b.rows)
    assert(a.tasks == 3 && b.tasks == 11)
  }

  test("failed job publishes nothing — no partial visibility") {
    CollectorSink.clear("tfail")
    val someId = ev.select(max("event_id")).head().getLong(0)
    val thrown = intercept[Exception] {
      ev.write.format("graft.sources.CollectorSink")
        .option("name", "tfail").option("failrow", someId.toString)
        .mode("append").save()
    }
    assert(thrown.getMessage != null)
    assert(CollectorSink.result("tfail").isEmpty)
  }
}
