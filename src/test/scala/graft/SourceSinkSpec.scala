package graft

import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY §2.B scans/sinks row): csv and json
  * roundtrips, and a partitioned parquet sink whose reads partition-prune.
  */
class SourceSinkSpec extends SparkSuite {

  private def tmp(name: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_io", name)
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  test("csv sink + source roundtrip preserves documents") {
    val docs = Tables.documents(spark, sfDir)
    val path = tmp("docs_csv")
    docs.write.option("header", "true").option("quoteAll", "true").csv(path)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(path)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("json sink + source roundtrip preserves events (µs timestamps)") {
    val ev = Tables.events(spark, sfDir)
    val path = tmp("events_json")
    // default JSON timestamp format truncates to millis — force µs
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev.write.option("timestampNTZFormat", fmt).json(path)
    val back = spark.read.schema(ev.schema)
      .option("timestampNTZFormat", fmt).json(path)
    assert(back.orderBy("event_id").collect().toSeq ==
      ev.orderBy("event_id").collect().toSeq)
  }

  test("partitioned parquet sink: reads prune partitions") {
    val ev = Tables.events(spark, sfDir)
    val path = tmp("events_part")
    ev.write.partitionBy("event_type").parquet(path)
    val one = spark.read.parquet(path).filter(col("event_type") === "purchase")
    assert(one.count() ==
      ev.filter(col("event_type") === "purchase").count())
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter missing in:\n$scan")
  }
}
