package graft

import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY §2.B scans/sinks row): csv, json, orc,
  * and text roundtrips, and a partitioned parquet sink whose reads
  * partition-prune. (No spark-avro connector ships in this Spark distro,
  * so avro is out of scope.)
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

  test("orc sink + source roundtrip preserves events with predicate pushdown") {
    val ev = Tables.events(spark, sfDir)
    val path = tmp("events_orc")
    ev.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.orderBy("event_id").collect().toSeq ==
      ev.orderBy("event_id").collect().toSeq)
    // ORC scans support the same filter pushdown as parquet
    val df = back.filter(col("user_id") < 10)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("LessThan(user_id,10)"))
  }

  test("text sink + source roundtrip preserves raw document lines") {
    val docs = Tables.documents(spark, sfDir).select("text")
    val path = tmp("docs_text")
    docs.write.text(path)
    val back = spark.read.text(path).withColumnRenamed("value", "text")
    assert(back.orderBy("text").collect().toSeq ==
      docs.orderBy("text").collect().toSeq)
  }

  test("schema evolution: mergeSchema unifies old and new snapshot columns") {
    // The recurring-ingest reality: a later snapshot adds a column. Old
    // files must keep reading (null-filled), new files carry the field.
    val path = tmp("evolving")
    val v1 = Tables.documents(spark, sfDir).select("doc_id", "text")
    v1.write.parquet(s"$path/s=1")
    val v2 = Tables.documents(spark, sfDir)
      .select(col("doc_id") + 1000000L as "doc_id", col("text"), col("lang"))
    v2.write.parquet(s"$path/s=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "s"))
    assert(merged.count() == v1.count() + v2.count())
    // old-snapshot rows read the evolved column as null; new rows don't
    assert(merged.filter(col("s") === 1 && col("lang").isNotNull).count() == 0)
    assert(merged.filter(col("s") === 2 && col("lang").isNull).count() == 0)
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
