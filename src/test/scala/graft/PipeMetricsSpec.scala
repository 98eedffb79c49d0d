package graft

import graft.pipeline.{PipeGraph, PipeMetrics}
import org.apache.spark.sql.functions._

/** R18 flow accounting: `Dataset.observe` counters ride the job itself
  * (no second scan) and report exact per-point row counts through a
  * PipeGraph run.
  */
class PipeMetricsSpec extends SparkSuite {

  test("observe counters report rows at each pipe point without extra passes") {
    val out = java.nio.file.Files.createTempDirectory("graft_metrics").toString
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val longDocs = docs.filter(length(col("text")) >= 200)
    val expectedKept = longDocs.count()

    val graph = PipeGraph.builder
      .producer("docs")(s => PipeMetrics.observed(Tables.documents(s, sfDir), "pipe_in"))
      .stage("docs", "kept") { d =>
        PipeMetrics.observed(d.filter(length(col("text")) >= 200), "pipe_out")
      }
      .consumer("kept")(df =>
        df.write.mode("overwrite").parquet(s"$out/kept"))
      .build()
      .fold(err => throw new IllegalStateException(err), identity)

    val (_, metrics) = PipeMetrics.collecting(spark) { graph.run(spark) }

    assert(metrics("pipe_in")("rows") == total,
      s"pipe_in saw ${metrics.get("pipe_in")}, expected $total")
    assert(metrics("pipe_out")("rows") == expectedKept,
      s"pipe_out saw ${metrics.get("pipe_out")}, expected $expectedKept")
    // and the consumer actually wrote what pipe_out counted
    assert(spark.read.parquet(s"$out/kept").count() == expectedKept)
  }
}
