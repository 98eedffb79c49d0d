package graft

import graft.examples.LlmDataPipeline
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** End-to-end pipeline example: gates, dedup guarantee, determinism. */
class LlmDataPipelineSpec extends SparkSuite {

  private val out = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft_pipeline_spec").toString

  test("pipeline partitions the corpus and curated output is near-dup free") {
    LlmDataPipeline.build(sfDir, out).run(spark)
    val curated = spark.read.parquet(s"$out/curated")
    val rejected = spark.read.parquet(s"$out/rejected")
    val total = Tables.documents(spark, sfDir).count()

    assert(curated.count() > 0 && rejected.count() > 0)
    // every input doc lands in exactly one sink, before dedup losses
    val dedupLosses = total - curated.count() - rejected.count()
    assert(dedupLosses >= 0)
    // gates hold
    assert(curated.filter(col("quality") < 9900 || col("n_tokens") < 15).isEmpty)
    assert(rejected.filter(col("quality") >= 9900 && col("n_tokens") >= 15).isEmpty)
    // the curated set contains no remaining near-dup pairs at the threshold
    assert(Dedup.ngramJaccardPairs(curated, 0.8).isEmpty)
    // and no exact duplicates
    assert(curated.groupBy(lower(col("text"))).count().filter(col("count") > 1).isEmpty)
  }

  test("pipeline is deterministic across runs") {
    val out2 = out + "_rerun"
    LlmDataPipeline.build(sfDir, out2).run(spark)
    val a = spark.read.parquet(s"$out/curated").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val b = spark.read.parquet(s"$out2/curated").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
