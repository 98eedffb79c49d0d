package graft.examples

import graft.{Sessions, Tables}
import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.PipeGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end LLM training-data pipeline — the "switch from the reference"
  * showcase: the reference's dataflow shape (producer → stages → branching
  * → consumers, `/root/reference/README.md:56-108`) carrying this
  * library's analytics operators over a real corpus:
  *
  *   documents ─→ enrich (quality / langid / token stats)
  *             ─→ branch: clean | rejected  (quality + length gates)
  *             ─→ dedup: drop exact dups (keep-first) and near-dups
  *                (MinHash-LSH pairs, keep the smaller doc_id)
  *             ─→ sinks: curated parquet + rejected parquet
  *
  * Every step is a declarative DataFrame transform — at 100 TB this exact
  * graph runs unchanged with the parquet paths pointed at the warehouse;
  * the LSH dedup is the scalable path (no all-pairs anywhere).
  */
object LlmDataPipeline {

  def build(sfDir: String, outDir: String): PipeGraph = {
    PipeGraph.builder
      .producer("docs")(s => Tables.documents(s, sfDir))
      .stage("docs", "enriched") { docs =>
        docs
          .join(TextAnalysis.qualityScore(docs).select("doc_id", "quality", "n_tokens"), "doc_id")
          .join(TextAnalysis.langId(docs).select("doc_id", "pred_lang"), "doc_id")
      }
      .branchingStage("enriched", Seq("clean", "rejected")) { df =>
        val pass = col("quality") >= 9900 && col("n_tokens") >= 15
        Seq(df.filter(pass), df.filter(!pass).withColumn("reject_reason",
          when(col("quality") < 9900, "low_quality").otherwise("too_short")))
      }
      .stage("clean", "deduped") { clean =>
        val survivors = Dedup.exactKeepFirst(clean)
        val nearDupLosers = Dedup.minhashLshPairs(clean, 0.8)
          .select(col("b").as("doc_id")).distinct()
        clean
          .join(survivors, Seq("doc_id"), "left_semi")
          .join(nearDupLosers, Seq("doc_id"), "left_anti")
      }
      .consumer("deduped")(df =>
        df.orderBy("doc_id").write.mode("overwrite").parquet(s"$outDir/curated"))
      .consumer("rejected")(df =>
        df.orderBy("doc_id").write.mode("overwrite").parquet(s"$outDir/rejected"))
      .build()
      .fold(err => throw new IllegalStateException(err), identity)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline_out"
    val spark = Sessions.local()
    build(sfDir, outDir).run(spark)
    val curated = spark.read.parquet(s"$outDir/curated").count()
    val rejected = spark.read.parquet(s"$outDir/rejected").count()
    println(s"""{"curated":$curated,"rejected":$rejected,"out":"$outDir"}""")
    spark.stop()
  }
}
