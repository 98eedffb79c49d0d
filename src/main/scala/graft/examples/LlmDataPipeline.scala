package graft.examples

import graft.{Sessions, Tables}
import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.PipeGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end LLM training-data pipeline — the "switch from the reference"
  * showcase: the reference's dataflow shape (producer → stages → branching
  * → consumers, `/root/reference/README.md:56-108`) carrying this
  * library's analytics operators over a real corpus:
  *
  *   documents ─→ enrich (quality / langid / token stats / repetition)
  *             ─→ branch: clean | rejected  (quality + length +
  *                Gopher-style top-bigram-repetition gates)
  *             ─→ dedup: drop exact dups (keep-first), then cluster the
  *                MinHash-LSH near-dup pairs into connected components
  *                and keep ONE doc per component (the transitive-closure
  *                policy real corpus dedup uses — A~B and B~C drops both
  *                B and C even when A~C was never scored)
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
        // Top-bigram repetition ratio (the x42 gate): repetitive docs have
        // one bigram dominating their bigram stream.
        val toks = filter(split(lower(col("text")), " "), (w: Column) => w =!= "")
        val rep = docs
          .select(col("doc_id"), toks.as("toks"))
          .select(col("doc_id"), explode(when(size(col("toks")) >= 2,
            zip_with(slice(col("toks"), lit(1), size(col("toks")) - 1),
              slice(col("toks"), lit(2), size(col("toks")) - 1),
              (a, b) => concat(a, lit(" "), b))).otherwise(array())).as("bigram"))
          .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg((max(col("c")) * 5 > sum(col("c"))).as("repetitive"))
        docs
          .join(TextAnalysis.qualityScore(docs).select("doc_id", "quality", "n_tokens"), "doc_id")
          .join(TextAnalysis.langId(docs).select("doc_id", "pred_lang"), "doc_id")
          .join(rep, Seq("doc_id"), "left")
          .withColumn("repetitive", coalesce(col("repetitive"), lit(false)))
      }
      .branchingStage("enriched", Seq("clean", "rejected")) { df =>
        val pass = col("quality") >= 9900 && col("n_tokens") >= 15 && !col("repetitive")
        Seq(df.filter(pass), df.filter(!pass).withColumn("reject_reason",
          when(col("quality") < 9900, "low_quality")
            .when(col("n_tokens") < 15, "too_short")
            .otherwise("repetitive")))
      }
      .stage("clean", "deduped") { clean =>
        val survivors = Dedup.exactKeepFirst(clean)
        // Transitive near-dup removal: cluster the LSH pairs, keep the
        // minimum doc_id of each connected component.
        val clusters = Dedup.dedupClusters(Dedup.minhashLshPairs(clean, 0.8))
        val nearDupLosers = clusters
          .filter(col("doc_id") =!= col("cluster_id"))
          .select("doc_id")
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
