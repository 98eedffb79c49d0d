package graft

import graft.examples.LlmDataPipeline
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** End-to-end pipeline example: gates, dedup guarantee, decontamination,
  * deterministic split.
  */
class LlmDataPipelineSpec extends SparkSuite {

  private val out = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft_pipeline_spec").toString

  test("pipeline partitions the corpus and curated output is near-dup free") {
    LlmDataPipeline.build(sfDir, out).run(spark)
    val train = spark.read.parquet(s"$out/train")
    val holdout = spark.read.parquet(s"$out/holdout")
    val curated = train.unionByName(holdout)
    val rejected = spark.read.parquet(s"$out/rejected")
    val total = Tables.documents(spark, sfDir).count()

    assert(train.count() > 0 && holdout.count() > 0 && rejected.count() > 0)
    // every input doc lands in exactly one sink, before dedup/decontam losses
    val losses = total - curated.count() - rejected.count()
    assert(losses >= 0)
    // the split is a partition of curated
    assert(train.join(holdout, Seq("doc_id"), "inner").isEmpty)
    // gates hold
    assert(curated.filter(col("quality") < 9900 || col("n_tokens") < 15 ||
      col("oov_rate") > 0.9).isEmpty)
    assert(rejected.filter(col("quality") >= 9900 && col("n_tokens") >= 15 &&
      col("oov_rate") <= 0.9 && !col("repetitive")).isEmpty)
    // the curated set contains no remaining near-dup pairs at the threshold
    assert(Dedup.ngramJaccardPairs(curated, 0.8).isEmpty)
    // and no exact duplicates
    assert(curated.groupBy(lower(col("text"))).count().filter(col("count") > 1).isEmpty)
    // sequences: every train doc is chunked; every chunk start is either
    // on-stride or the tail start (no token dropped); chunk widths bounded
    val seqs = spark.read.parquet(s"$out/sequences")
    assert(seqs.select("doc_id").distinct().count() == train.count())
    assert(seqs.filter(col("n_tok") > 64 || col("n_tok") < 1).isEmpty)
    val trainTok = train.select(col("doc_id"),
      size(filter(split(lower(col("text")), " "), (w: Column) => w =!= ""))
        .cast("long").as("len"))
    assert(seqs.join(trainTok, "doc_id")
      .filter(col("chunk_start") % 32 =!= 0 &&
        col("chunk_start") =!= greatest(col("len") - 64, lit(0L))).isEmpty)
    // tail coverage: the last chunk of each doc ends at the doc's end
    assert(seqs.join(trainTok, "doc_id")
      .groupBy("doc_id", "len").agg(max(col("chunk_start") + col("n_tok")).as("covered"))
      .filter(col("covered") =!= greatest(col("len"), lit(1L))).isEmpty)
    // decontamination: no non-benchmark curated doc has ≥50% of its
    // shingles covered by the benchmark shingle set
    val sh = TextOps.shingles(curated)
    val bench = TextOps.shingles(Tables.documents(spark, sfDir))
      .filter(col("doc_id") < LlmDataPipeline.benchmarkDocs)
      .select("shingle").distinct()
    val leak = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .join(sh.join(bench, "shingle").groupBy("doc_id").agg(count(lit(1)).as("ns")),
        Seq("doc_id"))
      .filter(col("doc_id") >= LlmDataPipeline.benchmarkDocs &&
        col("ns") * 2 >= col("n_sh"))
    assert(leak.isEmpty)
    // tokenizer artifact: the merge table carries the full trajectory,
    // trained on the train split only (x168's invariants hold here too)
    val merges = spark.read.parquet(s"$out/merges").orderBy("it").collect()
    assert(merges.length == graft.operators.BpeTrain.iters)
    val freqs = merges.map(_.getAs[Long]("freq")).toSeq
    assert(freqs == freqs.sorted.reverse && freqs.forall(_ > 0))
  }

  test("pipeline is deterministic across runs") {
    val out2 = out + "_rerun"
    LlmDataPipeline.build(sfDir, out2).run(spark)
    for (sink <- Seq("train", "holdout")) {
      val a = spark.read.parquet(s"$out/$sink").orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
      val b = spark.read.parquet(s"$out2/$sink").orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(a == b, s"sink $sink differs across runs")
    }
  }
}
