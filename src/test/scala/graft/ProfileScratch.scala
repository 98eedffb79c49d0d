package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Throwaway r16 instrumentation main (test sources since r17 so it
  * stays runnable — `sbt "Test/runMain graft.ProfileScratch"` — without
  * shipping in the library jar; ADVICE r16).
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.operators.{Dedup, TextAnalysis}
    import graft.queries.{Round6bQueries, Round8Queries}
    val docs = Tables.documents(spark, dir)
    for (pass <- 1 to 2) {
      println(s"--- pass $pass x250 stages")
      val fr = t("s1 filterReport ckpt")(
        Round6bQueries.filterReport(spark, dir).localCheckpoint())
      val kept1 = fr.filter(col("reason") === "keep").select("doc_id")
      val docs1 = docs.join(kept1, "doc_id")
      val clusters = t("s2 lsh+clusters")(
        Dedup.dedupClusters(Dedup.minhashLshPairs(docs1, 0.8))
          .localCheckpoint())
      val qual = t("s2 quality join ckpt")(
        clusters.join(
          TextAnalysis.qualityScore(docs1).select("doc_id", "quality"),
          "doc_id").localCheckpoint())
      val docs2 = t("s2->s3 docs2 ckpt")(
        docs.join(kept1, "doc_id").localCheckpoint())
      t("s4 pack (over docs2 as proxy)")(
        Round8Queries.sequencePackDocs(
          docs2.select("doc_id", "source", "text"))
          .write.mode("overwrite").format("noop").save())
      val keep = graft.operators.CoPurchaseGraph.sharedRddIds(spark)
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id)).foreach(_.unpersist(false))
      t("x250 full")(SparkEntry.queries("x250_corpus_pipeline")(spark, dir)
        .write.mode("overwrite").format("noop").save())
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id)).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
