package graft

import org.apache.spark.sql.functions._

/** End-to-end corpus-refresh example: novelty, passage screen, and budget
  * invariants over the real fixture.
  */
class CorpusRefreshSpec extends SparkSuite {

  test("corpus refresh admits only novel, non-boilerplate, in-budget docs") {
    val out = java.nio.file.Files.createTempDirectory("graft_refresh_spec_")
      .toString
    graft.examples.CorpusRefresh.run(spark, sfDir, out)
    val batch = spark.read.parquet(s"$out/refresh_batch")
    val report = spark.read.parquet(s"$out/refresh_report")
    assert(batch.count() > 0)

    // 1. Novelty: no admitted doc shares a content fingerprint with the
    //    existing corpus (sources src0..src9).
    val docs = Tables.documents(spark, sfDir).withColumn("fp", md5(col("text")))
    val existing = docs.filter(length(col("source")) <= 4).select("fp").distinct()
    val leaked = batch.withColumn("fp", md5(col("text")))
      .join(existing, "fp").count()
    assert(leaked == 0, s"$leaked non-novel docs admitted")

    // 2. All admitted docs come from the new-snapshot sources.
    assert(batch.filter(length(col("source")) <= 4).count() == 0)

    // 3. Passage screen: every admitted doc is < 50% duplicated against
    //    the union corpus.
    val frac = graft.examples.CorpusRefresh
      .passageDupFraction(Tables.documents(spark, sfDir))
    val boiler = batch.join(frac, "doc_id")
      .filter(col("n_dup") * 2 >= col("n_passages")).count()
    assert(boiler == 0, s"$boiler boilerplate docs admitted")

    // 4. Budget: per source, the pre-admission cumulative token count of
    //    every admitted doc is under the 20k budget (the admission rule),
    //    and the report's totals equal the batch's.
    val repRows = report.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val gotRows = batch.withColumn("n_tok",
        size(filter(split(lower(col("text")), " "), w => w =!= "")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("tok"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(repRows == gotRows)
  }
}
