package graft

import org.apache.spark.sql.functions._

/** Runtime-pruning evidence for the two mechanisms a 100 TB star join
  * leans on beyond static pushdown: dynamic partition pruning (the dim
  * filter's key set prunes fact PARTITIONS at runtime) and runtime bloom
  * filters (the dim filter's key set prunes fact ROWS before the shuffle).
  * Both are Catalyst features the engine gets by keeping plans declarative
  * — these specs pin that they actually engage on this session's configs.
  */
class RuntimePruningSpec extends SparkSuite {

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val prev = "spark.sql.optimizer.dynamicPartitionPruning.useStats" ->
      spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    // without ANALYZE'd column stats the benefit estimate degrades to 0 and
    // the rule bails; fall back to the ratio heuristic like an un-analyzed
    // production table would.
    spark.conf.set(prev._1, "false")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
      val tmpD = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
      Tables.events(spark, sfDir)
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      import spark.implicits._
      // dim must be disk-backed: a filtered LocalRelation gets constant-
      // folded by ConvertToLocalRelation before the pruning rule can see
      // the selective predicate it keys on.
      Seq(("click", 1), ("purchase", 2)).toDF("et", "w")
        .write.mode("overwrite").parquet(tmpD)
      val fact = spark.read.parquet(tmp)
      val dim = spark.read.parquet(tmpD).filter(col("w") === 1)
      val joined = fact.join(dim, col("event_type") === col("et"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("click"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"expected a dynamic pruning subquery in:\n${plan.take(1500)}")
    } finally spark.conf.set(prev._1, prev._2)
  }

  test("runtime bloom filter prunes fact rows ahead of a shuffle join") {
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1B")
    // force a shuffle join: bloom filters only apply when the dim is NOT broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val tmpF = java.nio.file.Files.createTempDirectory("graft_bloom_f").toString
      val tmpD = java.nio.file.Files.createTempDirectory("graft_bloom_d").toString
      Tables.events(spark, sfDir).write.mode("overwrite").parquet(tmpF)
      Tables.events(spark, sfDir).select("user_id").distinct()
        .write.mode("overwrite").parquet(tmpD)
      val fact = spark.read.parquet(tmpF)
      // the rule requires a SELECTIVE FILTER on the creation side in the
      // query itself (that's what makes the bloom filter worth building)
      val dim = spark.read.parquet(tmpD).filter(col("user_id") % 100 === 0)
      val joined = fact.join(dim, "user_id")
        .agg(count(lit(1)).as("n"))
      val n = joined.collect().head.getLong(0)
      assert(n > 0)
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter") ||
        optimized.contains("might_contain"),
        s"expected a runtime bloom filter in:\n${optimized.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

}
