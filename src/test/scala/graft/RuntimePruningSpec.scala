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

  /** Row groups a min/max-pruning reader would READ for the rectangle
    * user_id ∈ [loU, hiU] ∧ d ∈ [loD, hiD]: those whose per-column stats
    * ranges both intersect it. This is exactly the statistics test
    * parquet-mr's RowGroupFilter (and every lakehouse file-skipping
    * index) applies — measured here straight off the footers, so the
    * skip ratio is attributable to LAYOUT alone, not reader heuristics.
    */
  private def rowGroups(dir: String, loU: Long, hiU: Long,
      loD: Long, hiD: Long): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    var total = 0
    var surviving = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getBlocks.asScala.foreach { block =>
        total += 1
        def range(name: String): (Long, Long) = {
          val st = block.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long],
            st.genericGetMax.asInstanceOf[java.lang.Long])
        }
        val (minU, maxU) = range("user_id")
        val (minD, maxD) = range("d")
        if (!(maxU < loU || minU > hiU) && !(maxD < loD || minD > hiD))
          surviving += 1
      } finally reader.close()
    }
    (surviving, total)
  }

  test("z-order layout: 2-D rectangle predicate skips row groups the unsorted layout scans") {
    val day = datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).cast("long")
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), day.as("d"), col("value"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val uDir = java.nio.file.Files.createTempDirectory("graft_unsorted").toString
    // write-side: the x102 curve key, range-partitioned + sorted into 8
    // files (each ≈ one row group at this size) vs the same data spread
    // by a content hash — the layout a table has before clustering.
    operators.ZOrder.zorderRepartition(base,
        operators.ZOrder.zvalue(col("user_id").bitwiseAND(lit(65535L)),
          col("d").bitwiseAND(lit(65535L))), 8)
      .write.mode("overwrite").parquet(zDir)
    base.repartition(8, col("event_id"))
      .write.mode("overwrite").parquet(uDir)

    // the probe rectangle: 4 of ~15 users × 8 of ~30 days ≈ 7% of rows
    val (loU, hiU, loD, hiD) = (4L, 7L, 19728L, 19735L)
    val (zSurv, zTotal) = rowGroups(zDir, loU, hiU, loD, hiD)
    val (uSurv, uTotal) = rowGroups(uDir, loU, hiU, loD, hiD)
    // hash layout: every row group spans the full space → nothing skips
    assert(uSurv == uTotal, s"unsorted layout unexpectedly pruned: $uSurv/$uTotal")
    // z-order layout: the rectangle maps to a tight z-interval → most
    // row groups' [min,max] rectangles miss it entirely
    assert(zTotal >= 8 && zSurv <= zTotal / 2,
      s"z-order skipped too little: $zSurv/$zTotal surviving")

    // and the pruned read is NOT a different answer: both layouts return
    // the identical row set under the same predicate
    def readRect(dir: String): Set[Long] =
      spark.read.parquet(dir)
        .filter(col("user_id").between(loU, hiU) && col("d").between(loD, hiD))
        .select("event_id").collect().map(_.getLong(0)).toSet
    assert(readRect(zDir) == readRect(uDir))
    assert(readRect(zDir).nonEmpty)
  }

}
