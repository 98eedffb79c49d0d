package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB join strategy made concrete:
  * both tables bucketed by the join key at write time → the join needs NO
  * exchange at read time (each bucket pair joins locally).
  */
class BucketingSpec extends SparkSuite {

  test("join of tables bucketed on the key runs without a shuffle exchange") {
    // default warehouse dir (./spark-warehouse, gitignored) — the config
    // is static and can't be set on a live session. A fresh derby metastore
    // won't know tables from previous JVMs, so DROP alone leaves stale
    // locations behind — clear them on disk too.
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Seq("orders_b", "customer_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$t"))
    }

    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(spark, sfDir)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    // Disable broadcast so the join would otherwise need a shuffle.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("c"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the only exchange allowed is the one for the final small groupBy
      val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey") &&
        !joinSection.contains("Exchange hashpartitioning(c_custkey"),
        s"join inputs should be bucket-colocated:\n$plan")
      // sanity: result matches unbucketed join
      val direct = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("c"))
        .orderBy("c_nationkey").collect().toSeq
      assert(joined.orderBy("c_nationkey").collect().toSeq == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("persisted bucketed shingle index: dedup self-join co-locates and reproduces the inline pairs") {
    import graft.operators.{Dedup, TextOps}
    spark.sql("DROP TABLE IF EXISTS shingles_b")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("spark-warehouse/shingles_b"))
    val docs = Tables.documents(spark, sfDir)
    // the warehouse path PERF.md describes: the shingle index persisted
    // ONCE, bucketed by the join key, shared by the whole dedup family
    TextOps.shingles(docs)
      .write.bucketBy(8, "shingle").sortBy("shingle")
      .mode("overwrite").saveAsTable("shingles_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Dedup.ngramJaccardPairsFromShingles(
        spark.table("shingles_b"), 0.8)
      val got = pairs.orderBy("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val plan = pairs.queryExecution.executedPlan.toString
      // the fact-sized self-join reads co-located buckets — no exchange on
      // the shingle key anywhere in the plan
      assert(!plan.contains("Exchange hashpartitioning(shingle"),
        s"bucketed shingle self-join should not shuffle on shingle:\n$plan")
      // same pairs as the inline (localCheckpoint) rendering x02 declares
      val inline = Dedup.ngramJaccardPairs(docs, 0.8).orderBy("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == inline)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("SQL surface: the engine is queryable via spark.sql over temp views") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect().toSeq
    val viaDf = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    assert(viaSql == viaDf)
  }
}
