package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Skew handling evidence: the salted aggregation's correctness under a
  * pathological key distribution, and AQE's skew-join splitting actually
  * engaging on this session's configs — the two mechanisms the 100 TB
  * design notes lean on for hot keys.
  */
class SkewSpec extends SparkSuite {

  test("saltedAgg equals plain groupBy on a pathologically skewed key") {
    import spark.implicits._
    // one key carries 100k rows, the rest carry 10 each
    val hot = (1 to 100000).map(i => (1L, i.toDouble))
    val cold = (2L to 101L).flatMap(k => (1 to 10).map(i => (k, i.toDouble)))
    val df = (hot ++ cold).toDF("k", "v")
    val salted = Skew.saltedAgg(df, col("k"), col("v"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,6)")).cast("double").as("s"),
        count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
    assert(salted(1L)._2 == 100000L)
  }

  test("saltedAggs matches unsalted min/max/sum/count/avg on the hot-key fixture") {
    import spark.implicits._
    import Skew._
    val hot = (1 to 100000).map(i => (1L, i.toDouble))
    val cold = (2L to 101L).flatMap(k => (1 to 10).map(i => (k, i.toDouble)))
    val df = (hot ++ cold).toDF("k", "v")
    val salted = Skew.saltedAggs(df, col("k"), Seq(
        SaltedMin(col("v"), "mn"), SaltedMax(col("v"), "mx"),
        SaltedSum(col("v"), "s"), SaltedCount("c"), SaltedAvg(col("v"), "a")))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    val plain = df.groupBy("k").agg(
        min("v").as("mn"), max("v").as("mx"),
        sum(col("v").cast("decimal(18,6)")).cast("double").as("s"),
        count(lit(1)).as("c"),
        (sum(col("v").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("a"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(salted == plain)
    assert(salted(1L)._4 == 100000L)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // Force the skew-join path: a hot fact key joined to a non-broadcast
    // side, with thresholds lowered so the toy data trips the optimizer.
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = ((1 to 200000).map(_ => 1L) ++ (2L to 2000L)).toDF("k")
        .withColumn("payload", lpad(col("k").cast("string"), 32, "x"))
      val dim = (1L to 2000L).toDF("k").withColumn("d", col("k") * 2)
      val joined = fact.join(dim, "k")
      // collect() (not count()) so THIS QueryExecution's AQE plan finalizes
      assert(joined.collect().length == 200000 + 1999)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(800))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
