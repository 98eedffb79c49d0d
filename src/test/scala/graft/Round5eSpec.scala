package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-5 laws: SCD2 interval chaining and the cogroup/join
  * agreement (beyond the oracle, checked shape-level here).
  */
class Round5eSpec extends SparkSuite {

  test("scd2 intervals chain per user: valid_to equals the next valid_from") {
    val res = SparkEntry.queries("x118_scd2")(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val chained = res
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull || col("next_from").isNotNull)
    val broken = chained.filter(
      col("valid_to").isNull || col("next_from").isNull ||
        col("valid_to") =!= col("next_from")).count()
    assert(broken == 0, s"$broken non-chained intervals")
    // exactly one open (current) interval per user
    val open = res.filter(col("valid_to").isNull)
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(open == 0)
    // consecutive intervals never share the attribute (they'd be one row)
    val sameType = res
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull &&
        col("event_type") === col("next_type")).count()
    assert(sameType == 0)
  }

  test("stream upsert MV equals the batch aggregate") {
    val mv = SparkEntry.queries("x119_stream_upsert")(spark, sfDir)
    val batch = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("s"))
    assert(mv.exceptAll(batch).count() == 0 &&
      batch.exceptAll(mv).count() == 0)
  }

  test("producer source pushes id-range filters into row generation") {
    val df = spark.read.format("graft.sources.ProducerSource")
      .option("count", "100000").option("partitions", "8").load()
      .filter(col("id") >= 1000L && col("id") < 50000L)
      .select("id", "amount")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // planning-time narrowing: the scan's own description carries the
    // pushed range and the pruned column set
    assert(plan.contains("range=[1000,50000)"), plan.take(800))
    assert(plan.contains("cols=id,amount"), plan.take(800))
    assert(df.count() == 49000)
    // generation honors the range: no out-of-range row is ever produced
    val mm = df.agg(min(col("id")), max(col("id"))).head
    assert(mm.getLong(0) == 1000L && mm.getLong(1) == 49999L)
    // split into the requested number of input partitions
    assert(df.rdd.getNumPartitions == 8)
  }

  test("property: producer source returns exactly the filtered id range") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val count = 500L
    val bound = Gen.choose(-100L, 600L)
    val prop = Prop.forAll(bound, bound) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val got = spark.read.format("graft.sources.ProducerSource")
        .option("count", count.toString).option("partitions", "3").load()
        .filter(col("id") >= lo && col("id") < hi)
        .select("id").collect().map(_.getLong(0)).sorted
      val want = (math.max(0L, lo) until math.min(count, hi)).toArray
      got.sameElements(want)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("cogroup matches the relational full-outer rendering") {
    val typed = SparkEntry.queries("x120_cogroup")(spark, sfDir)
    val e = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val o = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val rel = e.join(o, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    assert(typed.exceptAll(rel).count() == 0 &&
      rel.exceptAll(typed).count() == 0)
  }
}
