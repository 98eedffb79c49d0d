package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.Row

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan) —
  * synthetic edge cases plus full parity with the window-composition
  * rendering (x20) on real data.
  */
class AsofJoinSpec extends SparkSuite {

  test("asof join: strictly-before match, per-key isolation, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // before any right row → null
      (1L, 20L, 101L), // right (1, 15) matches
      (1L, 30L, 102L), // right (1, 25) shadows (1, 15)
      (2L, 50L, 200L), // key 2: only key-1 right rows exist before → null
      (3L, 15L, 300L)  // right (3, 15, tie 5) NOT matched (same time, tie 5 < 300 → strictly before) → matched
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, 15L, 1L, 111L),
      (1L, 25L, 2L, 222L),
      (3L, 15L, 5L, 333L)
    ).toDF("k", "t", "id", "v")
    val out = AsofJoin(left, right, "k", "t", "id", "v", "matched")
      .select("id", "matched").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out == Map(
      100L -> null, 101L -> 111L, 102L -> 222L, 200L -> null, 300L -> 333L))
  }

  test("asof join: equal time uses the tie column strictly") {
    import spark.implicits._
    // left (1, t=15, id=0) vs right (1, t=15, id=5): (15,5) is NOT < (15,0)
    // → no match; left (1, t=15, id=9) → (15,5) < (15,9) → match.
    val left = Seq((1L, 15L, 0L), (1L, 15L, 9L)).toDF("k", "t", "id")
    val right = Seq((1L, 15L, 5L, 55L)).toDF("k", "t", "id", "v")
    val out = AsofJoin(left, right, "k", "t", "id", "v", "m")
      .select("id", "m").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out == Map(0L -> null, 9L -> 55L))
  }

  test("native asof join equals the x20 window rendering on sf0.001") {
    val windowed = SparkEntry.queries("x20_asof_join")(spark, sfDir)
      .collect().toSeq
    val native = SparkEntry.queries("x55_asof_native")(spark, sfDir)
      .collect().toSeq
    assert(native == windowed)
  }

  test("injected rule pushes left-side filters through the join into the scan") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      .select("user_id", "us", "event_id")
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      .select("user_id", "us", "event_id")
    val full = AsofJoin(ev, purchases, "user_id", "us", "event_id",
      "event_id", "prev_purchase")
    val filtered = full.filter(col("user_id") < 10)
    val rows = filtered.collect()
    // correctness: pre-join filtering must equal post-join filtering
    val expected = full.collect().filter(_.getLong(0) < 10)
    assert(rows.sortBy(r => (r.getLong(0), r.getLong(2))).toSeq ==
      expected.sortBy(r => (r.getLong(0), r.getLong(2))).toSeq)
    // plan: the predicate reached the left parquet scan as a PushedFilter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(user_id,10)"), plan.take(800))
  }

  test("physical plan: AsofJoinExec with both children hash-partitioned") {
    val df = SparkEntry.queries("x55_asof_native")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).length >= 2, plan.take(500))
  }
}
