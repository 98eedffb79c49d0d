package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the round-6 analytics additions (the oracle
  * certifies exact values; these pin the semantic properties).
  */
class Round6cSpec extends SparkSuite {

  test("x150 retention: day-0 of every cohort is exactly 10000 per-10k") {
    val rows = SparkEntry.queries("x150_retention")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Long]("days_since") == 0L).foreach { r =>
      assert(r.getAs[Long]("retained_per_10k") == 10000L)
    }
    // retention at offset d never exceeds the cohort size
    rows.foreach(r => assert(r.getAs[Long]("retained_per_10k") <= 10000L))
  }

  test("x151 rfm: quintile labels in 1..5 and users conserved") {
    val rows = SparkEntry.queries("x151_rfm")(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("users")).sum == users)
    Seq("r_q", "f_q", "m_q").foreach { c =>
      rows.foreach(r => assert(r.getAs[Long](c) >= 1 && r.getAs[Long](c) <= 5))
    }
  }

  test("x152 triangles: positive and apex nodes bounded by parts") {
    val r = SparkEntry.queries("x152_triangles")(spark, sfDir).collect().head
    assert(r.getAs[Long]("triangles") > 0)
    val parts = Tables.part(spark, sfDir).count()
    assert(r.getAs[Long]("apex_nodes") <= parts)
  }

  test("x153 drift: one row per source, all non-negative, not all identical") {
    val rows = SparkEntry.queries("x153_source_drift")(spark, sfDir).collect()
    val sources = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(rows.length == sources)
    assert(rows.forall(_.getAs[Long]("l1_drift") >= 0))
    assert(rows.map(_.getAs[Long]("l1_drift")).distinct.length > 1)
  }
}
