package graft

import org.apache.spark.sql.functions._

/** End-to-end drift-monitor example: KS self-consistency, share-drift
  * recomputation, and quarantine-threshold invariants over the fixture.
  */
class DriftMonitorSpec extends SparkSuite {

  test("drift monitor emits consistent KS, share, and quarantine reports") {
    val out = java.nio.file.Files.createTempDirectory("graft_drift_spec_")
      .toString
    graft.examples.DriftMonitor.run(spark, sfDir, out)

    // 1. One KS row per event type, each a valid ECDF gap with the
    //    significance boolean recomputed from its own integers.
    val ks = spark.read.parquet(s"$out/ks").collect()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(ks.length == types.toInt)
    ks.foreach { r =>
      val (dNum, dDen, n1, n2) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(n1 > 0 && n2 > 0 && dDen == n1 * n2 && dNum <= dDen)
      val d = dNum.toDouble / dDen.toDouble
      val crit = 1.36 * math.sqrt((n1 + n2).toDouble / dDen.toDouble)
      assert(r.getBoolean(6) == (d > crit), s"${r.getString(0)} gate drifted")
    }

    // 2. Share drift: flags match a direct recomputation of the
    //    cross-multiplied 20% test.
    val share = spark.read.parquet(s"$out/share").collect()
    val totRef = share.map(_.getLong(1)).sum
    val totCur = share.map(_.getLong(2)).sum
    share.foreach { r =>
      val want = math.abs(r.getLong(2) * totRef - r.getLong(1) * totCur) * 5 >
        r.getLong(1) * totCur
      assert(r.getBoolean(3) == want, s"${r.getString(0)} share flag")
    }
    // The fixture's per-type traffic is uniform by construction — the
    // monitor must NOT cry wolf on it.
    assert(share.count(_.getBoolean(3)) == 0,
      "uniform fixture flagged as share-drifted")

    // 3. Quarantine: every flagged day really exceeds the 20% error
    //    share, and no over-threshold day is missed.
    val q = spark.read.parquet(s"$out/quarantine").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(" + graft.functions.TimeCols
        .ntzEpochMicrosExpr("ts") + " DIV 86400000000 AS BIGINT)").as("day"),
        col("event_type"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errors"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
    daily.foreach { case (day, (n, errors)) =>
      assert(q.contains(day) == (errors * 5 > n), s"day $day quarantine")
    }
  }
}
