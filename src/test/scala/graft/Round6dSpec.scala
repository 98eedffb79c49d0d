package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the late round-6 streaming/filter additions. */
class Round6dSpec extends SparkSuite {

  test("x154: quarantined total is exactly the injected-corruption count") {
    val rows = SparkEntry.queries("x154_stream_dlq")(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
    val injected = ev.filter(pmod(col("event_id"), lit(7)) === 0).count()
    assert(rows.map(_.getAs[Long]("n_quarantined")).sum == injected)
    assert(rows.map(_.getAs[Long]("n_arrived")).sum == ev.count())
  }

  test("x155: the watermark dropped real rows, and kept never exceeds arrivals") {
    val kept = SparkEntry.queries("x155_stream_late_drop")(spark, sfDir)
      .agg(sum("c")).collect().head.getLong(0)
    val total = Tables.events(spark, sfDir).count()
    assert(kept < total, "disordered staging must force late drops")
    assert(kept > 0)
  }

  test("x156: reasons partition the corpus over the closed label set") {
    val rows = SparkEntry.queries("x156_filter_report")(spark, sfDir).collect()
    val labels = Set("non_english", "low_quality", "repetitive_lines",
      "repetitive_ngrams", "keep")
    assert(rows.forall(r => labels.contains(r.getString(1))))
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val byReason = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byReason.getOrElse("keep", 0) > 0)
    // The shared-vocab soup votes 'en' for every doc (all-zero stopword
    // scores tie-break to the priority head), so non_english stays empty
    // here; the drop reasons that DO fire on this fixture must be real.
    assert(byReason.getOrElse("repetitive_lines", 0) > 0)
  }
}
