package graft

/** Semantic anchors for x243/x244: the histogram-quantile error bound
  * actually holds, and the streaming histogram drains to the batch
  * report row for row.
  */
class Round17Spec extends SparkSuite {

  test("x243 histogram quantiles: bound holds, estimate never undershoots") {
    val rows = SparkEntry.queries("x243_hist_quantiles")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))
    assert(rows.length == 15, s"expected 5 types x 3 quantiles: ${rows.length}")
    rows.foreach { r =>
      assert(r._7 == 1, s"certified bound violated: $r")
      // The guarantee, re-derived engine-side: exact <= est_hi and the
      // gap stays within one bucket width (+1 for the ceiling slack).
      assert(r._5 >= 0 && r._5 <= r._6 + 1,
        s"err outside [0, width+1]: $r")
      assert(r._3 > r._4, s"upper-bound estimate not above exact: $r")
    }
    // p90's estimate must exceed p25's for every type (sanity that the
    // bucket selection tracks the rank, not a constant).
    rows.groupBy(_._1).foreach { case (t, g) =>
      val byQ = g.map(r => r._2 -> r._3).toMap
      assert(byQ(250L) <= byQ(900L), s"quantile order broken for $t: $byQ")
    }
  }

  test("x244 streaming histogram drains to the batch report row for row") {
    val stream = SparkEntry.queries("x244_stream_hist_quantiles")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = SparkEntry.queries("x243_hist_quantiles")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(stream.toSeq == batch.toSeq,
      "drained histogram report diverged from batch")
  }
}
