package graft

/** Semantic anchors for the round-12 sketch/evaluation additions:
  * the Bloom laws hold exactly, the count-min join-size estimate is
  * one-sided, kappa genuinely discounts chance, and the calibration
  * report exposes the constructed overconfidence.
  */
class Round15Spec extends SparkSuite {

  private def statMap(name: String): Map[String, Long] =
    SparkEntry.queries(name)(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("x231 bloom: no false negatives, merge law exact, FPR accounted") {
    val m = statMap("x231_bloom_certify")
    assert(m("false_neg") == 0, s"bloom lost a member: $m")
    assert(m("merge_bits_diff") == 0,
      s"per-source OR-merge diverged from the all-keys filter: $m")
    assert(m("n_bits_set") <= 3 * m("n_members"),
      s"more bits than 3 per key: $m")
    assert(m("false_pos") <= m("n_probes"), s"accounting broken: $m")
    // The probe set is string-disjoint by construction, so every hit is
    // a REAL false positive; fpr_permille must be derived exactly.
    assert(m("fpr_permille") == m("false_pos") * 1000 / m("n_probes"))
  }

  test("x232 count-min join size: one-sided (never underestimates), min-tight") {
    val m = statMap("x232_cms_joinsize")
    val truth = m("truth")
    assert(truth > 0)
    (1 to 3).foreach { i =>
      assert(m(s"est_row_$i") >= truth,
        s"row $i UNDERestimated — structurally impossible unless the " +
          s"cells were built wrong: ${m(s"est_row_$i")} < $truth")
    }
    assert(m("est_min") == (1 to 3).map(i => m(s"est_row_$i")).min)
    assert(m("overcount_permille") >= 0)
    info(s"join-size overcount: ${m("overcount_permille")} permille " +
      s"(truth $truth, est ${m("est_min")})")
  }

  test("x233 kappa: chance discount bites and the graft accounts exactly") {
    val r = SparkEntry.queries("x233_annotator_kappa")(spark, sfDir)
      .collect().head
    val (n, agree, po, pe, kappa) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // The graft disagrees on exactly the vec_id % 9 == 4 class.
    val expectDisagree = Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.expr("vec_id % 9 = 4")).count()
    assert(n - agree == expectDisagree, s"graft accounting broken: $r")
    assert(kappa < po,
      s"kappa must sit BELOW raw agreement (chance discount): $r")
    assert(kappa > 0 && kappa < 1000, s"kappa out of range: $r")
    assert(pe > 0 && pe < po, s"expected agreement degenerate: $r")
  }

  test("x234 ECE: all bins live, overconfidence visible, summary weighted") {
    val rows = SparkEntry.queries("x234_calibration_ece")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (-1L to 9L), s"bins: ${rows.map(_._1)}")
    rows.foreach { r => assert(r._2 > 0, s"empty bin emitted: $r") }
    val (summary, bins) = (rows.head, rows.tail)
    assert(summary._2 == bins.map(_._2).sum, "summary mass != bin masses")
    // Weighted ECE recomputes exactly from the bins.
    assert(summary._5 == bins.map(b => b._2 * b._5).sum / summary._2)
    // The constructed 1.5x overconfidence must be visible: the top
    // (clamped) bin reports ~990 permille but realizes ~2/3 of it, and
    // the overall ECE is far from zero.
    assert(summary._5 > 100, s"ECE too small for a 1.5x-overconfident scorer: $summary")
    val top = bins.last
    assert(top._3 > top._4 + 100,
      s"top bin does not show the constructed gap: $top")
  }
}
