package graft

/** Semantic anchors for the round-12 operators, beyond the hash gate:
  * the NB classifier actually learns (diagonal dominance on the grafted
  * signal), DSIR generalizes to held-out target-like docs it never
  * trained on (the property that separates importance weighting from
  * x69-style membership screens), and the dedup sweep's curve is the
  * documented bimodal shape with the [0.1, 0.6] plateau.
  */
class Round12Spec extends SparkSuite {

  test("x204 confusion matrix: diagonal dominates and rows cover the test split") {
    val rows = SparkEntry.queries("x204_nb_classify")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    val diag = rows.filter(r => r._1 == r._2).map(_._3).sum
    // 2/3 of docs carry the grafted marker vocabulary and must classify
    // correctly; only the un-grafted third may fall to the prior. The
    // test split is doc_id % 10 >= 8 — ~20% of the corpus.
    val nTest = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 >= 8).count()
    assert(total == nTest, s"confusion total $total != test split $nTest")
    assert(diag * 3 >= total * 2,
      s"diagonal $diag < 2/3 of $total — the marker vocabulary was not learned")
    // Every actual class appears (the fixture has all 5 langs in the split).
    assert(rows.map(_._1).distinct.length == 5)
    // Both branches are non-vacuous: something off-diagonal exists (the
    // prior-dominated un-grafted third cannot be perfect across 5 classes).
    assert(rows.exists(r => r._1 != r._2),
      "no off-diagonal cell — the fallback branch never fired")
  }

  test("x205 DSIR ranks held-out target-like docs it never trained on into the top-k") {
    val top = SparkEntry.queries("x205_dsir_select")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(top.length == 25)
    // Weights are sorted desc (ties by doc_id asc).
    assert(top.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    // The top-k is dominated by marked docs (trained-on OR held-out).
    val marked = top.count(_._2 == 1)
    assert(marked >= 20, s"only $marked/25 of the top-k are target-like")
    // The generalization claim: at least one held-out doc (doc_id % 11 == 3
    // but NOT % 7 == 0 — never in the target training set) ranks in the
    // top-k purely via its hashed-feature importance weight.
    val heldOut = top.count(t => t._1 % 11 == 3 && t._1 % 7 != 0)
    assert(heldOut >= 1, "no held-out target-like doc surfaced — weights did not generalize")
  }

  test("x206 sweep curve is bimodal with the documented [0.1, 0.6] plateau") {
    val rows = SparkEntry.queries("x206_dedup_sweep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(50L, 100L, 300L, 600L, 900L))
    val np = rows.map(r => r._1 -> r._2).toMap
    val nd = rows.map(r => r._1 -> r._3).toMap
    // Monotone non-increasing in the threshold (a pair clearing t clears
    // every t' < t by construction).
    assert(np(50) >= np(100) && np(100) >= np(300) &&
      np(300) >= np(600) && np(600) >= np(900))
    // The plateau: organic pairs sit below 0.1 Jaccard, planted dups at
    // 0.9+, so every threshold in [0.1, 0.6] selects the same pair set.
    assert(np(100) == np(300) && np(300) == np(600),
      s"plateau broken: ${np(100)}/${np(300)}/${np(600)}")
    assert(np(600) > 0, "no planted near-dup pair cleared 0.6")
    // The loose cliff is real: 0.05 admits organic noise the plateau drops.
    assert(np(50) > np(100), "no organic sub-0.1 pairs — the low cliff is vacuous")
    // Doc counts are consistent: a pair touches <= 2 distinct docs.
    rows.foreach { case (tp, pairs, docs) =>
      assert(docs <= 2 * pairs, s"tp=$tp: $docs docs from $pairs pairs")
      assert(pairs == 0 || docs >= 2)
    }
  }
}
