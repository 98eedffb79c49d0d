package graft

/** Semantic anchors for x235/x236/x237: mutual-best mining is a
  * 1:1 matching, the weakest-link audit respects the pair threshold,
  * and the HLL regime rule picks the right estimator.
  */
class Round15bSpec extends SparkSuite {

  test("x235 bitext: mutual best match is a 1:1 cross-lingual matching") {
    val rows = SparkEntry.queries("x235_bitext_mine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "no parallel pairs mined")
    // Mutuality forces a matching: no english doc pairs twice, no french
    // doc is claimed twice.
    assert(rows.map(_._1).distinct.length == rows.length, "en side reused")
    assert(rows.map(_._2).distinct.length == rows.length, "fr side reused")
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val en = docs.filter(col("lang") === "en").count()
    val fr = docs.filter(col("lang") === "fr").count()
    assert(rows.length <= math.min(en, fr), "more pairs than the smaller side")
  }

  test("x236 weakest link: threshold respected, densities and bounds sane") {
    val rows = SparkEntry.queries("x236_cluster_weakest_link")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 >= 2, s"singleton cluster emitted: $r")
      assert(r._3 >= r._2 - 1, s"fewer edges than a spanning tree: $r")
      assert(r._4 > 0 && r._4 <= 1000, s"density out of range: $r")
      // Every verified edge cleared the 0.8 Jaccard threshold, so the
      // weakest link can never sit below it.
      assert(r._5 >= 0.8 && r._5 <= r._6, s"weakest link underflows: $r")
    }
  }

  test("x237 HLL: merge law exact, regime rule consistent, error bounded") {
    val r = SparkEntry.queries("x237_hll_certify")(spark, sfDir)
      .collect().head
    val (estHll, estLin, nEmpty, est, nTrue, mergeDiff, err) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    assert(mergeDiff == 0, s"register max-merge diverged: $r")
    // The standard regime rule, replayed: linear counting while the raw
    // estimate is small and empty buckets remain.
    val expected = if (estHll <= 160 && nEmpty > 0) estLin else estHll
    assert(est == expected, s"regime rule drifted: $r")
    assert(nTrue > 0 && est > 0)
    // Hash-fixed, so this is a deterministic regression pin: at the spec
    // SF linear counting lands within 40% (measured: exact).
    assert(err <= 400, s"HLL estimate off by ${err} permille: $r")
  }
}
