package graft

import graft.operators.{ConnectedComponents, Dedup}

/** MEASURES the round-count claims behind the two CC renderings instead
  * of citing them: on a path graph (worst case for label propagation,
  * diameter = n−1) the alternating-star algorithm must converge in
  * O(log n) rounds while min-label propagation needs O(diameter) — each
  * round of either is a full edge shuffle, so at cluster scale the round
  * count IS the cost model.
  */
class ConnectedComponentsSpec extends SparkSuite {

  test("path graph: alternating-star rounds are O(log n), min-label O(n)") {
    import spark.implicits._
    val n = 40L
    val path = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")

    val (starLabels, starRounds) =
      ConnectedComponents.alternatingStarWithRounds(path)
    val (propLabels, propRounds) = Dedup.dedupClustersWithRounds(path)

    val star = starLabels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val prop = propLabels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == prop, "the two algorithms disagree on components")
    assert(star.values.forall(_ == 0L), "one path component labeled 0")

    // log2(40) ≈ 5.3; the alternating algorithm contracts at least a
    // constant factor per round — allow generous slack over the bound.
    assert(starRounds <= 12,
      s"alternating-star took $starRounds rounds on a 40-path (O(log n) claim)")
    // Min-label propagation moves labels one hop per round: the 0-label
    // needs diameter hops to reach the far end.
    assert(propRounds >= (n - 1) / 2,
      s"min-label took only $propRounds rounds — the path worst case " +
        "should be O(diameter); did the algorithm change?")
    assert(starRounds * 2 < propRounds,
      s"star ($starRounds) should beat propagation ($propRounds) clearly")
  }
}
