package graft

import graft.queries.Round6bQueries

/** Certifies x151's sampled quintile cutpoints against the full
  * population (r6 verdict task 1's "approx ≡ exact or bounded
  * disagreement" spec): for every dimension and k, the fraction of users
  * strictly below cut_k stays under k/5 + 0.1 and the fraction at-or-below
  * reaches k/5 − 0.1. At SFs where the sample modulus is 1 (n ≤ 256
  * users) both bounds hold EXACTLY by the percentile_disc definition; at
  * sf0.1 the ~256-user md5 sample genuinely engages (modulus 5) and the
  * slack absorbs its rank error.
  */
class RfmCutpointSpec extends SparkSuite {

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1"))
    test(s"x151 sampled cutpoints track full-population ranks ($dir)") {
      val longDf = Round6bQueries.rfmMetricsLong(spark, dir).cache()
      val cuts = Round6bQueries.rfmCutpoints(spark, longDf).collect()
      assert(cuts.length == 12, "4 cutpoints per dimension")
      val byDim = longDf.collect()
        .groupBy(_.getAs[String]("dim"))
        .view.mapValues(_.map(_.getAs[Long]("v"))).toMap
      longDf.unpersist()
      for (c <- cuts) {
        val dim = c.getAs[String]("dim")
        val k = c.getAs[Long]("k")
        val cut = c.getAs[Long]("cut")
        val vs = byDim(dim)
        val n = vs.length.toDouble
        val below = vs.count(_ < cut) / n
        val atOrBelow = vs.count(_ <= cut) / n
        assert(below < k / 5.0 + 0.1,
          s"$dim k=$k cut=$cut: below-fraction $below exceeds ${k / 5.0} + 0.1")
        assert(atOrBelow >= k / 5.0 - 0.1,
          s"$dim k=$k cut=$cut: at-or-below $atOrBelow misses ${k / 5.0} - 0.1")
      }
    }
}
