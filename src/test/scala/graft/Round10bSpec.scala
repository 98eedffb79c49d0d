package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the round-10b operators: the bounded-state
  * streaming dedup really evicts (and still covers every key), the MAD
  * statistics agree with an independent sort-based computation and flag
  * non-vacuous classes, and the temperature mix flattens in the right
  * direction while landing exactly on the budget.
  */
class Round10bSpec extends SparkSuite {

  test("x189 small-horizon drain evicts state, re-emits, and still covers every key") {
    // The hash-gated query runs the 45-day horizon (no mid-drain expiry →
    // exactly batch DISTINCT, x44's oracle). This pins the OTHER regime:
    // with a 6-hour horizon over a 30-day fixture, state entries must be
    // watermark-evicted (numRowsRemoved > 0), evicted keys re-emit on
    // reappearance (sink strictly larger than the distinct count), and
    // every distinct key still appears at least once (dedup never loses
    // a key, whatever the horizon).
    val (sink, removed) = streaming.StreamingOps
      .streamingDedupBoundedMetrics(spark, sfDir,
        "x189_small_horizon_sink", "6 hours")
    val emitted = sink.collect().map(r => (r.getLong(0), r.getString(1)))
    val distinctKeys = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(removed > 0L,
      "6-hour horizon over a 30-day stream evicted nothing — the bounded-state claim is vacuous")
    assert(emitted.length > distinctKeys.size,
      s"no re-emissions (${emitted.length} emitted vs ${distinctKeys.size} " +
        "distinct) — eviction should force evicted keys to re-emit")
    assert(emitted.toSet == distinctKeys,
      "small-horizon drain lost or invented keys vs the distinct set")
  }

  test("x190 medians match an independent sort-based computation; both classes non-empty") {
    val out = SparkEntry.queries("x190_mad_outliers")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // independent oracle: collect and sort (fixture-sized only, the
    // test-side luxury the query can't afford) — lower median at rank
    // (n+1)/2, 1-indexed
    val chars = Tables.documents(spark, sfDir)
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val med = chars((chars.length + 1) / 2 - 1)
    val devs = chars.map(v => math.abs(v - med)).sorted
    val mad = devs((devs.length + 1) / 2 - 1)
    out.foreach { case (id, nc, dev, flag) =>
      assert(dev == math.abs(nc - med), s"dev mismatch at doc $id")
      assert(flag == (dev > 2 * mad), s"flag mismatch at doc $id")
    }
    val nOut = out.count(_._4)
    assert(nOut > 0, "no outliers at 2×MAD — the filter is vacuous here")
    assert(nOut < out.length / 10,
      s"$nOut/${out.length} flagged — a robust filter must flag a small tail")
  }

  test("x191 temperature mix flattens toward low-resource languages, exactly on budget") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val budget = n * 2L / 5L
    val (sel0, rounds) =
      queries.Round10bQueries.temperatureMixWithRounds(spark, sfDir)
    val sel = sel0.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sel.length == budget,
      s"temperature mix must land exactly on the budget $budget")
    assert(rounds == 1,
      s"this fixture is feasible in one round (got $rounds) — if it " +
        "starts capping, x191's doc comment and this pin need updating")
    val corpus = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mix = sel.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    // flattening direction: the dominant language's share of the budget
    // is strictly below its corpus share; the smallest language's is
    // strictly above (τ=1/2 compresses the ratio toward 1)
    val top = corpus.maxBy(_._2)._1
    val bottom = corpus.minBy(_._2)._1
    def share(m: Map[String, Long], l: String): Double =
      m(l).toDouble / m.values.sum
    assert(share(mix, top) < share(corpus, top),
      s"$top not downsampled: mix ${share(mix, top)} vs corpus ${share(corpus, top)}")
    assert(share(mix, bottom) > share(corpus, bottom),
      s"$bottom not upsampled: mix ${share(mix, bottom)} vs corpus ${share(corpus, bottom)}")
    // no language exceeds its capacity
    mix.foreach { case (l, got) =>
      assert(got <= corpus(l), s"$l allocated past capacity")
    }
  }
}
