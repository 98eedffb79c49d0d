package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the round-11c operators: the perceptual-hash
  * banding is exhaustively complete on the fixture (not just pigeonhole-
  * argued), and the streaming quota admits exactly the batch rule's rows
  * while genuinely rejecting something.
  */
class Round11cSpec extends SparkSuite {

  test("x202 banded pairs == brute-force pairs within the threshold; near and exact both occur") {
    val out = SparkEntry.queries("x202_phash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall(p => p._3 >= 0L && p._3 <= 7L))
    assert(out.exists(_._3 == 0L), "no exact-duplicate pair surfaced")
    assert(out.exists(_._3 > 0L), "no genuinely NEAR pair — banding only re-found exact dups")
    // Exhaustive check: collect every doc's 8 band values, brute-force all
    // pairs, and demand the banded candidate join missed nothing within
    // hamming <= 7 (the pigeonhole completeness claim, verified not argued).
    val bands = graft.operators.Multimodal
      .dhashBands(spark, Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val ids = bands.keys.toArray.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      h = bands(ids(i)).zip(bands(ids(j)))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum.toLong
      if h <= 7L
    } yield (ids(i), ids(j), h)).toSet
    assert(out.toSet == brute,
      s"banded join disagrees with brute force: missing ${brute -- out.toSet}, extra ${out.toSet -- brute}")
  }

  test("x203 admits exactly the first 3 per user-day and rejects the overflow") {
    val out = SparkEntry.queries("x203_stream_quota")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Independent batch replay of the admission rule.
    val evts = Tables.events(spark, sfDir)
      .select(col("user_id"), graft.functions.TimeCols.ntzEpochMicros("ts").as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = evts.groupBy(e => (e._1, e._2 / 86400000000L)).toSeq
      .flatMap { case ((user, _), es) =>
        es.sortBy(e => (e._2, e._3)).take(3).map(e => (user, e._3))
      }.toSet
    assert(out.toSet == want, "drained admission set != batch first-3 rule")
    assert(out.length < evts.length,
      "quota admitted everything — the cap never bound on this fixture")
    // No (user, day) exceeds the cap.
    val byDay = evts.map(e => (e._1, e._2 / 86400000000L) -> e._3).groupMap(_._1)(_._2)
    out.groupBy(p => p._1).foreach { case (_, as) => assert(as.length >= 1) }
    val admittedPerDay = evts.filter(e => out.toSet.contains((e._1, e._3)))
      .groupBy(e => (e._1, e._2 / 86400000000L)).view.mapValues(_.length)
    admittedPerDay.foreach { case (k, n) =>
      assert(n <= 3, s"user-day $k admitted $n > 3")
    }
  }
}
