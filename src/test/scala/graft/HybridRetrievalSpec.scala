package graft

/** Semantic anchors for hybrid retrieval: fusion is anchored by the probe
  * itself, genuinely mixes both rankers (not a copy of either), and the
  * RBO agreement metric stays alive and bounded even where the rankers
  * diverge.
  */
class HybridRetrievalSpec extends SparkSuite {

  test("x217 RRF: probe wins its own query, scores non-increasing, fusion is not a single-ranker copy") {
    val rows = SparkEntry.queries("x217_hybrid_rrf")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byPid = rows.groupBy(_._1)
    assert(byPid.keySet == Set(1L, 2L, 3L))
    byPid.foreach { case (pid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length == 10, s"pid $pid: expected top-10")
      // Query-by-example identity: the probe doc is in BOTH rankers' tops
      // (cos = 1 on the dense side, saturated tf on the lexical side), so
      // no other doc can beat its summed reciprocal ranks.
      assert(sorted.head._3 == pid,
        s"pid $pid: fused rank 1 is ${sorted.head._3}, not the probe itself")
      assert(sorted.sliding(2).forall(p => p(0)._4 >= p(1)._4),
        s"pid $pid: rrf_micro not non-increasing")
      // Ranks carried through are the contributing ranks (0 = absent).
      sorted.foreach { r =>
        assert(r._5 >= 0 && r._5 <= 50 && r._6 >= 0 && r._6 <= 50,
          s"pid $pid: rank outside [0, 50]: $r")
        assert(r._5 > 0 || r._6 > 0, s"pid $pid: fused item in neither list: $r")
      }
    }
    // Fusion genuinely mixes: somewhere in the fused top-10s an item sits
    // outside the dense top-10, and another outside the lexical top-10 —
    // the fused list is not either ranker's list relabeled.
    assert(rows.exists(r => r._6 == 0 || r._6 > 10),
      "every fused item was a dense top-10 item — fusion degenerated to dense")
    assert(rows.exists(r => r._5 == 0 || r._5 > 10),
      "every fused item was a lexical top-10 item — fusion degenerated to lexical")
  }

  test("x218 RBO: all probes reported, bounded, overlap consistent, identity anchor present") {
    val rows = SparkEntry.queries("x218_rank_agreement")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L),
      "the probe spine must survive zero-overlap probes")
    rows.foreach { r =>
      assert(r._4 >= 0 && r._4 <= 1000000L, s"RBO outside [0, 1]: $r")
      assert(r._3 <= math.min(r._2, 10L), s"overlap10 > min(n_common, 10): $r")
      // The probe doc itself is in both top-50s (identity anchor), so the
      // common set is never empty at the spec SF and RBO is positive.
      assert(r._2 >= 1 && r._4 > 0, s"probe lost from its own rankings: $r")
    }
  }
}
