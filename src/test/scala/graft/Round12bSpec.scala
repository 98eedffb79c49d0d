package graft

import org.apache.spark.sql.functions._

/** Semantic anchors for the round-12b operators: the epoch shuffle is a
  * genuine decorrelated permutation, the LSH sweep exposes the S-curve
  * trade (cost blows up at r=1, recall dips at r=6, at equal truth), MMR
  * actually diversifies, the k-anon release is additive with no small
  * cell surviving, and the entropy flag catches exactly the degenerate
  * grafts.
  */
class Round12bSpec extends SparkSuite {

  test("x207 each epoch is a permutation and the two epochs are decorrelated") {
    val rows = SparkEntry.queries("x207_epoch_shuffle")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(1, 2))
    val n = byEpoch(1).length
    byEpoch.values.foreach { es =>
      assert(es.map(_._2).sorted.toSeq == (1L to n).toSeq,
        "positions are not exactly 1..n")
      assert(es.map(_._3).distinct.length == n, "a doc appears twice")
    }
    val pos1 = byEpoch(1).map(e => e._3 -> e._2).toMap
    val moved = byEpoch(2).count(e => pos1(e._3) != e._2)
    assert(moved * 10 >= n * 9,
      s"only $moved/$n docs moved between epochs — orders are correlated")
  }

  test("x208 sweep: cost collapses as r grows, recall only falls at the tail") {
    val rows = SparkEntry.queries("x208_lsh_param_sweep")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
      .sortBy(_._1) // by rows_per_band
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 6L))
    val truth = rows.head._3
    assert(truth > 0 && rows.forall(_._3 == truth))
    // Generated-candidate cost is strictly decreasing in r, and the r=1
    // degenerate config is the blowup the sweep exists to expose.
    assert(rows.sliding(2).forall(p => p(0)._2 > p(1)._2),
      s"gen_pairs not strictly decreasing: ${rows.map(_._2).toSeq}")
    assert(rows.head._2 >= 5 * rows(1)._2,
      s"r=1 cost ${rows.head._2} not >= 5x r=2 cost ${rows(1)._2}")
    // Recall: certain at r=1 (single-hash collision on the planted J~0.98
    // pairs), >= 90% everywhere on this fixture.
    assert(rows.head._5 == 1000L, s"r=1 recall ${rows.head._5} != 1000")
    assert(rows.forall(_._5 >= 900L), s"recall dipped below 900: ${rows.map(_._5).toSeq}")
  }

  test("x209 MMR picks are distinct, scores non-increasing, and diverge from plain top-k") {
    val picks = SparkEntry.queries("x209_mmr_diversify")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(picks.length == 5)
    assert(picks.map(_._2).distinct.length == 5, "a vector was picked twice")
    assert(picks.sliding(2).forall(p => p(0)._3 >= p(1)._3),
      "greedy MMR scores must be non-increasing (argmax set shrinks, penalty grows)")
    // The diversity penalty must actually bind: the MMR set differs from
    // the plain relevance top-5 (which near-duplicate clusters dominate).
    val plain = graft.operators.Similarity
      .cosineTopK(Tables.embeddings(spark, sfDir), 0L, 6)
      .collect().map(_.getLong(0)).filter(_ != 0L).take(5).toSet
    assert(picks.map(_._2).toSet != plain,
      "MMR returned exactly the undiversified top-5 — the penalty never bound")
  }

  test("x210 release: no small cell survives, rollup is additive, both branches live") {
    val rows = SparkEntry.queries("x210_kanon_release")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (rollup, released) = rows.partition(_._2 == -1L)
    assert(released.nonEmpty && rollup.nonEmpty,
      "one branch is vacuous on this fixture")
    released.foreach { c => assert(c._3 >= 10, s"released cell below k: $c") }
    rollup.foreach { c =>
      assert(c._4 >= 1 && c._3 < 10 * c._4,
        s"rollup row inconsistent with cells of size < 10: $c")
    }
    val total = rows.map(_._3).sum
    val raw = Tables.events(spark, sfDir).count()
    assert(total == raw, s"release not additive: $total != $raw raw events")
  }

  test("x211 entropy flags exactly the grafted single-char docs; organic docs sit near ln(alphabet)") {
    val rows = SparkEntry.queries("x211_char_entropy")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val flagged = rows.filter(_._4 == 1).map(_._1).toSet
    val grafted = rows.map(_._1).filter(_ % 13 == 5).toSet
    assert(flagged == grafted, s"flag set != grafted set (diff ${(flagged diff grafted) ++ (grafted diff flagged)})")
    rows.filter(_._4 == 1).foreach { r =>
      assert(r._3 == 0L, s"grafted single-char doc has nonzero entropy: $r")
    }
    rows.filter(_._4 == 0).foreach { r =>
      assert(r._3 > 2000000L && r._3 < 3500000L,
        s"organic doc entropy outside [2.0, 3.5] nats: $r")
    }
  }
}
