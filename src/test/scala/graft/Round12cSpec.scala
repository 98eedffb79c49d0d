package graft

import org.apache.spark.sql.functions._

/** Semantic anchors for the round-12c operators: the streaming mix-drift
  * alarm keeps both branches alive and respects the TV bound, BM25's tf
  * saturation actually ranks 3-marker relevants above 1-marker
  * distractors, negative sampling is a true partition of the trial space
  * with sqrt-smoothed draw frequencies, the context-length sweep shows
  * both cliffs, and tokenizer fertility is language-equitable on the
  * balanced fixture.
  */
class Round12cSpec extends SparkSuite {

  test("x212 drift: 30 days, L1 respects the TV bound, both alarm branches live") {
    val rows = SparkEntry.queries("x212_stream_mix_drift")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 30, s"expected 30 event-time days, got ${rows.length}")
    // L1 of two permille distributions is at most 2000 (total variation x2).
    rows.foreach { r => assert(r._3 >= 0 && r._3 <= 2000, s"L1 out of range: $r") }
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0),
      "the sqrt-n alarm must fire on some days and stay quiet on others — " +
        "a dead branch means the threshold shape is wrong for this SF")
    // Flag is exactly the stated integer rendering of l1 > K/sqrt(n).
    rows.foreach { r =>
      val expect = if (r._3 * r._3 * r._2 > 4000000L) 1 else 0
      assert(r._4 == expect, s"flag disagrees with its own threshold: $r")
    }
  }

  test("x213 BM25 eval: saturation ranks relevants first; recall@10 is exactly 10/n_rel") {
    val rows = SparkEntry.queries("x213_bm25_eval")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { r =>
      assert(r._2 > 10, s"fixture must have >10 relevant docs per query: $r")
      // A 3-marker relevant doc always outranks every 1-marker distractor
      // (same idf, higher saturated tf), so rank 1 is relevant -> RR = 1.
      assert(r._3 == 1L && r._4 == 1000L, s"a distractor won rank 1: $r")
      // ... and the whole top-10 is relevant: recall@10 == 10/n_rel exactly.
      assert(r._5 == 10000L / r._2,
        s"top-10 polluted by a distractor: recall ${r._5} != ${10000L / r._2}")
    }
  }

  test("x214 negative sampling: exact partition of 500 trials, sqrt-exact weights, draws track the smoothed CDF") {
    val rows = SparkEntry.queries("x214_negative_sampling")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Every trial lands in exactly one interval (intervals partition [0, W)).
    assert(rows.map(_._4).sum == 500L,
      s"trials lost or double-counted: ${rows.map(_._4).sum} != 500")
    // Weight is the exact integer rendering of round(sqrt(c), 6) * 1e6.
    rows.foreach { r =>
      val expect = (BigDecimal(math.sqrt(r._2.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact
      assert(r._3 == expect, s"weight not sqrt-exact: $r (expected $expect)")
    }
    // Draw counts track the smoothed expectation within binomial noise.
    val w = rows.map(_._3).sum.toDouble
    rows.foreach { r =>
      val e = 500.0 * r._3 / w
      assert(math.abs(r._4 - e) <= 25.0,
        s"draws far from smoothed expectation: $r (expected ~$e)")
    }
    // Smoothing bites: the rarest word's draw share strictly exceeds its
    // raw-count share (sqrt lifts the tail — the whole point).
    val rare = rows.minBy(_._2)
    val cTot = rows.map(_._2).sum.toDouble
    assert(rare._4 / 500.0 > rare._2 / cTot * 1.5,
      s"sqrt smoothing did not lift the rare word: $rare")
  }

  test("x215 ctx sweep: truncation cliff at 16, padding cliff at 128, packing halves with ctx") {
    val rows = SparkEntry.queries("x215_ctx_len_sweep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(16L, 32L, 64L, 128L))
    // Monotone trade: loss falls, padding waste rises, as ctx grows.
    assert(rows.sliding(2).forall(p => p(0)._3 > p(1)._3),
      s"lost_permille not strictly decreasing: ${rows.map(_._3)}")
    assert(rows.sliding(2).forall(p => p(0)._4 < p(1)._4),
      s"pad_waste not strictly increasing: ${rows.map(_._4)}")
    // Both cliffs on the 10-100-token fixture.
    assert(rows.head._2 > 0 && rows.head._3 > 500,
      s"ctx=16 should truncate most tokens: ${rows.head}")
    assert(rows.last._2 == 0 && rows.last._3 == 0,
      s"ctx=128 must truncate nothing: ${rows.last}")
    assert(rows.last._4 > 500, s"ctx=128 should waste >half to padding: ${rows.last}")
    // pack_seqs ~ ceil(total_tokens / ctx): halving ctx doubles sequences.
    val ratio = rows.head._5.toDouble / rows(1)._5
    assert(ratio > 1.9 && ratio < 2.1, s"packing not ~linear in 1/ctx: $ratio")
  }

  test("x216 fertility: all languages present, tokens>=words, chars/token>=1, equitable spread") {
    val rows = SparkEntry.queries("x216_bpe_fertility")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).sorted.toSeq == Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { r =>
      assert(r._2 >= 1000, s"fertility < 1 token/word is impossible: $r")
      assert(r._3 >= 1000, s"a token has at least one char: $r")
    }
    // The fixture's language mix is balanced vocabulary drawn from one
    // generator, so fertility must be near-equal across languages; a big
    // spread here would mean the tokenizer taxed one language.
    val f = rows.map(_._2)
    assert(f.max - f.min <= 300,
      s"fertility spread ${f.max - f.min} > 300 permille on a balanced fixture")
  }
}
