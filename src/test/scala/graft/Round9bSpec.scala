package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the round-9b additions (x170–x176): each test
  * pins the property the oracle hash alone can't articulate.
  */
class Round9bSpec extends SparkSuite {

  test("x170: BM25 emits dense 1..k ranks with non-increasing scores") {
    val rows = SparkEntry.queries("x170_bm25_topk")(spark, sfDir)
      .collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks == (1L to ranks.length).toVector,
        s"query $qid has gapped ranks: $ranks")
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $qid scores not monotone along rank: $scores")
      assert(scores.forall(_ > 0.0), "ATIRE idf is always positive")
    }
  }

  test("x171: every document is scored; add-one smoothing bounds the nll") {
    val docs = Tables.documents(spark, sfDir).count()
    val rows = SparkEntry.queries("x171_lm_perplexity")(spark, sfDir)
      .collect().toSeq
    assert(rows.length == docs.toInt,
      "every doc has >= 2 tokens on this fixture, so all must score")
    // Per-bigram nll is ln((c1+V)/(c2+1)) <= ln(total_bigrams + V) — a
    // loose corpus-size bound; and > 0 since c2+1 < c1+V always (V > 1).
    // avg_nll_unat is integer micro-nats (the midpoint-proof encoding).
    val total = rows.map(_.getLong(1)).sum
    val bound = math.log(total + 1000.0) * 1e6
    rows.foreach { r =>
      val nll = r.getLong(2)
      assert(nll > 0L && nll <= bound.toLong,
        s"doc ${r.getLong(0)} nll $nll micro-nats")
    }
  }

  test("x172: alternating-star components equal min-label propagation (x43)") {
    // Same pair graph, two different fixpoint algorithms — the outputs
    // must be IDENTICAL, not merely isomorphic, because both label with
    // the component minimum.
    val a = SparkEntry.queries("x172_cc_alternating_star")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val b = SparkEntry.queries("x43_dedup_clusters")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("x173: kNN vote is structurally sound (vote bounds, label domain)") {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("x173_knn_classify")(spark, sfDir)
      .collect().toSeq
    assert(rows.length == 8, "one prediction per probe")
    rows.foreach { r =>
      assert(labels.contains(r.getLong(1)), "prediction outside label domain")
      val votes = r.getLong(2)
      assert(votes >= 1 && votes <= 10, s"votes $votes outside 1..k")
    }
  }

  test("x174: positive shares the anchor's label, hard negative differs") {
    val lbl = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("x174_hard_negatives")(spark, sfDir)
      .collect().toSeq
    assert(rows.length == 8)
    rows.foreach { r =>
      val anchor = r.getLong(1)
      assert(lbl(r.getLong(2)) == anchor, "pos_id label != anchor label")
      assert(lbl(r.getLong(4)) != anchor, "neg_id label == anchor label")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
    }
  }

  test("x175: cluster split never straddles; doc split measurably leaks") {
    val rows = SparkEntry.queries("x175_leakage_safe_split")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sfDir).count()
    val (ct, ch, cs) = rows("by_cluster")
    val (dt, dh, ds) = rows("by_doc")
    assert(ct + ch == docs && dt + dh == docs, "both strategies partition")
    assert(cs == 0L, "cluster-keyed split must never straddle a cluster")
    assert(ds > 0L,
      "the fixture's near-dup clusters DO straddle a per-doc split — " +
        "that measured leak is the reason this operator exists")
  }

  test("x177: BPE encoding shrinks the corpus; counts are consistent") {
    val rows = SparkEntry.queries("x177_bpe_encode")(spark, sfDir)
      .collect().toSeq
    assert(rows.length == Tables.documents(spark, sfDir).count().toInt)
    rows.foreach { r =>
      val (words, chars, toks, merged) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(toks >= words, "a word is >= 1 token")
      assert(toks <= chars, "merges only shrink the symbol count")
      assert(merged == chars - toks)
    }
    assert(rows.map(_.getLong(4)).sum > 0,
      "4 trained merges must actually merge something corpus-wide")
  }

  test("x178: dup-gram fraction is consistent with x165's span detection") {
    val frac = SparkEntry.queries("x178_dup_gram_fraction")(spark, sfDir)
      .collect().toSeq
    frac.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "dup_grams <= n_grams")
      val pm = r.getLong(3)
      assert(pm >= 0 && pm <= 1000)
    }
    // Cross-query invariant: exactly the docs carrying an x165 span have a
    // nonzero duplicated-gram count — same index, two aggregations.
    val spanned = SparkEntry.queries("x165_exact_substring_spans")(
      spark, sfDir).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val nonzero = frac.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(nonzero == spanned)
  }

  test("x179: containment pairs are bounded and catch what Jaccard misses") {
    val rows = SparkEntry.queries("x179_shingle_containment")(spark, sfDir)
      .collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, na) = (r.getLong(2), r.getLong(3))
      assert(inter <= na, "intersection cannot exceed |Sa|")
      assert(inter * 10 >= na * 9 && na >= 5, "emitted pair violates gate")
    }
    // Directionality: containment is asymmetric — at least one emitted
    // (a,b) must NOT have its mirror (b,a) emitted (the small-inside-big
    // case that motivates the operator over symmetric Jaccard).
    val set = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set.exists { case (a, b) => !set.contains((b, a)) })
  }

  test("x180: KS statistic is a valid ECDF gap and self-consistent") {
    val r = SparkEntry.queries("x180_ks_drift")(spark, sfDir)
      .collect().head
    val (dNum, dDen, n1, n2) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n1 > 0 && n2 > 0 && dDen == n1 * n2)
    assert(dNum >= 0 && dNum <= dDen, "D must lie in [0, 1]")
    // Recompute the significance decision from the emitted integers —
    // the boolean must be exactly the 1.36·sqrt((n1+n2)/(n1·n2)) gate.
    val d = dNum.toDouble / dDen.toDouble
    val crit = 1.36 * math.sqrt((n1 + n2).toDouble / dDen.toDouble)
    assert(r.getBoolean(5) == (d > crit))
  }

  test("x181: drifted JSON feed keeps presence separate from value") {
    val rows = SparkEntry.queries("x181_json_schema_drift")(spark, sfDir)
      .collect().toSeq
    val events = Tables.events(spark, sfDir)
    val total = events.count()
    assert(rows.map(_.getLong(1)).sum == total,
      "every event survives the two-shape ingest")
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(1),
        "legacy-shape rows must surface as missing values, not vanish")
      assert(r.getLong(2) > 0, "current-shape rows must carry values")
    }
  }

  test("x182: JL estimates are unbiased-ish and in the 4-sigma band") {
    val rows = SparkEntry.queries("x182_jl_projection")(spark, sfDir)
      .collect().toSeq
    assert(rows.length == 16)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "probe pairs are distinct vectors")
      assert(r.getBoolean(4),
        s"pair ${r.getLong(0)} ratio ${r.getLong(3)}‰ outside [300, 2000]")
    }
    // The MEAN ratio over 16 pairs should sit near 1000‰ — a systematic
    // scale error (wrong variance constant, wrong k) would shift it.
    val mean = rows.map(_.getLong(3)).sum / rows.length
    assert(mean > 700 && mean < 1300, s"mean ratio $mean‰ is biased")
  }

  test("x183: drained streaming sketches stay within the 10% band") {
    val rows = SparkEntry.queries("x183_stream_distinct_hll")(spark, sfDir)
      .collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)),
      "every bucket's HLL estimate must sit inside the 10% envelope")
    // And the buckets must be the batch buckets — count parity with the
    // exact batch aggregation proves no window was dropped in the drain.
    val batch = Tables.events(spark, sfDir)
      .select(date_trunc("hour", col("ts")), col("event_type"))
      .distinct().count()
    assert(rows.length == batch.toInt)
  }

  test("x184: drained streaming top-k equals the batch UDAF exactly") {
    // Same bounded TopKAggregator buffer, two execution models — the
    // semigroup merge property is what makes them provably equal.
    val stream = SparkEntry.queries("x184_stream_topk")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val batch = SparkEntry.queries("x74_topk_udaf")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("x176: drained streaming sessionization equals batch x30 exactly") {
    val stream = SparkEntry.queries("x176_stream_sessionize")(spark, sfDir)
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = SparkEntry.queries("x30_session_window")(spark, sfDir)
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
