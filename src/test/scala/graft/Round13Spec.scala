package graft

/** Semantic anchors for the round-13 evaluation operators: Heaps-law
  * growth ordering actually holds on the fixture (words saturate, bigrams
  * grow sublinearly), and the silhouette gate partitions the whole corpus
  * with valid, non-negative scores.
  */
class Round13Spec extends SparkSuite {

  test("x219 Heaps: words saturate, bigrams grow strictly slower than occurrences") {
    val rows = SparkEntry.queries("x219_heaps_law")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.sliding(2).forall(p => p(0)._2 < p(1)._2),
      "occurrences must strictly grow with the prefix")
    // The 31-word generator vocabulary is exhausted in the first quarter.
    assert(rows.forall(_._3 == 31L), s"word vocab: ${rows.map(_._3)}")
    rows.tail.foreach { r =>
      assert(r._6 == 1000L, s"saturated word vocab must show flat growth: $r")
      assert(r._7 >= 1000L && r._7 <= r._5,
        s"bigram growth must sit between flat and occurrence growth: $r")
      assert(r._5 > r._7,
        s"occurrence growth must STRICTLY beat bigram growth (Heaps): $r")
    }
    assert(rows.tail.exists(_._7 > 1000L),
      "bigram vocab never grew — the fixture saturated everywhere, " +
        "the law is vacuous at this SF")
  }

  test("x221 ER: all bands live, recall accounted, review is where evidence runs out") {
    val rows = SparkEntry.queries("x221_entity_resolution")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byD = rows.map(r => r._1 -> r).toMap
    assert(byD.keySet == Set("match", "review", "nonmatch"),
      s"a decision band is vacuous: ${byD.keySet}")
    val n = Tables.customer(spark, sfDir).count()
    // Every true twin is a k1 candidate by construction (the corruptions
    // are all early-position), so truth splits exactly across the bands.
    assert(rows.map(_._3).sum == n,
      s"true pairs lost by blocking: ${rows.map(_._3).sum} != $n twins")
    // The match band dominates: high precision AND most of the recall.
    assert(byD("match")._5 >= 850, s"match precision: ${byD("match")}")
    assert(byD("match")._6 >= 900, s"match recall: ${byD("match")}")
    // The review band holds the char-drop+lost-segment class (exactly
    // the keys = 0 mod 15: evidence genuinely short) plus ghosts' near
    // misses — some true, mostly false, never empty.
    assert(byD("review")._3 > 0 && byD("review")._4 > 0,
      s"review band must mix true and false: ${byD("review")}")
    // Nothing true ever lands in nonmatch (weights are calibrated so the
    // weakest true class still clears the review floor).
    assert(byD("nonmatch")._3 == 0, s"true pair rejected: ${byD("nonmatch")}")
    rows.foreach { r => assert(r._2 == r._3 + r._4, s"counts disagree: $r") }
  }

  test("x222 stream SCD2: every event enriched exactly once, cold-start branch live") {
    val rows = SparkEntry.queries("x222_stream_scd2_enrich")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // <= 1 interval matches per event (intervals partition the per-user
    // timeline), so the enriched total is exactly the event count.
    val total = rows.map(_._3).sum
    val n = Tables.events(spark, sfDir).count()
    assert(total == n, s"enrichment duplicated or dropped events: $total != $n")
    // All five dimension values AND the pre-first-interval cold-start
    // branch are live — the point-in-time lookup is genuinely selective,
    // not a degenerate current-row join.
    val prios = rows.map(_._2).toSet
    assert(prios.size == 6 && prios.contains("none"),
      s"expected 5 priorities + 'none', got $prios")
    assert(rows.map(_._1).toSet.size == 5, "an event type vanished")
    rows.foreach { r => assert(r._3 > 0, s"empty cell emitted: $r") }
  }

  test("x223 DP release: noise applied, calibrated, accounted; post-processing holds") {
    val rows = SparkEntry.queries("x223_dp_release")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val (hist, total) = rows.partition(_._1 == "hist")
    assert(hist.length == 5 && total.length == 1)
    rows.foreach { r =>
      assert(r._3 >= 0, s"zero clamp failed: $r")
      assert(r._4 == 500000L, s"epsilon accounting drifted: $r")
    }
    // Noise actually fired (no cell landed on an exact count)...
    assert(rows.exists(_._3 % 1000000L != 0L), "no cell shows any noise")
    // ...and is calibrated: with b = 2, every |noise| beyond 30 has
    // probability e^-15 — a violation means the draw or scale is wrong.
    val trueCounts = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    hist.foreach { r =>
      val err = math.abs(r._3 - trueCounts(r._2) * 1000000L)
      assert(err <= 30000000L, s"noise out of calibration band: $r err=$err")
      assert(err > 0, s"cell published exactly: $r")
    }
    val n = trueCounts.values.sum
    assert(math.abs(total.head._3 - n * 1000000L) <= 30000000L,
      s"total mechanism miscalibrated: ${total.head} vs $n")
  }

  test("x224 KMV: merge law holds bitwise, estimate inside the 1/sqrt(k) band") {
    val rows = SparkEntry.queries("x224_kmv_bottomk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val (summary, cert) = rows.partition(_._1 == 0L)
    assert(cert.map(_._1).toSeq == (1L to 32L), "rank spine broken")
    // The mergeability law, bitwise: bottom-k(union) == bottom-k(union of
    // per-source bottom-k's) at every rank.
    cert.foreach { r => assert(r._3 == 1L, s"merge law violated at rank ${r._1}") }
    // KMV estimate: (k-1)H/h_k within the ~1/sqrt(k) relative band (the
    // draws are hash-fixed, so this is a deterministic regression pin,
    // not a flaky statistical test).
    val (est, vtrue) = (summary.head._2, summary.head._3)
    assert(math.abs(est - vtrue) * 100 <= vtrue * 35,
      s"KMV estimate $est outside 35% of true $vtrue")
  }

  test("x225 CSV ingest: lossless by count, quarantine is exactly the corrupt class") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("x225_csv_ingest")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, sfDir)
    assert(rows.map(_._2).sum == ev.count(),
      "ingest dropped or duplicated rows")
    rows.foreach { r =>
      assert(r._2 == r._3 + r._4, s"quarantine + clean != rows: $r")
      assert(r._3 > 0, s"quarantine branch vacuous for ${r._1}")
    }
    // PERMISSIVE quarantined EXACTLY the constructed corrupt class — no
    // over-flagging, no silent salvage.
    val expected = ev.filter(col("event_id") % 13 === 5)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r._3 == expected(r._1),
        s"quarantine != corrupt class for ${r._1}: ${r._3} vs ${expected(r._1)}")
    }
  }

  test("x226 BFS: one source, live layers, full node accounting") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("x226_graph_bfs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val byDist = rows.map(r => r._1 -> r._2).toMap
    assert(byDist(0L) == 1L, "exactly one source node at dist 0")
    assert(Seq(1L, 2L, 3L).forall(d => byDist.getOrElse(d, 0L) > 0L),
      s"a BFS layer died at the spec SF: $byDist")
    // Every graph node is accounted for exactly once (reached or -1).
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nNodes = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select("src").distinct().count()
    assert(rows.map(_._2).sum == nNodes,
      s"BFS lost nodes: ${rows.map(_._2).sum} != $nNodes")
  }

  test("x220 silhouette: full partition, four live clusters, valid score range") {
    val rows = SparkEntry.queries("x220_silhouette")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    rows.foreach { r =>
      assert(r._2 > 0, s"empty cluster survived to the report: $r")
      // a <= b by the nearest-centroid assignment, so s is in [0, 1000];
      // near-random embeddings sit near 0 but never below it.
      assert(r._3 >= 0 && r._3 <= 1000, s"silhouette outside [0, 1000]: $r")
    }
    val total = rows.map(_._2).sum
    val n = Tables.embeddings(spark, sfDir).count()
    assert(total == n, s"silhouette covered $total of $n vectors")
  }
}
